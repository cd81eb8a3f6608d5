"""Block-paged KV cache (vLLM-style), token-major.

The slot-contiguous :class:`~rten_tpu.generate.kv_cache.KVCache` wastes
capacity when sequence lengths vary: every slot reserves ``capacity``
tokens. The paged cache allocates fixed-size *pages* from a shared pool
and maps them per sequence through a page table, so HBM holds only the
pages actually used and long/short requests share the pool.

Layout (per layer):
  * ``pool``   — [n_pages, page_size, 2, KVH*D]  (k=0 / v=1 planes,
    token-major rows like KVCache — one token's K/V is contiguous)
  * page table — [B, max_pages_per_seq] int32 page ids (-1 = unmapped)
  * lengths    — [B] tokens written per sequence

Quantized pools (``quantized=True``) use KVCache's token-packed int8
format per page: int32 [n_pages, page/4, 2, KVH*D] (4 consecutive
tokens per int32 lane — the exact inverse of Mosaic's sublane bitcast,
see generate/kv_cache.py) plus f32 scale pages
[n_pages, page/2, 1, SCALE_LANES] int32 (bf16-pair-packed). Decode
appends read-modify-write one
int32 row per sequence through the page table
(kernels/cache.py::paged_append_quant).

Device ops are Pallas kernels sharing KVCache's machinery:
  * decode append — :func:`rten_tpu.kernels.cache.paged_append` (one
    in-place row DMA per sequence, page resolved through the table);
  * decode attention — :func:`...attention.flash_decode_paged` (the page
    table is a scalar-prefetch operand; each grid program DMAs exactly
    its sequence's page — the cache is never materialized contiguously).

Page allocation/free is HOST-side bookkeeping (the engine's scheduler
owns it, mirroring slot ownership); device code only sees the table.
Implements the same protocol as KVCache (append/layer_kv/advance/
insert_sequence/with_lengths) so models are paging-agnostic.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

_LANE = 128


@jax.tree_util.register_pytree_node_class
@dataclass
class PagedKVCache:
    pools: list          # per layer [n_pages, page, 2, KVH*D]
    page_table: object   # [B, max_pages_per_seq] int32
    lengths: object      # [B] int32
    page_size: int
    kv_heads: int = 1
    head_dim: int = 1
    quant_scales: object = None   # per layer [n_pages, page/2, 1, SL] i32

    # KVCache-protocol marker: models check this to pick the paged
    # attention kernel.
    paged = True
    stacked = False

    def tree_flatten(self):
        return ((self.pools, self.page_table, self.lengths,
                 self.quant_scales),
                (self.page_size, self.kv_heads, self.head_dim))

    @classmethod
    def tree_unflatten(cls, aux, children):
        pools, table, lengths, scales = children
        return cls(pools, table, lengths, *aux, quant_scales=scales)

    # -- construction ------------------------------------------------------

    @staticmethod
    def create(n_layers, n_pages, page_size, kv_heads, head_dim, batch,
               max_pages_per_seq, dtype=jnp.float32, quantized=False,
               scale_lane_groups=1):
        """``scale_lane_groups=T``: tensor-parallel scale-page layout —
        the lane dim becomes ``T * SCALE_LANES`` and shards over the
        ``model`` axis, so each shard's local [.., SCALE_LANES] slice is
        a standard single-chip scale page for its kv_heads/T local heads
        (the paged sibling of KVCache.create(scale_lane_groups))."""
        table = jnp.full((batch, max_pages_per_seq), -1, jnp.int32)
        if quantized:
            from .kv_cache import SCALE_LANES, VSCALE_OFF
            f = kv_heads * head_dim
            t = scale_lane_groups
            assert page_size % 4 == 0 and kv_heads % t == 0 \
                and kv_heads // t <= VSCALE_OFF
            pools = [jnp.zeros((n_pages, page_size // 4, 2, f), jnp.int32)
                     for _ in range(n_layers)]
            from .kv_cache import _PACKED_ONES
            scales = [jnp.full((n_pages, page_size // 2, 1,
                                t * SCALE_LANES),
                               _PACKED_ONES, jnp.int32)
                      for _ in range(n_layers)]
            return PagedKVCache(pools, table, jnp.zeros(batch, jnp.int32),
                                page_size, kv_heads, head_dim,
                                quant_scales=scales)
        pools = [jnp.zeros((n_pages, page_size, 2, kv_heads * head_dim),
                           dtype) for _ in range(n_layers)]
        return PagedKVCache(pools, table, jnp.zeros(batch, jnp.int32),
                            page_size, kv_heads, head_dim)

    @property
    def n_layers(self):
        return len(self.pools)

    @property
    def n_pages(self):
        return self.pools[0].shape[0]

    @property
    def max_pages_per_seq(self):
        return self.page_table.shape[1]

    @property
    def capacity(self):
        return self.max_pages_per_seq * self.page_size

    def with_lengths(self, lengths):
        return PagedKVCache(self.pools, self.page_table,
                            jnp.asarray(lengths, jnp.int32),
                            self.page_size, self.kv_heads, self.head_dim,
                            quant_scales=self.quant_scales)

    # -- device ops --------------------------------------------------------

    def _pack(self, k_new, v_new):
        """[B, KVH, T, D] k/v → token-major [B, T, 2, KVH*D]; quantized
        pools get int8-range byte values [B, 2, T, KVH*D] + scale rows
        [B, T, 1, SCALE_LANES] (KVCache's format)."""
        b, kvh, t, d = k_new.shape
        if self.quant_scales is not None:
            from .kv_cache import (SCALE_LANES, VSCALE_OFF,
                                   _quantize_tokens)
            k_t = k_new.transpose(0, 2, 1, 3)
            v_t = v_new.transpose(0, 2, 1, 3)
            k_q, k_s = _quantize_tokens(k_t)
            v_q, v_s = _quantize_tokens(v_t)
            bytes_kv = jnp.stack(
                [k_q.astype(jnp.int32).reshape(b, t, kvh * d),
                 v_q.astype(jnp.int32).reshape(b, t, kvh * d)], axis=1)
            # Lane-group layout (scale_lane_groups > 1): scatter each
            # head's scale into its owning lane group — see
            # KVCache._pack for the layout contract.
            groups = self.quant_scales[0].shape[-1] // SCALE_LANES
            kvh_l = kvh // groups
            scales = jnp.ones((b, t, 1, groups * SCALE_LANES),
                              jnp.float32)
            for g in range(groups):
                off = g * SCALE_LANES
                scales = scales.at[..., 0, off:off + kvh_l].set(
                    k_s[..., g * kvh_l:(g + 1) * kvh_l])
                scales = scales.at[
                    ..., 0, off + VSCALE_OFF:off + VSCALE_OFF
                    + kvh_l].set(v_s[..., g * kvh_l:(g + 1) * kvh_l])
            return bytes_kv, scales
        return jnp.stack(
            [k_new.transpose(0, 2, 1, 3).reshape(b, t, kvh * d),
             v_new.transpose(0, 2, 1, 3).reshape(b, t, kvh * d)],
            axis=2), None

    def append(self, layer, k_new, v_new, position=None):
        """KVCache-protocol append. Decode (T == 1, position None) is an
        in-place page-row DMA; prefill (scalar position) scatters whole
        pages into the mapped table entries (once per request)."""
        b, kvh, t, d = k_new.shape
        packed, srows = self._pack(k_new, v_new)
        pool = self.pools[layer]
        page = self.page_size
        scales = self.quant_scales
        quant = scales is not None

        if position is None and t == 1:
            page_idx = jnp.minimum(self.lengths // page,
                                   self.max_pages_per_seq - 1)
            offs = self.lengths % page
            rows = jnp.take_along_axis(self.page_table,
                                       page_idx[:, None], axis=1)[:, 0]
            # Unmapped (-1) -> page 0, the allocator's reserved GARBAGE
            # page: the decode program runs for every batch slot, and a
            # finished slot keeps appending until reused — those writes
            # must land somewhere no live sequence owns.
            rows = jnp.maximum(rows, 0)
            if quant:
                spool = scales[layer]
                if (kvh * d) % _LANE == 0:
                    from ..kernels.cache import paged_append_quant
                    pool, spool = paged_append_quant(
                        rows, offs, pool, spool, packed, srows)
                else:
                    # XLA fallback (unaligned lanes): per-sequence
                    # single-row read-modify-write.
                    f = kvh * d
                    o4 = offs // 4
                    sh = (offs % 4) * 8
                    byte_row = packed.swapaxes(1, 2)   # [B, 1, 2, F]
                    sbits = jax.lax.bitcast_convert_type(
                        srows.astype(jnp.bfloat16),
                        jnp.uint16).astype(jnp.int32)

                    def body(i, carry):
                        pl_, sp_ = carry
                        old = jax.lax.dynamic_slice(
                            pl_, (rows[i], o4[i], 0, 0), (1, 1, 2, f))
                        mask = jnp.left_shift(jnp.int32(0xFF), sh[i])
                        merged = ((old & ~mask)
                                  | jnp.left_shift(
                                      byte_row[i][None] & 0xFF, sh[i]))
                        pl_ = jax.lax.dynamic_update_slice(
                            pl_, merged, (rows[i], o4[i], 0, 0))
                        sold = jax.lax.dynamic_slice(
                            sp_, (rows[i], offs[i] // 2, 0, 0),
                            (1, 1, 1, sp_.shape[-1]))
                        ssh = (offs[i] % 2) * 16
                        smask = jnp.left_shift(jnp.int32(0xFFFF), ssh)
                        merged_s = ((sold & ~smask)
                                    | jnp.left_shift(
                                        sbits[i][None] & 0xFFFF, ssh))
                        sp_ = jax.lax.dynamic_update_slice(
                            sp_, merged_s, (rows[i], offs[i] // 2, 0, 0))
                        return pl_, sp_
                    pool, spool = jax.lax.fori_loop(0, b, body,
                                                    (pool, spool))
                scales = list(scales)
                scales[layer] = spool
            elif (kvh * d) % _LANE == 0 and pool.dtype.itemsize >= 2:
                packed = packed.astype(pool.dtype)
                from ..kernels.cache import paged_append
                (pool,) = paged_append(rows, offs, (pool,), (packed,))
            else:
                packed = packed.astype(pool.dtype)

                def body(i, pl_):
                    return jax.lax.dynamic_update_slice(
                        pl_, packed[i][None], (rows[i], offs[i], 0, 0))
                pool = jax.lax.fori_loop(0, b, body, pool)
        else:
            # Prefill from ``position`` (normally 0): pad T to whole
            # pages and scatter them into each sequence's mapped pages.
            # Garbage in the tail page past T is masked by ``lengths``
            # and overwritten by subsequent decode appends.
            assert position == 0, "paged prefill writes from position 0"
            n_p = -(-t // page)
            pad = n_p * page - t
            rows = jnp.maximum(self.page_table[:, :n_p], 0)  # [B, n_p]
            if quant:
                from .kv_cache import pack_int8_tokens
                if pad:
                    packed = jnp.pad(packed, ((0, 0), (0, 0), (0, pad),
                                              (0, 0)))
                    srows = jnp.pad(srows, ((0, 0), (0, pad), (0, 0),
                                            (0, 0)),
                                    constant_values=1.0)
                prows = pack_int8_tokens(packed).swapaxes(1, 2)
                pages = prows.reshape(b * n_p, page // 4, 2, kvh * d)
                pool = pool.at[rows.reshape(-1)].set(pages)
                from .kv_cache import pack_bf16_rows
                spages = pack_bf16_rows(
                    srows.swapaxes(1, 2)).swapaxes(1, 2)
                spool = scales[layer].at[rows.reshape(-1)].set(
                    spages.reshape(b * n_p, page // 2, 1,
                                   srows.shape[-1]))
                scales = list(scales)
                scales[layer] = spool
            else:
                packed = packed.astype(pool.dtype)
                if pad:
                    packed = jnp.pad(packed,
                                     ((0, 0), (0, pad), (0, 0), (0, 0)))
                pages = packed.reshape(b, n_p, page, 2, kvh * d)
                pool = pool.at[rows.reshape(-1)].set(
                    pages.reshape(b * n_p, page, 2, kvh * d))
        pools = list(self.pools)
        pools[layer] = pool
        return PagedKVCache(pools, self.page_table, self.lengths,
                            self.page_size, self.kv_heads, self.head_dim,
                            quant_scales=scales)

    def fused_layer(self, layer):
        return self.pools[layer]

    def layer_kv(self, layer):
        """Contiguous dequantized K/V views [B, KVH, cap, D] (gathers the
        pages — reference/test path; the Pallas kernel reads pages
        directly)."""
        pool = self.pools[layer]
        safe = jnp.maximum(self.page_table, 0)          # [B, P]
        pages = pool[safe]          # [B, P, page(/4), 2, KVH*D]
        kvh, d = self.kv_heads, self.head_dim
        if self.quant_scales is not None:
            from .kv_cache import (SCALE_LANES, VSCALE_OFF,
                                   unpack_bf16_rows, unpack_int8_tokens)
            b, p = safe.shape
            rows = pages.transpose(0, 1, 3, 2, 4)  # [B, P, 2, page/4, F]
            kq = unpack_int8_tokens(rows[:, :, 0]).reshape(
                b, p * self.page_size, kvh, d)
            vq = unpack_int8_tokens(rows[:, :, 1]).reshape(
                b, p * self.page_size, kvh, d)
            srows = unpack_bf16_rows(
                self.quant_scales[layer][safe][:, :, :, 0])
            s = srows.reshape(b, p * self.page_size, -1)  # [B, cap, SL]
            if s.shape[-1] == SCALE_LANES:
                s_k = s[:, :, :kvh]
                s_v = s[:, :, VSCALE_OFF:VSCALE_OFF + kvh]
            else:
                # Lane-group layout: gather each group's local heads
                # back into global [B, cap, KVH] rows (see
                # KVCache.layer_kv).
                groups = s.shape[-1] // SCALE_LANES
                kvh_l = kvh // groups
                s_k = jnp.concatenate(
                    [s[:, :, g * SCALE_LANES:g * SCALE_LANES + kvh_l]
                     for g in range(groups)], axis=-1)
                s_v = jnp.concatenate(
                    [s[:, :, g * SCALE_LANES + VSCALE_OFF:
                       g * SCALE_LANES + VSCALE_OFF + kvh_l]
                     for g in range(groups)], axis=-1)

            def deq(x, sr):
                return (x.astype(jnp.float32)
                        * sr[..., None]).transpose(0, 2, 1, 3)

            return deq(kq, s_k), deq(vq, s_v)
        b, p, ps, _, r = pages.shape
        seq = pages.reshape(b, p * ps, 2, kvh, d)
        k = seq[:, :, 0].transpose(0, 2, 1, 3)
        v = seq[:, :, 1].transpose(0, 2, 1, 3)
        return k, v

    def insert_sequence(self, other: "PagedKVCache", slot, length,
                        src_slot=0):
        """Adopt sequence ``src_slot`` of a freshly prefilled paged group
        cache: copy its mapped pages' contents into ``slot``'s mapped
        pages (both tables must cover ceil(len/page) pages)."""
        n_p = other.max_pages_per_seq
        src_rows = jnp.maximum(other.page_table[src_slot], 0)   # [n_p]
        dst_rows = jnp.maximum(
            jax.lax.dynamic_slice_in_dim(self.page_table, slot, 1, 0)[0,
                                                                      :n_p],
            0)
        pools = [pool.at[dst_rows].set(src.astype(pool.dtype)[src_rows])
                 for pool, src in zip(self.pools, other.pools)]
        scales = self.quant_scales
        if scales is not None:
            scales = [sp.at[dst_rows].set(osp[src_rows])
                      for sp, osp in zip(scales, other.quant_scales)]
        lengths = self.lengths.at[slot].set(length)
        return PagedKVCache(pools, self.page_table, lengths,
                            self.page_size, self.kv_heads, self.head_dim,
                            quant_scales=scales)

    def advance(self, n=1):
        return PagedKVCache(self.pools, self.page_table, self.lengths + n,
                            self.page_size, self.kv_heads, self.head_dim,
                            quant_scales=self.quant_scales)

    # -- host-side page allocator -----------------------------------------

    @staticmethod
    def make_allocator(n_pages, partitions=1, slots_per_partition=None):
        return _PageAllocator(n_pages, partitions, slots_per_partition)


class _PageAllocator:
    """Host bookkeeping: free-list of pool pages; the engine maps pages
    into sequences' tables before steps that will need them.

    Page 0 is RESERVED as the garbage page: finished slots' in-flight
    decode appends clamp to it (see PagedKVCache.append), so it may
    never hold live data.

    Under a data-sharded mesh (round 4) the pool's page dim shards over
    the batch axes, so allocation is PARTITIONED: slot ``s`` (owned by
    data shard ``s // slots_per_partition``) only receives pages from
    its shard's contiguous page range, keeping every table entry local
    to the shard that owns the row — the per-shard island then remaps
    global ids by subtracting the shard base. Each partition reserves
    its own local page 0 as the garbage page (the decode append's
    unmapped-slot clamp is per-shard)."""

    def __init__(self, n_pages, partitions=1, slots_per_partition=None):
        assert n_pages % partitions == 0
        self.npl = n_pages // partitions
        assert self.npl >= 2, \
            "each partition needs its reserved garbage page + data"
        self.partitions = partitions
        self.slots_per_partition = slots_per_partition
        self.free = [list(range((p + 1) * self.npl - 1, p * self.npl, -1))
                     for p in range(partitions)]

    def _partition(self, slot):
        if self.partitions == 1:
            return 0
        return slot // self.slots_per_partition

    def alloc(self, slot=0) -> int:
        free = self.free[self._partition(slot)]
        if not free:
            raise MemoryError("KV page pool exhausted")
        return free.pop()

    def release(self, pages):
        for page in pages:
            if page >= 0:
                self.free[int(page) // self.npl].append(int(page))

    def ensure_capacity(self, cache: PagedKVCache, slot: int,
                        tokens_ahead: int, length: int | None = None):
        """Map enough pages on ``slot``'s table for ``tokens_ahead`` more
        tokens; returns the updated cache (host-side table update)."""
        table = np.asarray(cache.page_table)
        if length is None:
            length = int(np.asarray(cache.lengths)[slot])
        needed_pages = (length + tokens_ahead + cache.page_size - 1) \
            // cache.page_size
        mapped = int((table[slot] >= 0).sum())
        if mapped >= needed_pages:
            return cache
        new_table = table.copy()
        for i in range(mapped, needed_pages):
            if i >= cache.max_pages_per_seq:
                raise MemoryError("sequence exceeds max pages")
            new_table[slot, i] = self.alloc(slot)
        # Preserve the table's sharding (data-sharded paged serving):
        # a plain jnp.asarray would land the update unsharded and make
        # the next donated decode step reshard or mismatch.
        table_dev = jax.device_put(new_table,
                                   cache.page_table.sharding)
        return PagedKVCache(cache.pools, table_dev,
                            cache.lengths, cache.page_size, cache.kv_heads,
                            cache.head_dim,
                            quant_scales=cache.quant_scales)

    def release_slot(self, cache: PagedKVCache, slot: int) -> PagedKVCache:
        table = np.asarray(cache.page_table)
        self.release(table[slot])
        new_table = table.copy()
        new_table[slot] = -1
        lengths = np.asarray(cache.lengths).copy()
        lengths[slot] = 0
        return PagedKVCache(
            cache.pools,
            jax.device_put(new_table, cache.page_table.sharding),
            jax.device_put(lengths.astype(np.int32),
                           cache.lengths.sharding),
            cache.page_size, cache.kv_heads, cache.head_dim,
            quant_scales=cache.quant_scales)
