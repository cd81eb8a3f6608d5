"""Pallas KV-cache append: in-place per-sequence writes into HBM.

The decode-step profile (tools/profile_decode.py, v5e round 2) showed the
XLA lowering of the per-slot cache append — ``vmap(dynamic_update_slice)``
over batch with per-sequence offsets — costing ~103 us/layer, half the
entire GPT-2 decode step: XLA turns it into a scatter that rewrites the
KV buffer. The append is logically B tiny contiguous writes, so this
kernel does exactly that: the cache stays in HBM (aliased input->output
so nothing is copied) and one DMA per (sequence, buffer) moves the new
token's row to ``cache[b, lengths[b]]`` — the token-major fused layout
(generate/kv_cache.py) makes that row contiguous and 128-lane aligned,
which Mosaic requires of DMA slices.

The reference's analog is the ownership-transferring in-place
``NdTensor::append`` (rten-tensor/src/tensor.rs:1110,830;
rten-generate/src/generator.rs:507-521) — this is its TPU re-imagining.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def cache_append(lengths, caches, news):
    """Write one new position into each cache at per-sequence offsets.

    lengths: [B] int32 — write position per sequence.
    caches:  tuple of token-major [B, cap, ...] arrays (any dtypes) —
             position is dim 1, trailing dims are copied whole. The
             trailing row must be 128-lane aligned (e.g. [B, cap, 2,
             KVH*D] with KVH*D a multiple of 128).
    news:    tuple of [B, 1, ...] arrays (same trailing dims/dtypes).

    Returns the updated caches. The cache buffers are aliased in place —
    under ``jit`` with the caller donating the caches, no copy is made.
    """
    caches = tuple(caches)
    news = tuple(news)
    n = len(caches)
    assert n == len(news) and n >= 1
    batch = news[0].shape[0]

    def kernel(*refs):
        lens_ref = refs[0]
        new_refs = refs[1:1 + n]
        out_refs = refs[1 + 2 * n:1 + 3 * n]
        sem = refs[-1]
        # Start all DMAs, then drain. Each copies [H, 1, D] from VMEM into
        # the HBM cache row at this sequence's current length.
        copies = []
        for b in range(batch):
            pos = lens_ref[b]
            for i in range(n):
                dma = pltpu.make_async_copy(
                    new_refs[i].at[b],
                    out_refs[i].at[b, pl.ds(pos, 1)],
                    sem.at[b * n + i],
                )
                dma.start()
                copies.append(dma)
        for dma in copies:
            dma.wait()

    out = pl.pallas_call(
        kernel,
        in_specs=(
            # News stay in HBM like the caches (ANY would place the small
            # arrays in VMEM, whose refs Mosaic slices with stricter
            # tiling rules); the DMA engine copies HBM→HBM rows directly.
            [pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.HBM)] * n
            + [pl.BlockSpec(memory_space=pltpu.HBM)] * n
        ),
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.HBM)
                        for _ in range(n)),
        out_shape=tuple(
            jax.ShapeDtypeStruct(c.shape, c.dtype) for c in caches),
        # args: lengths, new_0..new_{n-1}, cache_0..cache_{n-1}
        input_output_aliases={1 + n + i: i for i in range(n)},
        scratch_shapes=[pltpu.SemaphoreType.DMA((batch * n,))],
        interpret=_interpret(),
    )(jnp.asarray(lengths, jnp.int32), *news, *caches)
    return tuple(out) if isinstance(out, (list, tuple)) else (out,)


def paged_append(rows, offsets, caches, news):
    """Paged variant: write news[b] into caches[i][rows[b], offsets[b]].

    rows/offsets: [B] int32 — per-sequence (page id, in-page offset).
    caches: tuple of [n_pages, page_size, ...] shared pools.
    news:   tuple of [B, 1, ...] token rows (same trailing dims/dtypes).

    Same in-place DMA mechanics as :func:`cache_append`; the only
    difference is indirection through the page table (resolved on host
    or in XLA before the call)."""
    caches = tuple(caches)
    news = tuple(news)
    n = len(caches)
    batch = news[0].shape[0]

    def kernel(*refs):
        rows_ref, offs_ref = refs[0], refs[1]
        new_refs = refs[2:2 + n]
        out_refs = refs[2 + 2 * n:2 + 3 * n]
        sem = refs[-1]
        copies = []
        for b in range(batch):
            row = rows_ref[b]
            pos = offs_ref[b]
            for i in range(n):
                dma = pltpu.make_async_copy(
                    new_refs[i].at[b],
                    out_refs[i].at[row, pl.ds(pos, 1)],
                    sem.at[b * n + i],
                )
                dma.start()
                copies.append(dma)
        for dma in copies:
            dma.wait()

    out = pl.pallas_call(
        kernel,
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
            + [pl.BlockSpec(memory_space=pltpu.HBM)] * n
            + [pl.BlockSpec(memory_space=pltpu.HBM)] * n
        ),
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.HBM)
                        for _ in range(n)),
        out_shape=tuple(
            jax.ShapeDtypeStruct(c.shape, c.dtype) for c in caches),
        input_output_aliases={2 + n + i: i for i in range(n)},
        scratch_shapes=[pltpu.SemaphoreType.DMA((batch * n,))],
        interpret=_interpret(),
    )(jnp.asarray(rows, jnp.int32), jnp.asarray(offsets, jnp.int32),
      *news, *caches)
    return tuple(out) if isinstance(out, (list, tuple)) else (out,)


def cache_append_quant(pos, kv, sbuf, bytes_kv, srows, masked=False):
    """Decode append into the token-packed int8 cache
    (generate/kv_cache.py): the new token owns byte ``pos%4`` of int32
    row ``pos//4`` in each plane, and halfword ``pos%2`` of packed
    scale row ``pos//2``; the kernel read-modify-writes one KV row and
    one scale row per sequence (the row dims sit outside the tiled
    trailing pairs, so single-row slices at arbitrary offsets are legal
    Mosaic DMAs), merges byte + halfword on the VPU (two vectorized
    ops), and DMAs both rows back.

    pos:      [B] int32, caller-clamped to < capacity;
    kv:       [B, cap/4, 2, F] int32 token-packed cache (aliased);
    sbuf:     [B, cap/2, 1, SL] int32 bf16-pair-packed scale rows
              (aliased);
    bytes_kv: [B, 2, 1, F] int32 int8-range byte values;
    srows:    [B, 1, 1, SL] f32 new scale values (bf16-rounded).
    ``masked=True``: sequences with ``pos[b] < 0`` are SKIPPED (no DMA
    in either direction) — the seq-sharded append path passes -1 for
    every non-owner capacity shard.
    Returns (kv, sbuf) updated in place under donation."""
    batch = bytes_kv.shape[0]
    posv = jnp.asarray(pos, jnp.int32)[:, None]
    bytes_kv = jnp.asarray(bytes_kv, jnp.int32).swapaxes(1, 2)
    s_packed = sbuf.dtype == jnp.int32
    if s_packed:
        # bf16 bit patterns of the new scales, as int32 lanes.
        s_arg = jax.lax.bitcast_convert_type(
            jnp.asarray(srows).astype(jnp.bfloat16),
            jnp.uint16).astype(jnp.int32)
    else:
        s_arg = jnp.asarray(srows).astype(sbuf.dtype)

    def kernel(pos_ref, posv_ref, bytes_ref, sbits_ref, _kv_in, _s_in,
               kv_out, s_out, old_ref, sold_ref, sem):
        # One counting semaphore per sequence, shared by both row reads
        # and both write-backs: DMA semaphore space ('sflag') is ~2K
        # entries on v5e — three per-batch arrays blew it at batch 256.
        # With ``masked``, every start AND wait for sequence b sits
        # under the same pos >= 0 predicate (descriptors are recreated
        # to wait — the established flat-kernel pattern).
        def kv_rmw_read(b):
            return pltpu.make_async_copy(
                kv_out.at[b, pl.ds(pos_ref[b] >> 2, 1)], old_ref.at[b],
                sem.at[b])

        def s_read(b):
            if s_packed:
                return pltpu.make_async_copy(
                    s_out.at[b, pl.ds(pos_ref[b] >> 1, 1)],
                    sold_ref.at[b], sem.at[b])
            # f32 rows: the new token owns a whole row — plain
            # HBM→HBM write, no RMW.
            return pltpu.make_async_copy(
                sbits_ref.at[b], s_out.at[b, pl.ds(pos_ref[b], 1)],
                sem.at[b])

        def kv_wb(b):
            return pltpu.make_async_copy(
                old_ref.at[b], kv_out.at[b, pl.ds(pos_ref[b] >> 2, 1)],
                sem.at[b])

        def s_wb(b):
            return pltpu.make_async_copy(
                sold_ref.at[b],
                s_out.at[b, pl.ds(pos_ref[b] >> 1, 1)], sem.at[b])

        def guarded(b, fn):
            if masked:
                @pl.when(pos_ref[b] >= 0)
                def _():
                    fn()
            else:
                fn()

        for b in range(batch):
            guarded(b, lambda b=b: (kv_rmw_read(b).start(),
                                    s_read(b).start()))
        for b in range(batch):
            guarded(b, lambda b=b: (kv_rmw_read(b).wait(),
                                    s_read(b).wait()))
        sh = ((posv_ref[:] & 3) * 8)[:, :, None, None]   # [B, 1, 1, 1]
        mask = jnp.left_shift(jnp.int32(0xFF), sh)
        old_ref[:] = ((old_ref[:] & ~mask)
                      | jnp.left_shift(bytes_ref[:] & 0xFF, sh))
        if s_packed:
            ssh = ((posv_ref[:] & 1) * 16)[:, :, None, None]
            smask = jnp.left_shift(jnp.int32(0xFFFF), ssh)
            sold_ref[:] = ((sold_ref[:] & ~smask)
                           | jnp.left_shift(sbits_ref[:] & 0xFFFF, ssh))

        def wb(b):
            kv_wb(b).start()
            if s_packed:
                s_wb(b).start()

        def wb_wait(b):
            kv_wb(b).wait()
            if s_packed:
                s_wb(b).wait()

        for b in range(batch):
            guarded(b, lambda b=b: wb(b))
        for b in range(batch):
            guarded(b, lambda b=b: wb_wait(b))

    out = pl.pallas_call(
        kernel,
        in_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),       # pos
            pl.BlockSpec(memory_space=pltpu.VMEM),       # posv
            pl.BlockSpec(memory_space=pltpu.VMEM),       # bytes
            pl.BlockSpec(memory_space=pltpu.VMEM if s_packed
                         else pltpu.HBM),                # scale bits/rows
            pl.BlockSpec(memory_space=pltpu.HBM),        # kv (alias 0)
            pl.BlockSpec(memory_space=pltpu.HBM),        # sbuf (alias 1)
        ),
        out_specs=(pl.BlockSpec(memory_space=pltpu.HBM),
                   pl.BlockSpec(memory_space=pltpu.HBM)),
        out_shape=(jax.ShapeDtypeStruct(kv.shape, kv.dtype),
                   jax.ShapeDtypeStruct(sbuf.shape, sbuf.dtype)),
        input_output_aliases={4: 0, 5: 1},
        scratch_shapes=[
            pltpu.VMEM(bytes_kv.shape, jnp.int32),
            pltpu.VMEM(s_arg.shape, s_arg.dtype),
            pltpu.SemaphoreType.DMA((batch,)),
        ],
        interpret=_interpret(),
    )(jnp.asarray(pos, jnp.int32), posv, jnp.asarray(bytes_kv, jnp.int32),
      s_arg, kv, sbuf)
    return out


def paged_append_quant(rows, offs, pool, spool, bytes_kv, srows):
    """Paged sibling of :func:`cache_append_quant`: the new token lands
    in pool page ``rows[b]`` at in-page offset ``offs[b]`` — byte
    ``offs%4`` of int32 row ``offs//4`` per plane, halfword ``offs%2``
    of packed scale row ``offs//2``. Same two-phase RMW (read both rows
    in, vectorized merges, write back), one counting semaphore per
    sequence.

    rows/offs: [B] int32 (page id resolved through the table on host or
               in XLA; offs < page_size);
    pool:      [n_pages, page/4, 2, F] int32 (aliased);
    spool:     [n_pages, page/2, 1, SL] int32 bf16-pair-packed
               (aliased);
    bytes_kv:  [B, 2, 1, F] int32 int8-range byte values;
    srows:     [B, 1, 1, SL] f32 (bf16-rounded values)."""
    batch = bytes_kv.shape[0]
    offv = jnp.asarray(offs, jnp.int32)[:, None]
    bytes_kv = jnp.asarray(bytes_kv, jnp.int32).swapaxes(1, 2)
    sbits = jax.lax.bitcast_convert_type(
        jnp.asarray(srows).astype(jnp.bfloat16),
        jnp.uint16).astype(jnp.int32)

    def kernel(rows_ref, offs_ref, offv_ref, bytes_ref, sbits_ref,
               _p_in, _s_in, p_out, s_out, old_ref, sold_ref, sem):
        reads = []
        for b in range(batch):
            r4 = offs_ref[b] >> 2
            dma = pltpu.make_async_copy(
                p_out.at[rows_ref[b], pl.ds(r4, 1)], old_ref.at[b],
                sem.at[b])
            dma.start()
            reads.append(dma)
            sdma = pltpu.make_async_copy(
                s_out.at[rows_ref[b], pl.ds(offs_ref[b] >> 1, 1)],
                sold_ref.at[b], sem.at[b])
            sdma.start()
            reads.append(sdma)
        for dma in reads:
            dma.wait()
        sh = ((offv_ref[:] & 3) * 8)[:, :, None, None]
        mask = jnp.left_shift(jnp.int32(0xFF), sh)
        old_ref[:] = ((old_ref[:] & ~mask)
                      | jnp.left_shift(bytes_ref[:] & 0xFF, sh))
        ssh = ((offv_ref[:] & 1) * 16)[:, :, None, None]
        smask = jnp.left_shift(jnp.int32(0xFFFF), ssh)
        sold_ref[:] = ((sold_ref[:] & ~smask)
                       | jnp.left_shift(sbits_ref[:] & 0xFFFF, ssh))
        writes = []
        for b in range(batch):
            r4 = offs_ref[b] >> 2
            dma = pltpu.make_async_copy(
                old_ref.at[b], p_out.at[rows_ref[b], pl.ds(r4, 1)],
                sem.at[b])
            dma.start()
            writes.append(dma)
            sdma = pltpu.make_async_copy(
                sold_ref.at[b],
                s_out.at[rows_ref[b], pl.ds(offs_ref[b] >> 1, 1)],
                sem.at[b])
            sdma.start()
            writes.append(sdma)
        for dma in writes:
            dma.wait()

    return pl.pallas_call(
        kernel,
        in_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),       # rows
            pl.BlockSpec(memory_space=pltpu.SMEM),       # offs
            pl.BlockSpec(memory_space=pltpu.VMEM),       # offv
            pl.BlockSpec(memory_space=pltpu.VMEM),       # bytes
            pl.BlockSpec(memory_space=pltpu.VMEM),       # scale bits
            pl.BlockSpec(memory_space=pltpu.HBM),        # pool (alias 0)
            pl.BlockSpec(memory_space=pltpu.HBM),        # spool (alias 1)
        ),
        out_specs=(pl.BlockSpec(memory_space=pltpu.HBM),
                   pl.BlockSpec(memory_space=pltpu.HBM)),
        out_shape=(jax.ShapeDtypeStruct(pool.shape, pool.dtype),
                   jax.ShapeDtypeStruct(spool.shape, spool.dtype)),
        input_output_aliases={5: 0, 6: 1},
        scratch_shapes=[
            pltpu.VMEM(bytes_kv.shape, jnp.int32),
            pltpu.VMEM(sbits.shape, jnp.int32),
            pltpu.SemaphoreType.DMA((batch,)),
        ],
        interpret=_interpret(),
    )(jnp.asarray(rows, jnp.int32), jnp.asarray(offs, jnp.int32), offv,
      bytes_kv, sbits, pool, spool)


def cache_flush_quant(row0, srow0, shift, sshift, kv, sbuf, new_rows,
                      new_srows, *, t):
    """Tail-window flush: merge ``t`` quantized tokens per sequence into
    the token-packed cache with per-sequence WINDOW RMWs — the Pallas
    replacement for the XLA vmapped window path, whose scatter lowering
    measured 133 ms per batch-256 flush (11 ms/layer: it rewrites the
    whole cache buffer). Here each sequence costs 4 DMAs per layer
    (window read + write for KV rows and scale rows) — the same count
    as ONE decode-step RMW append — so a 16-step window amortizes to
    ~1/16th of the old per-step append cost.

    row0/srow0: [B] int32 — first KV row (cap/4 units) / scale row
               (cap/2 units) of each sequence's window;
    shift:     [B] int32 in [0, 4] — byte offset of token 0 within the
               window (w4*4 token slots);
    sshift:    [B] int32 in [0, 2] — halfword offset in the scale
               window (w2*2 rows);
    kv:        [B, cap/4, 2, F] int32 (aliased in place);
    sbuf:      [B, cap/2, 1, SL] int32 bf16-pair-packed (aliased);
    new_rows:  [B, w4, 2, F] int32 — the window's packed tokens,
               pre-shifted per sequence (the 5 possible byte shifts are
               built statically outside and selected per sequence);
    new_srows: [B, w2, 1, SL] int32 — pre-shifted packed scale rows.

    Validity masks are computed IN-kernel from the shift scalars (byte k
    of window row r holds token r*4 + k - shift, valid iff in [0, t)),
    so no mask arrays cross HBM. The batch is processed in chunks whose
    windows fit VMEM."""
    batch, w4 = new_rows.shape[:2]
    w2 = new_srows.shape[1]
    f = new_rows.shape[-1]
    sl = new_srows.shape[-1]
    # ~64-seq chunks: window+new buffers for kv and scales stay
    # well under the 16 MB VMEM scoped limit (128 measured 17.3M).
    # The chunk must DIVIDE the batch (the loop is static) — batches
    # like 96 or 160 pass the engine's tail gate but 64 does not divide
    # them (advisor r3 finding 2), so take the largest divisor <= 64.
    chunk = next(c for c in range(min(batch, 64), 0, -1)
                 if batch % c == 0)

    def kernel(r0_ref, sr0_ref, shv_ref, sshv_ref, _kv, _sb, nr_hbm,
               ns_hbm, kv_out, s_out, win, nwin, swin, snwin, sem,
               bsem):
        for c0 in range(0, batch, chunk):
            reads = []
            for i in range(chunk):
                b = c0 + i
                dma = pltpu.make_async_copy(
                    kv_out.at[b, pl.ds(r0_ref[b], w4)], win.at[i],
                    sem.at[i])
                dma.start()
                reads.append(dma)
                sdma = pltpu.make_async_copy(
                    s_out.at[b, pl.ds(sr0_ref[b], w2)], swin.at[i],
                    sem.at[i])
                sdma.start()
                reads.append(sdma)
            bn = pltpu.make_async_copy(
                nr_hbm.at[pl.ds(c0, chunk)], nwin, bsem.at[0])
            bs = pltpu.make_async_copy(
                ns_hbm.at[pl.ds(c0, chunk)], snwin, bsem.at[1])
            bn.start()
            bs.start()
            for dma in reads:
                dma.wait()
            bn.wait()
            bs.wait()

            # Byte-validity masks from the shift vectors: window token
            # slot r*4+k holds new token (r*4+k-shift); valid iff in
            # [0, t). Built as [chunk, w4, 1, 1] words broadcast over
            # planes/lanes (shifts ride as [B, 1, 1, 1] VMEM inputs —
            # static chunk slices, no scalar materialization loop).
            sh = shv_ref[c0:c0 + chunk]
            ssh = sshv_ref[c0:c0 + chunk]
            r4 = jax.lax.broadcasted_iota(
                jnp.int32, (chunk, w4, 1, 1), 1) * 4
            mask = jnp.zeros((chunk, w4, 1, 1), jnp.int32)
            for k in range(4):
                j = r4 + k - sh
                mask = mask | jnp.where((j >= 0) & (j < t),
                                        jnp.int32(0xFF) << (8 * k), 0)
            win[:] = (win[:] & ~mask) | (nwin[:] & mask)
            r2 = jax.lax.broadcasted_iota(
                jnp.int32, (chunk, w2, 1, 1), 1) * 2
            smask = jnp.zeros((chunk, w2, 1, 1), jnp.int32)
            for k in range(2):
                j = r2 + k - ssh
                smask = smask | jnp.where(
                    (j >= 0) & (j < t), jnp.int32(0xFFFF) << (16 * k),
                    0)
            swin[:] = (swin[:] & ~smask) | (snwin[:] & smask)

            writes = []
            for i in range(chunk):
                b = c0 + i
                dma = pltpu.make_async_copy(
                    win.at[i], kv_out.at[b, pl.ds(r0_ref[b], w4)],
                    sem.at[i])
                dma.start()
                writes.append(dma)
                sdma = pltpu.make_async_copy(
                    swin.at[i], s_out.at[b, pl.ds(sr0_ref[b], w2)],
                    sem.at[i])
                sdma.start()
                writes.append(sdma)
            for dma in writes:
                dma.wait()

    return pl.pallas_call(
        kernel,
        in_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),       # row0
            pl.BlockSpec(memory_space=pltpu.SMEM),       # srow0
            pl.BlockSpec(memory_space=pltpu.VMEM),       # shift [B,1,1,1]
            pl.BlockSpec(memory_space=pltpu.VMEM),       # sshift
            pl.BlockSpec(memory_space=pltpu.HBM),        # kv (alias 0)
            pl.BlockSpec(memory_space=pltpu.HBM),        # sbuf (alias 1)
            pl.BlockSpec(memory_space=pltpu.HBM),        # new_rows
            pl.BlockSpec(memory_space=pltpu.HBM),        # new_srows
        ),
        out_specs=(pl.BlockSpec(memory_space=pltpu.HBM),
                   pl.BlockSpec(memory_space=pltpu.HBM)),
        out_shape=(jax.ShapeDtypeStruct(kv.shape, kv.dtype),
                   jax.ShapeDtypeStruct(sbuf.shape, sbuf.dtype)),
        input_output_aliases={4: 0, 5: 1},
        scratch_shapes=[
            pltpu.VMEM((chunk, w4, 2, f), jnp.int32),
            pltpu.VMEM((chunk, w4, 2, f), jnp.int32),
            pltpu.VMEM((chunk, w2, 1, sl), jnp.int32),
            pltpu.VMEM((chunk, w2, 1, sl), jnp.int32),
            pltpu.SemaphoreType.DMA((chunk,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(jnp.asarray(row0, jnp.int32), jnp.asarray(srow0, jnp.int32),
      jnp.asarray(shift, jnp.int32).reshape(batch, 1, 1, 1),
      jnp.asarray(sshift, jnp.int32).reshape(batch, 1, 1, 1),
      kv, sbuf, new_rows, new_srows)


def cache_flush_rows(row0, srow0, kv, sbuf, new_rows, new_srows):
    """Carry-mode tail flush (round 5, NOTES_ROUND5 A2): pure whole-row
    WRITES — 2 DMAs per sequence per layer instead of
    :func:`cache_flush_quant`'s 4 (window read + write for KV and scale
    rows), and no read-wait on the critical path.

    The read-modify-write disappears because the caller merges the only
    live pre-existing bytes — the partial packed row at each sequence's
    window start — from host-tracked CARRY buffers
    (``KVCache.carry``/``carry_s``) into ``new_rows``/``new_srows``
    before the call, and trailing bytes past the window's last token are
    attention-masked garbage that the NEXT flush rewrites from carry.
    Reference analog: amortized in-place append growth at every length
    (rten-tensor/src/tensor.rs:1110) — here the amortization removes
    the read half of the RMW instead of the allocation.

    row0/srow0: [B] int32 first KV/scale row of each window;
    kv:        [B, cap/4, 2, F] int32 (aliased in place);
    sbuf:      [B, cap/2, 1, SL] int32 (aliased);
    new_rows:  [B, w4, 2, F] int32 — fully-merged window rows
               (pre-shifted pack | carry bytes);
    new_srows: [B, w2, 1, SL] int32 — fully-merged scale rows."""
    batch, w4 = new_rows.shape[:2]
    w2 = new_srows.shape[1]
    f = new_rows.shape[-1]
    sl = new_srows.shape[-1]
    # Same chunking discipline as cache_flush_quant: the largest
    # divisor of the batch <= 64 keeps the VMEM windows bounded and the
    # static loop exact for non-divisor batches (advisor r3 finding 2).
    chunk = next(c for c in range(min(batch, 64), 0, -1)
                 if batch % c == 0)

    def kernel(r0_ref, sr0_ref, _kv, _sb, nr_hbm, ns_hbm, kv_out,
               s_out, nwin, snwin, sem, bsem):
        n_chunks = batch // chunk
        for ci in range(n_chunks):
            c0 = ci * chunk
            slot = ci % 2
            # Bulk-read this chunk's merged rows into VMEM (double-
            # buffered: chunk ci+1's read rides under ci's writes).
            if ci == 0:
                pltpu.make_async_copy(nr_hbm.at[pl.ds(c0, chunk)],
                                      nwin.at[slot], bsem.at[0]).start()
                pltpu.make_async_copy(ns_hbm.at[pl.ds(c0, chunk)],
                                      snwin.at[slot], bsem.at[1]).start()
            pltpu.make_async_copy(nr_hbm.at[pl.ds(c0, chunk)],
                                  nwin.at[slot], bsem.at[0]).wait()
            pltpu.make_async_copy(ns_hbm.at[pl.ds(c0, chunk)],
                                  snwin.at[slot], bsem.at[1]).wait()
            if ci + 1 < n_chunks:
                nxt = (ci + 1) % 2
                pltpu.make_async_copy(
                    nr_hbm.at[pl.ds(c0 + chunk, chunk)],
                    nwin.at[nxt], bsem.at[0]).start()
                pltpu.make_async_copy(
                    ns_hbm.at[pl.ds(c0 + chunk, chunk)],
                    snwin.at[nxt], bsem.at[1]).start()
            writes = []
            for i in range(chunk):
                b = c0 + i
                dma = pltpu.make_async_copy(
                    nwin.at[slot, i],
                    kv_out.at[b, pl.ds(r0_ref[b], w4)], sem.at[i])
                dma.start()
                writes.append(dma)
                sdma = pltpu.make_async_copy(
                    snwin.at[slot, i],
                    s_out.at[b, pl.ds(sr0_ref[b], w2)], sem.at[i])
                sdma.start()
                writes.append(sdma)
            for dma in writes:
                dma.wait()

    return pl.pallas_call(
        kernel,
        in_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),       # row0
            pl.BlockSpec(memory_space=pltpu.SMEM),       # srow0
            pl.BlockSpec(memory_space=pltpu.HBM),        # kv (alias 0)
            pl.BlockSpec(memory_space=pltpu.HBM),        # sbuf (alias 1)
            pl.BlockSpec(memory_space=pltpu.HBM),        # new_rows
            pl.BlockSpec(memory_space=pltpu.HBM),        # new_srows
        ),
        out_specs=(pl.BlockSpec(memory_space=pltpu.HBM),
                   pl.BlockSpec(memory_space=pltpu.HBM)),
        out_shape=(jax.ShapeDtypeStruct(kv.shape, kv.dtype),
                   jax.ShapeDtypeStruct(sbuf.shape, sbuf.dtype)),
        input_output_aliases={2: 0, 3: 1},
        scratch_shapes=[
            pltpu.VMEM((2, chunk, w4, 2, f), jnp.int32),
            pltpu.VMEM((2, chunk, w2, 1, sl), jnp.int32),
            pltpu.SemaphoreType.DMA((chunk,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(jnp.asarray(row0, jnp.int32), jnp.asarray(srow0, jnp.int32),
      kv, sbuf, new_rows, new_srows)
