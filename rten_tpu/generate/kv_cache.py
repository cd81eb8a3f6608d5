"""Preallocated KV cache, token-major fused layout.

The reference amortizes cache growth with ``NdTensor::with_capacity`` +
in-place ``append`` (rten-tensor/src/tensor.rs:1110,830; ownership
transfer in generator.rs:507-521). Under XLA, in-place growth becomes
fixed-capacity arrays updated through buffer donation.

Layout: per layer one array ``[B, cap, 2, KVH*D]`` — plane 0 holds K,
plane 1 holds V, and a token's K/V for *all* heads is one contiguous
row. Chosen over the textbook ``[B, KVH, cap, D]`` pair because on TPU:

* appending a token is ONE contiguous-row DMA per sequence (the Pallas
  kernel in :mod:`rten_tpu.kernels.cache`), instead of XLA's scatter
  lowering of ``vmap(dynamic_update_slice)`` which profiled at
  ~103 us/layer on v5e — half the GPT-2 decode step. Mosaic requires
  DMA slices to be 128-lane aligned, which ``KVH*D`` rows satisfy for
  real models (768 for GPT-2, 256 for TinyLlama) while a bare
  ``head_dim`` (64) cannot;
* K and V land in one buffer: half the append DMAs, one donated alias;
* flash-decode reads K blocks as ``[block, D]`` tiles via BlockSpec
  index maps (no layout change needed);
* a future fused decode-layer kernel streams cache rows token-major.

``lengths`` [batch] tracks per-sequence fill (continuous batching puts
sequences of one batch at different depths). Optional int8 quantized
storage (per-token-per-head scales) halves cache bandwidth vs bf16.

Quantized layout (token-packed int32): Mosaic rejects row DMAs of int8
buffers (sub-word sublane packing), so the int8 cache is stored as int32
``[B, cap/4, 2, KVH*D]`` (plane 0 = K, 1 = V — the row dim stays OUTSIDE
the (8, 128)-tiled trailing pair, like the float cache, so single-row
DMAs at arbitrary offsets are legal) where lane ``(r, plane, j)`` packs
tokens ``4r..4r+3``'s feature ``j`` as bytes 0..3. This packing is
chosen to be the exact inverse of Mosaic's sublane bitcast: inside a
kernel, ``pltpu.bitcast(block_int32, int8)`` on a ``[block/4, F]`` tile
yields the canonical token-major int8 ``[block, F]`` tile (byte b of
sublane s lands at sublane 4s+b) with ZERO unpack arithmetic — the
decode kernels then feed it straight into the score/PV dots (either via
a single int8→compute-dtype convert, or as genuine int8×int8 MXU dots
with a row-quantized q). The previous byte-planar-in-lanes packing
needed 4 shifts + 2 concats per block in the kernel's dependent op
chain, which on v5e cost more than the bandwidth the 1 B/elt stream
saved. Scales are bf16 values stored PAIR-PACKED into int32 rows
``[B, cap/2, 1, 128]`` (token 2r in the low half; K scales at lanes
[0, KVH), V at [64, 64+KVH)) — see the SCALE_DTYPE comment below for
why raw bf16 rows are impossible and how the pack halves the kernels'
second (scale) DMA stream. Decode appends read-modify-write one int32
KV row per plane (the new token owns byte ``pos%4`` of row ``pos//4``)
and one scale row (halfword ``pos%2`` of row ``pos//2``) in one Pallas
kernel (kernels/cache.py::cache_append_quant) — the int8 fallback to
XLA's scatter cost more than quantization saved.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

# Mosaic DMA slices must be 128-lane aligned on the last dim.
_LANE = 128
# Quantized-cache scale rows: [1, 128] per token; V scales offset.
SCALE_LANES = 128
VSCALE_OFF = 64
# Scale precision: bf16 (the quantizer rounds scales to bf16 BEFORE
# computing the int8 values, so q·stored_scale is the exact
# dequantization everywhere; the extra error is ~2^-9 relative — below
# the int8 error itself). STORAGE is two consecutive tokens' bf16 bit
# patterns packed per int32 word ([B, cap/2, 1, 128] int32): raw bf16
# rows fail Mosaic compile (hardware, round 6: DMA slices of sub-32-bit
# arrays with a size-1 sublane in the trailing (sublane, lane) pair are
# rejected — the constraint class that forbids int8 row DMAs), and the
# pack halves the kernels' second (scale) DMA stream; in-kernel,
# ``pltpu.bitcast(rows_int32, bf16)`` IS the unpack (token 2r in the
# low half → sublane 2r), mirroring the token-packed KV trick.
SCALE_DTYPE = jnp.bfloat16
# bf16(1.0) bit pattern in both halves — the packed form of the
# create()-time unit scales.
_PACKED_ONES = (0x3F80 << 16) | 0x3F80


def pack_int8_tokens(x):
    """Token-packed int32 pack: ``x`` [..., T, F] int8-range ints
    (T % 4 == 0) → [..., T/4, F] int32 where row r's lane j packs tokens
    4r..4r+3's feature j as (little-endian) bytes 0..3. The inverse of
    Mosaic's int32→int8 sublane bitcast, so kernels unpack for free."""
    t, f = x.shape[-2:]
    assert t % 4 == 0
    g = x.astype(jnp.int32).reshape(*x.shape[:-2], t // 4, 4, f)

    def byte(i):
        return jnp.bitwise_and(g[..., i, :], 0xFF)

    return (byte(0) | (byte(1) << 8) | (byte(2) << 16)
            | (g[..., 3, :] << 24))


def unpack_int8_tokens(packed):
    """Inverse of :func:`pack_int8_tokens`: [..., R, F] int32 →
    [..., 4R, F] int32, sign-extended."""
    r, f = packed.shape[-2:]
    x = jnp.stack([(packed << 24) >> 24, (packed << 16) >> 24,
                   (packed << 8) >> 24, packed >> 24], axis=-2)
    return x.reshape(*packed.shape[:-2], 4 * r, f)


def pack_bf16_rows(x):
    """[..., T, L] float → [..., T/2, L] int32: two consecutive ROWS'
    bf16 bit patterns per word, row 2r in the low half — the exact
    inverse of Mosaic's int32→bf16 sublane bitcast (like
    :func:`pack_int8_tokens` for bytes)."""
    t = x.shape[-2]
    assert t % 2 == 0
    bits = jax.lax.bitcast_convert_type(
        x.astype(jnp.bfloat16), jnp.uint16).astype(jnp.int32)
    g = bits.reshape(*x.shape[:-2], t // 2, 2, x.shape[-1])
    return g[..., 0, :] | (g[..., 1, :] << 16)


def unpack_bf16_rows(packed):
    """Inverse of :func:`pack_bf16_rows`: [..., R, L] int32 →
    [..., 2R, L] f32."""
    r, l = packed.shape[-2:]
    lo = jax.lax.bitcast_convert_type(
        (packed & 0xFFFF).astype(jnp.uint16), jnp.bfloat16)
    hi = jax.lax.bitcast_convert_type(
        ((packed >> 16) & 0xFFFF).astype(jnp.uint16), jnp.bfloat16)
    x = jnp.stack([lo, hi], axis=-2)
    return x.reshape(*packed.shape[:-2], 2 * r,
                     l).astype(jnp.float32)


def pack_int8_cache(kq, vq):
    """Pack full K/V planes [..., cap, F] int8-range ints into the cache
    layout [..., cap/4, 2, F] int32 (tests/tools convenience)."""
    return jnp.stack([pack_int8_tokens(kq), pack_int8_tokens(vq)],
                     axis=-2)


def _quant_append(buf, sbuf, bytes_kv, srows, position, lengths):
    """Write quantized tokens into the token-packed cache.

    buf:      [B, cap/4, 2, F] int32 (token-packed, see module doc);
    sbuf:     [B, cap/2, 1, SCALE_LANES] int32 (bf16-pair-packed rows)
              or [B, cap, 1, SCALE_LANES] f32 (short-capacity format —
              see KVCache.create);
    bytes_kv: [B, 2, T, F] int32 int8-range byte values;
    srows:    [B, T, 1, SCALE_LANES] bf16-rounded scale values;
    position: 4-aligned python int (prefill) or None (per-sequence
              offsets from ``lengths``).
    Returns (new_buf, new_sbuf)."""
    b, _, t, f = bytes_kv.shape
    cap4 = buf.shape[1]
    cap = cap4 * 4
    s_packed = sbuf.dtype == jnp.int32

    if position is not None:
        assert isinstance(position, int) and position % 4 == 0, position
        # Prefill: whole-row DUS; tokens padded to a row boundary write
        # zero bytes past ``t`` — dead until a later append merges them.
        pad = (-t) % 4
        if pad:
            bytes_kv = jnp.pad(bytes_kv, ((0, 0), (0, 0), (0, pad),
                                          (0, 0)))
        rows = pack_int8_tokens(bytes_kv).swapaxes(1, 2)  # [B,T/4,2,F]
        new_buf = jax.lax.dynamic_update_slice(
            buf, rows, (0, position // 4, 0, 0))
        if not s_packed:
            new_sbuf = jax.lax.dynamic_update_slice(
                sbuf, srows.astype(sbuf.dtype), (0, position, 0, 0))
            return new_buf, new_sbuf
        spad = (-srows.shape[1]) % 2
        if spad:
            srows = jnp.pad(srows, ((0, 0), (0, spad), (0, 0), (0, 0)))
        packed_rows = pack_bf16_rows(srows.swapaxes(1, 2)).swapaxes(1, 2)
        new_sbuf = jax.lax.dynamic_update_slice(
            sbuf, packed_rows, (0, position // 2, 0, 0))
        return new_buf, new_sbuf

    if t == 1 and f % _LANE == 0:
        # Decode: one Pallas kernel RMW-merges byte pos%4 of int32 row
        # pos//4 per plane and appends the scale row (see
        # kernels/cache.py::cache_append_quant). Positions clamp to the
        # last token (finished slots keep advancing — see the float
        # path's comment).
        from ..kernels.cache import cache_append_quant
        pos = jnp.minimum(lengths, cap - 1)
        return cache_append_quant(pos, buf, sbuf, bytes_kv, srows)

    # Chunked per-sequence append (speculative verify) or unaligned
    # lanes: XLA read-modify-write over the covering row window.
    w4 = min((t + 3) // 4 + 1, cap4)
    offs = jnp.minimum(lengths, cap - t)
    row0 = jnp.clip(offs // 4, 0, cap4 - w4)
    shift = offs - row0 * 4                       # in [0, w4*4 - t]

    placed = jax.vmap(
        lambda xb, s: jax.lax.dynamic_update_slice(
            jnp.zeros((2, w4 * 4, f), jnp.int32), xb, (0, s, 0))
    )(bytes_kv, shift)
    valid = jax.vmap(
        lambda s: jax.lax.dynamic_update_slice(
            jnp.zeros((w4 * 4, 1), jnp.int32),
            jnp.full((t, 1), 0xFF, jnp.int32), (s, 0))
    )(shift)
    new_rows = pack_int8_tokens(placed).swapaxes(1, 2)  # [B, w4, 2, F]
    mask = pack_int8_tokens(valid)[:, :, None]          # [B, w4, 1, 1]

    windows = jax.vmap(
        lambda bb, r: jax.lax.dynamic_slice(bb, (r, 0, 0), (w4, 2, f))
    )(buf, row0)
    merged = (windows & ~mask) | (new_rows & mask)
    new_buf = jax.vmap(
        lambda bb, m, r: jax.lax.dynamic_update_slice(bb, m, (r, 0, 0))
    )(buf, merged, row0)
    if not s_packed:
        new_sbuf = jax.vmap(
            lambda sb, srow, o: jax.lax.dynamic_update_slice(
                sb, srow.astype(sb.dtype), (o, 0, 0))
        )(sbuf, srows, offs)
        return new_buf, new_sbuf
    # Scale rows: same window-RMW over the bf16-pair-packed rows (the
    # chunk may start mid-word).
    cap2 = sbuf.shape[1]
    w2 = min(t // 2 + 1, cap2)
    srow0 = jnp.clip(offs // 2, 0, cap2 - w2)
    sshift = offs - srow0 * 2                     # in [0, w2*2 - t]
    s_placed = jax.vmap(
        lambda sr, sh: jax.lax.dynamic_update_slice(
            jnp.zeros((w2 * 2, srows.shape[-1]), jnp.float32),
            sr[:, 0, :].astype(jnp.float32), (sh, 0))
    )(srows, sshift)
    s_valid = jax.vmap(
        lambda sh: jax.lax.dynamic_update_slice(
            jnp.zeros((w2 * 2, 1), jnp.int32),
            jnp.full((t, 1), -1, jnp.int32), (sh, 0))
    )(sshift)
    s_new = pack_bf16_rows(s_placed)[:, :, None, :]   # [B, w2, 1, SL]
    # Valid halves: -1 packs to 0xFFFF in the owning half.
    lo = jnp.bitwise_and(s_valid[:, 0::2, :], 0xFFFF)
    hi = jnp.bitwise_and(s_valid[:, 1::2, :], 0xFFFF)
    s_mask = (lo | (hi << 16))[:, :, None, :]          # [B, w2, 1, 1]
    s_windows = jax.vmap(
        lambda sb, r: jax.lax.dynamic_slice(
            sb, (r, 0, 0), (w2, 1, sbuf.shape[-1]))
    )(sbuf, srow0)
    s_merged = (s_windows & ~s_mask) | (s_new & s_mask)
    new_sbuf = jax.vmap(
        lambda sb, m, r: jax.lax.dynamic_update_slice(sb, m, (r, 0, 0))
    )(sbuf, s_merged, srow0)
    return new_buf, new_sbuf


def _quantize_tokens(x):
    """Per-(token, head) symmetric int8: scale = absmax/127 over head_dim,
    rounded to the storage dtype FIRST so q·stored_scale is the exact
    dequantization. x: [B, T, KVH, D] → (q, scales [B, T, KVH])."""
    absmax = jnp.max(jnp.abs(x), axis=-1)
    scale = jnp.where(absmax == 0, 1.0,
                      absmax / 127.0).astype(SCALE_DTYPE)
    sf = scale.astype(jnp.float32)
    q = jnp.clip(jnp.round(x / sf[..., None]), -127, 127)
    return q, scale


@jax.tree_util.register_pytree_node_class
@dataclass
class KVCache:
    kv: object          # per layer [B, cap, 2, KVH*D]; stacked: [L, ...]
    lengths: object     # [B] int32
    quant_scales: object = None  # per layer [B, cap, 2, KVH] f32, or None
    kv_heads: int = 1
    head_dim: int = 1
    # bf16 tail write-buffer (quantized caches, serving decode): the
    # newest <=R tokens live UNQUANTIZED in per-layer [B, R, 2, KVH*D]
    # bf16 rings written at a GLOBAL slot index (tail_count, the same
    # for every sequence — the engine flushes before admissions, so all
    # live sequences are always at the same in-window depth). A decode
    # append is then ONE dense dynamic_update_slice instead of the
    # token-packed RMW kernel's 4 scalar-issued DMAs per sequence
    # (measured 131 us/layer at batch 256 — the largest single cost of
    # the serving step), and the per-step quantization work moves into
    # the amortized flush. flush_tail() quantizes the window and chunk-
    # appends it into the packed cache (equivalent to per-token RMW
    # appends up to the bf16 rounding of the buffered rows).
    # The flat decode-attention kernel reads the tail as one extra
    # bf16 block round (newest tokens at HIGHER precision than int8).
    tail: object = None         # per layer [B, R, 2, KVH*D] bf16, or None
    tail_count: object = 0      # [] int32 — tokens in the tail window
    # Carry-row flush state (round 5, NOTES_ROUND5 A2): each slot's
    # LAST PARTIAL packed row + scale row, kept in sync so flush_tail
    # can do pure whole-row WRITES (2 DMAs/seq) instead of window RMWs
    # (4 DMAs/seq). Written only by flush_tail and insert_sequence;
    # tail-mode decode never touches the packed cache between flushes,
    # which is what keeps the carry exact.
    carry: object = None        # per layer [B, 1, 2, KVH*D] int32
    carry_s: object = None      # per layer [B, 1, 1, SL] int32

    # -- pytree plumbing (so caches flow through jit/donation) -------------

    def tree_flatten(self):
        return ((self.kv, self.lengths, self.quant_scales, self.tail,
                 self.tail_count, self.carry, self.carry_s),
                (self.kv_heads, self.head_dim))

    @classmethod
    def tree_unflatten(cls, aux, children):
        (kv, lengths, quant_scales, tail, tail_count, carry,
         carry_s) = children
        kv_heads, head_dim = aux
        return cls(kv, lengths, quant_scales, kv_heads, head_dim,
                   tail, tail_count, carry, carry_s)

    # -- construction ------------------------------------------------------

    @staticmethod
    def create(batch, n_layers, kv_heads, capacity, head_dim,
               dtype=jnp.float32, quantized=False, stacked=False,
               scale_lane_groups=1, tail_window=0):
        """``stacked=True`` holds all layers in one [L, B, cap, 2, KVH*D]
        array (required for `lax.scan` over layers, where the layer index
        is traced); the default is one array per layer.

        ``scale_lane_groups=T``: tensor-parallel layout for the quant
        scale rows — the lane dim becomes ``T * SCALE_LANES``, sharded
        over the ``model`` mesh axis so that EVERY shard's local
        [.., SCALE_LANES] slice is a standard single-chip scale row for
        its kv_heads/T local heads (K scales at [0:kvh_local], V at
        VSCALE_OFF+). Inside shard_map the kernels then run completely
        unchanged; nothing outside the shard_map islands may interpret
        the global lane layout."""
        if quantized:
            assert not stacked, "quantized+stacked not supported yet"
            f = kv_heads * head_dim
            t = scale_lane_groups
            assert capacity % 4 == 0 and kv_heads // t <= VSCALE_OFF
            assert kv_heads % t == 0
            shape = (batch, capacity // 4, 2, f)          # token-packed
            kv = [jnp.zeros(shape, jnp.int32) for _ in range(n_layers)]
            # Scale rows are bf16-pair-packed at EVERY capacity since
            # round 3 of the flat kernel: with the flat single-program
            # pipeline the short-cache regime flipped — f32 rows 227 us
            # vs packed 89 us at batch 256 / live 128 (the f32 scale
            # stream, not the bitcast relayout, was the binding cost;
            # the old grouped-kernel A/B that kept f32 rows short had
            # measured the opposite). Values are identical either way:
            # the quantizer rounds scales to bf16 before use.
            sshape = (batch, capacity // 2, 1, t * SCALE_LANES)
            scales = [jnp.full(sshape, _PACKED_ONES, jnp.int32)
                      for _ in range(n_layers)]
            tail = carry = carry_s = None
            if tail_window:
                tail = [jnp.zeros((batch, tail_window, 2, f),
                                  jnp.bfloat16) for _ in range(n_layers)]
                # Carry rows for the whole-row-write flush (see the
                # field docs). Zero-init is valid: a fresh slot's
                # first window starts at offset 0 (shift 0), so the
                # carry bytes are never read before insert_sequence /
                # flush_tail first writes them.
                carry = [jnp.zeros((batch, 1, 2, f), jnp.int32)
                         for _ in range(n_layers)]
                carry_s = [jnp.full((batch, 1, 1, t * SCALE_LANES),
                                    _PACKED_ONES, jnp.int32)
                           for _ in range(n_layers)]
            return KVCache(kv, jnp.zeros(batch, jnp.int32), scales,
                           kv_heads, head_dim, tail,
                           jnp.zeros((), jnp.int32), carry, carry_s)
        assert not tail_window, "tail buffer requires a quantized cache"
        shape = (batch, capacity, 2, kv_heads * head_dim)
        if stacked:
            kv = jnp.zeros((n_layers, *shape), dtype)
        else:
            kv = [jnp.zeros(shape, dtype) for _ in range(n_layers)]
        return KVCache(kv, jnp.zeros(batch, jnp.int32), None,
                       kv_heads, head_dim)

    @property
    def stacked(self):
        return not isinstance(self.kv, list)

    @property
    def capacity(self):
        if self.quant_scales is not None:
            s = self.quant_scales[0]
            return s.shape[1] * (2 if s.dtype == jnp.int32 else 1)
        return self.kv.shape[2] if self.stacked else self.kv[0].shape[1]

    @property
    def n_layers(self):
        return self.kv.shape[0] if self.stacked else len(self.kv)

    def with_lengths(self, lengths):
        return KVCache(self.kv, jnp.asarray(lengths, jnp.int32),
                       self.quant_scales, self.kv_heads, self.head_dim,
                       self.tail, self.tail_count, self.carry,
                       self.carry_s)

    # -- updates -----------------------------------------------------------

    def _pack(self, k_new, v_new):
        """[B, KVH, T, D] k/v → token-major rows: float caches
        [B, T, 2, KVH*D]; quantized caches int8-range byte values
        [B, 2, T, KVH*D] int32 (NOT yet token-packed — each append
        branch packs/merges per its own alignment) + scale rows
        [B, T, 1, 128]."""
        b, kvh, t, d = k_new.shape
        k_t = k_new.transpose(0, 2, 1, 3)           # [B, T, KVH, D]
        v_t = v_new.transpose(0, 2, 1, 3)
        if self.quant_scales is not None:
            k_q, k_s = _quantize_tokens(k_t)
            v_q, v_s = _quantize_tokens(v_t)
            bytes_kv = jnp.stack(
                [k_q.astype(jnp.int32).reshape(b, t, kvh * d),
                 v_q.astype(jnp.int32).reshape(b, t, kvh * d)], axis=1)
            # TP lane-group layout (scale_lane_groups > 1): a GLOBAL
            # append (prefix-cache suffix chunks, meshed chunked verify)
            # must scatter each head's scale into its owning lane group
            # so every shard's local [.., 128] slice stays a standard
            # scale row. Group g owns heads [g*kvh_l, (g+1)*kvh_l).
            groups = self.quant_scales[0].shape[-1] // SCALE_LANES
            kvh_l = kvh // groups
            scales = jnp.ones((b, t, 1, groups * SCALE_LANES),
                              SCALE_DTYPE)
            for g in range(groups):
                off = g * SCALE_LANES
                scales = scales.at[..., 0, off:off + kvh_l].set(
                    k_s[..., g * kvh_l:(g + 1) * kvh_l])
                scales = scales.at[
                    ..., 0, off + VSCALE_OFF:off + VSCALE_OFF
                    + kvh_l].set(v_s[..., g * kvh_l:(g + 1) * kvh_l])
            return bytes_kv, scales
        packed = jnp.stack([k_t.reshape(b, t, kvh * d),
                            v_t.reshape(b, t, kvh * d)], axis=2)
        return packed, None

    def append(self, layer, k_new, v_new, position=None):
        """Write k/v [B, KVH, T, D] into the cache.

        ``position``: scalar → same offset for every sequence (prefill);
        None → per-sequence offsets from ``self.lengths`` (decode under
        continuous batching, where sequences sit at different depths).

        Returns a new KVCache (same buffers aliased via donation under
        jit)."""
        b, kvh, t, d = k_new.shape
        if (self.tail is not None and position is None and t == 1):
            # Tail write-buffer decode append: ONE dense bf16 row write
            # at the GLOBAL window slot (all live sequences are at the
            # same in-window depth — the engine flushes before any
            # admission). No quantization here; flush_tail() does it
            # for the whole window at once.
            k_t = k_new.transpose(0, 2, 1, 3).reshape(b, t, kvh * d)
            v_t = v_new.transpose(0, 2, 1, 3).reshape(b, t, kvh * d)
            row = jnp.stack([k_t, v_t], axis=2).astype(jnp.bfloat16)
            tail = list(self.tail)
            tail[layer] = jax.lax.dynamic_update_slice(
                tail[layer], row, (0, self.tail_count, 0, 0))
            # The window slot advances once per STEP, in advance() after
            # ALL layers have appended — every layer must write the same
            # slot (the pre-step tail_count) and every layer's attention
            # must see the same in-window depth (tail_count + 1 incl.
            # the current token). Bumping here on the last layer's
            # append made THAT layer's attention read one stale tail row
            # and drop the newest packed token (advisor r3 finding 1).
            return KVCache(self.kv, self.lengths, self.quant_scales,
                           self.kv_heads, self.head_dim, tail,
                           self.tail_count, self.carry, self.carry_s)
        packed, new_scales = self._pack(k_new, v_new)

        if self.stacked:
            # ``layer`` may be a traced index (scan body).
            packed = packed.astype(self.kv.dtype)
            if position is None:
                def upd(buf_l, new, pos):
                    return jax.lax.dynamic_update_slice(buf_l, new,
                                                        (pos, 0, 0))

                layer_buf = jax.lax.dynamic_index_in_dim(
                    self.kv, layer, 0, keepdims=False)
                updated = jax.vmap(upd)(layer_buf, packed, self.lengths)
                kv = jax.lax.dynamic_update_index_in_dim(
                    self.kv, updated, layer, 0)
            else:
                kv = jax.lax.dynamic_update_slice(
                    self.kv, packed[None], (layer, 0, position, 0, 0))
            return KVCache(kv, self.lengths, self.quant_scales,
                           self.kv_heads, self.head_dim, self.tail,
                           self.tail_count)

        buf = self.kv[layer]
        scales = self.quant_scales
        if scales is not None:
            new_buf, s_new = _quant_append(buf, scales[layer], packed,
                                           new_scales, position,
                                           self.lengths)
            kv = list(self.kv)
            kv[layer] = new_buf
            sc = list(scales)
            sc[layer] = s_new
            carry, carry_s = self.carry, self.carry_s
            if carry is not None:
                # Packed-cache RMW appends on a carry cache (cold
                # paths: prefix suffix chunks, position appends — tail
                # decode never lands here) move the slot's last partial
                # row, so refresh the carry from the updated buffers to
                # keep the whole-row-write flush exact.
                endw = (self.lengths if position is None
                        else jnp.full_like(self.lengths, position)) + t
                r4 = jnp.clip((endw - 1) // 4, 0, new_buf.shape[1] - 1)
                r2 = jnp.clip((endw - 1) // 2, 0, s_new.shape[1] - 1)
                carry = list(carry)
                carry_s = list(carry_s)
                carry[layer] = jnp.take_along_axis(
                    new_buf, r4[:, None, None, None], axis=1)
                carry_s[layer] = jnp.take_along_axis(
                    s_new, r2[:, None, None, None], axis=1)
            return KVCache(kv, self.lengths, sc, self.kv_heads,
                           self.head_dim, self.tail, self.tail_count,
                           carry, carry_s)

        packed = packed.astype(buf.dtype)
        # The float row is [1, 2, KVH*D]; the Pallas DMA needs a
        # 128-lane-aligned last dim.
        lanes_ok = (packed.shape[-1] % _LANE == 0
                    and buf.dtype.itemsize >= 2)

        if position is None and t == 1 and lanes_ok:
            # Decode append at per-sequence depths: the Pallas in-place
            # kernel writes B contiguous row DMAs instead of XLA's
            # scatter (see module docstring). Positions clamp to the
            # last row: the decode program runs for EVERY batch slot,
            # including finished ones whose lengths keep advancing until
            # the slot is reused — their writes must stay in bounds (DMA
            # does not clamp the way dynamic_update_slice does).
            from ..kernels.cache import cache_append
            pos = jnp.minimum(self.lengths, buf.shape[1] - 1)
            (new_buf,) = cache_append(pos, (buf,), (packed,))
        elif position is None:
            def upd(b_buf, new, pos):
                return jax.lax.dynamic_update_slice(
                    b_buf, new, (pos,) + (0,) * (b_buf.ndim - 1))
            new_buf = jax.vmap(upd)(buf, packed, self.lengths)
        else:
            new_buf = jax.lax.dynamic_update_slice(
                buf, packed, (0, position) + (0,) * (buf.ndim - 2))

        kv = list(self.kv)
        kv[layer] = new_buf
        return KVCache(kv, self.lengths, None, self.kv_heads,
                       self.head_dim)

    def insert_sequence(self, other: "KVCache", slot, length, src_slot=0):
        """Copy sequence ``src_slot`` of ``other`` into batch slot
        ``slot`` — the continuous-batching admission primitive: a freshly
        prefilled request takes over a finished sequence's slot (batched
        admission prefills several prompts at once and scatters them)."""
        if self.stacked:
            src = jax.lax.dynamic_slice_in_dim(other.kv, src_slot, 1, 1)
            kv = jax.lax.dynamic_update_slice(
                self.kv, src.astype(self.kv.dtype), (0, slot, 0, 0, 0))
            return KVCache(kv, self.lengths.at[slot].set(length),
                           self.quant_scales, self.kv_heads,
                           self.head_dim, self.tail, self.tail_count)

        def pick(src):
            return jax.lax.dynamic_slice_in_dim(src, src_slot, 1, 0)

        kv = [jax.lax.dynamic_update_slice(
                  buf, pick(src).astype(buf.dtype), (slot, 0, 0, 0))
              for buf, src in zip(self.kv, other.kv)]
        scales = self.quant_scales
        if scales is not None:
            scales = [jax.lax.dynamic_update_slice(s, pick(o),
                                                   (slot, 0, 0, 0))
                      for s, o in zip(scales, other.quant_scales)]
        carry, carry_s = self.carry, self.carry_s
        if carry is not None:
            # Initialize the slot's carry rows from the freshly
            # inserted packed data: the first flush's window starts at
            # this length, so its leading partial-row bytes (tokens
            # [4*(length//4), length)) must come from carry. length is
            # >= 1 for every admitted prompt; row indices clamp for
            # the degenerate 0 case (carry is then never read).
            r4 = jnp.maximum(length - 1, 0) // 4
            r2 = jnp.maximum(length - 1, 0) // 2
            carry, carry_s = list(carry), list(carry_s)
            for li in range(len(carry)):
                row = jax.lax.dynamic_slice(
                    kv[li], (slot, r4, 0, 0),
                    (1, 1) + kv[li].shape[2:])
                carry[li] = jax.lax.dynamic_update_slice(
                    carry[li], row, (slot, 0, 0, 0))
                srow = jax.lax.dynamic_slice(
                    scales[li], (slot, r2, 0, 0),
                    (1, 1) + scales[li].shape[2:])
                carry_s[li] = jax.lax.dynamic_update_slice(
                    carry_s[li], srow, (slot, 0, 0, 0))
        # Tail fields pass through untouched: admissions happen with a
        # flushed (empty) window, so the rows are dead.
        return KVCache(kv, self.lengths.at[slot].set(length), scales,
                       self.kv_heads, self.head_dim, self.tail,
                       self.tail_count, carry, carry_s)

    def advance(self, n):
        """Advance per-sequence lengths by ``n`` committed tokens. For a
        tail-buffered cache a single-token advance IS a decode step whose
        token entered the window (append's tail path is the only t == 1
        write path), so the window fill advances with it; multi-token
        advances (prefill / chunked verify) wrote the packed cache
        directly and leave the window untouched."""
        tc = self.tail_count
        if self.tail is not None and n == 1:
            tc = tc + 1
        return KVCache(self.kv, self.lengths + n, self.quant_scales,
                       self.kv_heads, self.head_dim, self.tail, tc,
                       self.carry, self.carry_s)

    def flush_tail(self, t: int):
        """Quantize the first ``t`` tail-window rows of every layer and
        chunk-append them into the packed cache at each sequence's own
        depth (``lengths`` already count the tail tokens, so the write
        offsets are ``lengths - t``). ``t`` must be static (the engine
        tracks the window fill on the host / flushes at fixed strides
        inside jitted bursts). Equivalent to having RMW-appended each
        token at decode time up to the bf16 rounding the buffered rows
        pass through (the per-(token, head) scale math is elementwise,
        so batching it over the window adds no further difference).
        Returns the cache with ``tail_count`` reset to 0 (tail rows stay
        — they are dead until overwritten)."""
        assert self.tail is not None
        t = int(t)
        if t == 0:
            return KVCache(self.kv, self.lengths, self.quant_scales,
                           self.kv_heads, self.head_dim, self.tail,
                           jnp.zeros((), jnp.int32), self.carry,
                           self.carry_s)
        import os
        from ..kernels.cache import cache_flush_quant, cache_flush_rows
        # Carry-row mode (NOTES_ROUND5 A2, default on): whole-row
        # WRITES only — the window's leading partial-row bytes merge in
        # from the carry buffers instead of a read-modify-write, and
        # trailing bytes past the newest token are attention-masked
        # garbage the NEXT flush rewrites from carry. Halves the flush
        # kernel's DMA count (2/seq vs 4/seq) and removes the read
        # round trip. RTEN_FLUSH_CARRY=0 restores the RMW kernel.
        carry_mode = (self.carry is not None
                      and os.environ.get("RTEN_FLUSH_CARRY", "1")
                      != "0")
        b = self.tail[0].shape[0]
        kvh, d = self.kv_heads, self.head_dim
        f = kvh * d
        cap4 = self.kv[0].shape[1]
        cap2 = self.quant_scales[0].shape[1]
        cap = cap4 * 4
        # Window geometry (shared by all layers): t tokens land at each
        # sequence's own offset; the covering row windows start at a
        # clipped row with a small per-sequence byte/halfword shift.
        # The window must cover shift + t bytes — w4 = t//4 + 1 only
        # covered that for t % 4 == 0 (a partial pre-admission flush
        # with t % 4 != 0 silently DROPPED the tokens past the last
        # window row — round-5 bug fix); the max shift after the
        # capacity-edge clip is 4*w4 - t (<= 7), handled by the
        # two-stage funnel below.
        w4 = (t + 7) // 4
        w2 = (t + 3) // 2
        offs = jnp.clip(self.lengths - t, 0, cap - t)
        row0 = jnp.clip(offs // 4, 0, cap4 - w4)
        shift = offs - row0 * 4
        srow0 = jnp.clip(offs // 2, 0, cap2 - w2)
        sshift = offs - srow0 * 2
        # Carry fast path: whole-row writes need every pre-existing
        # byte to live in the single carry row — true iff shift <= 4,
        # i.e. t % 4 == 0 (then 4*w4 - t == 4). Partial flushes (cold:
        # only before admissions) take the RMW kernel and refresh the
        # carry from the flushed buffers afterwards.
        carry_fast = carry_mode and t % 4 == 0

        kv = list(self.kv)
        sc = list(self.quant_scales)
        carry = list(self.carry) if self.carry is not None else None
        carry_s = (list(self.carry_s) if self.carry_s is not None
                   else None)
        for layer in range(len(kv)):
            rows = self.tail[layer][:, :t]             # [B, t, 2, F]
            k_t = rows[:, :, 0].reshape(b, t, kvh, d).astype(jnp.float32)
            v_t = rows[:, :, 1].reshape(b, t, kvh, d).astype(jnp.float32)
            k_q, k_s = _quantize_tokens(k_t)
            v_q, v_s = _quantize_tokens(v_t)
            bytes_kv = jnp.stack(
                [k_q.astype(jnp.int32).reshape(b, t, f),
                 v_q.astype(jnp.int32).reshape(b, t, f)], axis=1)
            srows = jnp.ones((b, t, 1, SCALE_LANES), SCALE_DTYPE)
            srows = srows.at[..., 0, 0:kvh].set(k_s)
            srows = srows.at[..., 0,
                             VSCALE_OFF:VSCALE_OFF + kvh].set(v_s)
            # Per-sequence byte shift of the packed window WITHOUT
            # materializing one packed variant per shift (5x the pack
            # cost): pack once at shift 0, then derive the shifted rows
            # arithmetically in two stages — a sub-row bit funnel for
            # shift % 4 (row r of the s-byte-shifted pack is
            # (p0[r] << 8s) | (p0[r-1] >>> (32-8s))) and a whole-row
            # roll for shift // 4 (shift can reach 4*w4 - t <= 7 after
            # the capacity-edge clip). Shift amounts broadcast per
            # sequence, so this is ~7 elementwise passes total.
            placed = jnp.pad(bytes_kv, ((0, 0), (0, 0),
                                        (0, w4 * 4 - t), (0, 0)))
            p0 = pack_int8_tokens(placed).swapaxes(1, 2)  # [B,w4,2,F]
            prev = jnp.pad(p0, ((0, 0), (1, 0), (0, 0),
                                (0, 0)))[:, :w4]
            r8 = ((shift % 4) * 8)[:, None, None, None]
            # >>> by (32-r8) is only used for r8 in [8, 24] (the 0 edge
            # goes through the select), but the amount must stay
            # in-range for the lanes where it is unused too.
            safe = jnp.clip(32 - r8, 1, 31)
            mid = jnp.left_shift(p0, r8) | jax.lax.shift_right_logical(
                prev, safe)
            fun = jnp.where(r8 == 0, p0, mid)
            fun_prev = jnp.pad(fun, ((0, 0), (1, 0), (0, 0),
                                     (0, 0)))[:, :w4]
            new_rows = jnp.where(
                (shift // 4)[:, None, None, None] == 1, fun_prev, fun)
            sp0 = pack_bf16_rows(
                jnp.pad(srows[:, :, 0, :].astype(jnp.float32),
                        ((0, 0), (0, w2 * 2 - t), (0, 0)))
            )[:, :, None, :]                              # [B,w2,1,SL]
            sprev = jnp.pad(sp0, ((0, 0), (1, 0), (0, 0),
                                  (0, 0)))[:, :w2]
            sr = (sshift % 2)[:, None, None, None]
            smid = jnp.left_shift(sp0, 16) | jax.lax.shift_right_logical(
                sprev, 16)
            sfun = jnp.where(sr == 0, sp0, smid)
            sfun_prev = jnp.pad(sfun, ((0, 0), (1, 0), (0, 0),
                                       (0, 0)))[:, :w2]
            new_srows = jnp.where(
                (sshift // 2)[:, None, None, None] == 1, sfun_prev,
                sfun)
            if carry_fast:
                # Merge the carry bytes into window row 0: byte k (of
                # 4 tokens/word) comes from carry iff k < shift — the
                # slot's pre-existing partial-row tokens [row0*4, offs).
                # shift == 4 (capacity-edge clip) takes the whole carry
                # row; shift == 0 takes none.
                m32 = jnp.where(
                    shift == 0, 0,
                    jnp.where(shift >= 4, jnp.int32(-1),
                              (jnp.int32(1) << (8 * jnp.clip(
                                  shift, 1, 3))) - 1))[:, None, None]
                c_row = self.carry[layer][:, 0]          # [B, 2, F]
                new_rows = new_rows.at[:, 0].set(
                    (c_row & m32) | (new_rows[:, 0] & ~m32))
                m16 = jnp.where(
                    sshift == 0, 0,
                    jnp.where(sshift >= 2, jnp.int32(-1),
                              jnp.int32(0xFFFF)))[:, None, None]
                cs_row = self.carry_s[layer][:, 0]       # [B, 1, SL]
                new_srows = new_srows.at[:, 0].set(
                    (cs_row & m16) | (new_srows[:, 0] & ~m16))
                # Next carry = the merged row holding the newest token
                # (offs + t - 1); the trailing garbage bytes it also
                # holds are masked at the next merge by shift'.
                end = jnp.clip(self.lengths - t, 0, cap - t) + t
                i4 = ((end - 1) // 4 - row0)[:, None, None, None]
                i2 = ((end - 1) // 2 - srow0)[:, None, None, None]
                carry[layer] = jnp.take_along_axis(new_rows, i4, axis=1)
                carry_s[layer] = jnp.take_along_axis(new_srows, i2,
                                                     axis=1)
                kv[layer], sc[layer] = cache_flush_rows(
                    row0, srow0, kv[layer], sc[layer], new_rows,
                    new_srows)
            else:
                kv[layer], sc[layer] = cache_flush_quant(
                    row0, srow0, shift, sshift, kv[layer], sc[layer],
                    new_rows, new_srows, t=t)
                if carry_mode:
                    # Partial (t % 4 != 0) flush took the RMW kernel:
                    # refresh the carry rows from the flushed buffers
                    # so the next whole-row flush stays exact. Cold
                    # path (only before admissions).
                    end = jnp.clip(self.lengths - t, 0, cap - t) + t
                    g4 = ((end - 1) // 4)[:, None, None, None]
                    g2 = ((end - 1) // 2)[:, None, None, None]
                    carry[layer] = jnp.take_along_axis(kv[layer], g4,
                                                       axis=1)
                    carry_s[layer] = jnp.take_along_axis(sc[layer], g2,
                                                         axis=1)
        return KVCache(kv, self.lengths, sc, self.kv_heads,
                       self.head_dim, self.tail,
                       jnp.zeros((), jnp.int32), carry, carry_s)

    # -- reads ---------------------------------------------------------------

    def fused_layer(self, layer):
        """Raw token-major buffer [B, cap, 2, KVH*D] for Pallas consumers
        (flash_decode reads K/V planes via BlockSpec index maps)."""
        if self.stacked:
            return jax.lax.dynamic_index_in_dim(self.kv, layer, 0,
                                                keepdims=False)
        return self.kv[layer]

    def layer_kv(self, layer):
        """Dequantized K/V views [B, KVH, cap, D] for jnp attention.
        These are reshape+transpose views of the token-major buffer — XLA
        folds them into the consuming dot. ``layer`` may be traced in
        stacked mode."""
        buf = self.fused_layer(layer)
        b, cap = buf.shape[0], self.capacity
        kvh, d = self.kv_heads, self.head_dim

        if self.quant_scales is not None:
            kq = unpack_int8_tokens(buf[:, :, 0])      # [B, cap, KVH*D]
            vq = unpack_int8_tokens(buf[:, :, 1])
            s = self.quant_scales[layer][:, :, 0]
            if s.dtype == jnp.int32:
                s = unpack_bf16_rows(s)            # [B, cap, G*128]
            if s.shape[-1] == SCALE_LANES:
                s_k = s[:, :, :kvh]
                s_v = s[:, :, VSCALE_OFF:VSCALE_OFF + kvh]
            else:
                # TP lane-group layout (scale_lane_groups > 1): head h's
                # scale lives in lane group h // kvh_l at offset
                # h % kvh_l — gather the global [B, cap, KVH] rows for a
                # GSPMD (non-island) read such as a prefix-cache suffix
                # chunk's attention.
                groups = s.shape[-1] // SCALE_LANES
                kvh_l = kvh // groups
                s_k = jnp.concatenate(
                    [s[:, :, g * SCALE_LANES:g * SCALE_LANES + kvh_l]
                     for g in range(groups)], axis=-1)
                s_v = jnp.concatenate(
                    [s[:, :, g * SCALE_LANES + VSCALE_OFF:
                       g * SCALE_LANES + VSCALE_OFF + kvh_l]
                     for g in range(groups)], axis=-1)

            def deq(x, s_rows):
                x = x.reshape(b, cap, kvh, d).astype(jnp.float32)
                return (x * s_rows[..., None]).transpose(0, 2, 1, 3)

            return deq(kq, s_k), deq(vq, s_v)

        def split(plane):
            x = buf[:, :, plane].reshape(b, cap, kvh, d)
            return x.transpose(0, 2, 1, 3)

        return split(0), split(1)
