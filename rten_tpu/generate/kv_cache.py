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

Quantized layout (byte-planar int32 packing): Mosaic rejects row DMAs of
int8 buffers (sub-word sublane packing), so the int8 cache is stored as
int32 ``[B, cap, 1, KVH*D/2]`` where lane ``j`` packs four int8 values —
``K[j] | K[j+F/2]<<8 | V[j]<<16 | V[j+F/2]<<24`` (F = KVH*D). Unpacking
is shift+sign-extend plus a lane-contiguous concat that restores
canonical order (the same planar trick as the int4 GEMM's nibble tiles,
kernels/gemm.py). Scales live in f32 ``[B, cap, 1, 128]`` rows (K scales
at lanes [0, KVH), V at [64, 64+KVH)) so the decode append is ONE
two-buffer DMA — the earlier int8 fallback to XLA's scatter cost more
than the bandwidth the quantization saved (~2.3 ms/step at batch 64).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

# Mosaic DMA slices must be 128-lane aligned on the last dim.
_LANE = 128
# Quantized-cache scale rows: f32 [1, 128] per token; V scales offset.
SCALE_LANES = 128
VSCALE_OFF = 64


def pack_int8_planar(kq, vq):
    """Byte-planar pack: ``kq``/``vq`` [..., F] int8-range ints →
    [..., 1, F//2] int32 (lane j = K[j] | K[j+F/2]<<8 | V[j]<<16 |
    V[j+F/2]<<24). Unpacks to canonical order with two lane-contiguous
    concats (no shuffles)."""
    f = kq.shape[-1]
    h2 = f // 2

    def byte(x):
        return jnp.bitwise_and(x.astype(jnp.int32), 0xFF)

    lane = (byte(kq[..., :h2]) | (byte(kq[..., h2:]) << 8)
            | (byte(vq[..., :h2]) << 16)
            | (vq[..., h2:].astype(jnp.int32) << 24))
    return lane[..., None, :]


def unpack_int8_planar(packed):
    """Inverse of :func:`pack_int8_planar`: [..., 1, F//2] int32 →
    (k [..., F], v [..., F]) int32, sign-extended."""
    x = packed[..., 0, :]
    k = jnp.concatenate([(x << 24) >> 24, (x << 16) >> 24], axis=-1)
    v = jnp.concatenate([(x << 8) >> 24, x >> 24], axis=-1)
    return k, v


def _quantize_tokens(x):
    """Per-(token, head) symmetric int8: scale = absmax/127 over head_dim.
    x: [B, T, KVH, D] → (q [B, T, KVH, D], scales [B, T, KVH])."""
    absmax = jnp.max(jnp.abs(x), axis=-1)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(x / scale[..., None]), -127, 127)
    return q, scale


@jax.tree_util.register_pytree_node_class
@dataclass
class KVCache:
    kv: object          # per layer [B, cap, 2, KVH*D]; stacked: [L, ...]
    lengths: object     # [B] int32
    quant_scales: object = None  # per layer [B, cap, 2, KVH] f32, or None
    kv_heads: int = 1
    head_dim: int = 1

    # -- pytree plumbing (so caches flow through jit/donation) -------------

    def tree_flatten(self):
        return ((self.kv, self.lengths, self.quant_scales),
                (self.kv_heads, self.head_dim))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    # -- construction ------------------------------------------------------

    @staticmethod
    def create(batch, n_layers, kv_heads, capacity, head_dim,
               dtype=jnp.float32, quantized=False, stacked=False):
        """``stacked=True`` holds all layers in one [L, B, cap, 2, KVH*D]
        array (required for `lax.scan` over layers, where the layer index
        is traced); the default is one array per layer."""
        if quantized:
            assert not stacked, "quantized+stacked not supported yet"
            f = kv_heads * head_dim
            assert f % 2 == 0 and kv_heads <= VSCALE_OFF
            shape = (batch, capacity, 1, f // 2)          # byte-planar
            kv = [jnp.zeros(shape, jnp.int32) for _ in range(n_layers)]
            sshape = (batch, capacity, 1, SCALE_LANES)
            scales = [jnp.ones(sshape, jnp.float32)
                      for _ in range(n_layers)]
            return KVCache(kv, jnp.zeros(batch, jnp.int32), scales,
                           kv_heads, head_dim)
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
        return self.kv.shape[2] if self.stacked else self.kv[0].shape[1]

    @property
    def n_layers(self):
        return self.kv.shape[0] if self.stacked else len(self.kv)

    def with_lengths(self, lengths):
        return KVCache(self.kv, jnp.asarray(lengths, jnp.int32),
                       self.quant_scales, self.kv_heads, self.head_dim)

    # -- updates -----------------------------------------------------------

    def _pack(self, k_new, v_new):
        """[B, KVH, T, D] k/v → token-major rows: float caches
        [B, T, 2, KVH*D]; quantized caches byte-planar int32
        [B, T, 1, KVH*D/2] + scale rows [B, T, 1, 128]."""
        b, kvh, t, d = k_new.shape
        k_t = k_new.transpose(0, 2, 1, 3)           # [B, T, KVH, D]
        v_t = v_new.transpose(0, 2, 1, 3)
        if self.quant_scales is not None:
            k_q, k_s = _quantize_tokens(k_t)
            v_q, v_s = _quantize_tokens(v_t)
            packed = pack_int8_planar(
                k_q.astype(jnp.int32).reshape(b, t, kvh * d),
                v_q.astype(jnp.int32).reshape(b, t, kvh * d))
            scales = jnp.ones((b, t, 1, SCALE_LANES), jnp.float32)
            scales = scales.at[..., 0, 0:kvh].set(k_s)
            scales = scales.at[..., 0,
                               VSCALE_OFF:VSCALE_OFF + kvh].set(v_s)
            return packed, scales
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
                           self.kv_heads, self.head_dim)

        buf = self.kv[layer]
        packed = packed.astype(buf.dtype)
        scales = self.quant_scales
        quant = scales is not None
        # The quantized row is [1, KVH*D/2] int32 (byte-planar); the
        # float row is [1, 2, KVH*D]. Either way the Pallas DMA needs a
        # 128-lane-aligned last dim.
        lanes_ok = (packed.shape[-1] % _LANE == 0
                    and (quant or buf.dtype.itemsize >= 2))
        scales_done = False

        if position is None and t == 1 and lanes_ok:
            # Decode append at per-sequence depths: the Pallas in-place
            # kernel writes B contiguous row DMAs instead of XLA's
            # scatter (see module docstring). Quantized caches append
            # the kv row AND the scale row in the same kernel call.
            # Positions clamp to the last row: the decode program runs
            # for EVERY batch slot, including finished ones whose lengths
            # keep advancing until the slot is reused — their writes must
            # stay in bounds (DMA does not clamp the way
            # dynamic_update_slice does).
            from ..kernels.cache import cache_append
            pos = jnp.minimum(self.lengths, buf.shape[1] - 1)
            if quant:
                new_buf, s_new = cache_append(
                    pos, (buf, scales[layer]), (packed, new_scales))
                scales = list(scales)
                scales[layer] = s_new
                scales_done = True
            else:
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
        if quant and not scales_done:
            sbuf = scales[layer]
            if position is None:
                if t == 1:
                    s_new = sbuf.at[jnp.arange(b), self.lengths].set(
                        new_scales[:, 0])
                else:
                    def supd(bb, new, pos):
                        return jax.lax.dynamic_update_slice(bb, new,
                                                            (pos, 0, 0))
                    s_new = jax.vmap(supd)(sbuf, new_scales, self.lengths)
            else:
                s_new = jax.lax.dynamic_update_slice(
                    sbuf, new_scales, (0, position, 0, 0))
            scales = list(scales)
            scales[layer] = s_new
        return KVCache(kv, self.lengths, scales, self.kv_heads,
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
                           self.quant_scales, self.kv_heads, self.head_dim)

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
        return KVCache(kv, self.lengths.at[slot].set(length), scales,
                       self.kv_heads, self.head_dim)

    def advance(self, n):
        return KVCache(self.kv, self.lengths + n, self.quant_scales,
                       self.kv_heads, self.head_dim)

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
        b, cap = buf.shape[0], buf.shape[1]
        kvh, d = self.kv_heads, self.head_dim

        if self.quant_scales is not None:
            kq, vq = unpack_int8_planar(buf)           # [B, cap, KVH*D]
            s = self.quant_scales[layer][:, :, 0]      # [B, cap, 128]

            def deq(x, s_rows):
                x = x.reshape(b, cap, kvh, d).astype(jnp.float32)
                return (x * s_rows[..., None]).transpose(0, 2, 1, 3)

            return (deq(kq, s[:, :, :kvh]),
                    deq(vq, s[:, :, VSCALE_OFF:VSCALE_OFF + kvh]))

        def split(plane):
            x = buf[:, :, plane].reshape(b, cap, kvh, d)
            return x.transpose(0, 2, 1, 3)

        return split(0), split(1)
