"""Quantization math: per-tensor / per-channel INT8, group-wise INT4
weight packing, and ONNX-compatible (de)quantize semantics.

ONNX reference points: QuantizeLinear / DequantizeLinear /
DynamicQuantizeLinear (https://onnx.ai/onnx/operators/). The INT4 scheme
is offset-binary nibbles (stored = q + 8) packed two-per-byte along the
output-channel axis, with per-(K-group, channel) float scales — the
layout consumed directly by the Pallas dequant-matmul kernel.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

INT4_GROUP = 128  # default K-group size for group-wise int4 scales


def quantize(x, scale, zero_point=None, dtype=jnp.int8, axis=None):
    """ONNX QuantizeLinear: y = saturate(round(x / scale) + zero_point).

    ``scale``/``zero_point`` may be scalars or per-axis vectors (then
    ``axis`` selects the broadcast axis).
    """
    scale = jnp.asarray(scale)
    if axis is not None and scale.ndim == 1:
        shape = [1] * jnp.asarray(x).ndim
        shape[axis] = -1
        scale = scale.reshape(shape)
        if zero_point is not None:
            zero_point = jnp.asarray(zero_point).reshape(shape)
    y = jnp.round(x / scale)
    if zero_point is not None:
        y = y + zero_point.astype(y.dtype)
    info = jnp.iinfo(dtype)
    return jnp.clip(y, info.min, info.max).astype(dtype)


def dequantize(q, scale, zero_point=None, axis=None):
    """ONNX DequantizeLinear: y = (q - zero_point) * scale."""
    scale = jnp.asarray(scale)
    q32 = jnp.asarray(q).astype(jnp.int32)
    if axis is not None and scale.ndim == 1:
        shape = [1] * q32.ndim
        shape[axis] = -1
        scale = scale.reshape(shape)
        if zero_point is not None:
            zero_point = jnp.asarray(zero_point).astype(jnp.int32).reshape(shape)
    if zero_point is not None:
        q32 = q32 - jnp.asarray(zero_point).astype(jnp.int32)
    return q32.astype(jnp.float32) * scale


def dynamic_quantize(x):
    """ONNX DynamicQuantizeLinear: uint8 quantization with range-derived
    scale/zero-point (zero always exactly representable).

    Returns (y_uint8, scale, zero_point_uint8)."""
    x = jnp.asarray(x)
    x_min = jnp.minimum(jnp.min(x), 0.0)
    x_max = jnp.maximum(jnp.max(x), 0.0)
    scale = (x_max - x_min) / 255.0
    scale = jnp.where(scale == 0, 1.0, scale)
    zp = jnp.clip(jnp.round(-x_min / scale), 0, 255).astype(jnp.uint8)
    y = jnp.clip(jnp.round(x / scale) + zp.astype(jnp.float32), 0, 255)
    return y.astype(jnp.uint8), scale.astype(jnp.float32), zp


def abs_max_quantize_int8(w, axis=0):
    """Symmetric per-channel int8 (weights): scale = absmax/127 along
    ``axis`` (the contraction axis). Returns (q_int8, scales)."""
    w = np.asarray(w, dtype=np.float32)
    absmax = np.max(np.abs(w), axis=axis, keepdims=True)
    scales = np.where(absmax == 0, 1.0, absmax / 127.0).astype(np.float32)
    q = np.clip(np.round(w / scales), -127, 127).astype(np.int8)
    return q, np.squeeze(scales, axis=axis)


INT4_PACK_TILE = 256  # column tile for planar nibble packing


def pack_int4(q, tile=INT4_PACK_TILE):
    """Pack offset-binary int4 values (ints in [-8, 7]) two-per-byte along
    the LAST axis in a *tile-planar* layout: columns are grouped in tiles
    of ``tile``; within each tile, the low nibble of byte j holds column
    ``j`` and the high nibble holds column ``j + tile/2``. Tile-planar
    (rather than interleaved) packing means unpacking a 256-column kernel
    block is a lane-contiguous concatenate — no cross-lane shuffles."""
    q = np.asarray(q)
    n = q.shape[-1]
    assert n % tile == 0, f"last dim {n} must be a multiple of {tile}"
    u = (q + 8).astype(np.uint8).reshape(*q.shape[:-1], n // tile, tile)
    lo = u[..., :tile // 2]
    hi = u[..., tile // 2:]
    packed = (hi << 4 | lo).astype(np.uint8)
    return packed.reshape(*q.shape[:-1], n // 2)


def unpack_int4(packed, tile=INT4_PACK_TILE):
    """Inverse of :func:`pack_int4` (jnp, kernel-safe). Returns int8 in
    [-8, 7] with last axis doubled."""
    p = jnp.asarray(packed)
    half = tile // 2
    n_half = p.shape[-1]
    p = p.reshape(*p.shape[:-1], n_half // half, half)
    lo = jnp.bitwise_and(p, 0xF).astype(jnp.int8) - 8
    hi = jnp.right_shift(p, 4).astype(jnp.int8) - 8
    out = jnp.concatenate([lo, hi], axis=-1)
    return out.reshape(*out.shape[:-2], n_half * 2)


def quantize_int4_groupwise(w, group=INT4_GROUP):
    """Group-wise symmetric int4 quantization of a weight matrix [K, N]:
    per (K-group, column) scale = absmax/7. K is padded to a multiple of
    ``group`` and N to a multiple of the pack tile. Returns
    (packed_uint8 [K, N//2], scales [K//group, N])."""
    w = np.asarray(w, dtype=np.float32)
    k, n = w.shape
    k_pad = (-k) % group
    n_pad = (-n) % INT4_PACK_TILE
    if k_pad or n_pad:
        w = np.pad(w, ((0, k_pad), (0, n_pad)))
        k, n = w.shape
    grouped = w.reshape(k // group, group, n)
    absmax = np.max(np.abs(grouped), axis=1, keepdims=True)
    scales = np.where(absmax == 0, 1.0, absmax / 7.0).astype(np.float32)
    q = np.clip(np.round(grouped / scales), -8, 7).astype(np.int8)
    q = q.reshape(k, n)
    return pack_int4(q), scales[:, 0, :]


def dequantize_int4_groupwise(packed, scales, group=INT4_GROUP):
    """Reference (jnp) dequantization of group-wise int4 weights."""
    q = unpack_int4(packed)                       # [K, N] int8
    k, n = q.shape
    s = jnp.repeat(scales, group, axis=0)         # [K, N]
    return q.astype(jnp.float32) * s


def pack_int4_words(q, tile=INT4_PACK_TILE):
    """WORD-packed int4 layout (round 4): offset-binary nibbles packed so
    the in-kernel unpack is two int32 mask/shift ops plus a FREE Mosaic
    sublane bitcast — the same inverse-of-bitcast discipline that made
    the token-packed int8 KV cache free to unpack
    (generate/kv_cache.py:28-52).

    q: int values in [-8, 7], shape [K, N] with K % 4 == 0 and
    N % tile == 0. Layout: as in :func:`pack_int4`, column j's nibble
    sits in the LOW nibble and column j + tile/2's in the HIGH nibble of
    one byte (tile-planar, lane-contiguous concat on unpack); four
    consecutive K-rows' bytes then pack little-endian into one int32
    word, so ``pltpu.bitcast(words, int8)`` restores the byte rows in K
    order. Returns int32 [K/4, N/2]."""
    q = np.asarray(q)
    k, n = q.shape
    assert k % 4 == 0 and n % tile == 0
    u = (q + 8).astype(np.uint32).reshape(k, n // tile, tile)
    byte = u[..., :tile // 2] | (u[..., tile // 2:] << 4)  # [K, nt, t/2]
    byte = byte.reshape(k, n // 2)
    g = byte.reshape(k // 4, 4, n // 2)
    words = (g[:, 0] | (g[:, 1] << 8) | (g[:, 2] << 16)
             | (g[:, 3] << 24))
    return words.astype(np.int32)


def unpack_int4_words(words, tile=INT4_PACK_TILE):
    """Inverse of :func:`pack_int4_words` (jnp reference). int32
    [K/4, N/2] → int8 values in [-8, 7], [K, N]."""
    w = jnp.asarray(words)
    r, n_half = w.shape
    bytes_ = jnp.stack([(w >> (8 * i)) & 0xFF for i in range(4)],
                       axis=1).reshape(4 * r, n_half)
    half = tile // 2
    b = bytes_.reshape(4 * r, n_half // half, half)
    lo = (b & 0xF) - 8
    hi = ((b >> 4) & 0xF) - 8
    return jnp.concatenate([lo, hi], axis=-1).reshape(
        4 * r, n_half * 2).astype(jnp.int8)


def quantize_int4_words(w, group=INT4_GROUP):
    """Group-wise symmetric int4 quantization into the WORD-packed
    layout. Returns (words int32 [K/4, N//2], scales f32 [K//group, N]).
    K additionally pads to a multiple of 4 (word height)."""
    w = np.asarray(w, dtype=np.float32)
    k, n = w.shape
    k_pad = (-k) % max(group, 4)
    n_pad = (-n) % INT4_PACK_TILE
    if k_pad or n_pad:
        w = np.pad(w, ((0, k_pad), (0, n_pad)))
        k, n = w.shape
    grouped = w.reshape(k // group, group, n)
    absmax = np.max(np.abs(grouped), axis=1, keepdims=True)
    scales = np.where(absmax == 0, 1.0, absmax / 7.0).astype(np.float32)
    q = np.clip(np.round(grouped / scales), -8, 7).astype(np.int8)
    return pack_int4_words(q.reshape(k, n)), scales[:, 0, :]


def dequantize_int4_words(words, scales, group=INT4_GROUP):
    """Reference (jnp) dequantization of word-packed int4 weights."""
    q = unpack_int4_words(words)                  # [K, N] int8
    k, n = q.shape
    return (q.astype(jnp.float32).reshape(k // group, group, n)
            * jnp.asarray(scales, jnp.float32)[:, None, :]).reshape(k, n)
