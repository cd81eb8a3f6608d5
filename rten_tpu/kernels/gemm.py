"""Pallas TPU quantized GEMM kernels.

The TPU re-imagining of the reference's BLIS-style blocked GEMM
(``src/gemm.rs``: kc/mc/nc cache blocking, packed panels, per-arch
microkernels): here the grid/BlockSpec machinery *is* the blocking
(HBM→VMEM tiles), the MXU is the microkernel, and dequantization fuses
into the tile loop so quantized weights are only expanded in VMEM —
never materialized in HBM (the bandwidth win that makes INT8/INT4 decode
fast).

Kernels:

* ``matmul_int8``  — int8 × int8 → f32, symmetric scales (per-tensor
  activation scale, per-channel weight scales), K-blocked int32
  accumulation in VMEM scratch.
* ``matmul_int4``  — f32/bf16 activations × group-wise int4 packed
  weights; nibbles unpacked and scaled in VMEM, then MXU matmul.

Both run in ``interpret`` mode off-TPU so CPU tests exercise the same
code path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .quant import INT4_GROUP


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x, m):
    return (x + m - 1) // m * m


def _pad_to(x, rows, cols):
    r, c = x.shape
    if r == rows and c == cols:
        return x
    return jnp.pad(x, ((0, rows - r), (0, cols - c)))


# ---------------------------------------------------------------------------
# INT8 GEMM
# ---------------------------------------------------------------------------

def _int8_kernel(x_ref, w_ref, xs_ref, ws_ref, out_ref, acc_ref, *, n_k):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                          preferred_element_type=jnp.int32)

    @pl.when(k == n_k - 1)
    def _():
        # Fused dequant: per-tensor activation scale × per-channel weight
        # scales, applied once per output tile.
        out_ref[:] = (acc_ref[:].astype(jnp.float32)
                      * xs_ref[0, 0] * ws_ref[0, :][None, :])


@jax.jit
def matmul_int8(x, w, x_scale, w_scales):
    """``x`` int8 [M, K] × ``w`` int8 [K, N] → f32 [M, N], scaled by
    ``x_scale`` (scalar) and ``w_scales`` [N] (per-output-channel).

    Delegates to XLA's native int8 ``dot_general`` with the dequant
    epilogue fused: on v5e it beats the hand-tiled Pallas kernel at
    EVERY measured shape (4096³: 408 us = 85.6% of int8 peak vs 501 us
    = 69.6%; 8192×4096²: 86.9% vs 63.0%; 1024³: 54.6% vs 45.0%) — the
    compiler's int8 GEMM emitter owns this op class, exactly like f32/
    bf16 matmuls. The math is identical (int32 accumulation, then one
    f32 scale multiply). :func:`matmul_int8_pallas` keeps the Pallas
    formulation for sweeps/reference."""
    acc = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    scale = (jnp.asarray(x_scale, jnp.float32)
             * jnp.asarray(w_scales, jnp.float32))
    return acc.astype(jnp.float32) * scale[None, :]


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k"))
def matmul_int8_pallas(x, w, x_scale, w_scales, block_m=512, block_n=1024,
                       block_k=1024):
    """Hand-tiled Pallas int8 GEMM (kept for sweeps and as the
    reference formulation; see :func:`matmul_int8` for why the XLA
    dot_general is the production path).

    Default tiles from the v5e sweeps (tools/sweep_int8_gemm.py):
    512×1024 output tiles with K=1024 panels — 69.8% of int8 peak at
    4096³ and the best 1024³ config (bm=1024 edges 4096³ to 70.7% but
    costs 2.6% at 1024³)."""
    m, k = x.shape
    k2, n = w.shape
    assert k == k2, f"contraction mismatch {k} vs {k2}"
    bm = min(block_m, _round_up(m, 32))
    bn = min(block_n, _round_up(n, 128))
    bk = min(block_k, _round_up(k, 128))
    mp, np_, kp = _round_up(m, bm), _round_up(n, bn), _round_up(k, bk)
    x = _pad_to(x, mp, kp)
    w = _pad_to(w, kp, np_)
    ws = jnp.pad(jnp.asarray(w_scales, jnp.float32).reshape(1, -1),
                 ((0, 0), (0, np_ - n)))
    xs = jnp.asarray(x_scale, jnp.float32).reshape(1, 1)
    n_k = kp // bk

    out = pl.pallas_call(
        functools.partial(_int8_kernel, n_k=n_k),
        grid=(mp // bm, np_ // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j, kk: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + 4 * mp * np_,
            transcendentals=0),
        interpret=_interpret(),
    )(x, w, xs, ws)
    return out[:m, :n]


# ---------------------------------------------------------------------------
# INT4 weight-only GEMM
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# INT8 weight-only GEMM (float activations)
# ---------------------------------------------------------------------------

def _int8wo_kernel(x_ref, w_ref, s_ref, out_ref, acc_ref, *, n_k):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # int8 → bf16 is EXACT (|w| ≤ 127), so run the MXU in bf16 and apply
    # the per-column scales to the [M, N] accumulator at the end — K/M
    # times less VPU work than dequantizing the [K, N] weight tile, and
    # no f32 weight transient in VMEM. Activations round to bf16 (they
    # already passed through bf16/int8 layers in quantized models).
    acc_ref[:] += jnp.dot(x_ref[:].astype(jnp.bfloat16),
                          w_ref[:].astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:] * s_ref[0, :][None, :]


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k"))
def matmul_int8_weight_only(x, w, w_scales, block_m=256, block_n=None,
                            block_k=None):
    """``x`` f32 [M, K] × int8 ``w`` [K, N] (per-column ``w_scales``) → f32.
    The decode-friendly int8 path: weights stream at 1 byte/element and
    dequantize in VMEM; activations stay float.

    Decode-size calls (small M) are grid-overhead-bound, not compute-bound
    (v5e profile: the old 256×512 tiles put an 18-program grid on a
    [8,768]×[768,2304] matmul and lost to the plain f32 dot), so the
    default tiling keeps K whole and N wide — a handful of programs, each
    dequantizing one VMEM-resident panel."""
    m, k = x.shape
    k2, n = w.shape
    assert k == k2, f"contraction mismatch {k} vs {k2}"
    if block_n is None:
        # Wide-N default; shrink for large M where the f32 dequant panel
        # (bk × bn × 4B) plus accumulator must still fit VMEM.
        block_n = 1024 if m <= 64 else 256
    if block_k is None:
        block_k = 2048 if m <= 64 else 512
    bm = min(block_m, _round_up(m, 8))
    bn = min(block_n, _round_up(n, 128))
    bk = min(block_k, _round_up(k, 128))
    mp, np_, kp = _round_up(m, bm), _round_up(n, bn), _round_up(k, bk)
    x = _pad_to(x.astype(jnp.float32), mp, kp)
    w = _pad_to(w, kp, np_)
    ws = jnp.pad(jnp.asarray(w_scales, jnp.float32).reshape(1, -1),
                 ((0, 0), (0, np_ - n)))
    n_k = kp // bk

    out = pl.pallas_call(
        functools.partial(_int8wo_kernel, n_k=n_k),
        grid=(mp // bm, np_ // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=4 * mp * kp + kp * np_ + 4 * mp * np_,
            transcendentals=0),
        interpret=_interpret(),
    )(x, w, ws)
    return out[:m, :n]


# ---------------------------------------------------------------------------
# Fused LM-head + argmax (greedy decode)
# ---------------------------------------------------------------------------

def _head_argmax_kernel(x_ref, w_ref, s_ref, out_ref, bv_ref, bi_ref, *,
                        n_j, bn, v_real):
    """One vocab tile per program: logits tile = x @ w_tile (bf16 MXU,
    f32 accumulate, per-column scales), then fold the tile into a running
    (max, argmax) in VMEM scratch. The [B, V] logits never exist — the
    decode step's largest intermediate and its extra kernel round
    (matmul → argmax) collapse into one weight-stream pass."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        bv_ref[:] = jnp.full_like(bv_ref, -jnp.inf)
        bi_ref[:] = jnp.zeros_like(bi_ref)

    vals = jnp.dot(x_ref[:].astype(jnp.bfloat16),
                   w_ref[:].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    vals = vals * s_ref[0, :][None, :]
    iota = j * bn + jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
    vals = jnp.where(iota < v_real, vals, -jnp.inf)   # mask vocab padding
    lmax = jnp.max(vals, axis=1, keepdims=True)
    # First-occurrence argmax within the tile (matches jnp.argmax).
    big = jnp.int32(2 ** 31 - 1)
    lidx = jnp.min(jnp.where(vals == lmax, iota, big), axis=1,
                   keepdims=True)
    lmax_b = jnp.broadcast_to(lmax, bv_ref.shape)
    lidx_b = jnp.broadcast_to(lidx, bi_ref.shape)
    better = lmax_b > bv_ref[:]        # strict: earlier tile wins ties
    bi_ref[:] = jnp.where(better, lidx_b, bi_ref[:])
    bv_ref[:] = jnp.where(better, lmax_b, bv_ref[:])

    @pl.when(j == n_j - 1)
    def _():
        out_ref[:] = bi_ref[:]


@functools.partial(jax.jit, static_argnames=("block_n",))
def matmul_argmax_int8(x, w, w_scales, block_n=None):
    """Greedy-head fast path: ``argmax(x @ (w * scales), axis=-1)`` for an
    int8 weight [D, V] with per-column f32 ``w_scales`` — one Pallas pass,
    no [M, V] logits materialization. Returns int32 [M].

    Numerics match ``matmul_int8_weight_only`` (bf16 MXU products, f32
    accumulation); ties resolve to the lowest index like ``jnp.argmax``."""
    m, d = x.shape
    d2, v = w.shape
    assert d == d2, f"contraction mismatch {d} vs {d2}"
    bm = _round_up(m, 8)
    dp = _round_up(d, 128)
    # Whole-D weight tiles: size bn so the int8 tile + bf16 copy stay
    # well under VMEM (~4.5 MB at the cap below). ``block_n`` overrides
    # for sweeps (tools/profile_head_kernel.py).
    bn = block_n or max(128, min(2048, (1536 * 1024) // dp // 128 * 128))
    vp = _round_up(v, bn)
    x = _pad_to(x.astype(jnp.float32), bm, dp)
    w = _pad_to(w, dp, vp)
    ws = jnp.pad(jnp.asarray(w_scales, jnp.float32).reshape(1, -1),
                 ((0, 0), (0, vp - v)))
    n_j = vp // bn

    out = pl.pallas_call(
        functools.partial(_head_argmax_kernel, n_j=n_j, bn=bn, v_real=v),
        grid=(n_j,),
        in_specs=[
            pl.BlockSpec((bm, dp), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, bn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, 128), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bm, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bm, 128), jnp.float32),
                        pltpu.VMEM((bm, 128), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * vp * dp,
            bytes_accessed=4 * bm * dp + dp * vp + 4 * bm,
            transcendentals=0),
        interpret=_interpret(),
    )(x, w, ws)
    return out[:m, 0]


_INT4_BN = 256  # matches the tile-planar pack tile (quant.INT4_PACK_TILE)


def _int4_kernel(x_ref, wp_ref, s_ref, out_ref, acc_ref, *, n_k, group, bk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Unpack one 256-column tile: planar nibbles (stored = q+8) → columns
    # [0..127] from the low nibble, [128..255] from the high — a
    # lane-contiguous concat, no cross-lane shuffles. Arithmetic happens
    # in int32: Mosaic has no int8 vector sub/shift on TPU.
    p = wp_ref[:].astype(jnp.int32)                  # [bk, 128]
    lo = jnp.bitwise_and(p, 0xF) - 8
    hi = jnp.right_shift(p, 4) - 8
    wq = jnp.concatenate([lo, hi], axis=-1)          # [bk, 256] int32
    # Expand the per-(K-group, col) scales to per-row with a sublane
    # repeat, dequantize the WHOLE tile in bf16 (int4 values are exact in
    # bf16) and run ONE MXU dot per K-block — the old per-group loop of
    # [m, group] dots serialized at decode sizes (12.6 TFLOPS at M=16).
    groups_per_block = bk // group
    if n_k == 1:
        s_rows = s_ref[:]          # whole-K block: static load
    else:
        # The wrapper sizes bk so groups_per_block is a multiple of 8 —
        # Mosaic only allows sublane-dim dynamic slices at 8-row
        # granularity (a 4-row pl.ds crashed the Mosaic lowering).
        s_rows = s_ref[pl.ds(k * groups_per_block, groups_per_block), :]
    # Per-group scaling as a rank-3 broadcast multiply (sublane-dim
    # reshape is free; a jnp.repeat of the scale rows materializes a
    # [bk, bn] copy through the VPU).
    w = (wq.astype(jnp.bfloat16).reshape(groups_per_block, group, -1)
         * s_rows.astype(jnp.bfloat16)[:, None, :])
    acc_ref[:] += jnp.dot(x_ref[:].astype(jnp.bfloat16),
                          w.reshape(bk, -1),
                          preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _int4w_kernel(x_ref, xq_ref, xsum_ref, wp_ref, s_ref, out_ref,
                  acc_ref, *, n_k, group, bk, dot_mode):
    """WORD-packed int4 kernel (round 4, the "bitcast treatment"): the
    per-weight unpack is two int32 mask/shift ops (8 weights per lane
    element — 0.375 VPU ops/weight) plus a FREE sublane bitcast, exactly
    the inverse-packing discipline of the token-packed int8 KV cache.
    The stored value is offset-binary u = q + 8 ∈ [0, 15]; the −8 offset
    is corrected ONCE on the accumulator via the zero-point identity
    x·(u−8)·s = x·u·s − 8·(Σ_g x)·s — one [bm, n_g] × [n_g, bn] dot at
    the first K-block — so there is no per-weight subtract.

    dot_mode "bf16": u converts to bf16 and scales per-weight (exact
    weight-only path, ~2.4 VPU ops/weight vs ~4.5 for the byte-packed
    kernel).
    dot_mode "int8": activations arrive row-quantized and group-
    reordered ([n_g, bm, group] int8); one BATCHED int8×int8 MXU dot
    per K-block with per-group scales applied to the int32 partials —
    per-weight VPU work is the 0.375-op unpack alone."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        # Offset correction for the WHOLE contraction (sums over all
        # groups, so it runs once): −8 · xsum @ scales.
        acc_ref[:] = jnp.dot(
            xsum_ref[:], s_ref[:],
            preferred_element_type=jnp.float32) * (-8.0)

    gpb = bk // group
    w32 = wp_ref[:]                                # [bk/4, bn/2] int32
    lo = jnp.bitwise_and(w32, 0x0F0F0F0F)
    hi = jnp.bitwise_and(jax.lax.shift_right_logical(w32, 4),
                         0x0F0F0F0F)
    u8 = pltpu.bitcast(jnp.concatenate([lo, hi], axis=-1),
                       jnp.int8)                   # [bk, bn] u in 0..15
    if n_k == 1:
        s_rows = s_ref[:]                          # [gpb, bn]
    else:
        # gpb is a multiple of 8 when n_k > 1 (wrapper sizing), so the
        # sublane-dim dynamic slice is Mosaic-legal.
        s_rows = s_ref[pl.ds(kk * gpb, gpb), :]

    if dot_mode == "bf16":
        xb = x_ref[:].astype(jnp.bfloat16)         # [bm, bk]
        # w_scaled = u * s (no per-weight subtract — see above).
        w = (u8.astype(jnp.bfloat16).reshape(gpb, group, -1)
             * s_rows.astype(jnp.bfloat16)[:, None, :])
        acc_ref[:] += jnp.dot(xb, w.reshape(bk, -1),
                              preferred_element_type=jnp.float32)
    else:
        # Batched int8×int8 dot: lhs [gpb, bm, group] × rhs
        # [gpb, group, bn] (batch dims LEADING on both — Mosaic).
        if n_k == 1:
            xq = xq_ref[:]
        else:
            xq = xq_ref[pl.ds(kk * gpb, gpb)]
        acc32 = jax.lax.dot_general(
            xq, u8.reshape(gpb, group, -1),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)      # [gpb, bm, bn]
        acc_ref[:] += jnp.sum(
            acc32.astype(jnp.float32) * s_rows[:, None, :], axis=0)

    @pl.when(kk == n_k - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("group", "block_m",
                                             "block_k", "dot_mode"))
def matmul_int4_words(x, words, scales, group=INT4_GROUP, block_m=256,
                      block_k=512, dot_mode="bf16"):
    """``x`` f32/bf16 [M, K] × WORD-packed group-wise int4 weights
    (``words`` int32 [K/4, N//2] from quant.pack_int4_words, ``scales``
    f32 [K//group, N]) → f32 [M, N]. See :func:`_int4w_kernel`.

    dot_mode "int8" row-quantizes the activations (per-row symmetric
    int8) so the main contraction runs int8×int8 on the MXU — adds
    ~0.4% relative activation error; "bf16" keeps activations exact."""
    m = x.shape[0]
    k = words.shape[0] * 4
    n = words.shape[1] * 2
    assert x.shape[1] == k, f"contraction mismatch {x.shape[1]} vs {k}"
    assert k % group == 0
    assert n % _INT4_BN == 0
    bn = _INT4_BN
    bm = min(block_m, _round_up(m, 8))
    step = 8 * group
    if k <= max(block_k, step):
        bk = k
    else:
        bk = max(step, block_k - block_k % step)
    mp, kp = _round_up(m, bm), _round_up(k, bk)
    # K pads to the block grid (e.g. TinyLlama's d_ff=5632 is 44 groups
    # but not a multiple of the 8-group block): zero x columns make the
    # padded rows exact regardless of the padded words/scales (both
    # accumulator terms contract against x).
    x = _pad_to(x.astype(jnp.float32), mp, kp)
    words = _pad_to(words, kp // 4, n // 2)
    scales = _pad_to(jnp.asarray(scales, jnp.float32), kp // group, n)
    k = kp
    n_k = kp // bk
    n_g = kp // group

    if dot_mode == "int8":
        absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
        xscale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
        xq = jnp.clip(jnp.round(x / xscale), -127, 127)
        # Group-reordered [n_g, mp, group] so the kernel's batched dot
        # needs no in-kernel transpose.
        xq_r = xq.reshape(mp, n_g, group).transpose(1, 0, 2
                                                    ).astype(jnp.int8)
        # The offset correction must use the QUANTIZED activations'
        # group sums (the int8 dot contracts xq, not x).
        xsum = jnp.sum(xq.reshape(mp, n_g, group), axis=2)
    else:
        xq_r = jnp.zeros((1, 8, group), jnp.int8)         # dummy
        xscale = None
        xsum = jnp.sum(x.reshape(mp, n_g, group), axis=2)

    kernel = functools.partial(_int4w_kernel, n_k=n_k, group=group,
                               bk=bk, dot_mode=dot_mode)
    out = pl.pallas_call(
        kernel,
        grid=(mp // bm, n // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_g, bm, group), lambda i, j, kk: (0, i, 0),
                         memory_space=pltpu.VMEM)
            if dot_mode == "int8" else
            pl.BlockSpec(xq_r.shape, lambda i, j, kk: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, n_g), lambda i, j, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 4, bn // 2), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_g, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * k,
            bytes_accessed=4 * mp * k + k * n // 2 + 4 * mp * n,
            transcendentals=0),
        interpret=_interpret(),
    )(x, xq_r, xsum.astype(jnp.float32), words, scales)
    if dot_mode == "int8":
        out = out * xscale
    return out[:m]


@functools.partial(jax.jit,
                   static_argnames=("group", "block_m", "block_k"))
def matmul_int4(x, w_packed, scales, group=INT4_GROUP, block_m=256,
                block_k=512):
    """``x`` f32/bf16 [M, K] × group-wise int4 weights
    (``w_packed`` uint8 [K, N//2] tile-planar, ``scales`` f32
    [K//group, N]) → f32 [M, N].

    Weights stream from HBM at 0.5 bytes/element and expand only in VMEM —
    the decode-bandwidth win for weight-bound LLM inference."""
    m, k = x.shape
    kw, n_half = w_packed.shape
    n = n_half * 2
    assert k == kw, f"contraction mismatch {k} vs {kw}"
    assert k % group == 0
    assert n % _INT4_BN == 0, f"packed N={n} must be a multiple of {_INT4_BN}"
    bn = _INT4_BN
    bm = min(block_m, _round_up(m, 8))
    # K blocking must keep the in-kernel scale slice sublane-aligned:
    # either ONE whole-K block (static load) or blocks spanning a
    # multiple of 8 groups (8-row dynamic slices).
    step = 8 * group
    if k <= max(block_k, step):
        bk = k
    else:
        bk = max(step, block_k - block_k % step)
    mp, kp = _round_up(m, bm), _round_up(k, bk)
    x = _pad_to(x.astype(jnp.float32), mp, kp)
    w_packed = _pad_to(w_packed, kp, n_half)
    scales = _pad_to(jnp.asarray(scales, jnp.float32), kp // group, n)
    n_k = kp // bk

    out = pl.pallas_call(
        functools.partial(_int4_kernel, n_k=n_k, group=group, bk=bk),
        grid=(mp // bm, n // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn // 2), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp // group, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * n * kp,
            bytes_accessed=4 * mp * kp + kp * n // 2 + 4 * mp * n,
            transcendentals=0),
        interpret=_interpret(),
    )(x, w_packed, scales)
    return out[:m]
