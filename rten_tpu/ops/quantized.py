"""Quantized operators (rten_tpu extensions; ONNX QDQ/QLinear semantics).

These are the north-star additions on top of the reference's op set
(BASELINE.json): QuantizeLinear / DequantizeLinear / DynamicQuantizeLinear
/ MatMulInteger / QLinearMatMul / QLinearConv, plus Silu (fused
x·sigmoid(x), which the reference creates via graph fusion,
``src/optimize.rs:381-400``).

2-D symmetric-int8 and int4 matmuls route to the Pallas kernels in
:mod:`rten_tpu.kernels.gemm`; everything else uses exact jnp reference
paths (still XLA-fused).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import gemm as gemm_kernels
from ..kernels import quant as q
from .registry import register


def _axis_scale(scale, zero_point, x_ndim, axis):
    scale = jnp.asarray(scale)
    if scale.ndim == 0 or scale.size == 1:
        return scale.reshape(()), (None if zero_point is None
                                   else jnp.asarray(zero_point).reshape(()))
    shape = [1] * x_ndim
    shape[axis] = -1
    zp = None if zero_point is None else jnp.asarray(zero_point).reshape(shape)
    return scale.reshape(shape), zp


@register("QuantizeLinear")
def quantize_linear(ctx, attrs, x, y_scale, y_zero_point=None):
    axis = int(attrs.get("axis", 1))
    if axis < 0:
        axis += x.ndim
    dtype = (y_zero_point.dtype if y_zero_point is not None else jnp.uint8)
    scale, zp = _axis_scale(y_scale, y_zero_point, x.ndim, axis)
    y = jnp.round(x / scale)
    if zp is not None:
        y = y + zp.astype(jnp.float32)
    info = jnp.iinfo(dtype)
    return jnp.clip(y, info.min, info.max).astype(dtype)


@register("DequantizeLinear")
def dequantize_linear(ctx, attrs, x, x_scale, x_zero_point=None):
    axis = int(attrs.get("axis", 1))
    if axis < 0:
        axis += x.ndim
    scale, zp = _axis_scale(x_scale, x_zero_point, x.ndim, axis)
    x32 = x.astype(jnp.int32)
    if zp is not None:
        x32 = x32 - zp.astype(jnp.int32)
    return x32.astype(jnp.float32) * scale


@register("DynamicQuantizeLinear")
def dynamic_quantize_linear(ctx, attrs, x):
    y, scale, zp = q.dynamic_quantize(x)
    return y, scale.reshape(()), zp.reshape(())


def _zp_is_zero(zp):
    if zp is None:
        return True
    if isinstance(zp, (np.ndarray, np.generic)):
        return not np.any(np.asarray(zp))
    return False  # traced: can't know statically


@register("MatMulInteger")
def matmul_integer(ctx, attrs, a, b, a_zero_point=None, b_zero_point=None):
    """int8/uint8 matmul with int32 accumulation (ONNX MatMulInteger)."""
    if (a.ndim == 2 and b.ndim == 2 and _zp_is_zero(a_zero_point)
            and _zp_is_zero(b_zero_point)
            and a.dtype == jnp.int8 and b.dtype == jnp.int8):
        # Pallas kernel path: symmetric int8. Unit scales → raw int32.
        out = gemm_kernels.matmul_int8(a, b, 1.0, jnp.ones(b.shape[1]))
        return out.astype(jnp.int32)
    a32 = a.astype(jnp.int32)
    b32 = b.astype(jnp.int32)
    if a_zero_point is not None:
        a32 = a32 - jnp.asarray(a_zero_point).astype(jnp.int32)
    if b_zero_point is not None:
        b32 = b32 - jnp.asarray(b_zero_point).astype(jnp.int32)
    return jnp.matmul(a32, b32, preferred_element_type=jnp.int32)


@register("QLinearMatMul")
def qlinear_matmul(ctx, attrs, a, a_scale, a_zp, b, b_scale, b_zp,
                   y_scale, y_zp):
    """Quantized matmul: dequant → matmul → requant, with the int32
    accumulation done on the MXU."""
    if (a.ndim == 2 and b.ndim == 2 and _zp_is_zero(a_zp)
            and _zp_is_zero(b_zp) and a.dtype == jnp.int8
            and b.dtype == jnp.int8
            and jnp.asarray(a_scale).size == 1):
        b_scales = jnp.broadcast_to(jnp.asarray(b_scale).reshape(-1),
                                    (b.shape[1],))
        out_f32 = gemm_kernels.matmul_int8(
            a, b, jnp.asarray(a_scale).reshape(()), b_scales)
    else:
        a32 = a.astype(jnp.int32) - jnp.asarray(a_zp).astype(jnp.int32)
        b32 = b.astype(jnp.int32) - jnp.asarray(b_zp).astype(jnp.int32)
        acc = jnp.matmul(a32, b32, preferred_element_type=jnp.int32)
        out_f32 = (acc.astype(jnp.float32) * jnp.asarray(a_scale)
                   * jnp.asarray(b_scale))
    y = jnp.round(out_f32 / jnp.asarray(y_scale))
    y = y + jnp.asarray(y_zp).astype(jnp.float32)
    info = jnp.iinfo(jnp.asarray(y_zp).dtype
                     if y_zp is not None else jnp.uint8)
    return jnp.clip(y, info.min, info.max).astype(
        jnp.asarray(y_zp).dtype if y_zp is not None else jnp.uint8)


@register("QLinearConv")
def qlinear_conv(ctx, attrs, x, x_scale, x_zp, w, w_scale, w_zp,
                 y_scale, y_zp, b=None):
    """Quantized conv: int32 conv accumulation (implicit GEMM on the MXU)
    with scales applied at the output, then requantization. Bias is int32
    at scale x_scale*w_scale (ONNX spec)."""
    x32 = x.astype(jnp.int32) - jnp.asarray(x_zp).astype(jnp.int32)
    w32 = w.astype(jnp.int32) - jnp.asarray(w_zp).astype(jnp.int32)
    # Same geometry as the float conv lowering, run in int32: XLA
    # lowers integer conv_general_dilated fine; bias adds in int32 after.
    import jax.lax as lax
    from .common import attr_ints, resolve_pads
    squeeze_h = x32.ndim == 3
    if squeeze_h:
        x32, w32 = x32[:, :, None, :], w32[:, :, None, :]
    strides = attr_ints(attrs, "strides") or [1, 1]
    dilations = attr_ints(attrs, "dilations") or [1, 1]
    groups = int(attrs.get("groups") or 1)
    pads = resolve_pads(attrs, 2, x32.shape[2:], w32.shape[2:], strides,
                        dilations)
    acc = lax.conv_general_dilated(
        x32, w32, window_strides=strides, padding=pads,
        rhs_dilation=dilations,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32)
    if b is not None:
        acc = acc + b.astype(jnp.int32).reshape(1, -1, 1, 1)
    w_s = jnp.asarray(w_scale)
    if w_s.ndim == 1:         # per-output-channel
        w_s = w_s.reshape(1, -1, 1, 1)
    out_f32 = acc.astype(jnp.float32) * jnp.asarray(x_scale) * w_s
    y = jnp.round(out_f32 / jnp.asarray(y_scale))
    y = y + jnp.asarray(y_zp).astype(jnp.float32)
    out_dtype = jnp.asarray(y_zp).dtype if y_zp is not None else jnp.uint8
    info = jnp.iinfo(out_dtype)
    out = jnp.clip(y, info.min, info.max).astype(out_dtype)
    if squeeze_h:
        out = out[:, :, 0, :]
    return out


@register("Silu")
def silu(ctx, attrs, x):
    return x * jax.nn.sigmoid(x)


@register("ConvInteger")
def conv_integer(ctx, attrs, x, w, x_zero_point=None, w_zero_point=None):
    """int8/uint8 conv with int32 accumulation (ONNX ConvInteger): the
    integer half of a weight-only quantized conv — callers rescale the
    int32 output by x_scale*w_scale."""
    import jax.lax as lax

    from .common import attr_ints, resolve_pads

    import os

    # Native low-precision conv path (round 4, the int8-GEMM A/B
    # pattern applied to convs — kernels/gemm.py:70-80): keep the int8
    # operands NARROW into conv_general_dilated so XLA can use the
    # MXU's native int8 rate, and correct the activation zero point on
    # the int32 accumulator: conv(x - zp, w) = conv(x, w) - zp *
    # conv(1, w), where the ones-conv runs at batch 1 (broadcast over
    # N) and counts only REAL (unpadded) taps — exactly matching the
    # subtract-then-zero-pad semantics of the wide path. Integer math
    # is exact either way. v5e A/B at batch 64 (tools/bench_vision.py,
    # round 4): native 1.71x on ResNet-50, 1.20x on DETR, but 0.85x on
    # MobileNetV3 — the regression tracks DEPTHWISE convs, so the
    # default ("auto") uses the native path for ungrouped convs only.
    # RTEN_CONVINT_NATIVE=1 forces it everywhere, =0 disables.
    knob = os.environ.get("RTEN_CONVINT_NATIVE", "auto")
    groups_ = int(attrs.get("groups") or 1)
    native = (knob != "0"
              and (knob == "1" or groups_ == 1)
              and w.dtype == jnp.int8
              and x.dtype in (jnp.int8, jnp.uint8)
              and _zp_is_zero(w_zero_point))

    zp_eff = None
    if native:
        if x.dtype == jnp.uint8:
            # XLA convs need matching dtypes: shift u8 to s8 exactly
            # via the top-bit flip (u8 v ^ 0x80 reinterpreted as s8 ==
            # v - 128) and fold the 128 into the zero-point term.
            xn = jax.lax.bitwise_xor(x, jnp.uint8(0x80)
                                     ).astype(jnp.int8)
            zp_eff = (jnp.asarray(x_zero_point).astype(jnp.int32)
                      if x_zero_point is not None else 0) - 128
        else:
            xn = x
            if x_zero_point is not None \
                    and not _zp_is_zero(x_zero_point):
                zp_eff = jnp.asarray(x_zero_point).astype(jnp.int32)
        wn = w
    else:
        xn = x.astype(jnp.int32)
        wn = w.astype(jnp.int32)
        if x_zero_point is not None:
            xn = xn - jnp.asarray(x_zero_point).astype(jnp.int32)
        if w_zero_point is not None:
            wn = wn - jnp.asarray(w_zero_point).astype(jnp.int32)
    squeeze_h = xn.ndim == 3
    if squeeze_h:
        xn, wn = xn[:, :, None, :], wn[:, :, None, :]
    strides = attr_ints(attrs, "strides") or [1, 1]
    dilations = attr_ints(attrs, "dilations") or [1, 1]
    groups = int(attrs.get("groups") or 1)
    pads = resolve_pads(attrs, 2, xn.shape[2:], wn.shape[2:], strides,
                        dilations)

    def run_conv(lhs, rhs):
        return lax.conv_general_dilated(
            lhs, rhs, window_strides=strides, padding=pads,
            rhs_dilation=dilations,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=groups,
            preferred_element_type=jnp.int32)

    acc = run_conv(xn, wn)
    if native and zp_eff is not None:
        # conv(x - zp, w) == conv(x_shifted, w) - zp_eff * conv(1, w):
        # the ones-conv runs at batch 1 (1/N of the conv) and counts
        # only real (unpadded) taps, matching the wide path's
        # subtract-then-zero-pad semantics exactly.
        ones = jnp.ones((1,) + xn.shape[1:], jnp.int8)
        taps = run_conv(ones, wn)               # [1, C_out, H', W']
        acc = acc - jnp.asarray(zp_eff, jnp.int32) * taps
    if squeeze_h:
        acc = acc[:, :, 0, :]
    return acc
