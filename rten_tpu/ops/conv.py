"""Conv / ConvTranspose.

The reference implements conv via virtual-im2col feeding its SIMD GEMM
(``src/ops/conv.rs``, ``conv/im2col.rs``); on TPU the idiomatic lowering
is ``lax.conv_general_dilated`` — XLA selects implicit-GEMM onto the MXU,
which *is* the im2col-into-GEMM strategy, compiler-managed. 1-D convs are
lifted to 2-D with a unit height. Quantized conv kernels live in
``rten_tpu.kernels``.
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp

from .common import resolve_pads, same_pads
from .registry import OpError, register


def _lift_1d(x, w):
    """[N,C,W] → [N,C,1,W] (and kernel likewise)."""
    return x[:, :, None, :], w[:, :, None, :]


@register("Conv")
def conv(ctx, attrs, x, w, b=None):
    squeeze_h = False
    if x.ndim == 3:
        x, w = _lift_1d(x, w)
        squeeze_h = True
    if x.ndim != 4:
        raise OpError("Conv", f"unsupported input rank {x.ndim}")
    n_spatial = 2
    kernel = w.shape[2:]
    from .common import attr_ints
    strides = attr_ints(attrs, "strides") or []
    dilations = attr_ints(attrs, "dilations") or []
    groups = int(attrs.get("groups") or 1)
    if squeeze_h:
        strides = [1, strides[0] if strides else 1]
        dilations = [1, dilations[0] if dilations else 1]
        pads = [(0, 0),
                _pads_1d(attrs, x.shape[3], kernel[1], strides[1], dilations[1])]
    else:
        strides = strides or [1, 1]
        dilations = dilations or [1, 1]
        pads = resolve_pads(attrs, n_spatial, x.shape[2:], kernel, strides,
                            dilations)
    out = lax.conv_general_dilated(
        x, w, window_strides=strides, padding=pads,
        rhs_dilation=dilations,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b.reshape(1, -1, 1, 1)
    if squeeze_h:
        out = out[:, :, 0, :]
    return out


def _pads_1d(attrs, in_size, kernel, stride, dilation):
    from .common import AUTOPAD_NOTSET, AUTOPAD_SAME, attr_ints
    if attrs.get("auto_pad", AUTOPAD_NOTSET) == AUTOPAD_SAME:
        return same_pads(in_size, stride, kernel, dilation)
    pads = attr_ints(attrs, "pads")
    if pads is None:
        return (0, 0)
    if len(pads) == 2:
        return (pads[0], pads[1])
    raise OpError("Conv", "1-D conv expects 2 pad values")


@register("ConvTranspose")
def conv_transpose(ctx, attrs, x, w, b=None):
    squeeze_h = False
    if x.ndim == 3:
        x, w = _lift_1d(x, w)
        squeeze_h = True
    if x.ndim != 4:
        raise OpError("ConvTranspose", f"unsupported input rank {x.ndim}")
    strides = attrs.get("strides")
    strides = [int(s) for s in strides] if strides is not None else [1, 1]
    if squeeze_h:
        strides = [1, strides[-1]]
    kernel = w.shape[2:]
    # ONNX pads semantics: they *reduce* the output. We express the op as a
    # fractionally-strided conv: lhs_dilation=strides, forward padding
    # k_eff-1-pad on each side, flipped kernel with I/O transposed.
    from .common import AUTOPAD_NOTSET, AUTOPAD_SAME, attr_ints
    n_spatial = 2
    if attrs.get("auto_pad", AUTOPAD_NOTSET) == AUTOPAD_SAME:
        pads = []
        for i in range(n_spatial):
            total = max(0, kernel[i] - strides[i])
            pads.append((total // 2, total - total // 2))
    else:
        p = attr_ints(attrs, "pads")
        if p is None:
            pads = [(0, 0)] * n_spatial
        elif len(p) == 2 and squeeze_h:
            pads = [(0, 0), (p[0], p[1])]
        elif len(p) == 2 * n_spatial:
            pads = [(p[i], p[n_spatial + i]) for i in range(n_spatial)]
        else:
            raise OpError("ConvTranspose", "bad pads length")
    w_t = jnp.flip(w, axis=(2, 3)).transpose(1, 0, 2, 3)  # [C,M,kh,kw]→[M,C,kh,kw]
    conv_pads = [(kernel[i] - 1 - pads[i][0], kernel[i] - 1 - pads[i][1])
                 for i in range(n_spatial)]
    out = lax.conv_general_dilated(
        x, w_t, window_strides=(1, 1), padding=conv_pads,
        lhs_dilation=strides,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b.reshape(1, -1, 1, 1)
    if squeeze_h:
        out = out[:, :, 0, :]
    return out
