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
    from .common import (AUTOPAD_NOTSET, AUTOPAD_SAME,
                         AUTOPAD_SAME_LOWER, attr_ints)
    auto = attrs.get("auto_pad", AUTOPAD_NOTSET)
    if auto in (AUTOPAD_SAME, AUTOPAD_SAME_LOWER):
        return same_pads(in_size, stride, kernel, dilation,
                         lower=auto == AUTOPAD_SAME_LOWER)
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
    from .common import (AUTOPAD_NOTSET, AUTOPAD_SAME, AUTOPAD_SAME_LOWER,
                         attr_ints)
    n_spatial = 2

    def spatial(name, default):
        v = attr_ints(attrs, name)
        if v is None:
            return [default] * n_spatial
        v = [int(i) for i in v]
        if squeeze_h:
            return [default, v[-1]]
        return v

    strides = spatial("strides", 1)
    dilations = spatial("dilations", 1)
    out_pad = spatial("output_padding", 0)
    groups = int(attrs.get("groups") or 1)
    kernel = w.shape[2:]
    # Effective (dilated) kernel extent per spatial dim.
    k_eff = [(kernel[i] - 1) * dilations[i] + 1 for i in range(n_spatial)]
    # ONNX pads semantics: they *reduce* the output. We express the op as a
    # fractionally-strided conv: lhs_dilation=strides, forward padding
    # k_eff-1-pad on each side (output_padding extends the END), flipped
    # kernel with I/O transposed, rhs_dilation for dilated kernels.
    auto = attrs.get("auto_pad", AUTOPAD_NOTSET)
    if auto in (AUTOPAD_SAME, AUTOPAD_SAME_LOWER):
        pads = []
        for i in range(n_spatial):
            total = max(0, k_eff[i] - strides[i])
            lo = total // 2
            pads.append((total - lo, lo) if auto == AUTOPAD_SAME_LOWER
                        else (lo, total - lo))
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
    # ONNX W layout [C_in, C_out/G, kh, kw]: flip spatially and swap I/O
    # per GROUP → [C_out, C_in/G, kh, kw] for feature_group_count=G.
    c_in, m_per_g = w.shape[0], w.shape[1]
    if c_in % groups:
        raise OpError("ConvTranspose", f"groups {groups} !| C_in {c_in}")
    w_f = jnp.flip(w, axis=(2, 3))
    w_t = (w_f.reshape(groups, c_in // groups, m_per_g, *kernel)
           .transpose(0, 2, 1, 3, 4)
           .reshape(groups * m_per_g, c_in // groups, *kernel))
    conv_pads = [(k_eff[i] - 1 - pads[i][0],
                  k_eff[i] - 1 - pads[i][1] + out_pad[i])
                 for i in range(n_spatial)]
    out = lax.conv_general_dilated(
        x, w_t, window_strides=(1, 1), padding=conv_pads,
        lhs_dilation=strides, rhs_dilation=dilations,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        out = out + b.reshape(1, -1, 1, 1)
    if squeeze_h:
        out = out[:, :, 0, :]
    return out
