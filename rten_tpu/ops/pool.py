"""Pooling ops: AveragePool, MaxPool, GlobalAveragePool.

Reference: ``src/ops/pooling.rs``. Lowered to ``lax.reduce_window`` —
XLA emits vectorized window reductions on the VPU. 1-D pools are lifted
to 2-D with unit height, mirroring the conv lowering.
"""

from __future__ import annotations

import numpy as np
import jax.lax as lax
import jax.numpy as jnp

from .common import attr_ints, resolve_pads
from .registry import OpError, register


def _pool_params(attrs, x):
    kernel = attr_ints(attrs, "kernel_size")
    if kernel is None:
        raise OpError("Pool", "missing kernel_size")
    n_spatial = len(kernel)
    strides = attr_ints(attrs, "strides") or [1] * n_spatial
    pads = resolve_pads(attrs, n_spatial, x.shape[2:], kernel, strides)
    return kernel, strides, pads


@register("MaxPool")
def max_pool(ctx, attrs, x):
    squeeze_h = x.ndim == 3
    if squeeze_h:
        x = x[:, :, None, :]
    kernel, strides, pads = _pool_params(attrs, x if not squeeze_h else x[:, :, 0, :])
    if squeeze_h:
        kernel, strides, pads = [1] + kernel, [1] + strides, [(0, 0)] + pads
    window = (1, 1, *kernel)
    strides_full = (1, 1, *strides)
    padding = [(0, 0), (0, 0), *pads]
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(jnp.int32).min
    out = lax.reduce_window(x, jnp.asarray(init, x.dtype), lax.max,
                            window, strides_full, padding)
    if squeeze_h:
        out = out[:, :, 0, :]
    return out


@register("AveragePool")
def average_pool(ctx, attrs, x):
    squeeze_h = x.ndim == 3
    if squeeze_h:
        x = x[:, :, None, :]
    kernel, strides, pads = _pool_params(attrs, x if not squeeze_h else x[:, :, 0, :])
    if squeeze_h:
        kernel, strides, pads = [1] + kernel, [1] + strides, [(0, 0)] + pads
    include_pad = bool(attrs.get("count_include_pad", False))
    window = (1, 1, *kernel)
    strides_full = (1, 1, *strides)
    padding = [(0, 0), (0, 0), *pads]
    total = lax.reduce_window(x, jnp.asarray(0, x.dtype), lax.add,
                              window, strides_full, padding)
    if include_pad or all(p == (0, 0) for p in pads):
        divisor = float(np.prod(kernel))
        out = total / divisor
    else:
        ones = jnp.ones(x.shape[2:], x.dtype)
        counts = lax.reduce_window(ones, jnp.asarray(0, x.dtype), lax.add,
                                   tuple(kernel), tuple(strides), pads)
        out = total / counts
    if squeeze_h:
        out = out[:, :, 0, :]
    return out


@register("GlobalAveragePool")
def global_average_pool(ctx, attrs, x):
    axes = tuple(range(2, x.ndim))
    return jnp.mean(x, axis=axes, keepdims=True)
