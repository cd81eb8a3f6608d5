"""Reduction ops: ArgMax/ArgMin, CumSum, NonZero, Reduce*, TopK.

Reference: ``src/ops/reduce.rs``. TopK lowers to ``lax.top_k``; NonZero is
data-dependent (output shape depends on values) and only runs in eager
mode on host — the same restriction XLA imposes on any dynamic-shape op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .common import normalize_axis, static_int
from .registry import OpError, register


def _argreduce(name, fn):
    @register(name)
    def op(ctx, attrs, x):
        axis = normalize_axis(int(attrs.get("axis", 0)), x.ndim)
        keep = bool(attrs.get("keep_dims", True)) if "keep_dims" in attrs else True
        out = fn(x, axis=axis).astype(jnp.int32)
        if keep:
            out = jnp.expand_dims(out, axis)
        return out
    op.__name__ = name.lower()
    return op


_argreduce("ArgMax", jnp.argmax)
_argreduce("ArgMin", jnp.argmin)


@register("CumSum", static=(1,))
def cumsum(ctx, attrs, x, axis):
    return jnp.cumsum(x, axis=static_int(axis), dtype=x.dtype)


@register("NonZero", data_dependent=True)
def nonzero(ctx, attrs, x):
    # Host-side only: output shape is value-dependent. Returns [rank, n]
    # int32, matching ONNX/reference.
    arr = np.asarray(x)
    return np.stack(np.nonzero(arr)).astype(np.int32)


def _reduce(name, fn, finalize=None, prepare=None):
    @register(name)
    def op(ctx, attrs, x, axes_input=None):
        axes = attrs.get("axes")
        if axes_input is not None:
            axes = axes_input
        if axes is not None:
            axes = tuple(normalize_axis(int(a), x.ndim)
                         for a in np.asarray(axes).reshape(-1))
            if not axes:
                axes = None
        keep = bool(attrs.get("keep_dims", True)) if "keep_dims" in attrs else True
        if prepare is not None:
            x = prepare(x)
        out = fn(x, axis=axes, keepdims=keep)
        if finalize is not None:
            out = finalize(out)
        return out
    op.__name__ = name.lower()
    return op


_reduce("ReduceSum", jnp.sum)
_reduce("ReduceMean", jnp.mean)
_reduce("ReduceMin", jnp.min)
_reduce("ReduceMax", jnp.max)
_reduce("ReduceProd", jnp.prod)
_reduce("ReduceL2", jnp.sum, prepare=jnp.square, finalize=jnp.sqrt)
_reduce("ReduceSumSquare", jnp.sum, prepare=jnp.square)

# Reduce* ops may carry axes as a second (static) input in newer opsets.
for _name in ("ReduceSum", "ReduceMean", "ReduceMin", "ReduceMax",
              "ReduceProd", "ReduceL2", "ReduceSumSquare"):
    from .registry import OPS
    OPS[_name].static = (1,)


@register("TopK", static=(1,))
def topk(ctx, attrs, x, k):
    kk = static_int(k)
    axis = int(attrs.get("axis", -1))
    axis = normalize_axis(axis, x.ndim)
    largest = bool(attrs.get("largest", True)) if "largest" in attrs else True
    if kk > x.shape[axis]:
        raise OpError("TopK", f"k={kk} exceeds axis size {x.shape[axis]}")
    moved = jnp.moveaxis(x, axis, -1)
    if largest:
        values, indices = jax.lax.top_k(moved, kk)
    else:
        values, indices = jax.lax.top_k(-moved, kk)
        values = -values
    values = jnp.moveaxis(values, -1, axis)
    indices = jnp.moveaxis(indices, -1, axis).astype(jnp.int32)
    return values, indices
