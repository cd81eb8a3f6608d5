"""Gather / scatter family: Gather, GatherElements, GatherND,
ScatterElements, ScatterND, OneHot.

Reference: ``src/ops/gather.rs``. Lowered to XLA gather/scatter via
``jnp.take`` / ``take_along_axis`` / ``.at[]`` updates, which TPU executes
as native dynamic-gather HLO.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fmt import schema
from .common import normalize_axis, static_int
from .registry import OpError, register

_REDUCTIONS = schema.ENUMS["ScatterReduction"]


def _norm_indices(indices, dim_size):
    return jnp.where(indices < 0, indices + dim_size, indices)


@register("Gather")
def gather(ctx, attrs, x, indices):
    axis = normalize_axis(int(attrs.get("axis", 0)), x.ndim)
    idx = _norm_indices(indices, x.shape[axis])
    return jnp.take(x, idx, axis=axis)


@register("GatherElements")
def gather_elements(ctx, attrs, x, indices):
    axis = normalize_axis(int(attrs.get("axis", 0)), x.ndim)
    idx = _norm_indices(indices, x.shape[axis])
    return jnp.take_along_axis(x, idx, axis=axis)


@register("GatherND")
def gather_nd(ctx, attrs, x, indices):
    batch_dims = int(attrs.get("batch_dims", 0))
    k = indices.shape[-1]
    if k + batch_dims > x.ndim:
        raise OpError("GatherND", "index depth exceeds data rank")
    dims = x.shape[batch_dims:batch_dims + k]
    norm = [
        _norm_indices(indices[..., i], dims[i]) for i in range(k)
    ]

    if batch_dims == 0:
        return x[tuple(norm)]

    batch_shape = x.shape[:batch_dims]
    x_flat = x.reshape((-1,) + x.shape[batch_dims:])
    norm_flat = [n.reshape((-1,) + n.shape[batch_dims:]) for n in norm]

    def one(batch_x, *batch_idx):
        return batch_x[tuple(batch_idx)]

    out = jax.vmap(one)(x_flat, *norm_flat)
    return out.reshape(batch_shape + out.shape[1:])


def _scatter_apply(ref, reduction, updates):
    name = _REDUCTIONS[reduction]
    if name == "None":
        return ref.set(updates)
    if name == "Add":
        return ref.add(updates)
    if name == "Mul":
        return ref.multiply(updates)
    if name == "Min":
        return ref.min(updates)
    if name == "Max":
        return ref.max(updates)
    raise OpError("Scatter", f"unknown reduction {reduction}")


@register("ScatterElements")
def scatter_elements(ctx, attrs, x, indices, updates):
    axis = normalize_axis(int(attrs.get("axis", 0)), x.ndim)
    reduction = int(attrs.get("reduction", 0))
    idx = _norm_indices(indices, x.shape[axis])
    grids = []
    for d in range(x.ndim):
        if d == axis:
            grids.append(idx)
        else:
            grids.append(jax.lax.broadcasted_iota(jnp.int32, idx.shape, d))
    return _scatter_apply(x.at[tuple(grids)], reduction, updates)


@register("ScatterND")
def scatter_nd(ctx, attrs, x, indices, updates):
    reduction = int(attrs.get("reduction", 0))
    k = indices.shape[-1]
    idx = tuple(_norm_indices(indices[..., i], x.shape[i]) for i in range(k))
    return _scatter_apply(x.at[idx], reduction, updates)


@register("OneHot", static=(1,))
def one_hot(ctx, attrs, indices, depth, values):
    axis = int(attrs.get("axis", -1))
    d = static_int(depth)
    out_rank = indices.ndim + 1
    if axis < 0:
        axis += out_rank
    idx = _norm_indices(indices, d)
    hot = jax.nn.one_hot(idx, d, axis=axis, dtype=values.dtype)
    off, on = values[0], values[1]
    return hot * (on - off) + off
