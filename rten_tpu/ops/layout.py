"""Shape/layout operators: Reshape, Flatten, Squeeze, Unsqueeze, Transpose,
Expand, Shape, Size, Concat, Split, Slice, Pad, Tile, Trilu.

These are metadata-only or data-movement ops (reference
``src/ops/layout.rs``, ``concat.rs``, ``slice.rs``, ``pad.rs``,
``trilu.rs``); XLA folds most of them into surrounding computations.
Shape-valued operands (Reshape's target shape, Slice bounds, ...) must be
static at trace time; ``Shape``/``Size`` *produce* static numpy values so
shape-computation chains evaluate away during lowering.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .common import normalize_axis, static_ints
from .registry import OpError, register


@register("Reshape", static=(1,))
def reshape(ctx, attrs, x, shape):
    target = static_ints(shape)
    allow_zero = bool(attrs.get("allow_zero", False))
    out = []
    for i, d in enumerate(target):
        if d == 0 and not allow_zero:
            if i >= x.ndim:
                raise OpError("Reshape", "0-dim beyond input rank")
            out.append(x.shape[i])
        else:
            out.append(d)
    if out.count(-1) > 1:
        raise OpError("Reshape", "multiple -1 dims")
    return jnp.reshape(x, out)


@register("Flatten")
def flatten(ctx, attrs, x):
    axis = int(attrs.get("axis", 1))
    if axis < 0:
        axis += x.ndim
    lead = int(np.prod(x.shape[:axis], dtype=np.int64)) if axis else 1
    return jnp.reshape(x, (lead, -1))


@register("Squeeze", static=(1,))
def squeeze(ctx, attrs, x, axes=None):
    if axes is None:
        return jnp.squeeze(x)
    dims = [normalize_axis(a, x.ndim) for a in static_ints(axes)]
    return jnp.squeeze(x, axis=tuple(dims))


@register("Unsqueeze", static=(1,))
def unsqueeze(ctx, attrs, x, axes):
    out_rank = x.ndim + len(static_ints(axes))
    dims = sorted((a + out_rank) if a < 0 else a for a in static_ints(axes))
    return jnp.expand_dims(x, axis=tuple(dims))


@register("Transpose")
def transpose(ctx, attrs, x):
    perm = attrs.get("perm")
    if perm is None:
        return jnp.transpose(x)
    return jnp.transpose(x, [int(p) for p in np.asarray(perm).reshape(-1)])


@register("Expand", static=(1,))
def expand(ctx, attrs, x, shape):
    target = static_ints(shape)
    out_shape = np.broadcast_shapes(tuple(x.shape), tuple(target))
    return jnp.broadcast_to(x, out_shape)


@register("Shape")
def shape_op(ctx, attrs, x):
    # Static output: shape chains constant-fold during lowering.
    return np.asarray(x.shape, dtype=np.int32)


@register("Size")
def size_op(ctx, attrs, x):
    return np.asarray(int(np.prod(x.shape, dtype=np.int64)), dtype=np.int32)


@register("Concat")
def concat(ctx, attrs, *xs):
    axis = int(attrs.get("axis", 0))
    return jnp.concatenate(xs, axis=axis)


@register("Split", static=(1,))
def split(ctx, attrs, x, split_sizes=None):
    axis = normalize_axis(int(attrs.get("axis", 0)), x.ndim)
    n_out = ctx.n_outputs
    if split_sizes is None:
        size = x.shape[axis]
        base = -(-size // n_out)  # ceil, ONNX spec for uneven default split
        sizes = []
        remaining = size
        for _ in range(n_out):
            sizes.append(min(base, remaining))
            remaining -= sizes[-1]
    else:
        sizes = static_ints(split_sizes)
    bounds = np.cumsum(sizes)[:-1]
    return tuple(jnp.split(x, bounds, axis=axis))


@register("Slice", static=(1, 2, 3, 4))
def slice_(ctx, attrs, x, starts, ends, axes=None, steps=None):
    starts = static_ints(starts)
    ends = static_ints(ends)
    axes = static_ints(axes) if axes is not None else list(range(len(starts)))
    steps = static_ints(steps) if steps is not None else [1] * len(starts)
    index = [slice(None)] * x.ndim
    for start, end, axis, step in zip(starts, ends, axes, steps):
        axis = normalize_axis(axis, x.ndim)
        size = x.shape[axis]
        # ONNX clamps out-of-range bounds; INT_MAX/INT_MIN mean "to the end".
        if step > 0:
            start = min(max(start + size if start < 0 else start, 0), size)
            end = min(max(end + size if end < 0 else end, 0), size)
            index[axis] = slice(start, end, step)
        else:
            start = min(max(start + size if start < 0 else start, 0), size - 1)
            # ONNX: negative end counts from the back FIRST (end += size),
            # THEN clamps to [-1, size-1]; a post-adjust -1 (end < -size,
            # or INT_MIN) means "through index 0 inclusive" — Python None.
            end = end + size if end < 0 else end
            end = min(max(end, -1), size)
            index[axis] = slice(start, None if end < 0 else end, step)
    return x[tuple(index)]


@register("Pad", static=(1,))
def pad(ctx, attrs, x, pads, value=None):
    p = static_ints(pads)
    n = x.ndim
    if len(p) != 2 * n:
        raise OpError("Pad", f"expected {2*n} pad values, got {len(p)}")
    widths = [(p[i], p[n + i]) for i in range(n)]
    mode = int(attrs.get("mode", 0))     # PadMode enum (schema)
    if mode:
        name = {1: "reflect", 2: "edge", 3: "wrap"}.get(mode)
        if name is None:
            raise OpError("Pad", f"unknown mode {mode}")
        return jnp.pad(x, widths, mode=name)
    if value is None:
        return jnp.pad(x, widths)
    value = jnp.asarray(value).reshape(())
    import jax.lax as lax
    return lax.pad(x, value.astype(x.dtype),
                   [(lo, hi, 0) for lo, hi in widths])


@register("Tile", static=(1,))
def tile(ctx, attrs, x, repeats):
    return jnp.tile(x, static_ints(repeats))


@register("Trilu", static=(1,))
def trilu(ctx, attrs, x, k=None):
    upper = bool(attrs.get("upper", False))
    kk = 0 if k is None else static_ints(k)[0]
    if upper:
        return jnp.triu(x, kk)
    return jnp.tril(x, kk)
