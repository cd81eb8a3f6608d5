"""Resize (nearest / linear) with ONNX coordinate-transform modes.

Reference: ``src/ops/resize.rs``. Because scales/sizes are static at trace
time, all coordinate math happens in numpy during lowering and the kernel
reduces to axis-wise gathers (+ lerp for linear) — XLA turns these into
dense gathers, no dynamic shapes involved.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..fmt import schema
from .registry import OpError, register

_MODES = schema.ENUMS["ResizeMode"]
_COORD = schema.ENUMS["CoordTransformMode"]
_NEAREST = schema.ENUMS["NearestMode"]


def _source_coords(out_size, in_size, coord_mode):
    x = np.arange(out_size, dtype=np.float64)
    scale = out_size / in_size
    if coord_mode == "HalfPixel":
        return (x + 0.5) / scale - 0.5
    if coord_mode == "Asymmetric":
        return x / scale
    if coord_mode == "AlignCorners":
        if out_size == 1:
            return np.zeros_like(x)
        return x * (in_size - 1) / (out_size - 1)
    raise OpError("Resize", f"unsupported coord mode {coord_mode}")


def _nearest_round(coords, nearest_mode):
    if nearest_mode == "Floor":
        return np.floor(coords)
    if nearest_mode == "Ceil":
        return np.ceil(coords)
    if nearest_mode == "RoundPreferFloor":
        return np.ceil(coords - 0.5)
    if nearest_mode == "RoundPreferCeil":
        return np.floor(coords + 0.5)
    raise OpError("Resize", f"unsupported nearest mode {nearest_mode}")


@register("Resize", static=(1, 2, 3))
def resize(ctx, attrs, x, roi=None, scales=None, sizes=None):
    mode = _MODES[int(attrs.get("mode", 0))]
    coord_mode = _COORD[int(attrs.get("coord_mode", 0))]
    nearest_mode = _NEAREST[int(attrs.get("nearest_mode", 0))]

    if sizes is not None and np.asarray(sizes).size:
        target = [int(s) for s in np.asarray(sizes).reshape(-1)]
    elif scales is not None and np.asarray(scales).size:
        sc = np.asarray(scales, dtype=np.float64).reshape(-1)
        if len(sc) != x.ndim:
            raise OpError("Resize", "scales length must equal input rank")
        target = [int(np.floor(x.shape[i] * sc[i])) for i in range(x.ndim)]
    else:
        raise OpError("Resize", "requires scales or sizes")
    if len(target) != x.ndim:
        raise OpError("Resize", "sizes length must equal input rank")

    out = x
    for axis in range(x.ndim):
        in_size = out.shape[axis]
        out_size = target[axis]
        if out_size == in_size:
            continue
        coords = _source_coords(out_size, in_size, coord_mode)
        if mode == "Nearest":
            idx = _nearest_round(coords, nearest_mode)
            idx = np.clip(idx, 0, in_size - 1).astype(np.int32)
            out = jnp.take(out, jnp.asarray(idx), axis=axis)
        else:  # Linear: separable 1-D lerp along this axis
            lo = np.clip(np.floor(coords), 0, in_size - 1).astype(np.int32)
            hi = np.clip(lo + 1, 0, in_size - 1)
            frac = np.clip(coords - lo, 0.0, 1.0).astype(np.float32)
            shape = [1] * out.ndim
            shape[axis] = out_size
            w = jnp.asarray(frac).reshape(shape)
            a = jnp.take(out, jnp.asarray(lo), axis=axis)
            b = jnp.take(out, jnp.asarray(hi), axis=axis)
            out = a * (1.0 - w) + b * w
    return out
