"""Device-mesh construction: axes ``data`` (batch) × ``model`` (tensor
parallel). On a v5e-16 slice this is e.g. data=2 × model=8 with the model
axis riding ICI; on one chip it degenerates to 1×1; in tests it spans the
8 virtual CPU devices."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(data: int | None = None, model: int | None = None,
              devices=None, expert: int | None = None,
              pipe: int | None = None, seq: int | None = None) -> Mesh:
    """Axes beyond data×model are added on request: ``expert`` (MoE
    expert parallelism), ``pipe`` (pipeline stages), ``seq`` (sequence/
    context parallelism for long prefill). Order is data-outermost,
    model-innermost so the model axis rides the fastest ICI links."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    extra = {k: v for k, v in
             (("expert", expert), ("pipe", pipe), ("seq", seq))
             if v is not None}
    n_extra = int(np.prod(list(extra.values()))) if extra else 1
    if data is None and model is None:
        data, model = 1, n // n_extra
    elif data is None:
        data = n // (model * n_extra)
    elif model is None:
        model = n // (data * n_extra)
    shape = {"data": data, **extra, "model": model}
    if int(np.prod(list(shape.values()))) != n:
        raise ValueError(f"mesh {shape} != {n} devices")
    arr = np.array(devices).reshape(tuple(shape.values()))
    return Mesh(arr, tuple(shape.keys()))


def mesh_shape(mesh: Mesh) -> dict:
    return dict(zip(mesh.axis_names, mesh.devices.shape))
