"""Multi-host execution: ``jax.distributed`` bring-up and hybrid
DCN × ICI meshes.

The reference has no distributed layer at all (single-process CPU,
SURVEY.md §2.3/§5); this is the green-field TPU design for serving a
model across hosts of a pod slice:

* ``initialize_multihost()`` — one call per process (coordinator address
  + process id/count from args or the TPU environment); after it,
  ``jax.devices()`` spans the whole slice.
* ``make_hybrid_mesh(dcn_data, data, model)`` — a 3-axis mesh whose
  outermost ``dcn`` axis maps across hosts (slow network) and whose
  ``data``/``model`` axes stay inside each host's ICI domain. Sharding
  rules put ONLY batch parallelism on ``dcn`` (no per-layer collectives
  cross DCN; each host holds a full model replica or its ICI-sharded
  part) — the standard hybrid recipe: TP over ICI, DP over DCN.
* single-process fallback: with one process the ``dcn`` axis simply
  splits local devices, so the same code paths (and the CPU test mesh)
  exercise the 3-axis shardings without hardware.

Gate from BASELINE.json: ≥85% multi-host scaling efficiency — measured
by tools/bench_scaling.py when multi-host hardware is attached.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """Bring up jax.distributed. On TPU pods the arguments come from the
    environment (TPU_WORKER_HOSTNAMES etc.) and may all be None; on
    other platforms pass them explicitly. Safe to call once per process
    before any jax computation. No-op if already initialized."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError as exc:
        # Already initialized, or backends already started (single-
        # process runs that touched jax first) — both leave the process
        # in a usable state; report what we have.
        msg = str(exc).lower()
        if "already" not in msg and "backend" not in msg:
            raise
    return jax.process_count(), jax.process_index()


def make_hybrid_mesh(dcn_data: int | None = None, data: int | None = None,
                     model: int | None = None, devices=None) -> Mesh:
    """3-axis mesh ``(dcn, data, model)``.

    Multi-process: the ``dcn`` axis iterates processes (each host's
    devices stay contiguous in the inner axes, so ``data``/``model``
    collectives ride ICI). Single-process: the ``dcn`` axis splits local
    devices — same program, test-runnable on a CPU device farm."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    n_proc = getattr(jax, "process_count", lambda: 1)()
    if dcn_data is None:
        dcn_data = n_proc if n_proc > 1 else 1
    per_dcn = n // dcn_data
    if model is None:
        model = per_dcn if data is None else per_dcn // data
    if data is None:
        data = per_dcn // model
    if dcn_data * data * model != n:
        raise ValueError(
            f"mesh {dcn_data}x{data}x{model} != {n} devices")

    if n_proc > 1:
        # Order devices host-major so the dcn axis crosses hosts and the
        # inner axes stay within one host's ICI domain.
        devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    arr = np.array(devices).reshape(dcn_data, data, model)
    return Mesh(arr, ("dcn", "data", "model"))


def batch_spec(mesh: Mesh) -> P:
    """PartitionSpec for a leading batch dim: over ("dcn", "data") when
    the mesh has a dcn axis, else ("data",)."""
    if "dcn" in mesh.axis_names:
        return P(("dcn", "data"))
    return P("data")


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    spec = list(batch_spec(mesh)) + [None] * (ndim - 1)
    return NamedSharding(mesh, P(*spec))
