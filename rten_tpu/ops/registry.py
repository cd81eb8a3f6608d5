"""Operator registry: op-type name → lowering function + metadata.

The TPU-native analog of the reference's ``Operator`` trait +
``OpRegistry`` (``src/ops/mod.rs:821-913``, ``src/op_registry.rs``): each
ONNX-equivalent operator is a pure lowering function
``fn(ctx, attrs, *inputs) -> array | tuple`` over ``jax.numpy``. The
executor traces these in topological order into a single XLA computation,
so there is no per-op dispatch at runtime — XLA owns fusion and
scheduling (the re-imagining of the reference's in-place/pool machinery).

Metadata per op:

* ``static``: input indices whose *values* must be known at trace time
  (shape-like operands: Reshape's shape, Slice's starts/ends, ...). The
  executor feeds these as numpy arrays resolved from constants or
  statically-propagated values, mirroring how the reference's shape
  operands are ordinary runtime tensors but XLA requires static shapes.
* ``data_dependent``: output shape depends on input *values* (NonZero,
  NonMaxSuppression) — not traceable with static shapes; the executor
  runs these on host in eager mode.
* ``random``: consumes PRNG state (``ctx.rng()``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable


@dataclass
class OpSpec:
    name: str
    fn: Callable
    static: tuple = ()
    data_dependent: bool = False
    random: bool = False
    has_subgraph: bool = False


OPS: dict[str, OpSpec] = {}


def register(name, static=(), data_dependent=False, random=False,
             has_subgraph=False):
    def deco(fn):
        OPS[name] = OpSpec(name, fn, tuple(static), data_dependent, random,
                           has_subgraph)
        return fn
    return deco


class OpError(ValueError):
    """Operator input/attribute validation error (analog of the
    reference's ``OpError``, ``src/ops/mod.rs:666-686``)."""

    def __init__(self, op_name, message):
        super().__init__(f"{op_name}: {message}")
        self.op_name = op_name


def get_op(name: str) -> OpSpec:
    spec = OPS.get(name)
    if spec is None:
        raise OpError(name, "operator not registered")
    return spec


def ensure_registered():
    """Import all op modules so their @register decorators run."""
    from . import (conv, control_flow, elementwise, gather, generate,  # noqa: F401
                   layout, matmul, nms, norm, pool, quantized, reduce,
                   resize, rnn)
