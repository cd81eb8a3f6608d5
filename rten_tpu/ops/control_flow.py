"""Control flow: the ``If`` operator.

Reference: ``src/ops/control_flow.rs`` + subgraph capture machinery
(``src/graph.rs:399-462``). Lowering strategy: when both branches produce
identical output shapes/dtypes the op traces to ``lax.cond`` (both
branches compiled into the one XLA computation); in eager mode, or when
shapes diverge, the concrete condition picks a branch on host — the same
fallback the reference's interpreter effectively performs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .registry import OpError, register


@register("If", has_subgraph=True)
def if_(ctx, attrs, cond):
    then_fn = ctx.subgraph_fn("then_branch")
    else_fn = ctx.subgraph_fn("else_branch")
    if then_fn is None or else_fn is None:
        raise OpError("If", "missing branch subgraph")

    if isinstance(cond, np.ndarray) or ctx.eager:
        # Concrete condition: run only the taken branch.
        taken = bool(np.asarray(cond).reshape(-1)[0])
        return then_fn() if taken else else_fn()

    pred = jnp.reshape(cond, (-1,))[0] != 0
    then_shapes = jax.eval_shape(then_fn)
    else_shapes = jax.eval_shape(else_fn)
    if then_shapes != else_shapes:
        raise OpError(
            "If", "branch output shapes differ; this graph requires eager "
            f"execution (then={then_shapes}, else={else_shapes})")
    return jax.lax.cond(pred, then_fn, else_fn)
