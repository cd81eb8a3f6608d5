"""Graph optimizer: load-time passes over the IR.

Analog of the reference's ``GraphOptimizer`` (``src/optimize.rs:286-297``)
with TPU-appropriate scope: XLA already fuses elementwise chains, LayerNorm
patterns, transposes-into-dot etc., so unlike the reference we do NOT need
Silu/Gelu/LayerNorm pattern fusions for performance. What remains valuable
at the IR level:

* constant propagation (evaluate the zero-input computable prefix and
  replace it with Constant nodes) — shrinks graphs and turns shape
  operands static (reference ``src/optimize.rs:301-327``);
* dead-node pruning;
* (for quantized graphs) dequant→matmul fusion happens at lowering time
  in the kernels layer, keyed by pattern matches from
  :mod:`rten_tpu.ir.pattern`.
"""

from __future__ import annotations

import numpy as np

from ..ops.registry import get_op
from .graph import ConstantNode, Graph, OperatorNode, ValueNode


def propagate_constants(graph: Graph) -> int:
    """Evaluate every operator whose inputs are all constants and replace
    its outputs with Constant nodes. Returns number of ops folded."""
    from ..runtime.executor import GraphExecutor

    executor = GraphExecutor(graph)
    try:
        values = executor.partial_run({}, graph.outputs)
    except Exception:
        return 0
    folded = 0
    for node_id, value in values.items():
        node = graph.nodes[node_id]
        if isinstance(node.data, ConstantNode):
            continue
        arr = np.asarray(value)
        producer = graph.producer_of(node_id)
        graph.nodes[node_id].data = ConstantNode(arr)
        if producer is not None:
            folded += 1
        graph._producer.pop(node_id, None)
    return folded


def prune_dead_nodes(graph: Graph) -> int:
    """Detach operator nodes not needed for the graph outputs. Node ids
    stay stable (nodes become inert), mirroring how the reference's plan
    simply never visits them."""
    try:
        plan = set(graph.plan(graph.inputs, graph.outputs))
    except ValueError:
        return 0
    removed = 0
    for i, node in enumerate(graph.nodes):
        if isinstance(node.data, OperatorNode) and i not in plan:
            for out in node.data.outputs:
                if out is not None and graph._producer.get(out) == i:
                    graph._producer.pop(out, None)
            node.data = ValueNode(None)
            removed += 1
    return removed


def optimize(graph: Graph) -> Graph:
    propagate_constants(graph)
    prune_dead_nodes(graph)
    return graph
