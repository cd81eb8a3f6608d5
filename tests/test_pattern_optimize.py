"""Pattern-matcher DSL + fusion pass tests (analog of the reference's
optimizer fusion tests in src/optimize.rs)."""

import numpy as np
import pytest

from rten_tpu.ir.graph import Graph, OperatorNode
from rten_tpu.ir import optimize as opt
from rten_tpu.ir.pattern import Const, Op, Symbol, find_matches
from rten_tpu.runtime.executor import GraphExecutor


def randf(*shape):
    return np.random.RandomState(0).randn(*shape).astype(np.float32)


def _silu_graph():
    g = Graph()
    x = g.add_value("x")
    s = g.add_value("s")
    out = g.add_value("out")
    g.add_operator("sig", "Sigmoid", [x], [s])
    g.add_operator("mul", "Mul", [x, s], [out])
    g.inputs, g.outputs = [x], [out]
    return g, x, out


def test_pattern_matches_silu():
    g, x, out = _silu_graph()
    pat = Op("Mul", Op("Sigmoid", Symbol("x")), Symbol("x"),
             commutative=True)
    matches = find_matches(g, pat)
    assert len(matches) == 1
    value_id, bindings = matches[0]
    assert value_id == out
    assert bindings["x"] == x


def test_pattern_symbol_consistency():
    # Mul(sigmoid(x), y) with x != y must NOT match the silu pattern.
    g = Graph()
    x = g.add_value("x")
    y = g.add_value("y")
    s = g.add_value("s")
    out = g.add_value("out")
    g.add_operator("sig", "Sigmoid", [x], [s])
    g.add_operator("mul", "Mul", [s, y], [out])
    g.inputs, g.outputs = [x, y], [out]
    pat = Op("Mul", Op("Sigmoid", Symbol("x")), Symbol("x"),
             commutative=True)
    assert find_matches(g, pat) == []


def test_const_pattern():
    g = Graph()
    x = g.add_value("x")
    half = g.add_constant("half", np.float32(0.5))
    out = g.add_value("out")
    g.add_operator("mul", "Mul", [x, half], [out])
    g.inputs, g.outputs = [x], [out]
    assert find_matches(g, Op("Mul", Symbol("v"), Const(value=0.5)))
    assert not find_matches(g, Op("Mul", Symbol("v"), Const(value=0.7)))


def test_fuse_silu_rewrites_and_preserves_semantics():
    g, x, out = _silu_graph()
    ref = GraphExecutor(g)
    xin = randf(3, 4)
    want = np.asarray(ref.run_eager({x: xin})[0])

    assert opt.fuse_silu(g) == 1
    opt.prune_dead_nodes(g)
    ops = [g.nodes[i].data.op_type for i in g.plan()]
    assert ops == ["Silu"]
    got = np.asarray(GraphExecutor(g).run_eager({x: xin})[0])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_fuse_dequant_matmul():
    rng = np.random.RandomState(0)
    g = Graph()
    a_q = g.add_value("a_q")
    a_s = g.add_constant("a_s", np.float32(0.02))
    w_q = g.add_constant("w_q", rng.randint(-127, 128, (4, 3)).astype(np.int8))
    w_s = g.add_constant("w_s", np.float32(0.05))
    a_f = g.add_value("a_f")
    w_f = g.add_value("w_f")
    out = g.add_value("out")
    g.add_operator("dqa", "DequantizeLinear", [a_q, a_s], [a_f],
                   {"axis": 1})
    g.add_operator("dqw", "DequantizeLinear", [w_q, w_s], [w_f],
                   {"axis": 1})
    g.add_operator("mm", "MatMul", [a_f, w_f], [out])
    g.inputs, g.outputs = [a_q], [out]

    a_in = rng.randint(-127, 128, (2, 4)).astype(np.int8)
    want = np.asarray(GraphExecutor(g).run_eager({a_q: a_in})[0])

    assert opt.fuse_dequant_matmul(g) == 1
    opt.prune_dead_nodes(g)
    ops = sorted(g.nodes[i].data.op_type for i in g.plan())
    assert "MatMulInteger" in ops and "MatMul" not in ops
    got = np.asarray(GraphExecutor(g).run_eager({a_q: a_in})[0])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_full_optimize_pipeline_runs():
    g, x, out = _silu_graph()
    opt.optimize(g)
    got = GraphExecutor(g).run_eager({x: randf(2, 2)})
    assert len(got) == 1
