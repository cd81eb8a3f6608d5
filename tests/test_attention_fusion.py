"""Graph-level attention fusion (ir/optimize.py::fuse_attention): the
MatMul→scale→mask→Softmax→MatMul chain becomes one FusedSDPA op whose
lowering matches the unfused graph exactly, routes maskless prefill
shapes through the flash kernel, recognizes constant causal masks, and
round-trips through the .rten serializer."""

import numpy as np
import pytest

from rten_tpu.ir import optimize as opt
from rten_tpu.ir.graph import Graph, OperatorNode
from rten_tpu.runtime.executor import GraphExecutor

rng = np.random.RandomState(0)


def _attn_graph(kind="div+mask", scale_const=8.0, mask_const=None):
    """Builds softmax(q@kt (/ or *) c (+ m)) @ v with graph inputs
    q/kt/v (+ m unless a constant mask is given)."""
    g = Graph()
    q = g.add_value("q")
    kt = g.add_value("kt")
    v = g.add_value("v")
    inputs = [q, kt, v]
    qk = g.add_value("qk")
    g.add_operator("qk", "MatMul", [q, kt], [qk])
    cur = qk
    if "div" in kind or "mul" in kind:
        c = g.add_constant("c", np.float32(
            scale_const if "div" in kind else 1.0 / scale_const))
        scaled = g.add_value("scaled")
        g.add_operator("scale", "Div" if "div" in kind else "Mul",
                       [cur, c], [scaled])
        cur = scaled
    if "mask" in kind:
        if mask_const is not None:
            m = g.add_constant("m", mask_const)
        else:
            m = g.add_value("m")
            inputs.append(m)
        masked = g.add_value("masked")
        g.add_operator("mask", "Add", [cur, m], [masked])
        cur = masked
    sm = g.add_value("sm")
    g.add_operator("softmax", "Softmax", [cur], [sm], {"axis": -1})
    out = g.add_value("out")
    g.add_operator("av", "MatMul", [sm, v], [out])
    g.inputs, g.outputs = inputs, [out]
    return g


def _run(g, feeds):
    return np.asarray(GraphExecutor(g).run(feeds)[0])


def _feeds(g, b=2, h=3, s=5, d=4, with_mask=False):
    feeds = {g.inputs[0]: rng.randn(b, h, s, d).astype(np.float32),
             g.inputs[1]: rng.randn(b, h, d, s).astype(np.float32),
             g.inputs[2]: rng.randn(b, h, s, d).astype(np.float32)}
    if with_mask:
        feeds[g.inputs[3]] = np.where(
            rng.rand(b, 1, 1, s) > 0.3, 0.0, -1e9).astype(np.float32)
    return feeds


@pytest.mark.parametrize("kind", ["div+mask", "mul+mask", "div", "mul",
                                  "mask", "plain"])
def test_fuse_attention_matches_unfused(kind):
    g = _attn_graph(kind)
    feeds = _feeds(g, with_mask="mask" in kind)
    want = _run(g, feeds)

    g2 = _attn_graph(kind)
    assert opt.fuse_attention(g2) == 1
    opt.prune_dead_nodes(g2)
    ops = [n.data.op_type for n in g2.nodes
           if isinstance(n.data, OperatorNode)]
    assert "FusedSDPA" in ops and "Softmax" not in ops
    got = _run(g2, feeds)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_causal_constant_mask_becomes_flag():
    s = 5
    mask = np.triu(np.full((1, 1, s, s), -1e9, np.float32), 1)
    g = _attn_graph("div+mask", mask_const=mask)
    feeds = _feeds(g)
    want = _run(g, feeds)
    assert opt.fuse_attention(g) == 1
    node = next(n.data for n in g.nodes
                if isinstance(n.data, OperatorNode)
                and n.data.op_type == "FusedSDPA")
    assert node.attrs["causal"] == 1
    assert node.inputs[3] is None       # mask dropped
    np.testing.assert_allclose(_run(g, feeds), want, rtol=1e-5,
                               atol=1e-6)


def test_non_scalar_scale_not_fused():
    g = _attn_graph("div")
    # Replace the scalar divisor with a vector: must not fuse.
    from rten_tpu.ir.graph import ConstantNode
    for n in g.nodes:
        if isinstance(n.data, ConstantNode) and n.data.array.size == 1:
            n.data = ConstantNode(np.ones(4, np.float32))
    assert opt.fuse_attention(g) == 0


def test_softmax_wrong_axis_not_fused():
    g = _attn_graph("div")
    for n in g.nodes:
        if isinstance(n.data, OperatorNode) and n.data.op_type == "Softmax":
            n.data.attrs["axis"] = 1
    assert opt.fuse_attention(g) == 0


def test_flash_path_matches_reference():
    """Maskless 4-D prefill-scale shapes route through flash_attention
    (exercised via interpret mode on CPU) and agree with the jnp chain."""
    b, h, s, d = 1, 2, 256, 16
    g = _attn_graph("div", scale_const=4.0)
    feeds = {g.inputs[0]: rng.randn(b, h, s, d).astype(np.float32),
             g.inputs[1]: rng.randn(b, h, d, s).astype(np.float32),
             g.inputs[2]: rng.randn(b, h, s, d).astype(np.float32)}
    want = _run(g, feeds)
    assert opt.fuse_attention(g) == 1
    got = _run(g, feeds)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_fused_graph_serializes_and_reloads(tmp_path):
    from rten_tpu.fmt.serialize import graph_to_bytes
    from rten_tpu.runtime.model import Model

    g = _attn_graph("div+mask",
                    mask_const=np.triu(
                        np.full((1, 1, 5, 5), -1e9, np.float32), 1))
    feeds = _feeds(g)
    want = _run(g, feeds)
    assert opt.fuse_attention(g) == 1
    from rten_tpu.runtime.model import ModelOptions
    path = tmp_path / "attn.rten"
    path.write_bytes(graph_to_bytes(g))
    model = Model.load_file(str(path), ModelOptions(optimize=False))
    got = np.asarray(model.run(
        {model.graph.inputs[i]: feeds[g.inputs[i]]
         for i in range(3)})[0])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_detr_graph_attention_fuses():
    """The pass fires on the real DETR .rten emission (enc self + dec
    self + dec cross attention per layer) and the fused model matches
    the native forward."""
    import jax.numpy as jnp
    from rten_tpu import Model
    from rten_tpu.ir.graph import graph_from_model_file
    from rten_tpu.fmt import container
    from rten_tpu.models.detr import Detr, DetrConfig, build_detr_rten

    cfg = DetrConfig.tiny_test()
    model = Detr(cfg)
    params = model.init_params(None)
    mb = build_detr_rten(model, params, input_hw=(64, 64))
    data = mb.to_bytes()

    graph = graph_from_model_file(container.load_bytes(data))
    n = opt.fuse_attention(graph)
    assert n == cfg.n_enc_layers + 2 * cfg.n_dec_layers, n

    x = np.random.RandomState(0).randn(1, 3, 64, 64).astype(np.float32)
    want_cls, _ = model.forward(params, jnp.asarray(x))
    gm = Model.load(data)   # Model.load optimizes -> fusion included
    got_cls, _ = gm.run({"input": x})
    np.testing.assert_allclose(np.asarray(got_cls), np.asarray(want_cls),
                               rtol=1e-3, atol=1e-3)
