"""Graph quantization tool + IR serialization round trip."""

import numpy as np
import jax
import pytest

from rten_tpu import Model
from rten_tpu.fmt import container
from rten_tpu.fmt.serialize import graph_to_bytes
from rten_tpu.ir.graph import OperatorNode, graph_from_model_file
from rten_tpu.ir.quantize_graph import quantize_graph_weights


def _mlp_rten_bytes():
    from rten_tpu.fmt.model_builder import ModelBuilder
    rng = np.random.RandomState(0)
    mb = ModelBuilder()
    g = mb.graph
    x = g.add_value("x", shape=["batch", 64])
    w1 = g.add_constant("w1", rng.randn(64, 128).astype(np.float32) * 0.1)
    w2 = g.add_constant("w2", rng.randn(128, 16).astype(np.float32) * 0.1)
    h = g.add_operator("MatMul", [x, w1], name="mm1")
    h = g.add_operator("Relu", [h], name="relu")
    y = g.add_operator("MatMul", [h, w2], name="mm2")
    g.inputs, g.outputs = [x], [y]
    return mb.to_bytes()


def test_serialize_roundtrip_preserves_semantics():
    data = _mlp_rten_bytes()
    graph = graph_from_model_file(container.load_bytes(data))
    rewritten = graph_to_bytes(graph)
    m1 = Model.load(data)
    m2 = Model.load(rewritten)
    x = np.random.RandomState(1).randn(2, 64).astype(np.float32)
    np.testing.assert_allclose(np.asarray(m1.run({"x": x})[0]),
                               np.asarray(m2.run({"x": x})[0]),
                               rtol=1e-6)


def test_quantize_graph_weights_qdq_and_accuracy():
    data = _mlp_rten_bytes()
    graph = graph_from_model_file(container.load_bytes(data))
    n = quantize_graph_weights(graph, min_elements=64)
    assert n == 2
    q_bytes = graph_to_bytes(graph)

    m_f32 = Model.load(data)
    m_q = Model.load(q_bytes)
    x = np.random.RandomState(2).randn(3, 64).astype(np.float32)
    want = np.asarray(m_f32.run({"x": x})[0])
    got = np.asarray(m_q.run({"x": x})[0])
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 0.05  # per-channel int8: small error

    # The load-time optimizer must have fused DQ→MatMul into MatMulInteger.
    ops = [m_q.graph.nodes[i].data.op_type for i in m_q.graph.plan()]
    assert "MatMulInteger" in ops
    assert "MatMul" not in ops


def test_quantize_graph_conv():
    import jax
    from rten_tpu.models.resnet import ResNet, ResNetConfig
    model = ResNet(ResNetConfig(depth=18, n_classes=10))
    params = model.init_params(jax.random.PRNGKey(0))
    mb = model.build_rten(params, input_shape=("batch", 3, 32, 32))
    graph = graph_from_model_file(container.load_bytes(mb.to_bytes()))
    n = quantize_graph_weights(graph, min_elements=512)
    assert n > 10  # most conv weights quantized
    m_q = Model.load(graph_to_bytes(graph))
    m_f = Model.load(mb.to_bytes())
    x = np.random.RandomState(0).randn(1, 3, 32, 32).astype(np.float32)
    want = np.asarray(m_f.run({"input": x})[0])
    got = np.asarray(m_q.run({"input": x})[0])
    # int8 conv weights: logits stay close in relative terms
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 0.1


def test_quantized_file_is_smaller():
    data = _mlp_rten_bytes()
    graph = graph_from_model_file(container.load_bytes(data))
    quantize_graph_weights(graph, min_elements=64)
    q_bytes = graph_to_bytes(graph)
    # int8 weights ≈ 1/4 the f32 payload (plus scales/overhead)
    assert len(q_bytes) < 0.6 * len(data)


def test_fuse_dequant_conv_int8_path():
    from rten_tpu.ir.optimize import (fuse_dequant_conv, prune_dead_nodes,
                                      propagate_constants)
    rng = np.random.RandomState(0)
    from rten_tpu.fmt.model_builder import ModelBuilder
    mb = ModelBuilder()
    g = mb.graph
    x = g.add_value("x", shape=[1, 2, 6, 6])
    w = g.add_constant("w", rng.randn(3, 2, 3, 3).astype(np.float32) * 0.2)
    bias = g.add_constant("b", rng.randn(3).astype(np.float32))
    y = g.add_operator("Conv", [x, w, bias],
                       attrs={"auto_pad": 1, "pads": [1, 1, 1, 1],
                              "strides": [1, 1], "groups": 1,
                              "dilations": [1, 1]}, name="conv")
    g.inputs, g.outputs = [x], [y]
    data = mb.to_bytes()

    graph = graph_from_model_file(container.load_bytes(data))
    assert quantize_graph_weights(graph, min_elements=32) == 1
    assert fuse_dequant_conv(graph) == 1
    propagate_constants(graph)
    prune_dead_nodes(graph)
    ops = [graph.nodes[i].data.op_type for i in graph.plan()]
    assert "ConvInteger" in ops and "Conv" not in ops

    m_q = Model.load(container.load_bytes(data).model and data)  # f32 ref
    from rten_tpu.runtime.executor import GraphExecutor
    x_in = rng.randn(1, 2, 6, 6).astype(np.float32)
    want = np.asarray(m_q.run({"x": x_in})[0])
    got = np.asarray(GraphExecutor(graph).run(
        {graph.node_id("x"): x_in})[0])
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 0.05
