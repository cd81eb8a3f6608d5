"""Native C++ container reader: build, parity vs the Python reader, and
load-time comparison on a real graph."""

import time

import numpy as np
import jax
import pytest

from rten_tpu.fmt import container, native_loader
from rten_tpu.ir.graph import (ConstantNode, OperatorNode, ValueNode,
                               graph_from_model_file)
from rten_tpu.models.resnet import ResNet, ResNetConfig

pytestmark = pytest.mark.skipif(not native_loader.build(),
                                reason="g++ / make unavailable")


@pytest.fixture(scope="module")
def resnet_rten_bytes():
    model = ResNet(ResNetConfig(depth=18, n_classes=10))
    params = model.init_params(jax.random.PRNGKey(0))
    return model.build_rten(params, input_shape=("batch", 3, 32, 32)).to_bytes()


def test_native_reader_graph_parity(resnet_rten_bytes):
    buf = resnet_rten_bytes
    parsed = native_loader.read_model_json(buf)
    native_graph = native_loader.graph_from_native(buf, parsed)
    py_graph = graph_from_model_file(container.load_bytes(buf))

    assert len(native_graph.nodes) == len(py_graph.nodes)
    assert native_graph.inputs == py_graph.inputs
    assert native_graph.outputs == py_graph.outputs
    for n_nat, n_py in zip(native_graph.nodes, py_graph.nodes):
        assert n_nat.name == n_py.name
        assert type(n_nat.data) is type(n_py.data)
        if isinstance(n_py.data, OperatorNode):
            assert n_nat.data.op_type == n_py.data.op_type
            assert n_nat.data.inputs == n_py.data.inputs
            assert n_nat.data.outputs == n_py.data.outputs
            assert set(n_nat.data.attrs) == set(n_py.data.attrs)
            for key, val in n_py.data.attrs.items():
                nval = n_nat.data.attrs.get(key)
                if isinstance(val, np.ndarray) or isinstance(nval, np.ndarray):
                    np.testing.assert_array_equal(np.asarray(nval),
                                                  np.asarray(val))
                else:
                    assert nval == val, (n_py.name, key)
        elif isinstance(n_py.data, ConstantNode):
            np.testing.assert_array_equal(n_nat.data.array, n_py.data.array)
        elif isinstance(n_py.data, ValueNode):
            assert n_nat.data.shape == n_py.data.shape


def test_native_reader_metadata(resnet_rten_bytes):
    parsed = native_loader.read_model_json(resnet_rten_bytes)
    assert "ResNet-18" in parsed["metadata"]["description"]


def test_model_load_uses_native_and_runs(resnet_rten_bytes):
    from rten_tpu import Model, ModelOptions
    m_native = Model.load(resnet_rten_bytes, ModelOptions(native=True))
    m_python = Model.load(resnet_rten_bytes, ModelOptions(native=False))
    x = np.random.RandomState(0).randn(1, 3, 32, 32).astype(np.float32)
    out_n = np.asarray(m_native.run({"input": x})[0])
    out_p = np.asarray(m_python.run({"input": x})[0])
    np.testing.assert_allclose(out_n, out_p, rtol=1e-5, atol=1e-5)


def test_native_loader_speed(resnet_rten_bytes):
    buf = resnet_rten_bytes
    native_loader.read_model_json(buf)  # warm
    t0 = time.perf_counter()
    parsed = native_loader.read_model_json(buf)
    native_loader.graph_from_native(buf, parsed)
    native_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    graph_from_model_file(container.load_bytes(buf))
    python_s = time.perf_counter() - t0
    # The C++ walk should beat the pure-Python FlatBuffers walk.
    assert native_s < python_s


def test_if_subgraph_through_native_loader():
    from rten_tpu.fmt.model_builder import ModelBuilder
    from rten_tpu import Model, ModelOptions
    mb = ModelBuilder()
    g = mb.graph
    cond = g.add_value("cond", shape=[1])
    then_g = mb.subgraph()
    tc = then_g.add_constant("t", np.float32(5.0).reshape(()))
    then_g.outputs = [tc]
    else_g = mb.subgraph()
    ec = else_g.add_constant("e", np.float32(7.0).reshape(()))
    else_g.outputs = [ec]
    out = g.add_operator("If", [cond],
                         attrs={"then_branch": then_g,
                                "else_branch": else_g})
    g.inputs, g.outputs = [cond], [out]
    model = Model.load(mb.to_bytes(), ModelOptions(native=True))
    got = float(np.asarray(
        model.run({"cond": np.asarray([1], np.int32)})[0]))
    assert got == 5.0
