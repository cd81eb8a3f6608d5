"""Round-trip tests for the RTen container format (header + FlatBuffers
model data + tensor segment)."""

import numpy as np
import pytest

from rten_tpu.fmt import flatbuf as fb
from rten_tpu.fmt import container, schema
from rten_tpu.fmt.header import Header, HeaderError, detect_version
from rten_tpu.fmt.model_builder import ModelBuilder


def test_header_roundtrip():
    h = Header(2, 32, 100, 192)
    buf = h.to_bytes() + b"\x00" * 200
    h2 = Header.from_buf(buf)
    assert h2 == h


def test_header_rejects_bad_magic():
    with pytest.raises(HeaderError):
        Header.from_buf(b"NOPE" + b"\x00" * 60)


def test_header_rejects_bad_version():
    h = Header(2, 32, 10, 0).to_bytes()
    bad = h[:4] + b"\x09\x00\x00\x00" + h[8:]
    with pytest.raises(HeaderError):
        Header.from_buf(bad + b"\x00" * 40)


def test_builder_scalar_table_roundtrip():
    b = fb.Builder()
    b.start_table()
    b.add_scalar(0, "i32", -3, 0)
    b.add_scalar(1, "bool", True, False)
    b.add_scalar(2, "f32", 1.5, 0.0)
    t = b.end_table()
    buf = b.finish(t, b"TEST")
    root = fb.root_table(buf)
    assert fb.table_scalar(buf, root, 0, "i32", 0) == -3
    assert fb.table_scalar(buf, root, 1, "bool", False) is True
    assert fb.table_scalar(buf, root, 2, "f32", 0.0) == 1.5
    # absent slot returns default
    assert fb.table_scalar(buf, root, 3, "i32", 42) == 42


def test_builder_default_values_omitted():
    b = fb.Builder()
    b.start_table()
    b.add_scalar(0, "i32", 0, 0)  # equals default: not stored
    t = b.end_table()
    buf = b.finish(t)
    root = fb.root_table(buf)
    assert fb.field_pos(buf, root, 0) is None
    assert fb.table_scalar(buf, root, 0, "i32", 7) == 7


def test_builder_string_and_vectors():
    b = fb.Builder()
    s = b.string("héllo")
    v = b.scalar_vector("i32", [1, -2, 3])
    f = b.scalar_vector("f32", [0.5, 2.0])
    b.start_table()
    b.add_offset(0, s)
    b.add_offset(1, v)
    b.add_offset(2, f)
    t = b.end_table()
    buf = b.finish(t)
    root = fb.root_table(buf)
    assert fb.table_string(buf, root, 0) == "héllo"
    np.testing.assert_array_equal(
        fb.scalar_vector(buf, fb.table_vector_pos(buf, root, 1), "i32"),
        [1, -2, 3])
    np.testing.assert_array_equal(
        fb.scalar_vector(buf, fb.table_vector_pos(buf, root, 2), "f32"),
        [0.5, 2.0])


def test_schema_table_roundtrip():
    attrs = {"alpha": 1.0, "beta": 0.5, "transpose_a": True,
             "transpose_b": False}
    b = fb.Builder()
    off = schema.write_table(b, "GemmAttrs", attrs)
    buf = b.finish(off)
    got = schema.read_table(buf, fb.root_table(buf), "GemmAttrs")
    assert got == attrs


def test_schema_union_roundtrip():
    node = {"name": "x",
            "data": ("ValueNode",
                     {"shape": [{"value": 0, "name": "batch"},
                                {"value": 3, "name": None}]})}
    b = fb.Builder()
    off = schema.write_table(b, "Node", node)
    buf = b.finish(off)
    got = schema.read_table(buf, fb.root_table(buf), "Node")
    assert got["name"] == "x"
    kind, val = got["data"]
    assert kind == "ValueNode"
    assert val["shape"][0]["name"] == "batch"
    assert val["shape"][1]["value"] == 3


def _build_sample_model():
    mb = ModelBuilder()
    g = mb.graph
    x = g.add_value("input", shape=["batch", 4])
    w = g.add_constant("weight", np.arange(16, dtype=np.float32).reshape(4, 4))
    bias = g.add_constant("bias", np.ones(4, dtype=np.float32), external=True)
    y = g.add_operator("Gemm", [x, w, bias],
                       attrs={"alpha": 1.0, "beta": 1.0}, name="gemm")
    out = g.add_operator("Relu", [y], name="relu")
    g.inputs = [x]
    g.outputs = [out]
    mb.metadata = {"description": "test model", "license": "MIT"}
    return mb


def test_model_roundtrip_bytes():
    mb = _build_sample_model()
    data = mb.to_bytes()
    mf = container.load_bytes(data)
    graph = mf.model["graph"]
    names = [n["name"] for n in graph["nodes"]]
    assert "input" in names and "weight" in names
    assert mf.model["metadata"]["description"] == "test model"
    # Operators decode with attrs
    ops = [n for n in graph["nodes"] if n["data"][0] == "OperatorNode"]
    assert len(ops) == 2
    gemm = ops[0]["data"][1]
    assert schema.OP_TYPES[gemm["type"]] == "Gemm"
    table, attrs = gemm["attrs"]
    assert table == "GemmAttrs" and attrs["alpha"] == 1.0 and attrs["beta"] == 1.0


def test_model_roundtrip_file(tmp_path):
    mb = _build_sample_model()
    path = tmp_path / "model.rten"
    mb.save(path)
    raw = path.read_bytes()
    assert detect_version(raw) == 2
    mf = container.load_file(path)
    graph = mf.model["graph"]
    consts = {n["name"]: n["data"][1] for n in graph["nodes"]
              if n["data"][0] == "ConstantNode"}
    w = mf.constant_array(consts["weight"])
    np.testing.assert_array_equal(w, np.arange(16, dtype=np.float32).reshape(4, 4))
    b = mf.constant_array(consts["bias"])
    np.testing.assert_array_equal(b, np.ones(4, dtype=np.float32))
    # external tensor data is 64-byte aligned in the file
    assert consts["bias"]["data_offset"] % 64 == 0


def test_external_tensor_alignment():
    tb = container.TensorDataBuilder()
    o1 = tb.add(np.ones(3, dtype=np.float32))
    o2 = tb.add(np.ones(5, dtype=np.int32))
    assert o1 == 0
    assert o2 == 64
    assert len(tb.to_bytes()) == 64 + 20


def test_if_subgraph_roundtrip():
    mb = ModelBuilder()
    g = mb.graph
    cond = g.add_value("cond", shape=[1])
    then_g = mb.subgraph()
    tc = then_g.add_constant("t", np.float32(1.0).reshape(()))
    then_g.outputs = [tc]
    else_g = mb.subgraph()
    ec = else_g.add_constant("e", np.float32(2.0).reshape(()))
    else_g.outputs = [ec]
    out = g.add_operator("If", [cond],
                         attrs={"then_branch": then_g, "else_branch": else_g})
    g.inputs = [cond]
    g.outputs = [out]
    mf = container.load_bytes(mb.to_bytes())
    ops = [n for n in mf.model["graph"]["nodes"] if n["data"][0] == "OperatorNode"]
    table, attrs = ops[0]["data"][1]["attrs"]
    assert table == "IfAttrs"
    assert attrs["then_branch"]["nodes"][0]["name"] == "t"
    assert attrs["else_branch"]["nodes"][0]["name"] == "e"


def test_wire_conformance_with_official_runtime():
    """Build a buffer with the official flatbuffers runtime and read it with
    our reader — proves our decoder speaks the real wire format (and vice
    versa via the symmetric check below)."""
    import flatbuffers
    b = flatbuffers.Builder(64)
    s = b.CreateString("gemm_node")
    b.StartObject(3)
    b.PrependUOffsetTRelativeSlot(0, s, 0)
    b.PrependInt32Slot(1, -77, 0)
    b.PrependFloat32Slot(2, 2.25, 0.0)
    t = b.EndObject()
    b.Finish(t, file_identifier=b"RTEN")
    buf = bytes(b.Output())
    root = fb.root_table(buf)
    assert bytes(buf[4:8]) == b"RTEN"
    assert fb.table_string(buf, root, 0) == "gemm_node"
    assert fb.table_scalar(buf, root, 1, "i32", 0) == -77
    assert fb.table_scalar(buf, root, 2, "f32", 0.0) == 2.25

    # Symmetric: our builder's output parses with the official runtime.
    ours = fb.Builder()
    s2 = ours.string("gemm_node")
    ours.start_table()
    ours.add_offset(0, s2)
    ours.add_scalar(1, "i32", -77, 0)
    ours.add_scalar(2, "f32", 2.25, 0.0)
    t2 = ours.end_table()
    data = ours.finish(t2, b"RTEN")
    import flatbuffers.table
    n = flatbuffers.encode.Get(flatbuffers.packer.uoffset, data, 0)
    tab = flatbuffers.table.Table(data, n)
    assert tab.String(tab.Offset(4) + tab.Pos).decode() == "gemm_node"
    off = tab.Offset(6)
    assert tab.Get(flatbuffers.number_types.Int32Flags, off + tab.Pos) == -77
