"""Tests for the debugging trio (reference tools/: debug_utils.py,
ort-infer.py + add-node-outputs-to-model.py → tools/rten_infer.py,
compare-tensors.py → tools/compare_tensors.py)."""

import os
import sys

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, TOOLS)

from tools import debug_utils  # noqa: E402
from tools import compare_tensors  # noqa: E402


def test_tensor_dump_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    for shape in [(3, 4), (2, 1, 5), (7,), ()]:
        arr = np.asarray(rng.randn(*shape), dtype=np.float32)
        path = str(tmp_path / "t.bin")
        debug_utils.write_tensor(arr, path)
        back = debug_utils.read_tensor(path)
        assert back.shape == arr.shape
        np.testing.assert_array_equal(back, arr)


def test_tensor_dump_wire_layout(tmp_path):
    # Byte-level check of the shared wire format:
    # [rank:u32][dims:u32*rank][f32 data], little-endian.
    arr = np.arange(6, dtype=np.float32).reshape(2, 3)
    path = str(tmp_path / "t.bin")
    debug_utils.write_tensor(arr, path)
    raw = open(path, "rb").read()
    assert raw[:4] == (2).to_bytes(4, "little")
    assert raw[4:8] == (2).to_bytes(4, "little")
    assert raw[8:12] == (3).to_bytes(4, "little")
    assert np.frombuffer(raw[12:], dtype="<f4").tolist() == arr.ravel().tolist()


def test_tensor_dump_truncated_errors(tmp_path):
    arr = np.ones((4, 4), np.float32)
    path = str(tmp_path / "t.bin")
    debug_utils.write_tensor(arr, path)
    with open(path, "r+b") as fh:
        fh.truncate(os.path.getsize(path) - 8)
    with pytest.raises(ValueError):
        debug_utils.read_tensor(path)


def test_compare_tensors_tolerances():
    a = np.ones((4,), np.float32)
    assert compare_tensors.compare(a, a.copy()) == 0
    b = a.copy()
    b[1] += 1.0
    assert compare_tensors.compare(a, b) == 1


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    from rten_tpu.fmt.model_builder import ModelBuilder
    mb = ModelBuilder()
    g = mb.graph
    x = g.add_value("input", shape=[2, 8])
    w = g.add_constant("w", np.random.RandomState(0)
                       .randn(8, 4).astype(np.float32))
    y = g.add_operator("MatMul", [x, w], name="mm", output_names=["mm_out"])
    out = g.add_operator("Relu", [y], name="relu", output_names=["relu_out"])
    g.inputs, g.outputs = [x], [out]
    path = tmp_path_factory.mktemp("infer") / "model.rten"
    mb.save(path)
    return str(path)


def test_rten_infer_intermediate_fetch(model_path, capsys):
    from tools import rten_infer
    # Fetching a non-graph-output intermediate works without any model
    # rewriting (the RTen property the reference's add-node-outputs tool
    # exists to emulate for ORT).
    assert rten_infer.main([model_path, "--outputs", "mm_out"]) == 0
    out = capsys.readouterr().out
    assert "mm_out" in out and "shape [2, 4]" in out


def test_rten_infer_dump_all(model_path, tmp_path):
    from tools import rten_infer
    dump = str(tmp_path / "dump")
    assert rten_infer.main(
        [model_path, "--dump-dir", dump, "--format", "bin"]) == 0
    files = sorted(os.listdir(dump))
    assert files == ["mm_out.bin", "relu_out.bin"]
    relu = debug_utils.read_tensor(os.path.join(dump, "relu_out.bin"))
    assert relu.shape == (2, 4)
    assert (relu >= 0).all()


def test_rten_infer_input_override(model_path, tmp_path, capsys):
    from tools import rten_infer
    x = np.zeros((2, 8), np.float32)
    np.save(tmp_path / "x.npy", x)
    assert rten_infer.main(
        [model_path, "--input", f"input={tmp_path / 'x.npy'}"]) == 0
    out = capsys.readouterr().out
    # zero input -> relu(0 @ w) == 0
    assert "first [0. 0. 0. 0. 0. 0. 0. 0.]" in out
