"""Table-driven operator tests (the analog of the reference's per-module
``mod tests``): each case runs through the executor in BOTH eager and jit
modes and compares against a numpy golden."""

import numpy as np
import pytest

from rten_tpu.ir.graph import Graph
from rten_tpu.runtime.executor import GraphExecutor, RunOptions


def run_op(op_type, inputs, attrs=None, n_outputs=1, const_mask=None,
           mode="both"):
    """Build a one-op graph and execute it. ``const_mask[i]`` marks input i
    as a graph constant (needed for static operands under jit)."""
    g = Graph()
    in_ids = []
    const_mask = const_mask or [False] * len(inputs)
    for i, arr in enumerate(inputs):
        if arr is None:
            in_ids.append(None)
        elif const_mask[i]:
            in_ids.append(g.add_constant(f"c{i}", np.asarray(arr)))
        else:
            in_ids.append(g.add_value(f"x{i}"))
    out_ids = [g.add_value(f"out{i}") for i in range(n_outputs)]
    g.add_operator("op", op_type, in_ids, out_ids, attrs or {})
    g.inputs = [i for i, arr, c in zip(in_ids, inputs, const_mask)
                if arr is not None and not c]
    g.outputs = out_ids
    ex = GraphExecutor(g)
    feed = {i: np.asarray(arr) for i, arr, c in
            zip(in_ids, inputs, const_mask) if arr is not None and not c}
    results = {}
    if mode in ("both", "eager"):
        results["eager"] = [np.asarray(v) for v in
                            ex.run_eager(feed, options=RunOptions())]
    if mode in ("both", "jit"):
        results["jit"] = [np.asarray(v) for v in ex.run(feed)]
    if mode == "both":
        for a, b in zip(results["eager"], results["jit"]):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    return results.get("jit", results.get("eager"))


RNG = np.random.RandomState(42)


def randf(*shape):
    return RNG.randn(*shape).astype(np.float32)


# ---------------------------------------------------------------------------
# Elementwise
# ---------------------------------------------------------------------------

UNARY_CASES = [
    ("Abs", np.abs), ("Ceil", np.ceil), ("Cos", np.cos),
    ("Exp", np.exp), ("Floor", np.floor), ("Neg", np.negative),
    ("Round", np.round), ("Sign", np.sign), ("Sin", np.sin),
    ("Sqrt", lambda x: np.sqrt(np.abs(x))), ("Tan", np.tan),
    ("Tanh", np.tanh), ("Identity", lambda x: x),
]


@pytest.mark.parametrize("op,ref", UNARY_CASES, ids=[c[0] for c in UNARY_CASES])
def test_unary(op, ref):
    x = randf(3, 5)
    if op == "Sqrt":
        x = np.abs(x)
    out = run_op(op, [x])[0]
    np.testing.assert_allclose(out, ref(x), rtol=1e-5, atol=1e-6)


def test_unary_transcendental_vs_float64():
    # ULP-discipline check (reference rten-vecmath style): compare against
    # float64 references with tight tolerances.
    x = np.linspace(-10, 10, 1001).astype(np.float32)
    for op, ref in [("Exp", np.exp), ("Sigmoid", lambda v: 1 / (1 + np.exp(-v))),
                    ("Tanh", np.tanh)]:
        out = run_op(op, [x])[0]
        want = ref(x.astype(np.float64))
        np.testing.assert_allclose(out, want, rtol=2e-6, atol=1e-7)


def test_erf_gelu():
    import torch  # golden reference
    x = randf(4, 7)
    out = run_op("Erf", [x])[0]
    np.testing.assert_allclose(out, torch.erf(torch.tensor(x)).numpy(),
                               rtol=1e-5, atol=1e-6)
    out = run_op("Gelu", [x])[0]
    import torch.nn.functional as F
    np.testing.assert_allclose(out, F.gelu(torch.tensor(x)).numpy(),
                               rtol=1e-5, atol=1e-6)


def test_relu_leaky_elu_softplus():
    x = randf(3, 4)
    np.testing.assert_allclose(run_op("Relu", [x])[0], np.maximum(x, 0))
    np.testing.assert_allclose(run_op("LeakyRelu", [x], {"alpha": 0.1})[0],
                               np.where(x >= 0, x, 0.1 * x), rtol=1e-6)
    np.testing.assert_allclose(run_op("Elu", [x], {"alpha": 1.0})[0],
                               np.where(x > 0, x, np.expm1(x)), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(run_op("Softplus", [x])[0],
                               np.log1p(np.exp(x)), rtol=1e-5, atol=1e-6)


def test_hard_sigmoid_swish():
    x = randf(3, 4) * 4
    np.testing.assert_allclose(
        run_op("HardSigmoid", [x], {"alpha": 0.2, "beta": 0.5})[0],
        np.clip(0.2 * x + 0.5, 0, 1), rtol=1e-6)
    np.testing.assert_allclose(
        run_op("HardSwish", [x])[0],
        x * np.clip(x / 6 + 0.5, 0, 1), rtol=1e-5, atol=1e-6)


def test_clip():
    x = randf(3, 4)
    out = run_op("Clip", [x, np.float32(-0.5), np.float32(0.5)])[0]
    np.testing.assert_allclose(out, np.clip(x, -0.5, 0.5))
    out = run_op("Clip", [x, None, np.float32(0.5)])[0]
    np.testing.assert_allclose(out, np.minimum(x, 0.5))


def test_cast():
    x = randf(3, 4) * 10
    out = run_op("Cast", [x], {"to": 0})[0]  # → Int32
    assert out.dtype == np.int32
    np.testing.assert_array_equal(out, x.astype(np.int32))  # trunc toward 0
    xi = np.array([[1, -2, 3]], dtype=np.int32)
    out = run_op("Cast", [xi], {"to": 1})[0]
    assert out.dtype == np.float32


def test_binary_broadcast():
    a, b = randf(3, 1, 5), randf(4, 1)
    for op, ref in [("Add", np.add), ("Sub", np.subtract),
                    ("Mul", np.multiply)]:
        np.testing.assert_allclose(run_op(op, [a, b])[0], ref(a, b), rtol=1e-6)
    np.testing.assert_allclose(run_op("Div", [a, np.abs(b) + 1])[0],
                               a / (np.abs(b) + 1), rtol=1e-6)
    np.testing.assert_allclose(run_op("Pow", [np.abs(a), b])[0],
                               np.abs(a) ** b, rtol=1e-4, atol=1e-5)


def test_int_div_truncates():
    a = np.array([7, -7, 7, -7], dtype=np.int32)
    b = np.array([2, 2, -2, -2], dtype=np.int32)
    out = run_op("Div", [a, b])[0]
    np.testing.assert_array_equal(out, [3, -3, -3, 3])  # trunc, not floor


def test_mod():
    a = np.array([5, -5, 5, -5], dtype=np.int32)
    b = np.array([3, 3, -3, -3], dtype=np.int32)
    out = run_op("Mod", [a, b], {"fmod": False})[0]
    np.testing.assert_array_equal(out, [2, 1, -1, -2])  # sign of divisor
    out = run_op("Mod", [a, b], {"fmod": True})[0]
    np.testing.assert_array_equal(out, [2, -2, 2, -2])  # sign of dividend


def test_comparisons_produce_i32():
    a, b = randf(3, 4), randf(3, 4)
    out = run_op("Less", [a, b])[0]
    assert out.dtype == np.int32
    np.testing.assert_array_equal(out, (a < b).astype(np.int32))
    out = run_op("GreaterOrEqual", [a, b])[0]
    np.testing.assert_array_equal(out, (a >= b).astype(np.int32))


def test_logical():
    a = np.array([0, 1, 0, 1], dtype=np.int32)
    b = np.array([0, 0, 1, 1], dtype=np.int32)
    np.testing.assert_array_equal(run_op("And", [a, b])[0], [0, 0, 0, 1])
    np.testing.assert_array_equal(run_op("Or", [a, b])[0], [0, 1, 1, 1])
    np.testing.assert_array_equal(run_op("Xor", [a, b])[0], [0, 1, 1, 0])
    np.testing.assert_array_equal(run_op("Not", [a])[0], [1, 0, 1, 0])


def test_where():
    cond = np.array([[1, 0], [0, 1]], dtype=np.int32)
    x, y = randf(2, 2), randf(2, 2)
    np.testing.assert_allclose(run_op("Where", [cond, x, y])[0],
                               np.where(cond != 0, x, y))


def test_variadic():
    xs = [randf(2, 3) for _ in range(3)]
    np.testing.assert_allclose(run_op("Sum", xs)[0], sum(xs), rtol=1e-6)
    np.testing.assert_allclose(run_op("Mean", xs)[0], sum(xs) / 3, rtol=1e-6)
    np.testing.assert_allclose(run_op("Max", xs)[0],
                               np.maximum.reduce(xs), rtol=1e-6)
    np.testing.assert_allclose(run_op("Min", xs)[0],
                               np.minimum.reduce(xs), rtol=1e-6)


# ---------------------------------------------------------------------------
# MatMul / Gemm / Einsum
# ---------------------------------------------------------------------------

def test_matmul_batched_broadcast():
    a, b = randf(2, 3, 4, 5), randf(5, 6)
    np.testing.assert_allclose(run_op("MatMul", [a, b])[0], a @ b,
                               rtol=1e-5, atol=1e-5)
    a2, b2 = randf(4, 5), randf(3, 5, 6)
    np.testing.assert_allclose(run_op("MatMul", [a2, b2])[0], a2 @ b2,
                               rtol=1e-5, atol=1e-5)


def test_gemm_transpose_bias():
    a, b, c = randf(5, 3), randf(4, 5), randf(4)
    out = run_op("Gemm", [a, b, c],
                 {"alpha": 0.5, "beta": 2.0, "transpose_a": True,
                  "transpose_b": True})[0]
    want = 0.5 * (a.T @ b.T) + 2.0 * c
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


def test_einsum():
    a, b = randf(2, 3, 4), randf(2, 4, 5)
    out = run_op("Einsum", [a, b], {"equation": "bij,bjk->bik"})[0]
    np.testing.assert_allclose(out, np.einsum("bij,bjk->bik", a, b),
                               rtol=1e-5, atol=1e-5)
    out = run_op("Einsum", [a], {"equation": "bij->bji"})[0]
    np.testing.assert_allclose(out, a.transpose(0, 2, 1))


# ---------------------------------------------------------------------------
# Norm
# ---------------------------------------------------------------------------

def test_batch_norm_vs_torch():
    import torch
    x = randf(2, 3, 4, 4)
    scale, bias = randf(3), randf(3)
    mean, var = randf(3), np.abs(randf(3)) + 0.5
    out = run_op("BatchNormalization", [x, scale, bias, mean, var],
                 {"epsilon": 1e-5})[0]
    want = torch.nn.functional.batch_norm(
        torch.tensor(x), torch.tensor(mean), torch.tensor(var),
        torch.tensor(scale), torch.tensor(bias), eps=1e-5).numpy()
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_layer_norm_vs_torch():
    import torch
    x = randf(2, 5, 8)
    scale, bias = randf(8), randf(8)
    out = run_op("LayerNormalization", [x, scale, bias],
                 {"axis": -1, "epsilon": 1e-5})[0]
    want = torch.nn.functional.layer_norm(
        torch.tensor(x), (8,), torch.tensor(scale), torch.tensor(bias),
        1e-5).numpy()
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_instance_norm_vs_torch():
    import torch
    x = randf(2, 3, 4, 5)
    scale, bias = randf(3), randf(3)
    out = run_op("InstanceNormalization", [x, scale, bias],
                 {"epsilon": 1e-5})[0]
    want = torch.nn.functional.instance_norm(
        torch.tensor(x), weight=torch.tensor(scale),
        bias=torch.tensor(bias), eps=1e-5).numpy()
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_softmax_logsoftmax():
    x = randf(3, 5)
    out = run_op("Softmax", [x], {"axis": -1})[0]
    e = np.exp(x - x.max(-1, keepdims=True))
    np.testing.assert_allclose(out, e / e.sum(-1, keepdims=True), rtol=1e-5,
                               atol=1e-6)
    out = run_op("LogSoftmax", [x], {"axis": 1})[0]
    np.testing.assert_allclose(out, np.log(e / e.sum(-1, keepdims=True)),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Reduce
# ---------------------------------------------------------------------------

def test_reduces():
    x = randf(2, 3, 4)
    cases = [("ReduceSum", x.sum(1, keepdims=True)),
             ("ReduceMean", x.mean(1, keepdims=True)),
             ("ReduceMin", x.min(1, keepdims=True)),
             ("ReduceMax", x.max(1, keepdims=True)),
             ("ReduceProd", x.prod(1, keepdims=True)),
             ("ReduceL2", np.sqrt((x ** 2).sum(1, keepdims=True))),
             ("ReduceSumSquare", (x ** 2).sum(1, keepdims=True))]
    for op, want in cases:
        out = run_op(op, [x], {"axes": [1], "keep_dims": True})[0]
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)
    # axes as a (static) input; reduce-all with no axes
    out = run_op("ReduceSum", [x, np.array([0, 2])],
                 {"keep_dims": False}, const_mask=[False, True])[0]
    np.testing.assert_allclose(out, x.sum((0, 2)), rtol=1e-5, atol=1e-5)
    out = run_op("ReduceMean", [x], {"keep_dims": False})[0]
    np.testing.assert_allclose(out, x.mean(), rtol=1e-5)


def test_argmax_argmin():
    x = randf(3, 5)
    out = run_op("ArgMax", [x], {"axis": 1, "keep_dims": False})[0]
    np.testing.assert_array_equal(out, x.argmax(1))
    assert out.dtype == np.int32
    out = run_op("ArgMin", [x], {"axis": 0, "keep_dims": True})[0]
    np.testing.assert_array_equal(out, x.argmin(0, keepdims=True))


def test_cumsum():
    x = randf(3, 4)
    out = run_op("CumSum", [x, np.array(1)], const_mask=[False, True])[0]
    np.testing.assert_allclose(out, np.cumsum(x, 1), rtol=1e-5)


def test_topk():
    x = randf(3, 8)
    vals, idx = run_op("TopK", [x, np.array([3])],
                       {"axis": -1, "largest": True, "sorted": True},
                       n_outputs=2, const_mask=[False, True])
    want = np.sort(x, -1)[:, ::-1][:, :3]
    np.testing.assert_allclose(vals, want, rtol=1e-6)
    assert idx.dtype == np.int32
    vals, _ = run_op("TopK", [x, np.array([2])],
                     {"axis": -1, "largest": False, "sorted": True},
                     n_outputs=2, const_mask=[False, True])
    np.testing.assert_allclose(vals, np.sort(x, -1)[:, :2], rtol=1e-6)


def test_nonzero_eager():
    x = np.array([[1, 0], [0, 3]], dtype=np.int32)
    out = run_op("NonZero", [x], mode="eager")[0]
    np.testing.assert_array_equal(out, np.stack(np.nonzero(x)))


# ---------------------------------------------------------------------------
# Layout
# ---------------------------------------------------------------------------

def test_reshape_zero_and_minus_one():
    x = randf(2, 3, 4)
    out = run_op("Reshape", [x, np.array([0, -1])], {"allow_zero": False},
                 const_mask=[False, True])[0]
    assert out.shape == (2, 12)
    out = run_op("Reshape", [x, np.array([4, 6])], const_mask=[False, True])[0]
    assert out.shape == (4, 6)


def test_flatten():
    x = randf(2, 3, 4, 5)
    assert run_op("Flatten", [x], {"axis": 2})[0].shape == (6, 20)
    assert run_op("Flatten", [x], {"axis": 0})[0].shape == (1, 120)


def test_squeeze_unsqueeze_transpose():
    x = randf(1, 3, 1, 4)
    out = run_op("Squeeze", [x, np.array([0, 2])], const_mask=[False, True])[0]
    assert out.shape == (3, 4)
    out = run_op("Unsqueeze", [out, np.array([0, -1])],
                 const_mask=[False, True])[0]
    assert out.shape == (1, 3, 4, 1)
    x2 = randf(2, 3, 4)
    out = run_op("Transpose", [x2], {"perm": [2, 0, 1]})[0]
    np.testing.assert_allclose(out, x2.transpose(2, 0, 1))
    out = run_op("Transpose", [x2])[0]
    np.testing.assert_allclose(out, x2.T)


def test_expand_shape_size():
    x = randf(3, 1)
    out = run_op("Expand", [x, np.array([2, 3, 4])],
                 const_mask=[False, True])[0]
    assert out.shape == (2, 3, 4)
    out = run_op("Shape", [x])[0]
    np.testing.assert_array_equal(out, [3, 1])
    assert out.dtype == np.int32
    out = run_op("Size", [x])[0]
    assert int(out) == 3


def test_concat_split():
    a, b = randf(2, 3), randf(2, 2)
    out = run_op("Concat", [a, b], {"axis": 1})[0]
    np.testing.assert_allclose(out, np.concatenate([a, b], 1))
    parts = run_op("Split", [out, np.array([3, 2])], {"axis": 1},
                   n_outputs=2, const_mask=[False, True])
    np.testing.assert_allclose(parts[0], a)
    np.testing.assert_allclose(parts[1], b)
    # even split without explicit sizes
    parts = run_op("Split", [randf(2, 6)], {"axis": 1}, n_outputs=3)
    assert all(p.shape == (2, 2) for p in parts)


def test_slice():
    x = randf(4, 6)
    out = run_op("Slice",
                 [x, np.array([1]), np.array([5]), np.array([1]),
                  np.array([2])],
                 const_mask=[False, True, True, True, True])[0]
    np.testing.assert_allclose(out, x[:, 1:5:2])
    out = run_op("Slice",
                 [x, np.array([-2]), np.array([2 ** 31 - 1]), np.array([0])],
                 const_mask=[False, True, True, True])[0]
    np.testing.assert_allclose(out, x[-2:])
    # negative step
    out = run_op("Slice",
                 [x, np.array([3]), np.array([0]), np.array([0]),
                  np.array([-1])],
                 const_mask=[False, True, True, True, True])[0]
    np.testing.assert_allclose(out, x[3:0:-1])


def test_pad():
    x = randf(2, 3)
    out = run_op("Pad", [x, np.array([0, 1, 0, 2])],
                 const_mask=[False, True])[0]
    np.testing.assert_allclose(out, np.pad(x, [(0, 0), (1, 2)]))
    out = run_op("Pad", [x, np.array([1, 0, 1, 0]), np.float32(9.0)],
                 const_mask=[False, True, True])[0]
    np.testing.assert_allclose(
        out, np.pad(x, [(1, 1), (0, 0)], constant_values=9.0))


def test_tile_trilu():
    x = randf(2, 3)
    out = run_op("Tile", [x, np.array([2, 1])], const_mask=[False, True])[0]
    np.testing.assert_allclose(out, np.tile(x, (2, 1)))
    x2 = randf(4, 4)
    out = run_op("Trilu", [x2, np.array(1)], {"upper": True},
                 const_mask=[False, True])[0]
    np.testing.assert_allclose(out, np.triu(x2, 1))
    out = run_op("Trilu", [x2], {"upper": False})[0]
    np.testing.assert_allclose(out, np.tril(x2))


# ---------------------------------------------------------------------------
# Gather / scatter
# ---------------------------------------------------------------------------

def test_gather():
    x = randf(4, 5)
    idx = np.array([[0, -1], [2, 1]], dtype=np.int32)
    out = run_op("Gather", [x, idx], {"axis": 0})[0]
    np.testing.assert_allclose(out, x[idx])
    out = run_op("Gather", [x, np.array(2, dtype=np.int32)], {"axis": 1})[0]
    np.testing.assert_allclose(out, x[:, 2])


def test_gather_elements():
    x = randf(3, 4)
    idx = np.array([[0, 1], [2, 0], [1, 3]], dtype=np.int32)
    out = run_op("GatherElements", [x, idx], {"axis": 1})[0]
    np.testing.assert_allclose(out, np.take_along_axis(x, idx, 1))


def test_gather_nd():
    x = randf(2, 3, 4)
    idx = np.array([[0, 1], [1, 2]], dtype=np.int32)
    out = run_op("GatherND", [x, idx], {"batch_dims": 0})[0]
    np.testing.assert_allclose(out, x[[0, 1], [1, 2]])
    # batch_dims=1
    idx2 = np.array([[[1]], [[2]]], dtype=np.int32)
    out = run_op("GatherND", [x, idx2], {"batch_dims": 1})[0]
    want = np.stack([x[0, [1]], x[1, [2]]])
    np.testing.assert_allclose(out, want)


def test_scatter_elements():
    x = np.zeros((3, 4), np.float32)
    idx = np.array([[1, 2]], dtype=np.int32)
    upd = np.array([[5.0, 6.0]], dtype=np.float32)
    out = run_op("ScatterElements", [x, idx, upd], {"axis": 1})[0]
    want = x.copy()
    want[0, 1], want[0, 2] = 5.0, 6.0
    np.testing.assert_allclose(out, want)
    # reduction=Add (enum index 1)
    x2 = np.ones((3, 4), np.float32)
    out = run_op("ScatterElements", [x2, idx, upd],
                 {"axis": 1, "reduction": 1})[0]
    want = x2.copy()
    want[0, 1] += 5.0
    want[0, 2] += 6.0
    np.testing.assert_allclose(out, want)


def test_scatter_nd():
    x = np.zeros((4, 4), np.float32)
    idx = np.array([[0], [2]], dtype=np.int32)
    upd = randf(2, 4)
    out = run_op("ScatterND", [x, idx, upd])[0]
    want = x.copy()
    want[0], want[2] = upd[0], upd[1]
    np.testing.assert_allclose(out, want)


def test_one_hot():
    idx = np.array([0, 2, -1], dtype=np.int32)
    values = np.array([0.0, 1.0], dtype=np.float32)
    out = run_op("OneHot", [idx, np.array(3), values], {"axis": -1},
                 const_mask=[False, True, True])[0]
    want = np.eye(3, dtype=np.float32)[[0, 2, 2]]
    np.testing.assert_allclose(out, want)


# ---------------------------------------------------------------------------
# Generate
# ---------------------------------------------------------------------------

def test_constant_of_shape():
    out = run_op("ConstantOfShape", [np.array([2, 3])],
                 {"value": ("IntScalar", {"value": 7})},
                 const_mask=[True])[0]
    np.testing.assert_array_equal(out, np.full((2, 3), 7, np.int32))
    out = run_op("ConstantOfShape", [np.array([2])], const_mask=[True])[0]
    assert out.dtype == np.float32


def test_range():
    out = run_op("Range",
                 [np.array(1), np.array(9), np.array(2)],
                 const_mask=[True, True, True])[0]
    np.testing.assert_array_equal(out, [1, 3, 5, 7])
    assert out.dtype == np.int32


def test_random_shapes():
    out = run_op("RandomUniform", [],
                 {"shape": [3, 4], "low": -1.0, "high": 1.0})[0]
    assert out.shape == (3, 4) and out.dtype == np.float32
    assert (out >= -1).all() and (out < 1).all()
    x = randf(2, 5)
    out = run_op("RandomNormalLike", [x], {"mean": 0.0, "scale": 1.0})[0]
    assert out.shape == x.shape


def test_einsum_three_operands():
    a, b, c = randf(2, 3), randf(3, 4), randf(4, 2)
    out = run_op("Einsum", [a, b, c], {"equation": "ij,jk,kl->il"})[0]
    np.testing.assert_allclose(out, np.einsum("ij,jk,kl->il", a, b, c),
                               rtol=1e-4, atol=1e-5)


def test_gather_nd_batch2():
    x = randf(2, 3, 4, 5)
    idx = RNG.randint(0, 4, (2, 3, 1)).astype(np.int32)
    out = run_op("GatherND", [x, idx], {"batch_dims": 2})[0]
    want = np.stack([
        np.stack([x[i, j, idx[i, j, 0]] for j in range(3)])
        for i in range(2)])
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_slice_multi_axis_negative_step():
    x = randf(4, 6, 8)
    out = run_op("Slice",
                 [x, np.array([3, 1]), np.array([0, 7]),
                  np.array([0, 2]), np.array([-1, 2])],
                 const_mask=[False, True, True, True, True])[0]
    np.testing.assert_allclose(out, x[3:0:-1, :, 1:7:2])


def test_pad_all_dims_with_value():
    x = randf(2, 3)
    out = run_op("Pad", [x, np.array([1, 2, 3, 4]), np.float32(-5)],
                 const_mask=[False, True, True])[0]
    want = np.pad(x, [(1, 3), (2, 4)], constant_values=-5)
    np.testing.assert_allclose(out, want)


def test_expand_scalar_broadcast():
    x = np.float32(7).reshape(1, 1)
    out = run_op("Expand", [x, np.array([3, 4])], const_mask=[False, True])[0]
    np.testing.assert_array_equal(out, np.full((3, 4), 7, np.float32))


def test_split_uneven_default():
    x = randf(2, 7)
    parts = run_op("Split", [x], {"axis": 1}, n_outputs=3)
    assert [p.shape[1] for p in parts] == [3, 3, 1]
    np.testing.assert_allclose(np.concatenate(parts, 1), x)
