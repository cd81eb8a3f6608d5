"""Hypothesis-driven operator tests: generated shape/attr sweeps with
shrinking, complementing tests/test_ops_property.py's fixed-seed sweeps
(this file's generators found the negative-step Slice conformance bug
the fixed sweeps missed). Each case still runs through ``run_op``,
which executes BOTH eager and jit modes and asserts they agree — so
every generated example is also an eager/jit consistency check.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from tests.test_ops import run_op

# The 2-vCPU host compiles one XLA program per generated shape; keep the
# example counts modest and the deadline off.
SETTINGS = dict(max_examples=15, deadline=None, derandomize=True)

dims = st.integers(min_value=1, max_value=5)
shapes = st.lists(dims, min_size=1, max_size=4)


def arr(shape, seed, ints=False):
    rng = np.random.RandomState(seed % (2 ** 31))
    if ints:
        return rng.randint(-4, 5, size=shape).astype(np.int32)
    return rng.randn(*shape).astype(np.float32)


@st.composite
def broadcast_pair(draw):
    """Two numpy-broadcastable shapes (dims equal or 1, plus rank cut)."""
    out = draw(shapes)
    def variant():
        cut = draw(st.integers(0, len(out)))
        return tuple(d if draw(st.booleans()) else 1 for d in out[cut:])
    return tuple(out), variant(), variant()


@settings(**SETTINGS)
@given(broadcast_pair(), st.sampled_from(["Add", "Sub", "Mul", "Max",
                                          "Min", "Greater", "Less"]),
       st.integers())
def test_binary_broadcast(shapes3, op, seed):
    _, sa, sb = shapes3
    a, b = arr(sa or (1,), seed), arr(sb or (1,), seed + 1)
    (got,) = run_op(op, [a, b])
    ref = {"Add": np.add, "Sub": np.subtract, "Mul": np.multiply,
           "Max": np.maximum, "Min": np.minimum,
           "Greater": np.greater, "Less": np.less}[op](a, b)
    if ref.dtype == bool:
        ref = ref.astype(np.int32)   # i32 bool convention
    np.testing.assert_allclose(got, ref, rtol=1e-6)


@settings(**SETTINGS)
@given(shapes, st.integers(), st.integers())
def test_transpose_perm(shape, permseed, seed):
    perm = list(np.random.RandomState(permseed % 2**31)
                .permutation(len(shape)))
    x = arr(shape, seed)
    (got,) = run_op("Transpose", [x], {"perm": perm})
    np.testing.assert_array_equal(got, np.transpose(x, perm))


@settings(**SETTINGS)
@given(shapes, st.integers())
def test_reshape_flatten_roundtrip(shape, seed):
    x = arr(shape, seed)
    (flat,) = run_op("Reshape", [x, np.asarray([-1], np.int32)],
                     const_mask=[False, True])
    (back,) = run_op("Reshape", [flat, np.asarray(shape, np.int32)],
                     const_mask=[False, True])
    np.testing.assert_array_equal(back, x)


@st.composite
def slice_case(draw):
    shape = draw(shapes)
    axis = draw(st.integers(0, len(shape) - 1))
    n = shape[axis]
    start = draw(st.integers(-n - 1, n + 1))
    end = draw(st.integers(-n - 1, n + 1))
    step = draw(st.sampled_from([-2, -1, 1, 2, 3]))
    return shape, axis, start, end, step


@settings(**SETTINGS)
@given(slice_case(), st.integers())
def test_slice_matches_numpy(case, seed):
    shape, axis, start, end, step = case
    x = arr(shape, seed)
    sl = [slice(None)] * len(shape)
    sl[axis] = slice(start, end, step)
    ref = x[tuple(sl)]
    got = run_op("Slice", [x, np.asarray([start], np.int32),
                           np.asarray([end], np.int32),
                           np.asarray([axis], np.int32),
                           np.asarray([step], np.int32)],
                 const_mask=[False, True, True, True, True])[0]
    if ref.size == 0:
        assert got.size == 0 and got.shape == ref.shape
    else:
        np.testing.assert_array_equal(got, ref)


@settings(**SETTINGS)
@given(shapes, st.integers(), st.integers())
def test_pad_constant_matches_numpy(shape, padseed, seed):
    rng = np.random.RandomState(padseed % 2**31)
    pads = rng.randint(0, 3, size=2 * len(shape))
    x = arr(shape, seed)
    got = run_op("Pad", [x, pads.astype(np.int32),
                         np.float32(1.5)],
                 const_mask=[False, True, True])[0]
    width = list(zip(pads[:len(shape)], pads[len(shape):]))
    np.testing.assert_array_equal(
        got, np.pad(x, width, constant_values=1.5))


@settings(**SETTINGS)
@given(shapes, st.integers(), st.integers())
def test_split_concat_roundtrip(shape, axisseed, seed):
    axis = axisseed % len(shape)
    n = shape[axis]
    rng = np.random.RandomState(seed % 2**31)
    k = rng.randint(1, n + 1)
    sizes = np.diff(np.concatenate([[0], np.sort(
        rng.choice(np.arange(1, n), size=k - 1, replace=False)
        if k > 1 else np.empty(0, np.int64)), [n]])).astype(np.int32)
    x = arr(shape, seed)
    parts = run_op("Split", [x, sizes], {"axis": axis},
                   n_outputs=len(sizes), const_mask=[False, True])
    (back,) = run_op("Concat", list(parts), {"axis": axis})
    np.testing.assert_array_equal(back, x)


@settings(**SETTINGS)
@given(shapes, st.integers(), st.integers())
def test_gather_matches_take(shape, axisseed, seed):
    axis = axisseed % len(shape)
    rng = np.random.RandomState(seed % 2**31)
    idx = rng.randint(0, shape[axis], size=(3,)).astype(np.int32)
    x = arr(shape, seed)
    (got,) = run_op("Gather", [x, idx], {"axis": axis})
    np.testing.assert_array_equal(got, np.take(x, idx, axis=axis))


@settings(**SETTINGS)
@given(shapes, st.integers(), st.booleans(), st.integers(),
       st.sampled_from(["ReduceSum", "ReduceMax", "ReduceMean",
                        "ReduceMin"]))
def test_reduce_axes(shape, axisseed, keepdims, seed, op):
    rng = np.random.RandomState(axisseed % 2**31)
    n_ax = rng.randint(1, len(shape) + 1)
    axes = np.sort(rng.choice(len(shape), size=n_ax,
                              replace=False)).astype(np.int32)
    x = arr(shape, seed)
    (got,) = run_op(op, [x, axes], {"keep_dims": int(keepdims)},
                    const_mask=[False, True])
    fn = {"ReduceSum": np.sum, "ReduceMax": np.max,
          "ReduceMean": np.mean, "ReduceMin": np.min}[op]
    ref = fn(x, axis=tuple(int(a) for a in axes), keepdims=keepdims)
    np.testing.assert_allclose(got, np.asarray(ref, np.float32),
                               rtol=1e-5, atol=1e-6)


@st.composite
def matmul_shapes(draw):
    m, k, n = draw(dims), draw(dims), draw(dims)
    batch = draw(st.lists(st.integers(1, 3), min_size=0, max_size=2))
    # Either side may drop or broadcast the batch dims.
    ba = batch if draw(st.booleans()) else []
    bb = batch if draw(st.booleans()) else []
    return tuple(ba) + (m, k), tuple(bb) + (k, n)


@settings(**SETTINGS)
@given(matmul_shapes(), st.integers())
def test_matmul_batch_broadcast(shapes2, seed):
    sa, sb = shapes2
    a, b = arr(sa, seed), arr(sb, seed + 1)
    (got,) = run_op("MatMul", [a, b])
    np.testing.assert_allclose(got, np.matmul(a, b), rtol=1e-4, atol=1e-5)


@settings(**SETTINGS)
@given(shapes, st.integers())
def test_softmax_properties(shape, seed):
    x = arr(shape, seed)
    (got,) = run_op("Softmax", [x], {"axis": -1})
    np.testing.assert_allclose(got.sum(-1), 1.0, rtol=1e-5)
    # Shift invariance.
    (shifted,) = run_op("Softmax", [x + 10.0], {"axis": -1})
    np.testing.assert_allclose(got, shifted, rtol=1e-4, atol=1e-6)


@settings(**SETTINGS)
@given(st.integers(2, 64), st.integers(), st.integers(1, 8))
def test_topk_matches_sort(n, seed, k):
    k = min(k, n)
    x = arr((n,), seed)
    vals, idx = run_op("TopK", [x, np.asarray([k], np.int32)],
                       {"largest": 1, "sorted": 1}, n_outputs=2,
                       const_mask=[False, True])
    np.testing.assert_allclose(vals, np.sort(x)[::-1][:k], rtol=1e-6)
    np.testing.assert_allclose(x[idx], vals, rtol=1e-6)
