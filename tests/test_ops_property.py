"""Property-style operator tests: randomized shape/dtype sweeps asserting
algebraic invariants, instead of hand-written goldens (round-2 quality
item; hypothesis-style without the dependency — seeds are fixed so runs
are reproducible).

Invariants covered:
  * broadcasting: op(a, b) == op(a, broadcast_to(b)) for every rank/1-dim
    combination;
  * layout round-trips: Transpose∘Transpose⁻¹, Reshape there-and-back,
    Split+Concat, Pad+Slice, Expand==broadcast_to;
  * reductions match numpy over random axes/keepdims;
  * commutativity / associativity where ONNX mandates it;
  * dtype discipline: comparison/logical ops return the i32 convention.
"""

import numpy as np
import pytest

from tests.test_ops import run_op

N_SWEEPS = 8


def shapes(rng, max_rank=4, max_dim=6):
    rank = rng.randint(1, max_rank + 1)
    return tuple(int(d) for d in rng.randint(1, max_dim + 1, rank))


@pytest.mark.parametrize("seed", range(N_SWEEPS))
@pytest.mark.parametrize("op,nfn", [
    ("Add", np.add), ("Mul", np.multiply), ("Sub", np.subtract),
    ("Max", np.maximum), ("Min", np.minimum),
])
def test_binary_broadcast_sweep(seed, op, nfn):
    rng = np.random.RandomState(seed)
    a_shape = shapes(rng)
    # b: same shape with random dims collapsed to 1 and leading dims
    # randomly dropped — every NumPy broadcast case.
    b_shape = tuple(1 if rng.rand() < 0.5 else d for d in a_shape)
    b_shape = b_shape[rng.randint(0, len(b_shape)):] or (1,)
    a = rng.randn(*a_shape).astype(np.float32)
    b = rng.randn(*b_shape).astype(np.float32)
    got = run_op(op, [a, b])[0]
    np.testing.assert_allclose(got, nfn(a, b), rtol=1e-6, atol=1e-6)
    if op in ("Add", "Mul", "Max", "Min"):   # ONNX-commutative
        np.testing.assert_allclose(run_op(op, [b, a])[0], nfn(b, a),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("seed", range(N_SWEEPS))
def test_transpose_roundtrip(seed):
    rng = np.random.RandomState(100 + seed)
    x = rng.randn(*shapes(rng, max_rank=5)).astype(np.float32)
    perm = list(rng.permutation(x.ndim))
    inv = list(np.argsort(perm))
    once = run_op("Transpose", [x], {"perm": perm})[0]
    np.testing.assert_array_equal(once, np.transpose(x, perm))
    back = run_op("Transpose", [once], {"perm": inv})[0]
    np.testing.assert_array_equal(back, x)


@pytest.mark.parametrize("seed", range(N_SWEEPS))
def test_reshape_roundtrip(seed):
    rng = np.random.RandomState(200 + seed)
    x = rng.randn(*shapes(rng)).astype(np.float32)
    flat = run_op("Reshape", [x, np.asarray([-1], np.int64)],
                  const_mask=[False, True])[0]
    assert flat.shape == (x.size,)
    back = run_op("Reshape", [flat, np.asarray(x.shape, np.int64)],
                  const_mask=[False, True])[0]
    np.testing.assert_array_equal(back, x)


@pytest.mark.parametrize("seed", range(N_SWEEPS))
def test_split_concat_roundtrip(seed):
    rng = np.random.RandomState(300 + seed)
    x = rng.randn(*shapes(rng, max_rank=3, max_dim=8)).astype(np.float32)
    axis = int(rng.randint(0, x.ndim))
    n = x.shape[axis]
    cuts = sorted(rng.choice(np.arange(1, n + 1), size=min(3, n),
                             replace=False))
    sizes = np.diff([0] + list(cuts)).astype(np.int64)
    if sizes.sum() < n:
        sizes = np.append(sizes, n - sizes.sum())
    parts = run_op("Split", [x, sizes], {"axis": axis},
                   n_outputs=len(sizes), const_mask=[False, True])
    back = run_op("Concat", list(parts), {"axis": axis})[0]
    np.testing.assert_array_equal(back, x)


@pytest.mark.parametrize("seed", range(N_SWEEPS))
def test_pad_slice_roundtrip(seed):
    rng = np.random.RandomState(400 + seed)
    x = rng.randn(*shapes(rng, max_rank=3)).astype(np.float32)
    before = rng.randint(0, 3, x.ndim)
    after = rng.randint(0, 3, x.ndim)
    pads = np.concatenate([before, after]).astype(np.int64)
    padded = run_op("Pad", [x, pads], const_mask=[False, True])[0]
    assert padded.shape == tuple(np.asarray(x.shape) + before + after)
    starts = before.astype(np.int64)
    ends = (before + np.asarray(x.shape)).astype(np.int64)
    axes = np.arange(x.ndim, dtype=np.int64)
    back = run_op("Slice", [padded, starts, ends, axes],
                  const_mask=[False, True, True, True])[0]
    np.testing.assert_array_equal(back, x)


@pytest.mark.parametrize("seed", range(N_SWEEPS))
@pytest.mark.parametrize("op,nfn", [
    ("ReduceSum", np.sum), ("ReduceMax", np.max), ("ReduceMin", np.min),
    ("ReduceMean", np.mean), ("ReduceProd", np.prod),
])
def test_reduce_sweep(seed, op, nfn):
    rng = np.random.RandomState(500 + seed)
    x = (rng.randn(*shapes(rng, max_rank=4, max_dim=5)) / 2).astype(
        np.float32)
    n_axes = rng.randint(1, x.ndim + 1)
    axes = np.asarray(sorted(rng.choice(x.ndim, n_axes, replace=False)),
                      np.int64)
    keep = bool(rng.randint(0, 2))
    # NB the schema attr is ``keep_dims`` (converter.py maps ONNX's
    # ``keepdims`` to it); unknown attrs are ignored by lowerings.
    got = run_op(op, [x, axes], {"keep_dims": keep},
                 const_mask=[False, True])[0]
    want = nfn(x, axis=tuple(int(a) for a in axes), keepdims=keep)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("seed", range(N_SWEEPS))
def test_expand_matches_broadcast(seed):
    rng = np.random.RandomState(600 + seed)
    base = shapes(rng, max_rank=3)
    x_shape = tuple(1 if rng.rand() < 0.5 else d for d in base)
    x = rng.randn(*x_shape).astype(np.float32)
    got = run_op("Expand", [x, np.asarray(base, np.int64)],
                 const_mask=[False, True])[0]
    np.testing.assert_array_equal(got, np.broadcast_to(x, base))


@pytest.mark.parametrize("seed", range(N_SWEEPS))
def test_comparison_i32_convention(seed):
    """The converter coerces bool→i32 (converter.py:434-495); comparison
    lowerings must emit i32 0/1, and logical ops must consume it."""
    rng = np.random.RandomState(700 + seed)
    shape = shapes(rng)
    a = rng.randint(-3, 4, shape).astype(np.int32)
    b = rng.randint(-3, 4, shape).astype(np.int32)
    for op, nfn in [("Less", np.less), ("Greater", np.greater),
                    ("Equal", np.equal)]:
        got = run_op(op, [a, b])[0]
        assert got.dtype == np.int32
        np.testing.assert_array_equal(got, nfn(a, b).astype(np.int32))
    lt = np.less(a, b).astype(np.int32)
    gt = np.greater(a, b).astype(np.int32)
    both = run_op("Or", [lt, gt])[0]
    assert both.dtype == np.int32
    np.testing.assert_array_equal(both, (lt | gt))
    neither = run_op("Not", [both])[0]
    np.testing.assert_array_equal(neither, 1 - both)


@pytest.mark.parametrize("seed", range(N_SWEEPS))
def test_gather_scatter_roundtrip(seed):
    """ScatterElements(Gather(x)) at the same indices restores x rows."""
    rng = np.random.RandomState(800 + seed)
    n, m = rng.randint(2, 8), rng.randint(1, 6)
    x = rng.randn(n, m).astype(np.float32)
    idx = rng.permutation(n).astype(np.int64)
    rows = run_op("Gather", [x, idx], {"axis": 0},
                  const_mask=[False, True])[0]
    np.testing.assert_array_equal(rows, x[idx])
    scattered = run_op(
        "ScatterElements",
        [np.zeros_like(x), np.broadcast_to(idx[:, None], (n, m)).copy(),
         rows], {"axis": 0}, const_mask=[False, True, False])[0]
    np.testing.assert_array_equal(scattered, x)
