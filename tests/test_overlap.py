"""Collective/matmul overlap primitives (VERDICT r2 item 3; SURVEY
§2.3 "all-gather/reduce-scatter overlapped with matmul").

Parity: each ring primitive must match the GSPMD collective+dot pair on
the 8-device CPU mesh (bit-exact for all-gather-matmul, summation-order
tolerance for the reduce-scatter). Structure: the compiled manual path
must contain ONLY collective-permutes (the ring), never an all-gather /
all-reduce / reduce-scatter — that is what makes the overlap possible.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from rten_tpu.parallel import make_mesh
from rten_tpu.parallel.overlap import (ring_all_gather_matmul,
                                       ring_matmul_reduce_scatter)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(data=1, model=8)


def _collective_ops(lowered_compiled_text):
    return re.findall(r"\b(all-reduce|all-gather|reduce-scatter|"
                      r"all-to-all|collective-permute)\b",
                      lowered_compiled_text)


@pytest.mark.parametrize("bidir", [False, True])
def test_all_gather_matmul_parity(mesh, bidir):
    rng = np.random.RandomState(0)
    m_local, k, n = 4, 32, 48
    p = mesh.shape["model"]
    x = jnp.asarray(rng.randn(m_local * p, k).astype(np.float32))
    w = jnp.asarray(rng.randn(k, n).astype(np.float32))

    fn = shard_map(
        lambda xs, ws: ring_all_gather_matmul(xs, ws, "model",
                                              bidirectional=bidir),
        mesh=mesh, in_specs=(P("model", None), P(None, None)),
        out_specs=P(None, None), check_vma=False)
    got = jax.jit(fn)(x, w)
    want = x @ w        # gather of row shards is just the full x
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("bidir", [False, True])
def test_matmul_reduce_scatter_parity(mesh, bidir):
    rng = np.random.RandomState(1)
    m, k, n = 16, 64, 32          # m divides the 8-way axis
    p = mesh.shape["model"]
    x = jnp.asarray(rng.randn(m, k).astype(np.float32))
    w = jnp.asarray(rng.randn(k, n).astype(np.float32))

    fn = shard_map(
        lambda xs, ws: ring_matmul_reduce_scatter(xs, ws, "model",
                                                  bidirectional=bidir),
        mesh=mesh, in_specs=(P(None, "model"), P("model", None)),
        out_specs=P("model", None), check_vma=False)
    got = jax.jit(fn)(x, w)
    want = x @ w
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_matmul_reduce_scatter_matches_psum_scatter(mesh):
    """Shard-level contract: identical placement to lax.psum_scatter
    (device i ends with row-chunk i)."""
    rng = np.random.RandomState(2)
    m, k, n = 16, 64, 32
    x = jnp.asarray(rng.randn(m, k).astype(np.float32))
    w = jnp.asarray(rng.randn(k, n).astype(np.float32))

    def manual(xs, ws):
        return ring_matmul_reduce_scatter(xs, ws, "model")

    def gspmd(xs, ws):
        return jax.lax.psum_scatter(xs @ ws, "model",
                                    scatter_dimension=0, tiled=True)

    specs = dict(mesh=mesh, in_specs=(P(None, "model"), P("model", None)),
                 out_specs=P("model", None), check_vma=False)
    a = jax.jit(shard_map(manual, **specs))(x, w)
    b = jax.jit(shard_map(gspmd, **specs))(x, w)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)


def test_ring_hlo_has_only_permutes(mesh):
    """The compiled ring paths must communicate exclusively by
    collective-permute — an all-gather/all-reduce in the HLO would mean
    GSPMD re-synthesized the blocking collective and nothing overlaps."""
    x = jnp.ones((16, 64), jnp.float32)
    w = jnp.ones((64, 32), jnp.float32)

    ag = jax.jit(shard_map(
        lambda xs, ws: ring_all_gather_matmul(xs, ws, "model"),
        mesh=mesh, in_specs=(P("model", None), P(None, None)),
        out_specs=P(None, None), check_vma=False))
    rs = jax.jit(shard_map(
        lambda xs, ws: ring_matmul_reduce_scatter(xs, ws, "model"),
        mesh=mesh, in_specs=(P(None, "model"), P("model", None)),
        out_specs=P("model", None), check_vma=False))
    for jitted, n_steps in ((ag, 7 * 2), (rs, 7 * 2)):
        txt = jitted.lower(x, w).compile().as_text()
        ops = _collective_ops(txt)
        assert "collective-permute" in ops
        bad = [o for o in ops if o != "collective-permute"]
        assert not bad, f"blocking collectives leaked into the ring: {bad}"


def test_ring_int8_operands(mesh):
    """int8 weights ride the ring unmodified (serving uses int8
    row-parallel projections); accumulate in f32."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(16, 64).astype(np.float32))
    w8 = jnp.asarray(rng.randint(-127, 128, (64, 32)).astype(np.int8))

    fn = shard_map(
        lambda xs, ws: ring_matmul_reduce_scatter(
            xs, ws.astype(jnp.float32), "model"),
        mesh=mesh, in_specs=(P(None, "model"), P("model", None)),
        out_specs=P("model", None), check_vma=False)
    got = jax.jit(fn)(x, w8)
    want = x @ w8.astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
