"""Sequence/context parallelism: prefill hidden states shard the
sequence dim over a `seq` mesh axis (GSPMD inserts attention K/V
all-gathers); results match the unsharded model and decode still works."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rten_tpu.models.transformer import TransformerConfig, TransformerLM
from rten_tpu.parallel import (make_mesh, sequence_parallel, shard_cache,
                               shard_params)

rng = np.random.RandomState(5)


def test_sp_prefill_matches_base():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = TransformerConfig.tiny_test(use_pallas=False)
    base = TransformerLM(cfg)
    params = base.init_params(jax.random.PRNGKey(0))
    ids = jnp.asarray(rng.randint(0, 128, (2, 16)), jnp.int32)
    want, _ = base.forward(params, ids)

    mesh = make_mesh(data=2, seq=2, model=2)
    sp = sequence_parallel(TransformerLM(cfg), mesh)
    sharded = shard_params(params, mesh)

    @jax.jit
    def fwd(p, t):
        return sp.forward(p, t)[0]

    with mesh:
        got = fwd(sharded, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_sp_prefill_then_decode():
    """SP prefill writes the cache correctly; subsequent (unsharded-seq)
    decode steps match the base model."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = TransformerConfig.tiny_test(use_pallas=False)
    base = TransformerLM(cfg)
    params = base.init_params(jax.random.PRNGKey(1))
    ids = np.asarray(rng.randint(0, 128, (2, 12)), np.int32)

    ref_cache = base.new_cache(2, capacity=32)
    ref_logits, ref_cache = base.prefill(params, jnp.asarray(ids[:, :8]),
                                         ref_cache)

    mesh = make_mesh(data=1, seq=4, model=2)
    sp = sequence_parallel(TransformerLM(cfg), mesh)
    sharded = shard_params(params, mesh)
    cache = shard_cache(sp.new_cache(2, capacity=32), mesh)

    with mesh:
        logits, cache = jax.jit(sp.prefill)(sharded,
                                            jnp.asarray(ids[:, :8]), cache)
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(ref_logits), rtol=2e-3,
                                   atol=2e-3)
        step = jax.jit(sp.decode_step)
        for s in range(8, 12):
            tok = jnp.asarray(ids[:, s])
            ref_step, ref_cache = base.decode_step(params, tok, ref_cache)
            got_step, cache = step(sharded, tok, cache)
            np.testing.assert_allclose(np.asarray(got_step),
                                       np.asarray(ref_step), rtol=2e-3,
                                       atol=2e-3)


def test_sp_requires_seq_axis():
    mesh = make_mesh(data=2, model=4)
    with pytest.raises(ValueError):
        sequence_parallel(TransformerLM(TransformerConfig.tiny_test()),
                          mesh)


def test_kv_sharded_long_context_decode():
    """`seq` axis shards the cache capacity dim: decode attention
    contracts over a distributed KV cache (long-context mode) and still
    matches the single-device model."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = TransformerConfig.tiny_test(use_pallas=False)
    base = TransformerLM(cfg)
    params = base.init_params(jax.random.PRNGKey(2))
    ids = np.asarray(rng.randint(0, 128, (2, 20)), np.int32)

    ref_cache = base.new_cache(2, capacity=64)
    _, ref_cache = base.prefill(params, jnp.asarray(ids[:, :16]), ref_cache)

    mesh = make_mesh(data=1, seq=4, model=2)
    model = TransformerLM(cfg)
    sharded = shard_params(params, mesh)
    cache = shard_cache(model.new_cache(2, capacity=64), mesh)
    # Capacity dim (64) sharded 4-way over `seq`.
    assert cache.kv[0].sharding.spec[1] == "seq"

    with mesh:
        _, cache = jax.jit(model.prefill)(sharded,
                                          jnp.asarray(ids[:, :16]), cache)
        step = jax.jit(model.decode_step)
        for s in range(16, 20):
            tok = jnp.asarray(ids[:, s])
            ref_step, ref_cache = base.decode_step(params, tok, ref_cache)
            got, cache = step(sharded, tok, cache)
            np.testing.assert_allclose(np.asarray(got),
                                       np.asarray(ref_step), rtol=2e-3,
                                       atol=2e-3)
