"""Pipeline parallelism (parallel/pipeline.py): GPipe microbatch schedule
over a `pipe` mesh axis matches the single-device model exactly, composes
with data/tensor parallelism, and handles continuous-batching decode at
mixed depths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rten_tpu.models.transformer import TransformerConfig, TransformerLM
from rten_tpu.parallel import PipelinedLM, make_mesh

rng = np.random.RandomState(11)


def _setup(pipe=2, data=2, model=2, microbatches=2, n_layers=4, **cfg_kw):
    if len(jax.devices()) < pipe * data * model:
        pytest.skip("needs 8 virtual devices")
    cfg = TransformerConfig.tiny_test(n_layers=n_layers, use_pallas=False,
                                      **cfg_kw)
    base = TransformerLM(cfg)
    params = base.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh(data=data, pipe=pipe, model=model)
    plm = PipelinedLM(base, mesh, microbatches=microbatches)
    return base, params, mesh, plm


def test_pipeline_prefill_matches_base():
    base, params, mesh, plm = _setup()
    ids = jnp.asarray(rng.randint(0, 128, (4, 12)), jnp.int32)

    want, _ = base.forward(params, ids)
    sharded = plm.shard_params(params)
    cache = plm.new_cache(4, capacity=32)
    with mesh:
        got, cache = plm.prefill(sharded, ids, cache)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
    assert int(cache.lengths[0]) == 12


def test_pipeline_prefill_then_decode_matches_base():
    base, params, mesh, plm = _setup()
    ids = np.asarray(rng.randint(0, 128, (4, 10)), np.int32)

    # Base reference: uncached full forwards.
    ref_cache = base.new_cache(4, capacity=32)
    ref_logits, ref_cache = base.prefill(
        params, jnp.asarray(ids[:, :6]), ref_cache)

    sharded = plm.shard_params(params)
    cache = plm.new_cache(4, capacity=32)
    with mesh:
        logits, cache = plm.prefill(sharded, jnp.asarray(ids[:, :6]),
                                    cache)
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(ref_logits), rtol=2e-3,
                                   atol=2e-3)
        for s in range(6, 10):
            tok = jnp.asarray(ids[:, s])
            ref_step, ref_cache = base.decode_step(params, tok, ref_cache)
            step, cache = plm.decode_step(sharded, tok, cache)
            np.testing.assert_allclose(np.asarray(step),
                                       np.asarray(ref_step), rtol=2e-3,
                                       atol=2e-3)


def test_pipeline_pipe_only_mesh_four_stages():
    """4 stages × 4 microbatches, no TP/DP."""
    base, params, mesh, plm = _setup(pipe=4, data=1, model=2,
                                     microbatches=4)
    ids = jnp.asarray(rng.randint(0, 128, (8, 7)), jnp.int32)
    want, _ = base.forward(params, ids)
    sharded = plm.shard_params(params)
    cache = plm.new_cache(8, capacity=16)
    with mesh:
        got, _ = plm.prefill(sharded, ids, cache)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_pipeline_rejects_bad_layer_split():
    cfg = TransformerConfig.tiny_test(n_layers=3)
    mesh = make_mesh(data=2, pipe=2, model=2)
    with pytest.raises(ValueError):
        PipelinedLM(TransformerLM(cfg), mesh)


def test_pipeline_moe_compose():
    """PP × EP: MoE expert stacks shard over (pipe, expert, ..., model)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = TransformerConfig.tiny_moe(n_layers=4, use_pallas=False,
                                     moe_impl="dense")
    base = TransformerLM(cfg)
    params = base.init_params(jax.random.PRNGKey(1))
    mesh = make_mesh(data=1, expert=2, pipe=2, model=2)
    plm = PipelinedLM(base, mesh, microbatches=2)
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (4, 9)), jnp.int32)
    want, _ = base.forward(params, ids)
    sharded = plm.shard_params(params)
    l = sharded["layers"]
    assert l["w_up"].sharding.spec[0] == "pipe"
    cache = plm.new_cache(4, capacity=16)
    with mesh:
        got, _ = plm.prefill(sharded, ids, cache)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
