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


def test_seq_island_gate_mirrors_partials_kernel_constraints():
    """Advisor r4 finding 1: the seq-island gate must reject every
    config flash_decode_flat(partials=True) would RAISE on (the kernel
    has no fallback in partials mode — a gate/kernel mismatch errors
    inside the jitted decode step): per-shard capacity >= 2048 selects
    block_k=128 so needs % 128 == 0, and the E matrix must fit its
    4 MB VMEM budget."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = TransformerConfig(
        vocab_size=128, n_layers=1, n_heads=4, kv_heads=4, d_model=256,
        d_ff=128, max_seq_len=8192, pos="learned", norm="layernorm",
        act="gelu", use_pallas=True)
    mesh = make_mesh(data=1, seq=2, model=2,
                     devices=jax.devices()[:4])
    model = TransformerLM(cfg)
    model.mesh = mesh

    def gate(m, capacity):
        cache = m.new_cache(8, capacity, quantized=True)
        return m._use_attn_island(cache, False)

    assert gate(model, 1024)          # cap_l 512 (< 2048): block_k 64
    assert gate(model, 4096)          # cap_l 2048 % 128 == 0
    # cap_l 2112: % 64 == 0 passes the OLD gate, but the kernel picks
    # block_k=128 at cap_l >= 2048 and 2112 % 128 != 0 -> must reject.
    assert not gate(model, 4224)

    # E-matrix VMEM bound: hp8 * head_dim * local features * elt bytes
    # (16 * 128 * 2048 * 2 = 8 MB bf16) exceeds the kernel's 4 MB
    # budget -> reject (GSPMD fallback) instead of raising in-kernel.
    big = TransformerConfig(
        vocab_size=128, n_layers=1, n_heads=32, kv_heads=32,
        d_model=4096, d_ff=128, max_seq_len=1024, pos="learned",
        norm="layernorm", act="gelu", use_pallas=True)
    bmodel = TransformerLM(big)
    bmodel.mesh = mesh
    assert not gate(bmodel, 512)


def test_seq_only_raw_mesh_island_decode():
    """Advisor r4 finding 3: a hand-built Mesh with ONLY a `seq` axis
    (no model/data — make_mesh always adds both, raw jax Meshes need
    not) must run the seq island without an unknown-axis shard_map
    error, and match the unsharded quant decode."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    from jax.sharding import Mesh

    cfg = TransformerConfig(
        vocab_size=64, n_layers=1, n_heads=4, kv_heads=4, d_model=512,
        d_ff=64, max_seq_len=128, pos="learned", norm="layernorm",
        act="gelu", use_pallas=True)
    base = TransformerLM(cfg)
    params = base.init_params(jax.random.PRNGKey(0))
    model = TransformerLM(cfg)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("seq",))
    model.mesh = mesh
    cache = model.new_cache(4, 128, quantized=True)
    assert model._use_attn_island(cache, False)
    ref_cache = base.new_cache(4, 128, quantized=True)
    toks = jnp.asarray([1, 2, 3, 4], jnp.int32)
    with mesh:
        got, _ = jax.jit(model.decode_step)(params, toks, cache)
    ref, _ = base.decode_step(params, toks, ref_cache)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
