"""Native serving engine tests: prefill/decode consistency, bucketing,
continuous batching (more requests than slots), stop tokens, quantized KV
cache."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rten_tpu.generate.engine import ServingEngine
from rten_tpu.generate.sampler import ArgMaxSampler
from rten_tpu.models.transformer import TransformerConfig, TransformerLM


@pytest.fixture(scope="module")
def model_and_params():
    cfg = TransformerConfig.tiny_test()
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def ref_greedy(model, params, prompt, n):
    toks = list(prompt)
    for _ in range(n):
        logits, _ = model.forward(params, jnp.asarray([toks], jnp.int32))
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


def test_engine_matches_stepwise_greedy(model_and_params):
    model, params = model_and_params
    eng = ServingEngine(model, params, max_batch=4, capacity=64,
                        prefill_buckets=(16,))
    prompts = [[1, 2, 3], [4, 5, 6, 7, 8], [9, 10]]
    outs = eng.generate(prompts, max_new_tokens=6)
    for prompt, out in zip(prompts, outs):
        assert out == ref_greedy(model, params, prompt, 6)


def test_engine_continuous_batching_oversubscribed(model_and_params):
    """8 requests, 2 slots: slots must be recycled and every request must
    still match the sequential reference."""
    model, params = model_and_params
    eng = ServingEngine(model, params, max_batch=2, capacity=64,
                        prefill_buckets=(16,))
    prompts = [[i + 1, i + 2] for i in range(8)]
    outs = eng.generate(prompts, max_new_tokens=4)
    assert len(outs) == 8
    for prompt, out in zip(prompts, outs):
        assert out == ref_greedy(model, params, prompt, 4)


def test_engine_stop_tokens(model_and_params):
    model, params = model_and_params
    # Find what token prompt [1,2] generates first, then use it as stop id.
    first = ref_greedy(model, params, [1, 2], 1)[0]
    eng = ServingEngine(model, params, max_batch=2, capacity=64,
                        prefill_buckets=(16,))
    outs = eng.generate([[1, 2]], max_new_tokens=10, stop_ids=(first,))
    assert outs[0] == [first]


def test_engine_quantized_kv_cache_close(model_and_params):
    model, params = model_and_params
    eng = ServingEngine(model, params, max_batch=2, capacity=64,
                        prefill_buckets=(16,), quantized_cache=True)
    outs = eng.generate([[1, 2, 3]], max_new_tokens=4)
    # int8 KV cache shifts logits slightly; greedy tokens may or may not
    # match, but generation must complete with the right count.
    assert len(outs[0]) == 4


def test_engine_cache_auto_policy(model_and_params):
    """cache="auto" resolves to the measured-best supported layout
    (token-packed int8 for Pallas configs, BASELINE.md round 6), and
    generation completes through it end to end."""
    model, params = model_and_params
    eng = ServingEngine(model, params, max_batch=2, capacity=64,
                        prefill_buckets=(16,), cache="auto")
    assert eng.quantized_cache and eng.cache.quant_scales is not None
    outs = eng.generate([[1, 2, 3]], max_new_tokens=4)
    assert len(outs[0]) == 4

    # Non-Pallas configs can't read the int8 cache through the decode
    # kernels: auto falls back to bf16 storage.
    cfg = TransformerConfig.tiny_test(use_pallas=False)
    m2 = TransformerLM(cfg)
    p2 = m2.init_params(jax.random.PRNGKey(0))
    eng2 = ServingEngine(m2, p2, max_batch=2, capacity=64,
                         prefill_buckets=(16,), cache="auto")
    assert not eng2.quantized_cache
    assert eng2.cache_dtype == "bfloat16"

    # Explicit layout names map straight through.
    eng3 = ServingEngine(model, params, max_batch=2, capacity=64,
                         prefill_buckets=(16,), cache="f32")
    assert not eng3.quantized_cache
    assert eng3.cache.kv[0].dtype == jnp.float32

    # cache= and the low-level knobs are mutually exclusive.
    with pytest.raises(AssertionError):
        ServingEngine(model, params, max_batch=2, capacity=64,
                      cache="auto", quantized_cache=True)


def test_engine_decode_compiles_once(model_and_params):
    model, params = model_and_params
    eng = ServingEngine(model, params, max_batch=2, capacity=64,
                        prefill_buckets=(16,))
    eng.generate([[1, 2], [3, 4]], max_new_tokens=4)
    n0 = eng._decode._cache_size()
    eng.generate([[5, 6, 7], [8, 9]], max_new_tokens=4)
    assert eng._decode._cache_size() == n0 == 1


def test_engine_burst_matches_single_step(model_and_params):
    model, params = model_and_params
    prompts = [[1, 2, 3], [7, 8]]
    eng1 = ServingEngine(model, params, max_batch=2, capacity=64,
                         prefill_buckets=(16,))
    single = eng1.generate(prompts, max_new_tokens=9)
    eng2 = ServingEngine(model, params, max_batch=2, capacity=64,
                         prefill_buckets=(16,))
    burst = eng2.generate(prompts, max_new_tokens=9, burst=4)
    assert burst == single


def test_engine_burst_respects_stop_tokens(model_and_params):
    model, params = model_and_params
    first = ref_greedy(model, params, [1, 2], 1)[0]
    eng = ServingEngine(model, params, max_batch=1, capacity=64,
                        prefill_buckets=(16,))
    outs = eng.generate([[1, 2]], max_new_tokens=12, stop_ids=(first,),
                        burst=8)
    assert outs[0] == [first]


def test_engine_bfloat16_mode():
    """bf16 compute/caches generate successfully and track the f32 greedy
    path closely (logits-argmax may diverge on near-ties, so compare the
    step logits, not token ids)."""
    import jax.numpy as jnp
    from rten_tpu.models.transformer import TransformerConfig, TransformerLM
    cfg32 = TransformerConfig.tiny_test()
    cfg16 = TransformerConfig.tiny_test(dtype="bfloat16")
    m32, m16 = TransformerLM(cfg32), TransformerLM(cfg16)
    params = m32.init_params(jax.random.PRNGKey(0))
    tokens = jnp.asarray([[5, 9, 11]], jnp.int32)
    l32, _ = m32.forward(params, tokens)
    l16, _ = m16.forward(params, tokens)
    assert l16.dtype == jnp.float32          # logits always f32
    np.testing.assert_allclose(np.asarray(l16), np.asarray(l32),
                               rtol=0.05, atol=0.05)
    # cache dtype follows the compute dtype
    cache = m16.new_cache(1, 16)
    assert cache.kv[0].dtype == jnp.bfloat16
    eng = ServingEngine(m16, params, max_batch=1, capacity=32,
                        prefill_buckets=(8,))
    outs = eng.generate([[5, 9, 11]], max_new_tokens=4)
    assert len(outs[0]) == 4


def test_scan_layers_matches_loop():
    """lax.scan-over-layers forward/prefill/decode must match the
    python-loop path exactly."""
    import jax.numpy as jnp
    from rten_tpu.models.transformer import TransformerConfig, TransformerLM
    cfg_loop = TransformerConfig.tiny_test(n_layers=3)
    cfg_scan = TransformerConfig.tiny_test(n_layers=3, scan_layers=True)
    m_loop, m_scan = TransformerLM(cfg_loop), TransformerLM(cfg_scan)
    params = m_loop.init_params(jax.random.PRNGKey(0))
    tokens = jnp.asarray([[3, 7, 11, 2]], jnp.int32)
    l1, _ = m_loop.forward(params, tokens)
    l2, _ = m_scan.forward(params, tokens)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1),
                               rtol=1e-5, atol=1e-5)
    # cached decode parity
    c_loop = m_loop.new_cache(1, 16)
    c_scan = m_scan.new_cache(1, 16)
    assert c_scan.stacked and not c_loop.stacked
    p1, c_loop = m_loop.prefill(params, tokens, c_loop)
    p2, c_scan = m_scan.prefill(params, tokens, c_scan)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                               rtol=1e-5, atol=1e-5)
    nxt = jnp.argmax(p1[:, -1], -1).astype(jnp.int32)
    d1, _ = m_loop.decode_step(params, nxt, c_loop)
    d2, _ = m_scan.decode_step(params, nxt, c_scan)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                               rtol=1e-5, atol=1e-5)


def test_engine_with_scan_layers():
    from rten_tpu.models.transformer import TransformerConfig, TransformerLM
    cfg = TransformerConfig.tiny_test(n_layers=3, scan_layers=True)
    cfg_ref = TransformerConfig.tiny_test(n_layers=3)
    model, ref_model = TransformerLM(cfg), TransformerLM(cfg_ref)
    params = model.init_params(jax.random.PRNGKey(0))
    eng = ServingEngine(model, params, max_batch=2, capacity=64,
                        prefill_buckets=(16,))
    outs = eng.generate([[1, 2, 3], [9, 4]], max_new_tokens=5)
    for prompt, out in zip([[1, 2, 3], [9, 4]], outs):
        assert out == ref_greedy(ref_model, params, prompt, 5)


def test_pipelined_bursts_match_stepwise():
    """run(burst=N) pipelines dispatch ahead of bookkeeping (admission
    lags one burst). With a greedy sampler the emitted tokens must be
    identical to step-by-step decoding, including continuous-batching
    slot reuse (more requests than slots)."""
    cfg = TransformerConfig.tiny_test()
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    prompts = [[5, 17, 3], [9, 2], [40, 41, 42], [7], [30, 31]]

    def gen(burst, pipeline=True):
        eng = ServingEngine(model, params, max_batch=2, capacity=64,
                            prefill_buckets=(8,))
        reqs = [eng.submit(pr, max_new_tokens=7) for pr in prompts]
        eng.run(burst=burst, pipeline=pipeline)
        return [r.tokens for r in reqs]

    ref = gen(1, pipeline=False)
    assert gen(4, pipeline=False) == ref
    assert gen(4, pipeline=True) == ref
    assert gen(3, pipeline=True) == ref


def test_decode_cache_donation_aliases_buffers():
    """The decode step's donated cache must update HBM in place — the
    reference's in-place append (rten-generate generator.rs:507-521)
    re-imagined as buffer donation. Asserted via buffer pointers: every
    cache leaf of the output aliases the input."""
    cfg = TransformerConfig.tiny_test(n_heads=2, d_model=128)
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    eng = ServingEngine(model, params, max_batch=2, capacity=32,
                        prefill_buckets=(8,))
    eng.submit([1, 2, 3], max_new_tokens=8)
    eng._admit()
    in_ptrs = {id(leaf): leaf.unsafe_buffer_pointer()
               for leaf in jax.tree_util.tree_leaves(eng.cache.kv)}
    in_set = set(in_ptrs.values())
    eng.step()
    out_set = {leaf.unsafe_buffer_pointer()
               for leaf in jax.tree_util.tree_leaves(eng.cache.kv)}
    assert out_set == in_set, "decode copied the KV cache"


def test_fused_head_argmax_matches_generic_path():
    """Greedy decoding on an int8-quantized model: the fused LM-head+
    argmax kernel (engine default for greedy samplers) must produce the
    same tokens as the generic logits→sampler path, across bursts and
    continuous-batching slot reuse."""
    from rten_tpu.models.transformer import quantize_weights

    cfg = TransformerConfig.tiny_test()
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    qparams = quantize_weights(params, kind="int8")
    prompts = [[5, 17, 3], [9, 2], [40, 41, 42], [7]]

    def gen(fused, burst):
        eng = ServingEngine(model, qparams, max_batch=2, capacity=64,
                            prefill_buckets=(8,), fused_head=fused)
        assert eng._fused_head is fused
        return eng.generate(prompts, max_new_tokens=6, burst=burst)

    want = gen(False, 1)
    assert gen(True, 1) == want
    assert gen(True, 4) == want


def test_fused_head_defaults():
    """Fused head auto-enables for greedy samplers only."""
    from rten_tpu.generate.sampler import TopKSampler

    cfg = TransformerConfig.tiny_test()
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    eng = ServingEngine(model, params, max_batch=2, capacity=32,
                        prefill_buckets=(8,))
    assert eng._fused_head
    eng = ServingEngine(model, params, max_batch=2, capacity=32,
                        prefill_buckets=(8,),
                        sampler=TopKSampler(k=5, temperature=0.7))
    assert not eng._fused_head
    # temperature=0 TopK is argmax — fused.
    eng = ServingEngine(model, params, max_batch=2, capacity=32,
                        prefill_buckets=(8,),
                        sampler=TopKSampler(k=5, temperature=0.0))
    assert eng._fused_head


def test_engine_stats_counters():
    """Serving observability: stats() reflects queue depth, occupancy,
    and emitted tokens."""
    cfg = TransformerConfig.tiny_test()
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    eng = ServingEngine(model, params, max_batch=2, capacity=32,
                        prefill_buckets=(8,))
    reqs = [eng.submit([1, 2, 3], max_new_tokens=4) for _ in range(3)]
    s = eng.stats()
    assert s["submitted"] == 3 and s["active"] == 0 and s["queued"] == 3
    eng._admit()
    s = eng.stats()
    assert s["active"] == 2 and s["queued"] == 1 and s["occupancy"] == 1.0
    eng.run(burst=2)
    s = eng.stats()
    assert s["completed"] == 3 and s["active"] == 0 and s["queued"] == 0
    total = sum(len(r.tokens) for r in reqs)
    # prefill's first token is counted per request by metrics, decode
    # tokens by the burst counter.
    assert s["tokens"] == total - len(reqs)
    assert s["tokens_per_s"] > 0 and s["decode_steps"] >= 4


# -- per-request sampling -----------------------------------------------


def test_per_request_sampler_greedy_rows_match_argmax():
    from rten_tpu.generate.sampler import PerRequestSampler
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(4, 100).astype(np.float32))
    s = PerRequestSampler(max_k=16)
    toks = s.sample(jax.random.PRNGKey(1), logits,
                    jnp.zeros(4), jnp.zeros(4), jnp.ones(4))
    np.testing.assert_array_equal(np.asarray(toks),
                                  np.argmax(np.asarray(logits), axis=-1))


def test_per_request_sampler_top_k_one_is_greedy():
    from rten_tpu.generate.sampler import PerRequestSampler
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(3, 50).astype(np.float32))
    s = PerRequestSampler(max_k=8)
    toks = s.sample(jax.random.PRNGKey(2), logits,
                    jnp.ones(3), jnp.ones(3), jnp.ones(3))  # temp 1, k 1
    np.testing.assert_array_equal(np.asarray(toks),
                                  np.argmax(np.asarray(logits), axis=-1))


def test_per_request_sampler_respects_top_k_set():
    from rten_tpu.generate.sampler import PerRequestSampler
    rng = np.random.RandomState(2)
    logits = jnp.asarray(rng.randn(2, 64).astype(np.float32))
    s = PerRequestSampler(max_k=16)
    top4 = np.argsort(-np.asarray(logits), axis=-1)[:, :4]
    for seed in range(20):
        toks = np.asarray(s.sample(
            jax.random.PRNGKey(seed), logits,
            jnp.full(2, 1.5), jnp.full(2, 4.0), jnp.ones(2)))
        for row in range(2):
            assert toks[row] in top4[row]


def test_per_request_sampler_tiny_top_p_is_greedy():
    from rten_tpu.generate.sampler import PerRequestSampler
    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(3, 40).astype(np.float32))
    s = PerRequestSampler(max_k=8)
    toks = s.sample(jax.random.PRNGKey(0), logits,
                    jnp.ones(3), jnp.zeros(3), jnp.full(3, 1e-6))
    np.testing.assert_array_equal(np.asarray(toks),
                                  np.argmax(np.asarray(logits), axis=-1))


def test_engine_per_request_mixed_batch(model_and_params):
    """One compiled decode serves a greedy and a stochastic request at
    once; the greedy one must reproduce the argmax-engine tokens."""
    from rten_tpu.generate.sampler import PerRequestSampler, SamplingParams
    model, params = model_and_params
    eng = ServingEngine(model, params, max_batch=2, capacity=64,
                        prefill_buckets=(16,),
                        sampler=PerRequestSampler(max_k=16))
    greedy_req = eng.submit([1, 2, 3], max_new_tokens=6)  # default greedy
    hot_req = eng.submit([4, 5, 6], max_new_tokens=6,
                         sampling=SamplingParams(temperature=1.0, top_k=8))
    eng.run()
    assert greedy_req.tokens == ref_greedy(model, params, [1, 2, 3], 6)
    assert len(hot_req.tokens) == 6
    assert eng._decode._cache_size() == 1  # one decode compile for both


def test_engine_per_request_burst_greedy_parity(model_and_params):
    from rten_tpu.generate.sampler import PerRequestSampler
    model, params = model_and_params
    eng = ServingEngine(model, params, max_batch=2, capacity=64,
                        prefill_buckets=(16,),
                        sampler=PerRequestSampler(max_k=16))
    req = eng.submit([7, 8, 9], max_new_tokens=6)
    eng.run(burst=3)
    assert req.tokens == ref_greedy(model, params, [7, 8, 9], 6)


# -- prefix cache ---------------------------------------------------------


def test_prefix_cache_exact_parity(model_and_params):
    """A prefix-cache hit must produce exactly the tokens of a cold
    prefill."""
    model, params = model_and_params
    system = [7, 3, 9, 9, 2, 1]
    prompts = [system + [11, 12], system + [4], [5, 6, 7]]  # 2 hits, 1 miss
    cold = ServingEngine(model, params, max_batch=4, capacity=64,
                         prefill_buckets=(8, 16))
    expect = cold.generate(prompts, max_new_tokens=6)

    eng = ServingEngine(model, params, max_batch=4, capacity=64,
                        prefill_buckets=(8, 16))
    eng.register_prefix(system)
    got = eng.generate(prompts, max_new_tokens=6)
    assert got == expect
    assert eng.stats()["prefix_hits"] == 2


def test_prefix_cache_fragment_reusable(model_and_params):
    """The stored fragment must survive hits: two sequential hits on the
    same prefix give identical results (no donation corruption)."""
    model, params = model_and_params
    system = [2, 4, 6, 8]
    eng = ServingEngine(model, params, max_batch=1, capacity=64,
                        prefill_buckets=(8,))
    eng.register_prefix(system)
    out1 = eng.generate([system + [1]], max_new_tokens=5)
    out2 = eng.generate([system + [1]], max_new_tokens=5)
    assert out1 == out2
    assert eng.stats()["prefix_hits"] == 2


def test_prefix_cache_longest_match(model_and_params):
    model, params = model_and_params
    eng = ServingEngine(model, params, max_batch=1, capacity=64,
                        prefill_buckets=(8, 16))
    eng.register_prefix([1, 2])
    eng.register_prefix([1, 2, 3, 4])
    hit = eng._match_prefix([1, 2, 3, 4, 5])
    assert hit[0] == (1, 2, 3, 4)
    # Exact-equal prompt is NOT a hit (no suffix to prefill).
    hit = eng._match_prefix([1, 2, 3, 4])
    assert hit[0] == (1, 2)


def test_prefix_cache_with_sampling_params(model_and_params):
    from rten_tpu.generate.sampler import PerRequestSampler
    model, params = model_and_params
    system = [3, 1, 4, 1, 5]
    cold = ServingEngine(model, params, max_batch=1, capacity=64,
                         prefill_buckets=(8,),
                         sampler=PerRequestSampler(max_k=16))
    r0 = cold.submit(system + [9], max_new_tokens=5)  # greedy default
    cold.run()
    eng = ServingEngine(model, params, max_batch=1, capacity=64,
                        prefill_buckets=(8,),
                        sampler=PerRequestSampler(max_k=16))
    eng.register_prefix(system)
    r1 = eng.submit(system + [9], max_new_tokens=5)
    eng.run()
    assert r1.tokens == r0.tokens


def test_engine_logprobs(model_and_params):
    """logprobs=True: each emitted token carries its log-probability,
    matching a manual forward's log_softmax at the sampled id."""
    model, params = model_and_params
    eng = ServingEngine(model, params, max_batch=2, capacity=64,
                        prefill_buckets=(16,), logprobs=True)
    prompt = [3, 1, 4, 1, 5]
    req = eng.submit(prompt, max_new_tokens=4)
    eng.run(burst=2)
    assert len(req.logprobs) == len(req.tokens) == 4

    toks = list(prompt)
    for tok, lp in zip(req.tokens, req.logprobs):
        logits, _ = model.forward(params, jnp.asarray([toks], jnp.int32))
        want = jax.nn.log_softmax(logits[0, -1])[tok]
        assert abs(lp - float(want)) < 2e-3, (lp, float(want))
        toks.append(tok)


def test_engine_logprobs_off_by_default(model_and_params):
    model, params = model_and_params
    eng = ServingEngine(model, params, max_batch=2, capacity=64,
                        prefill_buckets=(16,))
    req = eng.submit([1, 2], max_new_tokens=3)
    eng.run(burst=2)
    assert req.logprobs == []


def test_engine_cancel_active_and_queued(model_and_params):
    """cancel() frees a decoding slot (reused by the next admission) and
    drops a queued request before it ever runs."""
    model, params = model_and_params
    eng = ServingEngine(model, params, max_batch=1, capacity=64,
                        prefill_buckets=(16,))
    a = eng.submit([1, 2, 3], max_new_tokens=50)
    b = eng.submit([4, 5], max_new_tokens=4)      # waits for the slot
    eng.step()                                     # admits a, decodes once
    assert not a.done and len(a.tokens) >= 1
    assert eng.cancel(a)
    assert a.done
    assert not eng.cancel(a)                       # idempotent
    eng.run(burst=2)                               # b takes the slot
    assert b.done and len(b.tokens) == 4
    assert b.tokens == ref_greedy(model, params, [4, 5], 4)
    assert eng.stats()["cancelled"] == 1

    c = eng.submit([6, 7], max_new_tokens=4)
    d = eng.submit([8, 9], max_new_tokens=4)       # queued behind c
    assert eng.cancel(d)
    eng.run(burst=2)
    assert c.done and len(c.tokens) == 4
    assert d.tokens == []
    assert eng.stats()["cancelled"] == 2


@pytest.mark.parametrize("kind", ["stream", "grouped"])
def test_engine_decode_attn_variants(kind):
    """The alternate decode-attention kernels produce engine outputs
    identical to the default grid kernel."""
    cfg = TransformerConfig.tiny_test(decode_attn=kind)
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    eng = ServingEngine(model, params, max_batch=4, capacity=64,
                        prefill_buckets=(16,))
    prompts = [[1, 2, 3], [4, 5, 6, 7], [8, 9], [10, 11, 12]]
    outs = eng.generate(prompts, max_new_tokens=5)
    base = TransformerLM(TransformerConfig.tiny_test(decode_attn="fused"))
    ref_eng = ServingEngine(base, params, max_batch=4, capacity=64,
                            prefill_buckets=(16,))
    assert outs == ref_eng.generate(prompts, max_new_tokens=5)


def test_admission_group_sizes_pad_to_pow2(model_and_params):
    """Prefill compiles per (bucket, group) signature; odd arrival group
    sizes pad to powers of two so the compile count stays logarithmic."""
    model, params = model_and_params
    eng = ServingEngine(model, params, max_batch=8, capacity=64,
                        prefill_buckets=(16,))
    ref = {}
    for size in (3, 5, 6, 7):
        prompts = [[i + 1, i + 2] for i in range(size)]
        outs = eng.generate(prompts, max_new_tokens=3)
        for prompt, out in zip(prompts, outs):
            key = tuple(prompt)
            want = ref.setdefault(key,
                                  ref_greedy(model, params, prompt, 3))
            assert out == want
    # Group sizes {3,5,6,7} pad to {4,8}: exactly two compiled prefills.
    assert eng._prefill._cache_size() == 2


def test_admission_group_cache_is_bucket_sized(model_and_params):
    """The admission prefill's group cache only holds the prompt
    (insert copies rows [0, bucket) into the persistent cache), so it
    must be allocated at bucket capacity, not engine capacity — a
    full-capacity group cache doubles the engine's KV footprint (it
    OOMed a G=256/cap=512 f32 config on a 16 GB chip)."""
    model, params = model_and_params
    eng = ServingEngine(model, params, max_batch=2, capacity=64,
                        prefill_buckets=(16,))
    toks = jnp.zeros((2, 16), jnp.int32)
    _, prefilled = eng._prefill(params, toks,
                                jnp.asarray([3, 16], jnp.int32), 16)
    kv = prefilled.kv if not prefilled.stacked else [prefilled.kv]
    seq_axis = 2 if prefilled.stacked else 1
    assert all(buf.shape[seq_axis] == 16 for buf in kv)
    outs = eng.generate([[1, 2, 3], [4, 5] * 8], max_new_tokens=4)
    assert all(len(o) == 4 for o in outs)


def test_fused_append_matches_default(model_and_params):
    """cfg.fused_append=True (decode append fused into the grouped
    attention kernel) must emit exactly the same greedy tokens as the
    default two-kernel path — continuous batching at ragged depths."""
    from rten_tpu.models.transformer import TransformerConfig, TransformerLM
    cfg = TransformerConfig.tiny_test(n_heads=2, d_model=128)  # F=128
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(1))
    prompts = [[1, 2, 3], [4, 5, 6, 7, 8], [9, 10], [11] * 7]

    ref = ServingEngine(model, params, max_batch=4, capacity=64,
                        prefill_buckets=(8,)).generate(
                            prompts, max_new_tokens=6)
    fused_model = TransformerLM(TransformerConfig.tiny_test(
        n_heads=2, d_model=128, fused_append=True))
    got = ServingEngine(fused_model, params, max_batch=4, capacity=64,
                        prefill_buckets=(8,)).generate(
                            prompts, max_new_tokens=6)
    assert got == ref

def test_fused_append_odd_capacity_falls_back(model_and_params):
    """fused_append=True with a capacity NOT divisible by the grouped
    block (96 % 64 != 0) must fall back to the two-kernel path instead
    of tripping flash_decode_grouped_append's trace-time assert
    (round-1 advisor finding)."""
    from rten_tpu.models.transformer import TransformerConfig, TransformerLM
    cfg = TransformerConfig.tiny_test(n_heads=2, d_model=128)
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(1))
    prompts = [[1, 2, 3], [4, 5, 6, 7, 8], [9, 10], [11] * 7]

    ref = ServingEngine(model, params, max_batch=4, capacity=96,
                        prefill_buckets=(8,)).generate(
                            prompts, max_new_tokens=6)
    fused_model = TransformerLM(TransformerConfig.tiny_test(
        n_heads=2, d_model=128, fused_append=True))
    got = ServingEngine(fused_model, params, max_batch=4, capacity=96,
                        prefill_buckets=(8,)).generate(
                            prompts, max_new_tokens=6)
    assert got == ref


def test_engine_tail_write_buffer():
    """bf16 tail write-buffer path (quantized cache + flat kernel):
    generation completes across flush boundaries, admissions flush the
    window, and outputs stay close to the no-tail int8 engine (the tail
    attends the newest tokens at bf16 — slightly MORE precise)."""
    cfg = TransformerConfig.tiny_test(n_heads=2, kv_heads=2, d_model=128,
                                      use_pallas=True)
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    prompts = [[1, 2, 3], [4, 5, 6, 7], [9, 10], [11, 3, 2]]

    eng = ServingEngine(model, params, max_batch=4, capacity=64,
                        prefill_buckets=(16,), quantized_cache=True)
    assert eng._tail_flush > 0 and eng.cache.tail is not None
    # Burst longer than the flush stride → in-burst flushes; then more
    # requests than slots → admission host-flush path.
    outs = eng.generate(prompts, max_new_tokens=eng._tail_flush + 5)
    assert all(len(o) == eng._tail_flush + 5 for o in outs)
    assert int(eng.cache.tail_count) == eng._tail_fill

    # Oversubscribed: 6 requests, 4 slots.
    outs = eng.generate([[i + 1, i + 2] for i in range(6)],
                        max_new_tokens=4)
    assert all(len(o) == 4 for o in outs)

    # Same prompts through the no-tail int8 engine: token streams agree
    # for most steps (bf16-tail vs int8 attention differ slightly).
    eng2 = ServingEngine(model, params, max_batch=4, capacity=64,
                        prefill_buckets=(16,), quantized_cache=True)
    eng2._tail_flush = 0
    eng2.cache = model.new_cache(4, 64, quantized=True)
    a = eng.generate(prompts, max_new_tokens=6)
    b = eng2.generate(prompts, max_new_tokens=6)
    agree = sum(x == y for ra, rb in zip(a, b)
                for x, y in zip(ra, rb))
    assert agree >= 0.5 * sum(len(r) for r in a)


def test_engine_tail_long_capacity():
    """Round-5 verdict item 2: the tail write-buffer gate no longer
    stops at capacity 2048 — the bf16-E flat long-context kernel's
    modeled VMEM fit (flat_vmem_bytes) admits long caps at block_k=128.
    The long-cap tail engine generates across flush boundaries and
    stays close to the no-tail int8 engine."""
    cfg = TransformerConfig.tiny_test(n_heads=2, kv_heads=2, d_model=128,
                                      use_pallas=True)
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    prompts = [[1, 2, 3], [4, 5, 6, 7], [9, 10], [11, 3, 2]]

    eng = ServingEngine(model, params, max_batch=4, capacity=2048,
                        prefill_buckets=(16,), quantized_cache=True)
    assert eng._tail_flush > 0 and eng.cache.tail is not None

    # Capacity NOT a multiple of 128 must stay gated off at >= 2048
    # (the flat kernel picks block_k=128 there and would raise).
    eng_odd = ServingEngine(model, params, max_batch=4, capacity=2112,
                            prefill_buckets=(16,), quantized_cache=True)
    assert eng_odd._tail_flush == 0

    outs = eng.generate(prompts, max_new_tokens=eng._tail_flush + 3)
    assert all(len(o) == eng._tail_flush + 3 for o in outs)

    eng2 = ServingEngine(model, params, max_batch=4, capacity=2048,
                         prefill_buckets=(16,), quantized_cache=True,
                         tail_window=0)
    a = eng.generate(prompts, max_new_tokens=6)
    b = eng2.generate(prompts, max_new_tokens=6)
    agree = sum(x == y for ra, rb in zip(a, b)
                for x, y in zip(ra, rb))
    assert agree >= 0.5 * sum(len(r) for r in a)


def test_tail_decode_step_logits_match_float():
    """Deterministic per-step check of the tail write-buffer decode path
    (advisor r3 findings 1+4): every decode step's logits with a
    tail-buffered int8 cache must match a FLOAT-cache forward within
    int8-KV rounding tolerance — at every window depth and on EVERY
    layer (the logits sit downstream of the last layer, where the old
    per-append tail_count bump made attention read one stale tail row
    and drop the newest packed token; a loose token-agreement ratio
    missed it)."""
    from rten_tpu.models.transformer import (TransformerConfig,
                                             TransformerLM)
    cfg = TransformerConfig.tiny_test(n_heads=2, kv_heads=2, d_model=128,
                                      use_pallas=True)
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(3))
    B, P, cap, R = 4, 5, 64, 8
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (B, P)),
                         jnp.int32)

    tail_cache = model.new_cache(B, cap, quantized=True, tail_window=R)
    assert tail_cache.tail is not None
    float_cache = model.new_cache(B, cap)
    _, tail_cache = model.prefill(params, tokens, tail_cache)
    _, float_cache = model.prefill(params, tokens, float_cache)
    lens = jnp.full((B,), P, jnp.int32)
    tail_cache = tail_cache.with_lengths(lens)
    float_cache = float_cache.with_lengths(lens)

    tok = jnp.asarray(rng.integers(1, cfg.vocab_size, (B,)), jnp.int32)
    for step in range(R - 1):          # every in-window depth pre-flush
        lt, tail_cache = model.decode_step(params, tok, tail_cache)
        lf, float_cache = model.decode_step(params, tok, float_cache)
        assert int(tail_cache.tail_count) == step + 1
        diff = float(jnp.max(jnp.abs(lt - lf)))
        # int8 KV rounding on the packed prompt rows only (the window
        # rows are bf16); the buggy last-layer depth measured ~2.26 on
        # unit-scale data and O(0.5+) here.
        assert diff < 0.05, f"step {step}: logits diff {diff}"
        tok = jnp.argmax(lt, axis=-1).astype(jnp.int32)

    # Flush and cross the boundary: the first post-flush step must stay
    # just as tight (regression for the flush/window-depth interaction).
    tail_cache = tail_cache.flush_tail(int(tail_cache.tail_count))
    lt, tail_cache = model.decode_step(params, tok, tail_cache)
    lf, float_cache = model.decode_step(params, tok, float_cache)
    assert int(tail_cache.tail_count) == 1
    assert float(jnp.max(jnp.abs(lt - lf))) < 0.05
