"""Speculative decoding tests: chunked verify parity, n-gram prompt
lookup drafting, and greedy-exactness of the speculative engine."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rten_tpu.generate.engine import ServingEngine
from rten_tpu.generate.speculative import ngram_draft
from rten_tpu.models.transformer import TransformerConfig, TransformerLM


@pytest.fixture(scope="module", params=["gpt2", "gqa"])
def model_and_params(request):
    if request.param == "gpt2":
        cfg = TransformerConfig.tiny_test()
    else:
        cfg = TransformerConfig.tiny_test(pos="rope", norm="rmsnorm",
                                          act="swiglu", kv_heads=2)
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def test_verify_step_matches_sequential_decode(model_and_params):
    model, params = model_and_params
    cfg = model.config
    B, P, S = 2, 5, 4
    rng = np.random.RandomState(0)
    prompts = jnp.asarray(rng.randint(0, cfg.vocab_size, (B, P)), jnp.int32)
    extra = jnp.asarray(rng.randint(0, cfg.vocab_size, (B, S)), jnp.int32)

    cache = model.new_cache(B, 64)
    _, cache = model.prefill(params, prompts, cache)
    cache = cache.with_lengths(jnp.full(B, P, jnp.int32))
    ref = []
    for i in range(S):
        lg, cache = model.decode_step(params, extra[:, i], cache)
        ref.append(np.asarray(lg))
    ref = np.stack(ref, axis=1)

    cache2 = model.new_cache(B, 64)
    _, cache2 = model.prefill(params, prompts, cache2)
    cache2 = cache2.with_lengths(jnp.full(B, P, jnp.int32))
    vlog, cache2 = model.verify_step(params, extra, cache2)
    np.testing.assert_allclose(np.asarray(vlog), ref, atol=2e-4)
    # lengths unchanged: the caller owns advancement.
    assert int(cache2.lengths[0]) == P


def test_verify_step_partial_rollback_consistent(model_and_params):
    """After accepting only m of the verified tokens (lengths advanced by
    m), a later decode step must behave as if the rejected tail was never
    appended."""
    model, params = model_and_params
    cfg = model.config
    B, P = 1, 6
    rng = np.random.RandomState(1)
    prompt = jnp.asarray(rng.randint(0, cfg.vocab_size, (B, P)), jnp.int32)
    good = jnp.asarray(rng.randint(0, cfg.vocab_size, (B, 1)), jnp.int32)
    junk = jnp.asarray(rng.randint(0, cfg.vocab_size, (B, 3)), jnp.int32)

    # Path A: verify [good, junk...] but accept only `good` (m=1).
    cache = model.new_cache(B, 64)
    _, cache = model.prefill(params, prompt, cache)
    cache = cache.with_lengths(jnp.full(B, P, jnp.int32))
    _, cache = model.verify_step(
        params, jnp.concatenate([good, junk], axis=1), cache)
    cache = cache.with_lengths(cache.lengths + 1)      # accept 1
    follow = jnp.asarray([[3]], jnp.int32)
    logits_a, _ = model.decode_step(params, follow[:, 0], cache)

    # Path B: plain decode of good then follow.
    cache2 = model.new_cache(B, 64)
    _, cache2 = model.prefill(params, prompt, cache2)
    cache2 = cache2.with_lengths(jnp.full(B, P, jnp.int32))
    _, cache2 = model.decode_step(params, good[:, 0], cache2)
    logits_b, _ = model.decode_step(params, follow[:, 0], cache2)
    np.testing.assert_allclose(np.asarray(logits_a), np.asarray(logits_b),
                               atol=2e-4)


# -- n-gram drafting ----------------------------------------------------


def test_ngram_draft_finds_last_match():
    #              0  1  2  3  4  5  6  7  8
    hist = jnp.asarray([[5, 6, 9, 9, 5, 6, 7, 5, 6] + [0] * 7], jnp.int32)
    drafts = ngram_draft(hist, jnp.asarray([9]), n=2, k=3)
    # trailing bigram (5,6) last matches at j=4 -> continuation 7, 5, 6
    assert drafts.tolist() == [[7, 5, 6]]


def test_ngram_draft_no_match_repeats_last():
    hist = jnp.asarray([[1, 2, 3, 4, 5] + [0] * 5], jnp.int32)
    drafts = ngram_draft(hist, jnp.asarray([5]), n=2, k=2)
    assert drafts.tolist() == [[5, 5]]


def test_ngram_draft_ignores_garbage_past_length():
    # Same valid prefix, different garbage: drafts must agree.
    a = np.zeros((1, 12), np.int32)
    b = np.full((1, 12), 7, np.int32)
    for arr in (a, b):
        arr[0, :6] = [4, 1, 2, 9, 1, 2]
    da = ngram_draft(jnp.asarray(a), jnp.asarray([6]), n=2, k=3)
    db = ngram_draft(jnp.asarray(b), jnp.asarray([6]), n=2, k=3)
    assert da.tolist() == db.tolist() == [[9, 1, 2]]


def test_ngram_draft_clamps_draft_window_to_valid_prefix():
    # Match near the end: continuation shorter than k clamps to the last
    # valid token instead of reading garbage.
    hist = np.zeros((1, 10), np.int32)
    hist[0, :5] = [1, 2, 8, 1, 2]
    drafts = ngram_draft(jnp.asarray(hist), jnp.asarray([5]), n=2, k=3)
    assert drafts.tolist() == [[8, 1, 2]]


# -- engine exactness ---------------------------------------------------


def ref_greedy(model, params, prompt, n):
    toks = list(prompt)
    for _ in range(n):
        logits, _ = model.forward(params, jnp.asarray([toks], jnp.int32))
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


def test_spec_engine_matches_plain_greedy(model_and_params):
    """The speculative engine must emit EXACTLY the plain greedy stream
    (speculative decoding changes step count, never tokens)."""
    model, params = model_and_params
    prompts = [[1, 2, 3], [4, 5, 6, 7, 8], [9, 10]]
    plain = ServingEngine(model, params, max_batch=4, capacity=64,
                          prefill_buckets=(16,))
    expect = plain.generate(prompts, max_new_tokens=10)

    spec = ServingEngine(model, params, max_batch=4, capacity=64,
                         prefill_buckets=(16,), spec_draft=3, spec_ngram=2)
    got = spec.generate(prompts, max_new_tokens=10, burst=2)
    assert got == expect


def test_spec_engine_oversubscribed_slots(model_and_params):
    model, params = model_and_params
    prompts = [[i + 1, i + 2, i + 3] for i in range(5)]
    spec = ServingEngine(model, params, max_batch=2, capacity=64,
                         prefill_buckets=(16,), spec_draft=2, spec_ngram=2)
    outs = spec.generate(prompts, max_new_tokens=6, burst=2)
    for prompt, out in zip(prompts, outs):
        assert out == ref_greedy(model, params, prompt, 6)


def test_spec_engine_stop_tokens(model_and_params):
    model, params = model_and_params
    first = ref_greedy(model, params, [1, 2], 1)[0]
    spec = ServingEngine(model, params, max_batch=2, capacity=64,
                         prefill_buckets=(16,), spec_draft=2)
    outs = spec.generate([[1, 2]], max_new_tokens=10, stop_ids=(first,))
    assert outs[0][-1] == first
    assert len(outs[0]) <= 10


def test_spec_acceptance_on_repetitive_prompt(model_and_params):
    """A prompt that already loops should let prompt-lookup accept >1
    token per step (fewer engine steps than tokens)."""
    model, params = model_and_params
    # Build a genuinely repetitive stream: the model's own greedy loop.
    seed = ref_greedy(model, params, [1, 2], 12)
    prompt = [1, 2] + seed
    spec = ServingEngine(model, params, max_batch=1, capacity=128,
                         prefill_buckets=(32,), spec_draft=3, spec_ngram=2)
    req = spec.submit(prompt, max_new_tokens=12)
    spec.run(burst=1)
    assert req.tokens == ref_greedy(model, params, prompt, 12)
    # decode_steps counts spec steps; with acceptance it must be fewer
    # than the tokens emitted (minus the prefill-sampled first token).
    assert spec.counters["decode_steps"] < len(req.tokens) - 1


def test_verify_step_quantized_cache_close(model_and_params):
    """Chunked verify over the token-packed int8 cache: the chunk's RMW
    append must land the drafted tokens at ragged depths (straddling
    int32 row boundaries) and the verify logits must track the float
    cache within quantization error."""
    model, params = model_and_params
    cfg = model.config
    B, S = 2, 4
    rng = np.random.RandomState(4)
    prompts = jnp.asarray(rng.randint(0, cfg.vocab_size, (B, 7)),
                          jnp.int32)
    extra = jnp.asarray(rng.randint(0, cfg.vocab_size, (B, S)), jnp.int32)

    outs = {}
    for quant in (False, True):
        cache = model.new_cache(B, 64, quantized=quant)
        _, cache = model.prefill(params, prompts, cache)
        # ragged depths: row-aligned and mid-row
        cache = cache.with_lengths(jnp.asarray([4, 7], jnp.int32))
        vlog, _ = model.verify_step(params, extra, cache)
        outs[quant] = np.asarray(vlog)
    ref = outs[False]
    scale = np.abs(ref).max()
    np.testing.assert_allclose(outs[True], ref, atol=0.12 * scale)


# -- gate / probe-budget accounting (no device timing involved: the gate
# runs on host state we set directly) ----------------------------------


def _spec_engine(model_and_params, **kw):
    model, params = model_and_params
    return ServingEngine(model, params, max_batch=2, capacity=64,
                         prefill_buckets=(8,), spec_draft=3, **kw)


def test_spec_auto_resolves_to_gate_with_floor_start(model_and_params):
    """spec_adaptive="auto" resolves to the GATE; the measured dispatch
    floor picks the START state instead (round 4: with the floor-aware
    OFF start + wall-budgeted probes the gate's worst case is bounded
    on any rig, while always-draft loses ~2x on unacceptable
    traffic)."""
    eng = _spec_engine(model_and_params)
    assert eng.spec_adaptive == "auto"
    eng._dispatch_floor = 0.031          # tunnel-like: 31 ms / dispatch
    eng._plain_t = 0.002
    eng._resolve_spec_auto(16)
    assert eng.spec_adaptive is True
    eng._resolve_spec_start()
    assert eng._spec_on is False         # floor-heavy: probe-driven

    eng2 = _spec_engine(model_and_params)
    eng2._dispatch_floor = 0.0001        # local runtime: ~0.1 ms
    eng2._plain_t = 0.002
    eng2._resolve_spec_auto(16)
    assert eng2.spec_adaptive is True
    eng2._resolve_spec_start()
    assert eng2._spec_on is True         # cheap dispatch: optimistic


def test_spec_gate_flip_accounting(model_and_params):
    """Gate flips exactly at the hysteresis bounds of measured
    efficiency = tokens/step / (spec_t / plain_t)."""
    eng = _spec_engine(model_and_params, spec_adaptive=True)
    eng._spec_t, eng._plain_t = 0.002, 0.001       # cost ratio 2.0
    eng._spec_on = True
    eng._spec_tps = 1.8                            # eff 0.9 < 0.95
    eng._spec_gate()
    assert eng._spec_on is False and eng._spec_confirmed is False
    eng._spec_tps = 2.2                            # eff 1.1 > 1.05
    eng._spec_gate()
    assert eng._spec_on is True and eng._spec_confirmed is True
    # Dead zone (0.95 <= eff <= 1.05) leaves the gate untouched.
    eng._spec_tps = 2.0
    eng._spec_gate()
    assert eng._spec_on is True


def test_spec_probe_budget_in_dispatch_cost_units(model_and_params):
    """A probe may fire only once its measured cost is within
    spec_probe_overhead of the plain wall accumulated since the last
    spec burst — step counts alone never license one."""
    eng = _spec_engine(model_and_params, spec_adaptive=True)
    eng._spec_burst_wall = 0.05          # measured probe cost: 50 ms
    eng._plain_wall_since_probe = 0.1    # only 100 ms of plain since
    assert not eng._probe_affordable()   # 50/0.02 = 2.5 s needed
    eng._plain_wall_since_probe = 3.0
    assert eng._probe_affordable()
    # Unmeasured probe cost estimates from floor + 4 plain steps.
    eng2 = _spec_engine(model_and_params, spec_adaptive=True)
    eng2._dispatch_floor, eng2._plain_t = 0.031, 0.001
    eng2._plain_wall_since_probe = 1.0
    assert not eng2._probe_affordable()  # (31+4) ms / 0.02 = 1.75 s
    eng2._plain_wall_since_probe = 2.0
    assert eng2._probe_affordable()


def test_spec_k_ladder_independent_of_gate(model_and_params):
    """The draft-length ladder adapts in ALWAYS-draft mode too (it is
    what rescued the random worst case — BASELINE.md round 3)."""
    eng = _spec_engine(model_and_params, spec_adaptive=False)
    assert eng._spec_k == 3
    eng._spec_tps = 1.2                  # acceptance frac ~0.07 -> shrink
    eng._adapt_k()
    assert eng._spec_k == 2
    eng._spec_tps = 1.0                  # keep shrinking to the floor
    eng._adapt_k()
    assert eng._spec_k == 1
    eng._adapt_k()
    assert eng._spec_k == 1              # never below 1
    eng._spec_tps = 1.9                  # frac 0.9 -> regrow
    eng._adapt_k()
    assert eng._spec_k == 2


def test_spec_engine_auto_mode_generates(model_and_params):
    """End-to-end: the default (auto) spec engine resolves its mode
    during run() and produces greedy-exact output."""
    model, params = model_and_params
    prompts = [[1, 2, 3, 1, 2, 3, 1, 2], [5, 6, 5, 6, 5, 6, 5, 6]]
    plain = ServingEngine(model, params, max_batch=2, capacity=64,
                          prefill_buckets=(8,)).generate(
                              prompts, max_new_tokens=8)
    eng = _spec_engine(model_and_params)
    out = eng.generate(prompts, max_new_tokens=8, burst=4)
    assert eng.spec_adaptive in (True, False)   # resolved
    assert out == plain


def test_spec_gate_start_state_resolution(model_and_params):
    """Explicit spec_adaptive=True resolves its START state from the
    measured dispatch floor: floor-heavy rigs begin gated-OFF (the
    unconfirmed probe phase cost ~10x on random traffic through the dev
    tunnel); cheap-dispatch rigs keep the optimistic ON start."""
    eng = _spec_engine(model_and_params, spec_adaptive=True)
    eng._dispatch_floor = 0.031          # tunnel-like
    eng._resolve_spec_start()
    assert eng._spec_on is False
    assert eng._plain_bursts_since_probe >= eng._spec_probe_every
    # Resolution is one-shot.
    eng._spec_on = True
    eng._resolve_spec_start()
    assert eng._spec_on is True

    eng2 = _spec_engine(model_and_params, spec_adaptive=True)
    eng2._dispatch_floor = 0.0002        # local runtime
    eng2._resolve_spec_start()
    assert eng2._spec_on is True


def test_spec_probe_free_estimator(model_and_params):
    """Round-5 verdict item 8: the host-side n-gram acceptance
    estimate (zero dispatches) reads high on repetitive streams and
    low on random ones, and _estimate_says_go prices it against the
    measured cost ratio."""
    from rten_tpu.generate.engine import Request

    eng = _spec_engine(model_and_params, spec_adaptive=True)
    rep = Request(list(range(5)) * 8, 1)   # strongly periodic
    rep.tokens = list(range(5)) * 4
    rng = np.random.RandomState(3)
    rand = Request(list(rng.randint(0, 100, 40)), 1)
    rand.tokens = list(rng.randint(0, 100, 20))

    eng.slot_request = [rep, None]
    est_rep = eng._estimate_spec_tps()
    eng.slot_request = [rand, None]
    est_rand = eng._estimate_spec_tps()
    assert est_rep is not None and est_rand is not None
    # Periodic text drafts near-perfectly: ~K+1 tokens/step.
    assert est_rep > 3.0
    # Random tokens essentially never draft: ~1 token/step (+ the
    # occasional accidental repeat).
    assert est_rand < 1.5
    assert eng.stats()["spec_est_tps"] == round(est_rand, 3)

    # Pricing against the cost ratio: the repetitive estimate clears
    # the bar at cost 2.0; the random one must decline the probe.
    eng._spec_t, eng._plain_t = 0.002, 0.001
    eng.slot_request = [rep, None]
    assert eng._estimate_says_go()
    eng.slot_request = [rand, None]
    assert not eng._estimate_says_go()
    # No history at all -> estimate unavailable -> probe allowed
    # (old behavior).
    eng.slot_request = [None, None]
    assert eng._estimate_says_go()


def test_spec_probe_declined_when_estimate_low(model_and_params):
    """End to end wiring: with the gate OFF, a low host-side estimate
    declines every probe (zero spec bursts, tokens match plain
    greedy); a high estimate arms one. (A tiny greedy model's output
    is often periodic, so the estimate is stubbed to pin each side —
    the estimator's own readings are covered above.)"""
    model, params = model_and_params
    rng = np.random.RandomState(7)
    prompts = [list(rng.randint(0, 100, 12)) for _ in range(2)]

    plain = ServingEngine(model, params, max_batch=2, capacity=64,
                          prefill_buckets=(16,))
    want = plain.generate(prompts, max_new_tokens=24)

    def build(est):
        eng = ServingEngine(model, params, max_batch=2, capacity=64,
                            prefill_buckets=(16,), spec_draft=3,
                            spec_adaptive=True, spec_probe_every=2)
        eng._spec_started = True         # skip floor measurement
        eng._spec_on = False
        calls = {"spec": 0}
        orig = eng.step_spec_burst

        def counting(*a, **kw):
            calls["spec"] += 1
            return orig(*a, **kw)

        eng.step_spec_burst = counting
        # Probes otherwise affordable so ONLY the estimator gates.
        eng._probe_affordable = lambda: True
        eng._estimate_spec_tps = lambda **kw: est
        return eng, calls

    eng, calls = build(1.0)              # random-like: ~1 token/step
    got = eng.generate(prompts, max_new_tokens=24, burst=4)
    assert got == want
    assert calls["spec"] == 0            # every probe declined

    eng2, calls2 = build(3.5)            # repetitive-like
    eng2.generate(prompts, max_new_tokens=24, burst=4)
    assert calls2["spec"] >= 1           # probe armed on device


def test_spec_cost_ema_discards_compile_burst(model_and_params):
    """The first spec burst at a (k, n) shape carries its compile; its
    wall must NOT enter the cost EMAs. A single poisoned sample wedged
    the measured cost ratio at ~58x plain (CPU repro) and permanently
    gated speculation OFF on traffic whose measured acceptance was 3.7
    tokens/step (round-5 fix). Acceptance itself is timing-free and
    must still update from the cold burst."""
    model, params = model_and_params
    eng = ServingEngine(model, params, max_batch=2, capacity=128,
                        prefill_buckets=(16,), spec_draft=3,
                        spec_adaptive=True)
    for p in ([1, 2, 3], [4, 5]):
        eng.submit(p, max_new_tokens=64)
    eng._admit()
    eng.step_spec_burst(2)               # cold: compiles (k=3, n=2)
    assert eng._spec_t is None and eng._spec_burst_wall is None
    assert eng._spec_tps is not None     # acceptance DID update
    eng.step_spec_burst(2)               # warm: same shape
    assert eng._spec_t is not None and eng._spec_burst_wall is not None
    t_warm = eng._spec_t
    eng.step_spec_burst(3)               # new n: cold again
    assert eng._spec_t == t_warm         # wall discarded


def test_spec_sticky_probe_decline(model_and_params):
    """After a real probe measures the gate OFF, further probes stay
    blocked until the host-side estimate rises materially above the
    failed level (dead-zone traffic otherwise re-armed a
    burst-equivalent probe every cadence); admissions lift the block."""
    eng = _spec_engine(model_and_params, spec_adaptive=True)
    eng._spec_t, eng._plain_t = 0.002, 0.001   # cost ratio 2.0
    eng._spec_on = True
    eng._spec_est_tps = 2.1
    eng._spec_tps = 1.8                        # eff 0.9 -> OFF + block
    eng._spec_gate()
    assert eng._spec_on is False
    # The block records the MEASURED acceptance (fresh), not the host
    # estimate (possibly stale after a long ON stretch).
    assert eng._spec_est_block == 1.8
    # Same traffic level: estimator declines without touching the
    # cost-ratio path.
    eng._estimate_spec_tps = lambda **kw: 2.0
    assert not eng._estimate_says_go()
    # Materially higher traffic re-arms.
    eng._estimate_spec_tps = lambda **kw: 1.8 * 1.2
    assert eng._estimate_says_go()
    # Confirmed ON clears the block.
    eng._spec_tps = 4.0
    eng._spec_gate()
    assert eng._spec_on is True and eng._spec_est_block is None
