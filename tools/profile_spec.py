"""Speculative-decoding profile: GPT-2-class spec decode vs plain burst
on the real chip.

    python tools/profile_spec.py [--batch 8] [--steps 128] [--draft 3]

Prompt-lookup acceptance depends on text repetitiveness; this harness
reports both a repetitive prompt (high acceptance: structured/code-like
serving) and a random prompt (worst case). Tokens are identical to plain
greedy decoding by construction — the test suite asserts it; here we
only measure step-rate.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(engine_kwargs, model, params, prompts, max_new, burst):
    from rten_tpu.generate.engine import ServingEngine

    eng = ServingEngine(model, params, **engine_kwargs)
    # Warm on THROWAWAY requests (the rung warmup below consumes enough
    # steps to finish short requests), then time fresh submissions.
    warm = [eng.submit(p, max_new_tokens=10 ** 6) for p in prompts]
    eng._admit()
    # Warm the decode programs at the SAME static burst sizes the run
    # uses (a different (k, n) is a different compiled program). The
    # K ladder visits every draft length 1..K, so each rung's burst
    # must compile OUTSIDE the timed region — a mid-run rung compile
    # through the dev tunnel is ~a minute and was misread as a 50x
    # spec slowdown (round-4 note).
    if eng.spec_draft:
        k0 = eng._spec_k
        for k in range(1, eng.spec_draft + 1):
            eng._spec_k = k
            eng.step_spec_burst(burst)
            if eng.spec_adaptive and min(burst, 4) != burst:
                eng.step_spec_burst(min(burst, 4))
        eng._spec_k = k0
        if eng.spec_adaptive:
            # The gate may fall back to plain bursts mid-run.
            eng.step_burst(burst)
            # Warm the plain->spec ADJACENCY too (round-5 on-rig
            # finding: the first spec burst following a plain stretch
            # pays a one-time ~4 s runtime cost through the tunnel
            # even though the program itself was compiled above —
            # deterministic repro, cached per process afterwards;
            # without this the timed region charges the whole run for
            # a once-per-process event). Probes run full-size since
            # round 5, so the adjacency is warmed at burst size.
            eng.step_spec_burst(burst)
            eng.step_burst(burst)
    else:
        eng.step_burst(burst)
    for r in warm:
        eng.cancel(r)
    reqs = [eng.submit(p, max_new_tokens=max_new) for p in prompts]
    eng._admit()
    if eng.spec_draft:
        # Warmup calls include compile time; start the gate's cost EMAs
        # clean so the A/B reflects steady-state behavior.
        eng._plain_t = eng._spec_t = eng._spec_tps = None
        eng._spec_burst_wall = None
        eng._plain_wall_since_probe = 0.0
        eng._spec_on = True
        eng._spec_confirmed = False
        eng._spec_k = eng.spec_draft
    t0 = time.perf_counter()
    before = sum(len(r.tokens) for r in reqs)
    steps0 = eng.counters["decode_steps"]
    eng.run(burst=burst)
    emitted = sum(len(r.tokens) for r in reqs) - before
    dt = time.perf_counter() - t0
    steps = eng.counters["decode_steps"] - steps0
    extra = ""
    if eng.spec_draft:
        s = eng.stats()
        c = eng.counters
        extra = (f" spec_on={s.get('spec_on')}"
                 f" adaptive={s.get('spec_adaptive')}"
                 f" acc={s.get('spec_tokens_per_step')}"
                 f" sb={c.get('spec_bursts', 0)}"
                 f" ss={c.get('spec_steps', 0)}"
                 f" sw={c.get('spec_wall_s', 0.0):.2f}s"
                 f" est={s.get('spec_est_tps')}"
                 f" dt={dt:.2f}s")
    return emitted / dt, emitted, steps, extra


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--prompt-len", type=int, default=64)
    parser.add_argument("--steps", type=int, default=256)
    parser.add_argument("--draft", type=int, default=3)
    parser.add_argument("--ngram", type=int, default=3)
    parser.add_argument("--burst", type=int, default=16)
    parser.add_argument("--capacity", type=int, default=2048)
    parser.add_argument("--quantize", choices=["int8", "int4"],
                        default="int8")
    parser.add_argument("--always-ab", action="store_true",
                        help="also measure spec_adaptive=False "
                             "(always-draft) for the gating A/B")
    parser.add_argument("--auto", action="store_true",
                        help="also measure the DEFAULT spec_adaptive="
                             "'auto' config (dispatch-floor-resolved "
                             "at warmup; round 4)")
    parser.add_argument("--decode-attn", default="auto",
                        choices=["auto", "fused", "stream", "grouped"],
                        help="decode/verify attention kernel (A/B: 'fused'"
                             " = per-(seq, block) grid; 'auto'/'grouped' ="
                             " batched-group)")
    args = parser.parse_args()

    import jax
    import numpy as np

    from rten_tpu.models.transformer import (TransformerConfig,
                                             TransformerLM,
                                             quantize_weights)

    cfg = TransformerConfig.gpt2(decode_attn=args.decode_attn)
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    if args.quantize:
        params = quantize_weights(params, args.quantize)

    rng = np.random.RandomState(0)
    random_prompts = [list(rng.randint(0, cfg.vocab_size, args.prompt_len))
                      for _ in range(args.batch)]
    period = rng.randint(0, cfg.vocab_size, 8)
    repetitive_prompts = [
        list(np.tile(period, args.prompt_len // 8))[:args.prompt_len]
        for _ in range(args.batch)]

    base = dict(max_batch=args.batch, capacity=args.capacity,
                prefill_buckets=(args.prompt_len,),
                cache_dtype="bfloat16")
    for name, prompts in [("random", random_prompts),
                          ("repetitive", repetitive_prompts)]:
        tps, emitted, steps, _ = run(base, model, params, prompts,
                                     args.steps, args.burst)
        print(f"plain {name:<11}: {tps:8.0f} tok/s "
              f"({emitted} tokens / {steps} steps)", flush=True)
        plain_tps = tps
        for label, adaptive in (("spec-auto", "auto"), ("spec", True),
                                ("spec-always", False)):
            if adaptive == "auto" and not args.auto:
                continue
            if adaptive is not True and adaptive != "auto" \
                    and not args.always_ab:
                continue
            tps, emitted, steps, extra = run(
                {**base, "spec_draft": args.draft,
                 "spec_ngram": args.ngram, "spec_adaptive": adaptive},
                model, params, prompts, args.steps, args.burst)
            print(f"{label:<5} {name:<11}: {tps:8.0f} tok/s "
                  f"({emitted} tokens / {steps} steps, "
                  f"{emitted / max(steps, 1):.2f} tok/step,"
                  f"{extra} {tps / plain_tps:.2f}x plain)", flush=True)


if __name__ == "__main__":
    main()
