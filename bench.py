"""Headline benchmark: GPT-2-class INT8 decode throughput (tokens/s/chip)
on the native serving engine, per BASELINE.json's primary metric.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is measured against the same-chip fp32 decode rate in the
same run (the reference publishes no numbers — BASELINE.md §consequence —
so the fp32 path on identical hardware is the controlled baseline; the
quantized path must beat it).
"""

import json
import sys
import time


def main():
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    # Persistent compilation cache: driver reruns skip the multi-minute
    # remote compiles. TPU only — the remote-compile helper populates the
    # same directory with XLA:CPU AOT artifacts whose machine features
    # may not match this host (SIGILL risk if loaded by the CPU backend).
    try:
        if jax.default_backend() == "tpu":
            cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                       "/tmp/rten_tpu_jax_cache")
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                              -1)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              0.5)
    except Exception:
        pass

    from rten_tpu.generate.engine import ServingEngine
    from rten_tpu.models.transformer import (TransformerConfig,
                                             TransformerLM,
                                             quantize_weights)

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # Saturated continuous batch: decode streams every weight once
        # per step regardless of batch, so tokens/s/chip rises with
        # occupancy until KV bandwidth binds (bare-burst sweep round 4:
        # 64 -> 31.4k, 128 -> 39.1k, 256 -> 42.6k tok/s). Batch 256
        # became viable once prefill_last stopped materializing the
        # [G, bucket, vocab] logits and the admission group cache was
        # sized to the bucket (round 5): 30.8k full-bench vs 29.5k at
        # batch 128, 6m15s warm (within the driver budget). Batched
        # admission prefills all same-bucket requests in ONE compiled
        # program, so the compile count stays bounded.
        cfg = TransformerConfig.gpt2()
        batch, prompt_len, decode_steps, capacity = 256, 64, 384, 512
    else:
        # CPU smoke configuration (fast local check only).
        cfg = TransformerConfig.tiny_test()
        batch, prompt_len, decode_steps, capacity = 4, 8, 16, 64

    # Tuning overrides (hardware experiments; defaults above are the
    # recorded serving config).
    batch = int(os.environ.get("RTEN_BENCH_BATCH", batch))
    decode_steps = int(os.environ.get("RTEN_BENCH_STEPS", decode_steps))
    if os.environ.get("RTEN_BENCH_DTYPE"):
        cfg = cfg.__class__(**{**cfg.__dict__,
                               "dtype": os.environ["RTEN_BENCH_DTYPE"]})
    if os.environ.get("RTEN_BENCH_FUSED_APPEND"):
        cfg = cfg.__class__(**{**cfg.__dict__, "fused_append": True})

    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    prompts = [list(rng.randint(0, cfg.vocab_size, prompt_len))
               for _ in range(batch)]

    # Bursts amortize tunnel/dispatch latency on TPU; on CPU (smoke mode)
    # scan-unrolled interpret-mode kernels make bursts trace-slow.
    burst = int(os.environ.get("RTEN_BENCH_BURST", 128 if on_tpu else 1))
    if decode_steps <= burst:
        # The compile-warmup burst must not exhaust max_new_tokens, or
        # the measured run() emits zero tokens (div-by-zero).
        burst = max(1, decode_steps // 3)

    tail_env = os.environ.get("RTEN_BENCH_TAIL")

    def measure(p, cache_dtype=None, quantized_cache=False, repeats=1):
        """Median decode rate over ``repeats`` runs on ONE engine.

        All compiled programs (prefill buckets, decode bursts) are warm
        after the first repeat, so each extra repeat costs only real
        prefill + decode time (~tens of seconds) — the round-2 verdict
        flagged the single-shot record as fragile against tunnel
        variance (builder 36.5k vs driver-captured 33.4k)."""
        eng = ServingEngine(model, p, max_batch=batch, capacity=capacity,
                            prefill_buckets=(prompt_len,),
                            cache_dtype=cache_dtype,
                            quantized_cache=quantized_cache,
                            tail_window=(int(tail_env)
                                         if tail_env and quantized_cache
                                         else None))
        rates, ttfts_all = [], None  # rates stays CHRONOLOGICAL
        for rep in range(repeats):
            reqs = [eng.submit(pr, max_new_tokens=decode_steps)
                    for pr in prompts]
            eng._admit()
            if rep == 0:
                eng.step_burst(burst)  # compile decode burst
            t0 = time.perf_counter()
            before = sum(len(r.tokens) for r in reqs)
            # Sequential burst loop (pipeline=False): the dev tunnel
            # serializes dispatches on non-ready inputs — see engine.run.
            eng.run(burst=burst)
            emitted = sum(len(r.tokens) for r in reqs) - before
            elapsed = time.perf_counter() - t0
            rates.append(emitted / elapsed)
            ttfts = sorted(r.metrics.ttft_s for r in reqs
                           if r.metrics.ttft_s is not None)
            # TTFT from the warm repeats only: repeat 0's admission
            # overlaps burst compilation, which a steady-state server
            # would not re-pay.
            if ttfts and (ttfts_all is None or rep > 0):
                ttfts_all = ttfts
        # Discard the chronological FIRST repeat before the median
        # (round-4 verdict item 5): both BENCH_r04 spreads (10.4% /
        # 15.4%) were dominated by a visibly cold first repeat —
        # repeat 0 runs right after burst compilation and the tunnel's
        # program-upload churn. Median the remaining warm repeats.
        discard = repeats > 2
        warm = rates[1:] if discard else rates
        if repeats > 1:
            lo, hi = min(warm), max(warm)
            print(f"decode rate repeats: "
                  f"{', '.join(f'{r:.0f}' for r in rates)} tok/s "
                  f"({'first discarded; warm' if discard else 'all'} "
                  f"spread {100 * (hi - lo) / lo:.1f}%)",
                  file=sys.stderr)
        warm = sorted(warm)
        p50_ttft = ttfts_all[len(ttfts_all) // 2] if ttfts_all else None
        return warm[len(warm) // 2], p50_ttft

    # Symmetric baseline rigor (round-3 verdict item 4): the f32
    # denominator gets the SAME median-of-N warm repeats as the int8
    # numerator — a single-shot f32 rate put up to ±15% of tunnel noise
    # into vs_baseline, and its TTFT line was cold-compile semantics
    # printed beside a warm int8 number.
    # 4 repeats / median of the warm 3 (repeat 0 discarded): tightens
    # the driver metric against the cold-first-repeat spread at the
    # cost of ~2 extra measured repeats (~6m15s warm at 3+3 left ~4 min
    # of the driver's 10-minute budget).
    reps = int(os.environ.get("RTEN_BENCH_REPEATS", 4)) if on_tpu else 1
    f32_tps, f32_ttft = measure(params, repeats=reps)
    if not on_tpu:
        # CPU smoke: interpret-mode Pallas in a scanned decode is
        # trace-bound; report the f32 number only.
        metric, value, vs = "gpt2_f32_decode_tokens_s_chip", f32_tps, 1.0
    else:
        try:
            # The int8 serving config: int8 weights (Pallas 1 B/elt GEMM
            # for large weights incl. the LM head, loop-hoisted bf16 for
            # small ones) + the token-packed int8 KV cache (default
            # since round 6: the merged scale-expansion dot made the
            # grouped quant kernel 21% faster than bf16 at batch 256 —
            # 36.5k vs 31.0k tok/s end-to-end — at half the KV memory).
            # RTEN_BENCH_CACHE=bf16 falls back to the bf16 cache.
            qcache = os.environ.get("RTEN_BENCH_CACHE", "int8") == "int8"
            int8_tps, int8_ttft = measure(
                quantize_weights(params, "int8"),
                cache_dtype=None if qcache else "bfloat16",
                quantized_cache=qcache, repeats=reps)
            metric = "gpt2_int8_decode_tokens_s_chip"
            value = int8_tps
            vs = int8_tps / f32_tps
            print(f"f32 median {f32_tps:.0f} tok/s over {reps} warm "
                  f"repeats", file=sys.stderr)
            if int8_ttft is not None:
                print(f"warm p50 TTFT: {1000 * int8_ttft:.1f} ms int8, "
                      f"{1000 * (f32_ttft or 0):.1f} ms f32",
                      file=sys.stderr)
        except Exception as exc:  # pragma: no cover - kernel fallback
            print(f"int8 path failed ({exc}); reporting fp32",
                  file=sys.stderr)
            metric = "gpt2_f32_decode_tokens_s_chip"
            value = f32_tps
            vs = 1.0

    print(json.dumps({
        "metric": metric,
        "value": round(value, 2),
        "unit": "tokens/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
