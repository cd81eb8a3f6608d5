"""Long-context serving A/B through the full ServingEngine on hardware:
2048-token prompts, capacity 4096, decode 256 tokens at live 2048→2304
(GPT-2-small, int8 weights) — bf16 vs token-packed int8 KV cache.

Validates the capacity-keyed kernel selection (block 128, g=8,
int8-scores for quant caches) end to end; BASELINE.md round 5 measured
bf16 5673 / int8 5441 tok/s here, before the merged scale dot.

    python tools/bench_longctx.py [--batch 16 --new 256]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--prompt", type=int, default=2048)
    ap.add_argument("--cap", type=int, default=4096)
    ap.add_argument("--new", type=int, default=256)
    ap.add_argument("--burst", type=int, default=64)
    ap.add_argument("--decode-attn", default="auto",
                    choices=["auto", "grouped", "flat"],
                    help="long-context kernel A/B: 'flat' forces the "
                         "single-program kernel at cap >= 2048 (g8/"
                         "b128 fits VMEM with packed scales: buf 6.3M "
                         "+ E 3.1M + acc 0.4M + sbuf 0.5M ~= 10.9M)")
    args = ap.parse_args()

    import jax
    import numpy as np

    try:
        if jax.default_backend() == "tpu":
            jax.config.update("jax_compilation_cache_dir",
                              "/tmp/rten_tpu_jax_cache")
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

    cfg = TransformerConfig.gpt2(max_seq_len=args.cap,
                                 decode_attn=args.decode_attn)
    model = TransformerLM(cfg)
    params = quantize_weights(
        model.init_params(jax.random.PRNGKey(0)), "int8")
    rng = np.random.RandomState(0)
    prompts = [list(rng.randint(0, cfg.vocab_size, args.prompt))
               for _ in range(args.batch)]
    print(f"backend={jax.default_backend()} batch={args.batch} "
          f"prompt={args.prompt} cap={args.cap} new={args.new}",
          flush=True)

    # Same-process kernel A/B (cross-process A/Bs through the tunnel
    # are noise): the int8 cache runs the grouped kernel, the flat
    # kernel (bf16-E g8/b128 fits VMEM — round 5), and flat + the tail
    # write-buffer (round-5 verdict item 2: the cap >= 2048 gate lifts
    # when the modeled flat_vmem_bytes fit holds).
    grouped_model = TransformerLM(TransformerConfig.gpt2(
        max_seq_len=args.cap, decode_attn="grouped"))
    flat_model = TransformerLM(TransformerConfig.gpt2(
        max_seq_len=args.cap, decode_attn="flat"))
    variants = [
        ("bf16 cache", model, dict(cache_dtype="bfloat16")),
        ("int8 cache (grouped)", grouped_model,
         dict(quantized_cache=True, tail_window=0)),
        ("int8 cache (flat)", flat_model,
         dict(quantized_cache=True, tail_window=0)),
        ("int8 cache (flat + tail)", flat_model,
         dict(quantized_cache=True)),
    ]
    if args.decode_attn != "auto":
        variants = [(n, m, kw) for n, m, kw in variants
                    if args.decode_attn in n or "bf16" in n]
    for name, m_v, kw in variants:
        eng = ServingEngine(m_v, params, max_batch=args.batch,
                            capacity=args.cap,
                            prefill_buckets=(args.prompt,), **kw)
        reqs = [eng.submit(p, max_new_tokens=args.new) for p in prompts]
        eng._admit()
        eng.step_burst(args.burst)      # compile the decode burst
        before = sum(len(r.tokens) for r in reqs)
        t0 = time.perf_counter()
        eng.run(burst=args.burst)
        dt = time.perf_counter() - t0
        emitted = sum(len(r.tokens) for r in reqs) - before
        print(f"{name}: {emitted / dt:8.0f} tok/s/chip "
              f"({emitted} tokens in {dt:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
