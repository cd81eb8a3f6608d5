"""Decode throughput vs batch size (int8 weights + bf16 KV cache,
GPT-2-small): decode is weight-stream-bound, so tokens/s should scale
near-linearly with batch until KV-cache bandwidth or VMEM pressure takes
over. Informs the bench.py serving config (tokens/s/chip at saturation).

Run on TPU:  python tools/profile_batch_sweep.py --batches 8,32,64
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,16,32,64")
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--capacity", type=int, default=512)
    ap.add_argument("--prefill", type=int, default=64,
                    help="simulated pre-burst depth (attention span)")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

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

    from rten_tpu.models.transformer import (TransformerConfig,
                                             TransformerLM,
                                             quantize_weights)

    print(f"backend={jax.default_backend()}", flush=True)
    if args.tiny:
        cfg = TransformerConfig.gpt2(vocab_size=512, n_layers=2, n_heads=4,
                                     d_model=128, d_ff=256, max_seq_len=128)
        args.capacity = min(args.capacity, 128)
    else:
        cfg = TransformerConfig.gpt2()
    model = TransformerLM(cfg)
    params = quantize_weights(model.init_params(jax.random.PRNGKey(0)),
                              kind="int8")

    def make_burst():
        def burst(params, tokens, cache):
            def body(carry, _):
                tokens, cache = carry
                nxt, cache = model.decode_step_argmax(params, tokens, cache)
                return (nxt, cache), None

            (tokens, cache), _ = jax.lax.scan(body, (tokens, cache), None,
                                              length=args.steps)
            return tokens, cache

        return jax.jit(burst, donate_argnums=(2,))

    for batch in [int(b) for b in args.batches.split(",")]:
        cache = model.new_cache(batch, args.capacity,
                                cache_dtype="bfloat16")
        cache = cache.advance(args.prefill)
        tokens = jnp.zeros(batch, jnp.int32)
        fn = make_burst()
        t0 = time.perf_counter()
        toks, cache = fn(params, tokens, cache)
        jax.block_until_ready(toks)
        print(f"batch {batch}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            toks, cache = fn(params, tokens, cache)
            jax.block_until_ready(toks)
            best = min(best or 9e9, time.perf_counter() - t0)
        us = best / args.steps * 1e6
        print(f"batch {batch}: {us:.0f} us/step = "
              f"{batch * args.steps / best:.0f} tok/s", flush=True)


if __name__ == "__main__":
    main()
