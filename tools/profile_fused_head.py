"""A/B the fused LM-head+argmax kernel against the generic
logits→argmax decode tail on device (GPT-2-small, batch 8, int8 weights
+ bf16 KV cache — the bench serving config).

Run on TPU:  python tools/profile_fused_head.py
Run on CPU:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
                 python tools/profile_fused_head.py --tiny
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--steps", type=int, default=64)
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
        cfg = TransformerConfig.gpt2(vocab_size=512, n_layers=4, n_heads=4,
                                     d_model=128, d_ff=256, max_seq_len=128)
        batch, capacity = 4, 128
    else:
        cfg = TransformerConfig.gpt2()
        batch, capacity = 8, 512
    model = TransformerLM(cfg)
    params = quantize_weights(model.init_params(jax.random.PRNGKey(0)),
                              kind="int8")

    def make_burst(fused):
        def burst(params, tokens, cache):
            def body(carry, _):
                tokens, cache = carry
                if fused:
                    nxt, cache = model.decode_step_argmax(params, tokens,
                                                          cache)
                else:
                    logits, cache = model.decode_step(params, tokens, cache)
                    nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return (nxt, cache), nxt

            (tokens, cache), toks = jax.lax.scan(body, (tokens, cache),
                                                 None, length=args.steps)
            return toks, cache

        return jax.jit(burst, donate_argnums=(2,))

    for name, fused in [("generic", False), ("fused", True)]:
        cache = model.new_cache(batch, capacity, cache_dtype="bfloat16")
        cache = cache.advance(64)
        tokens = jnp.zeros(batch, jnp.int32)
        fn = make_burst(fused)
        t0 = time.perf_counter()
        toks, cache = fn(params, tokens, cache)
        jax.block_until_ready(toks)
        print(f"{name}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            toks, cache = fn(params, tokens, cache)
            jax.block_until_ready(toks)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        us = best / args.steps * 1e6
        print(f"{name}: {us:.0f} us/step "
              f"({batch * args.steps / best:.0f} tok/s)", flush=True)
        print(f"{name}: first tokens {[int(t) for t in toks[0][:4]]}",
              flush=True)


if __name__ == "__main__":
    main()
