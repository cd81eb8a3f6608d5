"""TinyLlama-class (GQA/RoPE/SwiGLU) decode-burst throughput: bf16 dense
vs int4 weight-only vs int8 (BASELINE config 5's kernel path).

Round-1 comparison point (8 layers, d=2048, 32q/4kv heads, batch 4):
dense 1710 tok/s, int4 1864 (1.09x). The int4 kernel was rewritten in
round 3 (whole-tile bf16 dequant, one MXU dot per K block).

Run on TPU:  python tools/profile_llama_int4.py [--layers 8 --batch 4]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--capacity", type=int, default=512)
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
        cfg = TransformerConfig.tiny_llama(
            vocab_size=256, n_layers=2, n_heads=4, kv_heads=2,
            d_model=256, d_ff=512, dtype="bfloat16")
        args.capacity = 128
    else:
        cfg = TransformerConfig.tiny_llama(n_layers=args.layers,
                                           dtype="bfloat16")
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    def burst(params, tokens, cache):
        def body(carry, _):
            tokens, cache = carry
            nxt, cache = model.decode_step_argmax(params, tokens, cache)
            return (nxt, cache), None

        (tokens, cache), _ = jax.lax.scan(body, (tokens, cache), None,
                                          length=args.steps)
        return tokens, cache

    fn = jax.jit(burst, donate_argnums=(2,))

    import os
    variants = [("bf16 dense", params),
                ("int4 bytes (legacy)",
                 quantize_weights(params, "int4", int4_packing="bytes")),
                ("int4 words bf16",
                 quantize_weights(params, "int4")),
                ("int8", quantize_weights(params, "int8"))]
    if os.environ.get("RTEN_INT4_DOT") == "int8":
        # The int8-dot A/B reuses the words params; the env var flips
        # the kernel's dot mode at trace time.
        variants[2] = ("int4 words int8dot", variants[2][1])
    for name, p in variants:
        cache = model.new_cache(args.batch, args.capacity)
        cache = cache.advance(64)
        tokens = jnp.zeros(args.batch, jnp.int32)
        t0 = time.perf_counter()
        toks, cache = fn(p, tokens, cache)
        jax.block_until_ready(toks)
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            toks, cache = fn(p, tokens, cache)
            jax.block_until_ready(toks)
            best = min(best or 9e9, time.perf_counter() - t0)
        print(f"{name}: {best / args.steps * 1e6:6.0f} us/step = "
              f"{args.batch * args.steps / best:6.0f} tok/s", flush=True)


if __name__ == "__main__":
    main()
