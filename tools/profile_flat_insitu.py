"""Bisect the in-situ vs standalone flat-decode-attention gap (round-4
verdict item 1).

The round-3 standalone flat kernel measured ~89 us/call at batch 256 /
live 128 (g16/b64, packed scales), but the round-4 in-situ serving
decomposition (tools/profile_decode.py --serving-tail) charges
attention ~248 us/layer at the same shapes. This harness times, with
the SAME chained-scan + value-fetch discipline, solo on the chip:

  A "bare"      — flash_decode_flat on resident pre-shaped operands
                  (chained through a non-foldable dependency);
  B "wrapped"   — one serving layer's worth of integration around it:
                  fused qkv projection -> slice/reshape -> tail append
                  -> kernel -> out reshape -> wo projection, cache
                  threaded through the scan exactly like the engine;
  C "wrapped-nokernel" — B with the kernel replaced by a q slice
                  (integration glue + projections only).

B - C - A ~= layout/copy overhead XLA inserts around the kernel call
in situ. Also A/Bs the dyn_q select-chain elimination
(RTEN_FLAT_NO_DYNQ=1 restores the old chains) and block/group configs.

    python tools/profile_flat_insitu.py [--batch 256 --live 96]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--cap", type=int, default=512)
    ap.add_argument("--live", type=int, default=96)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--group", type=int, default=16)
    ap.add_argument("--block", type=int, default=64)
    ap.add_argument("--tail", type=int, default=16)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
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

    from rten_tpu.generate.kv_cache import KVCache
    from rten_tpu.models.transformer import (TransformerConfig,
                                             TransformerLM,
                                             quantize_weights)

    if args.tiny:
        args.batch, args.cap, args.live, args.steps = 8, 64, 16, 4
        args.group, args.tail = 2, 8
    B, cap, live = args.batch, args.cap, args.live
    H = KVH = 12
    D = 64
    dmodel = H * D
    cfg = TransformerConfig.gpt2()
    model = TransformerLM(cfg)
    rng = np.random.RandomState(0)

    cache = KVCache.create(B, 1, KVH, cap, D, quantized=True,
                           tail_window=args.tail)
    cache = cache.with_lengths(jnp.full(B, live, jnp.int32))
    # Pre-fill the packed region with plausible data (values don't
    # matter for timing; zeros would let Mosaic... nothing, actually —
    # but keep it honest).
    q0 = jnp.asarray(rng.randn(B, H, D).astype(np.float32))

    from rten_tpu.kernels.attention import flash_decode_flat

    def timed(name, fn, *inputs):
        jfn = jax.jit(fn)
        out = jfn(*inputs)
        jax.block_until_ready(out)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = jfn(*inputs)
            # Value fetch — the only trustworthy sync on this link.
            float(jnp.sum(out[0] if isinstance(out, tuple) else out))
            best = min(best or 9e9, time.perf_counter() - t0)
        print(f"{name:24s} {best / args.steps * 1e6:8.1f} us/step",
              flush=True)
        return best / args.steps

    # A. bare kernel, chained scan.
    def bare(q0, kv, sc, tail):
        def body(q, _):
            out = flash_decode_flat(q, kv, cache.lengths + 1, KVH,
                                    block_k=args.block, group=args.group,
                                    kv_scales=sc, tail=tail,
                                    tail_count=jnp.int32(args.tail))
            q = jnp.where(out > 3e38, 1.0, q0)   # non-foldable chain
            return q, None
        q, _ = jax.lax.scan(body, q0, None, length=args.steps)
        return q

    timed("A bare kernel", bare, q0, cache.kv[0], cache.quant_scales[0],
          cache.tail[0])

    # B/C. one wrapped serving layer (projection + append + kernel +
    # out-projection), cache threaded like the engine.
    params = quantize_weights({
        "layers": [{
            "wqkv": rng.randn(dmodel, 3 * dmodel).astype(np.float32) * .02,
            "wo": rng.randn(dmodel, dmodel).astype(np.float32) * .02,
        }],
    }, "int8")
    layer = params["layers"][0]

    def wrapped(x0, cache, use_kernel):
        from rten_tpu.models.transformer import _pallas_decode_attn, linear

        def body(carry, _):
            x, c = carry
            qkv = linear(x, layer["wqkv"])
            q = qkv[:, :dmodel].reshape(B, H, D)
            k = qkv[:, dmodel:2 * dmodel].reshape(B, KVH, 1, D)
            v = qkv[:, 2 * dmodel:].reshape(B, KVH, 1, D)
            c = c.append(0, k, v)
            if use_kernel:
                out = _pallas_decode_attn(cfg, q, c, 0, KVH)
            else:
                out = q
            x = linear(out.reshape(B, dmodel), layer["wo"]).astype(x.dtype)
            c = c.advance(1)
            return (x, c), None

        # flush every `tail` steps like the engine burst
        chunks = args.steps // args.tail

        def chunk(carry, _):
            carry, _ = jax.lax.scan(body, carry, None, length=args.tail)
            x, c = carry
            return (x, c.flush_tail(args.tail)), None

        (x, c), _ = jax.lax.scan(chunk, (x0, cache), None, length=chunks)
        return x

    x0 = jnp.asarray(rng.randn(B, dmodel).astype(np.float32))
    cache_b = KVCache.create(B, 1, KVH, cap, D, quantized=True,
                             tail_window=args.tail)
    cache_b = cache_b.with_lengths(jnp.full(B, live, jnp.int32))
    timed("B wrapped layer", lambda x, c: wrapped(x, c, True), x0, cache_b)
    cache_c = KVCache.create(B, 1, KVH, cap, D, quantized=True,
                             tail_window=args.tail)
    cache_c = cache_c.with_lengths(jnp.full(B, live, jnp.int32))
    timed("C wrapped no-kernel", lambda x, c: wrapped(x, c, False), x0,
          cache_c)


if __name__ == "__main__":
    main()
