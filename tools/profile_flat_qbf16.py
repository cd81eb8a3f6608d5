"""Round-5 A/B: bf16-E flat kernel (q_bf16) and the group-32 widening
it unlocks under the tail write-buffer.

Round-4 history: g32/b64 beat g16/b64 by 26% at live 96 in the NO-tail
sweep but exceeded scoped VMEM with the tail buffer (17.76 M > 16 M,
f32 E). q_bf16 halves the E matrix + compact-q blocks (~3.6 MB), so
g32/b64+tail should now compile. All variants run in ONE process with
the chained-scan + value-fetch discipline (CLAUDE.md: cross-process
A/Bs on the tunnel are noise).

    python tools/profile_flat_qbf16.py [--batch 256 --lives 96,256]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--cap", type=int, default=512)
    ap.add_argument("--lives", type=str, default="96,256")
    ap.add_argument("--steps", type=int, default=64)
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
    from rten_tpu.kernels.attention import flash_decode_flat

    if args.tiny:
        args.batch, args.cap, args.lives = 8, 64, "16"
        args.steps, args.tail = 4, 8
    B, cap = args.batch, args.cap
    H = KVH = 12
    D = 64
    rng = np.random.RandomState(0)
    q0 = jnp.asarray(rng.randn(B, H, D).astype(np.float32))

    cache = KVCache.create(B, 1, KVH, cap, D, quantized=True,
                           tail_window=args.tail)

    def timed(name, fn, *inputs):
        jfn = jax.jit(fn)
        out = jfn(*inputs)
        jax.block_until_ready(out)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = jfn(*inputs)
            float(jnp.sum(out[0] if isinstance(out, tuple) else out))
            best = min(best or 9e9, time.perf_counter() - t0)
        print(f"{name:32s} {best / args.steps * 1e6:8.1f} us/call",
              flush=True)
        return best / args.steps

    for live in map(int, args.lives.split(",")):
        lens = jnp.full(B, live, jnp.int32)
        print(f"-- live {live} (batch {B}, cap {cap}, "
              f"tail {args.tail}) --")
        g_lo = next((g for g in (16, 8, 4, 2)
                     if B % g == 0 and B >= 2 * g), 0)
        g_hi = 2 * g_lo
        for name, group, qb in (
                (f"g{g_lo} f32-E (r4 default)", g_lo, False),
                (f"g{g_lo} bf16-E", g_lo, True),
                (f"g{g_hi} bf16-E", g_hi, True)):
            if not group or B % group or B < 2 * group:
                continue

            def bare(q0, kv, sc, tail, _g=group, _qb=qb):
                def body(q, _):
                    out = flash_decode_flat(
                        q, kv, lens + 1, KVH, block_k=args.block,
                        group=_g, kv_scales=sc, tail=tail,
                        tail_count=jnp.int32(args.tail), q_bf16=_qb)
                    q = jnp.where(out > 3e38, 1.0, q0)
                    return q, None
                q, _ = jax.lax.scan(body, q0, None, length=args.steps)
                return q

            try:
                timed(name, bare, q0, cache.kv[0],
                      cache.quant_scales[0], cache.tail[0])
            except Exception as e:
                print(f"{name:32s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
