"""int8-cache decode-attention shootout on hardware: fused grid quant
kernel vs the new batched-group quant kernel, with the bf16 grouped
kernel as the float baseline (the number to beat — BASELINE.md round 3
found the int8 cache TRAILING bf16 because the VPU unpack sat on the
per-block dependent chain; grouping gives the scheduler G independent
chains to hide it).

Timing: chained lax.scan with a data dependency, long minus short run
differenced (see BASELINE.md measurement notes).

    python tools/profile_attn_quant.py [--batch 64 --cap 512 --live 256]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--kv-heads", type=int, default=12)
    ap.add_argument("--head-dim", type=int, default=64)
    ap.add_argument("--cap", type=int, default=512)
    ap.add_argument("--live", type=int, default=256)
    ap.add_argument("--iters", type=int, default=40)
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

    from rten_tpu.generate.kv_cache import (SCALE_LANES, VSCALE_OFF,
                                            pack_int8_cache)
    from rten_tpu.kernels.attention import (flash_decode_fused,
                                            flash_decode_grouped)

    b, h, kvh, d = args.batch, args.heads, args.kv_heads, args.head_dim
    cap, live = args.cap, args.live
    print(f"backend={jax.default_backend()} b={b} h={h}/{kvh} d={d} "
          f"cap={cap} live={live}", flush=True)

    rng = np.random.RandomState(0)
    q0 = jnp.asarray(rng.randn(b, h, d).astype(np.float32))
    kv_bf16 = jnp.asarray(rng.randn(b, cap, 2, kvh * d)).astype(
        jnp.bfloat16)
    k_q = rng.randint(-127, 128, (b, cap, kvh * d)).astype(np.int32)
    v_q = rng.randint(-127, 128, (b, cap, kvh * d)).astype(np.int32)
    kv_q = pack_int8_cache(jnp.asarray(k_q), jnp.asarray(v_q))
    sc = np.ones((b, cap, 1, SCALE_LANES), np.float32)
    sc[:, :, 0, :kvh] = 0.02
    sc[:, :, 0, VSCALE_OFF:VSCALE_OFF + kvh] = 0.03
    scales = jnp.asarray(sc)
    lengths = jnp.full((b,), live, jnp.int32)

    # Traffic model per call: live rows × bytes (packed kv: 1 B/elt for
    # K+V, + f32 scale rows; K+V bf16 for float).
    bytes_q = b * live * (2 * kvh * d + SCALE_LANES * 4)
    bytes_f = b * live * 2 * kvh * d * 2

    def bench(name, fn, nbytes, iters=args.iters):
        def chain(q, _):
            out = fn(q)
            return q + out.astype(q.dtype) * 1e-6, None

        def run(n):
            r = jax.jit(lambda q: jax.lax.scan(chain, q, None, length=n)[0])
            out = r(q0)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            jax.block_until_ready(r(q0))
            return time.perf_counter() - t0

        run(iters)
        run(3 * iters)
        t_short = min(run(iters) for _ in range(3))
        t_long = min(run(3 * iters) for _ in range(3))
        per_call = (t_long - t_short) / (2 * iters)
        gbs = nbytes / per_call / 1e9
        print(f"{name:36s}: {per_call*1e6:7.1f} us/call  "
              f"{gbs:6.0f} GB/s effective", flush=True)
        return per_call

    variants = [
        ("bf16 grouped g=8 (block 64)",
         lambda q: flash_decode_grouped(q, kv_bf16, lengths, kvh,
                                        block_k=64, group=8), bytes_f),
        ("bf16 grouped g=8 b64 native-dots",
         lambda q: flash_decode_grouped(q, kv_bf16, lengths, kvh,
                                        block_k=64, group=8,
                                        native_dots=True), bytes_f),
        ("bf16 grouped g=8 b128 native-dots",
         lambda q: flash_decode_grouped(q, kv_bf16, lengths, kvh,
                                        block_k=128, group=8,
                                        native_dots=True), bytes_f),
        ("bf16 grouped g=16 b64 native-dots",
         lambda q: flash_decode_grouped(q, kv_bf16, lengths, kvh,
                                        block_k=64, group=16,
                                        native_dots=True), bytes_f),
        ("int8 fused grid (block 128)",
         lambda q: flash_decode_fused(q, kv_q, lengths, kvh, block_k=128,
                                      kv_scales=scales), bytes_q),
        ("int8 grouped g=8 (block 64)",
         lambda q: flash_decode_grouped(q, kv_q, lengths, kvh, block_k=64,
                                        group=8, kv_scales=scales),
         bytes_q),
        ("int8 grouped g=8 (block 128)",
         lambda q: flash_decode_grouped(q, kv_q, lengths, kvh,
                                        block_k=128, group=8,
                                        kv_scales=scales), bytes_q),
        ("int8 grouped g=16 (block 64)",
         lambda q: flash_decode_grouped(q, kv_q, lengths, kvh, block_k=64,
                                        group=16, kv_scales=scales),
         bytes_q),
        ("int8 grouped g=16 (block 128)",
         lambda q: flash_decode_grouped(q, kv_q, lengths, kvh,
                                        block_k=128, group=16,
                                        kv_scales=scales), bytes_q),
        ("int8 grouped g=8 b64 int8-scores",
         lambda q: flash_decode_grouped(q, kv_q, lengths, kvh, block_k=64,
                                        group=8, kv_scales=scales,
                                        int8_scores=True), bytes_q),
        ("int8 grouped g=8 b128 int8-scores",
         lambda q: flash_decode_grouped(q, kv_q, lengths, kvh,
                                        block_k=128, group=8,
                                        kv_scales=scales,
                                        int8_scores=True), bytes_q),
        ("int8 grouped g=16 b64 int8-scores",
         lambda q: flash_decode_grouped(q, kv_q, lengths, kvh, block_k=64,
                                        group=16, kv_scales=scales,
                                        int8_scores=True), bytes_q),
    ]
    for name, fn, nbytes in variants:
        try:
            bench(name, fn, nbytes)
        except Exception as exc:
            print(f"{name}: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)


if __name__ == "__main__":
    main()
