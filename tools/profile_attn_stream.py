"""Decode-attention kernel shootout on hardware: per-(sequence, block)
grid (flash_decode_fused) vs per-sequence streaming DMA loop
(flash_decode_stream), at serving shapes.

Timing: chained lax.scan with a data dependency (q += out * 1e-6), long
minus short run differenced to cancel the tunnel's fixed dispatch cost
(see BASELINE.md measurement notes).

    python tools/profile_attn_stream.py [--batch 64 --cap 512 --live 256]
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
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--sweep", default=None,
                    help="comma list of g:block grouped-kernel configs "
                         "(e.g. '8:64,16:32,32:32') replacing the "
                         "default variant set")
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

    from rten_tpu.kernels.attention import (flash_decode_fused,
                                            flash_decode_grouped,
                                            flash_decode_stream)

    b, h, kvh, d = args.batch, args.heads, args.kv_heads, args.head_dim
    cap, live = args.cap, args.live
    print(f"backend={jax.default_backend()} b={b} h={h}/{kvh} d={d} "
          f"cap={cap} live={live} {args.dtype}", flush=True)

    rng = np.random.RandomState(0)
    q0 = jnp.asarray(rng.randn(b, h, d).astype(np.float32))
    kv = jnp.asarray(rng.randn(b, cap, 2, kvh * d)).astype(
        jnp.dtype(args.dtype))
    lengths = jnp.full((b,), live, jnp.int32)

    # Traffic model: live rows × (K+V) × bytes per sequence per call.
    bytes_live = b * live * 2 * kvh * d * kv.dtype.itemsize

    def bench(name, fn, iters):
        # kv/lengths must be jit ARGUMENTS: a captured 100s-of-MB
        # constant is serialized into the remote-compile request
        # (HTTP 413 at batch 256 — see CLAUDE.md).
        def scan_fn(q, kv, lengths, n):
            def chain(q, _):
                out = fn(q, kv, lengths, kvh)
                return q + out.astype(q.dtype) * 1e-6, None
            return jax.lax.scan(chain, q, None, length=n)[0]

        jitted = jax.jit(scan_fn, static_argnums=(3,))

        def run(n):
            np.asarray(jitted(q0, kv, lengths, n))   # warm/compile
            t0 = time.perf_counter()
            # A VALUE FETCH is the only reliable sync on the tunnel
            # chip (block_until_ready returned in ~0 us for un-fetched
            # outputs — see CLAUDE.md timing notes); its fixed cost
            # cancels in the long-minus-short difference.
            np.asarray(jitted(q0, kv, lengths, n))
            return time.perf_counter() - t0

        run(iters)  # compile both lengths once
        run(3 * iters)
        t_short = min(run(iters) for _ in range(3))
        t_long = min(run(3 * iters) for _ in range(3))
        per_call = (t_long - t_short) / (2 * iters)
        gbs = bytes_live / per_call / 1e9
        print(f"{name:32s}: {per_call*1e6:7.1f} us/call  "
              f"{gbs:6.0f} GB/s effective", flush=True)
        return per_call

    if args.sweep:
        variants = []
        for spec in args.sweep.split(","):
            g, blk = (int(t) for t in spec.split(":"))
            variants.append(
                (f"grouped g={g} (block {blk})",
                 lambda q, kv, l, kvh, g=g, blk=blk: flash_decode_grouped(
                     q, kv, l, kvh, block_k=blk, group=g)))
        for name, fn in variants:
            try:
                bench(name, fn, args.iters)
            except Exception as exc:
                print(f"{name}: FAILED {type(exc).__name__}: "
                      f"{str(exc)[:200]}", flush=True)
        return

    variants = [
        ("fused grid (block 128)",
         lambda q, kv, l, kvh: flash_decode_fused(q, kv, l, kvh,
                                                  block_k=128)),
        ("grouped g=8 (block 128)",
         lambda q, kv, l, kvh: flash_decode_grouped(q, kv, l, kvh,
                                                    block_k=128, group=8)),
        ("grouped g=16 (block 128)",
         lambda q, kv, l, kvh: flash_decode_grouped(q, kv, l, kvh,
                                                    block_k=128, group=16)),
        ("grouped g=8 (block 64)",
         lambda q, kv, l, kvh: flash_decode_grouped(q, kv, l, kvh,
                                                    block_k=64, group=8)),
        ("grouped g=16 (block 64)",
         lambda q, kv, l, kvh: flash_decode_grouped(q, kv, l, kvh,
                                                    block_k=64, group=16)),
        ("grouped g=32 (block 128)",
         lambda q, kv, l, kvh: flash_decode_grouped(q, kv, l, kvh,
                                                    block_k=128, group=32)),
    ]
    for name, fn in variants:
        try:
            bench(name, fn, args.iters)
        except Exception as exc:
            print(f"{name}: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)


if __name__ == "__main__":
    main()
