"""int8-cache decode-attention shootout on hardware: the token-packed
grouped quant kernel (merged scale-expansion dot + bf16 scale rows) vs
the bf16 grouped kernel (the float number to beat).

Timing: chained lax.scan with a data dependency, long minus short run
differenced; a VALUE FETCH syncs each run (block_until_ready is
unreliable on the tunnel chip — CLAUDE.md). Caches ride as jit
ARGUMENTS (captured constants blow the remote-compile size cap).

    python tools/profile_attn_quant.py [--batch 256 --cap 512 --live 256]
    python tools/profile_attn_quant.py --sweep "f:8:64,q:16:64,qf32:16:64"
      (variant spec: kind:group:block; kind = f | q | qs | qf32 | pv)
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
    ap.add_argument("--sweep", default=None,
                    help="comma list of kind:group:block variants "
                         "(kind: f=bf16, q=int8 bf16-scales, "
                         "qf32=int8 f32-scales, qs=int8-scores, "
                         "pv=pv_int8)")
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
                                            pack_bf16_rows,
                                            pack_int8_cache)
    from rten_tpu.kernels.attention import flash_decode_grouped

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
    scales_f32 = jnp.asarray(sc)
    # The cache's storage format: two tokens' bf16 scales per int32 word.
    scales = pack_bf16_rows(scales_f32.swapaxes(1, 2)).swapaxes(1, 2)
    lengths = jnp.full((b,), live, jnp.int32)

    # Traffic model per call: live rows × bytes (packed kv: 1 B/elt for
    # K+V, + scale rows at their storage width; K+V bf16 for float).
    def bytes_quant(sdtype_size):
        return b * live * (2 * kvh * d + SCALE_LANES * sdtype_size)

    bytes_f = b * live * 2 * kvh * d * 2

    def bench(name, fn, kv, scl, nbytes, iters=args.iters):
        def scan_fn(q, kv, scl, lens, n):
            def chain(q, _):
                out = fn(q, kv, scl, lens)
                return q + out.astype(q.dtype) * 1e-6, None
            return jax.lax.scan(chain, q, None, length=n)[0]

        jitted = jax.jit(scan_fn, static_argnums=(4,))

        def run(n):
            np.asarray(jitted(q0, kv, scl, lengths, n))  # warm
            t0 = time.perf_counter()
            np.asarray(jitted(q0, kv, scl, lengths, n))  # fetch = sync
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

    def variant(kind, g, blk):
        from rten_tpu.kernels.attention import flash_decode_flat
        if kind == "f":
            return (f"bf16 grouped g={g} b{blk}",
                    lambda q, kv, s, l: flash_decode_grouped(
                        q, kv, l, kvh, block_k=blk, group=g),
                    kv_bf16, None, bytes_f)
        if kind == "ff":
            return (f"bf16 FLAT g={g} b{blk}",
                    lambda q, kv, s, l: flash_decode_flat(
                        q, kv, l, kvh, block_k=blk, group=g),
                    kv_bf16, None, bytes_f)
        if kind == "qqo":
            # Same-process dyn-q A/B: the OLD static select chains via
            # env, with a trace-forcing scale nudge (the inner jit would
            # otherwise reuse the dyn trace; 1e-12 relative on the
            # softmax scale is far below measurement noise).
            import math as _m
            import os as _os
            nbytes = bytes_quant(2)

            def old_chains(q, kv, s, l):
                _os.environ["RTEN_FLAT_NO_DYNQ"] = "1"
                try:
                    return flash_decode_flat(
                        q, kv, l, kvh, block_k=blk, group=g,
                        kv_scales=s,
                        scale=(1.0 / _m.sqrt(d)) * (1 + 1e-12))
                finally:
                    _os.environ.pop("RTEN_FLAT_NO_DYNQ", None)

            return (f"int8 FLAT g={g} b{blk} OLD-chains", old_chains,
                    kv_q, scales, nbytes)
        if kind == "qqm":
            # q-DMA-stream A/B (trace-forced like qqo).
            import math as _m
            nbytes = bytes_quant(2)

            def qstream(q, kv, s, l):
                return flash_decode_flat(
                    q, kv, l, kvh, block_k=blk, group=g, kv_scales=s,
                    q_stream=True,
                    scale=(1.0 / _m.sqrt(d)) * (1 + 3e-12))

            return (f"int8 FLAT g={g} b{blk} Q-STREAM", qstream, kv_q,
                    scales, nbytes)
        if kind == "qqr":
            # Round-0 fold A/B (trace-forced like qqo).
            import math as _m
            nbytes = bytes_quant(2)

            def r0(q, kv, s, l):
                return flash_decode_flat(
                    q, kv, l, kvh, block_k=blk, group=g, kv_scales=s,
                    r0_fold=True,
                    scale=(1.0 / _m.sqrt(d)) * (1 + 2e-12))

            return (f"int8 FLAT g={g} b{blk} R0-FOLD", r0, kv_q,
                    scales, nbytes)
        if kind in ("qq", "qqs", "qqf32"):
            sarr = scales_f32 if kind == "qqf32" else scales
            nbytes = bytes_quant(2 if sarr.dtype == jnp.int32 else 4)
            fl = {"int8_scores": True} if kind == "qqs" else {}
            sn = ("f32-scales" if kind == "qqf32" else "packed-scales")
            return (f"int8 FLAT g={g} b{blk} {sn}"
                    + (" int8-scores" if fl else ""),
                    lambda q, kv, s, l: flash_decode_flat(
                        q, kv, l, kvh, block_k=blk, group=g,
                        kv_scales=s, **fl),
                    kv_q, sarr, nbytes)
        flags = {}
        sarr = scales
        sname = ("packed-scales" if sarr.dtype == jnp.int32
                 else f"{jnp.dtype(sarr.dtype).name}-scales")
        nbytes = bytes_quant(2 if sarr.dtype == jnp.int32 else
                             sarr.dtype.itemsize)
        if kind == "qf32":
            sarr, sname, nbytes = scales_f32, "f32-scales", bytes_quant(4)
        elif kind == "qs":
            flags, sname = {"int8_scores": True}, f"int8-scores {sname}"
        elif kind == "pv":
            flags, sname = {"pv_int8": True}, "pv-int8"
        return (f"int8 grouped g={g} b{blk} {sname}",
                lambda q, kv, s, l: flash_decode_grouped(
                    q, kv, l, kvh, block_k=blk, group=g, kv_scales=s,
                    **flags),
                kv_q, sarr, nbytes)

    specs = (args.sweep.split(",") if args.sweep else
             ["f:8:64", "q:8:64", "q:16:64", "qf32:16:64", "q:16:128",
              "qs:8:64"])
    for spec in specs:
        kind, g, blk = spec.split(":")
        name, fn, kv, scl, nbytes = variant(kind, int(g), int(blk))
        try:
            bench(name, fn, kv, scl, nbytes)
        except Exception as exc:
            print(f"{name}: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)


if __name__ == "__main__":
    main()
