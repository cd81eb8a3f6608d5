"""matmul_argmax_int8 kernel µbench: the fused LM-head+argmax pass at
serving shapes ([256, 768] × [768, 50257] int8). The batch-256 serving
ablation put the head tail at ~660 us vs a ~50-170 us roofline (weights
38.6 MB once + small epilogue) — this isolates the kernel and sweeps
its vocab-tile width (fewer, fatter programs vs VMEM pressure).

    python tools/profile_head_kernel.py [--m 256]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=256)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--v", type=int, default=50257)
    ap.add_argument("--iters", type=int, default=30)
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

    from rten_tpu.kernels import gemm as gk

    m, d, v = args.m, args.d, args.v
    print(f"backend={jax.default_backend()} m={m} d={d} v={v}",
          flush=True)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(m, d).astype(np.float32))
    w = jnp.asarray(rng.randint(-127, 128, (d, v)).astype(np.int8))
    ws = jnp.asarray((rng.rand(v).astype(np.float32) + 0.5) / 100)
    wbytes = d * v

    def bench(name, fn):
        def scan_fn(x, w, ws, n):
            def chain(x, _):
                idx = fn(x, w, ws)
                return x + (idx[:, None] % 3).astype(x.dtype) * 1e-6, None
            return jax.lax.scan(chain, x, None, length=n)[0]

        jitted = jax.jit(scan_fn, static_argnums=(3,))

        def run(n):
            np.asarray(jitted(x0, w, ws, n))
            t0 = time.perf_counter()
            np.asarray(jitted(x0, w, ws, n))
            return time.perf_counter() - t0

        it = args.iters
        run(it)
        run(3 * it)
        t_s = min(run(it) for _ in range(3))
        t_l = min(run(3 * it) for _ in range(3))
        per = (t_l - t_s) / (2 * it)
        print(f"{name:32s}: {per*1e6:7.1f} us/call  "
              f"{wbytes / per / 1e9:6.0f} GB/s weight stream", flush=True)

    bench("matmul_argmax_int8 (default bn)", gk.matmul_argmax_int8)
    # bn caps near 2048: the int8 tile + its bf16 copy at bn=4096 blow
    # the 16 MB VMEM scoped limit (measured: 20.7 M requested).
    for bn in (512, 1024, 2048):
        bench(f"matmul_argmax_int8 bn={bn}",
              lambda x, w, ws, bn=bn: gk.matmul_argmax_int8(
                  x, w, ws, block_n=bn))
    # Unfused reference: weight-only GEMM then argmax.
    bench("unfused int8 GEMM + argmax (default)",
          lambda x, w, ws: jnp.argmax(
              gk.matmul_int8_weight_only(x, w, ws), axis=-1
          ).astype(jnp.int32))
    for bn, bk in ((1024, 768), (2048, 768), (1024, 512)):
        bench(f"unfused int8 GEMM bn={bn} bk={bk} + argmax",
              lambda x, w, ws, bn=bn, bk=bk: jnp.argmax(
                  gk.matmul_int8_weight_only(
                      x, w, ws, block_n=bn, block_k=bk), axis=-1
              ).astype(jnp.int32))
    # Plain XLA bf16 dot + argmax (no Pallas).
    bench("xla bf16 dot + argmax",
          lambda x, w, ws: jnp.argmax(
              jnp.dot(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32) * ws[None, :],
              axis=-1).astype(jnp.int32))


if __name__ == "__main__":
    main()
