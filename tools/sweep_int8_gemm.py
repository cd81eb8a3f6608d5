"""Block-size sweep for the int8 Pallas GEMM at large shapes.

Round-1 finding: 1024³ hits 81% of int8 peak but 4096³ only 38% — the
512×1024 output tiles re-stream x 4× and w 8×. The sweep reuses
bench_gemm's differenced chained-fori_loop timing (plain
``block_until_ready`` does NOT synchronize through the dev tunnel —
numbers without a value fetch are meaningless).

Run on TPU:  python tools/sweep_int8_gemm.py [--mnk 4096,4096,4096]
"""

from __future__ import annotations

import argparse
import functools
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mnk", default="4096,4096,4096")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    m, n, k = (int(x) for x in args.mnk.split(","))

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

    from tools.bench_gemm import PEAK_TFLOPS, bench
    from rten_tpu.kernels.gemm import matmul_int8_pallas as matmul_int8

    print(f"backend={jax.default_backend()} shape {m}x{n}x{k}", flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(-127, 128, (m, k)), jnp.int8)
    w = jnp.asarray(rng.randint(-127, 128, (k, n)), jnp.int8)
    ws = jnp.ones(n, jnp.float32)

    configs = [
        (512, 1024, 512),     # current default
        (512, 1024, 1024),
        (512, 1024, 2048),
        (1024, 1024, 512),
        (256, 2048, 512),
        (1024, 512, 1024),
        (512, 512, 1024),
        (512, 2048, 512),
    ]
    flops = 2.0 * m * n * k
    peak = PEAK_TFLOPS["int8"]
    for bm, bn, bk in configs:
        fn = functools.partial(matmul_int8, block_m=bm, block_n=bn,
                               block_k=bk)
        try:
            sec = bench(lambda a, b: fn(a, b, 1.0, ws), (x, w), args.iters)
            tops = flops / sec / 1e12
            print(f"bm={bm:5d} bn={bn:5d} bk={bk:5d}: {sec * 1e6:8.0f} us"
                  f" = {tops:6.1f} TOPS ({100 * tops / peak:4.1f}% peak)",
                  flush=True)
        except Exception as e:
            print(f"bm={bm:5d} bn={bn:5d} bk={bk:5d}: FAILED "
                  f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
