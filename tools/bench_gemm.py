"""GEMM throughput harness — the reference's bench shape set
(src/gemm.rs:1779-1906: 512³, 1024³, wide/tall, gemv) plus the quantized
kernels, reporting GFLOPS and roofline fraction per chip.

    python tools/bench_gemm.py [--dtype f32|bf16|int8|int4] [--iters 20]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

# Reference shape set (m, n, k).
SHAPES = [
    (512, 512, 512),
    (1024, 1024, 1024),
    (128, 2048, 512),
    (2048, 128, 512),
    (1, 4096, 512),
    (4096, 4096, 4096),
]

# v5e peak: 197 TFLOP/s bf16, 394 TOP/s int8; f32 ≈ bf16/3 (bf16x3 passes).
PEAK_TFLOPS = {"bf16": 197.0, "int8": 394.0, "f32": 65.7, "int4": 197.0}


def bench(fn, args, iters):
    """Per-iteration time of the op, net of fixed per-call latency.

    ``iters`` and ``3*iters`` chained invocations run inside single jitted
    fori_loops (the loop index perturbs the first operand so XLA cannot
    hoist or dedupe the matmul); differencing the two wall times removes
    the constant dispatch/tunnel cost, leaving pure device time."""
    import functools

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=(0,))
    def loop(n, a, *rest):
        def body(i, acc):
            ai = a + (i % 2).astype(a.dtype)   # loop-variant: no hoisting
            out = fn(ai, *rest)
            return acc + jnp.sum(out).astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    def timed(n):
        float(loop(n, *args))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(n, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    # Grow the iteration count until the differenced compute time clears
    # the per-call jitter (~ms through a remote tunnel) by a wide margin.
    n = iters
    for _ in range(5):
        t1 = timed(n)
        t3 = timed(3 * n)
        delta = t3 - t1
        if delta > 0.1:  # ≥100 ms of pure compute: jitter-immune
            break
        n *= 8
    return max(delta / (2 * n), 1e-9)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dtype", default="bf16",
                        choices=["f32", "bf16", "int8", "int4"])
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from rten_tpu.kernels import gemm as gk
    from rten_tpu.kernels import quant as qt

    rng = np.random.RandomState(0)
    backend = jax.default_backend()
    print(f"backend: {backend}; dtype: {args.dtype}")
    peak = PEAK_TFLOPS[args.dtype] if backend == "tpu" else None

    for m, n, k in SHAPES:
        flops = 2 * m * n * k
        if args.dtype in ("f32", "bf16"):
            dt = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
            a = jnp.asarray(rng.randn(m, k), dt)
            b = jnp.asarray(rng.randn(k, n), dt)
            f, fargs = jax.jit(lambda x, y: x @ y), (a, b)
        elif args.dtype == "int8":
            a = jnp.asarray(rng.randint(-127, 128, (m, k)), jnp.int8)
            b = jnp.asarray(rng.randint(-127, 128, (k, n)), jnp.int8)
            scales = jnp.ones(n, jnp.float32)
            f = lambda x, y: gk.matmul_int8(x, y, 1.0, scales)  # noqa: E731
            fargs = (a, b)
        else:
            kp = (k + 127) // 128 * 128
            np_pad = (n + 255) // 256 * 256
            w = rng.randn(kp, np_pad).astype(np.float32)
            packed, scales = qt.quantize_int4_groupwise(w, group=128)
            a = jnp.asarray(rng.randn(m, kp), jnp.float32)
            pj, sj = jnp.asarray(packed), jnp.asarray(scales)
            f = lambda x, p_, s_: gk.matmul_int4(x, p_, s_, group=128)  # noqa: E731
            fargs = (a, pj, sj)
        secs = bench(f, fargs, args.iters)
        gflops = flops / secs / 1e9
        line = f"  {m:5d}x{n:5d}x{k:5d}: {secs * 1e6:9.1f} us  {gflops:9.1f} GFLOPS"
        if peak:
            line += f"  ({100 * gflops / (peak * 1e3):5.1f}% of peak)"
        print(line)


if __name__ == "__main__":
    main()
