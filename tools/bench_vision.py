"""Vision-config re-measurement (round-4 verdict item 5): ResNet-50 /
MobileNetV3 / DETR int8-QDQ `.rten` graphs at saturating batch, with a
ConvInteger A/B — the int32-widened conv path vs XLA's native
low-precision conv (RTEN_CONVINT_NATIVE=1, ops/quantized.py) — applied
the way the int8 GEMM was A/B'd (kernels/gemm.py:70-80 pattern).

    python tools/bench_vision.py [--models resnet,mobilenet,detr]
        [--batch 64] [--iters 5] [--f32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, ".")


def build_model(name, quantize):
    import jax

    from rten_tpu import Model
    from rten_tpu.ir.graph import graph_from_model_file
    from rten_tpu.ir.quantize_graph import quantize_graph_weights
    from rten_tpu.fmt import container
    from rten_tpu.fmt.serialize import graph_to_bytes

    key = jax.random.PRNGKey(0)
    if name == "resnet":
        from rten_tpu.models.resnet import ResNet, ResNetConfig
        net = ResNet(ResNetConfig(depth=50))
        mb = net.build_rten(net.init_params(key))
    elif name == "mobilenet":
        from rten_tpu.models.mobilenet import (MobileNetV3,
                                               MobileNetV3Config)
        net = MobileNetV3(MobileNetV3Config())
        mb = net.build_rten(net.init_params(key))
    elif name == "detr":
        from rten_tpu.models.detr import Detr, DetrConfig, build_detr_rten
        net = Detr(DetrConfig())
        mb = build_detr_rten(net, net.init_params(key))
    else:
        raise ValueError(name)
    data = mb.to_bytes()
    if quantize:
        mf = container.load_bytes(data)
        graph = graph_from_model_file(mf)
        n = quantize_graph_weights(graph)
        data = graph_to_bytes(graph)
        print(f"  {name}: {n} weights quantized", flush=True)
    return Model.load(data)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="resnet,mobilenet,detr")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--f32", action="store_true",
                    help="also measure the unquantized graph")
    ap.add_argument("--no-ab", action="store_true",
                    help="skip the ConvInteger native-path A/B")
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
    print(f"backend={jax.default_backend()} batch={args.batch}",
          flush=True)

    rng = np.random.RandomState(0)

    def measure(model, label, batch):
        x = jnp.asarray(rng.rand(batch, 3, 224, 224).astype(np.float32))
        t0 = time.perf_counter()
        out = model.run_one(x)
        jax.block_until_ready(out)
        print(f"  {label}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        best = None
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = model.run_one(x)
            # value fetch = trustworthy sync on the tunnel
            _ = (float(jnp.sum(out[0] if isinstance(out, (list, tuple))
                               else out)))
            best = min(best or 9e9, time.perf_counter() - t0)
        print(f"  {label}: {best*1e3:8.1f} ms/iter = "
              f"{batch/best:7.1f} img/s", flush=True)
        return best

    for name in args.models.split(","):
        print(f"== {name}", flush=True)
        if args.f32:
            m = build_model(name, quantize=False)
            measure(m, f"{name} f32", args.batch)
        os.environ.pop("RTEN_CONVINT_NATIVE", None)   # default: auto
        m = build_model(name, quantize=True)
        measure(m, f"{name} int8 (auto conv policy)", args.batch)
        if not args.no_ab:
            os.environ["RTEN_CONVINT_NATIVE"] = "0"
            m0 = build_model(name, quantize=True)
            measure(m0, f"{name} int8 (widened conv)", args.batch)
            os.environ["RTEN_CONVINT_NATIVE"] = "1"
            m2 = build_model(name, quantize=True)
            try:
                measure(m2, f"{name} int8 (native conv, forced)", args.batch)
            except Exception as exc:
                print(f"  native conv FAILED: {type(exc).__name__}: "
                      f"{str(exc)[:200]}", flush=True)
            os.environ.pop("RTEN_CONVINT_NATIVE", None)


if __name__ == "__main__":
    main()
