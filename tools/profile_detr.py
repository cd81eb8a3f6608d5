"""DETR int8 decomposition (round-5 verdict item 9): where do the
~ms/iter go at batch 64, and do the 6+6 transformer layers' attention
blocks actually leave the graph optimizer as FusedSDPA?

Two instruments:
1. STATIC — op-type histogram of the optimized int8 graph (counts
   FusedSDPA vs raw MatMul+Softmax chains, MatMulInteger, ConvInteger).
2. SEGMENT TIMING — the reverse-DFS plan prunes everything not needed
   for a requested output, so timing `run(inputs, [node])` for the last
   backbone / encoder / decoder nodes gives a cumulative per-component
   profile with honest value-fetch syncs (block_until_ready is
   unreliable on the tunnel — CLAUDE.md). Differences between
   consecutive cuts are the per-component costs; each run carries the
   same one-dispatch floor so the differences are clean.

    python tools/profile_detr.py [--batch 64 --iters 5]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--f32", action="store_true")
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

    from bench_vision import build_model  # noqa: E402 (tools sibling)

    print(f"backend={jax.default_backend()} batch={args.batch}",
          flush=True)
    model = build_model("detr", quantize=not args.f32)

    # -- 1. static: what did the optimizer make of the graph? ----------
    from collections import Counter
    ops = Counter()
    for node in model.graph.nodes:
        op = getattr(node.data, "op_type", None)
        if op:
            ops[op] += 1
    print("optimized graph op histogram (top 15):", flush=True)
    for op, n in ops.most_common(15):
        print(f"  {op:24s} {n}", flush=True)
    n_sdpa = ops.get("FusedSDPA", 0)
    n_softmax = ops.get("Softmax", 0)
    print(f"FusedSDPA={n_sdpa} Softmax(left raw)={n_softmax} "
          f"(DETR has 2*n_enc + 3*n_dec attention sites? no — "
          f"n_enc self + n_dec self + n_dec cross)", flush=True)

    # -- 2. segment timing via plan-pruned outputs ---------------------
    # Last operator node per component prefix, in insertion order.
    cuts = {}
    for node in model.graph.nodes:
        name = getattr(node, "name", None) or getattr(
            node.data, "name", None)
        if not name or not hasattr(node.data, "op_type"):
            continue
        for prefix in ("backbone.", "proj", "enc", "dec",
                       "class_logits"):
            if name.startswith(prefix):
                cuts[prefix] = name
    order = [("backbone", cuts.get("backbone.")),
             ("(+)proj", cuts.get("proj")),
             ("(+)encoder", cuts.get("enc")),
             ("(+)decoder", cuts.get("dec")),
             ("(+)heads=full", None)]
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(args.batch, 3, 224, 224).astype(np.float32))
    (input_id,) = model.graph.inputs

    def timed(outputs):
        outs = model.run({input_id: x}, outputs)      # compile
        _ = float(jnp.sum(outs[0]))
        best = None
        for _i in range(args.iters):
            t0 = time.perf_counter()
            outs = model.run({input_id: x}, outputs)
            _ = float(jnp.sum(outs[0]))               # fetch = sync
            best = min(best or 9e9, time.perf_counter() - t0)
        return best

    prev = 0.0
    for label, node_name in order:
        outputs = None
        if node_name is not None:
            nid = model.node_id(node_name)
            if nid is None:
                print(f"  {label:14s} SKIP (node {node_name} not found)",
                      flush=True)
                continue
            outputs = [nid]
        t = timed(outputs)
        print(f"  {label:14s} cumulative {t*1e3:8.1f} ms  "
              f"(+{(t-prev)*1e3:7.1f} ms)  [{node_name or 'outputs'}]",
              flush=True)
        prev = t


if __name__ == "__main__":
    main()
