"""Mixtral-class MoE throughput on hardware: decode bursts (dense
all-experts path) bf16 vs int8-expert weights, plus prefill comparing the
dense vs ragged (lax.ragged_dot grouped-GEMM) MoE paths.

Defaults: 8 experts / top-2, 8 layers, d=1024, d_ff=3584, 16q/4kv heads
— a ~1.8 B-total / ~0.6 B-active parameter shape that fits the test chip.

Run on TPU:  python tools/profile_moe.py [--layers 8 --batch 8]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--d-model", type=int, default=1024)
    ap.add_argument("--d-ff", type=int, default=3584)
    ap.add_argument("--experts", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--capacity", type=int, default=512)
    ap.add_argument("--prompt", type=int, default=256)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

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

    from rten_tpu.models.transformer import (TransformerConfig,
                                             TransformerLM,
                                             quantize_weights)

    print(f"backend={jax.default_backend()}", flush=True)
    if args.tiny:
        cfg = TransformerConfig.tiny_moe(dtype="bfloat16")
        args.capacity, args.prompt, args.steps = 64, 16, 8
    else:
        cfg = TransformerConfig.mixtral(
            vocab_size=32000, n_layers=args.layers, n_heads=16, kv_heads=4,
            d_model=args.d_model, d_ff=args.d_ff, n_experts=args.experts,
            max_seq_len=args.capacity, dtype="bfloat16")
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"{n_params/1e9:.2f} B total params, {cfg.n_experts} experts "
          f"top-{cfg.experts_per_token}", flush=True)

    # -- prefill: dense vs ragged MoE path ---------------------------------
    toks = jnp.zeros((args.batch, args.prompt), jnp.int32)
    for impl in ("dense", "ragged"):
        cfg_i = TransformerConfig(**{**cfg.__dict__, "moe_impl": impl})
        m = TransformerLM(cfg_i)

        def prefill(params, toks, cache):
            logits, cache = m.prefill(params, toks, cache)
            return logits[:, -1], cache

        fn = jax.jit(prefill, donate_argnums=(2,))
        cache = m.new_cache(args.batch, args.capacity)
        t0 = time.perf_counter()
        last, cache = fn(params, toks, cache)
        jax.block_until_ready(last)
        print(f"prefill[{impl}]: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        best = None
        for _ in range(3):
            cache = m.new_cache(args.batch, args.capacity)
            t0 = time.perf_counter()
            last, cache = fn(params, toks, cache)
            jax.block_until_ready(last)
            best = min(best or 9e9, time.perf_counter() - t0)
        ntok = args.batch * args.prompt
        print(f"prefill[{impl}]: {best*1e3:7.1f} ms = {ntok/best:8.0f} "
              f"tok/s", flush=True)

    # -- decode bursts: bf16 vs int8 expert weights -------------------------
    def burst(params, tokens, cache):
        def body(carry, _):
            tokens, cache = carry
            nxt, cache = model.decode_step_argmax(params, tokens, cache)
            return (nxt, cache), None

        (tokens, cache), _ = jax.lax.scan(body, (tokens, cache), None,
                                          length=args.steps)
        return tokens, cache

    fn = jax.jit(burst, donate_argnums=(2,))
    for name, p in [("bf16 dense", params),
                    ("int8 experts+weights",
                     quantize_weights(params, "int8"))]:
        cache = model.new_cache(args.batch, args.capacity)
        cache = cache.advance(64)
        tokens = jnp.zeros(args.batch, jnp.int32)
        t0 = time.perf_counter()
        toks2, cache = fn(p, tokens, cache)
        jax.block_until_ready(toks2)
        print(f"decode[{name}]: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            toks2, cache = fn(p, tokens, cache)
            jax.block_until_ready(toks2)
            best = min(best or 9e9, time.perf_counter() - t0)
        print(f"decode[{name}]: {best / args.steps * 1e6:6.0f} us/step = "
              f"{args.batch * args.steps / best:6.0f} tok/s", flush=True)


def mesh_table():
    """MoE × mesh structural A/B (round-5 verdict item 7): compile the
    MoE decode step under (data, expert, model) compositions on the
    8-virtual-device CPU mesh and count collectives + bytes/step — the
    communication cost model for expert parallelism (real ICI numbers
    need a pod slice; the chosen composition is the dense all-experts
    einsum whose expert contraction is ONE psum riding the axis).

        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
            JAX_PLATFORMS=cpu python tools/profile_moe.py --mesh-table
    """
    import jax
    import jax.numpy as jnp

    from rten_tpu.models.transformer import (TransformerConfig,
                                             TransformerLM,
                                             quantize_weights)
    from rten_tpu.parallel import make_mesh, shard_cache, shard_params

    cfg = TransformerConfig.tiny_moe(n_heads=4, kv_heads=4, d_model=512,
                                     use_pallas=True)
    model = TransformerLM(cfg)
    params = quantize_weights(model.init_params(jax.random.PRNGKey(0)),
                              "int8")
    batch = 8
    print("MoE decode-step collective table (count / bytes per step):",
          flush=True)
    for label, axes in (
            ("ep=2 dp=2 tp=2", dict(data=2, expert=2, model=2)),
            ("ep=4 tp=2", dict(data=1, expert=4, model=2)),
            ("tp=4 (no ep)", dict(data=2, model=4)),
    ):
        mesh = make_mesh(**axes, devices=jax.devices()[:8])
        import copy
        m = copy.copy(model)
        m.mesh = mesh
        sp = shard_params(params, mesh)
        cache = shard_cache(
            m.new_cache(batch, 64, quantized=True, tail_window=16),
            mesh)
        toks = jnp.zeros(batch, jnp.int32)
        with mesh:
            text = jax.jit(m.decode_step, donate_argnums=(2,)).lower(
                sp, toks, cache).compile().as_text()
        from bench_scaling import parse_collectives
        counts, nbytes = parse_collectives(text)
        cs = " ".join(f"{k}:{v}" for k, v in sorted(counts.items()))
        print(f"  {label:16s} {cs or 'none'}  "
              f"{nbytes / 1024:.1f} KiB/step", flush=True)


if __name__ == "__main__":
    import sys as _sys
    if "--mesh-table" in _sys.argv:
        mesh_table()
    else:
        main()
