"""Decode-step cost decomposition (round-2 item 1: confirm the overhead
model before building the fused decode kernel).

Times on-device decode bursts for ablated model variants and differences
them:

* layer scaling (12/6/3 layers) -> per-layer cost + fixed cost
  (embed + final norm + LM head + sampler + scan step overhead);
* attention ablated (attn block replaced by the QKV projection result's
  first slice) -> attention cost incl. cache append;
* cache-append ablated -> dynamic_update_slice cost;
* MLP ablated -> MLP cost;
* f32 vs int8-weight variants;
* HLO kernel counts from the compiled program (launch-overhead model).

Run on TPU:  python tools/profile_decode.py
Run on CPU:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
                 python tools/profile_decode.py --tiny
"""

from __future__ import annotations

import argparse
import re
import sys
import time

sys.path.insert(0, ".")


def build(cfg_kw, ablate=()):
    import jax.numpy as jnp
    from rten_tpu.models.transformer import TransformerConfig, TransformerLM

    cfg = TransformerConfig.gpt2(**cfg_kw)

    class Ablated(TransformerLM):
        def _attention(self, layer_params, x, positions, cache, layer_idx,
                       lengths, chunk=False):
            if "attn" in ablate:
                # Keep the QKV projection (it is a matmul we still want to
                # count) but skip scores/softmax/PV and the cache append.
                from rten_tpu.models.transformer import linear
                qkv = linear(x, layer_params["wqkv"],
                             layer_params.get("bqkv"))
                d = x.shape[-1]
                out = qkv[..., :d]
                return linear(out, layer_params["wo"],
                              layer_params.get("bo")), cache
            if "append" in ablate and cache is not None:
                # Attention against the (stale) cache without appending.
                saved_append = cache.append
                cache.append = lambda *a, **k: cache  # type: ignore
                try:
                    return super()._attention(layer_params, x, positions,
                                              cache, layer_idx, lengths,
                                              chunk)
                finally:
                    cache.append = saved_append
            return super()._attention(layer_params, x, positions, cache,
                                      layer_idx, lengths, chunk)

        def _mlp(self, layer_params, x):
            if "mlp" in ablate:
                return x
            return super()._mlp(layer_params, x)

    return Ablated(cfg), cfg


def time_burst(model, params, batch, capacity, n_steps, reps=3, ablate=(),
               qcache=False, cache_dtype=None, fused_head=False,
               tail_window=0, live=64):
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    if "tailround" in ablate:
        os.environ["RTEN_ABLATE_TAIL_ROUND"] = "1"
    else:
        os.environ.pop("RTEN_ABLATE_TAIL_ROUND", None)
    cache = model.new_cache(batch, capacity, quantized=qcache,
                            cache_dtype=cache_dtype,
                            tail_window=tail_window)
    # Fake a prefill depth so attention reads a realistic cache span.
    cache = cache.with_lengths(jnp.full(batch, live, jnp.int32))
    tokens = jnp.zeros(batch, jnp.int32)

    def burst(params, tokens, cache):
        def body(carry, _):
            tokens, cache = carry
            if "head" in ablate:
                # Stack only (embed..final norm): isolates the whole
                # LM-head+sample tail.
                x, cache = model._hidden_states(params, tokens[:, None],
                                                cache)
                # Data-dependent zero: a literal ``* 0`` constant-folds,
                # severing the step i -> i+1 dependency and letting XLA
                # hoist the next step's embed — which made this ablation
                # overstate the head tail (it was also removing the
                # cross-step serialization).
                nxt = tokens + jnp.where(x[:, 0, 0] > 3e38, 1, 0)
            elif fused_head:
                # The serving engine's greedy path: fused int8
                # lm-head+argmax kernel (decode_step_argmax).
                nxt, cache = model.decode_step_argmax(params, tokens,
                                                      cache)
            else:
                logits, cache = model.decode_step(params, tokens, cache)
                if "sample" in ablate:
                    # Keep logits live (else the head is dead code) but
                    # skip the argmax reduction.
                    nxt = tokens + jnp.where(logits[:, 0] > 3e38, 1, 0)
                else:
                    nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (nxt, cache), None

        if tail_window:
            # Mirror the engine's burst: chunks of tail_window steps
            # with an in-device flush between (engine.burst_fn). The
            # "noflush" ablation resets the window counter WITHOUT the
            # flush kernel — every other read/write keeps identical
            # shape and traffic (packed rows just hold garbage), so the
            # difference is the amortized flush cost alone.
            from rten_tpu.generate.kv_cache import KVCache
            chunks, rem = divmod(n_steps, tail_window)

            def do_flush(c):
                if "noflush" in ablate:
                    return KVCache(c.kv, c.lengths, c.quant_scales,
                                   c.kv_heads, c.head_dim, c.tail,
                                   jnp.zeros((), jnp.int32),
                                   c.carry, c.carry_s)
                return c.flush_tail(tail_window)

            def chunk_body(carry, _):
                carry, _ = jax.lax.scan(body, carry, None,
                                        length=tail_window)
                tokens, cache = carry
                return (tokens, do_flush(cache)), None

            carry = (tokens, cache)
            if chunks:
                carry, _ = jax.lax.scan(chunk_body, carry, None,
                                        length=chunks)
            if rem:
                carry, _ = jax.lax.scan(body, carry, None, length=rem)
            return carry
        (tokens, cache), _ = jax.lax.scan(body, (tokens, cache), None,
                                          length=n_steps)
        return tokens, cache

    fn = jax.jit(burst, donate_argnums=(2,))
    lowered = fn.lower(params, tokens, cache)
    compiled = lowered.compile()
    kernels = count_kernels(compiled)

    # Warmup (the cache is donated; rebind to each call's output).
    # Timing sync is a VALUE FETCH: block_until_ready through the
    # tunnel returned early for some batch-256 programs (a whole
    # 12-layer burst "completed" in 0.6 ms — see CLAUDE.md timing
    # notes), so only a fetched scalar is trusted.
    import jax.numpy as _jnp
    out, cache = fn(params, tokens, cache)
    float(_jnp.sum(out))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out, cache = fn(params, tokens, cache)
        float(_jnp.sum(out))
        times.append(time.perf_counter() - t0)
    best = min(times)
    return best / n_steps, kernels


_KERNEL_OPS = ("fusion", "custom-call", "dynamic-update-slice", "scatter",
               "dot", "copy", "convolution")


def count_kernels(compiled):
    """Count kernel-launching opcodes in the while-body computation of the
    compiled HLO (the scan body ≈ one decode step) — a proxy for
    per-step kernel launches."""
    try:
        text = compiled.as_text()
    except Exception:
        return None
    # Split into computations: a computation header is a line ending in '{'
    # whose first token is ENTRY or %name / name.
    comps: dict[str, dict] = {}
    current = None
    for line in text.splitlines():
        stripped = line.strip()
        if stripped.endswith("{") and ("(" in stripped) and \
                not stripped.startswith(("ROOT", "//")):
            current = stripped.split()[0].lstrip("%")
            if current == "ENTRY":
                current = stripped.split()[1].lstrip("%")
            comps[current] = {}
        elif current and " = " in stripped:
            m = re.match(r"(?:ROOT\s+)?%?[\w\.\-]+\s*=\s*\S+\s+([\w\-]+)",
                         stripped)
            if m:
                op = m.group(1)
                comps[current][op] = comps[current].get(op, 0) + 1
    if not comps:
        return None
    # The scan body is the computation with the most kernel-launching ops.
    def launches(ops):
        return sum(v for k, v in ops.items() if k in _KERNEL_OPS)
    name, ops = max(comps.items(), key=lambda kv: launches(kv[1]))
    return {"computation": name, "ops": launches(ops),
            "total_ops": sum(ops.values()),
            "breakdown": {k: v for k, v in sorted(
                ops.items(), key=lambda kv: -kv[1]) if k in _KERNEL_OPS}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config for CPU smoke")
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--only", default=None,
                    help="comma-separated substring filter of variant names "
                         "(saves remote compiles)")
    ap.add_argument("--serving-cache", default="int8",
                    choices=("int8", "bf16"),
                    help="--serving KV-cache config (default: the "
                         "token-packed int8 serving default)")
    ap.add_argument("--serving", action="store_true",
                    help="ablate the SERVING config (int8 weights + bf16 "
                         "cache + fused head/argmax) instead of f32; use "
                         "with --batch 256 for the headline-config table")
    ap.add_argument("--serving-tail", action="store_true",
                    help="ablate the round-3 HEADLINE config: int8 "
                         "weights + token-packed int8 cache + bf16 tail "
                         "write-buffer (flat kernel) + fused head — the "
                         "in-situ decomposition profile_decode could "
                         "not see before (round-3 verdict item 1)")
    ap.add_argument("--live", type=int, default=64,
                    help="initial cache depth (bench decodes 64->448)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/rten_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from rten_tpu.models.transformer import quantize_weights

    print(f"backend={jax.default_backend()}", flush=True)

    if args.tiny:
        base_kw = dict(vocab_size=512, n_layers=4, n_heads=4, d_model=128,
                       d_ff=256, max_seq_len=128)
        layer_counts = (4, 2)
        batch, capacity = 4, 128
    else:
        base_kw = {}
        layer_counts = (12, 6, 3)
        batch, capacity = 8, 512
    if args.batch:
        batch = args.batch

    results = {}

    def run(name, cfg_kw, ablate=(), quant=None, qcache=False,
            cache_dtype=None, fused_head=False, tail_window=0,
            live=None):
        if args.only and not any(tok in name
                                 for tok in args.only.split(",")):
            return
        model, cfg = build(cfg_kw, ablate)
        params = model.init_params(jax.random.PRNGKey(0))
        if "lmhead" in ablate:
            # Shrink the head to 128 columns (the burst only argmaxes the
            # logits, so the narrower shape is legal) — isolates the
            # [d, vocab] weight stream of the real head.
            params["lm_head"] = jnp.asarray(
                np.asarray(params["embed"]).T[:, :128].copy())
        if quant:
            params = quantize_weights(params, quant)
        per_step, kernels = time_burst(model, params, batch, capacity,
                                       args.steps, ablate=ablate,
                                       qcache=qcache,
                                       cache_dtype=cache_dtype,
                                       fused_head=fused_head,
                                       tail_window=tail_window,
                                       live=live if live is not None
                                       else args.live)
        results[name] = (per_step, kernels)
        kinfo = ""
        if kernels:
            kinfo = (f" launches/step={kernels['ops']}"
                     f" {kernels['breakdown']}")
        print(f"{name:30s} {per_step * 1e6:9.1f} us/step{kinfo}", flush=True)

    if args.serving_tail:
        # The round-3 headline config end-to-end: tail write-buffer +
        # flat kernel + int8 cache + fused head, with the engine's
        # in-burst flush cadence. Differences give the in-situ
        # per-component costs the old --serving mode could not see.
        L0 = layer_counts[0]
        L1 = layer_counts[1]
        tw = 16
        sv = dict(quant="int8", qcache=True, fused_head=True,
                  tail_window=tw)
        run(f"tail L={L0}", {**base_kw, "n_layers": L0}, **sv)
        run(f"tail L={L1}", {**base_kw, "n_layers": L1}, **sv)
        run("tail no-attn", {**base_kw, "n_layers": L0},
            ablate=("attn",), **sv)
        run("tail no-append", {**base_kw, "n_layers": L0},
            ablate=("append",), **sv)
        run("tail no-tailround", {**base_kw, "n_layers": L0},
            ablate=("tailround",), **sv)
        run("tail no-flush", {**base_kw, "n_layers": L0},
            ablate=("noflush",), **sv)
        run("tail no-mlp", {**base_kw, "n_layers": L0},
            ablate=("mlp",), **sv)
        nohead = {k: v for k, v in sv.items() if k != "fused_head"}
        run("tail no-head", {**base_kw, "n_layers": L0},
            ablate=("head",), **nohead)
        run("tail live=384", {**base_kw, "n_layers": L0}, live=384,
            **sv)
        run("tail no-tail(rmw)", {**base_kw, "n_layers": L0},
            **{**sv, "tail_window": 0})
        full = results.get(f"tail L={L0}")
        if full:
            t = full[0]
            print(f"\nserving-tail step {t * 1e6:.1f} us "
                  f"({batch / t:.0f} tok/s at batch {batch}, "
                  f"live {args.live})")
            if f"tail L={L1}" in results:
                per_layer = (t - results[f"tail L={L1}"][0]) / (L0 - L1)
                print(f"per-layer {per_layer * 1e6:.1f} us; fixed "
                      f"{(t - per_layer * L0) * 1e6:.1f} us")
            for k, label in (("tail no-attn", "attention(all)+append"),
                             ("tail no-append", "append"),
                             ("tail no-tailround", "tail round"),
                             ("tail no-mlp", "mlp")):
                if k in results:
                    print(f"per-layer {label} "
                          f"{(t - results[k][0]) / L0 * 1e6:.1f} us")
            if "tail no-flush" in results:
                print(f"flush amortized "
                      f"{(t - results['tail no-flush'][0]) * 1e6:.1f}"
                      f" us/step")
            if "tail no-head" in results:
                print(f"head+argmax tail "
                      f"{(t - results['tail no-head'][0]) * 1e6:.1f} us")
            if "tail live=384" in results:
                print(f"live 384 vs {args.live}: "
                      f"{(results['tail live=384'][0] - t) * 1e6:+.1f}"
                      f" us/step")
            if "tail no-tail(rmw)" in results:
                print(f"rmw(no-tail) config delta "
                      f"{(results['tail no-tail(rmw)'][0] - t) * 1e6:+.1f}"
                      f" us/step")
        return

    if args.serving:
        # The headline serving config (bench.py): int8 weights, the
        # token-packed int8 KV cache (serving default since round 6),
        # greedy fused lm-head+argmax. Ablations difference out
        # per-component cost at this exact batch/capacity.
        # --serving-cache bf16 reverts to the round-5 bf16-cache config.
        L0 = layer_counts[0]
        L1 = layer_counts[1]
        if args.serving_cache == "int8":
            sv = dict(quant="int8", qcache=True, fused_head=True)
        else:
            sv = dict(quant="int8", cache_dtype="bfloat16",
                      fused_head=True)
        run(f"srv L={L0}", {**base_kw, "n_layers": L0}, **sv)
        run(f"srv L={L1}", {**base_kw, "n_layers": L1}, **sv)
        run("srv no-attn", {**base_kw, "n_layers": L0}, ablate=("attn",),
            **sv)
        run("srv no-append", {**base_kw, "n_layers": L0},
            ablate=("append",), **sv)
        run("srv no-mlp", {**base_kw, "n_layers": L0}, ablate=("mlp",),
            **sv)
        nohead = {k: v for k, v in sv.items() if k != "fused_head"}
        run("srv no-head", {**base_kw, "n_layers": L0}, ablate=("head",),
            **nohead)
        run("srv unfused-head", {**base_kw, "n_layers": L0}, **nohead)
        full = results.get(f"srv L={L0}")
        if full:
            t = full[0]
            print(f"\nserving step {t * 1e6:.1f} us "
                  f"({batch / t:.0f} tok/s at batch {batch})")
            if f"srv L={L1}" in results:
                per_layer = (t - results[f"srv L={L1}"][0]) / (L0 - L1)
                print(f"per-layer {per_layer * 1e6:.1f} us; fixed "
                      f"{(t - per_layer * L0) * 1e6:.1f} us")
            for k, label in (("srv no-attn", "attention(+append)"),
                             ("srv no-append", "append"),
                             ("srv no-mlp", "mlp")):
                if k in results:
                    print(f"per-layer {label} "
                          f"{(t - results[k][0]) / L0 * 1e6:.1f} us")
            if "srv no-head" in results:
                print(f"head+argmax tail "
                      f"{(t - results['srv no-head'][0]) * 1e6:.1f} us")
            if "srv unfused-head" in results:
                print(f"unfused head+argmax delta "
                      f"{(results['srv unfused-head'][0] - t) * 1e6:.1f} us")
        return

    for L in layer_counts:
        run(f"f32 L={L}", {**base_kw, "n_layers": L})
    L0 = layer_counts[0]
    run("f32 no-attn", {**base_kw, "n_layers": L0}, ablate=("attn",))
    run("f32 no-append", {**base_kw, "n_layers": L0}, ablate=("append",))
    run("f32 no-mlp", {**base_kw, "n_layers": L0}, ablate=("mlp",))
    run("f32 no-lmhead", {**base_kw, "n_layers": L0}, ablate=("lmhead",))
    run("f32 no-sample", {**base_kw, "n_layers": L0}, ablate=("sample",))
    run("int8 full", {**base_kw, "n_layers": L0}, quant="int8")
    run("int8 qcache", {**base_kw, "n_layers": L0}, quant="int8",
        qcache=True)
    run("int8 bf16cache", {**base_kw, "n_layers": L0}, quant="int8",
        cache_dtype="bfloat16")
    run("f32 bf16cache", {**base_kw, "n_layers": L0},
        cache_dtype="bfloat16")
    run("f32 qcache", {**base_kw, "n_layers": L0}, qcache=True)
    run("bf16 full", {**base_kw, "n_layers": L0, "dtype": "bfloat16"})
    run("bf16 qcache", {**base_kw, "n_layers": L0, "dtype": "bfloat16"},
        qcache=True)

    # Derived decomposition
    if args.only:
        return
    if len(layer_counts) >= 2:
        a, b = layer_counts[0], layer_counts[1]
        ta, tb = results[f"f32 L={a}"][0], results[f"f32 L={b}"][0]
        per_layer = (ta - tb) / (a - b)
        fixed = ta - per_layer * a
        print(f"\nper-layer {per_layer * 1e6:.1f} us; "
              f"fixed (embed+lmhead+sample+scan) {fixed * 1e6:.1f} us")
        attn = (results[f"f32 L={L0}"][0] - results["f32 no-attn"][0]) / L0
        app = (results[f"f32 L={L0}"][0] - results["f32 no-append"][0]) / L0
        mlp = (results[f"f32 L={L0}"][0] - results["f32 no-mlp"][0]) / L0
        print(f"per-layer attention(+append) {attn * 1e6:.1f} us; "
              f"append alone {app * 1e6:.1f} us; mlp {mlp * 1e6:.1f} us")


if __name__ == "__main__":
    main()
