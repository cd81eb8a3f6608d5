"""Dump the compiled HLO of one serving decode burst and summarize the
copy/fusion kernels in the while body by shape — finds layout-mismatch
copies that the launch counter in profile_decode only counts.

    python tools/dump_step_hlo.py [--batch 256] [--layers 2]
"""

from __future__ import annotations

import argparse
import re
import sys
from collections import Counter

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--out", default="/tmp/step_hlo.txt")
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

    cfg = TransformerConfig.gpt2(n_layers=args.layers)
    model = TransformerLM(cfg)
    params = quantize_weights(model.init_params(jax.random.PRNGKey(0)),
                              "int8")
    cache = model.new_cache(args.batch, 512, quantized=True).advance(64)
    tokens = jnp.zeros(args.batch, jnp.int32)

    def burst(params, tokens, cache):
        def body(carry, _):
            tokens, cache = carry
            nxt, cache = model.decode_step_argmax(params, tokens, cache)
            return (nxt, cache), None
        (tokens, cache), _ = jax.lax.scan(body, (tokens, cache), None,
                                          length=args.steps)
        return tokens, cache

    lowered = jax.jit(burst, donate_argnums=(2,)).lower(
        params, tokens, cache)
    text = lowered.compile().as_text()
    with open(args.out, "w") as f:
        f.write(text)
    print(f"wrote {args.out} ({len(text.splitlines())} lines)")

    # Copy kernels by operand shape.
    copies = Counter()
    for m in re.finditer(r"= (\S+) copy\(", text):
        copies[m.group(1)] += 1
    print("\ncopy kernels by shape:")
    for shape, n in copies.most_common(20):
        print(f"  {n:4d} x {shape}")


if __name__ == "__main__":
    main()
