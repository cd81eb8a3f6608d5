"""Whisper-small-class encoder-decoder decode throughput with the
quantized KV cache (BASELINE.json config 4).

Times the full generate() loop (encode once + token-by-token cached
decode with cross-attention) at batch 8, comparing f32 vs int8
self-attention KV. Wall time includes the host loop's per-token value
fetch, which is the honest serving cost of this API.

Run on TPU:  python tools/bench_whisper.py [--tokens 64]
CPU smoke:   env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
                 python tools/bench_whisper.py --tiny --tokens 4
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--burst", type=int, default=16)
    args = ap.parse_args()

    import jax
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

    from rten_tpu.models.encoder_decoder import (EncoderDecoderConfig,
                                                 EncoderDecoderLM)

    print(f"backend={jax.default_backend()}", flush=True)
    if args.tiny:
        cfg = EncoderDecoderConfig.tiny_test()
        src_len = 16
    else:
        # Whisper-small shape: 12+12 layers, d=768, 12 heads, 80 mels,
        # the real conv frontend (k3 + k3/s2 over 3000 input frames →
        # 1500 audio positions — load_whisper/test_hf_parity parity).
        cfg = EncoderDecoderConfig(
            vocab_size=51865, n_enc_layers=12, n_dec_layers=12,
            n_heads=12, d_model=768, d_ff=3072, n_mels=80,
            max_source_len=1500, max_target_len=448,
            conv_frontend=True)
        src_len = 3000
    model = EncoderDecoderLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    feats = rng.randn(args.batch, src_len, cfg.n_mels).astype(np.float32)

    for name, quant in [("f32 cache", False), ("int8 cache", True)]:
        t0 = time.perf_counter()
        out = model.generate(params, feats, start_token=1,
                             max_tokens=args.tokens,
                             quantized_cache=quant, burst=args.burst)
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = model.generate(params, feats, start_token=1,
                             max_tokens=args.tokens,
                             quantized_cache=quant, burst=args.burst)
        dt = time.perf_counter() - t0
        n_tok = out.shape[0] * out.shape[1]
        print(f"{name}: {n_tok / dt:7.0f} tokens/s "
              f"({dt / out.shape[1] * 1e3:.2f} ms/step; warm run; "
              f"first {warm:.1f}s incl. compile)", flush=True)


if __name__ == "__main__":
    main()
