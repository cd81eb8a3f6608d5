"""Encoder-decoder transformer (Whisper-class; reference example:
rten-examples/src/wav2vec2.rs + the Whisper config in BASELINE.json).

Structure: a bidirectional encoder over input features (audio frames or
token embeddings) and an autoregressive decoder with self-attention
(KV-cached) + cross-attention over the encoder memory. Cross-attention
K/V are computed once per request at prefill (the loop-invariant prefix
the reference caches via ``partial_run``) and carried in a dedicated
cache.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..generate.kv_cache import KVCache
from ..kernels.attention import (_attn_reference, flash_attention,
                                 flash_decode_fused)
from .transformer import _norm, linear


@dataclass(frozen=True)
class EncoderDecoderConfig:
    vocab_size: int = 1000
    n_enc_layers: int = 4
    n_dec_layers: int = 4
    n_heads: int = 8
    d_model: int = 256
    d_ff: int = 1024
    n_mels: int = 80              # audio feature dim (Whisper-style)
    max_source_len: int = 1500
    max_target_len: int = 448
    norm: str = "layernorm"
    layer_norm_eps: float = 1e-5
    use_pallas: bool = True
    # Whisper's audio frontend: two 1-D convs over time (k=3; the second
    # stride-2) + GELU, instead of the plain linear projection. With it,
    # ``max_source_len`` is the POST-conv length (n_audio_ctx).
    conv_frontend: bool = False

    @property
    def head_dim(self):
        return self.d_model // self.n_heads

    @staticmethod
    def tiny_test(**kw):
        return EncoderDecoderConfig(**{**dict(
            vocab_size=64, n_enc_layers=2, n_dec_layers=2, n_heads=4,
            d_model=64, d_ff=128, n_mels=16, max_source_len=32,
            max_target_len=32), **kw})


class EncoderDecoderLM:
    def __init__(self, config: EncoderDecoderConfig):
        self.config = config

    # -- params ------------------------------------------------------------

    def init_params(self, key) -> dict:
        cfg = self.config
        rng = np.random.RandomState(0)
        d, dff, v = cfg.d_model, cfg.d_ff, cfg.vocab_size

        def dense(*shape):
            fan_in = shape[0]
            return (rng.randn(*shape) / math.sqrt(fan_in)).astype(np.float32)

        def attn_block():
            return {
                "ln_scale": np.ones(d, np.float32),
                "ln_bias": np.zeros(d, np.float32),
                "wq": dense(d, d), "wk": dense(d, d), "wv": dense(d, d),
                "wo": dense(d, d),
            }

        def mlp_block():
            return {
                "ln_scale": np.ones(d, np.float32),
                "ln_bias": np.zeros(d, np.float32),
                "w_up": dense(d, dff), "b_up": np.zeros(dff, np.float32),
                "w_down": dense(dff, d), "b_down": np.zeros(d, np.float32),
            }

        params = {
            "src_proj": dense(cfg.n_mels, d),
            "src_pos": (rng.randn(cfg.max_source_len, d) * 0.02
                        ).astype(np.float32),
            **({"conv1_w": (rng.randn(3, cfg.n_mels, d)
                            / math.sqrt(3 * cfg.n_mels)
                            ).astype(np.float32),
                "conv1_b": np.zeros(d, np.float32),
                "conv2_w": (rng.randn(3, d, d) / math.sqrt(3 * d)
                            ).astype(np.float32),
                "conv2_b": np.zeros(d, np.float32)}
               if cfg.conv_frontend else {}),
            "tgt_embed": (rng.randn(v, d) * 0.02).astype(np.float32),
            "tgt_pos": (rng.randn(cfg.max_target_len, d) * 0.02
                        ).astype(np.float32),
            "enc_ln_scale": np.ones(d, np.float32),
            "enc_ln_bias": np.zeros(d, np.float32),
            "dec_ln_scale": np.ones(d, np.float32),
            "dec_ln_bias": np.zeros(d, np.float32),
            "encoder": [{"attn": attn_block(), "mlp": mlp_block()}
                        for _ in range(cfg.n_enc_layers)],
            "decoder": [{"self_attn": attn_block(),
                         "cross_attn": attn_block(), "mlp": mlp_block()}
                        for _ in range(cfg.n_dec_layers)],
        }
        return jax.tree_util.tree_map(jnp.asarray, params)

    # -- attention helpers ---------------------------------------------------

    def _heads(self, x, b, s):
        cfg = self.config
        return x.reshape(b, s, cfg.n_heads, cfg.head_dim).transpose(0, 2, 1, 3)

    def _merge(self, x, b, s):
        cfg = self.config
        return x.transpose(0, 2, 1, 3).reshape(b, s, cfg.d_model)

    def _self_attention(self, p, x, causal):
        cfg = self.config
        b, s, _ = x.shape
        q = self._heads(linear(x, p["wq"], p.get("bq")), b, s)
        k = self._heads(linear(x, p["wk"], p.get("bk")), b, s)
        v = self._heads(linear(x, p["wv"], p.get("bv")), b, s)
        if cfg.use_pallas:
            out = flash_attention(q, k, v, causal=causal)
        else:
            out = _attn_reference(q, k, v, causal,
                                  1.0 / math.sqrt(cfg.head_dim))
        return linear(self._merge(out, b, s), p["wo"], p.get("bo"))

    def _mlp(self, p, x):
        h = jax.nn.gelu(linear(x, p["w_up"], p["b_up"]), approximate=False)
        return linear(h, p["w_down"], p["b_down"])

    # -- encoder -------------------------------------------------------------

    def encode(self, params, features):
        """features: [B, S_src, n_mels] → memory [B, S_src, d]."""
        cfg = self.config
        b, s, _ = features.shape
        if cfg.conv_frontend:
            # Whisper frontend: conv1 (k=3, pad 1) + GELU, conv2 (k=3,
            # stride 2, pad 1) + GELU. Weights stored [k, in, out]
            # ('NHC'/'HIO' — torch's [out, in, k] transposed at load).
            dn = ("NHC", "HIO", "NHC")
            x = jax.lax.conv_general_dilated(
                features, params["conv1_w"], (1,), ((1, 1),),
                dimension_numbers=dn) + params["conv1_b"]
            x = jax.nn.gelu(x, approximate=False)
            x = jax.lax.conv_general_dilated(
                x, params["conv2_w"], (2,), ((1, 1),),
                dimension_numbers=dn) + params["conv2_b"]
            x = jax.nn.gelu(x, approximate=False)
            s = x.shape[1]
        else:
            x = linear(features, params["src_proj"])
        x = x + params["src_pos"][None, :s]
        for layer in params["encoder"]:
            a = layer["attn"]
            attn_in = _norm(cfg, x, a["ln_scale"], a["ln_bias"])
            x = x + self._self_attention(a, attn_in, causal=False)
            m = layer["mlp"]
            x = x + self._mlp(m, _norm(cfg, x, m["ln_scale"], m["ln_bias"]))
        return _norm(cfg, x, params["enc_ln_scale"], params["enc_ln_bias"])

    def cross_kv(self, params, memory):
        """Per-decoder-layer cross-attention K/V from the encoder memory —
        computed once per request (the loop-invariant prefix)."""
        cfg = self.config
        b, s, _ = memory.shape
        out = []
        for layer in params["decoder"]:
            c = layer["cross_attn"]
            k = self._heads(linear(memory, c["wk"], c.get("bk")), b, s)
            v = self._heads(linear(memory, c["wv"], c.get("bv")), b, s)
            out.append((k, v))
        return out

    # -- decoder -------------------------------------------------------------

    def decode(self, params, tokens, cross, cache, positions=None):
        """tokens [B, S]; cross: list of per-layer (k, v) from cross_kv;
        cache: self-attention KVCache. Returns (logits, cache)."""
        cfg = self.config
        b, s = tokens.shape
        if positions is None:
            if cache is not None and s == 1:
                positions = cache.lengths[:, None]
            else:
                positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
        x = jnp.take(params["tgt_embed"], tokens, axis=0)
        x = x + jnp.take(params["tgt_pos"], positions, axis=0)

        for i, layer in enumerate(params["decoder"]):
            sa = layer["self_attn"]
            attn_in = _norm(cfg, x, sa["ln_scale"], sa["ln_bias"])
            q = self._heads(linear(attn_in, sa["wq"], sa.get("bq")), b, s)
            k = self._heads(linear(attn_in, sa["wk"], sa.get("bk")), b, s)
            v = self._heads(linear(attn_in, sa["wv"], sa.get("bv")), b, s)
            if cache is not None:
                cache = cache.append(i, k, v, position=0 if s > 1 else None)
            if s == 1 and cache is not None:
                if cfg.use_pallas:
                    scales = (cache.quant_scales[i]
                              if cache.quant_scales is not None else None)
                    # Same grouped-kernel selection as TransformerLM:
                    # token-packed int8 caches support g=16 (half the
                    # block bytes) and int8-scores below g=16.
                    groups = ((16, 8, 4, 2) if scales is not None
                              else (8, 4, 2))
                    group = next((g for g in groups
                                  if b % g == 0 and b >= 2 * g), 0)
                    if group:
                        from ..kernels.attention import \
                            flash_decode_grouped
                        out = flash_decode_grouped(
                            q[:, :, 0, :], cache.fused_layer(i),
                            cache.lengths + 1, cfg.n_heads,
                            group=group,
                            block_k=128 if scales is not None
                            and scales.dtype == jnp.int32 else 64,
                            kv_scales=scales,
                            int8_scores=(scales is not None
                                         and group < 16))[:, :, None, :]
                    else:
                        out = flash_decode_fused(
                            q[:, :, 0, :], cache.fused_layer(i),
                            cache.lengths + 1, cfg.n_heads,
                            kv_scales=scales)[:, :, None, :]
                else:
                    kc, vc = cache.layer_kv(i)
                    out = _attn_reference(q, kc, vc, False,
                                          1.0 / math.sqrt(cfg.head_dim),
                                          cache.lengths + 1)
            else:
                if cfg.use_pallas:
                    out = flash_attention(q, k, v, causal=True)
                else:
                    out = _attn_reference(q, k, v, True,
                                          1.0 / math.sqrt(cfg.head_dim))
            x = x + linear(self._merge(out, b, s), sa["wo"],
                           sa.get("bo"))

            ca = layer["cross_attn"]
            cross_in = _norm(cfg, x, ca["ln_scale"], ca["ln_bias"])
            qc = self._heads(linear(cross_in, ca["wq"], ca.get("bq")),
                             b, s)
            ck, cv = cross[i]
            out = _attn_reference(qc, ck, cv, False,
                                  1.0 / math.sqrt(cfg.head_dim))
            x = x + linear(self._merge(out, b, s), ca["wo"],
                           ca.get("bo"))

            m = layer["mlp"]
            x = x + self._mlp(m, _norm(cfg, x, m["ln_scale"], m["ln_bias"]))

        x = _norm(cfg, x, params["dec_ln_scale"], params["dec_ln_bias"])
        logits = jnp.matmul(x, params["tgt_embed"].T,
                            preferred_element_type=jnp.float32)
        if cache is not None:
            cache = cache.advance(s if s > 1 else 1)
        return logits, cache

    def new_cache(self, batch, capacity=None, quantized=False,
                  cache_dtype=None):
        cfg = self.config
        dtype = jnp.dtype(cache_dtype) if cache_dtype else jnp.float32
        return KVCache.create(batch, cfg.n_dec_layers, cfg.n_heads,
                              capacity or cfg.max_target_len, cfg.head_dim,
                              dtype=dtype, quantized=quantized)

    # -- generation ----------------------------------------------------------

    def _jitted_generate_fns(self):
        """Jitted encode/decode programs, built ONCE per model instance.
        Re-jitting per generate() call retraces the whole stack each time
        (seconds of host work) and — worse — an un-jitted encode runs
        eagerly: one dispatch per op, which through a remote-execution
        link is a round trip per op (measured ~10 s for a 12-layer
        encoder on the dev tunnel)."""
        fns = getattr(self, "_gen_fns", None)
        if fns is not None:
            return fns

        def encode_cross(p, features):
            return self.cross_kv(p, self.encode(p, features))

        def burst_fn(p, cur, cr, c, n):
            def body(carry, _):
                cur, c = carry
                logits, c = self.decode(p, cur[:, None], cr, c)
                nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
                return (nxt, c), nxt

            (cur, c), toks = jax.lax.scan(body, (cur, c), None, length=n)
            return toks, cur, c

        fns = {
            "encode_cross": jax.jit(encode_cross),
            "step": jax.jit(lambda p, t, cr, c: self.decode(p, t, cr, c),
                            donate_argnums=(3,)),
            "burst": jax.jit(burst_fn, donate_argnums=(3,),
                             static_argnums=(4,)),
        }
        self._gen_fns = fns
        return fns

    def generate(self, params, features, start_token, max_tokens=32,
                 eos_token=None, quantized_cache=False, burst=1):
        """Greedy transcription loop: encode once, decode with jitted
        cached steps. ``quantized_cache``: int8 self-attention KV
        (BASELINE.json config 4 — Whisper with quantized KV cache).

        ``burst`` > 1 chains that many decode steps on device per host
        sync (`lax.scan`) — through a high-latency link the per-token
        host fetch dominates otherwise (measured 138 ms/token on the
        dev tunnel vs ~2 ms on-device). A stop mid-burst wastes at most
        burst-1 device steps; emitted tokens are identical."""
        fns = self._jitted_generate_fns()
        cross = fns["encode_cross"](params, features)
        b = features.shape[0]
        cache = self.new_cache(b, quantized=quantized_cache)
        decode_step = fns["step"]
        decode_burst = fns["burst"]

        tokens = jnp.full((b, 1), start_token, jnp.int32)
        logits, cache = decode_step(params, tokens, cross, cache)
        cur = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
        out = [np.asarray(cur).copy()]
        stopped = (eos_token is not None
                   and (out[-1] == eos_token).all())
        while len(out) < max_tokens and not stopped:
            if burst <= 1:
                logits, cache = decode_step(params, cur[:, None], cross,
                                            cache)
                cur = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
                rows = np.asarray(cur)[None]
            else:
                # Always a full burst (one compiled program); overshoot
                # past max_tokens/eos is truncated host-side.
                toks, cur, cache = decode_burst(params, cur, cross, cache,
                                                burst)
                rows = np.asarray(toks)
            for row in rows:
                out.append(row.copy())
                if eos_token is not None and (row == eos_token).all():
                    stopped = True
                    break
                if len(out) >= max_tokens:
                    break
        return np.stack(out[:max_tokens], axis=1)


def log_mel_spectrogram(audio, sample_rate=16000, n_mels=80, n_fft=400,
                        hop=160):
    """Whisper-style log-mel features from mono PCM (host-side numpy)."""
    audio = np.asarray(audio, np.float32)
    window = np.hanning(n_fft).astype(np.float32)
    n_frames = 1 + max(0, (len(audio) - n_fft)) // hop
    frames = np.stack([audio[i * hop:i * hop + n_fft] * window
                       for i in range(n_frames)])
    spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
    # Triangular mel filter bank.
    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    mel_pts = mel_to_hz(np.linspace(hz_to_mel(0), hz_to_mel(sample_rate / 2),
                                    n_mels + 2))
    bins = np.floor((n_fft + 1) * mel_pts / sample_rate).astype(int)
    fb = np.zeros((n_mels, spec.shape[-1]), np.float32)
    for m in range(1, n_mels + 1):
        lo, center, hi = bins[m - 1], bins[m], bins[m + 1]
        for k in range(lo, center):
            if center > lo:
                fb[m - 1, k] = (k - lo) / (center - lo)
        for k in range(center, hi):
            if hi > center:
                fb[m - 1, k] = (hi - k) / (hi - center)
    mel = spec @ fb.T
    log_mel = np.log10(np.maximum(mel, 1e-10))
    log_mel = np.maximum(log_mel, log_mel.max() - 8.0)
    return ((log_mel + 4.0) / 4.0).astype(np.float32)
