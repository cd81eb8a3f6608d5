"""Text-to-speech: phoneme encoder → duration-regulated frames → mel
decoder → convolutional vocoder (VITS/piper-class; reference example:
rten-examples/src/piper.rs, which runs the analogous ONNX VITS graph).

TPU-native design notes: VITS's data-dependent length regulation (each
phoneme repeats for its predicted duration) is re-expressed as a
fixed-shape gather — durations → cumsum → `searchsorted` from a static
frame grid — so the whole pipeline jits with static shapes (the frame
budget is a config cap, excess frames are masked). The vocoder's
transposed 1-D convs lower to `conv_general_dilated` with lhs_dilation
(MXU implicit-GEMM), not scalar loops.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .transformer import _rope  # reuse rotary helper for encoder positions


@dataclass(frozen=True)
class TTSConfig:
    vocab_size: int = 256          # phoneme inventory
    d_model: int = 192
    n_layers: int = 4
    n_heads: int = 2
    d_ff: int = 768
    n_mels: int = 80
    max_phonemes: int = 256
    max_frames: int = 512          # static frame budget (masked beyond)
    hop: int = 64                  # vocoder upsampling factor (samples/frame)
    layer_norm_eps: float = 1e-5

    @staticmethod
    def tiny_test(**kw):
        return TTSConfig(**{**dict(vocab_size=32, d_model=32, n_layers=2,
                                   n_heads=2, d_ff=64, n_mels=8,
                                   max_phonemes=16, max_frames=32, hop=16),
                            **kw})


class TextToSpeech:
    def __init__(self, config: TTSConfig = TTSConfig()):
        self.config = config

    def init_params(self, key) -> dict:
        cfg = self.config
        rng = np.random.RandomState(0)
        d, dff = cfg.d_model, cfg.d_ff

        def dense(*shape):
            return (rng.randn(*shape)
                    / np.sqrt(shape[0])).astype(np.float32)

        params = {
            "embed": dense(cfg.vocab_size, d) * np.sqrt(d),
            "dur_w": dense(d, 1), "dur_b": np.zeros(1, np.float32),
            "mel_w": dense(d, cfg.n_mels),
            "mel_b": np.zeros(cfg.n_mels, np.float32),
            # post-net: two 1-D convs over frames refining the mel.
            "post1.w": dense(5 * cfg.n_mels, cfg.n_mels).reshape(
                cfg.n_mels, cfg.n_mels, 5),
            "post1.b": np.zeros(cfg.n_mels, np.float32),
            # vocoder: two transposed convs, each upsampling by sqrt(hop).
            "layers": [],
        }
        up = int(np.sqrt(cfg.hop))
        assert up * up == cfg.hop, "hop must be a square (two-stage voc)"
        ch = 32
        params["voc1.w"] = dense(2 * up * cfg.n_mels, ch).reshape(
            cfg.n_mels, ch, 2 * up)
        params["voc1.b"] = np.zeros(ch, np.float32)
        params["voc2.w"] = dense(2 * up * ch, 1).reshape(ch, 1, 2 * up)
        params["voc2.b"] = np.zeros(1, np.float32)
        for _ in range(cfg.n_layers):
            params["layers"].append({
                "ln1_scale": np.ones(d, np.float32),
                "ln1_bias": np.zeros(d, np.float32),
                "wqkv": dense(d, 3 * d), "wo": dense(d, d),
                "ln2_scale": np.ones(d, np.float32),
                "ln2_bias": np.zeros(d, np.float32),
                "w_up": dense(d, dff), "w_down": dense(dff, d),
            })
        return jax.tree_util.tree_map(jnp.asarray, params)

    def _ln(self, x, scale, bias):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return ((x - mean) * jax.lax.rsqrt(var + self.config.layer_norm_eps)
                * scale + bias)

    def encode(self, params, phonemes, lengths):
        """phonemes [B, P] int32, lengths [B] → hidden [B, P, d]."""
        cfg = self.config
        b, p = phonemes.shape
        h, hd = cfg.n_heads, cfg.d_model // cfg.n_heads
        x = jnp.take(params["embed"], phonemes, axis=0)
        positions = jnp.broadcast_to(jnp.arange(p)[None], (b, p))
        mask = (jnp.arange(p)[None] < lengths[:, None])
        attn_mask = (mask[:, None, None, :]).astype(jnp.float32)
        for layer in params["layers"]:
            y = self._ln(x, layer["ln1_scale"], layer["ln1_bias"])
            qkv = y @ layer["wqkv"]
            q, k, v = jnp.split(qkv.reshape(b, p, h, 3 * hd), 3, axis=-1)
            q = _rope(q.transpose(0, 2, 1, 3), positions, 10000.0)
            k = _rope(k.transpose(0, 2, 1, 3), positions, 10000.0)
            v = v.transpose(0, 2, 1, 3)
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
            s = jnp.where(attn_mask > 0, s, -1e30)
            a = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
            x = x + o.transpose(0, 2, 1, 3).reshape(b, p, -1) @ layer["wo"]
            y = self._ln(x, layer["ln2_scale"], layer["ln2_bias"])
            x = x + jax.nn.gelu(y @ layer["w_up"]) @ layer["w_down"]
        return x * mask[..., None]

    def length_regulate(self, hidden, durations, lengths):
        """Repeat each phoneme's hidden vector for its duration — as a
        static-shape gather: frame t belongs to the first phoneme whose
        cumulative duration exceeds t. Returns (frames [B, T, d],
        frame_mask [B, T], n_frames [B])."""
        cfg = self.config
        b, p, d = hidden.shape
        pmask = jnp.arange(p)[None] < lengths[:, None]
        durations = jnp.where(pmask, durations, 0)
        ends = jnp.cumsum(durations, axis=1)            # [B, P]
        n_frames = jnp.minimum(ends[:, -1], cfg.max_frames).astype(jnp.int32)
        t = jnp.arange(cfg.max_frames)[None]            # [1, T]
        # searchsorted per batch row: phoneme index for each frame.
        idx = jnp.sum((ends[:, None, :] <= t[:, :, None]).astype(jnp.int32),
                      axis=-1)                          # [B, T]
        idx = jnp.minimum(idx, p - 1)
        frames = jnp.take_along_axis(hidden, idx[..., None], axis=1)
        fmask = t < n_frames[:, None]
        return frames * fmask[..., None], fmask, n_frames

    def mel(self, params, frames, fmask):
        """frames [B, T, d] → mel [B, T, n_mels] (with conv post-net)."""
        m = frames @ params["mel_w"] + params["mel_b"]
        # 1-D conv over frames (NCW): refine with local context.
        x = m.transpose(0, 2, 1)
        w = params["post1.w"].transpose(1, 0, 2)        # [out, in, k]
        x = jax.lax.conv_general_dilated(
            x, w, (1,), [(2, 2)], dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32)
        x = x + params["post1.b"].reshape(1, -1, 1)
        return (m + jnp.tanh(x.transpose(0, 2, 1))) * fmask[..., None]

    def vocode(self, params, mel):
        """mel [B, T, n_mels] → waveform [B, T*hop] via two transposed
        convs (lhs_dilation = stride-up on the MXU)."""
        cfg = self.config
        up = int(np.sqrt(cfg.hop))

        def tconv(x, w, b, stride):
            # Transposed conv via lhs_dilation; output length T*stride
            # needs pad_lo + pad_hi = k + stride - 2.
            k = w.shape[-1]
            total = k + stride - 2
            pad = total // 2
            out = jax.lax.conv_general_dilated(
                x, w, (1,), [(pad, total - pad)],
                lhs_dilation=(stride,),
                dimension_numbers=("NCH", "IOH", "NCH"),
                preferred_element_type=jnp.float32)
            return out + b.reshape(1, -1, 1)

        x = mel.transpose(0, 2, 1)                      # [B, n_mels, T]
        x = jax.nn.leaky_relu(tconv(x, params["voc1.w"], params["voc1.b"],
                                    up), 0.1)
        x = tconv(x, params["voc2.w"], params["voc2.b"], up)
        return jnp.tanh(x[:, 0])                        # [B, T*hop]

    def synthesize(self, params, phonemes, lengths, pace=1.0):
        """Full pipeline: phoneme ids → waveform. Returns (wave [B, S],
        n_samples [B])."""
        hidden = self.encode(params, phonemes, lengths)
        log_dur = (hidden @ params["dur_w"] + params["dur_b"])[..., 0]
        durations = jnp.round(
            jnp.exp(jnp.clip(log_dur, -3, 3)) * pace).astype(jnp.int32)
        durations = jnp.maximum(durations, 1)
        frames, fmask, n_frames = self.length_regulate(hidden, durations,
                                                       lengths)
        mel = self.mel(params, frames, fmask)
        wave = self.vocode(params, mel)
        return wave, n_frames * self.config.hop
