"""ViT-family vision encoders: plain ViT (classification / feature
extraction) plus a DPT-style dense-prediction head (depth estimation).

Covers the reference's ViT-based examples — depth_anything
(rten-examples/src/depth_anything.rs), segment_anything's image encoder
(rten-examples/src/segment_anything.rs), and distilvit's vision tower —
as native TPU models: patch embedding as one conv (an MXU matmul after
XLA's implicit im2col), encoder blocks reusing the verified transformer
norm/attention math, and a fused bilinear-upsample DPT head.

TPU-first notes: all shapes static (one jit per input size); attention
over patch tokens uses the Pallas flash kernel when shapes allow, else
XLA's fused attention; bf16-friendly (norm statistics stay f32 via
models.transformer._norm).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.attention import _attn_reference, flash_attention
from .transformer import _norm


@dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    in_channels: int = 3
    d_model: int = 384
    n_layers: int = 12
    n_heads: int = 6
    d_ff: int = 1536
    n_classes: int = 1000
    layer_norm_eps: float = 1e-6
    use_cls_token: bool = True
    use_pallas: bool = True
    norm: str = "layernorm"          # consumed by _norm

    @property
    def n_patches(self):
        return (self.image_size // self.patch_size) ** 2

    @property
    def head_dim(self):
        return self.d_model // self.n_heads

    @staticmethod
    def tiny_test(**kw):
        return ViTConfig(**{**dict(image_size=32, patch_size=8,
                                   d_model=64, n_layers=2, n_heads=4,
                                   d_ff=128, n_classes=10), **kw})


class ViT:
    def __init__(self, config: ViTConfig):
        self.config = config

    def init_params(self, key) -> dict:
        cfg = self.config
        rng = np.random.default_rng(0)
        d = cfg.d_model

        def dense(*shape):
            fan_in = int(np.prod(shape[:-1]))
            return jnp.asarray(
                (rng.standard_normal(shape, dtype=np.float32)
                 / math.sqrt(fan_in)))

        n_tokens = cfg.n_patches + (1 if cfg.use_cls_token else 0)
        params = {
            # Patch embedding: conv weight [P*P*C, d] (image unfolded to
            # patches → one matmul; equivalent to stride-P conv).
            "patch_w": dense(cfg.patch_size * cfg.patch_size
                             * cfg.in_channels, d),
            "patch_b": jnp.zeros(d),
            "pos_embed": jnp.asarray(
                rng.standard_normal((n_tokens, d), dtype=np.float32) * 0.02),
            "ln_f_scale": jnp.ones(d),
            "ln_f_bias": jnp.zeros(d),
            "head": dense(d, cfg.n_classes),
            "head_b": jnp.zeros(cfg.n_classes),
            "layers": [],
        }
        if cfg.use_cls_token:
            params["cls"] = jnp.zeros((1, 1, d))
        for _ in range(cfg.n_layers):
            params["layers"].append({
                "ln1_scale": jnp.ones(d), "ln1_bias": jnp.zeros(d),
                "wqkv": dense(d, 3 * d), "bqkv": jnp.zeros(3 * d),
                "wo": dense(d, d), "bo": jnp.zeros(d),
                "ln2_scale": jnp.ones(d), "ln2_bias": jnp.zeros(d),
                "w_up": dense(d, cfg.d_ff), "b_up": jnp.zeros(cfg.d_ff),
                "w_down": dense(cfg.d_ff, d), "b_down": jnp.zeros(d),
            })
        return params

    # -- pieces --------------------------------------------------------------

    def patchify(self, images):
        """[B, C, H, W] → [B, n_patches, P*P*C] (space-to-depth unfold;
        XLA lowers reshape+transpose into the consuming matmul)."""
        cfg = self.config
        b, c, h, w = images.shape
        p = cfg.patch_size
        x = images.reshape(b, c, h // p, p, w // p, p)
        x = x.transpose(0, 2, 4, 3, 5, 1)          # [B, Hp, Wp, p, p, C]
        return x.reshape(b, (h // p) * (w // p), p * p * c)

    def _attention(self, lp, x):
        cfg = self.config
        b, s, d = x.shape
        h, hd = cfg.n_heads, cfg.head_dim
        qkv = jnp.matmul(x, lp["wqkv"]) + lp["bqkv"]
        q, k, v = [t.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
                   for t in jnp.split(qkv, 3, axis=-1)]
        if cfg.use_pallas:
            out = flash_attention(q, k, v, causal=False)
        else:
            out = _attn_reference(q, k, v, False, 1.0 / math.sqrt(hd))
        out = out.transpose(0, 2, 1, 3).reshape(b, s, d)
        return jnp.matmul(out, lp["wo"]) + lp["bo"]

    def encode(self, params, images):
        """[B, C, H, W] → token features [B, n_tokens, d]."""
        cfg = self.config
        x = jnp.matmul(self.patchify(images), params["patch_w"]) \
            + params["patch_b"]
        if cfg.use_cls_token:
            cls = jnp.broadcast_to(params["cls"],
                                   (x.shape[0], 1, cfg.d_model))
            x = jnp.concatenate([cls, x], axis=1)
        x = x + params["pos_embed"][None]
        for lp in params["layers"]:
            x = x + self._attention(
                lp, _norm(cfg, x, lp["ln1_scale"], lp["ln1_bias"]))
            hidden = jnp.matmul(
                _norm(cfg, x, lp["ln2_scale"], lp["ln2_bias"]),
                lp["w_up"]) + lp["b_up"]
            x = x + (jnp.matmul(jax.nn.gelu(hidden, approximate=False),
                                lp["w_down"]) + lp["b_down"])
        return _norm(cfg, x, params["ln_f_scale"], params["ln_f_bias"])

    def classify(self, params, images):
        """Logits [B, n_classes] from the CLS token (or mean-pool)."""
        feats = self.encode(params, images)
        pooled = feats[:, 0] if self.config.use_cls_token \
            else feats.mean(axis=1)
        return jnp.matmul(pooled, params["head"]) + params["head_b"]


# ---------------------------------------------------------------------------
# DPT-style dense head (depth-anything-class)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class DepthConfig:
    vit: ViTConfig = ViTConfig(use_cls_token=False)
    head_dim: int = 64

    @staticmethod
    def tiny_test():
        return DepthConfig(vit=ViTConfig.tiny_test(use_cls_token=False))


class DepthEstimator:
    """ViT encoder + lightweight DPT head: patch tokens → per-patch depth
    → bilinear upsample to pixel resolution (reference example:
    rten-examples/src/depth_anything.rs drives the same shape contract:
    [B, 3, H, W] → [B, H, W] relative depth)."""

    def __init__(self, config: DepthConfig):
        self.config = config
        self.vit = ViT(config.vit)

    def init_params(self, key) -> dict:
        rng = np.random.default_rng(1)
        d, hd = self.config.vit.d_model, self.config.head_dim
        params = {"vit": self.vit.init_params(key)}
        params["proj"] = jnp.asarray(
            rng.standard_normal((d, hd), dtype=np.float32) / math.sqrt(d))
        params["proj_b"] = jnp.zeros(hd)
        params["out"] = jnp.asarray(
            rng.standard_normal((hd, 1), dtype=np.float32) / math.sqrt(hd))
        params["out_b"] = jnp.zeros(1)
        return params

    def predict(self, params, images):
        cfg = self.config.vit
        b = images.shape[0]
        hp = images.shape[2] // cfg.patch_size
        wp = images.shape[3] // cfg.patch_size
        feats = self.vit.encode(params["vit"], images)   # [B, Hp*Wp, d]
        x = jax.nn.relu(jnp.matmul(feats, params["proj"])
                        + params["proj_b"])
        depth = jnp.matmul(x, params["out"]) + params["out_b"]
        depth = depth.reshape(b, hp, wp)
        return jax.image.resize(depth,
                                (b, images.shape[2], images.shape[3]),
                                method="bilinear")
