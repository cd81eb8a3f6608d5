"""Promptable segmentation: ViT image encoder + point-prompt encoder +
two-way-attention mask decoder (Segment-Anything-class; reference
example: rten-examples/src/segment_anything.rs, which runs the
analogous ONNX SAM encoder/decoder pair).

TPU-native design notes: the decoder mirrors SAM's structure at demo
scale — learned output tokens + Fourier-embedded point prompts cross-
attend with the frozen image embedding (dense [tokens × patches]
attention: tiny, XLA-fused), then mask logits are the dot product of
the mask token with a 4×-upscaled per-patch embedding (two transposed
convs). Everything is static-shape; the number of prompt points is a
config cap with a validity mask.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .transformer import _norm
from .vit import ViT, ViTConfig


@dataclass(frozen=True)
class SAMConfig:
    vit: ViTConfig = field(default_factory=lambda: ViTConfig(
        image_size=224, patch_size=16, d_model=384, n_layers=12,
        n_heads=6, d_ff=1536, use_cls_token=False))
    decoder_layers: int = 2
    n_heads: int = 8
    max_points: int = 8
    upscale: int = 4             # mask resolution = patch grid × upscale
    norm: str = "layernorm"      # consumed by transformer._norm
    layer_norm_eps: float = 1e-6

    @property
    def d(self):
        return self.vit.d_model

    @staticmethod
    def tiny_test(**kw):
        return SAMConfig(**{**dict(
            vit=ViTConfig.tiny_test(use_cls_token=False),
            decoder_layers=1, n_heads=4, max_points=4), **kw})


def fourier_point_embedding(points, d, n_freqs=None):
    """[..., 2] normalized coords in [0, 1] → [..., d] Fourier features
    (SAM's random-Gaussian variant replaced by a fixed log-spaced bank —
    deterministic, checkpoint-free)."""
    n_freqs = n_freqs or d // 4
    freqs = 2.0 ** jnp.arange(n_freqs) * math.pi        # [F]
    ang = points[..., None, :] * freqs[:, None]          # [..., F, 2]
    feats = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    feats = feats.reshape(*points.shape[:-1], 4 * n_freqs)
    if feats.shape[-1] < d:
        feats = jnp.pad(feats, (*[(0, 0)] * (feats.ndim - 1),
                                (0, d - feats.shape[-1])))
    return feats[..., :d]


class SAM:
    def __init__(self, config: SAMConfig = SAMConfig()):
        self.config = config
        self.encoder = ViT(config.vit)

    def init_params(self, key) -> dict:
        cfg = self.config
        rng = np.random.RandomState(0)
        d = cfg.d

        def dense(*shape):
            return jnp.asarray((rng.randn(*shape)
                                / np.sqrt(shape[0])).astype(np.float32))

        params = {
            "encoder": self.encoder.init_params(key),
            # Output tokens: [mask, iou] (SAM has 4 mask tokens; the demo
            # keeps one mask + one quality token).
            "out_tokens": dense(2, d),
            "label_embed": dense(2, d),      # fg / bg point labels
            "point_proj": dense(d, d),
            "iou_w": dense(d, 1), "iou_b": jnp.zeros(1),
            "up1.w": jnp.asarray((rng.randn(d, d // 2, 2, 2)
                                  / np.sqrt(d)).astype(np.float32)),
            "up1.b": jnp.zeros(d // 2),
            "up2.w": jnp.asarray((rng.randn(d // 2, d // 4, 2, 2)
                                  / np.sqrt(d // 2)).astype(np.float32)),
            "up2.b": jnp.zeros(d // 4),
            "mask_mlp": dense(d, d // 4),
            "layers": [],
        }
        for _ in range(cfg.decoder_layers):
            params["layers"].append({
                "t2i_q": dense(d, d), "t2i_k": dense(d, d),
                "t2i_v": dense(d, d), "t2i_o": dense(d, d),
                "i2t_q": dense(d, d), "i2t_k": dense(d, d),
                "i2t_v": dense(d, d), "i2t_o": dense(d, d),
                "ln1_scale": jnp.ones(d), "ln1_bias": jnp.zeros(d),
                "ln2_scale": jnp.ones(d), "ln2_bias": jnp.zeros(d),
                "w_up": dense(d, 2 * d), "w_down": dense(2 * d, d),
            })
        return params

    def _xattn(self, q_in, kv_in, wq, wk, wv, wo, q_mask=None, kv_mask=None):
        cfg = self.config
        h = cfg.n_heads
        hd = cfg.d // h
        b, nq, _ = q_in.shape
        nk = kv_in.shape[1]
        q = (q_in @ wq).reshape(b, nq, h, hd).transpose(0, 2, 1, 3)
        k = (kv_in @ wk).reshape(b, nk, h, hd).transpose(0, 2, 1, 3)
        v = (kv_in @ wv).reshape(b, nk, h, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
        if kv_mask is not None:
            s = jnp.where(kv_mask[:, None, None, :], s, -1e30)
        a = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", a, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, nq, -1) @ wo
        if q_mask is not None:
            out = out * q_mask[..., None]
        return out

    def predict(self, params, images, points, point_labels, n_points):
        """images [B, 3, H, W]; points [B, P, 2] in [0, 1] coords;
        point_labels [B, P] int32 (1 fg / 0 bg); n_points [B].
        Returns (mask_logits [B, H, W], iou_pred [B])."""
        cfg = self.config
        b = images.shape[0]
        d = cfg.d
        g = cfg.vit.image_size // cfg.vit.patch_size

        img = self.encoder.encode(params["encoder"], images)  # [B, g*g, d]

        pmask = jnp.arange(cfg.max_points)[None] < n_points[:, None]
        pts = fourier_point_embedding(points, d) @ params["point_proj"]
        pts = pts + jnp.take(params["label_embed"], point_labels, axis=0)
        pts = pts * pmask[..., None]
        tokens = jnp.concatenate(
            [jnp.broadcast_to(params["out_tokens"][None], (b, 2, d)), pts],
            axis=1)
        tok_mask = jnp.concatenate(
            [jnp.ones((b, 2), bool), pmask], axis=1)

        for layer in params["layers"]:
            # tokens → image cross-attention, then image → tokens
            # (SAM's two-way block), each with a pre-norm residual MLP.
            tokens = tokens + self._xattn(
                tokens, img, layer["t2i_q"], layer["t2i_k"],
                layer["t2i_v"], layer["t2i_o"], q_mask=tok_mask)
            tokens = _norm(cfg, tokens, layer["ln1_scale"],
                           layer["ln1_bias"])
            img = img + self._xattn(
                img, tokens, layer["i2t_q"], layer["i2t_k"],
                layer["i2t_v"], layer["i2t_o"], kv_mask=tok_mask)
            tokens = tokens + jax.nn.gelu(
                tokens @ layer["w_up"]) @ layer["w_down"]
            tokens = _norm(cfg, tokens, layer["ln2_scale"],
                           layer["ln2_bias"])

        mask_tok, iou_tok = tokens[:, 0], tokens[:, 1]
        iou = jax.nn.sigmoid(
            (iou_tok @ params["iou_w"] + params["iou_b"])[:, 0])

        # Upscale per-patch embeddings 4× (two stride-2 transposed convs)
        # and dot with the mask token's hypernetwork projection.
        fmap = img.transpose(0, 2, 1).reshape(b, d, g, g)

        def tconv(x, w, bias):
            out = jax.lax.conv_general_dilated(
                x, w, (1, 1), [(0, 1), (0, 1)], lhs_dilation=(2, 2),
                dimension_numbers=("NCHW", "IOHW", "NCHW"),
                preferred_element_type=jnp.float32)
            return out + bias.reshape(1, -1, 1, 1)

        up = jax.nn.gelu(tconv(fmap, params["up1.w"], params["up1.b"]))
        up = tconv(up, params["up2.w"], params["up2.b"])   # [B, d/4, 4g, 4g]
        probe = mask_tok @ params["mask_mlp"]              # [B, d/4]
        mask = jnp.einsum("bc,bchw->bhw", probe, up)
        size = cfg.vit.image_size
        return jax.image.resize(mask, (b, size, size),
                                method="bilinear"), iou
