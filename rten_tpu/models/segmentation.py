"""Semantic segmentation: ResNet backbone + ASPP dilated-conv head
(DeepLab-class; reference example: rten-examples/src/deeplab.rs, which
runs the analogous ONNX DeepLabV3-MobileNet graph).

TPU-native design notes: the whole network is dense NCHW convolution —
`conv_general_dilated` maps ASPP's dilation rates directly to XLA's
rhs_dilation, so every branch is one MXU implicit-GEMM conv; the final
bilinear upsample is `jax.image.resize` (XLA gather/dot fusion). No
graph surgery is needed for the dilated stride trick at this output
stride (the head runs at 1/32 like torchvision's default).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .resnet import ResNet, ResNetConfig


@dataclass(frozen=True)
class SegmentationConfig:
    backbone: ResNetConfig = field(default_factory=lambda: ResNetConfig(50))
    n_classes: int = 21              # PASCAL VOC
    aspp_channels: int = 256
    aspp_rates: tuple = (1, 6, 12, 18)

    @staticmethod
    def tiny_test(**kw):
        return SegmentationConfig(**{**dict(
            backbone=ResNetConfig(18, n_classes=10), n_classes=4,
            aspp_channels=32, aspp_rates=(1, 2)), **kw})


class Segmenter:
    def __init__(self, config: SegmentationConfig = SegmentationConfig()):
        self.config = config
        self.backbone = ResNet(config.backbone)

    def _backbone_channels(self):
        cfg = self.config.backbone
        expansion = 4 if cfg.bottleneck else 1
        return 64 * 2 ** (len(cfg.stages) - 1) * expansion

    def init_params(self, key) -> dict:
        cfg = self.config
        rng = np.random.RandomState(1)
        c_in = self._backbone_channels()
        ch = cfg.aspp_channels

        def conv(c_out, c_inp, k):
            fan_in = c_inp * k * k
            return (rng.randn(c_out, c_inp, k, k)
                    * np.sqrt(2.0 / fan_in)).astype(np.float32)

        params = {"backbone": self.backbone.init_params(key)}
        for i, rate in enumerate(cfg.aspp_rates):
            k = 1 if rate == 1 else 3
            params[f"aspp{i}.w"] = conv(ch, c_in, k)
            params[f"aspp{i}.b"] = np.zeros(ch, np.float32)
        # Image-level pooling branch + 1x1 fuse + classifier.
        params["pool.w"] = conv(ch, c_in, 1)
        params["pool.b"] = np.zeros(ch, np.float32)
        params["fuse.w"] = conv(ch, ch * (len(cfg.aspp_rates) + 1), 1)
        params["fuse.b"] = np.zeros(ch, np.float32)
        params["cls.w"] = conv(cfg.n_classes, ch, 1)
        params["cls.b"] = np.zeros(cfg.n_classes, np.float32)
        return params

    @staticmethod
    def _conv(x, w, b, dilation=1):
        k = w.shape[-1]
        pad = dilation * (k - 1) // 2
        out = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(pad, pad), (pad, pad)],
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32)
        return out + b.reshape(1, -1, 1, 1)

    def forward(self, params, x):
        """x: [B, 3, H, W] → per-pixel class logits [B, n_classes, H, W]."""
        cfg = self.config
        b, _, h, w = x.shape
        feat = self.backbone.features(params["backbone"], x)

        branches = []
        for i, rate in enumerate(cfg.aspp_rates):
            br = jnp.maximum(self._conv(
                feat, params[f"aspp{i}.w"], params[f"aspp{i}.b"],
                dilation=rate), 0)
            branches.append(br)
        # Image-level context: global average pool → 1x1 conv → broadcast.
        pooled = jnp.mean(feat, axis=(2, 3), keepdims=True)
        pooled = jnp.maximum(self._conv(pooled, params["pool.w"],
                                        params["pool.b"]), 0)
        branches.append(jnp.broadcast_to(
            pooled, branches[0].shape[:1] + pooled.shape[1:2]
            + branches[0].shape[2:]))

        fused = jnp.maximum(self._conv(jnp.concatenate(branches, axis=1),
                                       params["fuse.w"], params["fuse.b"]),
                            0)
        logits = self._conv(fused, params["cls.w"], params["cls.b"])
        return jax.image.resize(logits, (b, cfg.n_classes, h, w),
                                method="bilinear")

    def predict(self, params, x):
        """Per-pixel class ids [B, H, W] int32."""
        return jnp.argmax(self.forward(params, x), axis=1).astype(jnp.int32)
