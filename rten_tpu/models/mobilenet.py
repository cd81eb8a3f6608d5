"""MobileNetV3 (BASELINE config 2: MobileNetV3 + DETR vision graphs).

Inverted-residual blocks with depthwise convs, squeeze-excite, and
hard-swish — exercises the grouped-conv, HardSigmoid/HardSwish and
GlobalAveragePool lowerings. Native forward + `.rten` graph emission,
cross-checked like ResNet.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

# MobileNetV3-Small block table:
# (kernel, expanded, out, use_se, activation, stride)
_SMALL_BLOCKS = [
    (3, 16, 16, True, "relu", 2),
    (3, 72, 24, False, "relu", 2),
    (3, 88, 24, False, "relu", 1),
    (5, 96, 40, True, "hswish", 2),
    (5, 240, 40, True, "hswish", 1),
    (5, 240, 40, True, "hswish", 1),
    (5, 120, 48, True, "hswish", 1),
    (5, 144, 48, True, "hswish", 1),
    (5, 288, 96, True, "hswish", 2),
    (5, 576, 96, True, "hswish", 1),
    (5, 576, 96, True, "hswish", 1),
]


@dataclass(frozen=True)
class MobileNetV3Config:
    n_classes: int = 1000
    width: float = 1.0


def _hswish(x):
    return x * jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


def _hsigmoid(x):
    return jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


class MobileNetV3:
    def __init__(self, config: MobileNetV3Config = MobileNetV3Config()):
        self.config = config

    def _block_specs(self):
        w = self.config.width

        def c(ch):
            return max(8, int(ch * w + 4) // 8 * 8)
        specs = []
        in_ch = c(16)
        for kernel, expanded, out, use_se, act, stride in _SMALL_BLOCKS:
            specs.append((in_ch, kernel, c(expanded), c(out), use_se, act,
                          stride))
            in_ch = c(out)
        return c(16), specs, c(576), c(1024)

    def init_params(self, key) -> dict:
        rng = np.random.RandomState(0)
        stem_ch, specs, head_ch, fc_ch = self._block_specs()

        def conv_w(o, i, k):
            return (rng.randn(o, i, k, k) *
                    np.sqrt(2.0 / (i * k * k))).astype(np.float32)

        def bn(ch):
            return {"scale": np.ones(ch, np.float32),
                    "bias": np.zeros(ch, np.float32),
                    "mean": np.zeros(ch, np.float32),
                    "var": np.ones(ch, np.float32)}

        params = {"stem.w": conv_w(stem_ch, 3, 3), "stem.bn": bn(stem_ch),
                  "blocks": []}
        for in_ch, kernel, exp, out, use_se, act, stride in specs:
            block = {
                "expand.w": conv_w(exp, in_ch, 1), "expand.bn": bn(exp),
                "dw.w": conv_w(exp, 1, kernel), "dw.bn": bn(exp),
                "project.w": conv_w(out, exp, 1), "project.bn": bn(out),
            }
            if use_se:
                squeeze = max(8, exp // 4 // 8 * 8)
                block["se.down.w"] = conv_w(squeeze, exp, 1)
                block["se.down.b"] = np.zeros(squeeze, np.float32)
                block["se.up.w"] = conv_w(exp, squeeze, 1)
                block["se.up.b"] = np.zeros(exp, np.float32)
            params["blocks"].append(block)
        last_in = specs[-1][3]
        params["head.w"] = conv_w(head_ch, last_in, 1)
        params["head.bn"] = bn(head_ch)
        params["fc1.w"] = (rng.randn(head_ch, fc_ch) * 0.02).astype(np.float32)
        params["fc1.b"] = np.zeros(fc_ch, np.float32)
        params["fc2.w"] = (rng.randn(fc_ch, self.config.n_classes)
                           * 0.02).astype(np.float32)
        params["fc2.b"] = np.zeros(self.config.n_classes, np.float32)
        return params

    @staticmethod
    def _conv(x, w, stride=1, pad=0, groups=1):
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=groups,
            preferred_element_type=jnp.float32)

    @staticmethod
    def _bn(x, p, eps=1e-3):
        shape = (1, -1, 1, 1)
        return ((x - p["mean"].reshape(shape))
                * jax.lax.rsqrt(p["var"].reshape(shape) + eps)
                * p["scale"].reshape(shape) + p["bias"].reshape(shape))

    def forward(self, params, x):
        _, specs, _, _ = self._block_specs()
        out = _hswish(self._bn(self._conv(x, params["stem.w"], stride=2,
                                          pad=1), params["stem.bn"]))
        for block, (in_ch, kernel, exp, out_ch, use_se, act, stride) \
                in zip(params["blocks"], specs):
            activate = _hswish if act == "hswish" else (
                lambda v: jnp.maximum(v, 0))
            h = activate(self._bn(self._conv(out, block["expand.w"]),
                                  block["expand.bn"]))
            h = activate(self._bn(
                self._conv(h, block["dw.w"], stride=stride,
                           pad=kernel // 2, groups=exp), block["dw.bn"]))
            if use_se:
                s = jnp.mean(h, axis=(2, 3), keepdims=True)
                s = jnp.maximum(self._conv(s, block["se.down.w"])
                                + block["se.down.b"].reshape(1, -1, 1, 1), 0)
                s = _hsigmoid(self._conv(s, block["se.up.w"])
                              + block["se.up.b"].reshape(1, -1, 1, 1))
                h = h * s
            h = self._bn(self._conv(h, block["project.w"]),
                         block["project.bn"])
            if stride == 1 and h.shape == out.shape:
                h = h + out
            out = h
        out = _hswish(self._bn(self._conv(out, params["head.w"]),
                               params["head.bn"]))
        out = jnp.mean(out, axis=(2, 3))
        out = _hswish(out @ params["fc1.w"] + params["fc1.b"])
        return out @ params["fc2.w"] + params["fc2.b"]

    # -- .rten emission ----------------------------------------------------

    def build_rten(self, params, input_shape=("batch", 3, 224, 224)):
        from ..fmt.model_builder import ModelBuilder

        _, specs, _, _ = self._block_specs()
        mb = ModelBuilder()
        g = mb.graph
        x = g.add_value("input", shape=list(input_shape))

        def conv(inp, w, name, stride=1, pad=0, groups=1, bias=None):
            wid = g.add_constant(f"{name}.w", w)
            bid = g.add_constant(f"{name}.b", bias) if bias is not None \
                else None
            return g.add_operator(
                "Conv", [inp, wid, bid],
                attrs={"auto_pad": 1, "pads": [pad, pad, pad, pad],
                       "strides": [stride, stride], "groups": groups,
                       "dilations": [1, 1]}, name=name)

        def bn(inp, p, name):
            args = [inp] + [g.add_constant(f"{name}.{k}", p[k])
                            for k in ("scale", "bias", "mean", "var")]
            return g.add_operator("BatchNormalization", args,
                                  attrs={"epsilon": 1e-3}, name=name)

        def act(inp, kind, name):
            op = "HardSwish" if kind == "hswish" else "Relu"
            return g.add_operator(op, [inp], name=name)

        out = act(bn(conv(x, params["stem.w"], "stem", stride=2, pad=1),
                     params["stem.bn"], "stem.bn"), "hswish", "stem.act")
        for i, (block, (in_ch, kernel, exp, out_ch, use_se, kind, stride)) \
                in enumerate(zip(params["blocks"], specs)):
            p = f"b{i}"
            h = act(bn(conv(out, block["expand.w"], f"{p}.expand"),
                       block["expand.bn"], f"{p}.expand.bn"), kind,
                    f"{p}.expand.act")
            h = act(bn(conv(h, block["dw.w"], f"{p}.dw", stride=stride,
                            pad=kernel // 2, groups=exp),
                       block["dw.bn"], f"{p}.dw.bn"), kind, f"{p}.dw.act")
            if use_se:
                s = g.add_operator("GlobalAveragePool", [h], name=f"{p}.se.gap")
                s = conv(s, block["se.down.w"], f"{p}.se.down",
                         bias=block["se.down.b"])
                s = g.add_operator("Relu", [s], name=f"{p}.se.relu")
                s = conv(s, block["se.up.w"], f"{p}.se.up",
                         bias=block["se.up.b"])
                s = g.add_operator("HardSigmoid", [s],
                                   attrs={"alpha": 1 / 6, "beta": 0.5},
                                   name=f"{p}.se.gate")
                h = g.add_operator("Mul", [h, s], name=f"{p}.se.scale")
            h = bn(conv(h, block["project.w"], f"{p}.project"),
                   block["project.bn"], f"{p}.project.bn")
            if stride == 1 and in_ch == out_ch:
                h = g.add_operator("Add", [h, out], name=f"{p}.residual")
            out = h
        out = act(bn(conv(out, params["head.w"], "head"),
                     params["head.bn"], "head.bn"), "hswish", "head.act")
        out = g.add_operator("GlobalAveragePool", [out], name="gap")
        out = g.add_operator("Flatten", [out], attrs={"axis": 1},
                             name="flatten")
        w1 = g.add_constant("fc1.w", params["fc1.w"])
        b1 = g.add_constant("fc1.b", params["fc1.b"])
        out = g.add_operator("Gemm", [out, w1, b1],
                             attrs={"alpha": 1.0, "beta": 1.0}, name="fc1")
        out = g.add_operator("HardSwish", [out], name="fc1.act")
        w2 = g.add_constant("fc2.w", params["fc2.w"])
        b2 = g.add_constant("fc2.b", params["fc2.b"])
        out = g.add_operator("Gemm", [out, w2, b2],
                             attrs={"alpha": 1.0, "beta": 1.0}, name="fc2")
        g.inputs, g.outputs = [x], [out]
        mb.metadata = {"description": "MobileNetV3-Small (rten_tpu native)"}
        return mb
