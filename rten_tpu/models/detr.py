"""DETR-style end-to-end object detector (BASELINE config 2:
MobileNetV3 + DETR vision graphs; reference example:
rten-examples/src/detr.rs).

Architecture (DETR: Carion et al. 2020): CNN backbone → 1×1 projection
to d_model + 2-D sine positional encodings → transformer encoder →
decoder over learned object queries (parallel, non-causal, no KV cache)
→ class + box heads. Detection is a single forward pass — no NMS
(set-based predictions), so the whole model jits cleanly.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.attention import _attn_reference
from .resnet import ResNet, ResNetConfig
from .transformer import linear


@dataclass(frozen=True)
class DetrConfig:
    n_classes: int = 91              # COCO + background handled via +1
    n_queries: int = 100
    d_model: int = 256
    n_heads: int = 8
    n_enc_layers: int = 6
    n_dec_layers: int = 6
    d_ff: int = 2048
    backbone_depth: int = 50

    @property
    def head_dim(self):
        return self.d_model // self.n_heads

    @staticmethod
    def tiny_test(**kw):
        return DetrConfig(**{**dict(
            n_classes=10, n_queries=8, d_model=64, n_heads=4,
            n_enc_layers=2, n_dec_layers=2, d_ff=128, backbone_depth=18),
            **kw})


def sine_position_embedding(h, w, d_model):
    """2-D sine/cosine position features [h*w, d_model] (DETR §3.2)."""
    d_half = d_model // 2
    ys = np.arange(h, dtype=np.float64)[:, None]
    xs = np.arange(w, dtype=np.float64)[None, :]
    dim_t = 10000.0 ** (2 * (np.arange(d_half // 2) // 1) / d_half)
    def encode(pos):
        v = pos[..., None] / dim_t
        return np.stack([np.sin(v), np.cos(v)], axis=-1).reshape(
            *pos.shape, -1)
    y_emb = encode(np.broadcast_to(ys, (h, w)))
    x_emb = encode(np.broadcast_to(xs, (h, w)))
    out = np.concatenate([y_emb, x_emb], axis=-1)[:, :, :d_model]
    return out.reshape(h * w, d_model).astype(np.float32)


class Detr:
    def __init__(self, config: DetrConfig = DetrConfig()):
        self.config = config
        self.backbone = ResNet(ResNetConfig(depth=config.backbone_depth,
                                            n_classes=1))

    def init_params(self, key) -> dict:
        cfg = self.config
        rng = np.random.RandomState(0)
        d, dff = cfg.d_model, cfg.d_ff

        def dense(*shape):
            return (rng.randn(*shape) / math.sqrt(shape[0])).astype(
                np.float32)

        def attn():
            return {"wq": dense(d, d), "wk": dense(d, d),
                    "wv": dense(d, d), "wo": dense(d, d),
                    "ln_scale": np.ones(d, np.float32),
                    "ln_bias": np.zeros(d, np.float32)}

        def mlp():
            return {"w_up": dense(d, dff),
                    "b_up": np.zeros(dff, np.float32),
                    "w_down": dense(dff, d),
                    "b_down": np.zeros(d, np.float32),
                    "ln_scale": np.ones(d, np.float32),
                    "ln_bias": np.zeros(d, np.float32)}

        backbone_params = self.backbone.init_params(None)
        backbone_out = {18: 512, 34: 512, 50: 2048, 101: 2048}[
            cfg.backbone_depth]
        params = {
            "backbone": backbone_params,
            "input_proj.w": dense(backbone_out, d),
            "input_proj.b": np.zeros(d, np.float32),
            "query_embed": (rng.randn(cfg.n_queries, d) * 0.02
                            ).astype(np.float32),
            "encoder": [{"attn": attn(), "mlp": mlp()}
                        for _ in range(cfg.n_enc_layers)],
            "decoder": [{"self_attn": attn(), "cross_attn": attn(),
                         "mlp": mlp()} for _ in range(cfg.n_dec_layers)],
            "class_head.w": dense(d, cfg.n_classes + 1),
            "class_head.b": np.zeros(cfg.n_classes + 1, np.float32),
            "bbox_head.w1": dense(d, d), "bbox_head.b1": np.zeros(d, np.float32),
            "bbox_head.w2": dense(d, d), "bbox_head.b2": np.zeros(d, np.float32),
            "bbox_head.w3": dense(d, 4), "bbox_head.b3": np.zeros(4, np.float32),
        }
        return params

    # -- building blocks ----------------------------------------------------

    def _heads(self, x):
        b, s, _ = x.shape
        cfg = self.config
        return x.reshape(b, s, cfg.n_heads, cfg.head_dim).transpose(
            0, 2, 1, 3)

    def _merge(self, x):
        b, h, s, hd = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b, s, h * hd)

    def _ln(self, x, scale, bias):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias

    def _attend(self, p, q_in, kv_in, q_pos=None, k_pos=None):
        cfg = self.config
        q = linear(q_in if q_pos is None else q_in + q_pos, p["wq"])
        k = linear(kv_in if k_pos is None else kv_in + k_pos, p["wk"])
        v = linear(kv_in, p["wv"])
        out = _attn_reference(self._heads(q), self._heads(k),
                              self._heads(v), False,
                              1.0 / math.sqrt(cfg.head_dim))
        return linear(self._merge(out), p["wo"])

    def _ffn(self, p, x):
        h = jnp.maximum(linear(x, p["w_up"], p["b_up"]), 0)
        return linear(h, p["w_down"], p["b_down"])

    # -- forward -----------------------------------------------------------

    def backbone_features(self, params, images):
        """Run the ResNet trunk up to the final stage (skip pool/fc)."""
        resnet = self.backbone
        p = params["backbone"]
        cfg_b = resnet.config
        out = resnet._conv(images, p["conv1.w"], stride=2, pad=3)
        out = jnp.maximum(resnet._bn(out, p, "bn1"), 0)
        out = jax.lax.reduce_window(
            out, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
            [(0, 0), (0, 0), (1, 1), (1, 1)])
        for stage, n_blocks in enumerate(cfg_b.stages):
            for block in range(n_blocks):
                prefix = f"layer{stage + 1}.{block}"
                stride = 2 if block == 0 and stage > 0 else 1
                identity = out
                if cfg_b.bottleneck:
                    h = jnp.maximum(resnet._bn(resnet._conv(
                        out, p[f"{prefix}.conv1.w"]), p, f"{prefix}.bn1"), 0)
                    h = jnp.maximum(resnet._bn(resnet._conv(
                        h, p[f"{prefix}.conv2.w"], stride=stride, pad=1),
                        p, f"{prefix}.bn2"), 0)
                    h = resnet._bn(resnet._conv(
                        h, p[f"{prefix}.conv3.w"]), p, f"{prefix}.bn3")
                else:
                    h = jnp.maximum(resnet._bn(resnet._conv(
                        out, p[f"{prefix}.conv1.w"], stride=stride, pad=1),
                        p, f"{prefix}.bn1"), 0)
                    h = resnet._bn(resnet._conv(
                        h, p[f"{prefix}.conv2.w"], pad=1), p,
                        f"{prefix}.bn2")
                if f"{prefix}.down.w" in p:
                    identity = resnet._bn(resnet._conv(
                        out, p[f"{prefix}.down.w"], stride=stride),
                        p, f"{prefix}.down_bn")
                out = jnp.maximum(h + identity, 0)
        return out                                   # [B, C, H/32, W/32]

    def forward(self, params, images):
        """images: [B, 3, H, W] → (class_logits [B, Q, C+1],
        boxes [B, Q, 4] in normalized cxcywh)."""
        cfg = self.config
        feats = self.backbone_features(params, images)
        b, c, fh, fw = feats.shape
        src = feats.reshape(b, c, fh * fw).transpose(0, 2, 1)
        src = linear(src, params["input_proj.w"], params["input_proj.b"])
        pos = jnp.asarray(sine_position_embedding(fh, fw, cfg.d_model))[None]

        memory = src
        for layer in params["encoder"]:
            a = layer["attn"]
            memory = self._ln(
                memory + self._attend(a, memory, memory, pos, pos),
                a["ln_scale"], a["ln_bias"])
            m = layer["mlp"]
            memory = self._ln(memory + self._ffn(m, memory),
                              m["ln_scale"], m["ln_bias"])

        queries = jnp.broadcast_to(params["query_embed"][None],
                                   (b, cfg.n_queries, cfg.d_model))
        x = jnp.zeros_like(queries)
        for layer in params["decoder"]:
            sa = layer["self_attn"]
            x = self._ln(x + self._attend(sa, x, x, queries, queries),
                         sa["ln_scale"], sa["ln_bias"])
            ca = layer["cross_attn"]
            x = self._ln(x + self._attend(ca, x, memory, queries, pos),
                         ca["ln_scale"], ca["ln_bias"])
            m = layer["mlp"]
            x = self._ln(x + self._ffn(m, x), m["ln_scale"], m["ln_bias"])

        class_logits = linear(x, params["class_head.w"],
                              params["class_head.b"])
        h = jnp.maximum(linear(x, params["bbox_head.w1"],
                               params["bbox_head.b1"]), 0)
        h = jnp.maximum(linear(h, params["bbox_head.w2"],
                               params["bbox_head.b2"]), 0)
        boxes = jax.nn.sigmoid(linear(h, params["bbox_head.w3"],
                                      params["bbox_head.b3"]))
        return class_logits, boxes


def _resnet_backbone_graph(g, resnet, params, x):
    """Emit the ResNet trunk (up to the last stage) as graph nodes; shares
    the conv/bn emission pattern of ResNet.build_rten."""
    cfg_b = resnet.config
    p = params["backbone"]

    def conv(inp, wname, stride=1, pad=0):
        w = g.add_constant(f"backbone.{wname}", p[wname])
        return g.add_operator(
            "Conv", [inp, w, None],
            attrs={"auto_pad": 1, "pads": [pad, pad, pad, pad],
                   "strides": [stride, stride], "groups": 1,
                   "dilations": [1, 1]}, name=f"backbone.{wname}.conv")

    def bn(inp, bname):
        args = [inp] + [g.add_constant(f"backbone.{bname}.{s}",
                                       p[f"{bname}.{s}"])
                        for s in ("scale", "bias", "mean", "var")]
        return g.add_operator("BatchNormalization", args,
                              attrs={"epsilon": 1e-5},
                              name=f"backbone.{bname}")

    def relu(inp, name):
        return g.add_operator("Relu", [inp], name=f"backbone.{name}")

    out = relu(bn(conv(x, "conv1.w", stride=2, pad=3), "bn1"), "relu1")
    out = g.add_operator("MaxPool", [out],
                         attrs={"kernel_size": [3, 3], "strides": [2, 2],
                                "pads": [1, 1, 1, 1], "auto_pad": 1},
                         name="backbone.maxpool")
    for stage, n_blocks in enumerate(cfg_b.stages):
        for block in range(n_blocks):
            prefix = f"layer{stage + 1}.{block}"
            stride = 2 if block == 0 and stage > 0 else 1
            identity = out
            if cfg_b.bottleneck:
                h = relu(bn(conv(out, f"{prefix}.conv1.w"),
                            f"{prefix}.bn1"), f"{prefix}.r1")
                h = relu(bn(conv(h, f"{prefix}.conv2.w", stride=stride,
                                 pad=1), f"{prefix}.bn2"), f"{prefix}.r2")
                h = bn(conv(h, f"{prefix}.conv3.w"), f"{prefix}.bn3")
            else:
                h = relu(bn(conv(out, f"{prefix}.conv1.w", stride=stride,
                                 pad=1), f"{prefix}.bn1"), f"{prefix}.r1")
                h = bn(conv(h, f"{prefix}.conv2.w", pad=1),
                       f"{prefix}.bn2")
            if f"{prefix}.down.w" in p:
                identity = bn(conv(out, f"{prefix}.down.w", stride=stride),
                              f"{prefix}.down_bn")
            s = g.add_operator("Add", [h, identity],
                               name=f"backbone.{prefix}.add")
            out = relu(s, f"{prefix}.out")
    return out


def build_detr_rten(model: "Detr", params, input_hw=(224, 224)):
    """Emit DETR as a `.rten` graph (BASELINE config 2: DETR vision graph;
    quantize with ir.quantize_graph for the INT8 QDQ variant).

    The graph matches ``Detr.forward`` for a FIXED input size (the sine
    position table depends on the feature-map size, so it is baked as a
    constant like real DETR ONNX exports do)."""
    import math as _math

    from ..fmt.model_builder import ModelBuilder

    cfg = model.config
    h_in, w_in = input_hw
    fh, fw = h_in // 32, w_in // 32
    mb = ModelBuilder()
    g = mb.graph
    x = g.add_value("input", shape=["batch", 3, h_in, w_in])

    feats = _resnet_backbone_graph(g, model.backbone, params, x)
    # [B, C, fh, fw] → [B, fh*fw, C]
    shaped = g.add_operator(
        "Reshape",
        [feats, g.add_constant("flatten_shape",
                               np.asarray([0, -1, fh * fw], np.int32))],
        attrs={"allow_zero": False}, name="flat")
    src = g.add_operator("Transpose", [shaped],
                         attrs={"perm": [0, 2, 1]}, name="src_t")
    proj_w = g.add_constant("input_proj.w", params["input_proj.w"])
    proj_b = g.add_constant("input_proj.b", params["input_proj.b"])
    src = g.add_operator("MatMul", [src, proj_w], name="proj_mm")
    src = g.add_operator("Add", [src, proj_b], name="proj")

    pos = g.add_constant(
        "pos_embed", sine_position_embedding(fh, fw, cfg.d_model)[None])

    def heads_mm(inp, w_name, w_arr, name):
        w = g.add_constant(w_name, w_arr)
        return g.add_operator("MatMul", [inp, w], name=name)

    def layer_norm(inp, scale, bias, name):
        s = g.add_constant(f"{name}.scale", scale)
        b = g.add_constant(f"{name}.bias", bias)
        return g.add_operator("LayerNormalization", [inp, s, b],
                              attrs={"axis": -1, "epsilon": 1e-5},
                              name=name)

    def attention(p, q_in, kv_in, name, q_pos=None, k_pos=None):
        """Multi-head attention as graph ops (B-first layout)."""
        d, hn, hd = cfg.d_model, cfg.n_heads, cfg.head_dim
        q_src = q_in if q_pos is None else g.add_operator(
            "Add", [q_in, q_pos], name=f"{name}.qpos")
        k_src = kv_in if k_pos is None else g.add_operator(
            "Add", [kv_in, k_pos], name=f"{name}.kpos")
        q = heads_mm(q_src, f"{name}.wq", p["wq"], f"{name}.q")
        k = heads_mm(k_src, f"{name}.wk", p["wk"], f"{name}.k")
        v = heads_mm(kv_in, f"{name}.wv", p["wv"], f"{name}.v")

        def split(inp, nm):
            shaped = g.add_operator(
                "Reshape",
                [inp, g.add_constant(f"{nm}.shape",
                                     np.asarray([0, -1, hn, hd], np.int32))],
                attrs={"allow_zero": False}, name=f"{nm}.r")
            return g.add_operator("Transpose", [shaped],
                                  attrs={"perm": [0, 2, 1, 3]},
                                  name=f"{nm}.t")

        qh, kh, vh = split(q, f"{name}.qh"), split(k, f"{name}.kh"), \
            split(v, f"{name}.vh")
        kt = g.add_operator("Transpose", [kh],
                            attrs={"perm": [0, 1, 3, 2]}, name=f"{name}.kt")
        scores = g.add_operator("MatMul", [qh, kt], name=f"{name}.scores")
        scale = g.add_constant(f"{name}.scale",
                               np.float32(1 / _math.sqrt(hd)).reshape(()))
        scores = g.add_operator("Mul", [scores, scale], name=f"{name}.sc")
        probs = g.add_operator("Softmax", [scores], attrs={"axis": -1},
                               name=f"{name}.probs")
        ctx = g.add_operator("MatMul", [probs, vh], name=f"{name}.ctx")
        ctx = g.add_operator("Transpose", [ctx],
                             attrs={"perm": [0, 2, 1, 3]},
                             name=f"{name}.ctx_t")
        ctx = g.add_operator(
            "Reshape",
            [ctx, g.add_constant(f"{name}.merge",
                                 np.asarray([0, -1, d], np.int32))],
            attrs={"allow_zero": False}, name=f"{name}.merged")
        return heads_mm(ctx, f"{name}.wo", p["wo"], f"{name}.out")

    def ffn(p, inp, name):
        up = heads_mm(inp, f"{name}.w_up", p["w_up"], f"{name}.up")
        up = g.add_operator("Add",
                            [up, g.add_constant(f"{name}.b_up", p["b_up"])],
                            name=f"{name}.up_b")
        up = g.add_operator("Relu", [up], name=f"{name}.relu")
        down = heads_mm(up, f"{name}.w_down", p["w_down"], f"{name}.down")
        return g.add_operator(
            "Add", [down, g.add_constant(f"{name}.b_down", p["b_down"])],
            name=f"{name}.down_b")

    memory = src
    for i, layer in enumerate(params["encoder"]):
        a, m = layer["attn"], layer["mlp"]
        att = attention(a, memory, memory, f"enc{i}.attn", pos, pos)
        memory = layer_norm(
            g.add_operator("Add", [memory, att], name=f"enc{i}.res1"),
            a["ln_scale"], a["ln_bias"], f"enc{i}.ln1")
        f = ffn(m, memory, f"enc{i}.ffn")
        memory = layer_norm(
            g.add_operator("Add", [memory, f], name=f"enc{i}.res2"),
            m["ln_scale"], m["ln_bias"], f"enc{i}.ln2")

    queries = g.add_constant("query_embed", params["query_embed"][None])
    zeros = g.add_constant(
        "dec_init", np.zeros((1, cfg.n_queries, cfg.d_model), np.float32))
    xdec = zeros
    for i, layer in enumerate(params["decoder"]):
        sa, ca, m = layer["self_attn"], layer["cross_attn"], layer["mlp"]
        att = attention(sa, xdec, xdec, f"dec{i}.self", queries, queries)
        xdec = layer_norm(
            g.add_operator("Add", [xdec, att], name=f"dec{i}.res1"),
            sa["ln_scale"], sa["ln_bias"], f"dec{i}.ln1")
        att = attention(ca, xdec, memory, f"dec{i}.cross", queries, pos)
        xdec = layer_norm(
            g.add_operator("Add", [xdec, att], name=f"dec{i}.res2"),
            ca["ln_scale"], ca["ln_bias"], f"dec{i}.ln2")
        f = ffn(m, xdec, f"dec{i}.ffn")
        xdec = layer_norm(
            g.add_operator("Add", [xdec, f], name=f"dec{i}.res3"),
            m["ln_scale"], m["ln_bias"], f"dec{i}.ln3")

    cls = heads_mm(xdec, "class_head.w", params["class_head.w"], "cls_mm")
    cls = g.add_operator(
        "Add", [cls, g.add_constant("class_head.b", params["class_head.b"])],
        name="class_logits")
    bb = heads_mm(xdec, "bbox_head.w1", params["bbox_head.w1"], "bb1")
    bb = g.add_operator(
        "Add", [bb, g.add_constant("bbox_head.b1", params["bbox_head.b1"])],
        name="bb1_b")
    bb = g.add_operator("Relu", [bb], name="bb1_r")
    bb = heads_mm(bb, "bbox_head.w2", params["bbox_head.w2"], "bb2")
    bb = g.add_operator(
        "Add", [bb, g.add_constant("bbox_head.b2", params["bbox_head.b2"])],
        name="bb2_b")
    bb = g.add_operator("Relu", [bb], name="bb2_r")
    bb = heads_mm(bb, "bbox_head.w3", params["bbox_head.w3"], "bb3")
    bb = g.add_operator(
        "Add", [bb, g.add_constant("bbox_head.b3", params["bbox_head.b3"])],
        name="bb3_b")
    boxes = g.add_operator("Sigmoid", [bb], name="boxes")

    g.inputs = [x]
    g.outputs = [cls, boxes]
    mb.metadata = {"description": f"DETR (rten_tpu native, "
                   f"{cfg.backbone_depth}-backbone, {cfg.n_queries} queries)"}
    return mb


def postprocess(class_logits, boxes, score_threshold=0.5):
    """Set predictions → detections: softmax scores, drop the no-object
    class, threshold. Returns a list per image of
    (label, score, (cx, cy, w, h))."""
    probs = np.asarray(jax.nn.softmax(jnp.asarray(class_logits), axis=-1))
    boxes = np.asarray(boxes)
    results = []
    for img_probs, img_boxes in zip(probs, boxes):
        scores = img_probs[:, :-1]           # last class = no object
        labels = scores.argmax(-1)
        best = scores[np.arange(len(labels)), labels]
        keep = best > score_threshold
        results.append([(int(l), float(s), tuple(map(float, bb)))
                        for l, s, bb in zip(labels[keep], best[keep],
                                            img_boxes[keep])])
    return results
