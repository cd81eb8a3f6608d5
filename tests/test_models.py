"""Model-family tests: native forward ↔ .rten graph parity (ResNet),
plus a GPT-2-style decoder graph driven through the Generator."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rten_tpu import Model
from rten_tpu.models.resnet import ResNet, ResNetConfig


@pytest.fixture(scope="module")
def small_resnet():
    # ResNet-18-shaped but tiny class count for speed.
    cfg = ResNetConfig(depth=18, n_classes=10)
    model = ResNet(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def test_resnet_native_forward_shape(small_resnet):
    model, params = small_resnet
    x = np.random.RandomState(0).randn(1, 3, 64, 64).astype(np.float32)
    out = model.forward(params, jnp.asarray(x))
    assert out.shape == (1, 10)


def test_resnet_rten_graph_matches_native(small_resnet):
    model, params = small_resnet
    mb = model.build_rten(params, input_shape=("batch", 3, 64, 64))
    graph_model = Model.load(mb.to_bytes())
    x = np.random.RandomState(1).randn(1, 3, 64, 64).astype(np.float32)
    want = np.asarray(model.forward(params, jnp.asarray(x)))
    got = np.asarray(graph_model.run({"input": x})[0])
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_resnet50_graph_structure():
    cfg = ResNetConfig(depth=50, n_classes=1000)
    model = ResNet(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    mb = model.build_rten(params)
    graph_model = Model.load(mb.to_bytes())
    # ResNet-50: 53 convs (1 stem + 3*16 blocks + 4 downsamples), 1 fc.
    from rten_tpu.ir.graph import OperatorNode
    ops = {}
    for node in graph_model.graph.nodes:
        if isinstance(node.data, OperatorNode):
            ops[node.data.op_type] = ops.get(node.data.op_type, 0) + 1
    assert ops["Conv"] == 53
    assert ops["Gemm"] == 1
    assert graph_model.num_params() > 25_000_000  # ~25.6M params


def _build_gpt2_style_rten(vocab=64, d=32, n_heads=2, n_layers=2,
                           max_seq=64):
    """A real (random-weight) GPT-2-style decoder as a .rten graph with
    past_key_values/present KV-cache plumbing — the graph the Generator
    drives, mirroring what rten-convert produces from HF ONNX exports."""
    from rten_tpu.fmt.model_builder import ModelBuilder

    rng = np.random.RandomState(0)
    head = d // n_heads
    mb = ModelBuilder()
    g = mb.graph
    input_ids = g.add_value("input_ids", shape=["batch", "seq"])
    g.inputs.append(input_ids)
    attention_mask = g.add_value("attention_mask",
                                 shape=["batch", "total_seq"])
    g.inputs.append(attention_mask)
    position_ids = g.add_value("position_ids", shape=["batch", "seq"])
    g.inputs.append(position_ids)

    embed = g.add_constant("wte", rng.randn(vocab, d).astype(np.float32) * .1)
    pos_embed = g.add_constant("wpe",
                               rng.randn(max_seq, d).astype(np.float32) * .1)
    h = g.add_operator("Gather", [embed, input_ids], attrs={"axis": 0},
                       name="embed")
    pos = g.add_operator("Gather", [pos_embed, position_ids],
                         attrs={"axis": 0}, name="pos_embed")
    h = g.add_operator("Add", [h, pos], name="h0")

    presents = []
    for layer in range(n_layers):
        past_k = g.add_value(f"past_key_values.{layer}.key",
                             shape=["batch", n_heads, "past", head])
        past_v = g.add_value(f"past_key_values.{layer}.value",
                             shape=["batch", n_heads, "past", head])
        g.inputs += [past_k, past_v]

        def proj(inp, name, shape):
            w = g.add_constant(f"{name}.w",
                               rng.randn(*shape).astype(np.float32)
                               * (0.5 / np.sqrt(shape[0])))
            return g.add_operator("MatMul", [inp, w], name=name)

        # [B, S, d] → [B, heads, S, head]
        def split_heads(inp, name):
            shaped = g.add_operator(
                "Reshape",
                [inp, g.add_constant(f"{name}.shape",
                                     np.asarray([0, -1, n_heads, head],
                                                np.int32))],
                attrs={"allow_zero": False}, name=f"{name}.r")
            return g.add_operator("Transpose", [shaped],
                                  attrs={"perm": [0, 2, 1, 3]},
                                  name=f"{name}.t")

        q = split_heads(proj(h, f"l{layer}.q", (d, d)), f"l{layer}.qh")
        k = split_heads(proj(h, f"l{layer}.k", (d, d)), f"l{layer}.kh")
        v = split_heads(proj(h, f"l{layer}.v", (d, d)), f"l{layer}.vh")

        k_cat = g.add_operator("Concat", [past_k, k], attrs={"axis": 2},
                               name=f"present.{layer}.key")
        v_cat = g.add_operator("Concat", [past_v, v], attrs={"axis": 2},
                               name=f"present.{layer}.value")
        presents += [k_cat, v_cat]

        kt = g.add_operator("Transpose", [k_cat],
                            attrs={"perm": [0, 1, 3, 2]}, name=f"l{layer}.kt")
        scores = g.add_operator("MatMul", [q, kt], name=f"l{layer}.scores")
        scale = g.add_constant(f"l{layer}.scale",
                               np.float32(1.0 / np.sqrt(head)).reshape(()))
        scores = g.add_operator("Mul", [scores, scale], name=f"l{layer}.sc")
        # additive mask from attention_mask: (1 - mask) * -1e9
        one = g.add_constant(f"l{layer}.one", np.float32(1.0).reshape(()))
        neg = g.add_constant(f"l{layer}.neg", np.float32(-1e9).reshape(()))
        mask_f = g.add_operator("Cast", [attention_mask], attrs={"to": 1},
                                name=f"l{layer}.maskf")
        inv = g.add_operator("Sub", [one, mask_f], name=f"l{layer}.inv")
        bias = g.add_operator("Mul", [inv, neg], name=f"l{layer}.bias")
        # reshape mask bias to [B, 1, 1, total]
        bias = g.add_operator(
            "Unsqueeze",
            [bias, g.add_constant(f"l{layer}.axes",
                                  np.asarray([1, 2], np.int32))],
            name=f"l{layer}.bias4d")
        scores = g.add_operator("Add", [scores, bias], name=f"l{layer}.sm_in")
        probs = g.add_operator("Softmax", [scores], attrs={"axis": -1},
                               name=f"l{layer}.probs")
        ctx = g.add_operator("MatMul", [probs, v_cat], name=f"l{layer}.ctx")
        ctx = g.add_operator("Transpose", [ctx], attrs={"perm": [0, 2, 1, 3]},
                             name=f"l{layer}.ctx_t")
        ctx = g.add_operator(
            "Reshape",
            [ctx, g.add_constant(f"l{layer}.merge",
                                 np.asarray([0, -1, d], np.int32))],
            attrs={"allow_zero": False}, name=f"l{layer}.merged")
        attn_out = proj(ctx, f"l{layer}.o", (d, d))
        h = g.add_operator("Add", [h, attn_out], name=f"l{layer}.res1")
        mlp = proj(h, f"l{layer}.up", (d, 4 * d))
        mlp = g.add_operator("Gelu", [mlp], name=f"l{layer}.gelu")
        mlp = proj(mlp, f"l{layer}.down", (4 * d, d))
        h = g.add_operator("Add", [h, mlp], name=f"l{layer}.res2")

    lm_w = g.add_constant("lm_head",
                          rng.randn(d, vocab).astype(np.float32) * 0.1)
    logits = g.add_operator("MatMul", [h, lm_w], name="logits")
    # rename output node to 'logits'
    mb.graph.nodes[logits]["name"] = "logits"
    g.outputs = [logits] + presents
    return mb


def test_gpt2_style_graph_generation_loop():
    from rten_tpu.generate import Generator, GeneratorConfig

    mb = _build_gpt2_style_rten()
    model = Model.load(mb.to_bytes())
    gen = Generator(model, [3, 14, 15], GeneratorConfig(max_seq_len=16))
    tokens = [next(gen) for _ in range(5)]
    assert len(tokens) == 5
    assert all(0 <= t < 64 for t in tokens)
    # Cache holds all *processed* tokens: prompt (3) + 4 fed-back tokens
    # (the newest token hasn't been run yet).
    kv = gen._kv_state["past_key_values.0.key"]
    assert kv.shape[2] == 3 + 4

    # Parity: no-cache stepwise equals cached generation.
    model2 = Model.load(mb.to_bytes())
    gen2 = Generator(model2, [3, 14, 15], GeneratorConfig(max_seq_len=16))
    # Disable cache usage by hiding the kv inputs: rerun via full forward.
    toks = [3, 14, 15]
    for _ in range(5):
        n = len(toks)
        outs = model2.run({
            "input_ids": np.asarray([toks], np.int32),
            "attention_mask": np.ones((1, n), np.int32),
            "position_ids": np.arange(n, dtype=np.int32)[None],
            **{f"past_key_values.{l}.{kind}":
               np.zeros((1, 2, 0, 16), np.float32)
               for l in range(2) for kind in ("key", "value")},
        }, ["logits"])
        toks.append(int(np.asarray(outs[0])[0, -1].argmax()))
    assert toks[3:] == tokens


def test_mobilenet_v3_graph_matches_native():
    from rten_tpu.models.mobilenet import MobileNetV3, MobileNetV3Config
    model = MobileNetV3(MobileNetV3Config(n_classes=10, width=0.5))
    params = model.init_params(jax.random.PRNGKey(0))
    x = np.random.RandomState(0).randn(1, 3, 64, 64).astype(np.float32)
    want = np.asarray(model.forward(params, jnp.asarray(x)))
    assert want.shape == (1, 10)
    mb = model.build_rten(params, input_shape=("batch", 3, 64, 64))
    graph_model = Model.load(mb.to_bytes())
    got = np.asarray(graph_model.run({"input": x})[0])
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
    # depthwise convs present (groups > 1)
    from rten_tpu.ir.graph import OperatorNode
    has_depthwise = any(
        isinstance(n.data, OperatorNode) and n.data.op_type == "Conv"
        and (n.data.attrs.get("groups") or 1) > 1
        for n in graph_model.graph.nodes)
    assert has_depthwise


def test_generator_bucketed_jit_matches_eager():
    """pad_to bucketing: the graph decodes under jit with bounded
    signatures and produces the same tokens as exact eager decoding."""
    from rten_tpu.generate import Generator, GeneratorConfig

    mb = _build_gpt2_style_rten()
    eager_model = Model.load(mb.to_bytes())
    gen_eager = Generator(eager_model, [3, 14, 15],
                          GeneratorConfig(max_seq_len=20))
    want = [next(gen_eager) for _ in range(8)]

    jit_model = Model.load(mb.to_bytes())
    gen_jit = Generator(jit_model, [3, 14, 15],
                        GeneratorConfig(max_seq_len=24, pad_to=4))
    got = [next(gen_jit) for _ in range(8)]
    assert got == want
    # Bounded jit signatures: past lengths only hit pad_to multiples.
    n_sigs = len(jit_model.executor._jit_cache)
    assert n_sigs <= 1 + (3 + 8) // 4 + 1
