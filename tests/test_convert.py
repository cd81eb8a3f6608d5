"""ONNX → .rten converter tests.

ONNX protobufs are synthesized with our own writer
(:mod:`rten_tpu.convert.onnx_proto` — field numbers per the public
onnx.proto), converted, loaded, and executed; outputs are compared
against torch."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from rten_tpu import Model
from rten_tpu.convert import convert_bytes
from rten_tpu.convert import onnx_proto as op
from rten_tpu.convert.converter import ConversionError

rng = np.random.RandomState(0)


def make_model(nodes, inputs, outputs, initializers=()):
    return op.write_model({
        "nodes": [op.write_node(**n) for n in nodes],
        "inputs": [{"name": n, "shape": s} for n, s in inputs],
        "outputs": [{"name": n, "shape": s} for n, s in outputs],
        "initializers": list(initializers),
    })


def run_converted(onnx_bytes, feeds, n_outputs=1):
    model = Model.load(convert_bytes(onnx_bytes))
    outs = model.run(feeds)
    return [np.asarray(o) for o in outs]


def test_mlp_conversion_and_parity():
    w1 = rng.randn(4, 8).astype(np.float32)
    b1 = rng.randn(8).astype(np.float32)
    w2 = rng.randn(8, 2).astype(np.float32)
    onnx_bytes = make_model(
        nodes=[
            dict(op_type="MatMul", inputs=["x", "w1"], outputs=["h"]),
            dict(op_type="Add", inputs=["h", "b1"], outputs=["hb"]),
            dict(op_type="Relu", inputs=["hb"], outputs=["hr"]),
            dict(op_type="MatMul", inputs=["hr", "w2"], outputs=["y"]),
        ],
        inputs=[("x", ["batch", 4])],
        outputs=[("y", ["batch", 2])],
        initializers=[("w1", w1), ("b1", b1), ("w2", w2)],
    )
    x = rng.randn(3, 4).astype(np.float32)
    out = run_converted(onnx_bytes, {"x": x})[0]
    want = np.maximum(x @ w1 + b1, 0) @ w2
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


def test_conv_pool_net_vs_torch():
    w = rng.randn(6, 3, 3, 3).astype(np.float32)
    b = rng.randn(6).astype(np.float32)
    onnx_bytes = make_model(
        nodes=[
            dict(op_type="Conv", inputs=["x", "w", "b"], outputs=["c"],
                 attrs={"pads": [1, 1, 1, 1], "strides": [1, 1],
                        "kernel_shape": [3, 3], "group": 1}),
            dict(op_type="Relu", inputs=["c"], outputs=["r"]),
            dict(op_type="MaxPool", inputs=["r"], outputs=["p"],
                 attrs={"kernel_shape": [2, 2], "strides": [2, 2]}),
            dict(op_type="GlobalAveragePool", inputs=["p"], outputs=["g"]),
            dict(op_type="Flatten", inputs=["g"], outputs=["y"],
                 attrs={"axis": 1}),
        ],
        inputs=[("x", [1, 3, 8, 8])],
        outputs=[("y", [1, 6])],
        initializers=[("w", w), ("b", b)],
    )
    x = rng.randn(1, 3, 8, 8).astype(np.float32)
    out = run_converted(onnx_bytes, {"x": x})[0]
    want = F.max_pool2d(F.relu(F.conv2d(torch.tensor(x), torch.tensor(w),
                                        torch.tensor(b), padding=1)), 2)
    want = want.mean((2, 3)).numpy()
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def test_i64_initializers_coerced_to_i32():
    shape = np.asarray([2, -1], np.int64)
    onnx_bytes = make_model(
        nodes=[dict(op_type="Reshape", inputs=["x", "shape"],
                    outputs=["y"])],
        inputs=[("x", [4, 3])],
        outputs=[("y", [2, 6])],
        initializers=[("shape", shape)],
    )
    x = rng.randn(4, 3).astype(np.float32)
    out = run_converted(onnx_bytes, {"x": x})[0]
    assert out.shape == (2, 6)


def test_constant_node_and_shape_chain():
    onnx_bytes = make_model(
        nodes=[
            dict(op_type="Constant", inputs=[], outputs=["two"],
                 attrs={"value": np.asarray([2.0], np.float32)}),
            dict(op_type="Mul", inputs=["x", "two"], outputs=["y"]),
        ],
        inputs=[("x", [3])],
        outputs=[("y", [3])],
    )
    x = rng.randn(3).astype(np.float32)
    out = run_converted(onnx_bytes, {"x": x})[0]
    np.testing.assert_allclose(out, x * 2)


def test_clip_attr_promotion():
    onnx_bytes = make_model(
        nodes=[dict(op_type="Clip", inputs=["x"], outputs=["y"],
                    attrs={"min": -0.5, "max": 0.5})],
        inputs=[("x", [4])],
        outputs=[("y", [4])],
    )
    x = np.asarray([-2, -0.2, 0.2, 2], np.float32)
    out = run_converted(onnx_bytes, {"x": x})[0]
    np.testing.assert_allclose(out, np.clip(x, -0.5, 0.5))


def test_squeeze_axes_attr_promotion():
    onnx_bytes = make_model(
        nodes=[dict(op_type="Unsqueeze", inputs=["x"], outputs=["y"],
                    attrs={"axes": [0]})],
        inputs=[("x", [3])],
        outputs=[("y", [1, 3])],
    )
    out = run_converted(onnx_bytes, {"x": rng.randn(3).astype(np.float32)})[0]
    assert out.shape == (1, 3)


def test_gemm_attrs():
    a = rng.randn(5, 3).astype(np.float32)
    w = rng.randn(4, 5).astype(np.float32)
    onnx_bytes = make_model(
        nodes=[dict(op_type="Gemm", inputs=["x", "w"], outputs=["y"],
                    attrs={"transA": 1, "transB": 1, "alpha": 0.5})],
        inputs=[("x", [5, 3])],
        outputs=[("y", [3, 4])],
        initializers=[("w", w)],
    )
    out = run_converted(onnx_bytes, {"x": a})[0]
    np.testing.assert_allclose(out, 0.5 * a.T @ w.T, rtol=1e-5, atol=1e-5)


def test_unsupported_attr_errors_loudly():
    onnx_bytes = make_model(
        nodes=[dict(op_type="MaxPool", inputs=["x"], outputs=["y"],
                    attrs={"kernel_shape": [2, 2], "ceil_mode": 1})],
        inputs=[("x", [1, 1, 4, 4])],
        outputs=[("y", [1, 1, 2, 2])],
    )
    with pytest.raises(ConversionError, match="ceil_mode"):
        convert_bytes(onnx_bytes)


def test_unsupported_op_errors_loudly():
    onnx_bytes = make_model(
        nodes=[dict(op_type="FancyNewOp", inputs=["x"], outputs=["y"])],
        inputs=[("x", [1])],
        outputs=[("y", [1])],
    )
    with pytest.raises(ConversionError, match="FancyNewOp"):
        convert_bytes(onnx_bytes)


def test_reduce_and_cast():
    onnx_bytes = make_model(
        nodes=[
            dict(op_type="ReduceMean", inputs=["x"], outputs=["m"],
                 attrs={"axes": [1], "keepdims": 0}),
            dict(op_type="Cast", inputs=["m"], outputs=["y"],
                 attrs={"to": op.DT_INT64}),
        ],
        inputs=[("x", [2, 4])],
        outputs=[("y", [2])],
    )
    x = np.asarray([[1, 2, 3, 4], [10, 20, 30, 40]], np.float32)
    out = run_converted(onnx_bytes, {"x": x})[0]
    assert out.dtype == np.int32
    np.testing.assert_array_equal(out, [2, 25])


def test_lstm_conversion_vs_torch():
    hidden, input_size = 4, 3
    torch.manual_seed(0)
    m = torch.nn.LSTM(input_size, hidden)
    wi, wf_, wc, wo = torch.chunk(m.weight_ih_l0, 4, 0)
    ri, rf, rc, ro = torch.chunk(m.weight_hh_l0, 4, 0)
    bi, bf_, bc, bo = torch.chunk(m.bias_ih_l0, 4, 0)
    hi, hf, hc, ho = torch.chunk(m.bias_hh_l0, 4, 0)
    w = torch.cat([wi, wo, wf_, wc], 0)[None].detach().numpy()
    r = torch.cat([ri, ro, rf, rc], 0)[None].detach().numpy()
    b = torch.cat([bi, bo, bf_, bc, hi, ho, hf, hc], 0)[None].detach().numpy()
    onnx_bytes = make_model(
        nodes=[dict(op_type="LSTM", inputs=["x", "w", "r", "b"],
                    outputs=["y", "y_h", "y_c"],
                    attrs={"hidden_size": hidden,
                           "direction": "forward"})],
        inputs=[("x", [5, 2, 3])],
        outputs=[("y", [5, 1, 2, 4]), ("y_h", [1, 2, 4]),
                 ("y_c", [1, 2, 4])],
        initializers=[("w", w), ("r", r), ("b", b)],
    )
    x = rng.randn(5, 2, 3).astype(np.float32)
    outs = run_converted(onnx_bytes, {"x": x}, n_outputs=3)
    want_y, (want_h, want_c) = m(torch.tensor(x))
    np.testing.assert_allclose(outs[0][:, 0], want_y.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_if_subgraph_conversion():
    onnx_bytes = make_model(
        nodes=[dict(
            op_type="If", inputs=["cond"], outputs=["y"],
            attrs={
                "then_branch": {
                    "name": "then",
                    "nodes": [op.write_node(op_type="Mul",
                                            inputs=["x", "x"],
                                            outputs=["t_out"])],
                    "inputs": [], "initializers": [],
                    "outputs": [{"name": "t_out", "shape": [2]}],
                },
                "else_branch": {
                    "name": "else",
                    "nodes": [op.write_node(op_type="Neg", inputs=["x"],
                                            outputs=["e_out"])],
                    "inputs": [], "initializers": [],
                    "outputs": [{"name": "e_out", "shape": [2]}],
                },
            })],
        inputs=[("cond", [1]), ("x", [2])],
        outputs=[("y", [2])],
    )
    x = np.asarray([3.0, -4.0], np.float32)
    model = Model.load(convert_bytes(onnx_bytes))
    out_t = np.asarray(model.run({"cond": np.asarray([1], np.int32),
                                  "x": x})[0])
    np.testing.assert_allclose(out_t, x * x)
    out_f = np.asarray(model.run({"cond": np.asarray([0], np.int32),
                                  "x": x})[0])
    np.testing.assert_allclose(out_f, -x)


def test_quantized_ops_conversion():
    w = rng.randn(4, 3).astype(np.float32)
    w_s = np.float32(np.abs(w).max() / 127)
    w_q = np.clip(np.round(w / w_s), -127, 127).astype(np.int8)
    onnx_bytes = make_model(
        nodes=[
            dict(op_type="DynamicQuantizeLinear", inputs=["x"],
                 outputs=["xq", "xs", "xzp"]),
            dict(op_type="MatMulInteger",
                 inputs=["xq", "wq", "xzp", "wzp"], outputs=["acc"]),
            dict(op_type="Cast", inputs=["acc"], outputs=["accf"],
                 attrs={"to": op.DT_FLOAT}),
            dict(op_type="Mul", inputs=["accf", "xs"], outputs=["scaled"]),
            dict(op_type="Mul", inputs=["scaled", "ws"], outputs=["y"]),
        ],
        inputs=[("x", [2, 4])],
        outputs=[("y", [2, 3])],
        initializers=[("wq", w_q), ("wzp", np.int8(0)),
                      ("ws", np.asarray(w_s))],
    )
    x = rng.randn(2, 4).astype(np.float32)
    out = run_converted(onnx_bytes, {"x": x})[0]
    want = x @ w
    assert np.abs(out - want).max() < 0.15  # dynamic-int8 quantization error


def test_upsample_conversion():
    onnx_bytes = make_model(
        nodes=[dict(op_type="Upsample", inputs=["x"], outputs=["y"],
                    attrs={"mode": "nearest",
                           "scales": [1.0, 1.0, 2.0, 2.0]})],
        inputs=[("x", [1, 1, 3, 3])],
        outputs=[("y", [1, 1, 6, 6])],
    )
    x = rng.randn(1, 1, 3, 3).astype(np.float32)
    out = run_converted(onnx_bytes, {"x": x})[0]
    assert out.shape == (1, 1, 6, 6)
    np.testing.assert_allclose(out, x.repeat(2, 2).repeat(2, 3))


def test_resize_sizes_input_conversion():
    onnx_bytes = make_model(
        nodes=[dict(op_type="Resize", inputs=["x", "", "", "sizes"],
                    outputs=["y"],
                    attrs={"mode": "nearest",
                           "coordinate_transformation_mode": "asymmetric",
                           "nearest_mode": "floor"})],
        inputs=[("x", [1, 1, 2, 2])],
        outputs=[("y", [1, 1, 4, 4])],
        initializers=[("sizes", np.asarray([1, 1, 4, 4], np.int64))],
    )
    x = rng.randn(1, 1, 2, 2).astype(np.float32)
    out = run_converted(onnx_bytes, {"x": x})[0]
    assert out.shape == (1, 1, 4, 4)


def test_conv_transpose_group_dilation_output_padding_vs_torch():
    """Round-1 VERDICT item 10: ConvTranspose attribute breadth —
    group, dilations, output_padding all at non-default values, checked
    against torch.conv_transpose2d."""
    groups, c_in, m_per_g = 2, 4, 3
    w = rng.randn(c_in, m_per_g, 3, 3).astype(np.float32)
    b = rng.randn(groups * m_per_g).astype(np.float32)
    onnx_bytes = make_model(
        nodes=[dict(op_type="ConvTranspose", inputs=["x", "w", "b"],
                    outputs=["y"],
                    attrs={"strides": [2, 2], "pads": [1, 1, 1, 1],
                           "output_padding": [1, 1], "group": groups,
                           "dilations": [2, 2], "kernel_shape": [3, 3]})],
        inputs=[("x", [1, c_in, 6, 6])],
        outputs=[("y", None)],
        initializers=[("w", w), ("b", b)],
    )
    x = rng.randn(1, c_in, 6, 6).astype(np.float32)
    out = run_converted(onnx_bytes, {"x": x})[0]
    want = F.conv_transpose2d(
        torch.tensor(x), torch.tensor(w), torch.tensor(b), stride=2,
        padding=1, output_padding=1, groups=groups, dilation=2).numpy()
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def test_pad_reflect_edge_wrap_vs_torch():
    for mode, torch_mode in (("reflect", "reflect"), ("edge", "replicate")):
        onnx_bytes = make_model(
            nodes=[dict(op_type="Pad", inputs=["x", "pads"],
                        outputs=["y"], attrs={"mode": mode})],
            inputs=[("x", [1, 2, 5, 5])],
            outputs=[("y", None)],
            initializers=[("pads", np.asarray([0, 0, 1, 2, 0, 0, 2, 1],
                                              np.int64))],
        )
        x = rng.randn(1, 2, 5, 5).astype(np.float32)
        out = run_converted(onnx_bytes, {"x": x})[0]
        want = F.pad(torch.tensor(x), (2, 1, 1, 2),
                     mode=torch_mode).numpy()
        np.testing.assert_allclose(out, want, rtol=1e-6, atol=1e-6,
                                   err_msg=mode)
    # wrap == numpy's circular padding
    onnx_bytes = make_model(
        nodes=[dict(op_type="Pad", inputs=["x", "pads"], outputs=["y"],
                    attrs={"mode": "wrap"})],
        inputs=[("x", [2, 4])],
        outputs=[("y", None)],
        initializers=[("pads", np.asarray([1, 1, 1, 1], np.int64))],
    )
    x = rng.randn(2, 4).astype(np.float32)
    out = run_converted(onnx_bytes, {"x": x})[0]
    np.testing.assert_allclose(out, np.pad(x, ((1, 1), (1, 1)),
                                           mode="wrap"))


def test_conv_same_lower_exact():
    """auto_pad=SAME_LOWER places the EXCESS pad at the start (exact —
    the reference converter approximates it as SAME_UPPER)."""
    w = rng.randn(2, 1, 2, 2).astype(np.float32)
    onnx_bytes = make_model(
        nodes=[dict(op_type="Conv", inputs=["x", "w"], outputs=["y"],
                    attrs={"auto_pad": "SAME_LOWER", "strides": [1, 1],
                           "kernel_shape": [2, 2], "group": 1})],
        inputs=[("x", [1, 1, 5, 5])],
        outputs=[("y", None)],
        initializers=[("w", w)],
    )
    x = rng.randn(1, 1, 5, 5).astype(np.float32)
    out = run_converted(onnx_bytes, {"x": x})[0]
    # k=2, s=1: total pad 1 per dim, SAME_LOWER puts it at the START.
    xp = np.pad(x, ((0, 0), (0, 0), (1, 0), (1, 0)))
    want = F.conv2d(torch.tensor(xp), torch.tensor(w)).numpy()
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)
