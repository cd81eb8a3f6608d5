"""Conv / pool / resize / RNN / NMS / If tests against PyTorch goldens
(the analog of the reference's pytorch-ref-tests)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from rten_tpu.fmt import schema
from tests.test_ops import run_op, randf

AUTOPAD_SAME = schema.ENUMS["AutoPad"].index("Same")
AUTOPAD_NOTSET = schema.ENUMS["AutoPad"].index("NotSet")


# ---------------------------------------------------------------------------
# Conv
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("stride,pad,dilation,groups", [
    (1, 0, 1, 1), (2, 1, 1, 1), (1, 2, 2, 1), (1, 1, 1, 2),
])
def test_conv2d_vs_torch(stride, pad, dilation, groups):
    x = randf(2, 4, 9, 9)
    w = randf(6, 4 // groups, 3, 3)
    b = randf(6)
    attrs = {"auto_pad": AUTOPAD_NOTSET, "pads": [pad, pad, pad, pad],
             "strides": [stride, stride], "dilations": [dilation, dilation],
             "groups": groups}
    out = run_op("Conv", [x, w, b], attrs)[0]
    want = F.conv2d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                    stride=stride, padding=pad, dilation=dilation,
                    groups=groups).numpy()
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def test_conv2d_depthwise():
    x = randf(1, 8, 7, 7)
    w = randf(8, 1, 3, 3)
    attrs = {"auto_pad": AUTOPAD_NOTSET, "pads": [1, 1, 1, 1], "groups": 8}
    out = run_op("Conv", [x, w, None], attrs)[0]
    want = F.conv2d(torch.tensor(x), torch.tensor(w), padding=1,
                    groups=8).numpy()
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def test_conv2d_same_autopad():
    x = randf(1, 3, 10, 10)
    w = randf(5, 3, 3, 3)
    out = run_op("Conv", [x, w, None],
                 {"auto_pad": AUTOPAD_SAME, "strides": [1, 1]})[0]
    want = F.conv2d(torch.tensor(x), torch.tensor(w), padding="same").numpy()
    assert out.shape == (1, 5, 10, 10)
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def test_conv1d_vs_torch():
    x = randf(2, 3, 12)
    w = randf(5, 3, 4)
    b = randf(5)
    out = run_op("Conv", [x, w, b],
                 {"auto_pad": AUTOPAD_NOTSET, "pads": [2, 1],
                  "strides": [2]})[0]
    want = F.conv1d(F.pad(torch.tensor(x), (2, 1)), torch.tensor(w),
                    torch.tensor(b), stride=2).numpy()
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def test_conv_transpose2d_vs_torch():
    x = randf(1, 4, 5, 5)
    w = randf(4, 6, 3, 3)  # [C, M, kh, kw]
    out = run_op("ConvTranspose", [x, w, None],
                 {"auto_pad": AUTOPAD_NOTSET, "strides": [2, 2],
                  "pads": [1, 1, 1, 1]})[0]
    want = F.conv_transpose2d(torch.tensor(x), torch.tensor(w), stride=2,
                              padding=1).numpy()
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Pooling
# ---------------------------------------------------------------------------

def test_max_pool_vs_torch():
    x = randf(2, 3, 8, 8)
    out = run_op("MaxPool", [x],
                 {"kernel_size": [2, 2], "strides": [2, 2],
                  "auto_pad": AUTOPAD_NOTSET})[0]
    want = F.max_pool2d(torch.tensor(x), 2).numpy()
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_max_pool_padded():
    x = randf(1, 2, 7, 7)
    out = run_op("MaxPool", [x],
                 {"kernel_size": [3, 3], "strides": [2, 2],
                  "pads": [1, 1, 1, 1], "auto_pad": AUTOPAD_NOTSET})[0]
    want = F.max_pool2d(torch.tensor(x), 3, 2, padding=1).numpy()
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_average_pool_vs_torch():
    x = randf(2, 3, 8, 8)
    out = run_op("AveragePool", [x],
                 {"kernel_size": [2, 2], "strides": [2, 2],
                  "auto_pad": AUTOPAD_NOTSET})[0]
    want = F.avg_pool2d(torch.tensor(x), 2).numpy()
    np.testing.assert_allclose(out, want, rtol=1e-5)


@pytest.mark.parametrize("include_pad", [False, True])
def test_average_pool_padded(include_pad):
    x = randf(1, 2, 6, 6)
    out = run_op("AveragePool", [x],
                 {"kernel_size": [3, 3], "strides": [2, 2],
                  "pads": [1, 1, 1, 1], "auto_pad": AUTOPAD_NOTSET,
                  "count_include_pad": include_pad})[0]
    want = F.avg_pool2d(torch.tensor(x), 3, 2, padding=1,
                        count_include_pad=include_pad).numpy()
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)


def test_global_average_pool():
    x = randf(2, 3, 5, 7)
    out = run_op("GlobalAveragePool", [x])[0]
    np.testing.assert_allclose(out, x.mean((2, 3), keepdims=True), rtol=1e-5)


# ---------------------------------------------------------------------------
# Resize
# ---------------------------------------------------------------------------

def _resize_attrs(mode, coord, nearest="RoundPreferFloor"):
    return {"mode": schema.ENUMS["ResizeMode"].index(mode),
            "coord_mode": schema.ENUMS["CoordTransformMode"].index(coord),
            "nearest_mode": schema.ENUMS["NearestMode"].index(nearest)}


def test_resize_nearest_vs_torch():
    x = randf(1, 2, 4, 4)
    out = run_op("Resize",
                 [x, None, np.array([1, 1, 2, 2], np.float32)],
                 _resize_attrs("Nearest", "Asymmetric", "Floor"),
                 const_mask=[False, False, True])[0]
    want = F.interpolate(torch.tensor(x), scale_factor=2,
                         mode="nearest").numpy()
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_resize_linear_half_pixel_vs_torch():
    x = randf(1, 2, 5, 5)
    out = run_op("Resize",
                 [x, None, None, np.array([1, 2, 10, 10])],
                 _resize_attrs("Linear", "HalfPixel"),
                 const_mask=[False, False, False, True])[0]
    want = F.interpolate(torch.tensor(x), size=(10, 10), mode="bilinear",
                         align_corners=False).numpy()
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


def test_resize_linear_align_corners_vs_torch():
    x = randf(1, 1, 4, 6)
    out = run_op("Resize",
                 [x, None, None, np.array([1, 1, 8, 12])],
                 _resize_attrs("Linear", "AlignCorners"),
                 const_mask=[False, False, False, True])[0]
    want = F.interpolate(torch.tensor(x), size=(8, 12), mode="bilinear",
                         align_corners=True).numpy()
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# RNN
# ---------------------------------------------------------------------------

def _torch_gru_weights(hidden, input_size, seed=0):
    """ONNX-layout GRU weights from a torch GRU (torch gate order r,z,n →
    ONNX z,r,h)."""
    torch.manual_seed(seed)
    m = torch.nn.GRU(input_size, hidden)
    wr, wz, wn = torch.chunk(m.weight_ih_l0, 3, 0)
    rr, rz, rn = torch.chunk(m.weight_hh_l0, 3, 0)
    br, bz, bn = torch.chunk(m.bias_ih_l0, 3, 0)
    hr, hz, hn = torch.chunk(m.bias_hh_l0, 3, 0)
    w = torch.cat([wz, wr, wn], 0)[None].detach().numpy()
    r = torch.cat([rz, rr, rn], 0)[None].detach().numpy()
    b = torch.cat([bz, br, bn, hz, hr, hn], 0)[None].detach().numpy()
    return m, w, r, b


def test_gru_vs_torch():
    hidden, input_size, seq, batch = 4, 3, 5, 2
    m, w, r, b = _torch_gru_weights(hidden, input_size)
    x = randf(seq, batch, input_size)
    # torch GRU uses linear_before_reset semantics (n gate: r*(Whn h + bhn)).
    y, h_n = run_op("GRU", [x, w, r, b],
                    {"hidden_size": hidden, "direction": 0,
                     "linear_before_reset": True}, n_outputs=2)
    want_y, want_h = m(torch.tensor(x))
    np.testing.assert_allclose(y[:, 0], want_y.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(h_n, want_h.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_lstm_vs_torch():
    hidden, input_size, seq, batch = 4, 3, 5, 2
    torch.manual_seed(1)
    m = torch.nn.LSTM(input_size, hidden)
    wi, wf, wc, wo = torch.chunk(m.weight_ih_l0, 4, 0)
    ri, rf, rc, ro = torch.chunk(m.weight_hh_l0, 4, 0)
    bi, bf, bc, bo = torch.chunk(m.bias_ih_l0, 4, 0)
    hi, hf, hc, ho = torch.chunk(m.bias_hh_l0, 4, 0)
    # ONNX order: i, o, f, c.
    w = torch.cat([wi, wo, wf, wc], 0)[None].detach().numpy()
    r = torch.cat([ri, ro, rf, rc], 0)[None].detach().numpy()
    b = torch.cat([bi, bo, bf, bc, hi, ho, hf, hc], 0)[None].detach().numpy()
    x = randf(seq, batch, input_size)
    y, h_n, c_n = run_op("LSTM", [x, w, r, b],
                         {"hidden_size": hidden, "direction": 0},
                         n_outputs=3)
    want_y, (want_h, want_c) = m(torch.tensor(x))
    np.testing.assert_allclose(y[:, 0], want_y.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(h_n, want_h.detach().numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(c_n, want_c.detach().numpy(), rtol=1e-4,
                               atol=1e-5)


def test_gru_bidirectional_shapes():
    hidden, input_size, seq, batch = 3, 2, 4, 2
    w, r = randf(2, 3 * hidden, input_size), randf(2, 3 * hidden, hidden)
    y, h_n = run_op("GRU", [x := randf(seq, batch, input_size), w, r],
                    {"hidden_size": hidden, "direction": 2}, n_outputs=2)
    assert y.shape == (seq, 2, batch, hidden)
    assert h_n.shape == (2, batch, hidden)


# ---------------------------------------------------------------------------
# NMS
# ---------------------------------------------------------------------------

def test_nms_vs_torchvision_semantics():
    boxes = np.array([[[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60],
                       [0, 0, 5, 5]]], np.float32)
    scores = np.array([[[0.9, 0.8, 0.7, 0.95]]], np.float32)
    out = run_op("NonMaxSuppression",
                 [boxes, scores, np.array([10]), np.array(0.5, np.float32),
                  np.array(0.0, np.float32)],
                 {"box_order": 0}, mode="eager")[0]
    # box 3 (score .95) kept; box 0 kept (IoU with 3 small); box 1
    # suppressed by 0; box 2 kept.
    kept = [row[2] for row in out]
    assert kept == [3, 0, 2]


def test_nms_padded_jittable():
    import jax
    import jax.numpy as jnp
    from rten_tpu.ops.nms import nms_padded
    boxes = jnp.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60],
                       [0, 0, 5, 5]], jnp.float32)
    scores = jnp.array([0.9, 0.8, 0.7, 0.95], jnp.float32)
    idx, valid = jax.jit(lambda b, s: nms_padded(b, s, 3, 0.5))(boxes, scores)
    assert list(np.asarray(idx[valid])) == [3, 0, 2]


# ---------------------------------------------------------------------------
# If / subgraphs
# ---------------------------------------------------------------------------

def _build_if_model():
    from rten_tpu.fmt.model_builder import ModelBuilder
    from rten_tpu.fmt import container
    from rten_tpu.ir.graph import graph_from_model_file
    mb = ModelBuilder()
    g = mb.graph
    cond = g.add_value("cond", shape=[1])
    x = g.add_value("x", shape=[2, 2])
    then_g = mb.subgraph()
    tx = then_g.add_value("x")  # capture by name from outer scope
    t2 = then_g.add_constant("two", np.float32(2.0).reshape(()))
    tout = then_g.add_operator("Mul", [tx, t2])
    then_g.captures = [tx]
    then_g.outputs = [tout]
    else_g = mb.subgraph()
    ex = else_g.add_value("x")
    e3 = else_g.add_constant("three", np.float32(3.0).reshape(()))
    eout = else_g.add_operator("Add", [ex, e3])
    else_g.captures = [ex]
    else_g.outputs = [eout]
    out = g.add_operator("If", [cond],
                         attrs={"then_branch": then_g, "else_branch": else_g})
    g.inputs = [cond, x]
    g.outputs = [out]
    mf = container.load_bytes(mb.to_bytes())
    return graph_from_model_file(mf)


def test_if_both_branches():
    from rten_tpu.runtime.executor import GraphExecutor
    graph = _build_if_model()
    ex = GraphExecutor(graph)
    x = randf(2, 2)
    out_true = np.asarray(ex.run(
        {graph.node_id("cond"): np.array([1], np.int32),
         graph.node_id("x"): x})[0])
    np.testing.assert_allclose(out_true, x * 2, rtol=1e-6)
    out_false = np.asarray(ex.run(
        {graph.node_id("cond"): np.array([0], np.int32),
         graph.node_id("x"): x})[0])
    np.testing.assert_allclose(out_false, x + 3, rtol=1e-6)
