"""Quantization layer tests: quant math, Pallas kernels (interpret mode on
CPU), and the ONNX-semantics quantized operators."""

import numpy as np
import jax.numpy as jnp
import pytest

from rten_tpu.kernels import gemm as gk
from rten_tpu.kernels import quant as q
from tests.test_ops import run_op

rng = np.random.RandomState(3)


def test_pack_unpack_int4_roundtrip():
    vals = rng.randint(-8, 8, size=(16, 512)).astype(np.int8)
    packed = q.pack_int4(vals)
    assert packed.shape == (16, 256)
    out = np.asarray(q.unpack_int4(packed))
    np.testing.assert_array_equal(out, vals)


def test_quantize_dequantize_roundtrip():
    x = rng.randn(8, 16).astype(np.float32)
    s = np.float32(0.05)
    qv = np.asarray(q.quantize(x, s))
    assert qv.dtype == np.int8
    back = np.asarray(q.dequantize(qv, s))
    assert np.abs(back - x).max() <= s / 2 + 1e-6


def test_dynamic_quantize_matches_onnx_reference():
    x = np.array([0.0, 2.0, -3.0, 5.0], np.float32)
    y, scale, zp = (np.asarray(v) for v in q.dynamic_quantize(x))
    # ONNX reference computation
    want_scale = (5.0 - (-3.0)) / 255.0
    want_zp = np.clip(round(3.0 / want_scale), 0, 255)
    assert abs(scale - want_scale) < 1e-7
    assert zp == want_zp
    np.testing.assert_array_equal(
        y, np.clip(np.round(x / want_scale) + want_zp, 0, 255).astype(np.uint8))


def test_matmul_int8_kernel_exact():
    x = rng.randint(-127, 128, (50, 130)).astype(np.int8)
    w = rng.randint(-127, 128, (130, 140)).astype(np.int8)
    ws = np.abs(rng.randn(140)).astype(np.float32) + 0.01
    out = np.asarray(gk.matmul_int8(jnp.asarray(x), jnp.asarray(w), 0.07,
                                    jnp.asarray(ws)))
    want = (x.astype(np.int64) @ w.astype(np.int64)).astype(np.float32) \
        * 0.07 * ws[None, :]
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-3)


def test_matmul_int8_multiblock():
    # Exercise K-blocked accumulation across several grid steps (the
    # Pallas formulation; the production matmul_int8 delegates to XLA's
    # int8 dot_general and must agree exactly).
    x = rng.randint(-50, 50, (300, 1100)).astype(np.int8)
    w = rng.randint(-50, 50, (1100, 520)).astype(np.int8)
    ws = np.ones(520, np.float32)
    out = np.asarray(gk.matmul_int8_pallas(
        jnp.asarray(x), jnp.asarray(w), 1.0, jnp.asarray(ws),
        block_m=128, block_n=256, block_k=256))
    want = (x.astype(np.int64) @ w.astype(np.int64)).astype(np.float32)
    np.testing.assert_allclose(out, want, rtol=1e-6)
    out_xla = np.asarray(gk.matmul_int8(
        jnp.asarray(x), jnp.asarray(w), 1.0, jnp.asarray(ws)))
    np.testing.assert_allclose(out_xla, want, rtol=1e-6)


def test_matmul_int4_kernel_matches_dequant_reference():
    k, n = 384, 768
    w = rng.randn(k, n).astype(np.float32)
    packed, scales = q.quantize_int4_groupwise(w, group=128)
    x = rng.randn(9, k).astype(np.float32)
    out = np.asarray(gk.matmul_int4(jnp.asarray(x), jnp.asarray(packed),
                                    jnp.asarray(scales), group=128,
                                    block_k=256))
    wd = np.asarray(q.dequantize_int4_groupwise(packed, scales, group=128))
    # The kernel computes in bf16 (x rounds to bf16; int4 values are
    # exact, scales round): error bound |Δ| ≤ 2·2^-8·Σ|x||w| (see the
    # int8 weight-only test for the derivation).
    bound = np.abs(x) @ np.abs(wd)
    assert (np.abs(out - x @ wd) <= bound * 2 ** -8 * 2 + 1e-6).all()
    # int4 quantization error vs the f32 matmul stays bounded
    rel = np.abs(out - x @ w).max() / np.abs(x @ w).max()
    assert rel < 0.2


def test_quantize_linear_op():
    x = rng.randn(4, 6).astype(np.float32)
    out = run_op("QuantizeLinear",
                 [x, np.float32(0.1), np.int8(3)], {"axis": 1})[0]
    want = np.clip(np.round(x / 0.1) + 3, -128, 127).astype(np.int8)
    np.testing.assert_array_equal(out, want)
    back = run_op("DequantizeLinear",
                  [out, np.float32(0.1), np.int8(3)], {"axis": 1})[0]
    np.testing.assert_allclose(back, (want.astype(np.int32) - 3) * 0.1,
                               rtol=1e-6)


def test_quantize_linear_per_channel():
    x = rng.randn(4, 3).astype(np.float32)
    scales = np.array([0.1, 0.2, 0.4], np.float32)
    out = run_op("QuantizeLinear", [x, scales, None], {"axis": 1})[0]
    want = np.clip(np.round(x / scales[None, :]), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(out, want)


def test_dynamic_quantize_linear_op():
    x = rng.randn(5, 7).astype(np.float32) * 3
    y, scale, zp = run_op("DynamicQuantizeLinear", [x], n_outputs=3)
    assert y.dtype == np.uint8
    back = (y.astype(np.float32) - zp) * scale
    assert np.abs(back - x).max() <= float(scale) * 0.51 + 1e-6


def test_matmul_integer_op():
    a = rng.randint(0, 255, (6, 9)).astype(np.uint8)
    b = rng.randint(-127, 128, (9, 5)).astype(np.int8)
    a_zp = np.uint8(128)
    out = run_op("MatMulInteger", [a, b, a_zp, None])[0]
    want = (a.astype(np.int32) - 128) @ b.astype(np.int32)
    np.testing.assert_array_equal(out, want)
    assert out.dtype == np.int32


def test_matmul_integer_symmetric_int8_kernel_path():
    a = rng.randint(-127, 128, (16, 64)).astype(np.int8)
    b = rng.randint(-127, 128, (64, 32)).astype(np.int8)
    out = run_op("MatMulInteger",
                 [a, b, np.zeros((), np.int8), np.zeros((), np.int8)],
                 const_mask=[False, False, True, True])[0]
    want = a.astype(np.int32) @ b.astype(np.int32)
    np.testing.assert_array_equal(out, want)


def test_qlinear_matmul_op():
    a_f = rng.randn(8, 16).astype(np.float32)
    b_f = rng.randn(16, 12).astype(np.float32)
    a_s, b_s, y_s = np.float32(0.02), np.float32(0.03), np.float32(0.05)
    a_q = np.clip(np.round(a_f / a_s), -127, 127).astype(np.int8)
    b_q = np.clip(np.round(b_f / b_s), -127, 127).astype(np.int8)
    out = run_op("QLinearMatMul",
                 [a_q, a_s, np.int8(0), b_q, b_s, np.int8(0), y_s,
                  np.int8(0)],
                 const_mask=[False, True, True, False, True, True, True,
                             True])[0]
    acc = a_q.astype(np.int32) @ b_q.astype(np.int32)
    want = np.clip(np.round(acc * float(a_s) * float(b_s) / float(y_s)),
                   -128, 127).astype(np.int8)
    np.testing.assert_allclose(out.astype(np.int32), want.astype(np.int32),
                               atol=1)  # ties may round differently off-MXU


def test_qlinear_conv_vs_float_conv():
    import torch
    import torch.nn.functional as F
    x_f = rng.randn(1, 3, 8, 8).astype(np.float32)
    w_f = rng.randn(5, 3, 3, 3).astype(np.float32)
    x_s = np.float32(np.abs(x_f).max() / 127)
    w_s = np.float32(np.abs(w_f).max() / 127)
    x_q = np.clip(np.round(x_f / x_s), -127, 127).astype(np.int8)
    w_q = np.clip(np.round(w_f / w_s), -127, 127).astype(np.int8)
    y_s = np.float32(0.1)
    out = run_op("QLinearConv",
                 [x_q, x_s, np.int8(0), w_q, w_s, np.int8(0), y_s,
                  np.int8(0)],
                 {"strides": [1, 1], "pads": [1, 1, 1, 1], "auto_pad": 1},
                 const_mask=[False, True, True, True, True, True, True,
                             True])[0]
    # Exact integer reference: int32 conv accumulation then requantize.
    acc = F.conv2d(torch.tensor(x_q.astype(np.float32)),
                   torch.tensor(w_q.astype(np.float32)),
                   padding=1).numpy()
    want = np.clip(np.round(acc * float(x_s) * float(w_s) / float(y_s)),
                   -128, 127)
    np.testing.assert_allclose(out.astype(np.float32), want, atol=1)


def test_silu():
    x = rng.randn(4, 5).astype(np.float32)
    out = run_op("Silu", [x])[0]
    np.testing.assert_allclose(out, x / (1 + np.exp(-x)), rtol=1e-5,
                               atol=1e-6)


def test_matmul_int8_weight_only_matches_dequant():
    x = rng.randn(8, 200).astype(np.float32)
    w = rng.randint(-127, 128, (200, 130)).astype(np.int8)
    ws = (np.abs(rng.randn(130)) * 0.01 + 0.001).astype(np.float32)
    out = np.asarray(gk.matmul_int8_weight_only(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(ws)))
    want = x @ (w.astype(np.float32) * ws[None, :])
    # The kernel runs the MXU in bf16: int8 weights cast exactly, but
    # activations round to bf16 (≤2^-8 relative per element) — immaterial
    # next to the int8 weight quantization error itself. Error bound:
    # |Δout| ≤ Σ_k |Δx|·|w·s| with |Δx| ≤ |x|·2^-8 (×2 slack).
    bound = np.abs(x) @ np.abs(w.astype(np.float32) * ws[None, :])
    assert (np.abs(out - want) <= bound * 2 ** -8 * 2 + 1e-6).all()
    # And bitwise-exact when activations are bf16-representable:
    x16 = x.astype(np.float32).astype(jnp.bfloat16).astype(np.float32)
    out2 = np.asarray(gk.matmul_int8_weight_only(
        jnp.asarray(x16), jnp.asarray(w), jnp.asarray(ws)))
    want2 = x16 @ w.astype(np.float32) * ws[None, :]
    np.testing.assert_allclose(out2, want2, rtol=1e-5, atol=1e-5)


def test_conv_integer_op():
    import torch
    import torch.nn.functional as F
    x = rng.randint(0, 255, (1, 2, 6, 6)).astype(np.uint8)
    w = rng.randint(-127, 128, (3, 2, 3, 3)).astype(np.int8)
    out = run_op("ConvInteger", [x, w, np.uint8(128), None],
                 {"strides": [1, 1], "pads": [1, 1, 1, 1], "auto_pad": 1,
                  "groups": 1, "dilations": [1, 1]},
                 const_mask=[False, False, True, True])[0]
    want = F.conv2d(torch.tensor(x.astype(np.float32) - 128),
                    torch.tensor(w.astype(np.float32)), padding=1).numpy()
    np.testing.assert_array_equal(out, want.astype(np.int32))
    assert out.dtype == np.int32


def test_matmul_argmax_int8_matches_reference():
    """Fused head+argmax kernel vs argmax over the dequantized matmul,
    incl. a vocab size that is not a tile multiple (padding mask)."""
    for m, d, v in [(8, 64, 384), (3, 96, 301), (1, 128, 1000)]:
        x = rng.randn(m, d).astype(np.float32)
        w = rng.randint(-127, 128, size=(d, v)).astype(np.int8)
        scales = (rng.rand(v).astype(np.float32) + 0.1) / 100
        got = np.asarray(gk.matmul_argmax_int8(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(scales)))
        assert got.dtype == np.int32 and got.shape == (m,)
        # Exact reference for the kernel's arithmetic: bf16 products,
        # f32 accumulation over the full D (tiles split V, not D), then
        # per-column scales — identical op order in interpret mode.
        ref_logits = np.asarray(
            jnp.dot(jnp.asarray(x, jnp.bfloat16),
                    jnp.asarray(w, jnp.bfloat16),
                    preferred_element_type=jnp.float32)) * scales[None, :]
        np.testing.assert_array_equal(got, ref_logits.argmax(axis=1))
        # And vs full-precision logits: agreement wherever the top-2 gap
        # exceeds the bf16 rounding bound Σ|x||w|·2^-8·2.
        logits = (x.astype(np.float32) @ (w.astype(np.float32)
                                          * scales[None, :]))
        want = logits.argmax(axis=1)
        bound = (np.abs(x) @ (np.abs(w) * scales[None, :])) * 2 ** -8 * 2
        top2 = np.sort(logits, axis=1)[:, -2:]
        clear = (top2[:, 1] - top2[:, 0]) > bound.max(axis=1)
        assert (got[clear] == want[clear]).all()


def test_matmul_argmax_int8_tie_breaks_to_first():
    """Exact ties (duplicated columns, exactly-representable values)
    resolve to the lowest index, matching jnp.argmax — including ties
    that span tile boundaries."""
    d, v = 8, 512
    x = np.ones((2, d), np.float32)
    w = np.zeros((d, v), np.int8)
    w[:, 7] = 5
    w[:, 300] = 5   # same column, different vocab tile at bn<=256
    scales = np.ones(v, np.float32)
    got = np.asarray(gk.matmul_argmax_int8(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(scales),
    ))
    assert (got == 7).all()


# -- word-packed int4 (round 4 "bitcast treatment") ---------------------


def test_pack_int4_words_roundtrip():
    from rten_tpu.kernels.quant import pack_int4_words, unpack_int4_words
    rng = np.random.RandomState(0)
    q = rng.randint(-8, 8, size=(64, 512)).astype(np.int8)
    words = pack_int4_words(q)
    assert words.shape == (16, 256) and words.dtype == np.int32
    np.testing.assert_array_equal(np.asarray(unpack_int4_words(words)), q)


@pytest.mark.parametrize("k,block_k", [(256, 512), (2048, 1024)])
def test_matmul_int4_words_bf16_matches_reference(k, block_k):
    from rten_tpu.kernels.gemm import matmul_int4_words
    from rten_tpu.kernels.quant import (dequantize_int4_words,
                                        quantize_int4_words)
    rng = np.random.RandomState(1)
    w = rng.randn(k, 256).astype(np.float32)
    x = rng.randn(8, k).astype(np.float32)
    words, scales = quantize_int4_words(w)
    want = np.asarray(jnp.asarray(x) @ dequantize_int4_words(
        words, scales))
    got = np.asarray(matmul_int4_words(jnp.asarray(x), jnp.asarray(words),
                                       jnp.asarray(scales),
                                       block_k=block_k))
    # bf16 product rounding over K accumulations.
    np.testing.assert_allclose(got, want, rtol=0.02,
                               atol=0.05 * np.abs(want).max())


def test_matmul_int4_words_int8_dot_close():
    from rten_tpu.kernels.gemm import matmul_int4_words
    from rten_tpu.kernels.quant import (dequantize_int4_words,
                                        quantize_int4_words)
    rng = np.random.RandomState(2)
    w = rng.randn(512, 256).astype(np.float32)
    x = rng.randn(4, 512).astype(np.float32)
    words, scales = quantize_int4_words(w)
    want = np.asarray(jnp.asarray(x) @ dequantize_int4_words(
        words, scales))
    got = np.asarray(matmul_int4_words(jnp.asarray(x), jnp.asarray(words),
                                       jnp.asarray(scales),
                                       dot_mode="int8"))
    # Adds per-row int8 activation quantization (~0.4% rel).
    np.testing.assert_allclose(got, want, rtol=0.05,
                               atol=0.05 * np.abs(want).max())


def test_linear_routes_word_packed_int4():
    """quantize_weights(int4_packing="words") must produce int32-packed
    QuantWeights whose linear() outputs track the byte-packed path."""
    from rten_tpu.models.transformer import linear, quantize_weights
    rng = np.random.RandomState(3)
    params = {"w_up": jnp.asarray(rng.randn(256, 256), jnp.float32)}
    pb = quantize_weights(params, "int4", int4_packing="bytes")
    pw = quantize_weights(params, "int4")   # words is the default
    assert pw["w_up"].data.dtype == jnp.int32
    assert pb["w_up"].data.dtype == jnp.uint8
    x = jnp.asarray(rng.randn(4, 256), jnp.float32)
    a = np.asarray(linear(x, pb["w_up"]))
    b = np.asarray(linear(x, pw["w_up"]))
    np.testing.assert_allclose(a, b, rtol=0.02,
                               atol=0.02 * np.abs(a).max() + 1e-5)


def test_conv_integer_native_path_exact(monkeypatch):
    """RTEN_CONVINT_NATIVE=1 (narrow int8/uint8 operands into XLA's
    conv + zero-point correction on the accumulator) must be bit-exact
    vs the widen-to-int32 path, including padding borders and groups."""
    import os
    from rten_tpu.ops.quantized import conv_integer
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randint(0, 256, (2, 8, 9, 9)), jnp.uint8)
    w = jnp.asarray(rng.randint(-128, 128, (16, 8, 3, 3)), jnp.int8)
    zp = jnp.asarray(131, jnp.uint8)
    attrs = {"strides": [2, 2], "pads": [1, 1, 1, 1], "groups": 1}
    monkeypatch.setenv("RTEN_CONVINT_NATIVE", "0")
    want = np.asarray(conv_integer(None, attrs, x, w, zp))
    monkeypatch.setenv("RTEN_CONVINT_NATIVE", "1")
    got = np.asarray(conv_integer(None, attrs, x, w, zp))
    np.testing.assert_array_equal(got, want)
    # Depthwise/grouped + no zero point (symmetric int8 activations).
    xg = jnp.asarray(rng.randint(-128, 128, (2, 8, 7, 7)), jnp.int8)
    wg = jnp.asarray(rng.randint(-128, 128, (8, 1, 3, 3)), jnp.int8)
    ag = {"strides": [1, 1], "pads": [1, 1, 1, 1], "groups": 8}
    monkeypatch.setenv("RTEN_CONVINT_NATIVE", "0")
    want = np.asarray(conv_integer(None, ag, xg, wg))
    monkeypatch.setenv("RTEN_CONVINT_NATIVE", "1")
    got = np.asarray(conv_integer(None, ag, xg, wg))
    np.testing.assert_array_equal(got, want)
