"""Adversarial numerics sweeps for the Pallas kernels — the framework's
analog of the reference's exhaustive ULP harness
(rten-vecmath/src/testing.rs, ulp.rs): instead of sweeping all 2^32
floats through scalar functions, we drive the kernels' NUMERICAL
STRUCTURE (the online-softmax recurrence, length raggedness, int8
scale folding) with exponent-extreme and tie-heavy inputs and bound the
error against an fp64 reference in f32 ULPs.

Bounds documented per case; interpret-mode kernels compute in f32 (the
MXU's bf16-input rounding on hardware is validated separately —
BASELINE.md "kernel correctness on hardware").
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rten_tpu.kernels.attention import (flash_attention,
                                        flash_decode_fused,
                                        flash_decode_grouped)

def ulp_dist(got, want64):
    """Element-wise ULP distance between f32 ``got`` and the f32
    rounding of the f64 reference (monotone int reinterpretation)."""
    want = np.asarray(want64, np.float64).astype(np.float32)
    a = np.asarray(got, np.float32)

    def key(x):
        i = x.view(np.int32).astype(np.int64)
        return np.where(i < 0, -(i & 0x7FFFFFFF), i)

    return np.abs(key(a) - key(want))


def assert_bounded(got, want, max_ulp, rel=1e-4):
    """Per-element: ULP distance within ``max_ulp`` OR relative error
    within ``rel`` — raw ULPs inflate arbitrarily as outputs approach
    zero (cancellation in the fp64 reference itself), so near-zero
    elements are judged relatively."""
    got = np.asarray(got, np.float32)
    assert np.isfinite(got).all()
    u = ulp_dist(got, want)
    relerr = np.abs(got - np.asarray(want, np.float64)) / (
        np.abs(want) + 1e-300)
    ok = (u <= max_ulp) | (relerr <= rel)
    assert ok.all(), (u.max(), relerr.max())


def ref_decode_f64(q, k, v, lengths):
    """fp64 single-query attention over a ragged cache."""
    q, k, v = (np.asarray(x, np.float64) for x in (q, k, v))
    b, h, d = q.shape
    out = np.zeros((b, h, d))
    scale = 1.0 / np.sqrt(d)
    for i in range(b):
        kk, vv = k[i, :, : lengths[i]], v[i, :, : lengths[i]]
        s = np.einsum("hd,hkd->hk", q[i], kk) * scale
        s -= s.max(axis=1, keepdims=True)
        p = np.exp(s)
        p /= p.sum(axis=1, keepdims=True)
        out[i] = np.einsum("hk,hkd->hd", p, vv)
    return out


def _fused_kv(k, v):
    """[B, H, cap, D] pair → token-major [B, cap, 2, H*D]."""
    b, h, cap, d = k.shape
    pack = np.stack([k.transpose(0, 2, 1, 3).reshape(b, cap, h * d),
                     v.transpose(0, 2, 1, 3).reshape(b, cap, h * d)],
                    axis=2)
    return jnp.asarray(pack.astype(np.float32))


B, H, D, CAP = 4, 2, 64, 128


def _run_decode(q, k, v, lengths, grouped):
    kv = _fused_kv(k, v)
    if grouped:
        out = flash_decode_grouped(jnp.asarray(q, jnp.float32), kv,
                                   jnp.asarray(lengths, jnp.int32), H,
                                   group=2, block_k=32)
    else:
        out = flash_decode_fused(jnp.asarray(q, jnp.float32), kv,
                                 jnp.asarray(lengths, jnp.int32), H,
                                 block_k=32)
    return np.asarray(out)


@pytest.mark.parametrize("grouped", [False, True])
def test_decode_extreme_exponents(grouped):
    """Mixed 2^±24 magnitudes: the online-softmax max/rescale chain must
    not overflow or lose the dominant terms. Bound: ≤ 512 ULP (observed
    ≤ ~64; the slack covers accumulation-order variance)."""
    rng = np.random.RandomState(1)
    mags = 2.0 ** rng.uniform(-24, 24, (B, H, CAP, 1))
    k = rng.randn(B, H, CAP, D) * mags
    v = rng.randn(B, H, CAP, D)
    # Keep q moderate so scores span ~±2^28 — far past exp() range;
    # only the running-max subtraction keeps this finite.
    q = rng.randn(B, H, D).astype(np.float32)
    lengths = np.array([1, 31, 32, CAP])
    got = _run_decode(q, k, v, lengths, grouped)
    want = ref_decode_f64(q, k, v, lengths)
    assert_bounded(got, want, max_ulp=512)


@pytest.mark.parametrize("grouped", [False, True])
def test_decode_score_ties(grouped):
    """Many exactly-tied maxima: every block updates the running max to
    the same value — alpha must stay exactly 1 and the weights uniform.
    Bound: ≤ 512 ULP / 1e-4 relative (measured 186 ULP = 1.5e-5 rel:
    the uniform 1/128-weight sum accumulates in a different order than
    the fp64 reference; ULPs inflate on the near-zero outputs)."""
    rng = np.random.RandomState(2)
    k = np.tile(rng.randn(B, H, 1, D), (1, 1, CAP, 1))
    v = rng.randn(B, H, CAP, D)
    q = rng.randn(B, H, D)
    lengths = np.array([CAP, CAP - 1, 33, 2])
    got = _run_decode(q, k, v, lengths, grouped)
    want = ref_decode_f64(q, k, v, lengths)
    assert_bounded(got, want, max_ulp=512, rel=1e-4)


@pytest.mark.parametrize("grouped", [False, True])
def test_decode_underflow_tail(grouped):
    """One dominant key per sequence, the rest 80 units of score below:
    exp underflows to 0 for the tail and the output must equal the
    dominant V row to ≤ 8 ULP."""
    rng = np.random.RandomState(3)
    k = rng.randn(B, H, CAP, D) * 0.01
    dom = rng.randint(0, 30, B)
    q = rng.randn(B, H, D)
    for i in range(B):
        # Make key `dom[i]` align with q so its score towers.
        k[i, :, dom[i]] = 40 * q[i] / np.linalg.norm(q[i], axis=-1,
                                                     keepdims=True)
    v = rng.randn(B, H, CAP, D)
    lengths = np.full(B, 31)
    dom = np.minimum(dom, 30)
    got = _run_decode(q, k, v, lengths, grouped)
    want = ref_decode_f64(q, k, v, lengths)
    assert_bounded(got, want, max_ulp=64)
    # And the result is the dominant row (softmax ≈ one-hot).
    for i in range(B):
        np.testing.assert_allclose(got[i], v[i, :, dom[i]], rtol=1e-3,
                                   atol=1e-4)


def test_int8_decode_extreme_scales():
    """Token-packed int8 path with per-token scales spanning 2^±20: the
    in-kernel MXU scale expansion (merged K+V selector dot) must
    reproduce fp64 dequantized attention. Bound: relative 2e-3 of the
    output scale (int8 kernels re-quantize nothing — error is softmax
    accumulation only)."""
    rng = np.random.RandomState(4)
    from rten_tpu.generate.kv_cache import (SCALE_LANES, VSCALE_OFF,
                                            pack_int8_cache)
    kq = rng.randint(-127, 128, (B, CAP, H * D))
    vq = rng.randint(-127, 128, (B, CAP, H * D))
    ks = 2.0 ** rng.uniform(-20, 20, (B, CAP, H)).astype(np.float32)
    vs = 2.0 ** rng.uniform(-6, 6, (B, CAP, H)).astype(np.float32)
    sc = np.ones((B, CAP, 1, SCALE_LANES), np.float32)
    sc[:, :, 0, :H] = ks
    sc[:, :, 0, VSCALE_OFF:VSCALE_OFF + H] = vs
    q = rng.randn(B, H, D) * 0.05
    lengths = np.array([5, 32, 77, CAP])
    kv = pack_int8_cache(jnp.asarray(kq), jnp.asarray(vq))
    got = np.asarray(flash_decode_grouped(
        jnp.asarray(q, jnp.float32), kv, jnp.asarray(lengths, jnp.int32),
        H, group=2, block_k=32, kv_scales=jnp.asarray(sc)))

    kf = (kq.reshape(B, CAP, H, D) * ks[..., None]).transpose(0, 2, 1, 3)
    vf = (vq.reshape(B, CAP, H, D) * vs[..., None]).transpose(0, 2, 1, 3)
    want = ref_decode_f64(q, kf, vf, lengths)
    assert np.isfinite(got).all()
    denom = np.abs(want).max(axis=-1, keepdims=True) + 1e-30
    assert (np.abs(got - want) / denom).max() <= 2e-3


def test_prefill_flash_extreme_rows():
    """Causal prefill with exponent-extreme K rows: every row of the
    online recurrence stays finite and within 512 ULP of fp64."""
    rng = np.random.RandomState(5)
    S = 64
    mags = 2.0 ** rng.uniform(-20, 20, (2, H, S, 1))
    q = rng.randn(2, H, S, D).astype(np.float32)
    k = (rng.randn(2, H, S, D) * mags).astype(np.float32)
    v = rng.randn(2, H, S, D).astype(np.float32)
    got = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), causal=True))
    q64, k64, v64 = (np.asarray(x, np.float64) for x in (q, k, v))
    s = np.einsum("bhqd,bhkd->bhqk", q64, k64) / np.sqrt(D)
    mask = np.tril(np.ones((S, S), bool))
    s = np.where(mask, s, -np.inf)
    s -= s.max(axis=-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(axis=-1, keepdims=True)
    want = np.einsum("bhqk,bhkd->bhqd", p, v64)
    assert_bounded(got, want, max_ulp=512, rel=5e-4)


def test_int8_gemm_extreme_scale_folding():
    """matmul_int8_weight_only with per-column scales spanning 2^±30:
    the bf16-product/f32-accumulate pipeline must track fp64 to 2^-7
    relative per column (bf16 mantissa bound), never overflow."""
    rng = np.random.RandomState(6)
    from rten_tpu.kernels import gemm as gk
    m, k, n = 8, 128, 256
    x = rng.randn(m, k).astype(np.float32)
    w = rng.randint(-127, 128, (k, n)).astype(np.int8)
    scales = (2.0 ** rng.uniform(-30, 30, n)).astype(np.float32)
    got = np.asarray(gk.matmul_int8_weight_only(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(scales)))
    want = (x.astype(np.float64) @ w.astype(np.float64)) * scales
    assert np.isfinite(got).all()
    denom = np.abs(x).astype(np.float64) @ np.abs(w).astype(np.float64)
    rel = np.abs(got - want) / (denom * scales + 1e-300)
    assert rel.max() <= 2 ** -7
