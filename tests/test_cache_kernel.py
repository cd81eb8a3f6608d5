"""Tests for the Pallas in-place KV-append kernel (kernels/cache.py) and
its wiring into the token-major fused KVCache (the decode-path
replacement for XLA's scatter lowering of vmap(dynamic_update_slice))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rten_tpu.generate.kv_cache import KVCache
from rten_tpu.kernels.cache import cache_append


def test_cache_append_multiple_buffers_and_offsets():
    B, cap, R = 3, 16, 128          # token-major rows of width R
    rng = np.random.RandomState(0)
    c1 = jnp.asarray(rng.randn(B, cap, 2, R).astype(np.float32))
    c2 = jnp.asarray(rng.randn(B, cap, R).astype(np.float32))
    n1 = jnp.asarray(rng.randn(B, 1, 2, R).astype(np.float32))
    n2 = jnp.asarray(rng.randn(B, 1, R).astype(np.float32))
    lengths = jnp.asarray([0, 5, 15], jnp.int32)

    o1, o2 = jax.jit(cache_append)(lengths, (c1, c2), (n1, n2))
    r1, r2 = np.asarray(c1).copy(), np.asarray(c2).copy()
    for b, p in enumerate([0, 5, 15]):
        r1[b, p] = np.asarray(n1)[b, 0]
        r2[b, p] = np.asarray(n2)[b, 0]
    np.testing.assert_array_equal(np.asarray(o1), r1)
    np.testing.assert_array_equal(np.asarray(o2), r2)


def test_cache_append_single_buffer_bf16():
    B, cap, R = 2, 8, 256
    c = jnp.zeros((B, cap, R), jnp.bfloat16)
    new = jnp.ones((B, 1, R), jnp.bfloat16)
    (out,) = cache_append(jnp.asarray([3, 7], jnp.int32), (c,), (new,))
    out = np.asarray(out.astype(jnp.float32))
    assert out[0, 3].sum() == R and out[1, 7].sum() == R
    assert out.sum() == 2 * R  # nothing else written


def test_kvcache_decode_append_matches_dense_path():
    """KVCache.append with position=None and T=1 (the decode path) routes
    through the Pallas kernel when KVH*D is lane-aligned; it must place
    values exactly where the prefill-style dense write would."""
    B, L, H, cap, D = 2, 3, 4, 16, 32     # H*D = 128 → kernel path
    rng = np.random.RandomState(1)
    cache = KVCache.create(B, L, H, cap, D)
    cache = cache.with_lengths(jnp.asarray([2, 9], jnp.int32))
    k = jnp.asarray(rng.randn(B, H, 1, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, 1, D).astype(np.float32))
    out = cache.append(1, k, v, position=None)
    got_k, got_v = out.layer_kv(1)
    got_k = np.asarray(got_k)
    assert np.allclose(got_k[0, :, 2], np.asarray(k)[0, :, 0])
    assert np.allclose(got_k[1, :, 9], np.asarray(k)[1, :, 0])
    assert np.allclose(np.asarray(got_v)[1, :, 9], np.asarray(v)[1, :, 0])
    assert np.asarray(out.kv[0]).sum() == 0  # other layers untouched
    got_k = got_k.copy()
    got_k[0, :, 2] = 0
    got_k[1, :, 9] = 0
    assert got_k.sum() == 0  # untouched positions remain zero


def test_kvcache_decode_append_unaligned_falls_back():
    """KVH*D not a multiple of 128 uses the XLA fallback — same result."""
    B, L, H, cap, D = 2, 1, 2, 8, 4       # H*D = 8 → fallback path
    cache = KVCache.create(B, L, H, cap, D)
    cache = cache.with_lengths(jnp.asarray([1, 6], jnp.int32))
    k = jnp.full((B, H, 1, D), 3.0)
    v = jnp.full((B, H, 1, D), 4.0)
    out = cache.append(0, k, v, position=None)
    kk, vv = out.layer_kv(0)
    assert np.asarray(kk)[0, :, 1].sum() == H * D * 3
    assert np.asarray(vv)[1, :, 6].sum() == H * D * 4


def test_kvcache_decode_append_quantized():
    B, L, H, cap, D = 2, 1, 2, 8, 64      # H*D = 128 → kernel path
    cache = KVCache.create(B, L, H, cap, D, quantized=True)
    cache = cache.with_lengths(jnp.asarray([0, 4], jnp.int32))
    rng = np.random.RandomState(2)
    k = jnp.asarray(rng.randn(B, H, 1, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, 1, D).astype(np.float32))
    out = cache.append(0, k, v, position=None)
    kd, vd = out.layer_kv(0)
    # int8 per-token quantization: ~1% relative error bound on roundtrip.
    np.testing.assert_allclose(np.asarray(kd)[0, :, 0],
                               np.asarray(k)[0, :, 0],
                               atol=np.abs(np.asarray(k)).max() / 100)
    np.testing.assert_allclose(np.asarray(vd)[1, :, 4],
                               np.asarray(v)[1, :, 0],
                               atol=np.abs(np.asarray(v)).max() / 100)


def test_engine_decode_matches_reference_generator():
    """End-to-end guard: engine decode (Pallas append + fused flash
    decode) still reproduces greedy generation of the plain forward."""
    from rten_tpu.generate.engine import ServingEngine
    from rten_tpu.models.transformer import TransformerConfig, TransformerLM

    cfg = TransformerConfig.tiny_test()
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    prompt = [5, 17, 3, 99]

    eng = ServingEngine(model, params, max_batch=2, capacity=64,
                        prefill_buckets=(8,))
    got = eng.generate([prompt], max_new_tokens=6)[0]

    # Reference: greedy decode with full forward re-runs (no cache).
    ids = list(prompt)
    ref = []
    for _ in range(6):
        logits, _ = model.forward(params, jnp.asarray([ids], jnp.int32))
        nxt = int(np.argmax(np.asarray(logits)[0, -1]))
        ref.append(nxt)
        ids.append(nxt)
    assert got == ref


def test_packed_scale_cap2048_formats_agree():
    """Advisor r2: the capacity>=2048 bf16-pair-packed scale format
    (pack_bf16_rows + the unaligned packed window-RMW in _quant_append +
    the packed branch of cache_append_quant) had no CPU regression test.
    Drive one cap-2048 cache through (a) aligned odd-T prefill,
    (b) odd-offset chunk append, (c) BOTH halfword decode appends
    (even + odd positions), and compare grouped+fused attention output
    against a hand-built f32-scale cache holding identical contents
    (the kernels accept both formats; values must agree to bf16
    rounding, which the packed write applies FIRST — so exactly)."""
    from rten_tpu.generate.kv_cache import SCALE_LANES
    from rten_tpu.kernels.attention import (flash_decode_fused,
                                            flash_decode_grouped)

    b, kvh, d, cap = 8, 2, 64, 2048
    rng = np.random.RandomState(7)
    packed_c = KVCache.create(b, 1, kvh, cap, d, quantized=True)
    assert packed_c.quant_scales[0].dtype == jnp.int32  # packed format
    f32_scales = [jnp.ones((b, cap, 1, SCALE_LANES), jnp.float32)]
    f32_c = KVCache(list(packed_c.kv), packed_c.lengths, f32_scales,
                    kvh, d)

    def kv(t):
        return (jnp.asarray(rng.randn(b, kvh, t, d).astype(np.float32)),
                jnp.asarray(rng.randn(b, kvh, t, d).astype(np.float32)))

    # (a) aligned prefill with ODD t (pads rows + the scale halfword)
    k1, v1 = kv(13)
    packed_c = packed_c.append(0, k1, v1, position=0)
    f32_c = f32_c.append(0, k1, v1, position=0)
    lengths = jnp.full((b,), 13, jnp.int32)
    packed_c = packed_c.with_lengths(lengths)
    f32_c = f32_c.with_lengths(lengths)

    # (b) chunked append at per-sequence ODD offsets (window-RMW mid-word)
    k2, v2 = kv(5)
    packed_c = packed_c.append(0, k2, v2)      # offsets = lengths = 13
    f32_c = f32_c.append(0, k2, v2)
    lengths = lengths + 5                       # 18: even offset next
    packed_c = packed_c.with_lengths(lengths)
    f32_c = f32_c.with_lengths(lengths)

    # (c) decode appends: position 18 (low halfword) then 19 (high)
    for _ in range(2):
        k3, v3 = kv(1)
        packed_c = packed_c.append(0, k3, v3)
        f32_c = f32_c.append(0, k3, v3)
        lengths = lengths + 1
        packed_c = packed_c.with_lengths(lengths)
        f32_c = f32_c.with_lengths(lengths)

    # Same packed KV bytes in both caches by construction; the formats
    # differ only in scale storage. Attention must agree exactly.
    q = jnp.asarray(rng.randn(b, kvh, d).astype(np.float32))
    for fn in (
        lambda c: flash_decode_grouped(q, c.fused_layer(0), c.lengths,
                                       kvh, group=4, block_k=128,
                                       kv_scales=c.quant_scales[0]),
        lambda c: flash_decode_fused(q, c.fused_layer(0), c.lengths,
                                     kvh, kv_scales=c.quant_scales[0]),
    ):
        got = np.asarray(fn(packed_c))
        want = np.asarray(fn(f32_c))
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)
    # And the packed bytes really are identical (the scale formats did
    # not leak into the KV write paths).
    np.testing.assert_array_equal(np.asarray(packed_c.kv[0]),
                                  np.asarray(f32_c.kv[0]))


def test_tail_flush_matches_rmw_appends():
    """bf16 tail write-buffer + flush_tail must produce the same packed
    cache/scale state as per-token RMW decode appends of the same k/v
    rows, up to the bf16 rounding the buffered rows pass through (the
    quantization itself is elementwise, so batching it over the window
    introduces no further difference)."""
    import jax.numpy as jnp
    import numpy as np
    from rten_tpu.generate.kv_cache import KVCache

    B, L, KVH, D, cap, R = 4, 2, 4, 32, 64, 8
    rng = np.random.RandomState(5)
    base = KVCache.create(B, L, KVH, cap, D, quantized=True)
    tailc = KVCache.create(B, L, KVH, cap, D, quantized=True,
                           tail_window=R)
    # Different starting depths per sequence (continuous batching).
    lens0 = np.asarray([0, 5, 17, 30])
    base = base.with_lengths(lens0)
    tailc = tailc.with_lengths(lens0)

    steps = 6
    for t in range(steps):
        for layer in range(L):
            k = jnp.asarray(rng.randn(B, KVH, 1, D).astype(np.float32))
            v = jnp.asarray(rng.randn(B, KVH, 1, D).astype(np.float32))
            base = base.append(layer, k, v)
            tailc = tailc.append(layer, k, v)
        base = base.advance(1)
        tailc = tailc.advance(1)
    assert int(tailc.tail_count) == steps
    tailc = tailc.flush_tail(steps)
    assert int(tailc.tail_count) == 0

    for layer in range(L):
        bk, bv = base.layer_kv(layer)
        tk, tv = tailc.layer_kv(layer)
        # One int8 quant step (~absmax/127 with |x|~N(0,1)) plus the
        # bf16 row rounding bound the dequantized difference.
        np.testing.assert_allclose(np.asarray(bk), np.asarray(tk),
                                   atol=0.06)
        np.testing.assert_allclose(np.asarray(bv), np.asarray(tv),
                                   atol=0.06)
    np.testing.assert_array_equal(np.asarray(base.lengths),
                                  np.asarray(tailc.lengths))


def test_tail_flush_at_capacity_edge():
    """Sequences whose window ends exactly at capacity exercise the
    clipped-row path (byte shift 4 = full-row funnel select, halfword
    shift 2): flush must still match per-token RMW appends."""
    import jax.numpy as jnp
    import numpy as np
    from rten_tpu.generate.kv_cache import KVCache

    B, L, KVH, D, cap, R = 2, 1, 4, 32, 64, 8
    rng = np.random.RandomState(7)
    base = KVCache.create(B, L, KVH, cap, D, quantized=True)
    tailc = KVCache.create(B, L, KVH, cap, D, quantized=True,
                           tail_window=R)
    # Slot 0 ends exactly at capacity after 8 steps (shift hits the
    # clip); slot 1 is mid-cache.
    lens0 = np.asarray([cap - 8, 20])
    base = base.with_lengths(lens0)
    tailc = tailc.with_lengths(lens0)
    for t in range(8):
        for layer in range(L):
            k = jnp.asarray(rng.randn(B, KVH, 1, D).astype(np.float32))
            v = jnp.asarray(rng.randn(B, KVH, 1, D).astype(np.float32))
            base = base.append(layer, k, v)
            tailc = tailc.append(layer, k, v)
        base = base.advance(1)
        tailc = tailc.advance(1)
    tailc = tailc.flush_tail(8)
    bk, bv = base.layer_kv(0)
    tk, tv = tailc.layer_kv(0)
    np.testing.assert_allclose(np.asarray(bk), np.asarray(tk), atol=0.06)
    np.testing.assert_allclose(np.asarray(bv), np.asarray(tv), atol=0.06)


def test_tail_flush_non_divisor_batch():
    """Batch sizes the engine's tail auto-gate accepts but 64 does not
    divide (e.g. 96) must still flush: cache_flush_quant picks the
    largest chunk that divides the batch (advisor r3 finding 2 — the
    old min(batch, 64) chunk tripped its divisibility assert)."""
    import jax.numpy as jnp
    import numpy as np
    from rten_tpu.generate.kv_cache import KVCache

    B, L, KVH, D, cap, R = 96, 1, 4, 32, 64, 4
    rng = np.random.RandomState(9)
    base = KVCache.create(B, L, KVH, cap, D, quantized=True)
    tailc = KVCache.create(B, L, KVH, cap, D, quantized=True,
                           tail_window=R)
    lens0 = np.asarray(rng.randint(0, cap - R, B))
    base = base.with_lengths(lens0)
    tailc = tailc.with_lengths(lens0)
    for t in range(R):
        k = jnp.asarray(rng.randn(B, KVH, 1, D).astype(np.float32))
        v = jnp.asarray(rng.randn(B, KVH, 1, D).astype(np.float32))
        base = base.append(0, k, v)
        tailc = tailc.append(0, k, v)
        base = base.advance(1)
        tailc = tailc.advance(1)
    tailc = tailc.flush_tail(R)
    bk, bv = base.layer_kv(0)
    tk, tv = tailc.layer_kv(0)
    np.testing.assert_allclose(np.asarray(bk), np.asarray(tk), atol=0.06)
    np.testing.assert_allclose(np.asarray(bv), np.asarray(tv), atol=0.06)


def test_cache_append_quant_masked():
    """masked=True skips sequences with pos < 0 entirely (both planes
    and scale rows untouched) — the seq-sharded append primitive where
    non-owner capacity shards pass -1."""
    from rten_tpu.kernels.cache import cache_append_quant

    B, cap, F = 4, 16, 128
    rng = np.random.RandomState(3)
    kv = jnp.asarray(rng.randint(-2**31, 2**31 - 1,
                                 (B, cap // 4, 2, F), np.int64)
                     .astype(np.int32))
    sbuf = jnp.asarray(rng.randint(-2**31, 2**31 - 1,
                                   (B, cap // 2, 1, 128), np.int64)
                       .astype(np.int32))
    bytes_kv = jnp.asarray(rng.randint(-127, 128, (B, 2, 1, F),
                                       np.int64).astype(np.int32))
    srows = jnp.asarray(rng.rand(B, 1, 1, 128).astype(np.float32))
    pos = jnp.asarray([3, -1, 9, -1], jnp.int32)

    got_kv, got_s = cache_append_quant(pos, kv, sbuf, bytes_kv, srows,
                                       masked=True)
    # Reference: unmasked kernel on the owner rows only.
    want_kv, want_s = cache_append_quant(
        jnp.asarray([3, 9], jnp.int32), kv[jnp.asarray([0, 2])],
        sbuf[jnp.asarray([0, 2])], bytes_kv[jnp.asarray([0, 2])],
        srows[jnp.asarray([0, 2])])
    np.testing.assert_array_equal(np.asarray(got_kv)[[0, 2]],
                                  np.asarray(want_kv))
    np.testing.assert_array_equal(np.asarray(got_s)[[0, 2]],
                                  np.asarray(want_s))
    # Masked sequences: bit-identical to the input.
    np.testing.assert_array_equal(np.asarray(got_kv)[[1, 3]],
                                  np.asarray(kv)[[1, 3]])
    np.testing.assert_array_equal(np.asarray(got_s)[[1, 3]],
                                  np.asarray(sbuf)[[1, 3]])


def _tail_vs_rmw(mode, t, lens0, cap=64, steps2=None, insert_from=None,
                 monkeypatch=None):
    """Drive a tail cache and an RMW-append reference through the same
    token stream; return the max dequantized difference."""
    import os

    import jax.numpy as jnp
    import numpy as np
    from rten_tpu.generate.kv_cache import KVCache

    monkeypatch.setenv("RTEN_FLUSH_CARRY", mode)
    B, L, KVH, D, R = len(lens0), 1, 4, 32, 8
    rng = np.random.RandomState(11)
    base = KVCache.create(B, L, KVH, cap, D, quantized=True)
    tailc = KVCache.create(B, L, KVH, cap, D, quantized=True,
                           tail_window=R)
    base = base.with_lengths(np.asarray(lens0))
    tailc = tailc.with_lengths(np.asarray(lens0))
    if insert_from is not None:
        # Admission path: carry must re-init from the inserted packed
        # rows (the donor sequence ends mid-row).
        donor = KVCache.create(1, L, KVH, cap, D, quantized=True)
        for s in range(insert_from):
            k = jnp.asarray(rng.randn(1, KVH, 1, D).astype(np.float32))
            v = jnp.asarray(rng.randn(1, KVH, 1, D).astype(np.float32))
            donor = donor.append(0, k, v)
            donor = donor.advance(1)
            kb = jnp.broadcast_to(k, (B,) + k.shape[1:])
            vb = jnp.broadcast_to(v, (B,) + v.shape[1:])
            base = base.append(0, kb, vb)
            base = base.advance(1)
        # Re-route: only slot 0 of base actually matches the donor; we
        # compare slot 0 only below in this mode.
        tailc = tailc.insert_sequence(donor, 0, insert_from)
        base = base.with_lengths(
            np.asarray([insert_from] + list(lens0[1:])))

    def do(n):
        nonlocal base, tailc
        for s in range(n):
            k = jnp.asarray(rng.randn(B, KVH, 1, D).astype(np.float32))
            v = jnp.asarray(rng.randn(B, KVH, 1, D).astype(np.float32))
            base = base.append(0, k, v)
            tailc = tailc.append(0, k, v)
            base = base.advance(1)
            tailc = tailc.advance(1)

    do(t)
    tailc = tailc.flush_tail(t)
    if steps2:
        do(steps2)
        tailc = tailc.flush_tail(steps2)
    bk, bv = base.layer_kv(0)
    tk, tv = tailc.layer_kv(0)
    if insert_from is not None:
        bk, bv, tk, tv = bk[:1], bv[:1], tk[:1], tv[:1]
    return max(np.abs(np.asarray(bk) - np.asarray(tk)).max(),
               np.abs(np.asarray(bv) - np.asarray(tv)).max())


@pytest.mark.parametrize("mode", ["0", "1"])
def test_tail_flush_partial_window_any_t(mode, monkeypatch):
    """Partial-window flushes (t % 4 != 0, the pre-admission host
    flush) must not drop tokens: w4 = t//4 + 1 could not cover
    shift + t bytes (round-5 bug — max err was a whole lost token).
    Covers both the RMW kernel and the carry-mode routing (partial
    flushes fall back to RMW + carry refresh)."""
    assert _tail_vs_rmw(mode, 3, [2, 7], monkeypatch=monkeypatch) < 0.06
    # capacity-edge clip with t % 4 != 0 (shift can exceed 4)
    assert _tail_vs_rmw(mode, 3, [61, 20],
                        monkeypatch=monkeypatch) < 0.06
    assert _tail_vs_rmw(mode, 5, [3, 30], steps2=8,
                        monkeypatch=monkeypatch) < 0.06


def test_tail_flush_carry_round_trip(monkeypatch):
    """Carry-mode (whole-row write) flushes chain exactly: flush N+1's
    leading partial-row bytes come from the carry row flush N saved —
    never from a cache read — including at the capacity edge
    (shift == 4: the whole first row rewrites from carry)."""
    assert _tail_vs_rmw("1", 8, [1, 5], steps2=8,
                        monkeypatch=monkeypatch) < 0.06
    assert _tail_vs_rmw("1", 8, [56, 20],
                        monkeypatch=monkeypatch) < 0.06


def test_tail_flush_carry_init_from_insert(monkeypatch):
    """insert_sequence must initialize the slot's carry rows from the
    inserted packed data: the first flush's window starts mid-row at
    the admitted length."""
    # length 13: 13 % 4 == 1 -> the first flush needs 1 carry byte.
    assert _tail_vs_rmw("1", 8, [0, 9], insert_from=13,
                        monkeypatch=monkeypatch) < 0.06
