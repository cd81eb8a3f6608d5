"""Flash attention kernel tests (interpret mode on CPU) vs the jnp
reference formulation."""

import numpy as np
import jax.numpy as jnp
import pytest

from rten_tpu.kernels.attention import (_attn_reference, flash_attention,
                                        flash_decode)

rng = np.random.RandomState(11)


def _qkv(b, h, s, d):
    return (jnp.asarray(rng.randn(b, h, s, d).astype(np.float32) * 0.5)
            for _ in range(3))


@pytest.mark.parametrize("causal", [True, False])
def test_flash_attention_matches_reference(causal):
    q, k, v = _qkv(2, 3, 256, 128)
    out = flash_attention(q, k, v, causal=causal)
    want = _attn_reference(q, k, v, causal, 1 / np.sqrt(128))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_flash_attention_multi_qblock():
    q, k, v = _qkv(1, 2, 512, 128)
    out = flash_attention(q, k, v, causal=True, block_q=128, block_k=128)
    want = _attn_reference(q, k, v, True, 1 / np.sqrt(128))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_flash_attention_small_fallback():
    q, k, v = _qkv(1, 2, 7, 64)
    out = flash_attention(q, k, v, causal=True)
    want = _attn_reference(q, k, v, True, 1 / np.sqrt(64))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_flash_decode_masks_cache_tail():
    b, h, kvh, smax, d = 2, 6, 2, 512, 128
    q = jnp.asarray(rng.randn(b, h, d).astype(np.float32))
    kc = jnp.asarray(rng.randn(b, kvh, smax, d).astype(np.float32))
    vc = jnp.asarray(rng.randn(b, kvh, smax, d).astype(np.float32))
    lengths = jnp.asarray([37, 512], jnp.int32)
    out = flash_decode(q, kc, vc, lengths, block_k=256)
    kf = jnp.repeat(kc, h // kvh, axis=1)
    vf = jnp.repeat(vc, h // kvh, axis=1)
    want = _attn_reference(q[:, :, None, :], kf, vf, False,
                           1 / np.sqrt(d), lengths)[:, :, 0, :]
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_flash_decode_result_independent_of_padding():
    b, h, smax, d = 1, 2, 512, 128
    q = jnp.asarray(rng.randn(b, h, d).astype(np.float32))
    kc = rng.randn(b, h, smax, d).astype(np.float32)
    vc = rng.randn(b, h, smax, d).astype(np.float32)
    length = 100
    out1 = flash_decode(q, jnp.asarray(kc), jnp.asarray(vc),
                        jnp.asarray([length]), block_k=256)
    # Garbage in the padded tail must not change the result.
    kc2, vc2 = kc.copy(), vc.copy()
    kc2[:, :, length:] = 1e9
    vc2[:, :, length:] = -1e9
    out2 = flash_decode(q, jnp.asarray(kc2), jnp.asarray(vc2),
                        jnp.asarray([length]), block_k=256)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-6)


def test_flash_decode_fused_quantized_cache():
    """int8 token-major cache + per-(token, head) scales must match
    attention over the dequantized cache (the kernel dequantizes on the
    MXU: K's scale factors out of the score dot, V's folds into P)."""
    import numpy as np
    from rten_tpu.kernels.attention import (_attn_reference,
                                            flash_decode_fused)
    from rten_tpu.generate.kv_cache import (SCALE_LANES, VSCALE_OFF,
                                            pack_int8_cache)

    B, H, KVH, D, cap = 2, 8, 4, 32, 64
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(B, H, D).astype(np.float32))
    k_q = rng.randint(-127, 128, (B, cap, KVH * D)).astype(np.int32)
    v_q = rng.randint(-127, 128, (B, cap, KVH * D)).astype(np.int32)
    kv_q = pack_int8_cache(jnp.asarray(k_q), jnp.asarray(v_q))
    s_np = 0.01 + 0.05 * rng.rand(B, cap, 2, KVH).astype(np.float32)
    scales = np.ones((B, cap, 1, SCALE_LANES), np.float32)
    scales[:, :, 0, :KVH] = s_np[:, :, 0]
    scales[:, :, 0, VSCALE_OFF:VSCALE_OFF + KVH] = s_np[:, :, 1]
    lengths = jnp.asarray([5, 63], jnp.int32)

    out = flash_decode_fused(q, kv_q, lengths, KVH,
                             kv_scales=jnp.asarray(scales))

    raw = {0: k_q, 1: v_q}

    def plane(i):
        x = jnp.asarray(raw[i]).reshape(B, cap, KVH, D).astype(jnp.float32)
        x = x * s_np[:, :, i][..., None]
        return jnp.repeat(x.transpose(0, 2, 1, 3), H // KVH, axis=1)

    ref = _attn_reference(q[:, :, None, :], plane(0), plane(1), False,
                          1.0 / np.sqrt(D), lengths)[:, :, 0, :]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_verify_fused_matches_chunk_reference():
    from rten_tpu.kernels.attention import (_chunk_reference,
                                            flash_verify_fused)
    B, S, H, KVH, D, cap = 2, 4, 8, 4, 32, 128
    r = np.random.RandomState(5)
    q = jnp.asarray(r.randn(B, S, H, D).astype(np.float32))
    kv = jnp.asarray(r.randn(B, cap, 2, KVH * D).astype(np.float32))
    lengths = jnp.asarray([13, 100], jnp.int32)  # pre-chunk lengths
    out = flash_verify_fused(q, kv, lengths, KVH, block_k=64)
    want = _chunk_reference(q, kv, lengths, KVH, 1.0 / np.sqrt(D))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_flash_verify_fused_ignores_garbage_past_chunk():
    from rten_tpu.kernels.attention import flash_verify_fused
    B, S, H, D, cap = 1, 3, 2, 32, 128
    r = np.random.RandomState(6)
    q = jnp.asarray(r.randn(B, S, H, D).astype(np.float32))
    kv = r.randn(B, cap, 2, H * D).astype(np.float32)
    length = 20
    out1 = flash_verify_fused(q, jnp.asarray(kv), jnp.asarray([length]),
                              H, block_k=64)
    kv2 = kv.copy()
    kv2[:, length + S:] = 1e9      # garbage beyond chunk end
    out2 = flash_verify_fused(q, jnp.asarray(kv2), jnp.asarray([length]),
                              H, block_k=64)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-6)
    # ...but rows INSIDE the per-query window do matter.
    kv3 = kv.copy()
    kv3[:, length] = 1e3
    out3 = flash_verify_fused(q, jnp.asarray(kv3), jnp.asarray([length]),
                              H, block_k=64)
    assert np.abs(np.asarray(out3) - np.asarray(out1)).max() > 1e-3


def test_flash_verify_fused_per_query_causality():
    """Query i must not see chunk rows > i: row at position len+2 must
    not affect query 0/1."""
    from rten_tpu.kernels.attention import flash_verify_fused
    B, S, H, D, cap = 1, 3, 2, 32, 64
    r = np.random.RandomState(7)
    q = jnp.asarray(r.randn(B, S, H, D).astype(np.float32))
    kv = r.randn(B, cap, 2, H * D).astype(np.float32)
    length = 10
    out1 = flash_verify_fused(q, jnp.asarray(kv), jnp.asarray([length]),
                              H, block_k=64)
    kv2 = kv.copy()
    kv2[:, length + 2] = 1e3       # the LAST chunk row
    out2 = flash_verify_fused(q, jnp.asarray(kv2), jnp.asarray([length]),
                              H, block_k=64)
    np.testing.assert_allclose(np.asarray(out2[:, :2]),
                               np.asarray(out1[:, :2]), rtol=1e-6)
    assert np.abs(np.asarray(out2[:, 2]) - np.asarray(out1[:, 2])).max() \
        > 1e-3


def test_flash_verify_fused_quantized_cache():
    from rten_tpu.generate.kv_cache import (SCALE_LANES, VSCALE_OFF,
                                            pack_int8_cache)
    from rten_tpu.kernels.attention import (_chunk_reference,
                                            flash_verify_fused)
    B, S, H, KVH, D, cap = 2, 3, 8, 4, 32, 64
    r = np.random.RandomState(8)
    q = jnp.asarray(r.randn(B, S, H, D).astype(np.float32))
    k_q = r.randint(-127, 128, (B, cap, KVH * D)).astype(np.int32)
    v_q = r.randint(-127, 128, (B, cap, KVH * D)).astype(np.int32)
    kv_q = pack_int8_cache(jnp.asarray(k_q), jnp.asarray(v_q))
    s_np = 0.01 + 0.05 * r.rand(B, cap, 2, KVH).astype(np.float32)
    scales = np.ones((B, cap, 1, SCALE_LANES), np.float32)
    scales[:, :, 0, :KVH] = s_np[:, :, 0]
    scales[:, :, 0, VSCALE_OFF:VSCALE_OFF + KVH] = s_np[:, :, 1]
    lengths = jnp.asarray([7, 60], jnp.int32)

    out = flash_verify_fused(q, kv_q, lengths, KVH, block_k=64,
                             kv_scales=jnp.asarray(scales))

    kf = (jnp.asarray(k_q).reshape(B, cap, KVH, D).astype(jnp.float32)
          * s_np[:, :, 0][..., None]).reshape(B, cap, KVH * D)
    vf = (jnp.asarray(v_q).reshape(B, cap, KVH, D).astype(jnp.float32)
          * s_np[:, :, 1][..., None]).reshape(B, cap, KVH * D)
    kvf = jnp.stack([kf, vf], axis=2)
    want = _chunk_reference(q, kvf, lengths, KVH, 1.0 / np.sqrt(D))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("group,kvh,h", [(2, 4, 8), (4, 2, 4)])
def test_flash_verify_grouped_matches_chunk_reference(group, kvh, h):
    from rten_tpu.kernels.attention import (_chunk_reference,
                                            flash_verify_grouped)
    B, S, D, cap = 4, 3, 32, 128
    r = np.random.RandomState(21)
    q = jnp.asarray(r.randn(B, S, h, D).astype(np.float32))
    kv = jnp.asarray(r.randn(B, cap, 2, kvh * D).astype(np.float32))
    lengths = jnp.asarray([7, 100, 1, 64], jnp.int32)  # pre-chunk
    out = flash_verify_grouped(q, kv, lengths, kvh, block_k=64,
                               group=group)
    want = _chunk_reference(q, kv, lengths, kvh, 1.0 / np.sqrt(D))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_flash_verify_grouped_per_query_causality():
    """Query i must not see chunk rows > i, and garbage past the chunk
    must not leak — per member of the group, even when another member
    is longer (its blocks are DMA'd for everyone)."""
    from rten_tpu.kernels.attention import flash_verify_grouped
    B, S, H, D, cap = 2, 3, 2, 32, 128
    r = np.random.RandomState(22)
    q = jnp.asarray(r.randn(B, S, H, D).astype(np.float32))
    kv = r.randn(B, cap, 2, H * D).astype(np.float32)
    lengths = jnp.asarray([10, 90], jnp.int32)
    out1 = flash_verify_grouped(q, jnp.asarray(kv), lengths, H,
                                block_k=64, group=2)
    kv2 = kv.copy()
    kv2[0, 10 + 2] = 1e3           # seq 0's LAST chunk row
    kv2[0, 10 + S:] = 1e9          # garbage past seq 0's chunk
    out2 = flash_verify_grouped(q, jnp.asarray(kv2), lengths, H,
                                block_k=64, group=2)
    np.testing.assert_allclose(np.asarray(out2[0, :2]),
                               np.asarray(out1[0, :2]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out2[1]), np.asarray(out1[1]),
                               rtol=1e-6)
    assert np.abs(np.asarray(out2[0, 2]) - np.asarray(out1[0, 2])).max() \
        > 1e-3


def test_flash_verify_grouped_quantized_cache():
    from rten_tpu.generate.kv_cache import (SCALE_LANES, VSCALE_OFF,
                                            pack_int8_cache)
    from rten_tpu.kernels.attention import (_chunk_reference,
                                            flash_verify_grouped)
    B, S, H, KVH, D, cap = 4, 3, 8, 4, 32, 64
    r = np.random.RandomState(23)
    q = jnp.asarray(r.randn(B, S, H, D).astype(np.float32))
    k_q = r.randint(-127, 128, (B, cap, KVH * D)).astype(np.int32)
    v_q = r.randint(-127, 128, (B, cap, KVH * D)).astype(np.int32)
    kv_q = pack_int8_cache(jnp.asarray(k_q), jnp.asarray(v_q))
    s_np = 0.01 + 0.05 * r.rand(B, cap, 2, KVH).astype(np.float32)
    scales = np.ones((B, cap, 1, SCALE_LANES), np.float32)
    scales[:, :, 0, :KVH] = s_np[:, :, 0]
    scales[:, :, 0, VSCALE_OFF:VSCALE_OFF + KVH] = s_np[:, :, 1]
    lengths = jnp.asarray([7, 58, 1, 30], jnp.int32)

    out = flash_verify_grouped(q, kv_q, lengths, KVH, block_k=64,
                               group=2, kv_scales=jnp.asarray(scales))

    kf = (jnp.asarray(k_q).reshape(B, cap, KVH, D).astype(jnp.float32)
          * s_np[:, :, 0][..., None]).reshape(B, cap, KVH * D)
    vf = (jnp.asarray(v_q).reshape(B, cap, KVH, D).astype(jnp.float32)
          * s_np[:, :, 1][..., None]).reshape(B, cap, KVH * D)
    kvf = jnp.stack([kf, vf], axis=2)
    want = _chunk_reference(q, kvf, lengths, KVH, 1.0 / np.sqrt(D))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_verify_grouped_fallback_odd_batch():
    from rten_tpu.kernels.attention import (flash_verify_fused,
                                            flash_verify_grouped)
    B, S, H, D, cap = 3, 2, 2, 32, 64
    r = np.random.RandomState(24)
    q = jnp.asarray(r.randn(B, S, H, D).astype(np.float32))
    kv = jnp.asarray(r.randn(B, cap, 2, H * D).astype(np.float32))
    lengths = jnp.asarray([5, 40, 60], jnp.int32)
    got = flash_verify_grouped(q, kv, lengths, H, group=2)
    want = flash_verify_fused(q, kv, lengths, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kvh,h", [(4, 4), (2, 8)])
def test_flash_decode_stream_matches_reference(kvh, h):
    from rten_tpu.kernels.attention import (_attn_reference,
                                            flash_decode_stream)
    b, d, cap = 3, 16, 256
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, h, d).astype(np.float32))
    kv = jnp.asarray(rng.randn(b, cap, 2, kvh * d).astype(np.float32))
    lengths = jnp.asarray([5, 128, 250], jnp.int32)

    got = flash_decode_stream(q, kv, lengths, kvh, block_k=128)

    k = kv[:, :, 0].reshape(b, cap, kvh, d).transpose(0, 2, 1, 3)
    v = kv[:, :, 1].reshape(b, cap, kvh, d).transpose(0, 2, 1, 3)
    k = jnp.repeat(k, h // kvh, axis=1)
    v = jnp.repeat(v, h // kvh, axis=1)
    want = _attn_reference(q[:, :, None, :], k, v, False,
                           1.0 / np.sqrt(d), lengths)[:, :, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_flash_decode_stream_bf16_cache():
    from rten_tpu.kernels.attention import (flash_decode_fused,
                                            flash_decode_stream)
    b, h, kvh, d, cap = 2, 8, 2, 32, 128
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(b, h, d).astype(np.float32))
    kv = jnp.asarray(rng.randn(b, cap, 2, kvh * d)).astype(jnp.bfloat16)
    lengths = jnp.asarray([17, 90], jnp.int32)
    got = flash_decode_stream(q, kv, lengths, kvh, block_k=64)
    want = flash_decode_fused(q, kv, lengths, kvh, block_k=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-3, atol=3e-3)


@pytest.mark.parametrize("group,kvh,h", [(2, 4, 4), (4, 2, 8)])
def test_flash_decode_grouped_matches_reference(group, kvh, h):
    from rten_tpu.kernels.attention import (_attn_reference,
                                            flash_decode_grouped)
    b, d, cap = 8, 16, 256
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(b, h, d).astype(np.float32))
    kv = jnp.asarray(rng.randn(b, cap, 2, kvh * d).astype(np.float32))
    lengths = jnp.asarray([5, 128, 250, 64, 1, 200, 33, 77], jnp.int32)

    got = flash_decode_grouped(q, kv, lengths, kvh, block_k=64,
                               group=group)

    k = kv[:, :, 0].reshape(b, cap, kvh, d).transpose(0, 2, 1, 3)
    v = kv[:, :, 1].reshape(b, cap, kvh, d).transpose(0, 2, 1, 3)
    k = jnp.repeat(k, h // kvh, axis=1)
    v = jnp.repeat(v, h // kvh, axis=1)
    want = _attn_reference(q[:, :, None, :], k, v, False,
                           1.0 / np.sqrt(d), lengths)[:, :, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)

@pytest.mark.parametrize("group", [2, 4])
def test_flash_decode_grouped_quantized_cache(group):
    """Byte-planar int8 cache through the batched-group kernel must match
    attention over the dequantized cache (same contract as the fused
    quant kernel, G sequences per program)."""
    from rten_tpu.generate.kv_cache import (SCALE_LANES, VSCALE_OFF,
                                            pack_int8_cache)
    from rten_tpu.kernels.attention import (_attn_reference,
                                            flash_decode_grouped)
    B, H, KVH, D, cap = 4, 8, 4, 32, 128
    rng = np.random.RandomState(7)
    q = jnp.asarray(rng.randn(B, H, D).astype(np.float32))
    k_q = rng.randint(-127, 128, (B, cap, KVH * D)).astype(np.int32)
    v_q = rng.randint(-127, 128, (B, cap, KVH * D)).astype(np.int32)
    kv_q = pack_int8_cache(jnp.asarray(k_q), jnp.asarray(v_q))
    s_np = 0.01 + 0.05 * rng.rand(B, cap, 2, KVH).astype(np.float32)
    scales = np.ones((B, cap, 1, SCALE_LANES), np.float32)
    scales[:, :, 0, :KVH] = s_np[:, :, 0]
    scales[:, :, 0, VSCALE_OFF:VSCALE_OFF + KVH] = s_np[:, :, 1]
    lengths = jnp.asarray([5, 127, 64, 1], jnp.int32)

    got = flash_decode_grouped(q, kv_q, lengths, KVH, block_k=64,
                               group=group,
                               kv_scales=jnp.asarray(scales))

    raw = {0: k_q, 1: v_q}

    def plane(i):
        x = jnp.asarray(raw[i]).reshape(B, cap, KVH, D).astype(jnp.float32)
        x = x * s_np[:, :, i][..., None]
        return jnp.repeat(x.transpose(0, 2, 1, 3), H // KVH, axis=1)

    want = _attn_reference(q[:, :, None, :], plane(0), plane(1), False,
                           1.0 / np.sqrt(D), lengths)[:, :, 0, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_decode_grouped_quant_fallback_odd_batch():
    """Batch not divisible by the group falls back to the fused quant
    kernel with identical semantics."""
    from rten_tpu.generate.kv_cache import (SCALE_LANES, VSCALE_OFF,
                                            pack_int8_cache)
    from rten_tpu.kernels.attention import (flash_decode_fused,
                                            flash_decode_grouped)
    B, H, KVH, D, cap = 3, 4, 2, 32, 64
    rng = np.random.RandomState(9)
    q = jnp.asarray(rng.randn(B, H, D).astype(np.float32))
    k_q = rng.randint(-127, 128, (B, cap, KVH * D)).astype(np.int32)
    v_q = rng.randint(-127, 128, (B, cap, KVH * D)).astype(np.int32)
    kv_q = pack_int8_cache(jnp.asarray(k_q), jnp.asarray(v_q))
    scales = np.ones((B, cap, 1, SCALE_LANES), np.float32)
    scales[:, :, 0, :KVH] = 0.02
    scales[:, :, 0, VSCALE_OFF:VSCALE_OFF + KVH] = 0.03
    scales = jnp.asarray(scales)
    lengths = jnp.asarray([5, 40, 64], jnp.int32)
    got = flash_decode_grouped(q, kv_q, lengths, KVH, group=2,
                               kv_scales=scales)
    want = flash_decode_fused(q, kv_q, lengths, KVH, kv_scales=scales)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_flash_decode_grouped_int8_scores():
    """int8_scores=True row-quantizes q and runs the score dot as an
    int8x8 MXU contraction — results must match the exact-q kernel
    within the q-quantization error (|q| <= absmax/254 per element →
    small relative error on the attention output)."""
    from rten_tpu.generate.kv_cache import (SCALE_LANES, VSCALE_OFF,
                                            pack_int8_cache)
    from rten_tpu.kernels.attention import flash_decode_grouped
    B, H, KVH, D, cap = 4, 8, 4, 32, 128
    rng = np.random.RandomState(11)
    q = jnp.asarray(rng.randn(B, H, D).astype(np.float32))
    k_q = rng.randint(-127, 128, (B, cap, KVH * D)).astype(np.int32)
    v_q = rng.randint(-127, 128, (B, cap, KVH * D)).astype(np.int32)
    kv_q = pack_int8_cache(jnp.asarray(k_q), jnp.asarray(v_q))
    s_np = 0.01 + 0.05 * rng.rand(B, cap, 2, KVH).astype(np.float32)
    scales = np.ones((B, cap, 1, SCALE_LANES), np.float32)
    scales[:, :, 0, :KVH] = s_np[:, :, 0]
    scales[:, :, 0, VSCALE_OFF:VSCALE_OFF + KVH] = s_np[:, :, 1]
    scales = jnp.asarray(scales)
    lengths = jnp.asarray([5, 127, 64, 1], jnp.int32)

    exact = flash_decode_grouped(q, kv_q, lengths, KVH, block_k=64,
                                 group=2, kv_scales=scales)
    got = flash_decode_grouped(q, kv_q, lengths, KVH, block_k=64,
                               group=2, kv_scales=scales,
                               int8_scores=True)
    ref = np.abs(np.asarray(exact)).max()
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact),
                               atol=0.05 * ref)


def test_flash_decode_grouped_native_dots_close():
    """native_dots=True runs the score/PV dots in the CACHE dtype (q
    pre-cast): for a bf16 cache under f32 q this removes the two
    [G, blk, F] upconverts from the per-block chain. Output must track
    the f32-dot kernel within bf16 rounding."""
    from rten_tpu.kernels.attention import flash_decode_grouped
    B, H, KVH, D, cap = 4, 8, 4, 32, 128
    rng = np.random.RandomState(13)
    q = jnp.asarray(rng.randn(B, H, D).astype(np.float32))
    kv = jnp.asarray(rng.randn(B, cap, 2, KVH * D)).astype(jnp.bfloat16)
    lengths = jnp.asarray([5, 127, 64, 1], jnp.int32)
    exact = flash_decode_grouped(q, kv, lengths, KVH, block_k=64, group=2)
    got = flash_decode_grouped(q, kv, lengths, KVH, block_k=64, group=2,
                               native_dots=True)
    ref = np.abs(np.asarray(exact)).max()
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact),
                               atol=0.02 * ref)


def test_flash_decode_grouped_pv_int8_close():
    """pv_int8=True row-quantizes the scale-folded probabilities and
    runs the PV dot int8x8 on the MXU (the [G, blk, F] V upconvert
    disappears). Output must track the exact-PV kernel within the
    8-bit probability rounding."""
    from rten_tpu.generate.kv_cache import (SCALE_LANES, VSCALE_OFF,
                                            pack_int8_cache)
    from rten_tpu.kernels.attention import flash_decode_grouped
    B, H, KVH, D, cap = 4, 8, 4, 32, 128
    rng = np.random.RandomState(17)
    q = jnp.asarray(rng.randn(B, H, D).astype(np.float32))
    k_q = rng.randint(-127, 128, (B, cap, KVH * D)).astype(np.int32)
    v_q = rng.randint(-127, 128, (B, cap, KVH * D)).astype(np.int32)
    kv_q = pack_int8_cache(jnp.asarray(k_q), jnp.asarray(v_q))
    s_np = 0.01 + 0.05 * rng.rand(B, cap, 2, KVH).astype(np.float32)
    scales = np.ones((B, cap, 1, SCALE_LANES), np.float32)
    scales[:, :, 0, :KVH] = s_np[:, :, 0]
    scales[:, :, 0, VSCALE_OFF:VSCALE_OFF + KVH] = s_np[:, :, 1]
    scales = jnp.asarray(scales)
    lengths = jnp.asarray([5, 127, 64, 1], jnp.int32)
    exact = flash_decode_grouped(q, kv_q, lengths, KVH, block_k=64,
                                 group=2, kv_scales=scales)
    got = flash_decode_grouped(q, kv_q, lengths, KVH, block_k=64,
                               group=2, kv_scales=scales, pv_int8=True)
    ref = np.abs(np.asarray(exact)).max()
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact),
                               atol=0.03 * ref)


def test_flash_decode_grouped_append_matches_manual_write():
    """Fused append+attention: output and cache must equal manually
    writing the new rows then running the plain grouped kernel — at
    depths hitting block 0, a middle block, and the capacity clamp."""
    from rten_tpu.kernels.attention import (flash_decode_grouped,
                                            flash_decode_grouped_append)
    B, H, KVH, D, cap = 4, 8, 4, 32, 128
    rng = np.random.RandomState(5)
    q = jnp.asarray(rng.randn(B, H, D).astype(np.float32))
    kv = jnp.asarray(rng.randn(B, cap, 2, KVH * D).astype(np.float32))
    new = jnp.asarray(rng.randn(B, 1, 2, KVH * D).astype(np.float32))
    lengths = jnp.asarray([6, 128, 64, 1], jnp.int32)  # live INCL new

    pos = np.clip(np.asarray(lengths) - 1, 0, cap - 1)
    kv_ref = np.asarray(kv).copy()
    for b in range(B):
        kv_ref[b, pos[b]] = np.asarray(new)[b, 0]
    want = flash_decode_grouped(q, jnp.asarray(kv_ref), lengths, KVH,
                                block_k=64, group=2)
    got, kv_new = flash_decode_grouped_append(q, kv, new, lengths, KVH,
                                              block_k=64, group=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(kv_new), kv_ref)

@pytest.mark.parametrize("group,kvh,h", [(2, 4, 4), (4, 2, 8)])
def test_flash_decode_flat_matches_reference(group, kvh, h):
    """The flat single-program kernel (one in-kernel loop over all
    sequence groups, pipeline continuous across group boundaries) must
    match the reference exactly like the per-group grid kernel."""
    from rten_tpu.kernels.attention import (_attn_reference,
                                            flash_decode_flat)
    b, d, cap = 8, 16, 256
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(b, h, d).astype(np.float32))
    kv = jnp.asarray(rng.randn(b, cap, 2, kvh * d).astype(np.float32))
    lengths = jnp.asarray([5, 128, 250, 64, 1, 200, 33, 77], jnp.int32)

    got = flash_decode_flat(q, kv, lengths, kvh, block_k=64, group=group)

    k = kv[:, :, 0].reshape(b, cap, kvh, d).transpose(0, 2, 1, 3)
    v = kv[:, :, 1].reshape(b, cap, kvh, d).transpose(0, 2, 1, 3)
    k = jnp.repeat(k, h // kvh, axis=1)
    v = jnp.repeat(v, h // kvh, axis=1)
    want = _attn_reference(q[:, :, None, :], k, v, False,
                           1.0 / np.sqrt(d), lengths)[:, :, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("group", [2, 4])
def test_flash_decode_flat_quantized_cache(group):
    """Flat kernel over the token-packed int8 cache (f32 scale rows) vs
    attention over the dequantized cache — same contract as the grouped
    quant kernel."""
    from rten_tpu.generate.kv_cache import (SCALE_LANES, VSCALE_OFF,
                                            pack_int8_cache)
    from rten_tpu.kernels.attention import (_attn_reference,
                                            flash_decode_flat)
    B, H, KVH, D, cap = 4, 8, 4, 32, 128
    rng = np.random.RandomState(7)
    q = jnp.asarray(rng.randn(B, H, D).astype(np.float32))
    k_q = rng.randint(-127, 128, (B, cap, KVH * D)).astype(np.int32)
    v_q = rng.randint(-127, 128, (B, cap, KVH * D)).astype(np.int32)
    kv_q = pack_int8_cache(jnp.asarray(k_q), jnp.asarray(v_q))
    s_np = 0.01 + 0.05 * rng.rand(B, cap, 2, KVH).astype(np.float32)
    scales = np.ones((B, cap, 1, SCALE_LANES), np.float32)
    scales[:, :, 0, :KVH] = s_np[:, :, 0]
    scales[:, :, 0, VSCALE_OFF:VSCALE_OFF + KVH] = s_np[:, :, 1]
    lengths = jnp.asarray([5, 127, 64, 1], jnp.int32)

    got = flash_decode_flat(q, kv_q, lengths, KVH, block_k=64,
                            group=group, kv_scales=jnp.asarray(scales))

    raw = {0: k_q, 1: v_q}

    def plane(i):
        x = jnp.asarray(raw[i]).reshape(B, cap, KVH, D).astype(jnp.float32)
        x = x * s_np[:, :, i][..., None]
        return jnp.repeat(x.transpose(0, 2, 1, 3), H // KVH, axis=1)

    want = _attn_reference(q[:, :, None, :], plane(0), plane(1), False,
                           1.0 / np.sqrt(D), lengths)[:, :, 0, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_decode_flat_packed_scales_int8_scores():
    """Flat kernel with bf16-pair-packed scale rows and int8_scores must
    match the grouped kernel bit-for-bit (identical math per block)."""
    from rten_tpu.generate.kv_cache import (SCALE_LANES, VSCALE_OFF,
                                            pack_bf16_rows,
                                            pack_int8_cache)
    from rten_tpu.kernels.attention import flash_decode_grouped, \
        flash_decode_flat
    B, H, KVH, D, cap = 4, 8, 4, 32, 128
    rng = np.random.RandomState(13)
    q = jnp.asarray(rng.randn(B, H, D).astype(np.float32))
    k_q = rng.randint(-127, 128, (B, cap, KVH * D)).astype(np.int32)
    v_q = rng.randint(-127, 128, (B, cap, KVH * D)).astype(np.int32)
    kv_q = pack_int8_cache(jnp.asarray(k_q), jnp.asarray(v_q))
    s_np = 0.01 + 0.05 * rng.rand(B, cap, 2, KVH).astype(np.float32)
    scales = np.ones((B, cap, 1, SCALE_LANES), np.float32)
    scales[:, :, 0, :KVH] = s_np[:, :, 0]
    scales[:, :, 0, VSCALE_OFF:VSCALE_OFF + KVH] = s_np[:, :, 1]
    packed = pack_bf16_rows(
        jnp.asarray(scales).swapaxes(1, 2)).swapaxes(1, 2)
    lengths = jnp.asarray([5, 127, 64, 2], jnp.int32)

    for int8_scores in (False, True):
        got = flash_decode_flat(q, kv_q, lengths, KVH, block_k=64,
                                group=2, kv_scales=packed,
                                int8_scores=int8_scores)
        want = flash_decode_grouped(q, kv_q, lengths, KVH, block_k=64,
                                    group=2, kv_scales=packed,
                                    int8_scores=int8_scores)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


def test_flash_decode_flat_fallback_odd_batch():
    from rten_tpu.kernels.attention import (flash_decode_fused,
                                            flash_decode_flat)
    B, H, KVH, D, cap = 3, 4, 2, 32, 64
    rng = np.random.RandomState(9)
    q = jnp.asarray(rng.randn(B, H, D).astype(np.float32))
    kv = jnp.asarray(rng.randn(B, cap, 2, KVH * D).astype(np.float32))
    lengths = jnp.asarray([5, 40, 64], jnp.int32)
    got = flash_decode_flat(q, kv, lengths, KVH, group=2)
    want = flash_decode_fused(q, kv, lengths, KVH)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_flash_decode_flat_tail():
    """Tail write-buffer round: packed cache + bf16 tail window must
    equal reference attention over the concatenation (dequantized packed
    tokens followed by the tail rows)."""
    from rten_tpu.generate.kv_cache import (SCALE_LANES, VSCALE_OFF,
                                            pack_bf16_rows,
                                            pack_int8_cache)
    from rten_tpu.kernels.attention import (_attn_reference,
                                            flash_decode_flat)
    B, H, KVH, D, cap, R = 4, 8, 4, 32, 128, 8
    rng = np.random.RandomState(21)
    q = jnp.asarray(rng.randn(B, H, D).astype(np.float32))
    k_q = rng.randint(-127, 128, (B, cap, KVH * D)).astype(np.int32)
    v_q = rng.randint(-127, 128, (B, cap, KVH * D)).astype(np.int32)
    kv_q = pack_int8_cache(jnp.asarray(k_q), jnp.asarray(v_q))
    # Pre-round to bf16: the packed rows store bf16 scale values, and
    # the reference must use the same numbers.
    s_np = np.asarray(jnp.asarray(
        0.01 + 0.05 * rng.rand(B, cap, 2, KVH)
    ).astype(jnp.bfloat16).astype(jnp.float32))
    scales = np.ones((B, cap, 1, SCALE_LANES), np.float32)
    scales[:, :, 0, :KVH] = s_np[:, :, 0]
    scales[:, :, 0, VSCALE_OFF:VSCALE_OFF + KVH] = s_np[:, :, 1]
    packed = pack_bf16_rows(
        jnp.asarray(scales).swapaxes(1, 2)).swapaxes(1, 2)
    tail = rng.randn(B, R, 2, KVH * D).astype(np.float32)
    tail_j = jnp.asarray(tail).astype(jnp.bfloat16)
    tc = 5                                   # live tail rows (global)
    plens = np.asarray([3, 60, 128, 1])      # packed live per sequence
    lengths = jnp.asarray(plens + tc, jnp.int32)   # total live

    got = flash_decode_flat(q, kv_q, lengths, KVH, block_k=64, group=2,
                            kv_scales=packed, tail=tail_j,
                            tail_count=tc)

    def plane(i):
        x = jnp.asarray({0: k_q, 1: v_q}[i]).reshape(
            B, cap, KVH, D).astype(jnp.float32)
        x = x * s_np[:, :, i][..., None]
        t = jnp.asarray(tail_j[:, :, i].astype(jnp.float32)).reshape(
            B, R, KVH, D)
        # Reference layout: packed tokens then tail rows, per sequence
        # at its own packed depth — emulate by scattering tail rows at
        # positions plen..plen+tc-1 into a cap+R buffer.
        full = jnp.zeros((B, cap + R, KVH, D))
        full = full.at[:, :cap].set(x)
        for b in range(B):
            full = full.at[b, plens[b]:plens[b] + tc].set(t[b, :tc])
        return jnp.repeat(full.transpose(0, 2, 1, 3), H // KVH, axis=1)

    want = _attn_reference(q[:, :, None, :], plane(0), plane(1), False,
                           1.0 / np.sqrt(D), lengths)[:, :, 0, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-3, atol=3e-3)


def test_flash_decode_flat_q_bf16():
    """bf16-E mode (q_bf16=True): q rounds to bf16 on entry; the result
    must match reference attention computed with the bf16-rounded q
    within bf16 tolerance (the one-hot E-dots and the out compaction
    add no further error)."""
    from rten_tpu.generate.kv_cache import (SCALE_LANES, VSCALE_OFF,
                                            pack_bf16_rows,
                                            pack_int8_cache)
    from rten_tpu.kernels.attention import (_attn_reference,
                                            flash_decode_flat)
    B, H, KVH, D, cap = 4, 8, 4, 32, 128
    rng = np.random.RandomState(31)
    q = jnp.asarray(rng.randn(B, H, D).astype(np.float32))
    k_q = rng.randint(-127, 128, (B, cap, KVH * D)).astype(np.int32)
    v_q = rng.randint(-127, 128, (B, cap, KVH * D)).astype(np.int32)
    kv_q = pack_int8_cache(jnp.asarray(k_q), jnp.asarray(v_q))
    s_np = np.asarray(jnp.asarray(
        0.01 + 0.05 * rng.rand(B, cap, 2, KVH)
    ).astype(jnp.bfloat16).astype(jnp.float32))
    scales = np.ones((B, cap, 1, SCALE_LANES), np.float32)
    scales[:, :, 0, :KVH] = s_np[:, :, 0]
    scales[:, :, 0, VSCALE_OFF:VSCALE_OFF + KVH] = s_np[:, :, 1]
    packed = pack_bf16_rows(
        jnp.asarray(scales).swapaxes(1, 2)).swapaxes(1, 2)
    lengths = jnp.asarray([5, 127, 64, 1], jnp.int32)

    got = flash_decode_flat(q, kv_q, lengths, KVH, block_k=64, group=2,
                            kv_scales=packed, q_bf16=True)

    qb = q.astype(jnp.bfloat16).astype(jnp.float32)

    def plane(i):
        x = jnp.asarray({0: k_q, 1: v_q}[i]).reshape(
            B, cap, KVH, D).astype(jnp.float32)
        x = x * s_np[:, :, i][..., None]
        return jnp.repeat(x.transpose(0, 2, 1, 3), H // KVH, axis=1)

    want = _attn_reference(qb[:, :, None, :], plane(0), plane(1), False,
                           1.0 / np.sqrt(D), lengths)[:, :, 0, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    # And vs full-f32 q: the bf16 rounding is the ONLY extra error.
    want32 = _attn_reference(q[:, :, None, :], plane(0), plane(1),
                             False, 1.0 / np.sqrt(D),
                             lengths)[:, :, 0, :]
    rel = (np.abs(np.asarray(got) - np.asarray(want32)).max()
           / np.abs(np.asarray(want32)).max())
    assert rel < 2e-2, rel


def test_flash_decode_flat_q_bf16_tail_g32():
    """q_bf16 with the tail round at the group-32 serving shape the
    bf16-E VMEM headroom unlocks (batch 64, g32/b64 + window)."""
    from rten_tpu.generate.kv_cache import (SCALE_LANES, VSCALE_OFF,
                                            pack_bf16_rows,
                                            pack_int8_cache)
    from rten_tpu.kernels.attention import (_attn_reference,
                                            flash_decode_flat)
    B, H, KVH, D, cap, R = 64, 8, 4, 32, 128, 8
    rng = np.random.RandomState(37)
    q = jnp.asarray(rng.randn(B, H, D).astype(np.float32))
    k_q = rng.randint(-127, 128, (B, cap, KVH * D)).astype(np.int32)
    v_q = rng.randint(-127, 128, (B, cap, KVH * D)).astype(np.int32)
    kv_q = pack_int8_cache(jnp.asarray(k_q), jnp.asarray(v_q))
    s_np = np.asarray(jnp.asarray(
        0.01 + 0.05 * rng.rand(B, cap, 2, KVH)
    ).astype(jnp.bfloat16).astype(jnp.float32))
    scales = np.ones((B, cap, 1, SCALE_LANES), np.float32)
    scales[:, :, 0, :KVH] = s_np[:, :, 0]
    scales[:, :, 0, VSCALE_OFF:VSCALE_OFF + KVH] = s_np[:, :, 1]
    packed = pack_bf16_rows(
        jnp.asarray(scales).swapaxes(1, 2)).swapaxes(1, 2)
    tail = rng.randn(B, R, 2, KVH * D).astype(np.float32)
    tail_j = jnp.asarray(tail).astype(jnp.bfloat16)
    tc = 3
    plens = rng.randint(1, cap - R, B)
    lengths = jnp.asarray(plens + tc, jnp.int32)

    got = flash_decode_flat(q, kv_q, lengths, KVH, block_k=64,
                            group=32, kv_scales=packed, tail=tail_j,
                            tail_count=tc, q_bf16=True)

    qb = q.astype(jnp.bfloat16).astype(jnp.float32)

    def plane(i):
        x = jnp.asarray({0: k_q, 1: v_q}[i]).reshape(
            B, cap, KVH, D).astype(jnp.float32)
        x = x * s_np[:, :, i][..., None]
        t = jnp.asarray(tail_j[:, :, i].astype(jnp.float32)).reshape(
            B, R, KVH, D)
        full = jnp.zeros((B, cap + R, KVH, D))
        full = full.at[:, :cap].set(x)
        for b in range(B):
            full = full.at[b, plens[b]:plens[b] + tc].set(t[b, :tc])
        return jnp.repeat(full.transpose(0, 2, 1, 3), H // KVH, axis=1)

    want = _attn_reference(qb[:, :, None, :], plane(0), plane(1), False,
                           1.0 / np.sqrt(D), lengths)[:, :, 0, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_flash_decode_flat_partials_merge():
    """partials=True across two capacity shards must merge (online-
    softmax combine) to the full kernel's normalized output — the
    correctness core of seq-sharded decode attention."""
    from rten_tpu.generate.kv_cache import (SCALE_LANES, VSCALE_OFF,
                                            pack_bf16_rows,
                                            pack_int8_cache)
    from rten_tpu.kernels.attention import flash_decode_flat
    B, H, KVH, D, cap = 4, 8, 4, 32, 128
    half = cap // 2
    rng = np.random.RandomState(41)
    q = jnp.asarray(rng.randn(B, H, D).astype(np.float32))
    k_q = rng.randint(-127, 128, (B, cap, KVH * D)).astype(np.int32)
    v_q = rng.randint(-127, 128, (B, cap, KVH * D)).astype(np.int32)
    s_np = np.asarray(jnp.asarray(
        0.01 + 0.05 * rng.rand(B, cap, 2, KVH)
    ).astype(jnp.bfloat16).astype(jnp.float32))
    scales = np.ones((B, cap, 1, SCALE_LANES), np.float32)
    scales[:, :, 0, :KVH] = s_np[:, :, 0]
    scales[:, :, 0, VSCALE_OFF:VSCALE_OFF + KVH] = s_np[:, :, 1]
    lengths = np.asarray([5, 127, 64, 1])

    def pack(lo, hi):
        kv = pack_int8_cache(jnp.asarray(k_q[:, lo:hi]),
                             jnp.asarray(v_q[:, lo:hi]))
        sc = pack_bf16_rows(
            jnp.asarray(scales[:, lo:hi]).swapaxes(1, 2)).swapaxes(1, 2)
        return kv, sc

    kv_full, sc_full = pack(0, cap)
    want = flash_decode_flat(q, kv_full, jnp.asarray(lengths, jnp.int32),
                             KVH, block_k=64, group=2,
                             kv_scales=sc_full)

    outs = []
    for s in range(2):
        kv_s, sc_s = pack(s * half, (s + 1) * half)
        lens_s = np.clip(lengths - s * half, 0, half)
        outs.append(flash_decode_flat(
            q, kv_s, jnp.asarray(lens_s, jnp.int32), KVH, block_k=64,
            group=2, kv_scales=sc_s, partials=True))

    accs = [np.asarray(o[:, :, :D], np.float64) for o in outs]
    ms = [np.asarray(o[:, :, D], np.float64) for o in outs]
    ls = [np.asarray(o[:, :, D + 1], np.float64) for o in outs]
    m_g = np.maximum(ms[0], ms[1])
    w = [np.exp(m - m_g) for m in ms]
    num = accs[0] * w[0][..., None] + accs[1] * w[1][..., None]
    den = ls[0] * w[0] + ls[1] * w[1]
    got = num / np.maximum(den, 1e-30)[..., None]
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-5,
                               atol=2e-5)


def test_flash_decode_flat_q_stream_bit_identical():
    """q-DMA streaming (the long-context default since round 5) must be
    BIT-IDENTICAL to the select-chain q path — same math, different q
    transport — including with the bf16 tail window active."""
    from rten_tpu.generate.kv_cache import (SCALE_LANES, VSCALE_OFF,
                                            pack_bf16_rows,
                                            pack_int8_cache)
    from rten_tpu.kernels.attention import flash_decode_flat

    B, H, KVH, D, cap, R = 8, 8, 4, 32, 128, 4
    rng = np.random.RandomState(17)
    q = jnp.asarray(rng.randn(B, H, D).astype(np.float32))
    k_q = rng.randint(-127, 128, (B, cap, KVH * D)).astype(np.int32)
    v_q = rng.randint(-127, 128, (B, cap, KVH * D)).astype(np.int32)
    kv_q = pack_int8_cache(jnp.asarray(k_q), jnp.asarray(v_q))
    s_np = (0.01 + 0.05 * rng.rand(B, cap, 1, SCALE_LANES)
            ).astype(np.float32)
    packed = pack_bf16_rows(jnp.asarray(s_np).swapaxes(1, 2)
                            ).swapaxes(1, 2)
    lengths = jnp.asarray([5, 127, 64, 1, 33, 80, 17, 2], jnp.int32)

    base = flash_decode_flat(q, kv_q, lengths, KVH, block_k=64,
                             group=4, kv_scales=packed)
    strm = flash_decode_flat(q, kv_q, lengths, KVH, block_k=64,
                             group=4, kv_scales=packed, q_stream=True)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(strm))

    tail = jnp.asarray(rng.randn(B, R, 2, KVH * D).astype(np.float32)
                       ).astype(jnp.bfloat16)
    tc = jnp.asarray(2, jnp.int32)
    base_t = flash_decode_flat(q, kv_q, lengths, KVH, block_k=64,
                               group=4, kv_scales=packed, tail=tail,
                               tail_count=tc)
    strm_t = flash_decode_flat(q, kv_q, lengths, KVH, block_k=64,
                               group=4, kv_scales=packed, tail=tail,
                               tail_count=tc, q_stream=True)
    np.testing.assert_array_equal(np.asarray(base_t),
                                  np.asarray(strm_t))
