"""Encoder-decoder (Whisper-class) + BERT model-family tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rten_tpu.models.bert import Bert, BertConfig
from rten_tpu.models.encoder_decoder import (EncoderDecoderConfig,
                                             EncoderDecoderLM,
                                             log_mel_spectrogram)
from rten_tpu.models.transformer import quantize_weights


@pytest.fixture(scope="module")
def encdec():
    cfg = EncoderDecoderConfig.tiny_test()
    model = EncoderDecoderLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def test_encoder_shapes(encdec):
    model, params = encdec
    feats = jnp.asarray(
        np.random.RandomState(0).randn(2, 20, 16).astype(np.float32))
    memory = model.encode(params, feats)
    assert memory.shape == (2, 20, 64)


def test_decode_cached_matches_full(encdec):
    """Cached step-by-step decoding must equal full-sequence decoding."""
    model, params = encdec
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(2, 12, 16).astype(np.float32))
    memory = model.encode(params, feats)
    cross = model.cross_kv(params, memory)
    tokens = jnp.asarray(rng.randint(0, 64, (2, 5)), jnp.int32)

    # Full forward (no cache).
    logits_full, _ = model.decode(params, tokens, cross, None)

    # Step-by-step with cache.
    cache = model.new_cache(2, capacity=16)
    logits_p, cache = model.decode(params, tokens[:, :4], cross, cache)
    logits_d, cache = model.decode(params, tokens[:, 4:5], cross, cache)
    np.testing.assert_allclose(np.asarray(logits_d[:, 0]),
                               np.asarray(logits_full[:, 4]),
                               rtol=1e-4, atol=1e-5)


def test_generate_loop(encdec):
    model, params = encdec
    feats = jnp.asarray(
        np.random.RandomState(2).randn(1, 10, 16).astype(np.float32))
    out = model.generate(params, feats, start_token=1, max_tokens=6)
    assert out.shape == (1, 6)
    assert ((out >= 0) & (out < 64)).all()


def test_log_mel_spectrogram():
    sr = 16000
    t = np.arange(sr // 4) / sr
    audio = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    mel = log_mel_spectrogram(audio, sample_rate=sr, n_mels=40)
    assert mel.shape[1] == 40
    assert mel.shape[0] > 10
    assert np.isfinite(mel).all()
    # A 440 Hz tone concentrates energy in low mel bins.
    assert mel[:, :10].mean() > mel[:, 30:].mean()


@pytest.fixture(scope="module")
def bert():
    cfg = BertConfig.tiny_test()
    model = Bert(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def test_bert_forward_and_heads(bert):
    model, params = bert
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, 100, (2, 10)), jnp.int32)
    hidden = model.forward(params, ids)
    assert hidden.shape == (2, 10, 64)
    pooled = model.pooled(params, ids)
    assert pooled.shape == (2, 64)
    start, end = model.qa_spans(params, ids)
    assert start.shape == (2, 10) and end.shape == (2, 10)
    emb = model.mean_embedding(params, ids)
    assert emb.shape == (2, 64)


def test_bert_attention_mask_ignores_padding(bert):
    model, params = bert
    rng = np.random.RandomState(1)
    ids = jnp.asarray(rng.randint(1, 100, (1, 8)), jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 1, 1, 0, 0, 0]], jnp.int32)
    emb1 = model.mean_embedding(params, ids, mask)
    # Change padded token ids: embedding must not change.
    ids2 = ids.at[0, 5:].set(99)
    emb2 = model.mean_embedding(params, ids2, mask)
    np.testing.assert_allclose(np.asarray(emb1), np.asarray(emb2),
                               rtol=1e-5, atol=1e-6)


def test_bert_dynamic_int8(bert):
    model, params = bert
    rng = np.random.RandomState(2)
    ids = jnp.asarray(rng.randint(0, 100, (1, 12)), jnp.int32)
    ref = np.asarray(model.pooled(params, ids))
    qparams = quantize_weights(params, "int8")
    got = np.asarray(model.pooled(qparams, ids))
    # int8 weight quantization: small relative error on pooled output
    assert np.abs(got - ref).max() < 0.1


def test_checkpoint_roundtrip(tmp_path):
    import jax
    from rten_tpu.models.checkpoint import load_params, save_params
    from rten_tpu.models.transformer import (TransformerConfig,
                                             TransformerLM)
    cfg = TransformerConfig.tiny_test()
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    path = tmp_path / "model.npz"
    save_params(path, params)
    loaded = load_params(path)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (1, 6)),
                      jnp.int32)
    a, _ = model.forward(params, ids)
    b, _ = model.forward(loaded, ids)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_checkpoint_roundtrip_quantized(tmp_path):
    import jax
    from rten_tpu.models.checkpoint import load_params, save_params
    from rten_tpu.models.transformer import (TransformerConfig,
                                             TransformerLM, QuantWeight)
    cfg = TransformerConfig.tiny_test()
    model = TransformerLM(cfg)
    params = quantize_weights(model.init_params(jax.random.PRNGKey(0)),
                              "int4")
    path = tmp_path / "model_q.npz"
    save_params(path, params)
    loaded = load_params(path)
    assert isinstance(loaded["layers"][0]["wqkv"], QuantWeight)
    assert loaded["layers"][0]["wqkv"].kind == "int4"
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (1, 6)),
                      jnp.int32)
    a, _ = model.forward(params, ids)
    b, _ = model.forward(loaded, ids)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_detr_forward_and_postprocess():
    from rten_tpu.models.detr import Detr, DetrConfig, postprocess
    cfg = DetrConfig.tiny_test()
    model = Detr(cfg)
    params = model.init_params(None)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 3, 64, 64)
                    .astype(np.float32))
    logits, boxes = model.forward(params, x)
    assert logits.shape == (1, cfg.n_queries, cfg.n_classes + 1)
    assert boxes.shape == (1, cfg.n_queries, 4)
    b = np.asarray(boxes)
    assert (b >= 0).all() and (b <= 1).all()
    dets = postprocess(logits, boxes, score_threshold=0.0)
    assert len(dets) == 1 and len(dets[0]) == cfg.n_queries
    # jit-compiles as one program (no host round trips)
    jitted = jax.jit(model.forward)
    l2, b2 = jitted(params, x)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(logits),
                               rtol=1e-5, atol=1e-5)


def test_detr_sine_position_embedding():
    from rten_tpu.models.detr import sine_position_embedding
    emb = sine_position_embedding(4, 6, 64)
    assert emb.shape == (24, 64)
    # distinct positions get distinct encodings
    assert not np.allclose(emb[0], emb[1])
    assert np.isfinite(emb).all()


def test_detr_rten_graph_matches_native():
    from rten_tpu import Model
    from rten_tpu.models.detr import Detr, DetrConfig, build_detr_rten
    cfg = DetrConfig.tiny_test()
    model = Detr(cfg)
    params = model.init_params(None)
    x = np.random.RandomState(0).randn(2, 3, 64, 64).astype(np.float32)
    want_cls, want_box = model.forward(params, jnp.asarray(x))
    mb = build_detr_rten(model, params, input_hw=(64, 64))
    gm = Model.load(mb.to_bytes())
    got_cls, got_box = gm.run({"input": x})
    np.testing.assert_allclose(np.asarray(got_cls), np.asarray(want_cls),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_box), np.asarray(want_box),
                               rtol=1e-3, atol=1e-3)


def test_detr_rten_graph_quantizes():
    from rten_tpu import Model
    from rten_tpu.fmt import container
    from rten_tpu.fmt.serialize import graph_to_bytes
    from rten_tpu.ir.graph import graph_from_model_file
    from rten_tpu.ir.quantize_graph import quantize_graph_weights
    from rten_tpu.models.detr import Detr, DetrConfig, build_detr_rten
    cfg = DetrConfig.tiny_test()
    model = Detr(cfg)
    params = model.init_params(None)
    mb = build_detr_rten(model, params, input_hw=(64, 64))
    data = mb.to_bytes()
    graph = graph_from_model_file(container.load_bytes(data))
    n = quantize_graph_weights(graph, min_elements=256)
    assert n > 20   # backbone convs + attention/ffn matmuls
    q = Model.load(graph_to_bytes(graph))
    x = np.random.RandomState(1).randn(1, 3, 64, 64).astype(np.float32)
    ref = Model.load(data)
    want_cls, _ = ref.run({"input": x})
    got_cls, got_box = q.run({"input": x})
    rel = np.abs(np.asarray(got_cls) - np.asarray(want_cls)).max() / \
        (np.abs(np.asarray(want_cls)).max() + 1e-9)
    assert rel < 0.25  # int8 through 4 transformer layers + backbone
    assert np.asarray(got_box).shape == (1, cfg.n_queries, 4)


def test_quantized_tied_lm_head():
    """quantize_weights on a tied-embedding model adds an int8 lm_head
    (the logits matmul is the largest per-step weight read; see
    models/transformer.py). Logits must stay close to f32 and the
    greedy decision must agree on a tiny model."""
    from rten_tpu.models.transformer import (QuantWeight, TransformerConfig,
                                             TransformerLM)
    cfg = TransformerConfig.tiny_test()
    assert cfg.tie_embeddings
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    qparams = quantize_weights(params, "int8")
    assert isinstance(qparams["lm_head"], QuantWeight)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 128, (2, 6)),
                      jnp.int32)
    ref, _ = model.forward(params, ids)
    got, _ = model.forward(qparams, ids)
    # Per-channel int8 on both projections and the head: small abs error.
    assert np.abs(np.asarray(got) - np.asarray(ref)).max() < 0.05
    assert (np.argmax(np.asarray(got)[:, -1], -1)
            == np.argmax(np.asarray(ref)[:, -1], -1)).all()


def test_segmenter_forward_shapes_and_argmax():
    """DeepLab-class head: per-pixel logits at input resolution; the
    backbone trunk is shared with classification (features() refactor
    must leave ResNet.forward unchanged)."""
    from rten_tpu.models.resnet import ResNet, ResNetConfig
    from rten_tpu.models.segmentation import SegmentationConfig, Segmenter

    cfg = SegmentationConfig.tiny_test()
    model = Segmenter(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    x = np.random.RandomState(0).randn(2, 3, 64, 64).astype(np.float32)
    logits = np.asarray(model.forward(params, jnp.asarray(x)))
    assert logits.shape == (2, cfg.n_classes, 64, 64)
    mask = np.asarray(model.predict(params, jnp.asarray(x)))
    np.testing.assert_array_equal(mask, logits.argmax(axis=1))

    # forward == mean-pooled features @ fc (the classification head is
    # untouched by the features() split).
    rn = ResNet(cfg.backbone)
    rp = rn.init_params(jax.random.PRNGKey(0))
    feats = np.asarray(rn.features(rp, jnp.asarray(x)))
    want = feats.mean(axis=(2, 3)) @ np.asarray(rp["fc.w"]) \
        + np.asarray(rp["fc.b"])
    got = np.asarray(rn.forward(rp, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_caption_patch_pipeline():
    """distilvit-class captioning: ViT patches through the enc-dec;
    generation is deterministic and bounded."""
    sys_path = __import__("sys").path
    if "." not in sys_path:
        sys_path.insert(0, ".")
    from examples.caption import patchify

    img = np.random.RandomState(0).randn(3, 32, 32).astype(np.float32)
    patches = patchify(img, patch=8)
    assert patches.shape == (16, 192)
    # Raster order: patch 0 is the top-left 8x8 block.
    np.testing.assert_array_equal(
        patches[0].reshape(8, 8, 3).transpose(2, 0, 1), img[:, :8, :8])

    cfg = EncoderDecoderConfig.tiny_test(n_mels=192, max_source_len=16)
    model = EncoderDecoderLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    toks = model.generate(params, patches[None], start_token=1,
                          max_tokens=5, eos_token=2)
    toks2 = model.generate(params, patches[None], start_token=1,
                           max_tokens=5, eos_token=2)
    assert toks[0].tolist() == toks2[0].tolist()
    assert len(toks[0]) <= 5


def test_tts_length_regulate_and_synthesis():
    """VITS-class TTS: static-shape length regulation must equal the
    dynamic repeat semantics; synthesis is jittable with fixed shapes."""
    from rten_tpu.models.tts import TTSConfig, TextToSpeech

    cfg = TTSConfig.tiny_test()
    model = TextToSpeech(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    hidden = jnp.asarray(
        np.random.RandomState(0).randn(1, 4, cfg.d_model), jnp.float32)
    durations = jnp.asarray([[2, 3, 1, 5]], jnp.int32)
    lengths = jnp.asarray([3], jnp.int32)   # last phoneme is padding
    frames, fmask, n_frames = model.length_regulate(
        jnp.pad(hidden, ((0, 0), (0, cfg.max_phonemes - 4), (0, 0))),
        jnp.pad(durations, ((0, 0), (0, cfg.max_phonemes - 4))), lengths)
    assert int(n_frames[0]) == 6          # 2 + 3 + 1 (padding excluded)
    ref = np.repeat(np.asarray(hidden)[0, :3], [2, 3, 1], axis=0)
    np.testing.assert_allclose(np.asarray(frames)[0, :6], ref, rtol=1e-6)
    assert not np.asarray(fmask)[0, 6:].any()
    np.testing.assert_array_equal(np.asarray(frames)[0, 6:], 0)

    phonemes = np.zeros((2, cfg.max_phonemes), np.int32)
    phonemes[0, :5] = [3, 1, 4, 1, 5]
    phonemes[1, :2] = [9, 2]
    wave_out, n_samples = jax.jit(model.synthesize)(
        params, jnp.asarray(phonemes), jnp.asarray([5, 2], jnp.int32))
    assert wave_out.shape == (2, cfg.max_frames * cfg.hop)
    assert (np.asarray(n_samples) % cfg.hop == 0).all()
    assert np.abs(np.asarray(wave_out)).max() <= 1.0


def test_sam_prompted_masks_differ_by_point():
    """SAM-class: mask decoder output has full image resolution, responds
    to the prompt point, and masks out padding prompts (a padded point
    must not change the result)."""
    from rten_tpu.models.sam import SAM, SAMConfig

    cfg = SAMConfig.tiny_test()
    model = SAM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    size = cfg.vit.image_size
    img = jnp.asarray(
        np.random.RandomState(0).randn(1, 3, size, size), jnp.float32)

    def run(xy, extra_garbage=0.0):
        pts = np.zeros((1, cfg.max_points, 2), np.float32)
        labels = np.zeros((1, cfg.max_points), np.int32)
        pts[0, 0] = xy
        labels[0, 0] = 1
        pts[0, 1:] = extra_garbage   # padding slots: must be ignored
        mask, iou = model.predict(params, img, jnp.asarray(pts),
                                  jnp.asarray(labels),
                                  jnp.asarray([1], jnp.int32))
        return np.asarray(mask)[0], float(iou[0])

    m1, iou1 = run([0.2, 0.2])
    m2, _ = run([0.8, 0.8])
    assert m1.shape == (size, size)
    assert 0.0 <= iou1 <= 1.0
    assert np.abs(m1 - m2).max() > 1e-6       # prompt changes the mask
    m1b, _ = run([0.2, 0.2], extra_garbage=0.77)
    np.testing.assert_allclose(m1, m1b, rtol=1e-5, atol=1e-5)


def test_encdec_quantized_cache_matches_float(encdec):
    """Whisper-class decode with an int8 self-attention KV cache
    (BASELINE.json config 4): greedy tokens must match the float-cache
    decode on tiny shapes (int8 KV error ≪ logit margins here)."""
    model, params = encdec
    rng = np.random.RandomState(1)
    feats = rng.randn(2, 16, model.config.n_mels).astype(np.float32)
    ref = model.generate(params, feats, start_token=1, max_tokens=6)
    got = model.generate(params, feats, start_token=1, max_tokens=6,
                         quantized_cache=True)
    assert got.tolist() == ref.tolist()


def test_encdec_burst_generate_matches_stepwise(encdec):
    """Burst decoding (on-device lax.scan) must emit the same tokens as
    the step-by-step loop, including max_tokens truncation."""
    model, params = encdec
    rng = np.random.RandomState(2)
    feats = rng.randn(2, 16, model.config.n_mels).astype(np.float32)
    ref = model.generate(params, feats, start_token=1, max_tokens=7)
    got = model.generate(params, feats, start_token=1, max_tokens=7,
                         burst=3)
    assert got.tolist() == ref.tolist()


def test_prefill_last_matches_forward_gather():
    """prefill_last (engine prefill without the [B, S, V] logits tensor)
    must equal forward() + per-row last-token gather, and advance the
    cache identically — ragged lengths inside one padded bucket."""
    from rten_tpu.models.transformer import (TransformerConfig,
                                             TransformerLM)
    cfg = TransformerConfig.tiny_test()
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(3))
    rng = np.random.RandomState(3)
    tokens = jnp.asarray(rng.randint(0, cfg.vocab_size, (3, 8)), jnp.int32)
    lengths = jnp.asarray([8, 5, 2], jnp.int32)

    cache_a = model.new_cache(3, capacity=16)
    logits, cache_a = model.forward(params, tokens, cache_a,
                                    lengths=jnp.zeros(3, jnp.int32))
    ref = logits[jnp.arange(3), lengths - 1]

    cache_b = model.new_cache(3, capacity=16)
    got, cache_b = model.prefill_last(params, tokens, cache_b, lengths - 1)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    for (ka, va), (kb, vb) in zip(
            [cache_a.layer_kv(i) for i in range(cfg.n_layers)],
            [cache_b.layer_kv(i) for i in range(cfg.n_layers)]):
        np.testing.assert_array_equal(np.asarray(ka), np.asarray(kb))
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    assert cache_a.lengths.tolist() == cache_b.lengths.tolist()
