"""Tokenizer tests: our pure-Python BPE/WordPiece vs the HF `tokenizers`
library as golden (the reference validates against the same library's
output, rten-text/tools/reference_tokenize.py)."""

import json

import pytest

tokenizers = pytest.importorskip("tokenizers")

from rten_tpu.text import from_json_str  # noqa: E402

CORPUS = [
    "The quick brown fox jumps over the lazy dog.",
    "TPU kernels fuse dequantization into the matmul pipeline.",
    "Hello world! Ünïcödé † characters and    whitespace.",
    "word word word subword subwording tokenizing tokens",
    "numbers 123 456 7890 and punctuation !?;:,.",
]

SAMPLES = [
    "The quick brown fox",
    "subwording tokens 123!",
    "Hello world",
    "Ünïcödé characters",
    "  leading and trailing  ",
]


@pytest.fixture(scope="module")
def hf_byte_bpe():
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers
    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=400, special_tokens=["<|endoftext|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(CORPUS, trainer)
    return tok


@pytest.fixture(scope="module")
def hf_wordpiece():
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers, trainers
    tok = Tokenizer(models.WordPiece(unk_token="[UNK]"))
    tok.normalizer = normalizers.BertNormalizer(lowercase=True)
    tok.pre_tokenizer = pre_tokenizers.BertPreTokenizer()
    trainer = trainers.WordPieceTrainer(
        vocab_size=300, special_tokens=["[UNK]", "[CLS]", "[SEP]", "[PAD]"])
    tok.train_from_iterator(CORPUS, trainer)
    return tok


@pytest.mark.parametrize("text", SAMPLES)
def test_byte_bpe_matches_hf(hf_byte_bpe, text):
    ours = from_json_str(hf_byte_bpe.to_str())
    want = hf_byte_bpe.encode(text).ids
    got = ours.encode(text)
    assert got == want


def test_byte_bpe_decode_roundtrip(hf_byte_bpe):
    ours = from_json_str(hf_byte_bpe.to_str())
    for text in SAMPLES:
        ids = ours.encode(text)
        assert ours.decode(ids) == hf_byte_bpe.decode(ids)


@pytest.mark.parametrize("text", SAMPLES)
def test_wordpiece_matches_hf(hf_wordpiece, text):
    ours = from_json_str(hf_wordpiece.to_str())
    want = hf_wordpiece.encode(text).ids
    got = ours.encode(text)
    assert got == want


def test_added_special_tokens(hf_byte_bpe):
    ours = from_json_str(hf_byte_bpe.to_str())
    eot = ours.token_id("<|endoftext|>")
    assert eot is not None
    ids = ours.encode("The quick<|endoftext|>fox")
    assert eot in ids
    # decode drops the special token
    assert "<|endoftext|>" not in ours.decode(ids)


def test_encode_chunks(hf_byte_bpe):
    ours = from_json_str(hf_byte_bpe.to_str())
    ids = ours.encode(" ".join(CORPUS))
    chunks = ours.encode_chunks(" ".join(CORPUS), max_len=16, overlap=4)
    assert all(len(c) <= 16 for c in chunks)
    # chunks reassemble the full id stream (accounting for overlap)
    reassembled = list(chunks[0])
    for chunk in chunks[1:]:
        reassembled.extend(chunk[4:])
    assert reassembled == ids


def test_text_decoder_incremental_utf8(hf_byte_bpe):
    from rten_tpu.generate.text_decoder import TextDecoder
    ours = from_json_str(hf_byte_bpe.to_str())
    text = "Ünïcödé †"
    ids = ours.encode(text)
    decoder = TextDecoder(ours)
    out = "".join(decoder.push(i) for i in ids) + decoder.flush()
    assert out == hf_byte_bpe.decode(ids)


def test_native_bpe_matches_python(hf_byte_bpe):
    """The C++ merge loop must produce identical tokenization to the pure
    Python path (and thus to HF)."""
    import os
    from rten_tpu.fmt import native_loader
    if not native_loader.build():
        pytest.skip("native build unavailable")
    ours = from_json_str(hf_byte_bpe.to_str())
    native = ours.impl._native_encoder()
    assert native is not None, "native BPE should load after build"
    for text in SAMPLES + [" ".join(CORPUS)]:
        got = ours.encode(text)
        want = hf_byte_bpe.encode(text).ids
        assert got == want
