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


def _llama_style_json(pre="normalizer"):
    """Handcrafted SentencePiece-style tokenizer.json (the Llama/Mistral
    shape): byte-fallback BPE over ▁-marked words, with either the
    Prepend+Replace normalizer pair (Llama-2 tokenizer.json) or a
    Metaspace pre_tokenizer (Mistral-style), plus the standard decoder
    chain and a TemplateProcessing BOS."""
    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for b in range(256):
        vocab[f"<0x{b:02X}>"] = 3 + b
    merge_pairs = []

    def add(tok):
        if tok not in vocab:
            vocab[tok] = len(vocab)

    for ch in ["▁", "h", "e", "l", "o", "w", "r", "d", "i"]:
        add(ch)
    for a, b in [("h", "e"), ("l", "l"), ("ll", "o"), ("he", "llo"),
                 ("▁", "hello"), ("w", "o"), ("wo", "r"), ("wor", "l"),
                 ("worl", "d"), ("▁", "world"), ("h", "i"), ("▁", "hi")]:
        add(a + b)
        merge_pairs.append(f"{a} {b}")

    spec = {
        "version": "1.0",
        "added_tokens": [
            {"id": 1, "content": "<s>", "special": True,
             "single_word": False, "lstrip": False, "rstrip": False,
             "normalized": False},
            {"id": 2, "content": "</s>", "special": True,
             "single_word": False, "lstrip": False, "rstrip": False,
             "normalized": False},
        ],
        "normalizer": None,
        "pre_tokenizer": None,
        "post_processor": {
            "type": "TemplateProcessing",
            "single": [
                {"SpecialToken": {"id": "<s>", "type_id": 0}},
                {"Sequence": {"id": "A", "type_id": 0}},
            ],
            "pair": [
                {"SpecialToken": {"id": "<s>", "type_id": 0}},
                {"Sequence": {"id": "A", "type_id": 0}},
                {"Sequence": {"id": "B", "type_id": 1}},
            ],
            "special_tokens": {
                "<s>": {"id": "<s>", "ids": [1], "tokens": ["<s>"]},
            },
        },
        "decoder": {
            "type": "Sequence",
            "decoders": [
                {"type": "Replace", "pattern": {"String": "▁"},
                 "content": " "},
                {"type": "ByteFallback"},
                {"type": "Fuse"},
                {"type": "Strip", "content": " ", "start": 1, "stop": 0},
            ],
        },
        "model": {
            "type": "BPE", "dropout": None, "unk_token": "<unk>",
            "continuing_subword_prefix": None,
            "end_of_word_suffix": None, "fuse_unk": True,
            "byte_fallback": True, "ignore_merges": False,
            "vocab": vocab, "merges": merge_pairs,
        },
    }
    if pre == "normalizer":
        spec["normalizer"] = {
            "type": "Sequence",
            "normalizers": [
                {"type": "Prepend", "prepend": "▁"},
                {"type": "Replace", "pattern": {"String": " "},
                 "content": "▁"},
            ],
        }
    else:
        spec["pre_tokenizer"] = {
            "type": "Metaspace", "replacement": "▁",
            "prepend_scheme": "always", "split": True,
        }
    return json.dumps(spec)


LLAMA_SAMPLES = [
    "hello world",
    "hello hello hi",
    "hi héllo",            # é → byte fallback <0xC3><0xA9>
    "hello 😀 world",      # emoji → 4 fallback bytes
    " hello",
    "hi",
]


@pytest.mark.parametrize("pre", ["normalizer", "metaspace"])
@pytest.mark.parametrize("text", LLAMA_SAMPLES)
def test_llama_style_matches_hf(pre, text):
    from tokenizers import Tokenizer as HFTokenizer
    data = _llama_style_json(pre)
    hf = HFTokenizer.from_str(data)
    ours = from_json_str(data)
    assert ours.encode(text) == hf.encode(text, add_special_tokens=False).ids
    got_sp = ours.encode(text, add_special=True)
    assert got_sp == hf.encode(text).ids
    assert got_sp[0] == 1                      # BOS from the template


@pytest.mark.parametrize("pre", ["normalizer", "metaspace"])
def test_llama_style_decode_matches_hf(pre):
    from tokenizers import Tokenizer as HFTokenizer
    data = _llama_style_json(pre)
    hf = HFTokenizer.from_str(data)
    ours = from_json_str(data)
    for text in LLAMA_SAMPLES:
        ids = ours.encode(text)
        assert ours.decode(ids) == hf.decode(ids)


def test_llama_style_offsets():
    ours = from_json_str(_llama_style_json("normalizer"))
    text = "hello hi world"
    ids, offsets = ours.encode_with_offsets(text)
    assert len(ids) == len(offsets)
    words = []
    for i, (s, e) in zip(ids, offsets):
        tok = ours.impl.id_to_token[i]
        if tok.startswith("▁") and len(tok) > 1:
            words.append((tok[1:], text[s:e].lstrip(" ")))
    assert words == [("hello", "hello"), ("hi", "hi"),
                     ("world", "world")]


@pytest.mark.parametrize("text", SAMPLES)
def test_wordpiece_offsets_match_hf(hf_wordpiece, text):
    ours = from_json_str(hf_wordpiece.to_str())
    enc = hf_wordpiece.encode(text)
    ids, offsets = ours.encode_with_offsets(text)
    assert ids == enc.ids
    assert offsets == list(enc.offsets)


@pytest.mark.parametrize("text", SAMPLES)
def test_byte_bpe_offsets_match_hf(hf_byte_bpe, text):
    ours = from_json_str(hf_byte_bpe.to_str())
    enc = hf_byte_bpe.encode(text)
    ids, offsets = ours.encode_with_offsets(text)
    assert ids == enc.ids
    assert offsets == list(enc.offsets)


def test_encode_pair_qa_spans(hf_wordpiece):
    """The QA path: pair encoding gives [CLS] q [SEP] c [SEP] with
    type_ids and context-token spans into the ORIGINAL context string
    (examples/bert_qa.py extracts answers via these)."""
    from tokenizers.processors import BertProcessing
    hf_wordpiece.post_processor = BertProcessing(
        ("[SEP]", hf_wordpiece.token_to_id("[SEP]")),
        ("[CLS]", hf_wordpiece.token_to_id("[CLS]")))
    ours = from_json_str(hf_wordpiece.to_str())
    question = "The Quick Fox?"
    context = "The quick brown fox jumps over the LAZY dog."
    ids, type_ids, offsets = ours.encode_pair(question, context)
    enc = hf_wordpiece.encode(question, context)
    assert ids == enc.ids
    assert type_ids == enc.type_ids
    # Context tokens carry spans into the raw context; specials and
    # question tokens are None.
    for i, (idx, sp, tid) in enumerate(zip(ids, offsets, type_ids)):
        if sp is None:
            continue
        assert tid == 1
        s, e = sp
        tok_str = ours.impl.id_to_token[idx].removeprefix("##")
        norm, _ = ours.normalizer.normalize(context[s:e])
        assert norm == tok_str
    # "LAZY" maps back to its original-cased chars.
    lazy = [sp for idx, sp in zip(ids, offsets)
            if sp and context[sp[0]:sp[1]] == "LAZY"]
    assert lazy, "expected a token spanning the original 'LAZY'"


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


def test_bpe_continuing_subword_prefix_matches_hf():
    """BPE with a continuing_subword_prefix (advisor r2: previously
    accepted but silently ignored). HF semantics: non-initial chars
    carry the prefix; a merge outputs left + right[len(prefix):].
    ids AND offsets must match the HF library byte-for-byte."""
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {}
    for ch in "abcdefgh ,.":
        vocab.setdefault(ch, len(vocab))
        vocab.setdefault("##" + ch, len(vocab))
    merges = [("a", "##b"), ("ab", "##c"), ("d", "##e"), ("##f", "##g")]
    for a, b in merges:
        vocab.setdefault(a + (b[2:] if b.startswith("##") else b),
                         len(vocab))
    vocab.setdefault("[UNK]", len(vocab))
    hf = Tokenizer(models.BPE(vocab=vocab, merges=merges,
                              continuing_subword_prefix="##",
                              unk_token="[UNK]"))
    hf.pre_tokenizer = pre_tokenizers.Whitespace()

    import regex

    from rten_tpu.text.bpe import BpeTokenizer
    mine = BpeTokenizer(vocab, merges, byte_level=False,
                        unk_token="[UNK]",
                        continuing_subword_prefix="##",
                        split_pattern=r"\w+|[^\w\s]+")
    for text in ["abc de ffg", "abcd efg hab", "abcabc", "a", "hfg",
                 "xyz abc"]:
        enc = hf.encode(text)
        ids, offs = [], []
        for m in regex.finditer(r"\w+|[^\w\s]+", text):
            for i, (s, e) in mine.encode_piece(m.group()):
                ids.append(i)
                offs.append((m.start() + s, m.start() + e))
        assert ids == enc.ids, text
        assert offs == list(enc.offsets), text
