"""HF ``tokenizer.json`` loader + Tokenizer facade.

Reference: rten-text/src/tokenizers/json.rs + tokenizers.rs: parse the
Hugging Face tokenizer.json format and construct the matching BPE or
WordPiece tokenizer, handling added/special tokens.
"""

from __future__ import annotations

import json

from .bpe import BpeTokenizer
from .wordpiece import WordPieceTokenizer


class Tokenizer:
    """Facade with encode/decode plus chunking (the reference's
    ``encode_chunks``, tokenizers.rs:378-424)."""

    def __init__(self, impl, added_tokens=None):
        self.impl = impl
        self.added_tokens = dict(added_tokens or {})  # token → id
        self._added_by_id = {i: t for t, i in self.added_tokens.items()}

    def token_id(self, token: str):
        if token in self.added_tokens:
            return self.added_tokens[token]
        return self.impl.vocab.get(token)

    def encode(self, text: str, add_special=False) -> list[int]:
        # Split out added/special tokens verbatim before model encoding.
        if not self.added_tokens:
            return self.impl.encode(text, add_special=add_special)
        segments = [text]
        for token, idx in sorted(self.added_tokens.items(),
                                 key=lambda kv: -len(kv[0])):
            new_segments = []
            for seg in segments:
                if isinstance(seg, int):
                    new_segments.append(seg)
                    continue
                parts = seg.split(token)
                for i, part in enumerate(parts):
                    if i:
                        new_segments.append(idx)
                    if part:
                        new_segments.append(part)
            segments = new_segments
        ids: list[int] = []
        for seg in segments:
            if isinstance(seg, int):
                ids.append(seg)
            else:
                ids.extend(self.impl.encode(seg, add_special=False))
        if add_special:
            ids = self.impl.encode("", add_special=True)[:1] + ids + \
                self.impl.encode("", add_special=True)[1:]
        return ids

    def decode(self, ids) -> str:
        plain = [i for i in ids if int(i) not in self._added_by_id]
        return self.impl.decode(plain)

    def encode_chunks(self, text: str, max_len: int, overlap: int = 0):
        """Encode then split into chunks of ``max_len`` with ``overlap``."""
        ids = self.encode(text)
        if max_len <= overlap:
            raise ValueError("max_len must exceed overlap")
        step = max_len - overlap
        return [ids[i:i + max_len] for i in range(0, max(len(ids) - overlap, 1),
                                                  step)]


def from_json_str(data: str) -> Tokenizer:
    spec = json.loads(data)
    model = spec.get("model", {})
    model_type = model.get("type")
    added = {}
    for tok in spec.get("added_tokens", []):
        added[tok["content"]] = int(tok["id"])

    if model_type == "BPE":
        merges = []
        for m in model.get("merges", []):
            if isinstance(m, str):
                a, _, b = m.partition(" ")
                merges.append((a, b))
            else:
                merges.append((m[0], m[1]))
        pre = spec.get("pre_tokenizer") or {}
        byte_level = _uses_byte_level(pre)
        impl = BpeTokenizer(
            vocab=model["vocab"], merges=merges,
            special_tokens=added,
            end_of_word_suffix=model.get("end_of_word_suffix") or "",
            byte_level=byte_level)
    elif model_type == "WordPiece":
        norm = spec.get("normalizer") or {}
        impl = WordPieceTokenizer(
            vocab=model["vocab"],
            lowercase=bool(norm.get("lowercase", True)),
            strip_accents=norm.get("strip_accents"),
            unk_token=model.get("unk_token", "[UNK]"),
            continuing_prefix=model.get("continuing_subword_prefix", "##"),
            max_word_chars=model.get("max_input_chars_per_word", 100))
    else:
        raise ValueError(f"unsupported tokenizer model type {model_type!r}")
    return Tokenizer(impl, added)


def _uses_byte_level(pre_tokenizer: dict) -> bool:
    if pre_tokenizer.get("type") == "ByteLevel":
        return True
    for sub in pre_tokenizer.get("pretokenizers", []) or []:
        if sub.get("type") == "ByteLevel":
            return True
    return False


def from_json_file(path) -> Tokenizer:
    with open(path, encoding="utf-8") as f:
        return from_json_str(f.read())
