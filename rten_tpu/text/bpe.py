"""Byte-level BPE (GPT-2 style).

Reference: rten-text/src/tokenizers/bpe.rs. Encoding: pre-tokenize with
the GPT-2 regex, map bytes through the printable-unicode byte encoder,
then greedily apply merges by rank.
"""

from __future__ import annotations

import functools


def bytes_to_unicode():
    """GPT-2's reversible byte↔unicode table: printable chars map to
    themselves, the rest shift into the U+0100.. range."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


_GPT2_SPLIT = (r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+|"
               r" ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+")


class BpeTokenizer:
    def __init__(self, vocab: dict[str, int], merges: list[tuple[str, str]],
                 special_tokens: dict[str, int] | None = None,
                 end_of_word_suffix: str = "", split_pattern=None,
                 byte_level: bool = True):
        self.vocab = dict(vocab)
        self.id_to_token = {i: t for t, i in self.vocab.items()}
        self.merge_ranks = {tuple(m): r for r, m in enumerate(merges)}
        self.special_tokens = dict(special_tokens or {})
        for tok, idx in self.special_tokens.items():
            self.id_to_token.setdefault(idx, tok)
        self.end_of_word_suffix = end_of_word_suffix
        self.byte_level = byte_level
        self._byte_enc = bytes_to_unicode()
        self._byte_dec = {v: k for k, v in self._byte_enc.items()}
        import regex
        self._split_re = regex.compile(split_pattern or _GPT2_SPLIT)

    def _native_encoder(self):
        """Lazily build the C++ merge-loop encoder (native/bpe_encoder.cpp)
        with string→id interning; None if the library isn't available."""
        if hasattr(self, "_native"):
            return self._native
        self._native = None
        try:
            from . import native_bpe
            self._native = native_bpe.NativeBpe(self.merge_ranks)
        except Exception:
            pass
        return self._native

    @functools.lru_cache(maxsize=65536)
    def _bpe_word(self, word: str) -> tuple[str, ...]:
        parts = list(word)
        if self.end_of_word_suffix and parts:
            parts[-1] += self.end_of_word_suffix
        if len(parts) == 1:
            return tuple(parts)
        native = self._native_encoder()
        if native is not None:
            return native.apply(parts)
        while True:
            best_rank, best_i = None, None
            for i in range(len(parts) - 1):
                rank = self.merge_ranks.get((parts[i], parts[i + 1]))
                if rank is not None and (best_rank is None or rank < best_rank):
                    best_rank, best_i = rank, i
            if best_i is None:
                return tuple(parts)
            parts[best_i:best_i + 2] = [parts[best_i] + parts[best_i + 1]]

    def encode(self, text: str, add_special=False) -> list[int]:
        ids: list[int] = []
        for piece in self._split_re.findall(text):
            if self.byte_level:
                piece = "".join(self._byte_enc[b]
                                for b in piece.encode("utf-8"))
            for token in self._bpe_word(piece):
                idx = self.vocab.get(token)
                if idx is not None:
                    ids.append(idx)
        return ids

    def decode(self, ids) -> str:
        text = "".join(self.id_to_token.get(int(i), "") for i in ids)
        if self.byte_level:
            data = bytes(self._byte_dec[c] for c in text
                         if c in self._byte_dec)
            return data.decode("utf-8", errors="replace")
        if self.end_of_word_suffix:
            return text.replace(self.end_of_word_suffix, " ").rstrip()
        return text
