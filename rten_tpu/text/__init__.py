"""Tokenizers — pure-Python analog of the reference's rten-text crate:
the HF ``tokenizer.json`` pipeline (normalizers with offset maps,
pre-tokenizers incl. ByteLevel/Metaspace, byte-level + byte-fallback
BPE, WordPiece, decoders, template post-processing). Validated against
the HF ``tokenizers`` library and real-corpus goldens in tests (the
reference validates against the same corpus,
rten-text/test-data/reftests; offset mapping per
rten-text/src/normalizer.rs:97-129)."""

from .bpe import BpeTokenizer
from .wordpiece import WordPieceTokenizer
from .tokenizer import (Tokenizer, from_json_file, from_json_str,
                        wordpiece_from_vocab)

__all__ = ["BpeTokenizer", "WordPieceTokenizer", "Tokenizer",
           "from_json_file", "from_json_str", "wordpiece_from_vocab"]
