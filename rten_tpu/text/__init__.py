"""Tokenizers — pure-Python analog of the reference's rten-text crate:
byte-level BPE (GPT-2 family), WordPiece (BERT family), and a HF
``tokenizer.json`` loader. Validated against the HF ``tokenizers``
library in tests (the reference validates against the same corpus,
rten-text/test-data/reftests)."""

from .bpe import BpeTokenizer
from .wordpiece import WordPieceTokenizer
from .tokenizer import Tokenizer, from_json_file, from_json_str

__all__ = ["BpeTokenizer", "WordPieceTokenizer", "Tokenizer",
           "from_json_file", "from_json_str"]
