"""Sentence-similarity embeddings with BERT
(reference example: rten-examples/src/jina_similarity.rs).

    python examples/bert_similarity.py "first sentence" "second sentence" \
        [--weights model.safetensors --tokenizer tokenizer.json]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("sentences", nargs="*",
                        default=["The cat sat on the mat",
                                 "A feline rested on the rug",
                                 "TPUs execute matrix multiplications"])
    parser.add_argument("--weights", default=None)
    parser.add_argument("--tokenizer", default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from rten_tpu.models.bert import Bert, BertConfig

    cfg = BertConfig() if args.weights else BertConfig.tiny_test()
    model = Bert(cfg)
    if args.weights:
        from rten_tpu.models import hf_loader
        params = hf_loader.load_bert(args.weights, cfg)
    else:
        params = model.init_params(jax.random.PRNGKey(0))
        print("random weights (pass --weights for meaningful similarity)")

    if args.tokenizer:
        from rten_tpu.text import from_json_file
        tok = from_json_file(args.tokenizer)
        encoded = [tok.encode(s, add_special=True) for s in args.sentences]
    else:
        encoded = [[hash(w) % cfg.vocab_size for w in s.split()]
                   for s in args.sentences]

    max_len = max(len(e) for e in encoded)
    ids = np.zeros((len(encoded), max_len), np.int32)
    mask = np.zeros((len(encoded), max_len), np.int32)
    for i, e in enumerate(encoded):
        ids[i, :len(e)] = e
        mask[i, :len(e)] = 1

    emb = np.asarray(model.mean_embedding(
        params, jnp.asarray(ids), jnp.asarray(mask)))
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sims = emb @ emb.T
    for i, a in enumerate(args.sentences):
        for j, b in enumerate(args.sentences):
            if j <= i:
                continue
            print(f"sim({a!r}, {b!r}) = {sims[i, j]:.3f}")


if __name__ == "__main__":
    main()
