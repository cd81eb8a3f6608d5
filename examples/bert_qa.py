"""Extractive question answering with BERT
(reference example: rten-examples/src/bert_qa.rs).

    python examples/bert_qa.py --question "Who wrote it?" \
        --context "The book was written by Ada." \
        [--weights model.safetensors --tokenizer tokenizer.json]

Pipeline: [CLS] question [SEP] context [SEP] → BERT → per-token
start/end logits (qa head) → best span restricted to context tokens
(start ≤ end, bounded length), decoded back to text. With random
weights the span is arbitrary — the example demonstrates the pipeline;
pass SQuAD-finetuned weights for real answers.
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

CLS, SEP = 101, 102   # BERT special-token ids
MAX_ANSWER_TOKENS = 30


def best_span(start_logits, end_logits, first_ctx, n_tokens):
    """Highest start+end scoring span with start<=end inside the
    context segment, at most MAX_ANSWER_TOKENS long."""
    best = (first_ctx, first_ctx, -np.inf)
    for s in range(first_ctx, n_tokens):
        e_hi = min(s + MAX_ANSWER_TOKENS, n_tokens)
        e = int(np.argmax(end_logits[s:e_hi])) + s
        score = float(start_logits[s] + end_logits[e])
        if score > best[2]:
            best = (s, e, score)
    return best


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--question", default="Who wrote the book?")
    parser.add_argument("--context",
                        default="The book was written by Ada Lovelace "
                                "in the nineteenth century.")
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
        print("random weights (pass --weights for real answers)")

    offsets = None
    if args.tokenizer:
        # encode_pair drives the tokenizer.json post-processor and keeps
        # per-token (start, end) character spans into the CONTEXT — the
        # normalized→original offset map (rten-text/src/normalizer.rs:
        # 97-129) lets the answer come back as a source-text slice.
        from rten_tpu.text import from_json_file
        tok = from_json_file(args.tokenizer)
        ids, types, offsets = tok.encode_pair(args.question, args.context)
        first_ctx = next(i for i, sp in enumerate(offsets)
                         if sp is not None)
        c_words = None
    else:
        tok = None
        q_ids = [hash(w) % cfg.vocab_size for w in args.question.split()]
        c_words = args.context.split()
        c_ids = [hash(w) % cfg.vocab_size for w in c_words]
        ids = [CLS % cfg.vocab_size] + q_ids + [SEP % cfg.vocab_size] \
            + c_ids + [SEP % cfg.vocab_size]
        first_ctx = len(q_ids) + 2
        types = [0] * first_ctx + [1] * (len(c_ids) + 1)
    n = len(ids)

    # Random-weight demo models have tiny vocabs; fold real tokenizer
    # ids into range for the forward pass (decode still uses real ids).
    model_ids = ids if args.weights else [i % cfg.vocab_size for i in ids]
    start, end = model.qa_spans(
        params, jnp.asarray([model_ids], jnp.int32),
        attention_mask=jnp.ones((1, n), jnp.int32),
        token_type_ids=jnp.asarray([types], jnp.int32))
    start = np.asarray(start)[0]
    end = np.asarray(end)[0]
    s, e, score = best_span(start, end, first_ctx, n - 1)  # excl. final SEP

    print(f"span tokens [{s}, {e}] score {score:.2f}")
    if offsets is not None:
        spans = [offsets[i] for i in range(s, e + 1)
                 if offsets[i] is not None]
        if spans:
            cs, ce = spans[0][0], spans[-1][1]
            print(f"answer chars [{cs}, {ce}): "
                  f"{args.context[cs:ce]!r}")
    elif c_words is not None:
        print("answer:", " ".join(c_words[s - first_ctx:e - first_ctx + 1]))


if __name__ == "__main__":
    main()
