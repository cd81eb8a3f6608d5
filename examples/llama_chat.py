"""TinyLlama/Qwen2-class chat on the native engine with INT4 weights
(reference example: rten-examples/src/qwen2_chat.rs; BASELINE config 5).

    python examples/llama_chat.py --weights model.safetensors \
        --tokenizer tokenizer.json [--quantize int4]
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", default=None)
    parser.add_argument("--tokenizer", default=None)
    parser.add_argument("--quantize", choices=["int8", "int4"],
                        default="int4")
    parser.add_argument("--max-tokens", type=int, default=128)
    parser.add_argument("--prompt", default="What is a TPU?")
    args = parser.parse_args()

    import jax
    from rten_tpu.generate.engine import ServingEngine
    from rten_tpu.generate.sampler import TopKSampler
    from rten_tpu.models.transformer import (TransformerConfig,
                                             TransformerLM,
                                             quantize_weights)

    if args.weights:
        # Config fields are read from the checkpoint's companion config in
        # a real deployment; TinyLlama-1.1B dimensions are the default.
        cfg = TransformerConfig.tiny_llama()
        model = TransformerLM(cfg)
        from rten_tpu.models import hf_loader
        params = hf_loader.load_llama(args.weights, cfg)
    else:
        cfg = TransformerConfig.tiny_llama(
            n_layers=4, d_model=512, d_ff=1024, n_heads=8, kv_heads=2,
            vocab_size=2048, max_seq_len=512)
        model = TransformerLM(cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        print("random weights (scaled-down TinyLlama config)")

    if args.quantize:
        params = quantize_weights(params, args.quantize)
        print(f"weights quantized to {args.quantize}")

    if args.tokenizer:
        from rten_tpu.text import from_json_file
        tok = from_json_file(args.tokenizer)
        prompt_ids = tok.encode(f"<|user|>\n{args.prompt}</s>\n<|assistant|>\n")
    else:
        tok = None
        prompt_ids = [abs(hash(w)) % cfg.vocab_size
                      for w in args.prompt.split()]

    engine = ServingEngine(model, params, max_batch=1,
                           capacity=cfg.max_seq_len,
                           sampler=TopKSampler(k=40, temperature=0.7))
    req = engine.submit(prompt_ids, max_new_tokens=args.max_tokens)
    engine.run(burst=8)
    if tok:
        print(tok.decode(req.tokens))
    else:
        print("tokens:", req.tokens[:32], "...")
    print(req.metrics.summary())


if __name__ == "__main__":
    main()
