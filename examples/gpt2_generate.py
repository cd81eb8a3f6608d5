"""GPT-2 text generation on the native serving engine
(reference example: rten-examples/src/gpt2.rs).

    python examples/gpt2_generate.py --prompt "The TPU is" \
        [--weights path/to/pytorch_model.bin-or-model.safetensors] \
        [--tokenizer path/to/tokenizer.json] [--quantize int8|int4]

Without --weights a randomly initialized GPT-2-small runs (architecture
demo only). With HF GPT-2 weights + tokenizer.json this generates real
text. Prints tokens/s + TTFT metrics like the reference example.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--prompt", default="Hello, world")
    parser.add_argument("--weights", default=None)
    parser.add_argument("--tokenizer", default=None)
    parser.add_argument("--max-tokens", type=int, default=48)
    parser.add_argument("--quantize", choices=["int8", "int4"], default=None)
    parser.add_argument("--top-k", type=int, default=0,
                        help="0 = greedy")
    parser.add_argument("--temperature", type=float, default=0.8)
    args = parser.parse_args()

    import jax
    from rten_tpu.generate.engine import ServingEngine
    from rten_tpu.generate.sampler import ArgMaxSampler, TopKSampler
    from rten_tpu.models.transformer import (TransformerConfig,
                                             TransformerLM,
                                             quantize_weights)

    cfg = TransformerConfig.gpt2()
    model = TransformerLM(cfg)
    if args.weights:
        from rten_tpu.models import hf_loader
        params = hf_loader.load_gpt2(args.weights, cfg)
        print(f"loaded weights from {args.weights}")
    else:
        params = model.init_params(jax.random.PRNGKey(0))
        print("using random weights (pass --weights for real text)")
    if args.quantize:
        params = quantize_weights(params, args.quantize)
        print(f"quantized projection weights to {args.quantize}")

    if args.tokenizer:
        from rten_tpu.text import from_json_file
        tok = from_json_file(args.tokenizer)
        prompt_ids = tok.encode(args.prompt)
    else:
        tok = None
        prompt_ids = [ord(c) % 50257 for c in args.prompt]

    sampler = (TopKSampler(args.top_k, args.temperature) if args.top_k
               else ArgMaxSampler())
    engine = ServingEngine(model, params, max_batch=1, capacity=1024,
                           sampler=sampler)
    req = engine.submit(prompt_ids, max_new_tokens=args.max_tokens)
    t0 = time.perf_counter()
    engine.run()
    elapsed = time.perf_counter() - t0

    if tok:
        print(tok.decode(req.tokens))
    else:
        print("tokens:", req.tokens)
    print(f"\n{req.metrics.summary()}  (wall {elapsed:.2f}s incl. compile)")


if __name__ == "__main__":
    main()
