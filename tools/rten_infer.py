"""Run a `.rten` model and dump (intermediate) outputs for comparison.

The analog of the reference's ``tools/ort-infer.py`` +
``tools/add-node-outputs-to-model.py`` debugging workflow
(``docs/debugging.md:16-56``): the reference uses ONNX Runtime as the
"other side" and a model-rewriting script to expose ORT intermediates.
Our runtime — like RTen itself — can return ANY value node as an output,
so no model rewriting is needed; this tool runs a model (optionally a
second variant of it, e.g. f32 vs int8-quantized, or jit vs ``--eager``)
and dumps selected or all intermediate values to ``.npy`` or the binary
``.bin`` dump format (tools/debug_utils.py), ready for
``tools/compare_tensors.py``.

    # dump every operator output from two model variants, then diff one
    python tools/rten_infer.py model_f32.rten  --dump-dir /tmp/a
    python tools/rten_infer.py model_int8.rten --dump-dir /tmp/b
    python tools/compare_tensors.py /tmp/a/blk0_attn.npy /tmp/b/blk0_attn.npy

Inputs are synthesized with the CLI's name heuristics (deterministic
seed) unless provided via ``--input name=path.npy``.
"""

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def safe_filename(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.-]+", "_", name or "unnamed")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("model", help=".rten model path")
    parser.add_argument("--input", action="append", metavar="name=path",
                        help=".npy/.bin input override (repeatable)")
    parser.add_argument("--size", action="append", metavar="name=N",
                        help="size for a symbolic input dim (repeatable)")
    parser.add_argument("--outputs", nargs="*",
                        help="value-node names to fetch (default: graph "
                             "outputs; any intermediate name is valid)")
    parser.add_argument("--dump-dir",
                        help="dump EVERY operator output here")
    parser.add_argument("--format", choices=("npy", "bin"), default="npy",
                        help="dump format: .npy or the binary f32 dump "
                             "format shared with the reference tooling")
    parser.add_argument("--eager", action="store_true",
                        help="eager interpreter (per-op) execution")
    parser.add_argument("--timing", action="store_true",
                        help="per-op timing table")
    parser.add_argument("--no-optimize", action="store_true")
    parser.add_argument("--platform", default=None)
    args = parser.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from rten_tpu.cli import synthesize_input
    from rten_tpu.ir.graph import OperatorNode, ValueNode
    from rten_tpu.runtime.executor import RunOptions
    from rten_tpu.runtime.model import Model, ModelOptions
    import tools.debug_utils as debug_utils

    model = Model.load_file(
        args.model, ModelOptions(optimize=not args.no_optimize))
    graph = model.graph

    dim_sizes = {}
    for spec in args.size or []:
        name, _, value = spec.partition("=")
        dim_sizes[name] = int(value)

    overrides = {}
    for spec in args.input or []:
        name, _, path = spec.partition("=")
        if path.endswith(".bin"):
            overrides[name] = debug_utils.read_tensor(path)
        else:
            overrides[name] = np.load(path)

    inputs = {}
    for node_id in model.input_ids():
        name = graph.nodes[node_id].name
        if name in overrides:
            inputs[node_id] = overrides.pop(name)
        else:
            inputs[node_id] = synthesize_input(
                name, model.input_shape(node_id), dim_sizes)
    if overrides:
        parser.error(f"unknown input name(s): {sorted(overrides)}")

    if args.dump_dir:
        # Every operator-produced value node (RTen's "any value node can
        # be an output" property; no add-node-outputs rewriting needed).
        wanted = []
        for node in graph.nodes:
            if isinstance(node.data, OperatorNode):
                wanted.extend(o for o in node.data.outputs if o is not None)
        seen = set()
        wanted = [o for o in wanted
                  if not (o in seen or seen.add(o))]
    elif args.outputs:
        wanted = [graph.node_id(n) for n in args.outputs]
    else:
        wanted = list(model.output_ids())

    options = RunOptions(timing=args.timing, eager=args.eager or args.timing)
    outs = model.run(inputs, outputs=wanted, options=options)

    if args.dump_dir:
        os.makedirs(args.dump_dir, exist_ok=True)
        n_written = 0
        for node_id, value in zip(wanted, outs):
            arr = np.asarray(value)
            base = safe_filename(graph.nodes[node_id].name or f"v{node_id}")
            path = os.path.join(args.dump_dir, f"{base}.{args.format}")
            if args.format == "bin":
                if not np.issubdtype(arr.dtype, np.number):
                    continue
                debug_utils.write_tensor(arr.astype(np.float32), path)
            else:
                np.save(path, arr)
            n_written += 1
        print(f"wrote {n_written} tensors to {args.dump_dir}")
    else:
        for node_id, value in zip(wanted, outs):
            arr = np.asarray(value)
            name = graph.nodes[node_id].name or f"v{node_id}"
            flat = arr.reshape(-1)
            preview = np.array2string(flat[:8], precision=5)
            print(f"{name}: shape {list(arr.shape)} dtype {arr.dtype} "
                  f"first {preview}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
