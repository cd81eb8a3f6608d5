"""rten_tpu — a TPU-native inference framework with the capability surface
of RTen (reference: hsfzxjy/rten-fork), built on JAX/XLA/Pallas/pjit.

Layer map (SURVEY.md §1 analog):
  fmt/      `.rten` container format (FlatBuffers schema, header, builder)
  ir/       dataflow-graph IR + optimizer passes
  ops/      ~100 ONNX-equivalent operator lowerings over jnp/lax
  runtime/  jit executor, eager interpreter, Model API, timing
  kernels/  Pallas TPU kernels (quantized GEMM, attention, softmax)
  generate/ autoregressive serving engine (KV cache, samplers, batching)
  parallel/ mesh/sharding layer (tensor/data parallel over ICI)
  text/     tokenizers (BPE, WordPiece, HF tokenizer.json)
  models/   native model definitions (ResNet, GPT-2, BERT, ...)
  convert/  ONNX → .rten converter
"""

from .runtime.model import Model, ModelMetadata, ModelOptions, RunError
from .runtime.executor import GraphExecutor, RunOptions
from .ir.graph import Graph
from .fmt.model_builder import ModelBuilder

__version__ = "0.1.0"

__all__ = ["Model", "ModelMetadata", "ModelOptions", "RunError",
           "GraphExecutor", "RunOptions", "Graph", "ModelBuilder",
           "__version__"]
