"""Native model definitions.

These are TPU-first implementations of the model families the reference's
examples cover (rten-examples: gpt2, qwen2_chat/TinyLlama-class, bert_qa,
imagenet/ResNet-50, ...): fixed-shape jitted forward functions built on
the flash/quantized kernels, with sharding-aware parameter pytrees. The
`.rten` graph path (runtime.Model) remains available for converted ONNX
models; these native definitions are the high-performance serving path.
"""

from .transformer import TransformerConfig, TransformerLM

__all__ = ["TransformerConfig", "TransformerLM"]
