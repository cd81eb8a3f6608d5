"""Pallas TPU kernels + quantization math.

This layer replaces the reference's hand-written SIMD compute stack
(``src/gemm.rs`` BLIS-style GEMM, ``rten-simd`` portable SIMD,
``rten-vecmath`` transcendentals): fp32/bf16 matmuls lower to the MXU via
XLA, and the kernels here cover what XLA does not do well on its own —
quantized (INT8 / INT4 weight-only) matmuls with dequantization fused
into the MXU pipeline, and fused attention for serving.

All kernels run in Pallas ``interpret`` mode on CPU (tests) and compiled
on TPU.
"""

from .quant import (dequantize, dynamic_quantize, pack_int4, quantize,
                    quantize_int4_groupwise, unpack_int4)
from .gemm import matmul_int8, matmul_int4

__all__ = [
    "quantize", "dequantize", "dynamic_quantize", "pack_int4", "unpack_int4",
    "quantize_int4_groupwise", "matmul_int8", "matmul_int4",
]
