"""MatMul / Gemm / Einsum.

The reference backs these with a hand-written BLIS-style SIMD GEMM
(``src/gemm.rs``); on TPU they lower to ``dot_general`` and XLA tiles them
onto the MXU directly. Batch broadcasting follows numpy matmul semantics
(reference ``src/ops/matmul.rs:194-206``). Quantized variants live in
:mod:`rten_tpu.kernels` as Pallas kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

from .registry import OpError, register


def _accum_dtype(a):
    return jnp.float32 if jnp.issubdtype(a.dtype, jnp.floating) else jnp.int32


@register("MatMul")
def matmul(ctx, attrs, a, b):
    if a.ndim < 1 or b.ndim < 1:
        raise OpError("MatMul", "inputs must have rank >= 1")
    return jnp.matmul(a, b, preferred_element_type=_accum_dtype(a))


@register("Gemm")
def gemm(ctx, attrs, a, b, c=None):
    alpha = float(attrs.get("alpha", 1.0))
    beta = float(attrs.get("beta", 1.0))
    if attrs.get("transpose_a"):
        a = a.T
    if attrs.get("transpose_b"):
        b = b.T
    out = jnp.matmul(a, b, preferred_element_type=_accum_dtype(a))
    if alpha != 1.0:
        out = alpha * out
    if c is not None and beta != 0.0:
        out = out + (beta * c if beta != 1.0 else c)
    return out


@register("Einsum")
def einsum(ctx, attrs, *xs):
    equation = attrs.get("equation")
    if not equation:
        raise OpError("Einsum", "missing equation")
    return jnp.einsum(equation.replace(" ", ""), *xs,
                      preferred_element_type=_accum_dtype(xs[0]))
