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


@register("FusedSDPA")
def fused_sdpa(ctx, attrs, q, kt, v, mask=None):
    """Fused scaled-dot-product attention (optimizer rewrite of the
    MatMul→scale→mask→Softmax→MatMul chain, ir/optimize.py).

    q [..., S_q, D], kt [..., D, S_k] (the graph's already-transposed K),
    v [..., S_k, Dv]; additive ``mask`` broadcastable over the scores.
    4-D maskless shapes at prefill-scale sequence lengths route to the
    Pallas flash kernel (VMEM score tiles — the [S, S] scores never hit
    HBM, which generic MatMul/Softmax graph ops cannot avoid); everything
    else is one fused XLA chain."""
    scale = float(attrs.get("scale", 1.0))
    causal = bool(attrs.get("causal", 0))
    s_q, d = q.shape[-2], q.shape[-1]
    s_k = kt.shape[-1]
    if (mask is None and q.ndim == 4 and v.shape[-1] == d
            and s_q == s_k and s_q >= 256 and s_q % 128 == 0
            and jnp.issubdtype(q.dtype, jnp.floating)):
        from ..kernels.attention import flash_attention
        k = jnp.swapaxes(kt, -1, -2)
        return flash_attention(q, k, v.astype(q.dtype), causal=causal,
                               scale=scale).astype(q.dtype)
    scores = jnp.matmul(q, kt, preferred_element_type=jnp.float32) * scale
    if causal:
        import numpy as np
        cm = jnp.tril(jnp.ones((s_q, s_k), bool), s_k - s_q)
        scores = jnp.where(cm, scores, np.float32(-1e30))
    if mask is not None:
        scores = scores + mask
    import jax
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.matmul(probs.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
