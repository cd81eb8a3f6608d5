"""Value-generating ops: ConstantOfShape, Range, OneHot lives in gather,
Random* ops.

Reference: ``src/ops/generate.rs``, ``src/ops/random.rs``. Random ops use
JAX's explicit-key PRNG via ``ctx.rng()`` — bitwise parity with the
reference's ``fastrand`` streams is not possible (nor required; the
reference documents random ops as nondeterministic across backends).
``Range`` produces a *static* numpy value: its output shape is
value-dependent, so it must fold at trace time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .common import static_ints
from .registry import register


@register("ConstantOfShape", static=(0,))
def constant_of_shape(ctx, attrs, shape):
    dims = static_ints(shape)
    value = attrs.get("value")
    if value is None:
        return jnp.zeros(dims, jnp.float32)
    member, payload = value
    v = payload["value"]
    dtype = jnp.int32 if member == "IntScalar" else jnp.float32
    return jnp.full(dims, v, dtype)


@register("Range", static=(0, 1, 2))
def range_(ctx, attrs, start, limit, delta):
    start, limit, delta = (np.asarray(v).reshape(()) for v in (start, limit, delta))
    out = np.arange(start, limit, delta)
    if out.dtype == np.int64:
        out = out.astype(np.int32)
    elif out.dtype == np.float64:
        out = out.astype(np.float32)
    return out


def _key(ctx, attrs):
    seed = attrs.get("seed")
    if seed is not None:
        return jax.random.PRNGKey(np.float32(seed).view(np.int32).item())
    return ctx.rng()


@register("RandomUniform", random=True)
def random_uniform(ctx, attrs):
    shape = static_ints(attrs.get("shape"))
    low = float(attrs.get("low", 0.0))
    high = float(attrs.get("high", 1.0))
    return jax.random.uniform(_key(ctx, attrs), shape, jnp.float32, low, high)


@register("RandomUniformLike", random=True)
def random_uniform_like(ctx, attrs, x):
    low = float(attrs.get("low", 0.0))
    high = float(attrs.get("high", 1.0))
    return jax.random.uniform(_key(ctx, attrs), x.shape, jnp.float32, low, high)


@register("RandomNormal", random=True)
def random_normal(ctx, attrs):
    shape = static_ints(attrs.get("shape"))
    mean = float(attrs.get("mean", 0.0))
    scale = float(attrs.get("scale", 1.0))
    return mean + scale * jax.random.normal(_key(ctx, attrs), shape, jnp.float32)


@register("RandomNormalLike", random=True)
def random_normal_like(ctx, attrs, x):
    mean = float(attrs.get("mean", 0.0))
    scale = float(attrs.get("scale", 1.0))
    return mean + scale * jax.random.normal(_key(ctx, attrs), x.shape, jnp.float32)
