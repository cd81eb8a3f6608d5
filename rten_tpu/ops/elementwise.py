"""Unary / binary / variadic elementwise operators.

ONNX-equivalent semantics matching the reference's
``src/ops/unary_elementwise.rs`` / ``binary_elementwise.rs`` /
``variadic_elementwise.rs``. On TPU these all map to single VPU-friendly
XLA HLO ops and fuse into neighboring matmuls — no hand vectorization
(the reference's rten-simd/rten-vecmath layer) is needed.

Conventions: comparisons/logical ops return int32 (the reference coerces
bool→i32 at convert time); integer division truncates toward zero
(Rust i32 semantics, via ``lax.div``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fmt import schema
from .common import as_bool, bool_out
from .registry import register


def _unary(name, fn):
    @register(name)
    def op(ctx, attrs, x):
        return fn(x)
    op.__name__ = name.lower()
    return op


_unary("Abs", jnp.abs)
_unary("Acos", jnp.arccos)
_unary("Asin", jnp.arcsin)
_unary("Atan", jnp.arctan)
_unary("Ceil", jnp.ceil)
_unary("Cos", jnp.cos)
_unary("Erf", jax.lax.erf)
_unary("Exp", jnp.exp)
_unary("Floor", jnp.floor)
_unary("Identity", lambda x: x)
_unary("Log", jnp.log)
_unary("Neg", jnp.negative)
_unary("Relu", lambda x: jnp.maximum(x, 0))
_unary("Round", jnp.round)  # round-half-to-even, same as the ONNX spec
_unary("Sigmoid", jax.nn.sigmoid)
_unary("Sign", jnp.sign)
_unary("Sin", jnp.sin)
_unary("Softplus", lambda x: jax.nn.softplus(x))
_unary("Sqrt", jnp.sqrt)
_unary("Tan", jnp.tan)
_unary("Tanh", jnp.tanh)


@register("Reciprocal")
def reciprocal(ctx, attrs, x):
    return jnp.asarray(1, x.dtype) / x


@register("Not")
def not_(ctx, attrs, x):
    return bool_out(x == 0)


@register("Gelu")
def gelu(ctx, attrs, x):
    # Exact (erf-based) variant, matching the reference (src/ops/mod.rs Gelu).
    return jax.nn.gelu(x, approximate=False)


@register("LeakyRelu")
def leaky_relu(ctx, attrs, x):
    alpha = float(attrs.get("alpha", 0.01))
    return jnp.where(x >= 0, x, alpha * x)


@register("Elu")
def elu(ctx, attrs, x):
    alpha = float(attrs.get("alpha", 1.0))
    return jnp.where(x > 0, x, alpha * jnp.expm1(x))


@register("HardSigmoid")
def hard_sigmoid(ctx, attrs, x):
    alpha = float(attrs.get("alpha", 0.2))
    beta = float(attrs.get("beta", 0.5))
    return jnp.clip(alpha * x + beta, 0.0, 1.0)


@register("HardSwish")
def hard_swish(ctx, attrs, x):
    # x * HardSigmoid(x) with alpha=1/6, beta=0.5 (ONNX spec).
    return x * jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


@register("Clip")
def clip(ctx, attrs, x, min=None, max=None):
    if min is not None:
        x = jnp.maximum(x, min)
    if max is not None:
        x = jnp.minimum(x, max)
    return x


@register("Cast")
def cast(ctx, attrs, x):
    to = int(attrs.get("to", 0))
    name = schema.ENUMS["DataType"][to]
    if name == "Int32":
        return x.astype(jnp.int32)
    return x.astype(jnp.float32)


# -- binary ----------------------------------------------------------------

def _binary(name, fn):
    @register(name)
    def op(ctx, attrs, a, b):
        return fn(a, b)
    op.__name__ = name.lower()
    return op


_binary("Add", jnp.add)
_binary("Sub", jnp.subtract)
_binary("Mul", jnp.multiply)
_binary("Pow", jnp.power)


@register("Div")
def div(ctx, attrs, a, b):
    if jnp.issubdtype(jnp.result_type(a), jnp.integer):
        # Truncating division, matching Rust i32 `/` in the reference.
        a, b = jnp.broadcast_arrays(a, b)
        return jax.lax.div(a, b)
    return jnp.divide(a, b)


@register("Mod")
def mod(ctx, attrs, a, b):
    fmod = bool(attrs.get("fmod", False))
    if fmod:
        # C fmod: result has the sign of the dividend.
        a, b = jnp.broadcast_arrays(a, b)
        return jax.lax.rem(a, b)
    # Python-style modulo: result has the sign of the divisor.
    return jnp.mod(a, b)


def _compare(name, fn):
    @register(name)
    def op(ctx, attrs, a, b):
        return bool_out(fn(a, b))
    op.__name__ = name.lower()
    return op


_compare("Equal", jnp.equal)
_compare("Greater", jnp.greater)
_compare("GreaterOrEqual", jnp.greater_equal)
_compare("Less", jnp.less)
_compare("LessOrEqual", jnp.less_equal)


def _logical(name, fn):
    @register(name)
    def op(ctx, attrs, a, b):
        return bool_out(fn(as_bool(a), as_bool(b)))
    op.__name__ = name.lower()
    return op


_logical("And", jnp.logical_and)
_logical("Or", jnp.logical_or)
_logical("Xor", jnp.logical_xor)


@register("Where")
def where(ctx, attrs, cond, x, y):
    return jnp.where(as_bool(cond), x, y)


# -- variadic --------------------------------------------------------------

@register("Max")
def max_(ctx, attrs, *xs):
    out = xs[0]
    for x in xs[1:]:
        out = jnp.maximum(out, x)
    return out


@register("Min")
def min_(ctx, attrs, *xs):
    out = xs[0]
    for x in xs[1:]:
        out = jnp.minimum(out, x)
    return out


@register("Sum")
def sum_(ctx, attrs, *xs):
    out = xs[0]
    for x in xs[1:]:
        out = jnp.add(out, x)
    return out


@register("Mean")
def mean(ctx, attrs, *xs):
    out = xs[0]
    for x in xs[1:]:
        out = jnp.add(out, x)
    return out / len(xs)
