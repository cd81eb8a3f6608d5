"""Normalization ops: BatchNormalization, InstanceNormalization,
LayerNormalization, Softmax, LogSoftmax.

Reference: ``src/ops/norm.rs``. On TPU these are pure ``jnp`` reduction
expressions — XLA fuses the mean/var/normalize chain; a Pallas fused
softmax for the decode hot path lives in ``rten_tpu.kernels``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import normalize_axis
from .registry import register


@register("BatchNormalization")
def batch_norm(ctx, attrs, x, scale, bias, mean, var):
    eps = float(attrs.get("epsilon", 1e-5))
    # Params are per-channel (axis 1, NCHW).
    shape = [1] * x.ndim
    shape[1] = x.shape[1]
    scale = scale.reshape(shape)
    bias = bias.reshape(shape)
    mean = mean.reshape(shape)
    var = var.reshape(shape)
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean) * inv * scale + bias


@register("InstanceNormalization")
def instance_norm(ctx, attrs, x, scale, bias):
    eps = float(attrs.get("epsilon", 1e-5))
    axes = tuple(range(2, x.ndim))  # spatial dims of NC...
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    shape = [1] * x.ndim
    shape[1] = x.shape[1]
    return ((x - mean) * jax.lax.rsqrt(var + eps) * scale.reshape(shape)
            + bias.reshape(shape))


@register("LayerNormalization")
def layer_norm(ctx, attrs, x, scale, bias=None):
    eps = float(attrs.get("epsilon", 1e-5))
    axis = int(attrs.get("axis", -1))
    if axis < 0:
        axis += x.ndim
    axes = tuple(range(axis, x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + eps) * scale
    if bias is not None:
        out = out + bias
    return out


@register("Softmax")
def softmax(ctx, attrs, x):
    axis = normalize_axis(int(attrs.get("axis", -1)), x.ndim)
    return jax.nn.softmax(x, axis=axis)


@register("LogSoftmax")
def log_softmax(ctx, attrs, x):
    axis = normalize_axis(int(attrs.get("axis", -1)), x.ndim)
    return jax.nn.log_softmax(x, axis=axis)
