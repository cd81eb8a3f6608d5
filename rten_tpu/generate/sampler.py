"""Token samplers (reference: rten-generate/src/sampler.rs — ArgMax and
TopK+temperature; TopP added). All sampling runs on device from a jax PRNG
key so jitted decode loops can fuse it."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


class Sampler:
    def sample(self, key, logits):
        """logits: [vocab] or [batch, vocab] → int32 token id(s)."""
        raise NotImplementedError


@dataclass
class ArgMaxSampler(Sampler):
    def sample(self, key, logits):
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)


@dataclass
class TopKSampler(Sampler):
    k: int = 50
    temperature: float = 1.0

    def sample(self, key, logits):
        if self.temperature == 0.0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        values, indices = jax.lax.top_k(logits, self.k)
        values = values / self.temperature
        choice = jax.random.categorical(key, values, axis=-1)
        return jnp.take_along_axis(
            indices, choice[..., None], axis=-1)[..., 0].astype(jnp.int32)


@dataclass
class TopPSampler(Sampler):
    p: float = 0.9
    temperature: float = 1.0

    def sample(self, key, logits):
        if self.temperature == 0.0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        sorted_probs = jax.nn.softmax(sorted_logits / self.temperature,
                                      axis=-1)
        cum = jnp.cumsum(sorted_probs, axis=-1)
        # Keep the smallest prefix with cumulative prob >= p (always keep
        # the first token).
        cutoff_mask = cum - sorted_probs >= self.p
        cutoff_logit = jnp.where(cutoff_mask, -jnp.inf, sorted_logits)
        threshold = jnp.min(
            jnp.where(cutoff_mask, jnp.inf, sorted_logits), axis=-1,
            keepdims=True)
        masked = jnp.where(logits >= threshold, logits / self.temperature,
                           -jnp.inf)
        return jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)
