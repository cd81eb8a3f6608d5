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


@dataclass(frozen=True)
class SamplingParams:
    """Per-request sampling knobs (carried as runtime DATA through one
    compiled decode program — see PerRequestSampler)."""
    temperature: float = 1.0
    top_k: int = 0       # 0 = no top-k cut
    top_p: float = 1.0   # 1 = no nucleus cut

    GREEDY = None  # set below


SamplingParams.GREEDY = SamplingParams(temperature=0.0)


@dataclass
class PerRequestSampler(Sampler):
    """Vectorized sampler whose temperature/top-k/top-p are PER-ROW
    runtime inputs, so a continuous batch mixes greedy and stochastic
    requests in ONE compiled decode program (no per-request recompiles —
    the serving analog of the reference's per-Generator sampler choice,
    rten-generate/src/sampler.rs).

    Candidates are each row's top ``max_k`` logits: exact for
    ``top_k <= max_k``; top-p nucleus is computed within those
    candidates (exact whenever the nucleus fits in ``max_k``, i.e.
    except for near-uniform tails). ``temperature <= 0`` → greedy.
    """

    max_k: int = 64

    def sample(self, key, logits, temps, top_ks, top_ps):
        """logits [B, V]; temps/top_ks/top_ps [B] → int32 tokens [B]."""
        k_eff = jnp.where(top_ks <= 0, self.max_k,
                          jnp.minimum(top_ks, self.max_k))
        values, indices = jax.lax.top_k(logits, self.max_k)  # desc
        ranks = jnp.arange(self.max_k)[None, :]
        mask_k = ranks < k_eff[:, None]
        scaled = values / jnp.maximum(temps, 1e-6)[:, None]
        probs = jax.nn.softmax(jnp.where(mask_k, scaled, -jnp.inf), axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Smallest prefix whose mass reaches top_p (first always kept).
        mask_p = (cum - probs) < top_ps[:, None]
        final = jnp.where(mask_k & mask_p, scaled, -jnp.inf)
        choice = jax.random.categorical(key, final, axis=-1)
        sampled = jnp.take_along_axis(indices, choice[:, None],
                                      axis=-1)[:, 0]
        greedy = indices[:, 0]
        return jnp.where(temps <= 0.0, greedy, sampled).astype(jnp.int32)
