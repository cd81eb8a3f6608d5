"""Preallocated KV cache.

The reference amortizes cache growth with ``NdTensor::with_capacity`` +
in-place ``append`` (rten-tensor/src/tensor.rs:1110,830; ownership
transfer in generator.rs:507-521). Under XLA, in-place growth becomes:
fixed-capacity arrays + ``lax.dynamic_update_slice`` + buffer donation —
the donated cache aliases its output, so each decode step updates HBM in
place with no copy.

Layout: per layer, K and V are [batch, kv_heads, capacity, head_dim].
``lengths`` [batch] tracks per-sequence fill (enables continuous
batching, where sequences in a batch are at different positions).
Optional int8 quantized storage halves/quarters cache bandwidth.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _quantize_tokens(x):
    """Per-(token, head) symmetric int8: scale = absmax/127 over head_dim."""
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(x / scale), -127, 127)
    return q, scale


@jax.tree_util.register_pytree_node_class
@dataclass
class KVCache:
    keys: list        # per layer [B, KVH, cap, D]
    values: list      # per layer [B, KVH, cap, D]
    lengths: object   # [B] int32
    quant_scales: list | None = None   # per layer (k_scales, v_scales) or None

    # -- pytree plumbing (so caches flow through jit/donation) -------------

    def tree_flatten(self):
        return ((self.keys, self.values, self.lengths, self.quant_scales),
                None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- construction ------------------------------------------------------

    @staticmethod
    def create(batch, n_layers, kv_heads, capacity, head_dim,
               dtype=jnp.float32, quantized=False, stacked=False):
        """``stacked=True`` holds all layers in single [L, B, KVH, cap, D]
        arrays (required for `lax.scan` over layers, where the layer index
        is traced); the default is one array per layer."""
        shape = (batch, kv_heads, capacity, head_dim)
        store_dtype = jnp.int8 if quantized else dtype
        if stacked:
            keys = jnp.zeros((n_layers, *shape), store_dtype)
            values = jnp.zeros((n_layers, *shape), store_dtype)
        else:
            keys = [jnp.zeros(shape, store_dtype) for _ in range(n_layers)]
            values = [jnp.zeros(shape, store_dtype)
                      for _ in range(n_layers)]
        scales = None
        if quantized:
            assert not stacked, "quantized+stacked not supported yet"
            sshape = (batch, kv_heads, capacity, 1)
            scales = [(jnp.ones(sshape, jnp.float32),
                       jnp.ones(sshape, jnp.float32))
                      for _ in range(n_layers)]
        return KVCache(keys, values, jnp.zeros(batch, jnp.int32), scales)

    @property
    def stacked(self):
        return not isinstance(self.keys, list)

    @property
    def capacity(self):
        if self.stacked:
            return self.keys.shape[3]
        return self.keys[0].shape[2]

    @property
    def n_layers(self):
        if self.stacked:
            return self.keys.shape[0]
        return len(self.keys)

    # -- updates -----------------------------------------------------------

    def append(self, layer, k_new, v_new, position=None):
        """Write k/v [B, KVH, T, D] into the cache.

        ``position``: scalar → same offset for every sequence (prefill);
        None → per-sequence offsets from ``self.lengths`` (decode under
        continuous batching, where sequences sit at different depths).

        Returns a new KVCache (same buffers aliased via donation under jit).
        """
        if self.stacked:
            # Stacked layout: ``layer`` may be a traced index (scan body).
            if position is None:
                def upd(buf_l, new, pos):
                    return jax.lax.dynamic_update_slice(buf_l, new,
                                                        (0, pos, 0))

                def write(buf, new):
                    layer_buf = jax.lax.dynamic_index_in_dim(
                        buf, layer, 0, keepdims=False)
                    updated = jax.vmap(upd)(layer_buf,
                                            new.astype(buf.dtype),
                                            self.lengths)
                    return jax.lax.dynamic_update_index_in_dim(
                        buf, updated, layer, 0)
            else:
                def write(buf, new):
                    return jax.lax.dynamic_update_slice(
                        buf, new[None].astype(buf.dtype),
                        (layer, 0, 0, position, 0))
            return KVCache(write(self.keys, k_new),
                           write(self.values, v_new), self.lengths,
                           self.quant_scales)
        if position is None:
            def upd(buf, new, pos):
                return jax.lax.dynamic_update_slice(buf, new, (0, pos, 0))
            write = lambda buf, new: jax.vmap(upd)(
                buf, new.astype(buf.dtype), self.lengths)
        else:
            write = lambda buf, new: jax.lax.dynamic_update_slice(
                buf, new.astype(buf.dtype), (0, 0, position, 0))
        scales = self.quant_scales
        if scales is not None:
            k_new, k_scale = _quantize_tokens(k_new)
            v_new, v_scale = _quantize_tokens(v_new)
            ks, vs = scales[layer]
            scales = list(scales)
            scales[layer] = (write(ks, k_scale), write(vs, v_scale))
        keys = list(self.keys)
        values = list(self.values)
        keys[layer] = write(self.keys[layer], k_new)
        values[layer] = write(self.values[layer], v_new)
        return KVCache(keys, values, self.lengths, scales)

    def insert_sequence(self, other: "KVCache", slot, length, src_slot=0):
        """Copy sequence ``src_slot`` of ``other`` into batch slot
        ``slot`` — the continuous-batching admission primitive: a freshly
        prefilled request takes over a finished sequence's slot (batched
        admission prefills several prompts at once and scatters them)."""
        if self.stacked:
            src_k = jax.lax.dynamic_slice_in_dim(other.keys, src_slot, 1, 1)
            src_v = jax.lax.dynamic_slice_in_dim(other.values, src_slot, 1,
                                                 1)
            keys = jax.lax.dynamic_update_slice(
                self.keys, src_k.astype(self.keys.dtype), (0, slot, 0, 0, 0))
            values = jax.lax.dynamic_update_slice(
                self.values, src_v.astype(self.values.dtype),
                (0, slot, 0, 0, 0))
            lengths = self.lengths.at[slot].set(length)
            return KVCache(keys, values, lengths, self.quant_scales)

        def pick(src):
            return jax.lax.dynamic_slice_in_dim(src, src_slot, 1, 0)

        keys = [jax.lax.dynamic_update_slice(
                    buf, pick(src).astype(buf.dtype), (slot, 0, 0, 0))
                for buf, src in zip(self.keys, other.keys)]
        values = [jax.lax.dynamic_update_slice(
                      buf, pick(src).astype(buf.dtype), (slot, 0, 0, 0))
                  for buf, src in zip(self.values, other.values)]
        scales = self.quant_scales
        if scales is not None:
            scales = [
                (jax.lax.dynamic_update_slice(ks, pick(oks),
                                              (slot, 0, 0, 0)),
                 jax.lax.dynamic_update_slice(vs, pick(ovs),
                                              (slot, 0, 0, 0)))
                for (ks, vs), (oks, ovs) in zip(scales, other.quant_scales)]
        lengths = self.lengths.at[slot].set(length)
        return KVCache(keys, values, lengths, scales)

    def advance(self, n):
        return KVCache(self.keys, self.values, self.lengths + n,
                       self.quant_scales)

    def layer_kv(self, layer):
        """Dequantized K/V for attention (f32). ``layer`` may be traced
        in stacked mode."""
        if self.stacked:
            k = jax.lax.dynamic_index_in_dim(self.keys, layer, 0,
                                             keepdims=False)
            v = jax.lax.dynamic_index_in_dim(self.values, layer, 0,
                                             keepdims=False)
            return k, v
        k, v = self.keys[layer], self.values[layer]
        if self.quant_scales is not None:
            ks, vs = self.quant_scales[layer]
            k = k.astype(jnp.float32) * ks
            v = v.astype(jnp.float32) * vs
        return k, v
