"""Pipeline parallelism: GPipe-style microbatch pipelining of the
transformer layer stack over a ``pipe`` mesh axis.

The reference is single-process CPU with no model partitioning
(SURVEY.md §2.3); this is the TPU-native design for models whose weights
exceed one chip's HBM: layers are stage-partitioned over the ``pipe``
axis and microbatches flow stage-to-stage over ICI via
:func:`jax.lax.ppermute` inside a partial-manual :func:`jax.shard_map`
(manual over ``pipe`` only — GSPMD still handles the ``data``/``model``/
``expert`` axes inside each stage, so PP composes with TP/DP/EP).

Mechanics (forward-only inference pipeline):

* layer params are stacked ``[L, ...]`` and sharded ``P('pipe', ...)`` —
  each stage holds ``L/P`` contiguous layers, run with ``lax.scan``;
* the stacked KV cache ``[L, B, cap, 2, F]`` shards the same way, so a
  stage owns exactly its layers' cache;
* a rotation schedule of ``M + P - 1`` ticks: stage 0 injects microbatch
  ``t``, stage ``s`` works on microbatch ``t - s`` (bubble ticks compute
  garbage that is masked out of cache writes and outputs), activations
  advance one stage per tick via ``ppermute``;
* embedding and LM head run outside the shard_map region (replicated /
  GSPMD-sharded — they are a tiny fraction of the FLOPs).

Throughput efficiency is ``M / (M + P - 1)``; pick ``microbatches >> P``
for prefill. Decode steps pipeline the same way with S=1.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..generate.kv_cache import KVCache
from ..models.transformer import (TransformerLM, _norm,
                                  stack_layer_params)
from .sharding import _spec_for, _quant_scale_spec
from ..models.transformer import QuantWeight


def stacked_layer_shardings(layers, mesh: Mesh):
    """NamedShardings for a stacked layer pytree: leading layer dim over
    ``pipe``, per-layer dims per the TP rules (sharding.py)."""
    axes = mesh.axis_names

    def walk(obj, name=""):
        if isinstance(obj, dict):
            return {k: walk(v, k) for k, v in obj.items()}
        if isinstance(obj, QuantWeight):
            d_spec = _spec_for(name, jnp.ndim(obj.data) - 1, axes)
            s_spec = _quant_scale_spec(name, jnp.ndim(obj.data) - 1, axes)
            return QuantWeight(
                obj.kind, NamedSharding(mesh, P("pipe", *d_spec)),
                NamedSharding(mesh, P("pipe", *s_spec)), obj.group, obj.n)
        spec = _spec_for(name, jnp.ndim(obj) - 1, axes)
        return NamedSharding(mesh, P("pipe", *spec))
    return walk(layers)


class PipelinedLM:
    """Pipeline-parallel wrapper around a :class:`TransformerLM`.

    ``prefill`` / ``decode_step`` mirror the base model's serving entry
    points; parameters must be prepared with :meth:`shard_params` and the
    cache with :meth:`shard_cache` (stacked layouts, pipe-sharded layer
    dim)."""

    def __init__(self, model: TransformerLM, mesh: Mesh,
                 microbatches: int = 4):
        if "pipe" not in mesh.axis_names:
            raise ValueError("mesh needs a 'pipe' axis")
        self.model = model
        self.config = model.config
        self.mesh = mesh
        self.stages = mesh.shape["pipe"]
        self.microbatches = microbatches
        if model.config.n_layers % self.stages:
            raise ValueError(
                f"{model.config.n_layers} layers not divisible by "
                f"{self.stages} pipeline stages")

    # -- parameter / cache prep --------------------------------------------

    def shard_params(self, params):
        """Stack per-layer params and device_put: layer dim over ``pipe``,
        the rest per the TP rules; non-layer params replicated over pipe."""
        from .sharding import param_shardings
        params = dict(params)
        layers = params.pop("layers")
        if isinstance(layers, list):
            layers = stack_layer_params(layers)
        rest_shardings = param_shardings(params, self.mesh)
        rest = jax.tree_util.tree_map(jax.device_put, params,
                                      rest_shardings)
        lsh = stacked_layer_shardings(layers, self.mesh)
        rest["layers"] = jax.tree_util.tree_map(jax.device_put, layers,
                                                lsh)
        return rest

    def new_cache(self, batch, capacity=None, cache_dtype=None):
        cfg = self.config
        dtype = jnp.dtype(cache_dtype) if cache_dtype else (
            jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32)
        cache = KVCache.create(batch, cfg.n_layers, cfg.n_kv_heads,
                               capacity or cfg.max_seq_len, cfg.head_dim,
                               dtype=dtype, stacked=True)
        kv = jax.device_put(cache.kv, NamedSharding(
            self.mesh, P("pipe", "data", None, None, None)))
        lengths = jax.device_put(cache.lengths,
                                 NamedSharding(self.mesh, P("data")))
        return KVCache(kv, lengths, None, cache.kv_heads, cache.head_dim)

    # -- the pipelined layer stack ------------------------------------------

    def _stage_body(self, layers_local, x, positions, lengths_mb, kv_mb):
        """Run this stage's layers on one microbatch. kv_mb:
        [Lp, mb, cap, 2, F]."""
        cfg = self.config
        model = self.model
        cache = KVCache(kv_mb, lengths_mb, None, kv_mb.shape[-1] //
                        cfg.head_dim, cfg.head_dim)
        n_local = jax.tree_util.tree_leaves(layers_local)[0].shape[0]

        def body(carry, xs):
            x, cache = carry
            layer, idx = xs
            attn_in = _norm(cfg, x, layer["ln1_scale"],
                            layer.get("ln1_bias"))
            attn_out, cache = model._attention(layer, attn_in, positions,
                                               cache, idx, None)
            x = x + attn_out
            mlp_in = _norm(cfg, x, layer["ln2_scale"],
                           layer.get("ln2_bias"))
            x = x + model._mlp(layer, mlp_in)
            return (x, cache), None

        (x, cache), _ = lax.scan(body, (x, cache),
                                 (layers_local, jnp.arange(n_local)))
        return x, cache.kv

    def _pipeline(self, layers, x, lengths, kv):
        """shard_map region: x [B, S, d] → y [B, S, d]; kv advanced.
        Manual over 'pipe' only."""
        M = self.microbatches
        Pn = self.stages
        B, S, d = x.shape
        mb = B // M

        def stage_fn(layers_local, x_all, lengths, kv_local):
            s = lax.axis_index("pipe")
            x_mb = x_all.reshape(M, mb, S, d)
            state = jnp.zeros((mb, S, d), x.dtype)
            outs = jnp.zeros((M, mb, S, d), jnp.float32)

            for t in range(M + Pn - 1):
                if t < M:
                    state = jnp.where(s == 0, x_mb[t], state)
                m = t - s                      # this stage's microbatch id
                valid = (m >= 0) & (m < M)
                m_c = jnp.clip(m, 0, M - 1)
                lengths_mb = lax.dynamic_slice_in_dim(lengths, m_c * mb,
                                                      mb, 0)
                kv_mb = lax.dynamic_slice_in_dim(kv_local, m_c * mb, mb, 1)
                if S == 1:
                    positions = lengths_mb[:, None]
                else:
                    positions = jnp.broadcast_to(
                        jnp.arange(S)[None, :] + lengths_mb[:, None],
                        (mb, S))
                new_state, new_kv_mb = self._stage_body(
                    layers_local, state, positions, lengths_mb, kv_mb)
                state = jnp.where(valid, new_state, state)
                kv_mb = jnp.where(valid, new_kv_mb, kv_mb)
                kv_local = lax.dynamic_update_slice_in_dim(
                    kv_local, kv_mb, m_c * mb, 1)
                # Last stage banks finished microbatches.
                is_out = valid & (s == Pn - 1)
                cur = lax.dynamic_index_in_dim(outs, m_c, 0,
                                               keepdims=False)
                outs = lax.dynamic_update_index_in_dim(
                    outs, jnp.where(is_out, state.astype(jnp.float32),
                                    cur), m_c, 0)
                state = lax.ppermute(
                    state, "pipe",
                    [(i, (i + 1) % Pn) for i in range(Pn)])

            # Only the last stage wrote outs; broadcast to every stage.
            outs = lax.psum(outs, "pipe")
            return outs.reshape(B, S, d).astype(x.dtype), kv_local

        fn = jax.shard_map(
            stage_fn, mesh=self.mesh, axis_names={"pipe"},
            in_specs=(jax.tree_util.tree_map(lambda _: P("pipe"), layers),
                      P(), P(), P("pipe")),
            out_specs=(P(), P("pipe")), check_vma=False)
        # Partial-manual shard_map (manual over `pipe`, GSPMD for the
        # rest) only traces under jit; this inlines into outer jits.
        return jax.jit(fn)(layers, x, lengths, kv)

    # -- serving entry points ------------------------------------------------

    def forward(self, params, tokens, cache):
        cfg = self.config
        b, s = tokens.shape
        if s == 1:
            positions = cache.lengths[:, None]
        else:
            positions = jnp.broadcast_to(
                jnp.arange(s)[None, :] + cache.lengths[:, None], (b, s))
        x = jnp.take(params["embed"], tokens, axis=0)
        if cfg.pos == "learned":
            x = x + jnp.take(params["pos_embed"], positions, axis=0)
        x = x.astype(jnp.bfloat16 if cfg.dtype == "bfloat16"
                     else jnp.float32)

        x, kv = self._pipeline(params["layers"], x, cache.lengths,
                               cache.kv)
        cache = KVCache(kv, cache.lengths + s, None, cache.kv_heads,
                        cache.head_dim)

        x = _norm(cfg, x, params["ln_f_scale"], params.get("ln_f_bias"))
        if cfg.tie_embeddings and "lm_head" not in params:
            logits = jnp.matmul(x, params["embed"].T.astype(x.dtype),
                                preferred_element_type=jnp.float32)
        else:
            from ..models.transformer import linear
            logits = linear(x, params["lm_head"])
        return logits.astype(jnp.float32), cache

    def prefill(self, params, tokens, cache):
        return self.forward(params, tokens, cache)

    def decode_step(self, params, tokens, cache):
        logits, cache = self.forward(params, tokens[:, None], cache)
        return logits[:, 0], cache
