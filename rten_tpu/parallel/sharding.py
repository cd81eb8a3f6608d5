"""Sharding rules for transformer parameters and KV caches.

Megatron-style tensor parallelism expressed as NamedShardings — XLA/GSPMD
inserts the collectives (all-gather/reduce-scatter/psum over the
``model`` axis, which maps to ICI on a pod slice):

* qkv / up / gate projections: output-feature dim sharded → each device
  computes its own heads / FF slice;
* out / down projections: input-feature dim sharded → XLA emits one psum
  per block;
* embeddings and norms replicated (vocab is small relative to FF);
* KV cache sharded over kv-heads (``model``) and batch (``data``).

Quantized weights: int8 data+scales shard like the dense weight; int4
packed weights stay replicated this round (their 256-column pack tiles
don't line up with arbitrary shard boundaries yet).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.transformer import QuantWeight


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Parameter-name → PartitionSpec for 2-D projection weights.
_COL_SHARDED = {"wq", "wk", "wv", "wqkv", "w_up", "w_gate", "lm_head"}
_ROW_SHARDED = {"wo", "w_down"}
_COL_SHARDED_BIAS = {"bq", "bk", "bv", "bqkv", "b_up"}


def _spec_for(name: str, ndim: int, axes=()) -> P:
    # MoE expert-stacked weights/biases carry a leading expert dim,
    # sharded over the `expert` mesh axis when present (expert
    # parallelism); the per-expert FF dim shards over `model` as in the
    # dense rules, so EP and TP compose.
    ex = "expert" if "expert" in axes else None
    if ndim == 3 and name in _COL_SHARDED:
        return P(ex, None, "model")
    if ndim == 3 and name in _ROW_SHARDED:
        return P(ex, "model", None)
    if ndim == 2 and name == "b_up":
        return P(ex, "model")
    if ndim == 2 and name == "b_down":
        return P(ex, None)
    if name in _COL_SHARDED and ndim == 2:
        return P(None, "model")
    if name in _ROW_SHARDED and ndim == 2:
        return P("model", None)
    if name in _COL_SHARDED_BIAS and ndim == 1:
        return P("model")
    return P()  # router, embeddings, norms: replicated


def _quant_scale_spec(name: str, data_ndim: int, axes=()) -> P:
    ex = "expert" if "expert" in axes else None
    if data_ndim == 3:  # expert stack: scales [E, N]
        return P(ex, "model") if name in _COL_SHARDED else P(ex, None)
    return P("model") if name in _COL_SHARDED else P()


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings matching a TransformerLM parameter tree."""
    axes = mesh.axis_names

    def walk(obj, name=""):
        if isinstance(obj, dict):
            return {k: walk(v, k) for k, v in obj.items()}
        if isinstance(obj, list):
            return [walk(v, name) for v in obj]
        if isinstance(obj, QuantWeight):
            if obj.kind == "int8":
                ndim = np.ndim(obj.data)
                return QuantWeight(
                    obj.kind,
                    NamedSharding(mesh, _spec_for(name, ndim, axes)),
                    NamedSharding(mesh,
                                  _quant_scale_spec(name, ndim, axes)),
                    obj.group, obj.n)
            return QuantWeight(obj.kind, replicated(mesh), replicated(mesh),
                               obj.group, obj.n)
        return NamedSharding(mesh, _spec_for(name, np.ndim(obj), axes))
    return walk(params)


def shard_params(params, mesh: Mesh):
    """device_put the parameter tree per the TP rules."""
    # QuantWeight sharding trees mirror the param tree structure, so a
    # plain tree_map pairs data↔data / scales↔scales leaves.
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings)


def paged_cache_shardings(cache, mesh: Mesh):
    """Sharding for a block-paged cache: the pool's PAGE dim and the
    table/lengths batch dim shard over the batch axes (the
    partition-aware allocator keeps every slot's pages inside its
    shard's page range); the feature dim rides the ``model`` axis like
    the contiguous cache. Lane-grouped scale pages
    (PagedKVCache.create(scale_lane_groups=tp), the paged × TP path)
    shard their lane dim over ``model``; the legacy single-chip layout
    keeps its 128 lanes replicated."""
    from ..generate.paged_cache import PagedKVCache
    batch_axes = (("dcn", "data") if "dcn" in mesh.axis_names
                  else ("data",))
    pools = [NamedSharding(mesh, P(batch_axes, None, None, "model"))
             for _ in cache.pools]
    table = NamedSharding(mesh, P(batch_axes, None))
    lengths = NamedSharding(mesh, P(batch_axes))
    scales = None
    if cache.quant_scales is not None:
        from ..generate.kv_cache import SCALE_LANES
        lane_ax = ("model" if cache.quant_scales[0].shape[-1]
                   != SCALE_LANES else None)
        scales = [NamedSharding(mesh, P(batch_axes, None, None,
                                        lane_ax))
                  for _ in cache.quant_scales]
    return PagedKVCache(pools, table, lengths, cache.page_size,
                        cache.kv_heads, cache.head_dim,
                        quant_scales=scales)


def cache_shardings(cache, mesh: Mesh):
    if getattr(cache, "paged", False):
        return paged_cache_shardings(cache, mesh)
    # Token-major fused layout [B, cap, 2, KVH*D]: batch over the data
    # axis (and the cross-host dcn axis on hybrid meshes — batch is the
    # ONLY thing that crosses DCN), the head-fused last dim over the
    # model axis (aligned with the column-sharded QKV projections that
    # produce it).
    batch_axes = (("dcn", "data") if "dcn" in mesh.axis_names
                  else ("data",))
    # A `seq` mesh axis shards the cache CAPACITY dim — long-context
    # decode where one sequence's KV exceeds a chip's HBM: attention
    # contracts over cap, so GSPMD partitions the QK^T/PV dots across
    # the axis and inserts the online-softmax-equivalent collectives
    # (requires the jnp attention path, use_pallas=False).
    seq_ax = "seq" if "seq" in mesh.axis_names else None
    kv = NamedSharding(mesh, P(batch_axes, seq_ax, None, "model"))
    lengths = NamedSharding(mesh, P(batch_axes))
    from ..generate.kv_cache import KVCache
    scales = None
    if cache.quant_scales is not None:
        # Token-packed int8 cache [B, cap/4, 2, F]: lanes are canonical
        # per-head features (each int32 packs 4 TOKENS of one feature),
        # so the lane dim shards over `model` exactly like the float
        # cache, and the capacity-row dim (dim 1: 4 tokens per row)
        # shards over `seq`; the size-2 K/V plane dim (dim 2) stays
        # replicated. Scale rows [B, cap/2, 1, 128] int32 (two tokens'
        # bf16 scales per word) shard over batch/seq; their 128
        # per-head lanes stay replicated (tiny).
        kv = NamedSharding(mesh, P(batch_axes, seq_ax, None, "model"))
        from ..generate.kv_cache import SCALE_LANES
        lane_grouped = cache.quant_scales[0].shape[-1] != SCALE_LANES
        # TP lane-group layout (KVCache.create(scale_lane_groups=tp),
        # the Pallas-under-mesh path): the [.., tp*128] lane dim shards
        # over `model` so each shard holds a standard single-chip scale
        # row for its local heads. Legacy single-chip layout keeps the
        # 128 lanes replicated (tiny).
        scale_lane_ax = "model" if lane_grouped else None
        scales = [NamedSharding(mesh, P(batch_axes, seq_ax, None,
                                        scale_lane_ax))
                  for _ in cache.quant_scales]
    # Tail write-buffer: single-chip only (the engine disables it under
    # a mesh), but shard_cache must still hand device_put a valid
    # sharding for the replicated tail_count scalar.
    tail = carry = carry_s = None
    if cache.tail is not None:
        tail = [NamedSharding(mesh, P(batch_axes, None, None, "model"))
                for _ in cache.tail]
    if cache.carry is not None:
        # Carry rows are single packed-cache rows: batch over data,
        # head-feature lanes over model (like kv); the scale carry's
        # lane-group dim over model (like quant_scales).
        carry = [NamedSharding(mesh, P(batch_axes, None, None, "model"))
                 for _ in cache.carry]
        carry_s = [NamedSharding(mesh, P(batch_axes, None, None,
                                         scale_lane_ax))
                   for _ in cache.carry_s]
    return KVCache([kv] * cache.n_layers, lengths, scales,
                   cache.kv_heads, cache.head_dim, tail,
                   NamedSharding(mesh, P()), carry, carry_s)


def sequence_parallel(model, mesh: Mesh):
    """Enable sequence/context parallelism on a model: prefill hidden
    states [B, S, D] shard S over the ``seq`` mesh axis (and B over
    ``data``), so long-prompt activation memory and per-layer FLOPs
    split across the axis; GSPMD inserts the K/V all-gathers that causal
    attention needs. Decode (S=1) is untouched. Requires the pure-jnp
    attention path (``use_pallas=False``) so GSPMD can partition it."""
    if "seq" not in mesh.axis_names:
        raise ValueError("mesh needs a 'seq' axis")
    batch = ("dcn", "data") if "dcn" in mesh.axis_names else "data"
    model.activation_sharding = NamedSharding(mesh, P(batch, "seq", None))
    return model


def shard_cache(cache, mesh: Mesh):
    shardings = cache_shardings(cache, mesh)
    import jax.tree_util as jtu
    return jtu.tree_map(lambda x, s: jax.device_put(x, s), cache, shardings)


def flush_tail_island(cache, t: int, mesh: Mesh):
    """Tail write-buffer flush under a mesh: run ``KVCache.flush_tail``
    as a shard_map island — each device flushes its local (batch/data,
    head-features/model) shard with the UNCHANGED single-chip Pallas
    flush kernel (the same per-shard discipline as the decode island,
    models/transformer.py::_attn_island). Per-(token, head) quant scales
    never cross head boundaries and the TP lane-group scale layout keeps
    whole heads per shard, so the local flush is exact."""
    from jax import shard_map
    from ..generate.kv_cache import KVCache

    sizes = dict(mesh.shape)
    tp = sizes.get("model", 1)
    kvh_l = cache.kv_heads // tp
    specs = jax.tree_util.tree_map(lambda s: s.spec,
                                   cache_shardings(cache, mesh))

    def body(kv, lengths, scales, tail, tc, carry, carry_s):
        local = KVCache(kv, lengths, scales, kvh_l, cache.head_dim,
                        tail, tc, carry, carry_s)
        f = local.flush_tail(t)
        return f.kv, f.quant_scales, f.tail_count, f.carry, f.carry_s

    kv, scales, tc, carry, carry_s = shard_map(
        body, mesh=mesh,
        in_specs=(specs.kv, specs.lengths, specs.quant_scales,
                  specs.tail, specs.tail_count, specs.carry,
                  specs.carry_s),
        out_specs=(specs.kv, specs.quant_scales, specs.tail_count,
                   specs.carry, specs.carry_s),
        check_vma=False,
    )(cache.kv, cache.lengths, cache.quant_scales, cache.tail,
      cache.tail_count, cache.carry, cache.carry_s)
    return KVCache(kv, cache.lengths, scales, cache.kv_heads,
                   cache.head_dim, cache.tail, tc, carry, carry_s)
