"""Ring-overlapped tensor-parallel decode step (SURVEY §2.3's
"all-gather/reduce-scatter overlapped with matmul" row, made
load-bearing).

GSPMD's default TP decode lowers every row-sharded projection to
``dot → all-reduce``: the collective sits on the critical path after
the whole contraction. Here the decode step runs as ONE ``shard_map``
over the (data, model) mesh in sequence-parallel form:

* activations between projections live SCATTERED — ``[B/(dp·tp), d]``
  token shards (norms and residual adds are per-token, so they run on
  the shard);
* every column-sharded projection (qkv, MLP up/gate) consumes the
  scattered stream through :func:`ring_all_gather_matmul` — the
  all-gather's per-chunk ppermutes ride under the chunk matmuls;
* every row-sharded projection (wo, MLP down) produces the scattered
  stream through :func:`ring_matmul_reduce_scatter` — the reduction
  travels the ring while the next chunk's partial product runs on the
  MXU.

The step's HLO therefore contains NO all-reduce/all-gather ops — only
collective-permutes (pinned by tests/test_collectives.py). This is the
TPU analog of the reference running its thread pool INSIDE the GEMM
(/root/reference/src/gemm.rs:818-837): the parallel substrate lives in
the kernel, not beside it.

The LM head stays OUTSIDE the island under plain GSPMD: its vocab dim
(e.g. 50257) is not evenly divisible by the model axis, which shard_map
requires — and its cost is identical either way (the overlap lever is
the per-layer projection chain).

Enabled via ``ServingEngine(..., overlap=True)`` or ``model.overlap =
True`` with ``model.mesh`` set. Decode (S == 1) only; prefill keeps the
GSPMD path (its big matmuls amortize the bare collectives).

Round 5: the bf16 tail write-buffer (the single-chip headline serving
mechanism, +17%/+24% in its regime) composes with the ring island —
``attend`` appends into / flat-kernel-reads the sharded window exactly
like ``TransformerLM._attn_island``, and flushes keep running as
``flush_tail_island``. On a mesh you no longer choose between the
overlapped collectives and the tail fast path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .overlap import (ring_all_gather, ring_all_gather_matmul,
                      ring_matmul_reduce_scatter)


def _check_supported(model, cache, batch):
    cfg = model.config
    mesh = model.mesh
    sizes = dict(mesh.shape)
    bad = [ax for ax, n in sizes.items()
           if n > 1 and ax not in ("data", "model", "dcn")]
    if bad:
        raise ValueError(f"overlap decode: unsupported mesh axes {bad}")
    if sizes.get("model", 1) == 1:
        raise ValueError("overlap decode needs a model axis of size > 1")
    tp = sizes.get("model", 1)
    dp = sizes.get("data", 1) * sizes.get("dcn", 1)
    if cfg.n_experts:
        raise ValueError("overlap decode: MoE layers unsupported")
    if cfg.scan_layers or (cache is not None and cache.stacked):
        raise ValueError("overlap decode: scan_layers unsupported")
    if getattr(cache, "paged", False):
        raise ValueError("overlap decode: paged caches unsupported")
    if getattr(cache, "tail", None) is not None:
        # Tail write-buffer × overlap (round-5 verdict item 3): the
        # local window appends + flat-kernel tail reads run inside the
        # island exactly like _attn_island; flushes stay their own
        # island (flush_tail_island). Only the flat kernel reads the
        # window, so the per-shard shapes must support it — the
        # engine's tail_shape_ok gates the same conditions.
        from ..models.transformer import flat_group_for
        kvh_l_d = (cfg.n_kv_heads // tp) * cfg.head_dim
        if (cache.quant_scales is None or not cfg.use_pallas
                or kvh_l_d % 128
                or not flat_group_for(batch // dp)):
            raise ValueError(
                "overlap decode: tail write-buffer needs the per-shard "
                "flat-kernel configuration (quantized cache, "
                "use_pallas, 128-lane local features, a viable group)")
    if cfg.n_heads % tp or cfg.n_kv_heads % tp:
        raise ValueError("overlap decode: heads must divide model axis")
    if batch % (dp * tp):
        raise ValueError(
            f"overlap decode: batch {batch} must divide dp*tp {dp * tp} "
            "(sequence-parallel scattered residuals)")
    return tp, dp


def decode_step_overlap(model, params, tokens, cache):
    """Drop-in for ``TransformerLM.decode_step`` under ``model.mesh``
    with ring-overlapped TP projections. tokens: [B] int32. Returns
    (logits [B, V] f32, advanced cache)."""
    from ..models.transformer import _norm, _rope, _pallas_decode_attn, \
        linear
    from ..generate.kv_cache import KVCache, SCALE_LANES
    from .sharding import param_shardings
    from jax import shard_map

    cfg = model.config
    mesh = model.mesh
    b = tokens.shape[0]
    tp, dp = _check_supported(model, cache, b)
    batch_ax = tuple(a for a in ("dcn", "data")
                     if a in mesh.axis_names) or None
    # Scattered-token sharding: batch axes major, model axis minor —
    # the same order ring_matmul_reduce_scatter scatters chunks in.
    scat_ax = tuple(batch_ax or ()) + ("model",)
    h, kvh, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    h_l, kvh_l = h // tp, kvh // tp
    quant = cache.quant_scales is not None
    if quant and cache.quant_scales[0].shape[-1] != tp * SCALE_LANES:
        raise ValueError(
            "overlap decode: quantized cache needs the TP lane-group "
            "scale layout (create it via model.new_cache with "
            "model.mesh set)")
    c = b // (dp * tp)          # scattered tokens per shard
    bidir = c % 2 == 0
    # Per-shard Pallas eligibility mirrors _use_attn_island.
    use_pallas = cfg.use_pallas and (kvh_l * hd) % 128 == 0

    # The LM head stays outside the island (vocab rarely divides tp);
    # everything else enters the shard_map with its TP sharding spec.
    island_params = {k: v for k, v in params.items() if k != "lm_head"}
    from ..models.transformer import QuantWeight
    for leaf in jax.tree_util.tree_leaves(
            island_params,
            is_leaf=lambda x: isinstance(x, QuantWeight)):
        if isinstance(leaf, QuantWeight) and leaf.kind == "int4":
            # int4 packed weights stay replicated under TP (sharding.py)
            # — a replicated weight inside the island would compute full
            # output columns where local ones are expected.
            raise ValueError("overlap decode: int4 weights unsupported")
    pspecs = jax.tree_util.tree_map(
        lambda s: s.spec, param_shardings(island_params, mesh))

    buf_spec = P(batch_ax, None, None, "model")
    sbuf_spec = buf_spec if quant else P()
    has_tail = getattr(cache, "tail", None) is not None
    tail_spec = buf_spec if has_tail else P()
    dummy = jnp.zeros((), jnp.int32)

    def attend(q3, k3, v3, lens_l, buf_l, sbuf_l, tail_l, tc):
        """Append + attention on the local (batch, heads) shard — the
        same per-shard kernels as TransformerLM._attn_island. With a
        tail write-buffer the append is one dense bf16 window write and
        the flat kernel reads the window as its extra round."""
        local = KVCache([buf_l], lens_l,
                        [sbuf_l] if quant else None, kvh_l, hd,
                        [tail_l] if has_tail else None, tc)
        local = local.append(0, k3[:, :, None, :], v3[:, :, None, :],
                             position=None)
        if use_pallas:
            out3 = _pallas_decode_attn(cfg, q3, local, 0, kvh_l)
        else:
            from ..kernels.attention import _attn_reference
            import math
            kc, vc = local.layer_kv(0)
            if kvh_l != h_l:
                kc = jnp.repeat(kc, h_l // kvh_l, axis=1)
                vc = jnp.repeat(vc, h_l // kvh_l, axis=1)
            out3 = _attn_reference(q3[:, :, None, :], kc, vc, False,
                                   1.0 / math.sqrt(hd),
                                   local.lengths + 1)[:, :, 0]
        return out3.astype(q3.dtype), local.kv[0], (
            local.quant_scales[0] if quant else dummy), (
            local.tail[0] if has_tail else dummy)

    def body(prms, tok_scat, lens_l, bufs, sbufs, tails, tc):
        mi = jax.lax.axis_index("model")
        pos_scat = jax.lax.dynamic_slice_in_dim(lens_l, mi * c, c, 0)
        x = jnp.take(prms["embed"], tok_scat, axis=0)       # [c, d]
        if cfg.pos == "learned":
            x = x + jnp.take(prms["pos_embed"], pos_scat, axis=0)
        x = x.astype(jnp.bfloat16 if cfg.dtype == "bfloat16"
                     else jnp.float32)
        pos = lens_l[:, None]                               # [B_dp, 1]
        new_bufs, new_sbufs, new_tails = [], [], []
        for li, layer in enumerate(prms["layers"]):
            ln1 = _norm(cfg, x, layer["ln1_scale"],
                        layer.get("ln1_bias"))
            # The fused wqkv's column sharding is a CONTIGUOUS [q|k|v]
            # split — a shard's local columns are not its own heads.
            # The ring matmul keeps the weight TP-local; the tiny qkv
            # activation is then realigned with a permute-decomposed
            # gather and per-shard head slices (bias added while still
            # column-aligned).
            qkv = ring_all_gather_matmul(
                ln1, None, "model", bidirectional=bidir,
                mm=lambda rows, w=layer["wqkv"]: linear(rows, w))
            if "bqkv" in layer:
                qkv = qkv + layer["bqkv"]
            qkv = ring_all_gather(qkv.astype(x.dtype), "model")
            bd = qkv.shape[0]
            q3 = jax.lax.dynamic_slice(
                qkv, (0, mi * h_l * hd), (bd, h_l * hd)
            ).reshape(-1, h_l, hd)
            k3 = jax.lax.dynamic_slice(
                qkv, (0, h * hd + mi * kvh_l * hd), (bd, kvh_l * hd)
            ).reshape(-1, kvh_l, hd)
            v3 = jax.lax.dynamic_slice(
                qkv, (0, (h + kvh) * hd + mi * kvh_l * hd),
                (bd, kvh_l * hd)).reshape(-1, kvh_l, hd)
            if cfg.pos == "rope":
                q3 = _rope(q3[:, :, None, :], pos, cfg.rope_theta)[:, :, 0]
                k3 = _rope(k3[:, :, None, :], pos, cfg.rope_theta)[:, :, 0]
            out3, nbuf, nsbuf, ntail = attend(q3, k3, v3, lens_l,
                                              bufs[li], sbufs[li],
                                              tails[li], tc)
            new_bufs.append(nbuf)
            new_sbufs.append(nsbuf)
            new_tails.append(ntail)
            attn_scat = ring_matmul_reduce_scatter(
                out3.reshape(-1, h_l * hd), None, "model",
                bidirectional=False,
                mm=lambda rows, w=layer["wo"]: linear(rows, w))
            if "bo" in layer:
                attn_scat = attn_scat + layer["bo"]
            x = x + attn_scat.astype(x.dtype)
            ln2 = _norm(cfg, x, layer["ln2_scale"],
                        layer.get("ln2_bias"))
            if cfg.act == "swiglu":
                # One ring gathers ln2 once; each chunk matmuls BOTH
                # column-sharded weights (gate|up stacked on the output
                # dim) so the gather's bytes are paid once.
                def up_mm(rows, wg=layer["w_gate"], wu=layer["w_up"]):
                    return jnp.concatenate(
                        [linear(rows, wg), linear(rows, wu)], axis=-1)
                both = ring_all_gather_matmul(ln2, None, "model",
                                              bidirectional=bidir,
                                              mm=up_mm)
                dff_l = both.shape[-1] // 2
                hidden = jax.nn.silu(both[:, :dff_l]) * both[:, dff_l:]
            else:
                hidden = ring_all_gather_matmul(
                    ln2, None, "model", bidirectional=bidir,
                    mm=lambda rows, w=layer["w_up"]: linear(rows, w))
                if "b_up" in layer:
                    hidden = hidden + layer["b_up"]
                hidden = jax.nn.gelu(hidden, approximate=False)
            mlp_scat = ring_matmul_reduce_scatter(
                hidden.astype(x.dtype), None, "model",
                bidirectional=False,
                mm=lambda rows, w=layer["w_down"]: linear(rows, w))
            if "b_down" in layer:
                mlp_scat = mlp_scat + layer["b_down"]
            x = x + mlp_scat.astype(x.dtype)
        x = _norm(cfg, x, prms["ln_f_scale"], prms.get("ln_f_bias"))
        return x, new_bufs, new_sbufs, new_tails

    x_scat, new_bufs, new_sbufs, new_tails = shard_map(
        body, mesh=mesh,
        in_specs=(pspecs, P(scat_ax), P(batch_ax),
                  [buf_spec] * cache.n_layers,
                  [sbuf_spec] * cache.n_layers,
                  [tail_spec] * cache.n_layers, P()),
        out_specs=(P(scat_ax, None), [buf_spec] * cache.n_layers,
                   [sbuf_spec] * cache.n_layers,
                   [tail_spec] * cache.n_layers),
        check_vma=False,
    )(island_params, tokens,
      cache.lengths, list(cache.kv),
      list(cache.quant_scales) if quant else [dummy] * cache.n_layers,
      list(cache.tail) if has_tail else [dummy] * cache.n_layers,
      cache.tail_count if has_tail else dummy)

    new_cache = KVCache(new_bufs, cache.lengths,
                        new_sbufs if quant else None,
                        cache.kv_heads, cache.head_dim,
                        new_tails if has_tail else None,
                        cache.tail_count,
                        cache.carry, cache.carry_s).advance(1)
    # LM head under GSPMD (outside the island; see module docstring).
    if cfg.tie_embeddings and "lm_head" not in params:
        logits = jnp.matmul(x_scat, params["embed"].T.astype(x_scat.dtype),
                            preferred_element_type=jnp.float32)
    else:
        logits = linear(x_scat, params["lm_head"])
    return logits.astype(jnp.float32), new_cache


def prefill_overlap(model, params, tokens, cache, last_idx):
    """Ring-overlapped TP PREFILL (round-5 verdict item 3b): the
    per-layer projection chain runs as ONE shard_map with the same
    scattered-row discipline as :func:`decode_step_overlap`, but over
    B*S token rows — the big-M regime where hiding the ring permutes
    under the chunk matmuls pays most. Attention runs per (batch/data,
    heads/model) shard (flash prefill + position-0 cache append, the
    `_attn_island` s>1 body); the LM head runs OUTSIDE on the B
    gathered last-token rows only (prefill_last semantics — the
    [B, S, V] logits are never materialized).

    tokens: [B, S] int32 (fresh cache, position-0 prefill only — prefix
    suffix chunks keep the GSPMD path). Returns (last-token logits
    [B, V] f32, cache with lengths UNSET — the caller applies
    with_lengths, exactly like prefill_fn)."""
    from ..models.transformer import (_norm, _rope, linear)
    from ..kernels.attention import flash_attention
    from ..generate.kv_cache import KVCache, SCALE_LANES
    from .sharding import param_shardings
    from jax import shard_map

    cfg = model.config
    mesh = model.mesh
    b, s = tokens.shape
    tp, dp = _check_supported(model, cache, b * s)
    if getattr(cache, "tail", None) is not None:
        raise ValueError("prefill_overlap: group caches carry no tail")
    batch_ax = tuple(a for a in ("dcn", "data")
                     if a in mesh.axis_names) or None
    scat_ax = tuple(batch_ax or ()) + ("model",)
    h, kvh, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    h_l, kvh_l = h // tp, kvh // tp
    quant = cache.quant_scales is not None
    if quant and cache.quant_scales[0].shape[-1] != tp * SCALE_LANES:
        raise ValueError(
            "prefill_overlap: quantized cache needs the TP lane-group "
            "scale layout")
    c = (b * s) // (dp * tp)        # scattered token rows per shard
    bidir = c % 2 == 0
    use_pallas = cfg.use_pallas and (kvh_l * hd) % 128 == 0

    island_params = {k: v for k, v in params.items() if k != "lm_head"}
    from ..models.transformer import QuantWeight
    for leaf in jax.tree_util.tree_leaves(
            island_params,
            is_leaf=lambda x: isinstance(x, QuantWeight)):
        if isinstance(leaf, QuantWeight) and leaf.kind == "int4":
            raise ValueError("prefill_overlap: int4 weights unsupported")
    pspecs = jax.tree_util.tree_map(
        lambda s_: s_.spec, param_shardings(island_params, mesh))

    buf_spec = P(batch_ax, None, None, "model")
    sbuf_spec = buf_spec if quant else P()
    dummy = jnp.zeros((), jnp.int32)
    b_l = b // dp                    # batch rows per data shard

    def attend(q4, k4, v4, buf_l, sbuf_l):
        """Flash prefill + position-0 append on the local shard —
        the _attn_island s>1 body. q4/k4/v4: [B_l, H_l|KVH_l, S, D]."""
        local = KVCache([buf_l], jnp.zeros(b_l, jnp.int32),
                        [sbuf_l] if quant else None, kvh_l, hd)
        local = local.append(0, k4, v4, position=0)
        k_f, v_f = k4, v4
        if kvh_l != h_l:
            rep = h_l // kvh_l
            k_f = jnp.repeat(k4, rep, axis=1)
            v_f = jnp.repeat(v4, rep, axis=1)
        out = flash_attention(q4, k_f, v_f, causal=True)
        return out.astype(q4.dtype), local.kv[0], (
            local.quant_scales[0] if quant else dummy)

    def body(prms, tok_scat, bufs, sbufs):
        mi = jax.lax.axis_index("model")
        # Row r of this shard's scattered stream is global token
        # (shard_row_offset + r); its in-sequence position is that
        # index mod S (rows are [B, S] flattened row-major).
        di = jax.lax.axis_index(batch_ax) if batch_ax else 0
        base = (di * tp + mi) * c
        gpos = (base + jnp.arange(c)) % s                  # [c]
        x = jnp.take(prms["embed"], tok_scat, axis=0)      # [c, d]
        if cfg.pos == "learned":
            x = x + jnp.take(prms["pos_embed"], gpos, axis=0)
        x = x.astype(jnp.bfloat16 if cfg.dtype == "bfloat16"
                     else jnp.float32)
        pos_rows = jnp.broadcast_to(jnp.arange(s)[None, :], (b_l, s))
        new_bufs, new_sbufs = [], []
        for li, layer in enumerate(prms["layers"]):
            ln1 = _norm(cfg, x, layer["ln1_scale"],
                        layer.get("ln1_bias"))
            qkv = ring_all_gather_matmul(
                ln1, None, "model", bidirectional=bidir,
                mm=lambda rows, w=layer["wqkv"]: linear(rows, w))
            if "bqkv" in layer:
                qkv = qkv + layer["bqkv"]
            qkv = ring_all_gather(qkv.astype(x.dtype), "model")
            # [B_l*S, (h+2kvh)*hd] -> local head slices [B_l, ., S, D]
            def heads(off, n):
                sl = jax.lax.dynamic_slice(
                    qkv, (0, off), (b_l * s, n * hd))
                return sl.reshape(b_l, s, n, hd).transpose(0, 2, 1, 3)
            q4 = heads(mi * h_l * hd, h_l)
            k4 = heads(h * hd + mi * kvh_l * hd, kvh_l)
            v4 = heads((h + kvh) * hd + mi * kvh_l * hd, kvh_l)
            if cfg.pos == "rope":
                q4 = _rope(q4, pos_rows, cfg.rope_theta)
                k4 = _rope(k4, pos_rows, cfg.rope_theta)
            out4, nbuf, nsbuf = attend(q4, k4, v4, bufs[li], sbufs[li])
            new_bufs.append(nbuf)
            new_sbufs.append(nsbuf)
            out_rows = out4.transpose(0, 2, 1, 3).reshape(
                b_l * s, h_l * hd)
            attn_scat = ring_matmul_reduce_scatter(
                out_rows, None, "model", bidirectional=False,
                mm=lambda rows, w=layer["wo"]: linear(rows, w))
            if "bo" in layer:
                attn_scat = attn_scat + layer["bo"]
            x = x + attn_scat.astype(x.dtype)
            ln2 = _norm(cfg, x, layer["ln2_scale"],
                        layer.get("ln2_bias"))
            if cfg.act == "swiglu":
                def up_mm(rows, wg=layer["w_gate"], wu=layer["w_up"]):
                    return jnp.concatenate(
                        [linear(rows, wg), linear(rows, wu)], axis=-1)
                both = ring_all_gather_matmul(ln2, None, "model",
                                              bidirectional=bidir,
                                              mm=up_mm)
                dff_l = both.shape[-1] // 2
                hidden = jax.nn.silu(both[:, :dff_l]) * both[:, dff_l:]
            else:
                hidden = ring_all_gather_matmul(
                    ln2, None, "model", bidirectional=bidir,
                    mm=lambda rows, w=layer["w_up"]: linear(rows, w))
                if "b_up" in layer:
                    hidden = hidden + layer["b_up"]
                hidden = jax.nn.gelu(hidden, approximate=False)
            mlp_scat = ring_matmul_reduce_scatter(
                hidden.astype(x.dtype), None, "model",
                bidirectional=False,
                mm=lambda rows, w=layer["w_down"]: linear(rows, w))
            if "b_down" in layer:
                mlp_scat = mlp_scat + layer["b_down"]
            x = x + mlp_scat.astype(x.dtype)
        x = _norm(cfg, x, prms["ln_f_scale"], prms.get("ln_f_bias"))
        return x, new_bufs, new_sbufs

    x_scat, new_bufs, new_sbufs = shard_map(
        body, mesh=mesh,
        in_specs=(pspecs, P(scat_ax),
                  [buf_spec] * cache.n_layers,
                  [sbuf_spec] * cache.n_layers),
        out_specs=(P(scat_ax, None), [buf_spec] * cache.n_layers,
                   [sbuf_spec] * cache.n_layers),
        check_vma=False,
    )(island_params, tokens.reshape(b * s), list(cache.kv),
      list(cache.quant_scales) if quant else [dummy] * cache.n_layers)

    new_cache = KVCache(new_bufs, cache.lengths,
                        new_sbufs if quant else None,
                        cache.kv_heads, cache.head_dim)
    # Last-token rows + LM head outside the island (prefill_last
    # semantics: never materialize [B, S, V]).
    xl = x_scat.reshape(b, s, -1)[jnp.arange(b), last_idx]
    if cfg.tie_embeddings and "lm_head" not in params:
        logits = jnp.matmul(xl, params["embed"].T.astype(xl.dtype),
                            preferred_element_type=jnp.float32)
    else:
        logits = linear(xl, params["lm_head"])
    return logits.astype(jnp.float32), new_cache
