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
        raise ValueError("overlap decode: tail write-buffer unsupported")
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
    dummy = jnp.zeros((), jnp.int32)

    def attend(q3, k3, v3, lens_l, buf_l, sbuf_l):
        """Append + attention on the local (batch, heads) shard — the
        same per-shard kernels as TransformerLM._attn_island."""
        local = KVCache([buf_l], lens_l,
                        [sbuf_l] if quant else None, kvh_l, hd)
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
            local.quant_scales[0] if quant else dummy)

    def body(prms, tok_scat, lens_l, bufs, sbufs):
        mi = jax.lax.axis_index("model")
        pos_scat = jax.lax.dynamic_slice_in_dim(lens_l, mi * c, c, 0)
        x = jnp.take(prms["embed"], tok_scat, axis=0)       # [c, d]
        if cfg.pos == "learned":
            x = x + jnp.take(prms["pos_embed"], pos_scat, axis=0)
        x = x.astype(jnp.bfloat16 if cfg.dtype == "bfloat16"
                     else jnp.float32)
        pos = lens_l[:, None]                               # [B_dp, 1]
        new_bufs, new_sbufs = [], []
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
            out3, nbuf, nsbuf = attend(q3, k3, v3, lens_l, bufs[li],
                                       sbufs[li])
            new_bufs.append(nbuf)
            new_sbufs.append(nsbuf)
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
        return x, new_bufs, new_sbufs

    x_scat, new_bufs, new_sbufs = shard_map(
        body, mesh=mesh,
        in_specs=(pspecs, P(scat_ax), P(batch_ax),
                  [buf_spec] * cache.n_layers,
                  [sbuf_spec] * cache.n_layers),
        out_specs=(P(scat_ax, None), [buf_spec] * cache.n_layers,
                   [sbuf_spec] * cache.n_layers),
        check_vma=False,
    )(island_params, tokens,
      cache.lengths, list(cache.kv),
      list(cache.quant_scales) if quant else [dummy] * cache.n_layers)

    new_cache = KVCache(new_bufs, cache.lengths,
                        new_sbufs if quant else None,
                        cache.kv_heads, cache.head_dim).advance(1)
    # LM head under GSPMD (outside the island; see module docstring).
    if cfg.tie_embeddings and "lm_head" not in params:
        logits = jnp.matmul(x_scat, params["embed"].T.astype(x_scat.dtype),
                            preferred_element_type=jnp.float32)
    else:
        logits = linear(x_scat, params["lm_head"])
    return logits.astype(jnp.float32), new_cache
