"""Decoder-only transformer LM, configurable to cover the GPT-2 family
(learned positions, LayerNorm, GELU) and the Llama/TinyLlama/Qwen2 family
(RoPE, RMSNorm, SwiGLU, GQA).

TPU-first design decisions:

* fixed-shape prefill/decode functions (jit once per bucket, not per step);
* attention via the Pallas flash kernels (:mod:`rten_tpu.kernels.attention`);
* weights as a flat pytree of arrays or quantized records (int8
  per-channel / int4 group-wise) routed through the Pallas dequant-fused
  GEMMs — weight dtype is a *storage* property, compute stays on the MXU;
* parameters carry logical axis names so the parallel layer can shard
  them over a mesh without knowing the architecture
  (:mod:`rten_tpu.parallel.sharding`).

Reference surface: rten-examples/src/{gpt2,qwen2_chat}.rs drive the same
model classes through ONNX graphs.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..generate.kv_cache import KVCache
from ..kernels.attention import flash_attention, flash_decode_fused
from ..kernels import gemm as gk
from ..kernels import quant as qt


@dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int = 50257
    n_layers: int = 12
    n_heads: int = 12
    kv_heads: int | None = None          # None → MHA
    d_model: int = 768
    d_ff: int = 3072
    max_seq_len: int = 1024
    pos: str = "learned"                 # "learned" | "rope"
    norm: str = "layernorm"              # "layernorm" | "rmsnorm"
    act: str = "gelu"                    # "gelu" | "swiglu"
    rope_theta: float = 10000.0
    layer_norm_eps: float = 1e-5
    tie_embeddings: bool = True
    dtype: str = "float32"               # compute dtype: float32 | bfloat16
    use_pallas: bool = True              # False → pure-jnp attention (lets
                                         # GSPMD partition multi-chip runs)
    scan_layers: bool = False            # lax.scan over layers (one traced
                                         # layer body; needs stacked params
                                         # + stacked KV cache)
    n_experts: int = 0                   # >0 → MoE MLP (models/moe.py)
    experts_per_token: int = 2
    moe_impl: str = "auto"               # "auto" | "dense" | "ragged"
    decode_attn: str = "auto"            # decode-attention kernel:
                                         # "auto" | "fused" (per-(seq,
                                         # block) grid) | "stream" (float
                                         # caches only) | "grouped"
                                         # (kernels/attention.py; float
                                         # + token-packed int8 caches)
    fused_append: bool = False           # decode: fuse the KV-cache
                                         # append into the grouped
                                         # attention kernel (float
                                         # caches; one kernel per layer
                                         # instead of two — hardware
                                         # A/B pending)
    quant_int8_scores: bool = True       # int8 caches: row-quantize q
                                         # and run the grouped decode
                                         # score dot int8×int8 on the
                                         # MXU (v5e A/B: 102 vs 112 us
                                         # at batch 64 — BASELINE.md
                                         # round 5); False → exact-q
                                         # int8→f32 convert

    @property
    def head_dim(self):
        return self.d_model // self.n_heads

    @property
    def n_kv_heads(self):
        return self.kv_heads or self.n_heads

    @staticmethod
    def gpt2(**kw):
        return TransformerConfig(**{**dict(
            vocab_size=50257, n_layers=12, n_heads=12, d_model=768,
            d_ff=3072, max_seq_len=1024, pos="learned", norm="layernorm",
            act="gelu"), **kw})

    @staticmethod
    def tiny_llama(**kw):
        return TransformerConfig(**{**dict(
            vocab_size=32000, n_layers=22, n_heads=32, kv_heads=4,
            d_model=2048, d_ff=5632, max_seq_len=2048, pos="rope",
            norm="rmsnorm", act="swiglu", tie_embeddings=False,
            rope_theta=10000.0), **kw})

    @staticmethod
    def mixtral(**kw):
        """Mixtral-8x7B-class shape (scaled by overrides in practice)."""
        return TransformerConfig(**{**dict(
            vocab_size=32000, n_layers=32, n_heads=32, kv_heads=8,
            d_model=4096, d_ff=14336, max_seq_len=4096, pos="rope",
            norm="rmsnorm", act="swiglu", tie_embeddings=False,
            rope_theta=1e6, n_experts=8, experts_per_token=2), **kw})

    @staticmethod
    def tiny_moe(**kw):
        """Small MoE config for tests (Mixtral family: GQA/RoPE/SwiGLU)."""
        return TransformerConfig(**{**dict(
            vocab_size=128, n_layers=2, n_heads=4, kv_heads=2, d_model=64,
            d_ff=96, max_seq_len=128, pos="rope", norm="rmsnorm",
            act="swiglu", tie_embeddings=False, n_experts=4,
            experts_per_token=2), **kw})

    @staticmethod
    def tiny_test(**kw):
        """Small config for tests."""
        return TransformerConfig(**{**dict(
            vocab_size=128, n_layers=2, n_heads=4, d_model=64, d_ff=128,
            max_seq_len=128, pos="learned", norm="layernorm", act="gelu"),
            **kw})


# ---------------------------------------------------------------------------
# Quantized weight records
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclass
class QuantWeight:
    """A linear-layer weight in quantized storage. ``kind``: 'int8'
    (per-output-channel symmetric) or 'int4' (group-wise, tile-planar
    packed)."""
    kind: str
    data: object        # int8 [K, N] or packed uint8 [K, N//2]
    scales: object      # [N] or [K//group, N]
    group: int = qt.INT4_GROUP
    n: int = 0          # logical N (int4 padding may widen storage)

    def tree_flatten(self):
        return ((self.data, self.scales), (self.kind, self.group, self.n))

    @classmethod
    def tree_unflatten(cls, aux, children):
        kind, group, n = aux
        return cls(kind, children[0], children[1], group, n)


# Below this weight size (elements), the decode-size int8 path uses a
# plain XLA bf16 dot instead of the Pallas weight-only kernel: XLA hoists
# the (exact) int8→bf16 weight cast out of the decode scan, so weights
# stream at 2 B/elt with zero per-call kernel overhead — profiling on v5e
# showed ~4 us of Pallas-call overhead per GEMM, which at GPT-2 layer
# sizes (≤2.4 MB int8) exceeds the 1 B/elt bandwidth saving. Large
# weights (LM heads, TinyLlama-class layers) keep the 1 B/elt kernel.
_WO_PALLAS_MIN_ELEMENTS = 8 * 1024 * 1024


def linear(x, w, bias=None):
    """Dense x @ w (+ bias) dispatching on weight storage. 2-D x for
    quantized paths; callers flatten batch dims."""
    if isinstance(w, QuantWeight):
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        if w.kind == "int8":
            if x2.shape[0] <= 64 and w.data.size < _WO_PALLAS_MIN_ELEMENTS:
                # Small weight, decode-size M: XLA bf16 dot on the
                # loop-hoisted cast weight (see _WO_PALLAS_MIN_ELEMENTS).
                acc = jnp.matmul(x2.astype(jnp.bfloat16),
                                 w.data.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)
                out = acc * w.scales[None, :]
            elif x2.shape[0] <= 64:
                # Decode-size M: weight-only Pallas path — weights stream
                # at 1 B/elt, activations stay float, no quant overhead.
                out = gk.matmul_int8_weight_only(x2, w.data, w.scales)
            else:
                # Batch/prefill: dynamic per-tensor activation
                # quantization + int8×int8 on the MXU (2× rate).
                absmax = jnp.max(jnp.abs(x2))
                x_scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
                xq = jnp.clip(jnp.round(x2 / x_scale), -127,
                              127).astype(jnp.int8)
                out = gk.matmul_int8(xq, w.data, x_scale, w.scales)
        elif w.kind == "int4":
            words = w.data.dtype == jnp.int32     # word-packed (round 4)
            k_packed = w.data.shape[0] * (4 if words else 1)
            if x2.shape[1] < k_packed:
                # Quantization pads K up to the group size; padded weight
                # rows are zero, so zero-padding x is exact.
                x2 = jnp.pad(x2, ((0, 0), (0, k_packed - x2.shape[1])))
            # Word-packed int4 streams at 0.5 B/elt vs the hoisted bf16
            # copy's 2 B/elt (a 4x saving, vs int8's 2x), so its
            # Pallas-call overhead amortizes at ~4x smaller weights —
            # TinyLlama's 5.2M-element qkv projections take the kernel.
            min_elems = (_WO_PALLAS_MIN_ELEMENTS // 4 if words
                         else _WO_PALLAS_MIN_ELEMENTS)
            if x2.shape[0] <= 64 and \
                    w.data.size * (8 if words else 2) < min_elems:
                # Small weight at decode M: XLA dot on the loop-hoisted
                # dequantized bf16 copy (same rationale as int8).
                deq = (qt.dequantize_int4_words if words
                       else qt.dequantize_int4_groupwise)
                wf = deq(w.data, w.scales,
                         group=w.group).astype(jnp.bfloat16)
                out = jnp.matmul(x2.astype(jnp.bfloat16), wf,
                                 preferred_element_type=jnp.float32)
            elif words:
                import os
                out = gk.matmul_int4_words(
                    x2, w.data, w.scales, group=w.group,
                    dot_mode=os.environ.get("RTEN_INT4_DOT", "bf16"))
            else:
                out = gk.matmul_int4(x2, w.data, w.scales, group=w.group)
            out = out[:, :w.n]
        else:
            raise ValueError(w.kind)
        out = out.reshape(*lead, -1).astype(x.dtype)
    else:
        out = jnp.matmul(x, w, preferred_element_type=jnp.float32)
        out = out.astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


def quantize_weights(params, kind="int8", group=qt.INT4_GROUP,
                     int4_packing="words"):
    """Convert all 2-D projection weights in a parameter pytree to
    quantized storage. Embeddings / norms stay in float.

    Tied-embedding models get a separate quantized ``lm_head`` built from
    ``embed.T``: the logits matmul is the single largest weight read of a
    decode step (vocab×d_model, e.g. 154 MB in f32 for GPT-2-small), so
    streaming it at 1 B/element matters even though the gather-side
    embedding stays float."""
    def convert(path, w):
        name = path[-1] if path else ""
        if not isinstance(w, jnp.ndarray) and not isinstance(w, np.ndarray):
            return w
        arr = np.asarray(w)
        if arr.ndim == 3 and name in ("w_gate", "w_up", "w_down"):
            # Expert-stacked MoE weights [E, K, N]: int8 per-expert,
            # per-output-channel (moe.py dense path consumes these; int4
            # expert stacks stay float this round).
            if kind != "int8":
                return w
            qs = [qt.abs_max_quantize_int8(arr[e], axis=0)
                  for e in range(arr.shape[0])]
            q = np.stack([a for a, _ in qs])
            scales = np.stack([s for _, s in qs])
            return QuantWeight("int8", jnp.asarray(q), jnp.asarray(scales),
                               n=arr.shape[2])
        if arr.ndim != 2 or "embed" in name or "pos" in name \
                or name == "router":
            # Embeddings / position tables stay float (gathered); the
            # router stays float so quantization never flips a routing
            # decision.
            return w
        if kind == "int8":
            q, scales = qt.abs_max_quantize_int8(arr, axis=0)
            return QuantWeight("int8", jnp.asarray(q), jnp.asarray(scales),
                               n=arr.shape[1])
        if int4_packing == "words":
            # WORD-packed layout — the default since the round-4 v5e
            # A/B (TinyLlama batch 4: 1443 us/step vs the byte-packed
            # kernel's 1915; with RTEN_INT4_DOT=int8, 1017 us — 25%
            # FASTER than int8 weight-only): in-kernel unpack is two
            # int32 masks + a free sublane bitcast (kernels/gemm.py::
            # matmul_int4_words). "bytes" keeps the legacy layout.
            packed, scales = qt.quantize_int4_words(arr, group=group)
        else:
            packed, scales = qt.quantize_int4_groupwise(arr, group=group)
        return QuantWeight("int4", jnp.asarray(packed), jnp.asarray(scales),
                           group=group, n=arr.shape[1])

    def walk(obj, path):
        if isinstance(obj, dict):
            return {k: walk(v, path + (k,)) for k, v in obj.items()}
        if isinstance(obj, list):
            return [walk(v, path + (str(i),)) for i, v in enumerate(obj)]
        return convert(path, obj)

    out = walk(params, ())
    if isinstance(out, dict) and "embed" in out and "lm_head" not in out:
        head = np.asarray(out["embed"]).T  # [d_model, vocab]
        q, scales = qt.abs_max_quantize_int8(head, axis=0)
        out["lm_head"] = QuantWeight("int8", jnp.asarray(q),
                                     jnp.asarray(scales), n=head.shape[1])
    return out


def stack_layer_params(layers: list) -> dict:
    """Stack homogeneous per-layer param dicts into one pytree with a
    leading layer axis (the `lax.scan` xs)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

def _norm(cfg, x, scale, bias):
    # Statistics in f32 even under bf16 activations (mean/var cancellation
    # is catastrophic in bf16); output returns to the compute dtype.
    xf = x.astype(jnp.float32)
    if cfg.norm == "rmsnorm":
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        out = xf * jax.lax.rsqrt(var + cfg.layer_norm_eps) * scale
        return out.astype(x.dtype)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + cfg.layer_norm_eps) * scale
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def _rope(x, positions, theta):
    """Rotary embedding. x: [B, H, S, D]; positions: [B, S] or [S]."""
    d = x.shape[-1]
    freqs = theta ** (-jnp.arange(0, d // 2, dtype=jnp.float32) / (d // 2))
    pos = jnp.asarray(positions, jnp.float32)
    if pos.ndim == 1:
        pos = pos[None, :]
    angles = pos[:, None, :, None] * freqs[None, None, None, :]
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    x1, x2 = x[..., :d // 2], x[..., d // 2:]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                           axis=-1).astype(x.dtype)


def flat_vmem_bytes(heads, head_dim, kvh, group, block_k, window,
                    q_bf16=True):
    """Modeled scoped-VMEM bytes for flash_decode_flat's buffers at a
    given group width — the model the g32 widening below and the
    engine's tail gate share (a config whose INITIAL group does not fit
    fails at Mosaic compile time, invisible to CPU interpret tests)."""
    f_tot = kvh * head_dim
    hp8 = -(-heads // 8) * 8
    return (2 * group * (block_k // 4) * 2 * f_tot * 4      # kv buf
            + 2 * group * (block_k // 2) * 128 * 4          # scales
            + group * hp8 * f_tot * 4                       # acc
            + group * window * 2 * f_tot * 2                # tail
            + 2 * hp8 * group * 128 * 4                     # obuf
            + hp8 * head_dim * f_tot * (2 if q_bf16 else 4))  # E


def flat_group_for(batch, quant=True):
    """The flat kernel's group width for a batch (the dispatch rule in
    :func:`_pallas_decode_attn`)."""
    groups = (16, 8, 4, 2) if quant else (8, 4, 2)
    return next((g for g in groups
                 if batch % g == 0 and batch >= 2 * g), 0)


_FLAT_VMEM_BUDGET = 13 * 1024 * 1024


def _pallas_decode_attn(cfg, q3, cache, layer_idx, kvh, partials=False):
    """Single-query Pallas decode-attention dispatch: grouped / stream /
    fused kernel selection per the v5e A/B history (BASELINE.md rounds
    5-6). ``q3``: [B, H, D]; ``cache`` may be a full engine cache or a
    shard-LOCAL single-layer view built inside a shard_map island (the
    kernels are identical either way — that is the point of the local
    sub-cache layout, see KVCache.create(scale_lane_groups)). Returns
    [B, H, D]."""
    import os
    b = q3.shape[0]
    scales = (cache.quant_scales[layer_idx]
              if cache.quant_scales is not None else None)
    kind = cfg.decode_attn
    if scales is not None and kind == "stream":
        kind = "fused"   # no quantized stream variant
    long_ctx = cache.capacity >= 2048
    group = flat_group_for(b, quant=scales is not None)
    blk = 128 if long_ctx else 64
    if partials:
        # Seq-sharded decode (capacity shards merge outside): the flat
        # kernel's partials mode — unnormalized accumulator with m/l in
        # the pad lanes (see _attn_island_seq).
        from ..kernels.attention import flash_decode_flat
        assert scales is not None and group, \
            "partials decode needs the quantized flat kernel"
        return flash_decode_flat(
            q3, cache.fused_layer(layer_idx), cache.lengths + 1, kvh,
            group=group, block_k=blk, kv_scales=scales,
            q_bf16=os.environ.get("RTEN_FLAT_QBF16", "1") != "0",
            partials=True)
    if kind == "auto":
        # Short-capacity QUANT caches: the flat single-program kernel
        # with compact q/out (v5e live-128 A/B: 238 vs 316 us grouped —
        # the per-program pipeline drain and the block-diagonal q
        # traffic both dominate at live <= ~512). Long caches stayed on
        # the per-group grid while the f32 E-matrix + b128 buffers
        # exceeded VMEM; the bf16-E mode (q_bf16) fits g8-16/b128 in
        # ~11 MB and measured +2.8% over grouped at live 2048-2304
        # (7985 vs 7769 tok/s, same-process bench_longctx, round 5) —
        # flat is the long-cap default too now (RTEN_FLAT_LONGCTX=0
        # restores grouped). Float caches stay grouped (g8 flat
        # measured slower — the per-group epilogue overhead doubles at
        # 2x the group count).
        import os as _os
        flat_long = (long_ctx
                     and _os.environ.get("RTEN_FLAT_LONGCTX", "1")
                     != "0"
                     and _os.environ.get("RTEN_FLAT_QBF16", "1") != "0"
                     and cache.capacity % blk == 0)
        kind = ("flat" if scales is not None and group
                and (not long_ctx or flat_long)
                else "grouped" if group else "fused")
    if kind == "flat" and long_ctx and scales is not None \
            and b % 8 == 0 and b >= 16:
        # Long-context flat kernel prefers group 8 (round-5 sweep at
        # cap 4096 / live 3968: g8/b128 352.3 vs g16/b128 380.0 us —
        # the g16 config only became VMEM-feasible with bf16-E, and
        # measured a recorded NEGATIVE: more groups amortize the DMA
        # pipeline better than wider ones at long lives).
        group = 8
    if getattr(cache, "tail", None) is not None and (kind != "flat"
                                                     or not group):
        raise ValueError(
            "KV cache has a tail write-buffer but decode-attention "
            f"selection picked {kind!r} — only the flat kernel reads "
            "the tail (engine gating bug)")
    if kind == "flat" and group:
        from ..kernels.attention import flash_decode_flat
        # Group width: g=32 beat g16 by 26% at live 96 in the round-4
        # no-tail sweep (145.6 vs 195.6 us at batch 256) but with the
        # bf16 tail buffer g32/b64's f32-E VMEM footprint exceeded the
        # chip (17.76 M > 16 M). Round 5: the bf16-E/bf16-q mode
        # (RTEN_FLAT_QBF16, flash_decode_flat(q_bf16=True)) halves the
        # E matrix + compact-q blocks, so widen to the largest group
        # whose buffers fit scoped VMEM under that mode.
        q_bf16 = os.environ.get("RTEN_FLAT_QBF16", "1") != "0"
        if scales is not None and q_bf16:
            win = (cache.tail[layer_idx].shape[1]
                   if getattr(cache, "tail", None) is not None else 0)
            for g2 in (32,):
                if g2 > group and b % g2 == 0 and b >= 2 * g2:
                    vm = flat_vmem_bytes(cfg.n_heads, cache.head_dim,
                                         kvh, g2, blk, win)
                    if vm <= _FLAT_VMEM_BUDGET:
                        group = g2
                        break
        tail = tc = None
        if getattr(cache, "tail", None) is not None:
            tail = cache.tail[layer_idx]
            tc = cache.tail_count + 1       # incl. the current token
            if os.environ.get("RTEN_ABLATE_TAIL_ROUND"):
                # Profiling-only ablation (tools/profile_decode.py):
                # skip the kernel's tail round entirely — output is
                # WRONG (newest tokens unread); timing isolates the
                # tail round's cost in situ.
                tail = tc = None
        # int8_scores measured SLOWER with the flat kernel (v5e
        # live-128: 178 vs 89 us packed-scales) — keep it off here.
        # q-DMA streaming: a bandwidth-regime win (round-5 same-run
        # A/Bs at batch 256: live 96 207.1 vs 190.2 us — LOSES; live
        # 256 253.1 vs 268.1 — WINS 5.6%). Live length is dynamic but
        # the flag is jit-static, so the default keys on CAPACITY as
        # the proxy: cap >= 2048 serving spends most steps at long
        # lives (the engine A/B at cap 4096, lives 2048-2304: +2.5%
        # end to end), accepting the ~8%-slower attention calls while
        # fresh sequences are still short. RTEN_FLAT_QSTREAM=0/1
        # forces either way.
        qs_env = os.environ.get("RTEN_FLAT_QSTREAM", "")
        q_stream = (qs_env != "0") if qs_env else long_ctx
        return flash_decode_flat(
            q3, cache.fused_layer(layer_idx), cache.lengths + 1, kvh,
            group=group, block_k=blk, kv_scales=scales,
            tail=tail, tail_count=tc, q_bf16=q_bf16,
            q_stream=q_stream)
    if kind == "grouped" or kind == "flat":
        from ..kernels.attention import flash_decode_grouped
        return flash_decode_grouped(
            q3, cache.fused_layer(layer_idx), cache.lengths + 1, kvh,
            group=group or 8, block_k=blk, kv_scales=scales,
            int8_scores=(scales is not None and group < 16
                         and not long_ctx and cfg.quant_int8_scores))
    if kind == "stream":
        from ..kernels.attention import flash_decode_stream
        return flash_decode_stream(q3, cache.fused_layer(layer_idx),
                                   cache.lengths + 1, kvh)
    return flash_decode_fused(q3, cache.fused_layer(layer_idx),
                              cache.lengths + 1, kvh, kv_scales=scales)


def _pallas_paged_decode_attn(cfg, q3, cache, layer_idx, kvh):
    """Paged sibling of :func:`_pallas_decode_attn`: grouped paged /
    grid paged / gather-reference selection. ``q3``: [B, H, D];
    ``cache``: a PagedKVCache (full, or a shard-LOCAL view with
    shard-local page ids built inside the paged mesh island). Returns
    [B, H, D]."""
    b, h, _ = q3.shape
    pscales = (cache.quant_scales[layer_idx]
               if cache.quant_scales is not None else None)
    group = next((g for g in (8, 4, 2) if b % g == 0 and
                  b >= 2 * g), 0)
    if group and cfg.decode_attn in ("auto", "grouped"):
        from ..kernels.attention import flash_decode_paged_grouped
        return flash_decode_paged_grouped(
            q3, cache.fused_layer(layer_idx), cache.page_table,
            cache.lengths + 1, kvh, group=group, kv_scales=pscales)
    if pscales is not None:
        # No viable group (tiny batch): dequantized-gather reference
        # path (the grid paged kernel is float-only).
        from ..kernels.attention import _attn_reference
        kc, vc = cache.layer_kv(layer_idx)
        if kvh != h:
            kc = jnp.repeat(kc, h // kvh, axis=1)
            vc = jnp.repeat(vc, h // kvh, axis=1)
        return _attn_reference(q3[:, :, None, :], kc, vc, False,
                               1.0 / math.sqrt(cache.head_dim),
                               cache.lengths + 1)[:, :, 0]
    from ..kernels.attention import flash_decode_paged
    return flash_decode_paged(q3, cache.fused_layer(layer_idx),
                              cache.page_table, cache.lengths + 1, kvh)


class TransformerLM:
    def __init__(self, config: TransformerConfig):
        self.config = config
        # Optional NamedSharding applied to hidden states ([B, S, D])
        # after the embedding and after every layer — sequence/context
        # parallelism for long prefill: shard S over a `seq` mesh axis
        # and GSPMD inserts the K/V all-gathers attention needs while
        # norms/MLPs stay local (parallel/sharding.py::sequence_parallel).
        self.activation_sharding = None
        # Optional jax Mesh for the Pallas-under-mesh path: when set
        # (by ServingEngine or parallel helpers), the append+attention
        # pair runs as a shard_map island per layer — each device
        # executes the UNCHANGED single-chip Pallas kernels on its
        # (batch/data, heads/model) shard, the TPU analog of the
        # reference running its thread pool INSIDE the kernel
        # (src/gemm.rs:818-837). See _attn_island.
        self.mesh = None

    # -- parameters --------------------------------------------------------

    def init_params(self, key) -> dict:
        cfg = self.config
        seed = (int(jax.random.key_data(key)[-1]) & 0x7FFFFFFF
                if key is not None else 0)
        rng = np.random.default_rng(seed)
        dt = jnp.float32
        scale = 0.02

        def dense(k, shape):
            # float32 PCG init: ~100× faster than per-weight jax.random
            # for ~100M-param models (demo weights only).
            return jnp.asarray(
                rng.standard_normal(shape, dtype=np.float32) * scale)

        d, dff = cfg.d_model, cfg.d_ff
        h, kvh, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
        params = {
            "embed": dense(None, (cfg.vocab_size, d)),
            "ln_f_scale": jnp.ones(d, dt),
            "layers": [],
        }
        if cfg.norm == "layernorm":
            params["ln_f_bias"] = jnp.zeros(d, dt)
        if cfg.pos == "learned":
            params["pos_embed"] = dense(None, (cfg.max_seq_len, d))
        if not cfg.tie_embeddings:
            params["lm_head"] = dense(None, (d, cfg.vocab_size))
        for _ in range(cfg.n_layers):
            layer = {
                "ln1_scale": jnp.ones(d, dt),
                # Fused QKV projection: one MXU matmul instead of three
                # (column layout [q | k | v]; GPT-2's c_attn layout).
                "wqkv": dense(None, (d, (h + 2 * kvh) * hd)),
                "wo": dense(None, (h * hd, d)),
                "ln2_scale": jnp.ones(d, dt),
            }
            if cfg.norm == "layernorm":
                layer["ln1_bias"] = jnp.zeros(d, dt)
                layer["ln2_bias"] = jnp.zeros(d, dt)
                layer["bqkv"] = jnp.zeros((h + 2 * kvh) * hd, dt)
                layer["bo"] = jnp.zeros(d, dt)
            if cfg.n_experts > 0:
                e = cfg.n_experts
                layer["router"] = dense(None, (d, e))
                if cfg.act == "swiglu":
                    layer["w_gate"] = dense(None, (e, d, dff))
                    layer["w_up"] = dense(None, (e, d, dff))
                    layer["w_down"] = dense(None, (e, dff, d))
                else:
                    layer["w_up"] = dense(None, (e, d, dff))
                    layer["b_up"] = jnp.zeros((e, dff), dt)
                    layer["w_down"] = dense(None, (e, dff, d))
                    layer["b_down"] = jnp.zeros((e, d), dt)
            elif cfg.act == "swiglu":
                layer["w_gate"] = dense(None, (d, dff))
                layer["w_up"] = dense(None, (d, dff))
                layer["w_down"] = dense(None, (dff, d))
            else:
                layer["w_up"] = dense(None, (d, dff))
                layer["b_up"] = jnp.zeros(dff, dt)
                layer["w_down"] = dense(None, (dff, d))
                layer["b_down"] = jnp.zeros(d, dt)
            params["layers"].append(layer)
        return params

    # -- forward -----------------------------------------------------------

    def _attention(self, layer_params, x, positions, cache, layer_idx,
                   lengths, chunk=False):
        cfg = self.config
        b, s, d = x.shape
        h, kvh, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
        qkv = linear(x, layer_params["wqkv"], layer_params.get("bqkv"))
        q = qkv[..., :h * hd]
        k = qkv[..., h * hd:(h + kvh) * hd]
        v = qkv[..., (h + kvh) * hd:]
        q = q.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, kvh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, kvh, hd).transpose(0, 2, 1, 3)
        if cfg.pos == "rope":
            q = _rope(q, positions, cfg.rope_theta)
            k = _rope(k, positions, cfg.rope_theta)

        if self._use_attn_island(cache, chunk, s):
            # Pallas × mesh composition: append + attention run as one
            # shard_map island on (batch/data, heads/model) shards —
            # see _attn_island / _attn_island_paged / _attn_island_seq.
            if "seq" in dict(self.mesh.shape) \
                    and dict(self.mesh.shape)["seq"] > 1:
                island = self._attn_island_seq
            elif getattr(cache, "paged", False):
                island = self._attn_island_paged
            else:
                island = self._attn_island
            out, cache = island(q, k, v, cache, layer_idx)
            out = out.transpose(0, 2, 1, 3).reshape(b, s, h * hd)
            return (linear(out, layer_params["wo"],
                           layer_params.get("bo")), cache)

        # Fused-append eligibility (cfg.fused_append): the grouped
        # decode kernel writes the new K/V row itself — conditions must
        # exactly mirror the grouped path's selection below, because a
        # fallback kernel would read a cache missing the new token.
        fuse_app = (cfg.fused_append and s == 1 and cache is not None
                    and not chunk and cfg.use_pallas
                    and not getattr(cache, "paged", False)
                    and not cache.stacked
                    and cache.quant_scales is None
                    and cfg.decode_attn in ("auto", "grouped")
                    and any(b % g == 0 and b >= 2 * g for g in (8, 4, 2))
                    and (kvh * hd) % 128 == 0
                    # flash_decode_grouped_append has no internal fallback
                    # (it asserts): capacity must divide by the block the
                    # grouped path below selects (after its min() clamp).
                    and cache.capacity % min(
                        128 if cache.capacity >= 2048 else 64,
                        cache.capacity) == 0)
        if cache is not None and not fuse_app:
            # Prefill writes from 0; decode appends at each sequence's own
            # depth (continuous batching: depths differ per slot); chunked
            # verify (speculative decoding) appends a multi-token chunk at
            # per-sequence depths.
            cache = cache.append(layer_idx, k, v,
                                 position=None if (chunk or s == 1)
                                 else 0)
        if s == 1 and cache is not None:
            # Fused token-major kernel: one program per (sequence, cache
            # block) streams K+V rows for all heads once
            # (kernels/attention.py::flash_decode_fused). int8 caches
            # dequantize on the MXU inside the kernel.
            if cfg.use_pallas and getattr(cache, "paged", False):
                out = _pallas_paged_decode_attn(
                    cfg, q[:, :, 0, :], cache, layer_idx,
                    kvh)[:, :, None, :]
            elif cfg.use_pallas:
                # quant_scales is a per-layer list (never stacked, where
                # layer_idx may be traced — create() forbids the combo).
                scales = (cache.quant_scales[layer_idx]
                          if cache.quant_scales is not None else None)
                kind = cfg.decode_attn
                if scales is not None and kind == "stream":
                    kind = "fused"   # no quantized stream variant
                # v5e A/B history (BASELINE.md rounds 5-6): the
                # token-packed int8 cache supports g=16 (half the block
                # bytes of bf16 fit VMEM) and wins there; float caches
                # stay at g=8/b64 (g=16 and b128 measured slower at
                # short lives). With bf16-PAIR-PACKED scale rows
                # (round 6) the int8 kernel prefers block 128 at EVERY
                # length (the scale-row bitcast amortizes: 296 vs 363 us
                # at live 256; 310 us at live 3968 = 733 GB/s, 2.0x the
                # bf16 kernel) and g=16/b128 fits VMEM (halved sbuf).
                # int8-scores only pays at short lives below g=16.
                long_ctx = cache.capacity >= 2048
                groups = ((8, 4, 2) if scales is None
                          else (16, 8, 4, 2))
                group = next((g for g in groups if b % g == 0 and
                              b >= 2 * g), 0)
                # Block 128 pairs with the packed-scale long-cache
                # format (create() keys both on capacity >= 2048);
                # short caches keep f32 rows + block 64 (ragged
                # granularity + bitcast cost — see KVCache.create).
                blk = 128 if long_ctx else 64
                if kind == "auto":
                    # Batched-group g=8/block 64 is 1.8x the per-(seq,
                    # block) grid at batch 64 — the per-block op-issue
                    # chain amortizes over G independent sequences.
                    kind = "grouped" if group else "fused"
                if kind == "grouped" and fuse_app:
                    from ..kernels.attention import \
                        flash_decode_grouped_append
                    packed, _ = cache._pack(k, v)
                    out, new_buf = flash_decode_grouped_append(
                        q[:, :, 0, :], cache.fused_layer(layer_idx),
                        packed, cache.lengths + 1, kvh,
                        block_k=blk, group=group)
                    kv_bufs = list(cache.kv)
                    kv_bufs[layer_idx] = new_buf
                    cache = KVCache(kv_bufs, cache.lengths, None,
                                    cache.kv_heads, cache.head_dim)
                else:
                    # Grouped / stream / fused selection lives in
                    # _pallas_decode_attn (shared with the shard_map
                    # island path).
                    out = _pallas_decode_attn(cfg, q[:, :, 0, :], cache,
                                              layer_idx, kvh)
                out = out[:, :, None, :]
            else:
                from ..kernels.attention import _attn_reference
                kc, vc = cache.layer_kv(layer_idx)
                if kvh != h:
                    kc = jnp.repeat(kc, h // kvh, axis=1)
                    vc = jnp.repeat(vc, h // kvh, axis=1)
                out = _attn_reference(q, kc, vc, False,
                                      1.0 / math.sqrt(hd), cache.lengths + 1)
        elif chunk and cache is not None:
            # Chunked verify attention: the s new queries (at depths
            # lengths..lengths+s-1) attend to the FULL cache — past
            # tokens plus the just-appended chunk, causally within it.
            if (cfg.use_pallas and not getattr(cache, "paged", False)
                    and self.mesh is None):
                # (Chunked verify under a mesh takes the XLA fallback —
                # speculative decoding is a documented mesh exclusion,
                # generate/engine.py.)
                # Ragged Pallas kernel: cache reads scale with live
                # length, not capacity (kernels/attention.py). Grouped
                # form for batch >= 2*G (same A/B rationale as decode:
                # G independent per-sequence chains per program hide the
                # per-block op-issue latency).
                scales = (cache.quant_scales[layer_idx]
                          if cache.quant_scales is not None else None)
                group = next((g for g in (8, 4, 2) if b % g == 0 and
                              b >= 2 * g), 0)
                if group and cfg.decode_attn in ("auto", "grouped"):
                    from ..kernels.attention import flash_verify_grouped
                    out = flash_verify_grouped(q.transpose(0, 2, 1, 3),
                                               cache.fused_layer(layer_idx),
                                               cache.lengths, kvh,
                                               group=group,
                                               kv_scales=scales)
                else:
                    from ..kernels.attention import flash_verify_fused
                    out = flash_verify_fused(q.transpose(0, 2, 1, 3),
                                             cache.fused_layer(layer_idx),
                                             cache.lengths, kvh,
                                             kv_scales=scales)
                out = out.astype(x.dtype).transpose(0, 2, 1, 3)
            else:
                # XLA fallback: [B, H, s, cap] masked einsum (s is small
                # — draft length + 1 — so the score tile is cheap).
                kc, vc = cache.layer_kv(layer_idx)
                if kvh != h:
                    kc = jnp.repeat(kc, h // kvh, axis=1)
                    vc = jnp.repeat(vc, h // kvh, axis=1)
                cap = kc.shape[2]
                scores = jnp.einsum(
                    "bhsd,bhcd->bhsc", q.astype(jnp.float32),
                    kc.astype(jnp.float32)) / math.sqrt(hd)
                # Query i (at absolute position lengths+i) sees cache
                # rows < lengths + i + 1.
                limit = cache.lengths[:, None] + 1 + jnp.arange(s)[None, :]
                mask = jnp.arange(cap)[None, None, :] < limit[:, :, None]
                scores = jnp.where(mask[:, None, :, :], scores, -jnp.inf)
                probs = jax.nn.softmax(scores, axis=-1)
                out = jnp.einsum("bhsc,bhcd->bhsd", probs,
                                 vc.astype(jnp.float32)).astype(x.dtype)
        else:
            if kvh != h:
                k = jnp.repeat(k, h // kvh, axis=1)
                v = jnp.repeat(v, h // kvh, axis=1)
            if cfg.use_pallas:
                out = flash_attention(q, k, v, causal=True)
            else:
                from ..kernels.attention import _attn_reference
                out = _attn_reference(q, k, v, True, 1.0 / math.sqrt(hd))
        out = out.transpose(0, 2, 1, 3).reshape(b, s, h * hd)
        return linear(out, layer_params["wo"], layer_params.get("bo")), cache

    # -- Pallas × mesh composition ------------------------------------------

    def _use_attn_island(self, cache, chunk, s=1):
        """True when the append+attention pair should run as a shard_map
        island (model.mesh set + Pallas on + a supported configuration).
        Chunked verify (speculative decoding) and paged/stacked caches
        stay excluded under a mesh — the engine documents/enforces the
        same exclusions (generate/engine.py)."""
        mesh = self.mesh
        cfg = self.config
        if (mesh is None or not cfg.use_pallas or cache is None or chunk
                or cache.stacked):
            return False
        sizes = dict(mesh.shape)
        if sizes.get("seq", 1) > 1:
            # Seq-sharded Pallas decode (round 5): the cache CAPACITY
            # dim shards over `seq`; each shard runs the flat kernel in
            # partials mode with a masked owner-only append, and the
            # online-softmax states psum-merge (_attn_island_seq).
            # Decode only — prefill appends at position 0 through the
            # GSPMD paths and its attention never reads the cache.
            import os as _os
            kvh_d = cfg.n_kv_heads * cfg.head_dim
            tp_s = sizes.get("model", 1)
            dp_s = sizes.get("data", 1) * sizes.get("dcn", 1)
            batch = cache.lengths.shape[0]
            b_l = batch // dp_s if batch % dp_s == 0 else 0
            cap_l = cache.capacity // sizes["seq"]
            # The gate must mirror flash_decode_flat's partials-mode
            # requirements exactly (advisor r4 finding 1): the kernel
            # RAISES instead of falling back when partials=True, so a
            # config passing this gate but failing the kernel's shape
            # checks would error inside the jitted decode step.
            # _pallas_decode_attn picks block_k=128 when the per-shard
            # capacity >= 2048, and the E matrix must fit its 4 MB
            # VMEM budget (bf16 when RTEN_FLAT_QBF16, else f32).
            e_elt = (2 if _os.environ.get("RTEN_FLAT_QBF16", "1")
                     != "0" else 4)
            e_fit = ((-(-(cfg.n_heads // tp_s) // 8) * 8)
                     * cfg.head_dim * (kvh_d // tp_s) * e_elt
                     <= 4 * 1024 * 1024)
            return (s == 1 and cache.quant_scales is not None
                    and not getattr(cache, "paged", False)
                    and cache.tail is None
                    and not any(n > 1 and ax not in
                                ("data", "model", "dcn", "seq")
                                for ax, n in sizes.items())
                    and cfg.n_heads % tp_s == 0
                    and cfg.n_kv_heads % tp_s == 0
                    and (kvh_d // tp_s) % 128 == 0
                    # per-shard flat-kernel group must exist
                    and flat_group_for(b_l) > 0
                    and cache.capacity % (4 * sizes["seq"]) == 0
                    and cap_l % 64 == 0
                    and (cap_l < 2048 or cap_l % 128 == 0)
                    and e_fit)
        if any(n > 1 and ax not in ("data", "model", "dcn", "expert")
               for ax, n in sizes.items()):
            return False           # pipe axis: GSPMD paths
        # An `expert` axis shards only the MoE expert stacks; the KV
        # cache and attention are REPLICATED over it, so the island
        # simply runs identically on every expert shard (round-5
        # verdict item 7: MoE no longer dead-ends out of the mesh fast
        # paths — see tests/test_moe.py MoE × tail × mesh parity).
        tp = sizes.get("model", 1)
        if getattr(cache, "paged", False):
            # Paged islands: the pool's page dim shards over the batch
            # axes (each shard remaps to shard-local page ids) and the
            # feature dim over `model` (round 5: paged × TENSOR
            # parallelism via lane-grouped scale pages — each TP
            # shard's scale-page slice is a standard single-chip page
            # for its local heads).
            if cfg.n_heads % tp or cfg.n_kv_heads % tp:
                return False
            if ((cfg.n_kv_heads // tp) * cfg.head_dim) % 128:
                return False
            if tp > 1 and cache.quant_scales is not None:
                from ..generate.kv_cache import SCALE_LANES
                if cache.quant_scales[0].shape[-1] != tp * SCALE_LANES:
                    raise ValueError(
                        "quantized paged cache under a TP mesh needs "
                        "the lane-group scale-page layout: create it "
                        "via model.new_paged_cache with model.mesh set "
                        "(scale_lane_groups=tp)")
            return True
        if cfg.n_heads % tp or cfg.n_kv_heads % tp:
            return False
        if ((cfg.n_kv_heads // tp) * cfg.head_dim) % 128:
            return False           # Mosaic lane tiling on real TPUs
        if cache.quant_scales is not None:
            from ..generate.kv_cache import SCALE_LANES
            if cache.quant_scales[0].shape[-1] != tp * SCALE_LANES:
                raise ValueError(
                    "quantized cache under a mesh needs the TP scale-row"
                    " layout: create it via model.new_cache with "
                    "model.mesh set (scale_lane_groups=tp)")
        return True

    def _attn_island(self, q, k, v, cache, layer_idx):
        """Append + attention as ONE shard_map island per layer: every
        device runs the UNCHANGED single-chip Pallas kernels (quant RMW
        cache append, grouped/fused decode attention, flash prefill) on
        its local (batch/data, heads/model) shard — the TPU analog of
        the reference's parallelism living INSIDE the kernel
        (src/gemm.rs:818-837 rayon loop). The KV path needs ZERO
        collectives: per-head outputs stay head-sharded and flow into
        the row-sharded ``wo`` matmul, whose psum GSPMD already emits
        (pinned by tests/test_collectives.py).

        The quant cache's scale rows use the lane-group layout
        (KVCache.create(scale_lane_groups=tp)): each shard's local
        [.., SCALE_LANES] slice is a standard single-chip scale row for
        its kvh/tp local heads, so kernels need no lane offsets.

        q/k/v: [B, H|KVH, S, D]. Returns (out [B, H, S, D], cache)."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        cfg = self.config
        mesh = self.mesh
        b, h, s, hd = q.shape
        kvh = cfg.n_kv_heads
        tp = dict(mesh.shape).get("model", 1)
        kvh_l = kvh // tp
        quant = cache.quant_scales is not None
        has_tail = cache.tail is not None
        batch_ax = tuple(a for a in ("dcn", "data")
                         if a in mesh.axis_names) or None
        head_spec = P(batch_ax, "model", None, None)
        buf_spec = P(batch_ax, None, None, "model")
        dummy = jnp.zeros((), jnp.int32)

        def body(q_l, k_l, v_l, buf_l, sbuf_l, lens_l, tail_l, tc):
            # The tail write-buffer shards exactly like the KV buffer
            # (batch over data, head-features over model): the local
            # window IS a standard single-chip tail for the local
            # heads, and tail_count is a replicated scalar.
            local = KVCache([buf_l], lens_l,
                            [sbuf_l] if quant else None, kvh_l, hd,
                            [tail_l] if has_tail else None, tc)
            local = local.append(0, k_l, v_l,
                                 position=None if s == 1 else 0)
            if s == 1:
                out = _pallas_decode_attn(cfg, q_l[:, :, 0, :], local,
                                          0, kvh_l)[:, :, None, :]
            else:
                k_f, v_f = k_l, v_l
                if kvh_l != q_l.shape[1]:
                    rep = q_l.shape[1] // kvh_l
                    k_f = jnp.repeat(k_l, rep, axis=1)
                    v_f = jnp.repeat(v_l, rep, axis=1)
                out = flash_attention(q_l, k_f, v_f, causal=True)
            out = out.astype(q_l.dtype)
            return (out, local.kv[0],
                    local.quant_scales[0] if quant else dummy,
                    local.tail[0] if has_tail else dummy)

        out, new_buf, new_sbuf, new_tail = shard_map(
            body, mesh=mesh,
            in_specs=(head_spec, head_spec, head_spec, buf_spec,
                      buf_spec if quant else P(), P(batch_ax),
                      buf_spec if has_tail else P(), P()),
            out_specs=(head_spec, buf_spec,
                       buf_spec if quant else P(),
                       buf_spec if has_tail else P()),
            check_vma=False,
        )(q, k, v, cache.fused_layer(layer_idx),
          cache.quant_scales[layer_idx] if quant else dummy,
          cache.lengths,
          cache.tail[layer_idx] if has_tail else dummy,
          cache.tail_count if has_tail else dummy)
        kv_bufs = list(cache.kv)
        kv_bufs[layer_idx] = new_buf
        scales = None
        if quant:
            scales = list(cache.quant_scales)
            scales[layer_idx] = new_sbuf
        tail = None
        if has_tail:
            tail = list(cache.tail)
            tail[layer_idx] = new_tail
        # carry rows pass through untouched: tail-mode decode appends
        # only write the window; flush_tail owns the carry.
        return out, KVCache(kv_bufs, cache.lengths, scales,
                            cache.kv_heads, cache.head_dim, tail,
                            cache.tail_count, cache.carry,
                            cache.carry_s)

    def _attn_island_paged(self, q, k, v, cache, layer_idx):
        """Paged sibling of :meth:`_attn_island`: the pool's page dim,
        the table, and lengths shard over the batch axes; each shard
        remaps its table entries to shard-local page ids (the
        partition-aware allocator guarantees every slot's pages live in
        its shard's contiguous page range —
        generate/paged_cache.py::_PageAllocator) and runs the unchanged
        single-chip paged kernels. Under TP (round 5) heads shard over
        ``model``: the pool's feature dim and the lane-grouped scale
        pages split so each shard's local pool is a standard single-chip
        paged cache for its kvh/tp local heads."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from ..generate.paged_cache import PagedKVCache
        cfg = self.config
        mesh = self.mesh
        b, h, s, hd = q.shape
        kvh = cfg.n_kv_heads
        tp = dict(mesh.shape).get("model", 1)
        kvh_l = kvh // tp
        quant = cache.quant_scales is not None
        batch_ax = tuple(a for a in ("dcn", "data")
                         if a in mesh.axis_names) or None
        head_spec = P(batch_ax, "model", None, None)
        pool_spec = P(batch_ax, None, None, "model")
        dummy = jnp.zeros((), jnp.int32)

        def body(q_l, k_l, v_l, pool_l, spool_l, table_l, lens_l):
            npl = pool_l.shape[0]
            di = jnp.int32(0)
            for ax in (batch_ax or ()):
                di = di * jax.lax.axis_size(ax) + jax.lax.axis_index(ax)
            # Global -> shard-local page ids (unmapped -1 stays -1; its
            # clamp then lands on the shard's own garbage page 0).
            local_table = jnp.where(table_l >= 0, table_l - di * npl,
                                    table_l)
            local = PagedKVCache([pool_l], local_table, lens_l,
                                 cache.page_size, kvh_l, hd,
                                 quant_scales=[spool_l] if quant
                                 else None)
            local = local.append(0, k_l, v_l,
                                 position=None if s == 1 else 0)
            if s == 1:
                out = _pallas_paged_decode_attn(
                    cfg, q_l[:, :, 0, :], local, 0,
                    kvh_l)[:, :, None, :]
            else:
                k_f, v_f = k_l, v_l
                if kvh_l != q_l.shape[1]:
                    rep = q_l.shape[1] // kvh_l
                    k_f = jnp.repeat(k_l, rep, axis=1)
                    v_f = jnp.repeat(v_l, rep, axis=1)
                out = flash_attention(q_l, k_f, v_f, causal=True)
            return (out.astype(q_l.dtype), local.pools[0],
                    local.quant_scales[0] if quant else dummy)

        out, new_pool, new_spool = shard_map(
            body, mesh=mesh,
            in_specs=(head_spec, head_spec, head_spec, pool_spec,
                      pool_spec if quant else P(),
                      P(batch_ax, None), P(batch_ax)),
            out_specs=(head_spec, pool_spec,
                       pool_spec if quant else P()),
            check_vma=False,
        )(q, k, v, cache.pools[layer_idx],
          cache.quant_scales[layer_idx] if quant else dummy,
          cache.page_table, cache.lengths)
        pools = list(cache.pools)
        pools[layer_idx] = new_pool
        scales = None
        if quant:
            scales = list(cache.quant_scales)
            scales[layer_idx] = new_spool
        return out, PagedKVCache(pools, cache.page_table, cache.lengths,
                                 cache.page_size, cache.kv_heads,
                                 cache.head_dim, quant_scales=scales)

    def _attn_island_seq(self, q, k, v, cache, layer_idx):
        """Seq-sharded decode island (round 5): the quantized cache's
        CAPACITY dim shards over the ``seq`` mesh axis (one sequence's
        KV can exceed a chip's HBM — the long-context scaling axis).
        Each capacity shard appends ONLY the rows it owns (masked
        kernels/cache.py::cache_append_quant — non-owners pass pos=-1)
        and runs the flat decode kernel in partials mode; the
        per-shard online-softmax states (m, l) merge with one
        pmax + two psums:

            out = psum(acc * exp(m - pmax(m))) / psum(l * exp(m - pmax(m)))

        Composes with batch/data and heads/model sharding (the
        lane-grouped quant scale rows split over `model` exactly like
        :meth:`_attn_island`). Decode only; prefill appends through the
        GSPMD paths (engine admission) and never reads the cache."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from ..kernels.cache import cache_append_quant
        cfg = self.config
        mesh = self.mesh
        b, h, s, hd = q.shape
        assert s == 1
        kvh = cfg.n_kv_heads
        sizes = dict(mesh.shape)
        tp = sizes.get("model", 1)
        n_seq = sizes["seq"]
        kvh_l = kvh // tp
        cap = cache.capacity
        cap_l = cap // n_seq
        # Build specs from the axes the mesh actually has (advisor r4
        # finding 3): a hand-built Mesh with only a `seq` axis is legal
        # — hardcoding "model"/"data" would fail in shard_map with an
        # unknown-axis error (make_mesh always adds both, so only raw
        # jax.sharding.Mesh objects hit this).
        batch_ax = tuple(a for a in ("dcn", "data")
                         if a in mesh.axis_names) or None
        model_ax = "model" if "model" in mesh.axis_names else None
        head_spec = P(batch_ax, model_ax, None, None)
        buf_spec = P(batch_ax, "seq", None, model_ax)

        def body(q_l, k_l, v_l, buf_l, sbuf_l, lens_l):
            si = jax.lax.axis_index("seq")
            local = KVCache([buf_l], lens_l,
                            [sbuf_l], kvh_l, hd)
            bytes_kv, srows = local._pack(k_l, v_l)
            pos = jnp.minimum(lens_l, cap - 1) - si * cap_l
            pos = jnp.where((pos >= 0) & (pos < cap_l), pos,
                            jnp.int32(-1))
            new_buf, new_sbuf = cache_append_quant(
                pos, buf_l, sbuf_l, bytes_kv, srows, masked=True)
            # Local live count (incl. the token just appended): the
            # partials call reads lengths + 1, so store count - 1.
            lens_local = jnp.clip(lens_l + 1 - si * cap_l, 0, cap_l) - 1
            local = KVCache([new_buf], lens_local, [new_sbuf],
                            kvh_l, hd)
            part = _pallas_decode_attn(cfg, q_l[:, :, 0, :], local, 0,
                                       kvh_l, partials=True)
            acc = part[..., :hd]
            m = part[..., hd]
            li = part[..., hd + 1]
            m_g = jax.lax.pmax(m, "seq")
            w = jnp.exp(m - m_g)
            num = jax.lax.psum(acc * w[..., None], "seq")
            den = jax.lax.psum(li * w, "seq")
            out = (num / jnp.maximum(den, 1e-30)[..., None]
                   )[:, :, None, :]
            return out.astype(q_l.dtype), new_buf, new_sbuf

        out, new_buf, new_sbuf = shard_map(
            body, mesh=mesh,
            in_specs=(head_spec, head_spec, head_spec, buf_spec,
                      buf_spec, P(batch_ax)),
            out_specs=(head_spec, buf_spec, buf_spec),
            check_vma=False,
        )(q, k, v, cache.fused_layer(layer_idx),
          cache.quant_scales[layer_idx], cache.lengths)
        kv_bufs = list(cache.kv)
        kv_bufs[layer_idx] = new_buf
        scales = list(cache.quant_scales)
        scales[layer_idx] = new_sbuf
        return out, KVCache(kv_bufs, cache.lengths, scales,
                            cache.kv_heads, cache.head_dim)

    def _mlp(self, layer_params, x):
        cfg = self.config
        if "router" in layer_params:
            from .moe import moe_mlp
            return moe_mlp(x, layer_params, cfg)
        if cfg.act == "swiglu":
            gate = linear(x, layer_params["w_gate"])
            up = linear(x, layer_params["w_up"])
            return linear(jax.nn.silu(gate) * up, layer_params["w_down"])
        hidden = linear(x, layer_params["w_up"], layer_params.get("b_up"))
        hidden = jax.nn.gelu(hidden, approximate=False)
        return linear(hidden, layer_params["w_down"],
                      layer_params.get("b_down"))

    def forward(self, params, tokens, cache=None, positions=None,
                lengths=None, chunk=False):
        """tokens: [B, S] int32. Returns (logits [B, S, V], cache)."""
        x, cache = self._hidden_states(params, tokens, cache, positions,
                                       lengths, chunk)
        if self.config.tie_embeddings and "lm_head" not in params:
            logits = jnp.matmul(x, params["embed"].T.astype(x.dtype),
                                preferred_element_type=jnp.float32)
        else:
            logits = linear(x, params["lm_head"])
        return logits.astype(jnp.float32), cache

    def _hidden_states(self, params, tokens, cache=None, positions=None,
                       lengths=None, chunk=False):
        """The transformer stack through the final norm (everything but
        the LM head). Returns (hidden [B, S, D], advanced cache)."""
        cfg = self.config
        b, s = tokens.shape
        if positions is None:
            if cache is not None and (s == 1 or chunk):
                positions = cache.lengths[:, None] + jnp.arange(s)[None, :]
            else:
                positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
        x = jnp.take(params["embed"], tokens, axis=0)
        if cfg.pos == "learned":
            x = x + jnp.take(params["pos_embed"], positions, axis=0)
        x = x.astype(jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32)
        if self.activation_sharding is not None and s > 1:
            constrain = partial(jax.lax.with_sharding_constraint,
                                shardings=self.activation_sharding)
        else:
            constrain = lambda v: v  # noqa: E731
        x = constrain(x)

        if cfg.scan_layers:
            layers = params["layers"]
            if isinstance(layers, list):
                layers = stack_layer_params(layers)
            n_layers = jax.tree_util.tree_leaves(layers)[0].shape[0]
            if cache is not None and not cache.stacked:
                raise ValueError("scan_layers requires a stacked KV cache "
                                 "(new_cache builds one automatically)")

            def body(carry, xs):
                x, cache = carry
                layer, idx = xs
                attn_in = _norm(cfg, x, layer["ln1_scale"],
                                layer.get("ln1_bias"))
                attn_out, cache = self._attention(layer, attn_in,
                                                  positions, cache, idx,
                                                  lengths, chunk)
                x = x + attn_out
                mlp_in = _norm(cfg, x, layer["ln2_scale"],
                               layer.get("ln2_bias"))
                x = x + self._mlp(layer, mlp_in)
                return (x, cache), None

            (x, cache), _ = jax.lax.scan(
                body, (x, cache), (layers, jnp.arange(n_layers)))
        else:
            for i, layer in enumerate(params["layers"]):
                attn_in = _norm(cfg, x, layer["ln1_scale"],
                                layer.get("ln1_bias"))
                attn_out, cache = self._attention(layer, attn_in, positions,
                                                  cache, i, lengths, chunk)
                x = constrain(x + attn_out)
                mlp_in = _norm(cfg, x, layer["ln2_scale"],
                               layer.get("ln2_bias"))
                x = constrain(x + self._mlp(layer, mlp_in))

        x = _norm(cfg, x, params["ln_f_scale"], params.get("ln_f_bias"))
        if cache is not None:
            cache = cache.advance(1 if s == 1 else s)
        return x, cache

    # -- serving entry points ---------------------------------------------

    def prefill(self, params, tokens, cache):
        """Full-prompt forward writing the cache from position 0."""
        return self.forward(params, tokens, cache,
                            lengths=jnp.zeros(tokens.shape[0], jnp.int32))

    def prefill_last(self, params, tokens, cache, last_idx):
        """Prefill that returns ONLY each sequence's last-token logits
        ([B, V]); ``last_idx`` [B] is the index of the last real token
        per row. The full [B, S, V] logits tensor — by far the largest
        prefill intermediate (3.3 GB for a [256, 64] GPT-2 admission
        group) — is never materialized: the LM head runs on the B
        gathered hidden rows only.

        With ``model.overlap`` the projection chain runs ring-
        overlapped (parallel/tp_overlap.py::prefill_overlap — the
        big-M regime where hiding the permutes under chunk matmuls
        pays most); unsupported shapes fall back to GSPMD at trace
        time."""
        if (self.mesh is not None and getattr(self, "overlap", False)
                and not getattr(cache, "paged", False)
                and getattr(cache, "tail", None) is None
                and not cache.stacked):
            try:
                from ..parallel.tp_overlap import prefill_overlap
                return prefill_overlap(self, params, tokens, cache,
                                       last_idx)
            except ValueError:
                pass            # unsupported shape: GSPMD prefill
        x, cache = self._hidden_states(params, tokens, cache)
        xl = x[jnp.arange(x.shape[0]), last_idx]          # [B, D]
        if self.config.tie_embeddings and "lm_head" not in params:
            logits = jnp.matmul(xl, params["embed"].T.astype(xl.dtype),
                                preferred_element_type=jnp.float32)
        else:
            logits = linear(xl, params["lm_head"])
        return logits.astype(jnp.float32), cache

    def decode_step(self, params, tokens, cache):
        """tokens: [B] int32 — one token per sequence.

        With ``model.mesh`` set and ``model.overlap = True`` the step
        runs as one shard_map with ring-overlapped TP projections
        (parallel/tp_overlap.py) — sequence-parallel scattered
        residuals, collective-permute-only HLO."""
        if self.mesh is not None and getattr(self, "overlap", False):
            from ..parallel.tp_overlap import decode_step_overlap
            return decode_step_overlap(self, params, tokens, cache)
        logits, cache = self.forward(params, tokens[:, None], cache)
        return logits[:, 0], cache

    def verify_step(self, params, tokens, cache):
        """Speculative-decoding verification (chunked decode). ``tokens``
        [B, S]: each row is [last committed token, draft_1..draft_{S-1}],
        appended at the sequence's current depth; the S queries attend to
        the full cache. Returns (logits [B, S, V], cache with lengths
        UNCHANGED — the caller advances by the accepted count via
        ``with_lengths``; rows written past the accepted prefix are
        overwritten by later appends and masked until then)."""
        logits, new_cache = self.forward(params, tokens, cache, chunk=True)
        return logits, new_cache.with_lengths(cache.lengths)

    def decode_step_argmax(self, params, tokens, cache):
        """Greedy decode step via the fused LM-head+argmax kernel: the
        [B, vocab] logits — the step's largest intermediate — are never
        materialized, and the lm-head→argmax kernel pair collapses to one
        weight-stream pass (kernels/gemm.py::matmul_argmax_int8). Only
        int8-quantized heads take the fused path; float heads fall back
        to exact f32 logits + argmax so unquantized outputs are
        bit-identical to ``decode_step``. Returns (tokens [B], cache)."""
        head = params.get("lm_head")
        if not (isinstance(head, QuantWeight) and head.kind == "int8"):
            logits, cache = self.decode_step(params, tokens, cache)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache
        x, cache = self._hidden_states(params, tokens[:, None], cache)
        nxt = gk.matmul_argmax_int8(x[:, 0].astype(jnp.float32),
                                    head.data, head.scales)
        return nxt, cache

    def new_cache(self, batch, capacity=None, quantized=False,
                  cache_dtype=None, tail_window=0):
        """``cache_dtype``: override KV storage dtype (e.g. "bfloat16"
        under f32 compute — halves decode cache bandwidth; attention
        reads it through the Pallas kernel which upconverts in VMEM).
        ``tail_window``: bf16 decode write-buffer depth (quantized
        caches; see generate/kv_cache.py) — the serving engine enables
        it for the single-chip flat-kernel configuration."""
        cfg = self.config
        dtype = jnp.dtype(cache_dtype) if cache_dtype else (
            jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32)
        # Pallas-under-mesh (model.mesh set): quant scale rows take the
        # TP lane-group layout so each shard's local slice is a standard
        # single-chip scale row (see _attn_island / KVCache.create).
        lane_groups = 1
        if quantized and self.mesh is not None and cfg.use_pallas:
            lane_groups = dict(self.mesh.shape).get("model", 1)
        return KVCache.create(batch, cfg.n_layers, cfg.n_kv_heads,
                              capacity or cfg.max_seq_len, cfg.head_dim,
                              dtype=dtype, quantized=quantized,
                              stacked=cfg.scan_layers,
                              scale_lane_groups=lane_groups,
                              tail_window=tail_window)

    def new_paged_cache(self, batch, capacity, page_size, n_pages,
                        identity_table=False, quantized=False):
        """Block-paged cache (generate/paged_cache.py). With
        ``identity_table`` the table is pre-mapped 0..B*P-1 — used for
        prefill group caches, where every sequence owns its pages."""
        from ..generate.paged_cache import PagedKVCache
        cfg = self.config
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        max_pages = -(-capacity // page_size)
        # Pallas-under-mesh: quant scale PAGES take the TP lane-group
        # layout, mirroring new_cache (see _attn_island_paged).
        lane_groups = 1
        if quantized and self.mesh is not None and cfg.use_pallas:
            lane_groups = dict(self.mesh.shape).get("model", 1)
        cache = PagedKVCache.create(cfg.n_layers, n_pages, page_size,
                                    cfg.n_kv_heads, cfg.head_dim, batch,
                                    max_pages, dtype=dtype,
                                    quantized=quantized,
                                    scale_lane_groups=lane_groups)
        if identity_table:
            assert n_pages >= batch * max_pages
            table = jnp.arange(batch * max_pages,
                               dtype=jnp.int32).reshape(batch, max_pages)
            cache = PagedKVCache(cache.pools, table, cache.lengths,
                                 page_size, cfg.n_kv_heads, cfg.head_dim,
                                 quant_scales=cache.quant_scales)
        return cache
