"""Pallas flash-attention kernels: prefill (blockwise online-softmax
self-attention) and decode (single-query attention against a padded KV
cache).

The reference has no attention kernels at all — its transformer graphs
materialize QK^T through generic MatMul/Softmax ops
(SURVEY.md §5 long-context notes). On TPU, materializing [S, S] scores in
HBM is the bandwidth bottleneck, so these kernels keep the score tile in
VMEM with the online-softmax recurrence (running max/sum), which is the
standard flash-attention formulation.

Layouts: q/k/v are [batch, heads, seq, head_dim]. GQA is supported by
passing kv with fewer heads and ``q_per_kv > 1``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round8(n: int) -> int:
    return -(-n // 8) * 8


def _scale_selector(onehot, dtype):
    """Stacked K/V scale selector for the token-packed int8 cache's
    in-kernel dequant: given the per-row head map ``onehot`` [R, KVH],
    returns [2·R8, SCALE_LANES] (R8 = R rounded to a sublane multiple)
    where rows [0, R) select K's scale lane g(r) and rows [R8, R8+R)
    select V's (offset VSCALE_OFF). ONE MXU dot against a [blk, SL]
    scale-row tile expands BOTH planes' per-(token, row) factors —
    merging what used to be two dots on the per-block dependent chain.
    The row padding keeps the V slice's sublane offset 8-aligned; padded
    rows are zero (they select nothing). ``dtype`` matches the scale
    rows' storage (bf16 rows halve the scale DMA traffic; the MXU
    accumulates the selection in f32 either way)."""
    from ..generate.kv_cache import SCALE_LANES, VSCALE_OFF
    r, kvh = onehot.shape
    r8 = _round8(r)
    k_sel = jnp.pad(onehot, ((0, r8 - r), (0, SCALE_LANES - kvh)))
    v_sel = jnp.pad(onehot, ((0, r8 - r),
                             (VSCALE_OFF, SCALE_LANES - VSCALE_OFF - kvh)))
    return jnp.concatenate([k_sel, v_sel], axis=0).astype(dtype)


def _attn_reference(q, k, v, causal, scale, lengths=None):
    """jnp reference (used for tests and as a fallback for tiny shapes)."""
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    s_q, s_k = q.shape[2], k.shape[2]
    if causal:
        mask = jnp.tril(jnp.ones((s_q, s_k), bool), s_k - s_q)
        scores = jnp.where(mask, scores, _NEG_INF)
    if lengths is not None:
        kmask = jnp.arange(s_k)[None, :] < lengths[:, None]
        scores = jnp.where(kmask[:, None, None, :], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


# ---------------------------------------------------------------------------
# Prefill kernel
# ---------------------------------------------------------------------------

def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                  *, scale, causal, block_q, block_k, n_k):
    kb = pl.program_id(3)

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qb = pl.program_id(2)
    q = q_ref[0, 0]                                # [block_q, d]
    k = k_ref[0, 0]                                # [block_k, d]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale

    if causal:
        q_pos = qb * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        k_pos = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        s = jnp.where(q_pos >= k_pos, s, _NEG_INF)

    m_prev = m_ref[:]                              # [block_q, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, v_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[:] = m_new

    @pl.when(kb == n_k - 1)
    def _():
        o_ref[0, 0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(
            o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("causal", "scale", "block_q", "block_k"))
def flash_attention(q, k, v, causal=True, scale=None, block_q=128,
                    block_k=128):
    """Blockwise flash attention. q/k/v: [B, H, S, D] (same seq len)."""
    b, h, s_q, d = q.shape
    s_k = k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if s_q < 8 or s_k < block_k or d % 128:
        # Tiny or ragged shapes: XLA's fused path is fine.
        return _attn_reference(q, k, v, causal, scale)
    block_q = min(block_q, s_q)
    block_k = min(block_k, s_k)
    if s_q % block_q or s_k % block_k:
        return _attn_reference(q, k, v, causal, scale)
    n_k = s_k // block_k

    grid = (b, h, s_q // block_q, n_k)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, causal=causal,
                          block_q=block_q, block_k=block_k, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d),
                         lambda bb, hh, qq, kk: (bb, hh, qq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bb, hh, qq, kk: (bb, hh, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda bb, hh, qq, kk: (bb, hh, kk, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda bb, hh, qq, kk: (bb, hh, qq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),   # running max
            pltpu.VMEM((block_q, 1), jnp.float32),   # running sum
            pltpu.VMEM((block_q, d), jnp.float32),   # output accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_q * s_k * d,
            bytes_accessed=q.size * 4 + k.size * 4 + v.size * 4,
            transcendentals=b * h * s_q * s_k),
        interpret=_interpret(),
    )(q, k, v)
    return out


# ---------------------------------------------------------------------------
# Decode kernel
# ---------------------------------------------------------------------------

def _decode_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref,
                   acc_ref, *, scale, block_k, n_k):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    b = pl.program_id(0)
    length = len_ref[b]

    # Ragged skip (see _decode_fused_kernel): DMA for blocks past the
    # live length was elided by the clamped index map; skip compute.
    @pl.when(kb * block_k < length)
    def _():
        q = q_ref[0, 0]                            # [q_heads, d]
        k = k_ref[0, 0]                            # [block_k, d]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        k_pos = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        s = jnp.where(k_pos < length, s, _NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p, v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = m_new

    @pl.when(kb == n_k - 1)
    def _():
        o_ref[0, 0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(
            o_ref.dtype)


def _decode_fused_kernel(len_ref, q_ref, onehot_ref, kv_ref, o_ref, m_ref,
                         l_ref, acc_ref, *, scale, block_k, n_k,
                         scales_ref=None, chunk_s=0):
    """``chunk_s``: 0 = single-query decode; > 0 = chunked verify with
    ``chunk_s`` query tokens per sequence (speculative decoding). The
    q block then holds chunk_s×H block-diagonal rows (query-major) and
    row r's query sits at absolute position lengths[b] + r//H, seeing
    cache rows < lengths[b] + r//H + 1 (the chunk itself was appended
    at lengths before the call)."""
    kb = pl.program_id(1)
    b = pl.program_id(0)

    @pl.when(kb == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    length = len_ref[b] + chunk_s   # valid cache rows incl. the chunk

    # Ragged skip: blocks past the sequence's length contribute nothing
    # (fully masked), their DMA was elided by the clamped index map
    # (same block index as the previous grid step → Mosaic skips the
    # fetch), and the compute is skipped here — cache reads scale with
    # the LIVE sequence length, not the allocated capacity.
    @pl.when(kb * block_k < length)
    def _():
        q = q_ref[0]                       # [H, KVH*D] block-diag rows
        h = q.shape[0]
        if scales_ref is not None:
            # Token-packed int8 cache (generate/kv_cache.py): the
            # sublane bitcast IS the unpack — byte b of int32 row r is
            # token 4r+b, so one bitcast per plane yields the canonical
            # [block_k, F] int8 tile with zero shift arithmetic.
            x = kv_ref[0]                               # [blk/4, 2, F]
            kblk = pltpu.bitcast(x[:, 0], jnp.int8)     # [block_k, F]
            vblk = pltpu.bitcast(x[:, 1], jnp.int8)
        else:
            kblk = kv_ref[0, :, 0, :]                   # [block_k, KVH*D]
            vblk = kv_ref[0, :, 1, :]

        # Row h of q is zero outside its kv head's column block, so ONE
        # dot against the full token-major rows yields exactly the
        # per-head scores — the MXU does the head selection (no
        # in-kernel slicing, which costs cross-lane relayouts).
        s = jax.lax.dot_general(q, kblk.astype(q.dtype),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if scales_ref is not None:
            # Per-(token, head) scales live in rows [block_k, 128]
            # (K at lanes [0, KVH), V at [VSCALE_OFF, +KVH)). Row h of
            # the score matrix only touched head g(h)'s columns, so K's
            # dequant factors OUT of the dot: s[h, t] *= kscale[t, g(h)],
            # and V's folds into P below. The stacked selector
            # (_scale_selector, [2·H8, 128]) expands BOTH planes' factors
            # in ONE MXU dot -> [2·H8, block_k].
            if scales_ref.dtype == jnp.int32:
                # bf16-pair-packed rows: bitcast IS the unpack.
                srow = pltpu.bitcast(scales_ref[0, :, 0, :],
                                     jnp.bfloat16)  # [block_k, 128]
            else:
                srow = scales_ref[0, :, 0, :]       # [block_k, 128]
            h8 = onehot_ref.shape[0] // 2
            kvs = jax.lax.dot_general(
                onehot_ref[:], srow, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)     # [2*H8, block_k]
            s = s * kvs[:h]
        k_pos = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (h, block_k), 1)
        if chunk_s:
            # Per-row causal limit: row r is query r // H at absolute
            # position len_ref[b] + r//H.
            heads = h // chunk_s
            qi = jax.lax.broadcasted_iota(jnp.int32, (h, block_k),
                                          0) // heads
            limit = len_ref[b] + qi + 1
        else:
            limit = length
        s = jnp.where(k_pos < limit, s, _NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        if scales_ref is not None:
            # V's dequant folds into P before the PV dot: row h only
            # reads head g(h)'s V columns, so
            # p'[h, t] = p[h, t] * vscale[t, g(h)] (from the merged
            # expansion above; the V rows start at the 8-aligned H8).
            p = p * kvs[h8:h8 + h]
        # P @ V over full rows: row h's slice at its head's columns is
        # the true output; the caller extracts the block diagonal.
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p, vblk.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = m_new

    @pl.when(kb == n_k - 1)
    def _():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(
            o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kv_heads", "scale", "block_k"))
def flash_decode_fused(q, kv, lengths, kv_heads, scale=None, block_k=128,
                       kv_scales=None):
    """Single-step decode attention over the token-major fused cache.

    q: [B, H, D] (one query token per sequence);
    kv: [B, cap, 2, KVH*D] — the KVCache fused layout (plane 0 = K,
    plane 1 = V). int8 storage: pass the token-packed cache
    (int32 [B, cap/4, 2, KVH*D], generate/kv_cache.py) with
    ``kv_scales`` [B, cap, 1, 128] per-token scale rows (f32 or the
    cache's bf16 SCALE_DTYPE) —
    dequantization happens on the MXU (see kernel), so the cache
    streams at 1 B/elt;
    lengths: [B] int32 — number of valid cache entries per sequence.

    One program per (sequence, cache block) streams the block's
    token-major rows once (K and V for ALL heads — bandwidth-optimal).
    Head separation happens on the MXU: q is expanded to block-diagonal
    [H, KVH*D] rows outside the kernel, one dot against the full rows
    gives per-head scores, and P·V accumulates [H, KVH*D] whose block
    diagonal is the output (extracted by a tiny einsum afterwards). The
    extra MXU flops are negligible at decode sizes; in exchange the
    kernel has zero in-kernel slicing and folds the old per-(batch,
    kv-head) grid (B·KVH·n_k programs) down to B·n_k."""
    b, h, d = q.shape
    hd_tot = kv_heads * d
    quant = kv_scales is not None
    if quant:
        # Token-packed int8 cache (generate/kv_cache.py): int32
        # [B, cap/4, 2, hd_tot] + scale rows [B, cap, 1, 128]
        # (K scales at lanes [0, KVH), V at [VSCALE_OFF, +KVH)).
        _, rows, planes, lanes = kv.shape
        s_max = rows * 4
        assert planes == 2 and lanes == hd_tot and kv.dtype == jnp.int32
    else:
        _, s_max, planes, lanes = kv.shape
        assert planes == 2 and lanes == hd_tot
    assert h % kv_heads == 0
    q_per_kv = h // kv_heads
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    block_k = min(block_k, s_max)
    if s_max % block_k or block_k % 4:
        # Ragged capacities: jnp fallback with the same masking semantics.
        from ..generate.kv_cache import VSCALE_OFF, unpack_int8_tokens
        if quant:
            kq = unpack_int8_tokens(kv[:, :, 0])
            vq = unpack_int8_tokens(kv[:, :, 1])
            s_rows = kv_scales[:, :, 0]
            if kv_scales.dtype == jnp.int32:
                from ..generate.kv_cache import unpack_bf16_rows
                s_rows = unpack_bf16_rows(s_rows)
            raw = {0: (kq, s_rows[:, :, :kv_heads]),
                   1: (vq, s_rows[:, :, VSCALE_OFF:VSCALE_OFF + kv_heads])}

        def plane(i):
            if quant:
                x, s = raw[i]
                x = (x.reshape(b, s_max, kv_heads, d).astype(jnp.float32)
                     * s[..., None])
            else:
                x = kv[:, :, i].reshape(b, s_max, kv_heads, d)
            return jnp.repeat(x.transpose(0, 2, 1, 3), q_per_kv, axis=1)
        return _attn_reference(q[:, :, None, :], plane(0), plane(1), False,
                               scale, lengths)[:, :, 0, :]
    n_k = s_max // block_k

    # Head→kv-head one-hot [H, KVH]; block-diagonal expansion and final
    # extraction are tiny XLA fusions ([B, H, KVH*D] ≈ hundreds of KB).
    onehot = jnp.eye(kv_heads, dtype=jnp.float32).repeat(q_per_kv, axis=0)
    q_full = (q[:, :, None, :] * onehot[None, :, :, None].astype(q.dtype)
              ).reshape(b, h, hd_tot)

    def kv_index(bb, kk, lens):
        # Ragged clamp: blocks past the sequence's live length map to
        # its LAST valid block — Mosaic skips the DMA when the index is
        # unchanged from the previous grid step, so cache bandwidth
        # scales with the live length, not the allocated capacity (the
        # kernel body also skips their compute).
        last = jnp.maximum(pl.cdiv(lens[bb], block_k) - 1, 0)
        return (bb, jnp.minimum(kk, last), 0, 0)

    if quant:
        # Stacked K/V scale selector (see _scale_selector): one merged
        # MXU dot per block expands both planes' per-(token, head)
        # factors; padding lanes/rows are zero, so the dot selects
        # exactly the real heads' scales.
        from ..generate.kv_cache import SCALE_LANES
        oh_s = _scale_selector(
            onehot, jnp.bfloat16 if kv_scales.dtype == jnp.int32
            else kv_scales.dtype)
        oh_arg, oh_block = oh_s, oh_s.shape
        kv_block = (1, block_k // 4, 2, hd_tot)

        def kv_index(bb, kk, lens):          # noqa: F811 (quant layout)
            last = jnp.maximum(pl.cdiv(lens[bb], block_k) - 1, 0)
            return (bb, jnp.minimum(kk, last), 0, 0)
    else:
        oh_arg, oh_block = onehot, (h, kv_heads)
        kv_block = (1, block_k, 2, hd_tot)

    in_specs = [
        pl.BlockSpec((1, h, hd_tot), lambda bb, kk, lens: (bb, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(oh_block, lambda bb, kk, lens: (0, 0),
                     memory_space=pltpu.VMEM),   # head one-hot
        # One block spans BOTH planes (K and V arrive together; Mosaic
        # requires the last-two block dims be full or 8/128-aligned, so
        # the plane dim must be whole anyway).
        pl.BlockSpec(kv_block, kv_index, memory_space=pltpu.VMEM),
    ]
    args = [jnp.asarray(lengths, jnp.int32), q_full, oh_arg, kv]
    kernel = functools.partial(_decode_fused_kernel, scale=scale,
                               block_k=block_k, n_k=n_k)
    if quant:
        def sc_index(bb, kk, lens):
            last = jnp.maximum(pl.cdiv(lens[bb], block_k) - 1, 0)
            return (bb, jnp.minimum(kk, last), 0, 0)

        sc_block = (block_k // 2 if kv_scales.dtype == jnp.int32
                    else block_k)
        in_specs.append(pl.BlockSpec(
            (1, sc_block, 1, SCALE_LANES), sc_index,
            memory_space=pltpu.VMEM))
        args.append(kv_scales)

        def kernel(len_ref, q_ref, oh_ref, kv_ref, s_ref, *rest):
            return _decode_fused_kernel(len_ref, q_ref, oh_ref, kv_ref,
                                        *rest, scale=scale, block_k=block_k,
                                        n_k=n_k, scales_ref=s_ref)

    out_full = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,   # lengths
            grid=(b, n_k),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, h, hd_tot),
                                   lambda bb, kk, lens: (bb, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((h, 1), jnp.float32),
                pltpu.VMEM((h, 1), jnp.float32),
                pltpu.VMEM((h, hd_tot), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, hd_tot), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_max * hd_tot,
            bytes_accessed=kv.size * kv.dtype.itemsize + 8 * b * h * hd_tot,
            transcendentals=b * h * s_max),
        interpret=_interpret(),
    )(*args)
    # Extract the block diagonal: out[b, h] = out_full[b, h, g(h) block].
    out4 = out_full.reshape(b, h, kv_heads, d)
    return jnp.einsum("bhgd,hg->bhd", out4, onehot.astype(out4.dtype))


def _decode_stream_kernel(len_ref, q_ref, kv_hbm, o_ref, *, scale,
                          block_k, h, hd_tot):
    """One program per SEQUENCE; cache blocks stream through a
    double-buffered manual DMA loop whose trip count is the sequence's
    LIVE block count. Replaces the (batch × n_blocks) grid of
    ``flash_decode_fused``, whose fixed per-grid-step cost dominated at
    large batch (measured ~1 us/step on v5e — 256 steps/layer at batch
    64 vs 64 programs here)."""
    b = pl.program_id(0)
    length = len_ref[b]
    n_blocks = pl.cdiv(length, block_k)

    def body(buf, sem, m_ref, l_ref, acc_ref):
        def get_dma(slot, blk):
            return pltpu.make_async_copy(
                kv_hbm.at[b, pl.ds(blk * block_k, block_k)],
                buf.at[slot], sem.at[slot])

        get_dma(0, 0).start()
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        q = q_ref[0]                               # [H, KVH*D] block-diag

        def loop(i, _):
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_blocks)
            def _():
                get_dma(jax.lax.rem(i + 1, 2), i + 1).start()

            get_dma(slot, i).wait()
            kblk = buf[slot, :, 0, :]              # [block_k, KVH*D]
            vblk = buf[slot, :, 1, :]
            s = jax.lax.dot_general(
                q, kblk.astype(q.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            k_pos = i * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (h, block_k), 1)
            s = jnp.where(k_pos < length, s, _NEG_INF)
            m_prev = m_ref[:]
            m_new = jnp.maximum(m_prev,
                                jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
                p, vblk.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_ref[:] = m_new
            return 0

        jax.lax.fori_loop(0, n_blocks, loop, 0)
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(
            o_ref.dtype)

    pl.run_scoped(
        body,
        buf=pltpu.VMEM((2, block_k, 2, hd_tot), kv_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA((2,)),
        m_ref=pltpu.VMEM((h, 1), jnp.float32),
        l_ref=pltpu.VMEM((h, 1), jnp.float32),
        acc_ref=pltpu.VMEM((h, hd_tot), jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("kv_heads", "scale", "block_k"))
def flash_decode_stream(q, kv, lengths, kv_heads, scale=None, block_k=256):
    """Single-step decode attention, one program per sequence with an
    in-kernel double-buffered DMA loop over live cache blocks (float
    caches only; the quantized cache keeps ``flash_decode_fused``).

    Same math/contract as :func:`flash_decode_fused`: q [B, H, D],
    kv [B, cap, 2, KVH*D] token-major fused cache, lengths [B]."""
    b, h, d = q.shape
    hd_tot = kv_heads * d
    _, s_max, planes, lanes = kv.shape
    assert planes == 2 and lanes == hd_tot
    assert h % kv_heads == 0
    q_per_kv = h // kv_heads
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    block_k = min(block_k, s_max)
    if s_max % block_k:
        return flash_decode_fused(q, kv, lengths, kv_heads, scale=scale)

    onehot = jnp.eye(kv_heads, dtype=jnp.float32).repeat(q_per_kv, axis=0)
    q_full = (q[:, :, None, :] * onehot[None, :, :, None].astype(q.dtype)
              ).reshape(b, h, hd_tot)

    out_full = pl.pallas_call(
        functools.partial(_decode_stream_kernel, scale=scale,
                          block_k=block_k, h=h, hd_tot=hd_tot),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,   # lengths
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, h, hd_tot), lambda bb, lens: (bb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),      # kv stays in HBM
            ],
            out_specs=pl.BlockSpec((1, h, hd_tot),
                                   lambda bb, lens: (bb, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, hd_tot), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_max * hd_tot,
            bytes_accessed=kv.size * kv.dtype.itemsize + 8 * b * h * hd_tot,
            transcendentals=b * h * s_max),
        interpret=_interpret(),
    )(jnp.asarray(lengths, jnp.int32), q_full, kv)
    out4 = out_full.reshape(b, h, kv_heads, d)
    return jnp.einsum("bhgd,hg->bhd", out4, onehot.astype(out4.dtype))


def _decode_grouped_kernel(len_ref, q_ref, kv_hbm, o_ref, *, scale,
                           block_k, h, hd_tot, group, chunk_s=0,
                           native_dots=False):
    """G sequences per program, kept as a leading BATCH dim. v5e
    measurement: one-sequence programs spend ~1.4 us/block in the
    dependent op chain (dot -> max -> exp -> dot issue latencies),
    leaving HBM at ~1/3 utilization. The G per-sequence chains here are
    mutually independent ([G, ...] batched dots / VPU ops), so the
    compiler can interleave them and hide the issue latency — without
    the G-times contraction waste of a cross-sequence block-diagonal
    (measured 2x SLOWER: q [G*H, G*F] made every score element contract
    G*F instead of F).

    ``chunk_s``: 0 = single-query decode; > 0 = chunked verify
    (speculative decoding) with chunk_s queries per sequence — the q
    block rows are then query-major [chunk_s*H] and row r's query sits
    at absolute position lengths[g] + r//H (causal within the chunk,
    which was appended at lengths before the call)."""
    p = pl.program_id(0)

    def body(buf, sem, m_ref, l_ref, acc_ref):
        lens = [len_ref[p * group + g] for g in range(group)]
        max_len = lens[0]
        for g in range(1, group):
            max_len = jnp.maximum(max_len, lens[g])
        n_blocks = pl.cdiv(max_len + chunk_s, block_k)

        # ONE strided DMA fetches the whole group's block: every member
        # reads the SAME block index (raggedness is handled by masking,
        # n_blocks is the group max), so the [G, block_k, 2, F] slice is
        # a single 4D descriptor. Per-member copies were 2*G scalar-unit
        # DMA issues per block — at batch 256 / live 256 that is ~2k
        # starts+waits per call and was the dominant short-live cost
        # (~196 GB/s effective vs the same kernel's 733 GB/s at long
        # lives). Slicing dims 0-1 keeps the tiled trailing pair whole.
        def dma(slot, blk):
            return pltpu.make_async_copy(
                kv_hbm.at[pl.ds(p * group, group),
                          pl.ds(blk * block_k, block_k)],
                buf.at[slot], sem.at[slot])

        def start(slot, blk):
            dma(slot, blk).start()

        def wait(slot, blk):
            dma(slot, blk).wait()

        start(0, 0)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        q = q_ref[0]                       # [G, H, F] head-block-diag
        # Per-sequence length limits broadcast over [G, H, block_k].
        g_of = jax.lax.broadcasted_iota(jnp.int32, (group, h, block_k), 0)
        limit = jnp.zeros((group, h, block_k), jnp.int32)
        for g in range(group):
            limit = jnp.where(g_of == g, lens[g], limit)
        if chunk_s:
            # Per-row causal limit: row r is query r // heads at absolute
            # position lengths[g] + r//heads (sees that row inclusive).
            heads = h // chunk_s
            qi = jax.lax.broadcasted_iota(jnp.int32, (group, h, block_k),
                                          1) // heads
            limit = limit + qi + 1

        def loop(i, _):
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_blocks)
            def _():
                start(jax.lax.rem(i + 1, 2), i + 1)

            wait(slot, i)
            kblk = buf[slot, :, :, 0, :]           # [G, block_k, F]
            vblk = buf[slot, :, :, 1, :]
            # Batched dots: contraction F per element, batch over G —
            # G independent MXU ops the scheduler can pipeline. With
            # ``native_dots`` (wrapper pre-cast q to the cache dtype),
            # kblk.astype is a no-op and the PV dot runs in the cache
            # dtype too — for bf16 caches under f32 compute this drops
            # the two [G, blk, F] upconverts from the dependent chain
            # and turns multi-pass f32 MXU dots into native bf16 ones
            # (f32 accumulation either way).
            s = jax.lax.dot_general(
                q, kblk.astype(q.dtype),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale  # [G, H, blk]
            k_pos = i * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (group, h, block_k), 2)
            s = jnp.where(k_pos < limit, s, _NEG_INF)
            m_prev = m_ref[:]
            m_new = jnp.maximum(m_prev,
                                jnp.max(s, axis=2, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            pmat = jnp.exp(s - m_new)
            l_ref[:] = (l_ref[:] * alpha
                        + jnp.sum(pmat, axis=2, keepdims=True))
            pv = pmat.astype(vblk.dtype) if native_dots else pmat
            acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
                pv, vblk if native_dots else vblk.astype(jnp.float32),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)            # [G, H, F]
            m_ref[:] = m_new
            return 0

        jax.lax.fori_loop(0, n_blocks, loop, 0)
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(
            o_ref.dtype)

    pl.run_scoped(
        body,
        buf=pltpu.VMEM((2, group, block_k, 2, hd_tot), kv_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA((2,)),
        m_ref=pltpu.VMEM((group, h, 1), jnp.float32),
        l_ref=pltpu.VMEM((group, h, 1), jnp.float32),
        acc_ref=pltpu.VMEM((group, h, hd_tot), jnp.float32),
    )


def _decode_grouped_quant_kernel(len_ref, q_ref, oh_ref, kv_hbm, sc_hbm,
                                 o_ref, *, scale, block_k, h, hd_tot,
                                 group, scale_lanes, chunk_s=0,
                                 qs_ref=None, pv_int8=False):
    """Token-packed int8 sibling of :func:`_decode_grouped_kernel`: the
    packed int32 cache rows stream at 1 B/elt and the sublane bitcast IS
    the unpack (byte b of int32 row r = token 4r+b — the layout in
    generate/kv_cache.py is the bitcast's exact inverse), so the block's
    dependent op chain carries no shift arithmetic. Per-(token, head)
    scale expansion runs on the MXU via the padded one-hot (K's scale
    factors out of the score dot; V's folds into P). With ``qs_ref``
    (per-row q scales), q arrives row-quantized int8 and the score dot
    runs as a genuine int8×int8 MXU contraction (int32 accumulate) —
    zero per-element VPU work on the K plane; otherwise K converts
    int8→q.dtype (one op) and the math matches the float kernel
    bit-for-bit given dequantized values. ``chunk_s`` as in
    :func:`_decode_grouped_kernel` (chunked verify)."""
    p = pl.program_id(0)
    blk4 = block_k // 4
    # Packed scale rows (int32, 2 tokens/row) halve the scale stream;
    # legacy f32 per-token rows are still accepted (tests, tools).
    sc_packed = sc_hbm.dtype == jnp.int32
    sc_rows = block_k // 2 if sc_packed else block_k

    def body(buf, sbuf, sem, ssem, m_ref, l_ref, acc_ref):
        lens = [len_ref[p * group + g] for g in range(group)]
        max_len = lens[0]
        for g in range(1, group):
            max_len = jnp.maximum(max_len, lens[g])
        n_blocks = pl.cdiv(max_len + chunk_s, block_k)

        # One strided DMA per block for the packed rows and one for the
        # scale rows (same group-wide-block rationale as the float
        # kernel: per-member copies cost 2*G scalar DMA issues per
        # block and dominated short-live time).
        def dmas(slot, blk):
            return (pltpu.make_async_copy(
                        kv_hbm.at[pl.ds(p * group, group),
                                  pl.ds(blk * blk4, blk4)],
                        buf.at[slot], sem.at[slot]),
                    pltpu.make_async_copy(
                        sc_hbm.at[pl.ds(p * group, group),
                                  pl.ds(blk * sc_rows, sc_rows)],
                        sbuf.at[slot], ssem.at[slot]))

        def start(slot, blk):
            for c in dmas(slot, blk):
                c.start()

        def wait(slot, blk):
            for c in dmas(slot, blk):
                c.wait()

        start(0, 0)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        q = q_ref[0]                       # [G, H, F] head-block-diag
        oh = oh_ref[0]                     # [G, H, 2*SCALE_LANES]
        g_of = jax.lax.broadcasted_iota(jnp.int32, (group, h, block_k), 0)
        limit = jnp.zeros((group, h, block_k), jnp.int32)
        for g in range(group):
            limit = jnp.where(g_of == g, lens[g], limit)
        if chunk_s:
            heads = h // chunk_s
            qi = jax.lax.broadcasted_iota(jnp.int32, (group, h, block_k),
                                          1) // heads
            limit = limit + qi + 1

        def loop(i, _):
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_blocks)
            def _():
                start(jax.lax.rem(i + 1, 2), i + 1)

            wait(slot, i)
            kblk = pltpu.bitcast(buf[slot, :, :, 0], jnp.int8)  # [G,blk,F]
            vblk = pltpu.bitcast(buf[slot, :, :, 1], jnp.int8)
            if sc_packed:
                # The sublane bitcast IS the unpack: [G, blk/2, SL]
                # int32 -> [G, blk, SL] bf16 (token 2r in the low half).
                srow = pltpu.bitcast(sbuf[slot, :, :, 0, :],
                                     jnp.bfloat16)
            else:
                srow = sbuf[slot, :, :, 0, :]      # [G, block_k, SL]
            if qs_ref is not None:
                s = jax.lax.dot_general(
                    q, kblk, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32
                ).astype(jnp.float32) * (qs_ref[0] * scale)  # [G, H, blk]
            else:
                s = jax.lax.dot_general(
                    q, kblk.astype(q.dtype),
                    (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32) * scale
            # ONE merged scale-expansion dot for both planes (the
            # stacked selector, _scale_selector): [G, 2*H8, blk]; K's
            # factors are rows [:h], V's start at the 8-aligned H8.
            h8 = oh.shape[1] // 2
            kvs = jax.lax.dot_general(
                oh, srow, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            s = s * kvs[:, :h]
            k_pos = i * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (group, h, block_k), 2)
            s = jnp.where(k_pos < limit, s, _NEG_INF)
            m_prev = m_ref[:]
            m_new = jnp.maximum(m_prev,
                                jnp.max(s, axis=2, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            pmat = jnp.exp(s - m_new)
            l_ref[:] = (l_ref[:] * alpha
                        + jnp.sum(pmat, axis=2, keepdims=True))
            pmat = pmat * kvs[:, h8:h8 + h]
            if pv_int8:
                # Row-quantize the scale-folded probabilities so the PV
                # dot runs int8×int8 on the MXU: the [G, blk, F] V
                # upconvert — the block's largest VPU op — disappears;
                # the dequant multiply moves to the [G, H, F] result.
                # pmat >= 0, so the row scale is just rowmax/127.
                rmax = jnp.max(pmat, axis=2, keepdims=True)
                pq = jnp.maximum(rmax, 1e-30) / 127.0
                p8 = jnp.round(pmat / pq).astype(jnp.int8)
                pv32 = jax.lax.dot_general(
                    p8, vblk, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32)          # [G, H, F]
                acc_ref[:] = (acc_ref[:] * alpha
                              + pv32.astype(jnp.float32) * pq)
            else:
                acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
                    pmat, vblk.astype(jnp.float32),
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)        # [G, H, F]
            m_ref[:] = m_new
            return 0

        jax.lax.fori_loop(0, n_blocks, loop, 0)
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(
            o_ref.dtype)

    pl.run_scoped(
        body,
        buf=pltpu.VMEM((2, group, block_k // 4, 2, hd_tot), jnp.int32),
        sbuf=pltpu.VMEM((2, group, sc_rows, 1, scale_lanes),
                        sc_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA((2,)),
        ssem=pltpu.SemaphoreType.DMA((2,)),
        m_ref=pltpu.VMEM((group, h, 1), jnp.float32),
        l_ref=pltpu.VMEM((group, h, 1), jnp.float32),
        acc_ref=pltpu.VMEM((group, h, hd_tot), jnp.float32),
    )


def _decode_grouped_append_kernel(len_ref, q_ref, new_ref, kv_hbm,
                                  o_ref, kv_out, *, scale, block_k, h,
                                  hd_tot, group):
    """:func:`_decode_grouped_kernel` with the decode cache append fused
    in: each program first DMAs its G sequences' new K/V rows into the
    cache (aliased in place) at position lengths-1, waits, then streams
    blocks as usual — the standalone per-layer append kernel (its
    launch + dispatch cost ~40 us/layer at batch 256, profile_decode
    round 5) disappears. ``lengths`` are live counts INCLUDING the new
    token (the write position is lengths-1)."""
    p = pl.program_id(0)
    cap = kv_out.shape[1]

    def body(buf, sem, wsem, m_ref, l_ref, acc_ref):
        lens = [len_ref[p * group + g] for g in range(group)]
        writes = []
        for g in range(group):
            pos = jnp.clip(lens[g] - 1, 0, cap - 1)
            w = pltpu.make_async_copy(
                new_ref.at[p * group + g],
                kv_out.at[p * group + g, pl.ds(pos, 1)], wsem.at[g])
            w.start()
            writes.append(w)
        # The write lands in member g's LAST live block, so only that
        # block's fetch must order after it — everything else overlaps
        # (an upfront wait-all stalled block 0 and measured 2.4% slower
        # end-to-end).
        last_blk = [jnp.maximum(lens[g] - 1, 0) // block_k
                    for g in range(group)]

        max_len = lens[0]
        for g in range(1, group):
            max_len = jnp.maximum(max_len, lens[g])
        n_blocks = pl.cdiv(max_len, block_k)

        def dma(slot, blk):
            # One strided group-wide DMA per block (see
            # _decode_grouped_kernel for the scalar-issue rationale).
            return pltpu.make_async_copy(
                kv_out.at[pl.ds(p * group, group),
                          pl.ds(blk * block_k, block_k)],
                buf.at[slot], sem.at[slot])

        def start(slot, blk):
            for g in range(group):
                @pl.when(blk == last_blk[g])
                def _():
                    writes[g].wait()
            dma(slot, blk).start()

        def wait(slot, blk):
            dma(slot, blk).wait()

        start(0, 0)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        q = q_ref[0]                       # [G, H, F] head-block-diag
        g_of = jax.lax.broadcasted_iota(jnp.int32, (group, h, block_k), 0)
        limit = jnp.zeros((group, h, block_k), jnp.int32)
        for g in range(group):
            limit = jnp.where(g_of == g, lens[g], limit)

        def loop(i, _):
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_blocks)
            def _():
                start(jax.lax.rem(i + 1, 2), i + 1)

            wait(slot, i)
            kblk = buf[slot, :, :, 0, :]           # [G, block_k, F]
            vblk = buf[slot, :, :, 1, :]
            s = jax.lax.dot_general(
                q, kblk.astype(q.dtype),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale  # [G, H, blk]
            k_pos = i * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (group, h, block_k), 2)
            s = jnp.where(k_pos < limit, s, _NEG_INF)
            m_prev = m_ref[:]
            m_new = jnp.maximum(m_prev,
                                jnp.max(s, axis=2, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            pmat = jnp.exp(s - m_new)
            l_ref[:] = (l_ref[:] * alpha
                        + jnp.sum(pmat, axis=2, keepdims=True))
            acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
                pmat, vblk.astype(jnp.float32),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)            # [G, H, F]
            m_ref[:] = m_new
            return 0

        jax.lax.fori_loop(0, n_blocks, loop, 0)
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(
            o_ref.dtype)

    pl.run_scoped(
        body,
        buf=pltpu.VMEM((2, group, block_k, 2, hd_tot), kv_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA((2,)),
        wsem=pltpu.SemaphoreType.DMA((group,)),
        m_ref=pltpu.VMEM((group, h, 1), jnp.float32),
        l_ref=pltpu.VMEM((group, h, 1), jnp.float32),
        acc_ref=pltpu.VMEM((group, h, hd_tot), jnp.float32),
    )


@functools.partial(jax.jit, donate_argnums=(1,),
                   static_argnames=("kv_heads", "scale", "block_k",
                                    "group"))
def flash_decode_grouped_append(q, kv, new_rows, lengths, kv_heads,
                                scale=None, block_k=64, group=8):
    """Fused decode attention + cache append (float caches, grouped
    path): writes ``new_rows`` [B, 1, 2, KVH*D] into ``kv`` at position
    lengths-1 in place (kv donated/aliased), then computes decode
    attention over the updated cache. Returns (out [B, H, D], kv).
    Callers must ensure batch %% group == 0 and capacity %% block_k == 0
    (the model's selection logic guarantees it)."""
    b, h, d = q.shape
    hd_tot = kv_heads * d
    _, s_max, planes, lanes = kv.shape
    assert planes == 2 and lanes == hd_tot and h % kv_heads == 0
    block_k = min(block_k, s_max)
    assert b % group == 0 and s_max % block_k == 0
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    q_per_kv = h // kv_heads
    nprog = b // group

    onehot = jnp.eye(kv_heads, dtype=jnp.float32).repeat(q_per_kv, axis=0)
    q_head = (q[:, :, None, :] * onehot[None, :, :, None].astype(q.dtype)
              ).reshape(nprog, group, h, hd_tot)

    out_full, kv = pl.pallas_call(
        functools.partial(_decode_grouped_append_kernel, scale=scale,
                          block_k=block_k, h=h, hd_tot=hd_tot,
                          group=group),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,   # lengths
            grid=(nprog,),
            in_specs=[
                pl.BlockSpec((1, group, h, hd_tot),
                             lambda pp, lens: (pp, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),   # new rows, HBM
                pl.BlockSpec(memory_space=pl.ANY),   # kv (aliased out 1)
            ],
            out_specs=(pl.BlockSpec((1, group, h, hd_tot),
                                    lambda pp, lens: (pp, 0, 0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pl.ANY)),
        ),
        out_shape=(jax.ShapeDtypeStruct((nprog, group, h, hd_tot),
                                        q.dtype),
                   jax.ShapeDtypeStruct(kv.shape, kv.dtype)),
        # args: lengths(prefetch), q, new, kv -> kv is input index 3
        input_output_aliases={3: 1},
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_max * hd_tot,
            bytes_accessed=kv.size * kv.dtype.itemsize,
            transcendentals=b * h * s_max),
        interpret=_interpret(),
    )(jnp.asarray(lengths, jnp.int32), q_head,
      new_rows.astype(kv.dtype), kv)
    out4 = out_full.reshape(b, h, kv_heads, d)
    return jnp.einsum("bhgd,hg->bhd", out4,
                      onehot.astype(out4.dtype)), kv


@functools.partial(jax.jit,
                   static_argnames=("kv_heads", "scale", "block_k",
                                    "group", "int8_scores",
                                    "native_dots", "pv_int8"))
def flash_decode_grouped(q, kv, lengths, kv_heads, scale=None,
                         block_k=64, group=8, kv_scales=None,
                         int8_scores=False, native_dots=False,
                         pv_int8=False):
    """Decode attention with G sequences per program, batched along a
    leading G dim. Same contract as :func:`flash_decode_fused`,
    including the token-packed int8 cache via ``kv_scales``; ``group``
    must divide the batch.
    Traffic note: a group reads up to its LONGEST member\'s blocks for
    every member — order the batch by length when it matters."""
    b, h, d = q.shape
    hd_tot = kv_heads * d
    quant = kv_scales is not None
    if quant:
        _, rows, planes, lanes = kv.shape
        s_max = rows * 4
        assert planes == 2 and lanes == hd_tot and kv.dtype == jnp.int32
    else:
        _, s_max, planes, lanes = kv.shape
        assert planes == 2 and lanes == hd_tot
    assert h % kv_heads == 0
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    block_k = min(block_k, s_max)
    if b % group or s_max % block_k or quant and block_k % 4:
        return flash_decode_fused(q, kv, lengths, kv_heads, scale=scale,
                                  kv_scales=kv_scales)
    q_per_kv = h // kv_heads
    nprog = b // group

    onehot = jnp.eye(kv_heads, dtype=jnp.float32).repeat(q_per_kv, axis=0)
    q_head = (q[:, :, None, :] * onehot[None, :, :, None].astype(q.dtype)
              ).reshape(nprog, group, h, hd_tot)

    if quant:
        from ..generate.kv_cache import SCALE_LANES
        # Stacked per-head scale selector (see _scale_selector),
        # broadcast over the group so the in-kernel expansion is one
        # batched MXU dot per block for BOTH planes.
        oh_s = _scale_selector(
            onehot, jnp.bfloat16 if kv_scales.dtype == jnp.int32
            else kv_scales.dtype)
        oh_g = jnp.broadcast_to(oh_s[None, None],
                                (nprog, group) + oh_s.shape)
        in_specs = [
            pl.BlockSpec((1, group, h, hd_tot),
                         lambda pp, lens: (pp, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group) + oh_s.shape,
                         lambda pp, lens: (pp, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # packed kv, HBM
            pl.BlockSpec(memory_space=pl.ANY),   # scale rows, HBM
        ]
        kernel = functools.partial(_decode_grouped_quant_kernel,
                                   scale=scale, block_k=block_k, h=h,
                                   hd_tot=hd_tot, group=group,
                                   scale_lanes=SCALE_LANES,
                                   pv_int8=pv_int8)
        if int8_scores:
            # Row-quantized q: the score dot becomes a genuine
            # int8×int8 MXU contraction; per-row q scales fold into the
            # f32 epilogue next to the K scales.
            qsc = jnp.max(jnp.abs(q_head), axis=-1, keepdims=True)
            qsc = jnp.where(qsc == 0, 1.0, qsc / 127.0
                            ).astype(jnp.float32)
            q_arg = jnp.clip(jnp.round(q_head / qsc), -127, 127
                             ).astype(jnp.int8)
            in_specs.insert(2, pl.BlockSpec(
                (1, group, h, 1), lambda pp, lens: (pp, 0, 0, 0),
                memory_space=pltpu.VMEM))

            def kernel(len_ref, q_ref, oh_ref, qs, kv_hbm, sc_hbm,
                       o_ref):
                return _decode_grouped_quant_kernel(
                    len_ref, q_ref, oh_ref, kv_hbm, sc_hbm, o_ref,
                    scale=scale, block_k=block_k, h=h, hd_tot=hd_tot,
                    group=group, scale_lanes=SCALE_LANES, qs_ref=qs,
                    pv_int8=pv_int8)

            args = (jnp.asarray(lengths, jnp.int32), q_arg, oh_g, qsc,
                    kv, kv_scales)
        else:
            args = (jnp.asarray(lengths, jnp.int32), q_head, oh_g, kv,
                    kv_scales)
        out_full = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,   # lengths
                grid=(nprog,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((1, group, h, hd_tot),
                                       lambda pp, lens: (pp, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct(
                (nprog, group, h, hd_tot), q.dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * h * s_max * hd_tot,
                bytes_accessed=(kv.size + kv_scales.size) * 4,
                transcendentals=b * h * s_max),
            interpret=_interpret(),
        )(*args)
        out4 = out_full.reshape(b, h, kv_heads, d)
        return jnp.einsum("bhgd,hg->bhd", out4, onehot.astype(out4.dtype))

    q_arg = q_head.astype(kv.dtype) if native_dots else q_head
    out_full = pl.pallas_call(
        functools.partial(_decode_grouped_kernel, scale=scale,
                          block_k=block_k, h=h, hd_tot=hd_tot,
                          group=group, native_dots=native_dots),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,   # lengths
            grid=(nprog,),
            in_specs=[
                pl.BlockSpec((1, group, h, hd_tot),
                             lambda pp, lens: (pp, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),   # kv stays in HBM
            ],
            out_specs=pl.BlockSpec((1, group, h, hd_tot),
                                   lambda pp, lens: (pp, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (nprog, group, h, hd_tot), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_max * hd_tot,
            bytes_accessed=kv.size * kv.dtype.itemsize,
            transcendentals=b * h * s_max),
        interpret=_interpret(),
    )(jnp.asarray(lengths, jnp.int32), q_arg, kv)
    out4 = out_full.reshape(b, h, kv_heads, d)
    return jnp.einsum("bhgd,hg->bhd", out4, onehot.astype(out4.dtype))


def _head_expander(h, kv_heads, head_dim, hd_tot, dtype):
    """One-hot head-expansion matrix E [Hp, D, F]: E[hp, d, f] = 1 iff
    ``f == (hp // q_per_kv) * D + d`` (q row hp reads/writes its kv
    head's lane block). TWO batched MXU dots replace the block-diagonal
    q dance entirely:

    * ``qx = dot(q_c [G, Hp, D], E)`` (batch Hp, contract D) → the
      [Hp, G, F] block-diagonal q, built in VMEM;
    * ``out = dot(acc [G, Hp, F], E)`` (batch Hp, contract F) → the
      compact [Hp, G, D] per-head output.

    The wrapper then streams q/out at [.., Hp, D] instead of
    [.., Hp, F] — for GPT-2 at batch 256 that is 12.6 MB → 1.05 MB per
    call per direction, and the XLA-side expansion mul + its
    layout-conversion copies (two 9.4 MB copies per layer in the
    compiled serving step) disappear."""
    hp = _round8(h)
    q_per_kv = h // kv_heads
    hp_i = jnp.arange(hp)[:, None, None]
    d_i = jnp.arange(head_dim)[None, :, None]
    f_i = jnp.arange(hd_tot)[None, None, :]
    e = (f_i == (hp_i // q_per_kv) * head_dim + d_i) & (hp_i < h)
    return e.astype(dtype)


def _decode_flat_kernel(len_ref, nb_ref, q_all, lv_ref, e_ref, kv_hbm,
                        o_hbm, *, scale, block_k, hp, head_dim, hd_tot,
                        group, nprog, dyn_q):
    dp = -(-head_dim // 128) * 128
    """ONE program for the whole batch: an in-kernel loop over all
    ``nprog`` sequence groups with a DMA pipeline that runs CONTINUOUSLY
    across group boundaries (the last block round of group g prefetches
    group g+1's block 0; output rows stream on their own double-buffered
    channel). The per-program grid of :func:`_decode_grouped_kernel`
    drains its pipeline at every program boundary — at serving
    live-lengths (1-4 blocks per group) that start-up bubble dominated.
    q arrives COMPACT [nprog, G, Hp, D] and is expanded per group with
    one batched E-dot (see :func:`_head_expander`); the output leaves
    compact as [nprog, Hp, G, D]."""

    def body(buf, obuf, sem, osem, m_ref, l_ref, acc_ref):
        def kv_dma(slot, grp, blk):
            return pltpu.make_async_copy(
                kv_hbm.at[pl.ds(grp * group, group),
                          pl.ds(blk * block_k, block_k)],
                buf.at[slot], sem.at[slot])

        def o_dma(grp, slot):
            return pltpu.make_async_copy(
                obuf.at[slot], o_hbm.at[grp], osem.at[slot])

        kv_dma(0, 0, 0).start()

        def outer(grp, r):
            # Per-group block count precomputed in the wrapper (one
            # scalar read instead of a G-long SMEM load + max chain).
            nb = nb_ref[grp]

            m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)
            if dyn_q:
                # Per-group state via ONE dynamic leading-index VMEM
                # load each (legal: trailing dims are whole and
                # tile-aligned — q is lane-padded to dp by the wrapper
                # and G is a sublane-tile multiple). The old static
                # select chains were O(nprog) VPU tile-selects per
                # group — O(nprog²) per call.
                lv = lv_ref[grp]                       # [G, 128] i32
                limit = jnp.broadcast_to(lv[:, 0:1][:, :, None],
                                         (group, hp, block_k))
                q_t = q_all[grp][..., :head_dim]
            else:
                lens = [len_ref[grp * group + g] for g in range(group)]
                g_of = jax.lax.broadcasted_iota(jnp.int32,
                                                (group, hp, block_k), 0)
                limit = jnp.zeros((group, hp, block_k), jnp.int32)
                for g in range(group):
                    limit = jnp.where(g_of == g, lens[g], limit)
                # Static-index select chain (dynamic VMEM vector
                # indexing needs tile-aligned trailing dims); the q
                # rows are tiny.
                q_t = q_all[0]
                for gg in range(1, nprog):
                    q_t = jnp.where(grp == gg, q_all[gg], q_t)
                q_t = q_t[..., :head_dim]
            # [Hp, G, D] × E [Hp, D, F] → block-diagonal [Hp, G, F]
            # (Mosaic batched matmuls need the batch dim leading on
            # BOTH operands), then a leading-dims swap to the score
            # layout [G, Hp, F].
            qx = jax.lax.dot_general(
                q_t, e_ref[:], (((2,), (1,)), ((0,), (0,))),
                precision=(jax.lax.Precision.HIGHEST
                           if e_ref.dtype == jnp.float32 else
                           jax.lax.Precision.DEFAULT),
                preferred_element_type=jnp.float32)
            qx = jnp.swapaxes(qx, 0, 1).astype(q_all.dtype)

            def loop(i, _):
                slot = jax.lax.rem(r + i, 2)
                nslot = jax.lax.rem(r + i + 1, 2)

                # Keep the pipe full across the group boundary: the
                # next fetch is either this group's next block or the
                # NEXT group's block 0.
                @pl.when(i + 1 < nb)
                def _():
                    kv_dma(nslot, grp, i + 1).start()

                @pl.when((i + 1 == nb) & (grp + 1 < nprog))
                def _():
                    kv_dma(nslot, grp + 1, 0).start()

                kv_dma(slot, grp, i).wait()
                kblk = buf[slot, :, :, 0, :]       # [G, block_k, F]
                vblk = buf[slot, :, :, 1, :]
                s = jax.lax.dot_general(
                    qx, kblk.astype(qx.dtype),
                    (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32) * scale
                k_pos = i * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (group, hp, block_k), 2)
                s = jnp.where(k_pos < limit, s, _NEG_INF)
                m_prev = m_ref[:]
                m_new = jnp.maximum(m_prev,
                                    jnp.max(s, axis=2, keepdims=True))
                alpha = jnp.exp(m_prev - m_new)
                pmat = jnp.exp(s - m_new)
                l_ref[:] = (l_ref[:] * alpha
                            + jnp.sum(pmat, axis=2, keepdims=True))
                acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
                    pmat, vblk.astype(jnp.float32),
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                m_ref[:] = m_new
                return 0

            jax.lax.fori_loop(0, nb, loop, 0, unroll=False)

            # Compact per-head output: acc [G, Hp, F] × E (contract F)
            # → [Hp, G, D]. Output rows stream on their own channel;
            # slot reuse distance is 2 groups, so wait out(grp-2) first
            # (parity-static: dynamic VMEM slicing is tile-constrained).
            oval = jnp.swapaxes(
                acc_ref[:] / jnp.maximum(l_ref[:], 1e-30), 0, 1)
            oval = jax.lax.dot_general(
                oval.astype(e_ref.dtype), e_ref[:],
                (((2,), (2,)), ((0,), (0,))),
                precision=(jax.lax.Precision.HIGHEST
                           if e_ref.dtype == jnp.float32 else
                           jax.lax.Precision.DEFAULT),
                preferred_element_type=jnp.float32).astype(obuf.dtype)
            if dp != head_dim:
                # DMA slices need 128-aligned lane extents: pad the
                # compact rows to the obuf lane width (zero lanes are
                # sliced off by the wrapper).
                oval = jnp.concatenate(
                    [oval, jnp.zeros(oval.shape[:2] + (dp - head_dim,),
                                     oval.dtype)], axis=-1)
            parity = jax.lax.rem(grp, 2)

            @pl.when((grp >= 2) & (parity == 0))
            def _():
                o_dma(grp - 2, 0).wait()

            @pl.when((grp >= 2) & (parity == 1))
            def _():
                o_dma(grp - 2, 1).wait()

            @pl.when(parity == 0)
            def _():
                obuf[0] = oval
                o_dma(grp, 0).start()

            @pl.when(parity == 1)
            def _():
                obuf[1] = oval
                o_dma(grp, 1).start()
            return r + nb

        jax.lax.fori_loop(0, nprog, outer, 0, unroll=False)
        for gg in range(max(0, nprog - 2), nprog):
            o_dma(gg, gg % 2).wait()

    pl.run_scoped(
        body,
        buf=pltpu.VMEM((2, group, block_k, 2, hd_tot), kv_hbm.dtype),
        obuf=pltpu.VMEM((2, hp, group, dp), o_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA((2,)),
        osem=pltpu.SemaphoreType.DMA((2,)),
        m_ref=pltpu.VMEM((group, hp, 1), jnp.float32),
        l_ref=pltpu.VMEM((group, hp, 1), jnp.float32),
        acc_ref=pltpu.VMEM((group, hp, hd_tot), jnp.float32),
    )


def _decode_flat_quant_kernel(len_ref, nb_ref, q_all, e_ref, oh_ref,
                              kv_hbm, sc_hbm, o_hbm, *, scale, block_k,
                              hp, head_dim, hd_tot, group, nprog,
                              scale_lanes, qs_ref=None, ei_ref=None,
                              tc_ref=None, tail_hbm=None, lv_ref=None,
                              dyn_q=False, r0_fold=False,
                              q_stream=False, partials=False):
    dp = -(-(head_dim + (2 if partials else 0)) // 128) * 128
    """Token-packed int8 sibling of :func:`_decode_flat_kernel` (same
    flat single-program pipeline and compact q/out; same per-block math
    as :func:`_decode_grouped_quant_kernel`, including the merged K+V
    scale-expansion dot). With ``qs_ref`` (int8_scores mode) q arrives
    row-quantized int8 and expands through the int8 ``ei_ref`` copy of
    E — the one-hot contraction is exact in int8 — so the score dot
    stays a genuine int8×int8 MXU contraction."""
    blk4 = block_k // 4
    sc_packed = sc_hbm.dtype == jnp.int32
    sc_rows = block_k // 2 if sc_packed else block_k

    def body(buf, sbuf, obuf, sem, ssem, osem, m_ref, l_ref, acc_ref,
             tbuf, tsem, qbuf, qsem):
        tc = None if tc_ref is None else tc_ref[0]

        def q_dma(slot, grp):
            return pltpu.make_async_copy(q_all.at[grp], qbuf.at[slot],
                                         qsem.at[slot])

        def kv_dma(slot, grp, blk):
            return pltpu.make_async_copy(
                kv_hbm.at[pl.ds(grp * group, group),
                          pl.ds(blk * blk4, blk4)],
                buf.at[slot], sem.at[slot])

        def sc_dma(slot, grp, blk):
            return pltpu.make_async_copy(
                sc_hbm.at[pl.ds(grp * group, group),
                          pl.ds(blk * sc_rows, sc_rows)],
                sbuf.at[slot], ssem.at[slot])

        def o_dma(grp, slot):
            return pltpu.make_async_copy(
                obuf.at[slot], o_hbm.at[grp], osem.at[slot])

        def t_dma(grp):
            return pltpu.make_async_copy(
                tail_hbm.at[pl.ds(grp * group, group)], tbuf,
                tsem.at[0])

        kv_dma(0, 0, 0).start()
        sc_dma(0, 0, 0).start()
        if q_stream:
            q_dma(0, 0).start()

        def outer(grp, r):
            if q_stream:
                # Prefetch the NEXT group's q rows on their own
                # double-buffered channel — the previous consumer of
                # slot (grp+1)%2 was group grp-1, already complete.
                @pl.when(grp + 1 < nprog)
                def _():
                    q_dma((grp + 1) % 2, grp + 1).start()
            if tc is not None:
                # The tail window holds the newest tc tokens (incl. the
                # current one); the packed region covers the rest.
                t_dma(grp).start()
            # Per-group block count precomputed in the wrapper (one
            # scalar read instead of a G-long SMEM load + max chain);
            # the wrapper subtracts the window depth and clamps to >= 1
            # so the DMA start/wait pairing stays balanced even for a
            # group of empty slots.
            nb = nb_ref[grp]

            if not r0_fold:
                m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
                l_ref[:] = jnp.zeros_like(l_ref)
                acc_ref[:] = jnp.zeros_like(acc_ref)
            if q_stream:
                # q rows arrive by DMA (started one group ahead): zero
                # VPU work in place of the O(nprog) select chain.
                q_dma(jax.lax.rem(grp, 2), grp).wait()
                q_t = qbuf[jax.lax.rem(grp, 2)][..., :head_dim]
                lens = [len_ref[grp * group + g] for g in range(group)]
                if tc is not None:
                    lens = [lg - tc for lg in lens]
                g_of = jax.lax.broadcasted_iota(jnp.int32,
                                                (group, hp, block_k), 0)
                limit = jnp.zeros((group, hp, block_k), jnp.int32)
                for g in range(group):
                    limit = jnp.where(g_of == g, lens[g], limit)
            elif dyn_q:
                # One dynamic leading-index load per group instead of
                # the O(nprog) select chains (see _decode_flat_kernel).
                lv = lv_ref[grp]                       # [G, 128] i32
                if tc is not None:
                    lv = lv - tc
                limit = jnp.broadcast_to(lv[:, 0:1][:, :, None],
                                         (group, hp, block_k))
                q_t = q_all[grp][..., :head_dim]
            else:
                lens = [len_ref[grp * group + g] for g in range(group)]
                if tc is not None:
                    lens = [lg - tc for lg in lens]
                g_of = jax.lax.broadcasted_iota(jnp.int32,
                                                (group, hp, block_k), 0)
                limit = jnp.zeros((group, hp, block_k), jnp.int32)
                for g in range(group):
                    limit = jnp.where(g_of == g, lens[g], limit)
                q_t = q_all[0]
                for gg in range(1, nprog):
                    q_t = jnp.where(grp == gg, q_all[gg], q_t)
                q_t = q_t[..., :head_dim]
            if qs_ref is not None:
                qs = qs_ref[0]
                for gg in range(1, nprog):
                    qs = jnp.where(grp == gg, qs_ref[gg], qs)
                # int8 one-hot expansion is exact: |q| <= 127 survives
                # the int32 accumulate → int8 cast unchanged. Batch dim
                # leading on both operands (Mosaic), then swap to the
                # score layout [G, Hp, F].
                qx = jax.lax.dot_general(
                    q_t, ei_ref[:], (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32)
                qx = jnp.swapaxes(qx, 0, 1).astype(jnp.int8)
            else:
                qx = jax.lax.dot_general(
                    q_t, e_ref[:], (((2,), (1,)), ((0,), (0,))),
                    precision=(jax.lax.Precision.HIGHEST
                               if e_ref.dtype == jnp.float32 else
                               jax.lax.Precision.DEFAULT),
                    preferred_element_type=jnp.float32)
                qx = jnp.swapaxes(qx, 0, 1).astype(q_all.dtype)
            oh = oh_ref[:]                     # [2*Hp, SL]
            oh_g = jnp.broadcast_to(oh[None], (group,) + oh.shape)

            def loop(i, _):
                slot = jax.lax.rem(r + i, 2)
                nslot = jax.lax.rem(r + i + 1, 2)

                @pl.when(i + 1 < nb)
                def _():
                    kv_dma(nslot, grp, i + 1).start()
                    sc_dma(nslot, grp, i + 1).start()

                @pl.when((i + 1 == nb) & (grp + 1 < nprog))
                def _():
                    kv_dma(nslot, grp + 1, 0).start()
                    sc_dma(nslot, grp + 1, 0).start()

                kv_dma(slot, grp, i).wait()
                sc_dma(slot, grp, i).wait()
                kblk = pltpu.bitcast(buf[slot, :, :, 0], jnp.int8)
                vblk = pltpu.bitcast(buf[slot, :, :, 1], jnp.int8)
                if sc_packed:
                    srow = pltpu.bitcast(sbuf[slot, :, :, 0, :],
                                         jnp.bfloat16)
                else:
                    srow = sbuf[slot, :, :, 0, :]    # [G, block_k, SL]
                if qs_ref is not None:
                    s = jax.lax.dot_general(
                        qx, kblk, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.int32
                    ).astype(jnp.float32) * (qs * scale)
                else:
                    s = jax.lax.dot_general(
                        qx, kblk.astype(qx.dtype),
                        (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32) * scale
                # Merged K+V scale expansion: one batched MXU dot of
                # the stacked selector against the scale-row tile.
                kvs = jax.lax.dot_general(
                    oh_g, srow, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                s = s * kvs[:, :hp]
                k_pos = i * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (group, hp, block_k), 2)
                s = jnp.where(k_pos < limit, s, _NEG_INF)
                if r0_fold:
                    # Round-0 fold (round-4 experiment): the first
                    # round WRITES m/l/acc directly — no resets, no
                    # alpha-rescale read-modify pass on the [G, hp, F]
                    # accumulator.
                    s_max = jnp.max(s, axis=2, keepdims=True)

                    @pl.when(i == 0)
                    def _():
                        pmat0 = jnp.exp(s - s_max)
                        m_ref[:] = s_max
                        l_ref[:] = jnp.sum(pmat0, axis=2, keepdims=True)
                        acc_ref[:] = jax.lax.dot_general(
                            pmat0 * kvs[:, hp:2 * hp],
                            vblk.astype(jnp.float32),
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)

                    @pl.when(i > 0)
                    def _():
                        m_prev = m_ref[:]
                        m_new = jnp.maximum(m_prev, s_max)
                        alpha = jnp.exp(m_prev - m_new)
                        pmat = jnp.exp(s - m_new)
                        l_ref[:] = (l_ref[:] * alpha
                                    + jnp.sum(pmat, axis=2,
                                              keepdims=True))
                        acc_ref[:] = (acc_ref[:] * alpha
                                      + jax.lax.dot_general(
                                          pmat * kvs[:, hp:2 * hp],
                                          vblk.astype(jnp.float32),
                                          (((2,), (1,)), ((0,), (0,))),
                                          preferred_element_type=jnp
                                          .float32))
                        m_ref[:] = m_new
                    return 0
                m_prev = m_ref[:]
                m_new = jnp.maximum(m_prev,
                                    jnp.max(s, axis=2, keepdims=True))
                alpha = jnp.exp(m_prev - m_new)
                pmat = jnp.exp(s - m_new)
                l_ref[:] = (l_ref[:] * alpha
                            + jnp.sum(pmat, axis=2, keepdims=True))
                pmat = pmat * kvs[:, hp:2 * hp]
                acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
                    pmat, vblk.astype(jnp.float32),
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                m_ref[:] = m_new
                return 0

            jax.lax.fori_loop(0, nb, loop, 0, unroll=False)

            if tc is not None:
                # Tail round: the newest tc tokens live UNQUANTIZED in
                # the bf16 write-buffer — one extra bf16 block per
                # group, no scale dot (see generate/kv_cache.py tail
                # docs; the window is global, so the mask is the same
                # scalar for every sequence).
                t_dma(grp).wait()
                tk = tbuf[:, :, 0, :]              # [G, R, F] bf16
                tv = tbuf[:, :, 1, :]
                st = jax.lax.dot_general(
                    qx, tk.astype(qx.dtype),
                    (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32) * scale
                j_pos = jax.lax.broadcasted_iota(jnp.int32, st.shape, 2)
                st = jnp.where(j_pos < tc, st, _NEG_INF)
                m_prev = m_ref[:]
                m_new = jnp.maximum(m_prev,
                                    jnp.max(st, axis=2, keepdims=True))
                alpha = jnp.exp(m_prev - m_new)
                pmat = jnp.exp(st - m_new)
                l_ref[:] = (l_ref[:] * alpha
                            + jnp.sum(pmat, axis=2, keepdims=True))
                acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
                    pmat, tv.astype(jnp.float32),
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                m_ref[:] = m_new

            num = (acc_ref[:] if partials
                   else acc_ref[:] / jnp.maximum(l_ref[:], 1e-30))
            oval = jnp.swapaxes(num, 0, 1)
            # bf16-E mode: the compaction dot is a one-hot selection,
            # so casting the f32 accumulator to bf16 first only rounds
            # the already-bf16-bound output (q entered the kernel
            # bf16-rounded).
            oval = jax.lax.dot_general(
                oval.astype(e_ref.dtype), e_ref[:],
                (((2,), (2,)), ((0,), (0,))),
                precision=(jax.lax.Precision.HIGHEST
                           if e_ref.dtype == jnp.float32 else
                           jax.lax.Precision.DEFAULT),
                preferred_element_type=jnp.float32).astype(obuf.dtype)
            if partials:
                # Seq-sharded decode (round 5): emit the UNNORMALIZED
                # compact accumulator with the online-softmax state in
                # the pad lanes — lane D holds m, lane D+1 holds l — so
                # capacity shards merge outside the kernel:
                # out = psum(acc*exp(m-m_g)) / psum(l*exp(m-m_g)).
                m_t = jnp.swapaxes(m_ref[:], 0, 1).astype(oval.dtype)
                l_t = jnp.swapaxes(l_ref[:], 0, 1).astype(oval.dtype)
                parts = [oval, m_t, l_t]
                if dp - head_dim - 2:
                    parts.append(jnp.zeros(
                        oval.shape[:2] + (dp - head_dim - 2,),
                        oval.dtype))
                oval = jnp.concatenate(parts, axis=-1)
            elif dp != head_dim:
                # DMA slices need 128-aligned lane extents: pad the
                # compact rows to the obuf lane width (zero lanes are
                # sliced off by the wrapper).
                oval = jnp.concatenate(
                    [oval, jnp.zeros(oval.shape[:2] + (dp - head_dim,),
                                     oval.dtype)], axis=-1)
            parity = jax.lax.rem(grp, 2)

            @pl.when((grp >= 2) & (parity == 0))
            def _():
                o_dma(grp - 2, 0).wait()

            @pl.when((grp >= 2) & (parity == 1))
            def _():
                o_dma(grp - 2, 1).wait()

            @pl.when(parity == 0)
            def _():
                obuf[0] = oval
                o_dma(grp, 0).start()

            @pl.when(parity == 1)
            def _():
                obuf[1] = oval
                o_dma(grp, 1).start()
            return r + nb

        jax.lax.fori_loop(0, nprog, outer, 0, unroll=False)
        for gg in range(max(0, nprog - 2), nprog):
            o_dma(gg, gg % 2).wait()

    tbuf_shape = ((group,) + tail_hbm.shape[1:] if tail_hbm is not None
                  else (1, 2, 2, hd_tot))   # dummy when no tail
    pl.run_scoped(
        body,
        buf=pltpu.VMEM((2, group, block_k // 4, 2, hd_tot), jnp.int32),
        sbuf=pltpu.VMEM((2, group, sc_rows, 1, scale_lanes),
                        sc_hbm.dtype),
        obuf=pltpu.VMEM((2, hp, group, dp), o_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA((2,)),
        ssem=pltpu.SemaphoreType.DMA((2,)),
        osem=pltpu.SemaphoreType.DMA((2,)),
        m_ref=pltpu.VMEM((group, hp, 1), jnp.float32),
        l_ref=pltpu.VMEM((group, hp, 1), jnp.float32),
        acc_ref=pltpu.VMEM((group, hp, hd_tot), jnp.float32),
        tbuf=pltpu.VMEM(tbuf_shape, jnp.bfloat16 if tail_hbm is None
                        else tail_hbm.dtype),
        tsem=pltpu.SemaphoreType.DMA((1,)),
        qbuf=pltpu.VMEM((2,) + tuple(q_all.shape[1:])
                        if q_stream else (2, 1, 1, 128), q_all.dtype),
        qsem=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit,
                   static_argnames=("kv_heads", "scale", "block_k",
                                    "group", "int8_scores", "r0_fold",
                                    "q_stream", "q_bf16", "partials"))
def flash_decode_flat(q, kv, lengths, kv_heads, scale=None, block_k=64,
                      group=16, kv_scales=None, int8_scores=False,
                      tail=None, tail_count=None, r0_fold=False,
                      q_stream=False, q_bf16=False, partials=False):
    """Flat single-program decode attention: same contract as
    :func:`flash_decode_grouped`, but (a) the whole batch runs as ONE
    Pallas program whose DMA pipeline never drains between sequence
    groups, and (b) q/output cross HBM in COMPACT per-head form
    ([.., H, D]) with the block-diagonal expansion done in-kernel by
    one-hot E-matrix MXU dots (:func:`_head_expander`) — at GPT-2
    serving shapes the block-diagonal q dance was ~23 MB/call of HBM
    traffic plus two 9.4 MB layout copies per layer. Restrictions:
    batch % group == 0, single-query decode only (verify keeps the
    grouped path), and E must fit VMEM (larger models fall back to
    :func:`flash_decode_grouped`'s block-diagonal streaming)."""
    b, h, d = q.shape
    hd_tot = kv_heads * d
    quant = kv_scales is not None
    if quant:
        _, rows, planes, lanes = kv.shape
        s_max = rows * 4
        assert planes == 2 and lanes == hd_tot and kv.dtype == jnp.int32
    else:
        _, s_max, planes, lanes = kv.shape
        assert planes == 2 and lanes == hd_tot
    assert h % kv_heads == 0
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    block_k = min(block_k, s_max)
    hp = _round8(h)
    if partials:
        # Seq-sharded merge mode: quantized exact-q path only; the
        # online-softmax state rides the output pad lanes (lane D = m,
        # lane D+1 = l) and the result is the UNNORMALIZED accumulator.
        assert quant and not int8_scores and tail is None, \
            "partials: quantized cache, exact-q, no tail"
    dp = -(-(d + (2 if partials else 0)) // 128) * 128
    q_bf16 = q_bf16 and not int8_scores
    e_bytes = hp * d * hd_tot * (2 if q_bf16 else 4)
    if tail is not None:
        assert quant and not int8_scores, \
            "tail write-buffer: quantized caches, exact-q scores only"
    if b % group or s_max % block_k or (quant and block_k % 4) \
            or e_bytes > 4 * 1024 * 1024:
        if partials:
            raise ValueError(
                "flash_decode_flat(partials=True): shape unsupported "
                f"(b={b}, group={group}, cap={s_max})")
        if tail is not None:
            # No other kernel reads the tail window — a silent fallback
            # would drop the newest tokens.
            raise ValueError(
                "flash_decode_flat: shape unsupported for the tail "
                f"write-buffer path (b={b}, group={group}, "
                f"cap={s_max}, block_k={block_k})")
        return flash_decode_grouped(q, kv, lengths, kv_heads,
                                    scale=scale, block_k=block_k,
                                    group=group, kv_scales=kv_scales,
                                    int8_scores=int8_scores)
    nprog = b // group

    # bf16-E mode (round-5): q rounds to bf16 on entry and both E-dots
    # plus the score dots run bf16 on the MXU — halves the E matrix and
    # compact-q VMEM blocks (the VMEM headroom that unlocks group-32
    # with the tail write-buffer) at a one-rounding accuracy cost (q is
    # the only operand losing bits; K/V are int8-quantized already).
    qdt = jnp.bfloat16 if q_bf16 else q.dtype
    e_mat = _head_expander(h, kv_heads, d, hd_tot, qdt)
    # [nprog, Hp, G, D]: head-leading so the in-kernel E-dot has its
    # batch dim (Hp) leading on both operands (a Mosaic requirement).
    q_c = q.astype(qdt).reshape(nprog, group, h, d).transpose(0, 2, 1, 3)
    if hp != h:
        q_c = jnp.pad(q_c, ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    lens = jnp.asarray(lengths, jnp.int32)
    # Dynamic per-group q/lens loads need tile-aligned trailing dims:
    # lanes padded to dp and G a sublane-tile multiple for q's dtype.
    # The fallback is the O(nprog) static select chain per group.
    import os
    sub_tile = 16 if q_c.dtype == jnp.bfloat16 else 8
    # Dynamic per-group q/lens VMEM loads measured SLOWER than the
    # static select chains on v5e (round-4 same-process A/B at
    # batch 256: 259.5 vs 175.3 us/call at live 96, 276 vs 268 at
    # live 256 — a dynamic-offset VMEM load lowers to a slow local
    # copy that outweighs the O(nprog) selects). Kept opt-in for
    # future re-evaluation; the per-group block-count precompute
    # (nb_ref) is unconditional — it is in both sides of that A/B.
    dyn_q = (group % sub_tile == 0 and not int8_scores
             and bool(os.environ.get("RTEN_FLAT_DYNQ")))
    q_stream = q_stream and quant and not int8_scores
    if q_stream:
        dyn_q = False
    q_cd = q_c                      # unpadded (int8_scores quantizes it)
    if (dyn_q or q_stream) and q_c.shape[-1] != dp:
        # Lane padding is only needed by the (opt-in) dynamic-load
        # path; the default select chains keep q compact.
        q_c = jnp.pad(q_c, ((0, 0), (0, 0), (0, 0), (0, dp - d)))
    lens_v = jnp.broadcast_to(
        lens.reshape(nprog, group)[:, :, None],
        (nprog, group, 128)).astype(jnp.int32)
    # Per-group packed-block counts, precomputed so the kernel reads one
    # scalar per group instead of G SMEM scalars + a max chain. Clamped
    # to >= 1: a group of empty slots still runs one fully-masked round
    # so the DMA start/wait pairing stays balanced.
    gmax = jnp.max(lens.reshape(nprog, group), axis=1)
    if tail is not None:
        gmax = gmax - jnp.asarray(tail_count, jnp.int32)
    nb_all = jnp.maximum((gmax + block_k - 1) // block_k, 1
                         ).astype(jnp.int32)

    def vmem(shape):
        return pl.BlockSpec(shape, lambda i, *_: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    if quant:
        from ..generate.kv_cache import SCALE_LANES
        onehot = jnp.eye(kv_heads, dtype=jnp.float32
                         ).repeat(h // kv_heads, axis=0)
        oh_s = _scale_selector(
            onehot, jnp.bfloat16 if kv_scales.dtype == jnp.int32
            else kv_scales.dtype)
        in_specs = [
            pl.BlockSpec(memory_space=pl.ANY) if q_stream
            else vmem(q_c.shape),                    # compact q
            vmem(lens_v.shape),                      # lens (VMEM copy)
            vmem(e_mat.shape),                       # E (f32)
            vmem(oh_s.shape),                        # scale selector
            pl.BlockSpec(memory_space=pl.ANY),       # packed kv
            pl.BlockSpec(memory_space=pl.ANY),       # scale rows
        ]
        if int8_scores:
            qsc = jnp.max(jnp.abs(q_cd), axis=-1, keepdims=True)
            qsc = jnp.where(qsc == 0, 1.0, qsc / 127.0
                            ).astype(jnp.float32)
            q_arg = jnp.clip(jnp.round(q_cd / qsc), -127, 127
                             ).astype(jnp.int8)
            qsc = qsc.transpose(0, 2, 1, 3)      # [nprog, G, Hp, 1]
            e_int8 = e_mat.astype(jnp.int8)
            in_specs[0] = vmem(q_arg.shape)          # int8 q, unpadded
            in_specs.insert(3, vmem(e_int8.shape))   # int8 E
            in_specs.insert(4, vmem(qsc.shape))      # q scales

            def kernel(len_ref, nb_ref, q_all, lv, e_ref, ei, qs,
                       oh_ref, kv_hbm, sc_hbm, o_hbm):
                return _decode_flat_quant_kernel(
                    len_ref, nb_ref, q_all, e_ref, oh_ref, kv_hbm,
                    sc_hbm, o_hbm, scale=scale, block_k=block_k, hp=hp,
                    head_dim=d, hd_tot=hd_tot, group=group,
                    nprog=nprog, scale_lanes=SCALE_LANES, qs_ref=qs,
                    ei_ref=ei, lv_ref=lv, dyn_q=False, r0_fold=r0_fold, q_stream=q_stream)

            args = (lens, nb_all, q_arg, lens_v,
                    e_mat.astype(jnp.float32), e_int8, qsc, oh_s, kv,
                    kv_scales)
        elif tail is not None:
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # tail

            def kernel(len_ref, tc_ref, nb_ref, q_all, lv, e_ref,
                       oh_ref, kv_hbm, sc_hbm, tail_hbm, o_hbm):
                return _decode_flat_quant_kernel(
                    len_ref, nb_ref, q_all, e_ref, oh_ref, kv_hbm,
                    sc_hbm, o_hbm, scale=scale, block_k=block_k, hp=hp,
                    head_dim=d, hd_tot=hd_tot, group=group,
                    nprog=nprog, scale_lanes=SCALE_LANES,
                    tc_ref=tc_ref, tail_hbm=tail_hbm, lv_ref=lv,
                    dyn_q=dyn_q, r0_fold=r0_fold, q_stream=q_stream)

            args = (lens, jnp.asarray(tail_count, jnp.int32).reshape(1),
                    nb_all, q_c, lens_v, e_mat, oh_s, kv, kv_scales,
                    tail)
        else:
            def kernel(len_ref, nb_ref, q_all, lv, e_ref, oh_ref,
                       kv_hbm, sc_hbm, o_hbm):
                return _decode_flat_quant_kernel(
                    len_ref, nb_ref, q_all, e_ref, oh_ref, kv_hbm,
                    sc_hbm, o_hbm, scale=scale, block_k=block_k, hp=hp,
                    head_dim=d, hd_tot=hd_tot, group=group,
                    nprog=nprog, scale_lanes=SCALE_LANES, lv_ref=lv,
                    dyn_q=dyn_q, r0_fold=r0_fold, q_stream=q_stream,
                    partials=partials)

            args = (lens, nb_all, q_c, lens_v, e_mat, oh_s, kv,
                    kv_scales)
        # Partials mode emits f32 (advisor r4 finding 2): the m state
        # lane weights the cross-shard exp(m - m_g) merge — rounding it
        # to bf16 before the merge would skew per-shard weights by up
        # to ~exp(ulp(m)/2)-1 while acc/l were accumulated against the
        # exact f32 m. The merge normalizes outside and casts the final
        # output back to q.dtype.
        out_full = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3 if tail is not None else 2,
                grid=(1,),
                in_specs=in_specs,
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
            ),
            out_shape=jax.ShapeDtypeStruct(
                (nprog, hp, group, dp),
                jnp.float32 if partials else q.dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * h * s_max * hd_tot,
                bytes_accessed=(kv.size + kv_scales.size) * 4,
                transcendentals=b * h * s_max),
            interpret=_interpret(),
        )(*args)
    else:
        out_full = pl.pallas_call(
            functools.partial(_decode_flat_kernel, scale=scale,
                              block_k=block_k, hp=hp, head_dim=d,
                              hd_tot=hd_tot, group=group, nprog=nprog,
                              dyn_q=dyn_q),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,   # lengths, per-group nb
                grid=(1,),
                in_specs=[
                    vmem(q_c.shape),                 # compact q
                    vmem(lens_v.shape),              # lens (VMEM copy)
                    vmem(e_mat.shape),               # E
                    pl.BlockSpec(memory_space=pl.ANY),   # kv, HBM
                ],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
            ),
            out_shape=jax.ShapeDtypeStruct(
                (nprog, hp, group, dp), q.dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * h * s_max * hd_tot,
                bytes_accessed=kv.size * kv.dtype.itemsize,
                transcendentals=b * h * s_max),
            interpret=_interpret(),
        )(lens, nb_all, q_c, lens_v, e_mat, kv)
    # [nprog, Hp, G, Dp] → [B, H, D] (small: B*Hp*Dp elements). With
    # partials, keep the two state lanes: [B, H, D+2] = (acc, m, l).
    do = d + 2 if partials else d
    return out_full.transpose(0, 2, 1, 3)[:, :, :h, :do].reshape(
        b, h, do)




@functools.partial(jax.jit,
                   static_argnames=("kv_heads", "scale", "block_k",
                                    "group"))
def flash_verify_grouped(q, kv, lengths, kv_heads, scale=None,
                         block_k=64, group=8, kv_scales=None):
    """Chunked-verify attention with G sequences per program (the
    batched-group sibling of :func:`flash_verify_fused`, same G-chain
    rationale as :func:`flash_decode_grouped` — on v5e the grouped form
    was 1.8x the per-(seq, block) grid for single-query decode, and a
    verify step has the same per-block dependent-chain structure with
    S×H rows instead of H).

    q: [B, S, H, D] — S verify queries per sequence, already appended at
    positions lengths..lengths+S-1; lengths: [B] PRE-chunk counts;
    kv / kv_scales as in :func:`flash_decode_fused` (float fused layout
    or token-packed int8). ``group`` must divide the batch (falls back to
    the grid kernel otherwise)."""
    b, s, h, d = q.shape
    hd_tot = kv_heads * d
    quant = kv_scales is not None
    if quant:
        _, rows, planes, lanes = kv.shape
        s_max = rows * 4
        assert planes == 2 and lanes == hd_tot and kv.dtype == jnp.int32
    else:
        _, s_max, planes, lanes = kv.shape
        assert planes == 2 and lanes == hd_tot
    assert h % kv_heads == 0
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    block_k = min(block_k, s_max)
    if b % group or s_max % block_k or quant and block_k % 4:
        return flash_verify_fused(q, kv, lengths, kv_heads, scale=scale,
                                  kv_scales=kv_scales)
    q_per_kv = h // kv_heads
    nprog = b // group
    rows = s * h

    # Query-major block-diagonal rows (row r = query r//H, head r%H),
    # grouped [nprog, G, S*H, F].
    onehot = jnp.eye(kv_heads, dtype=jnp.float32).repeat(q_per_kv, axis=0)
    q_rows = (q[:, :, :, None, :]
              * onehot[None, None, :, :, None].astype(q.dtype)
              ).reshape(nprog, group, rows, hd_tot)

    if quant:
        from ..generate.kv_cache import SCALE_LANES
        oh_rows = jnp.tile(onehot, (s, 1))
        oh_s = _scale_selector(
            oh_rows, jnp.bfloat16 if kv_scales.dtype == jnp.int32
            else kv_scales.dtype)
        oh_g = jnp.broadcast_to(oh_s[None, None],
                                (nprog, group) + oh_s.shape)
        out_full = pl.pallas_call(
            functools.partial(_decode_grouped_quant_kernel, scale=scale,
                              block_k=block_k, h=rows, hd_tot=hd_tot,
                              group=group, scale_lanes=SCALE_LANES,
                              chunk_s=s),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,   # lengths
                grid=(nprog,),
                in_specs=[
                    pl.BlockSpec((1, group, rows, hd_tot),
                                 lambda pp, lens: (pp, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, group) + oh_s.shape,
                                 lambda pp, lens: (pp, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),   # packed kv, HBM
                    pl.BlockSpec(memory_space=pl.ANY),   # scale rows, HBM
                ],
                out_specs=pl.BlockSpec((1, group, rows, hd_tot),
                                       lambda pp, lens: (pp, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct(
                (nprog, group, rows, hd_tot), q.dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * rows * s_max * hd_tot,
                bytes_accessed=(kv.size + kv_scales.size) * 4,
                transcendentals=b * rows * s_max),
            interpret=_interpret(),
        )(jnp.asarray(lengths, jnp.int32), q_rows, oh_g, kv, kv_scales)
    else:
        out_full = pl.pallas_call(
            functools.partial(_decode_grouped_kernel, scale=scale,
                              block_k=block_k, h=rows, hd_tot=hd_tot,
                              group=group, chunk_s=s),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,   # lengths
                grid=(nprog,),
                in_specs=[
                    pl.BlockSpec((1, group, rows, hd_tot),
                                 lambda pp, lens: (pp, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),   # kv stays in HBM
                ],
                out_specs=pl.BlockSpec((1, group, rows, hd_tot),
                                       lambda pp, lens: (pp, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct(
                (nprog, group, rows, hd_tot), q.dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * rows * s_max * hd_tot,
                bytes_accessed=kv.size * kv.dtype.itemsize,
                transcendentals=b * rows * s_max),
            interpret=_interpret(),
        )(jnp.asarray(lengths, jnp.int32), q_rows, kv)
    out5 = out_full.reshape(b, s, h, kv_heads, d)
    return jnp.einsum("bshgd,hg->bshd", out5, onehot.astype(out5.dtype))


def _decode_paged_grouped_kernel(tab_ref, len_ref, q_ref, kv_hbm, o_ref,
                                 *, scale, page_size, h, hd_tot, group):
    """Batched-group decode over a block-paged pool: G sequences per
    program (same rationale as :func:`_decode_grouped_kernel`), page ids
    resolved in-kernel from the scalar-prefetched table and DMA'd
    directly from the shared pool."""
    p = pl.program_id(0)

    def body(buf, sem, m_ref, l_ref, acc_ref):
        lens = [len_ref[p * group + g] for g in range(group)]
        max_len = lens[0]
        for g in range(1, group):
            max_len = jnp.maximum(max_len, lens[g])
        n_blocks = pl.cdiv(max_len, page_size)

        def pid(g, i):
            # Clamp to the member's last live page (always mapped);
            # len==0 members fall back to pool page 0, fully masked.
            last = jnp.maximum(pl.cdiv(lens[g], page_size) - 1, 0)
            return jnp.maximum(
                tab_ref[p * group + g, jnp.minimum(i, last)], 0)

        def dma(slot, i, g):
            return pltpu.make_async_copy(kv_hbm.at[pid(g, i)],
                                         buf.at[slot, g], sem.at[slot, g])

        def start(slot, i):
            for g in range(group):
                dma(slot, i, g).start()

        def wait(slot, i):
            for g in range(group):
                dma(slot, i, g).wait()

        start(0, 0)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        q = q_ref[0]                       # [G, H, F]
        g_of = jax.lax.broadcasted_iota(jnp.int32, (group, h, page_size),
                                        0)
        limit = jnp.zeros((group, h, page_size), jnp.int32)
        for g in range(group):
            limit = jnp.where(g_of == g, lens[g], limit)

        def loop(i, _):
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_blocks)
            def _():
                start(jax.lax.rem(i + 1, 2), i + 1)

            wait(slot, i)
            kblk = buf[slot, :, :, 0, :]           # [G, page, F]
            vblk = buf[slot, :, :, 1, :]
            s = jax.lax.dot_general(
                q, kblk.astype(q.dtype),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale
            k_pos = i * page_size + jax.lax.broadcasted_iota(
                jnp.int32, (group, h, page_size), 2)
            s = jnp.where(k_pos < limit, s, _NEG_INF)
            m_prev = m_ref[:]
            m_new = jnp.maximum(m_prev,
                                jnp.max(s, axis=2, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            pmat = jnp.exp(s - m_new)
            l_ref[:] = (l_ref[:] * alpha
                        + jnp.sum(pmat, axis=2, keepdims=True))
            acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
                pmat, vblk.astype(jnp.float32),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            m_ref[:] = m_new
            return 0

        jax.lax.fori_loop(0, n_blocks, loop, 0)
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(
            o_ref.dtype)

    pl.run_scoped(
        body,
        buf=pltpu.VMEM((2, group, page_size, 2, hd_tot), kv_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA((2, group)),
        m_ref=pltpu.VMEM((group, h, 1), jnp.float32),
        l_ref=pltpu.VMEM((group, h, 1), jnp.float32),
        acc_ref=pltpu.VMEM((group, h, hd_tot), jnp.float32),
    )


def _decode_paged_grouped_quant_kernel(tab_ref, len_ref, q_ref, oh_ref,
                                       kv_hbm, sc_hbm, o_ref, *, scale,
                                       page_size, h, hd_tot, group,
                                       scale_lanes):
    """Token-packed int8 sibling of :func:`_decode_paged_grouped_kernel`
    (same bitcast unpack + MXU scale expansion as
    :func:`_decode_grouped_quant_kernel`, page ids resolved in-kernel)."""
    p = pl.program_id(0)
    page4 = page_size // 4
    sc_packed = sc_hbm.dtype == jnp.int32
    sc_rows = page_size // 2 if sc_packed else page_size

    def body(buf, sbuf, sem, ssem, m_ref, l_ref, acc_ref):
        lens = [len_ref[p * group + g] for g in range(group)]
        max_len = lens[0]
        for g in range(1, group):
            max_len = jnp.maximum(max_len, lens[g])
        n_blocks = pl.cdiv(max_len, page_size)

        def pid(g, i):
            last = jnp.maximum(pl.cdiv(lens[g], page_size) - 1, 0)
            return jnp.maximum(
                tab_ref[p * group + g, jnp.minimum(i, last)], 0)

        def dmas(slot, i, g):
            return (pltpu.make_async_copy(kv_hbm.at[pid(g, i)],
                                          buf.at[slot, g],
                                          sem.at[slot, g]),
                    pltpu.make_async_copy(sc_hbm.at[pid(g, i)],
                                          sbuf.at[slot, g],
                                          ssem.at[slot, g]))

        def start(slot, i):
            for g in range(group):
                for c in dmas(slot, i, g):
                    c.start()

        def wait(slot, i):
            for g in range(group):
                for c in dmas(slot, i, g):
                    c.wait()

        start(0, 0)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        q = q_ref[0]                       # [G, H, F]
        oh = oh_ref[0]                     # [G, H, 2*SL]
        g_of = jax.lax.broadcasted_iota(jnp.int32, (group, h, page_size),
                                        0)
        limit = jnp.zeros((group, h, page_size), jnp.int32)
        for g in range(group):
            limit = jnp.where(g_of == g, lens[g], limit)

        def loop(i, _):
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_blocks)
            def _():
                start(jax.lax.rem(i + 1, 2), i + 1)

            wait(slot, i)
            kblk = pltpu.bitcast(buf[slot, :, :, 0], jnp.int8)
            vblk = pltpu.bitcast(buf[slot, :, :, 1], jnp.int8)
            if sc_packed:
                srow = pltpu.bitcast(sbuf[slot, :, :, 0, :],
                                     jnp.bfloat16)   # [G, page, SL]
            else:
                srow = sbuf[slot, :, :, 0, :]
            s = jax.lax.dot_general(
                q, kblk.astype(q.dtype),
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) * scale
            h8 = oh.shape[1] // 2
            kvs = jax.lax.dot_general(
                oh, srow, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)   # [G, 2*H8, page]
            s = s * kvs[:, :h]
            k_pos = i * page_size + jax.lax.broadcasted_iota(
                jnp.int32, (group, h, page_size), 2)
            s = jnp.where(k_pos < limit, s, _NEG_INF)
            m_prev = m_ref[:]
            m_new = jnp.maximum(m_prev,
                                jnp.max(s, axis=2, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            pmat = jnp.exp(s - m_new)
            l_ref[:] = (l_ref[:] * alpha
                        + jnp.sum(pmat, axis=2, keepdims=True))
            pmat = pmat * kvs[:, h8:h8 + h]
            acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
                pmat, vblk.astype(jnp.float32),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            m_ref[:] = m_new
            return 0

        jax.lax.fori_loop(0, n_blocks, loop, 0)
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(
            o_ref.dtype)

    pl.run_scoped(
        body,
        buf=pltpu.VMEM((2, group, page4, 2, hd_tot), jnp.int32),
        sbuf=pltpu.VMEM((2, group, sc_rows, 1, scale_lanes),
                        sc_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA((2, group)),
        ssem=pltpu.SemaphoreType.DMA((2, group)),
        m_ref=pltpu.VMEM((group, h, 1), jnp.float32),
        l_ref=pltpu.VMEM((group, h, 1), jnp.float32),
        acc_ref=pltpu.VMEM((group, h, hd_tot), jnp.float32),
    )


@functools.partial(jax.jit,
                   static_argnames=("kv_heads", "scale", "group"))
def flash_decode_paged_grouped(q, pool, page_table, lengths, kv_heads,
                               scale=None, group=8, kv_scales=None):
    """Grouped sibling of :func:`flash_decode_paged`: G sequences per
    program, page ids resolved in-kernel. Falls back to the per-(seq,
    page) grid kernel when the batch doesn't divide by ``group``."""
    b, h, d = q.shape
    quant = kv_scales is not None
    if quant:
        n_pages, page4, two, hd_tot = pool.shape
        page_size = page4 * 4
        assert pool.dtype == jnp.int32
    else:
        n_pages, page_size, two, hd_tot = pool.shape
    assert two == 2 and hd_tot == kv_heads * d and h % kv_heads == 0
    if b % group:
        assert not quant, "quant paged attention requires group | batch"
        return flash_decode_paged(q, pool, page_table, lengths, kv_heads,
                                  scale=scale)
    q_per_kv = h // kv_heads
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    nprog = b // group

    onehot = jnp.eye(kv_heads, dtype=jnp.float32).repeat(q_per_kv, axis=0)
    q_head = (q[:, :, None, :] * onehot[None, :, :, None].astype(q.dtype)
              ).reshape(nprog, group, h, hd_tot)

    if quant:
        from ..generate.kv_cache import SCALE_LANES
        oh_s = _scale_selector(
            onehot, jnp.bfloat16 if kv_scales.dtype == jnp.int32
            else kv_scales.dtype)
        oh_g = jnp.broadcast_to(oh_s[None, None],
                                (nprog, group) + oh_s.shape)
        out_full = pl.pallas_call(
            functools.partial(_decode_paged_grouped_quant_kernel,
                              scale=scale, page_size=page_size, h=h,
                              hd_tot=hd_tot, group=group,
                              scale_lanes=SCALE_LANES),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,   # page_table, lengths
                grid=(nprog,),
                in_specs=[
                    pl.BlockSpec((1, group, h, hd_tot),
                                 lambda pp, tab, lens: (pp, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, group) + oh_s.shape,
                                 lambda pp, tab, lens: (pp, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),   # packed pool
                    pl.BlockSpec(memory_space=pl.ANY),   # scale pool
                ],
                out_specs=pl.BlockSpec((1, group, h, hd_tot),
                                       lambda pp, tab, lens: (pp, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct(
                (nprog, group, h, hd_tot), q.dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * h * page_table.shape[1] * page_size * hd_tot,
                bytes_accessed=(b * page_table.shape[1] * page_size
                                * (2 * hd_tot + 4 * SCALE_LANES)),
                transcendentals=b * h * page_table.shape[1] * page_size),
            interpret=_interpret(),
        )(jnp.asarray(page_table, jnp.int32),
          jnp.asarray(lengths, jnp.int32), q_head, oh_g, pool, kv_scales)
        out4 = out_full.reshape(b, h, kv_heads, d)
        return jnp.einsum("bhgd,hg->bhd", out4, onehot.astype(out4.dtype))

    out_full = pl.pallas_call(
        functools.partial(_decode_paged_grouped_kernel, scale=scale,
                          page_size=page_size, h=h, hd_tot=hd_tot,
                          group=group),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,   # page_table, lengths
            grid=(nprog,),
            in_specs=[
                pl.BlockSpec((1, group, h, hd_tot),
                             lambda pp, tab, lens: (pp, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),   # pool stays in HBM
            ],
            out_specs=pl.BlockSpec((1, group, h, hd_tot),
                                   lambda pp, tab, lens: (pp, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (nprog, group, h, hd_tot), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * page_table.shape[1] * page_size * hd_tot,
            bytes_accessed=(b * page_table.shape[1] * page_size * 2
                            * hd_tot * pool.dtype.itemsize),
            transcendentals=b * h * page_table.shape[1] * page_size),
        interpret=_interpret(),
    )(jnp.asarray(page_table, jnp.int32),
      jnp.asarray(lengths, jnp.int32), q_head, pool)
    out4 = out_full.reshape(b, h, kv_heads, d)
    return jnp.einsum("bhgd,hg->bhd", out4, onehot.astype(out4.dtype))


def _chunk_reference(q, kv, lengths, kv_heads, scale):
    """jnp chunked-verify attention (fallback + test oracle): q
    [B, S, H, D] at absolute positions lengths..lengths+S-1 over the
    float fused cache [B, cap, 2, KVH*D] (chunk already appended)."""
    b, s, h, d = q.shape
    cap = kv.shape[1]
    q_per_kv = h // kv_heads
    kc = kv[:, :, 0].reshape(b, cap, kv_heads, d).transpose(0, 2, 1, 3)
    vc = kv[:, :, 1].reshape(b, cap, kv_heads, d).transpose(0, 2, 1, 3)
    kc = jnp.repeat(kc, q_per_kv, axis=1)
    vc = jnp.repeat(vc, q_per_kv, axis=1)
    scores = jnp.einsum("bshd,bhcd->bhsc", q.astype(jnp.float32),
                        kc.astype(jnp.float32)) * scale
    limit = lengths[:, None] + 1 + jnp.arange(s)[None, :]
    mask = jnp.arange(cap)[None, None, :] < limit[:, :, None]
    scores = jnp.where(mask[:, None, :, :], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhsc,bhcd->bshd", probs, vc.astype(jnp.float32))
    return out.astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("kv_heads", "scale", "block_k"))
def flash_verify_fused(q, kv, lengths, kv_heads, scale=None, block_k=128,
                       kv_scales=None):
    """Chunked-verify attention for speculative decoding over the
    token-major fused cache (ragged sibling of :func:`flash_decode_fused`).

    q: [B, S, H, D] — S verify queries per sequence, already appended to
    the cache at positions lengths..lengths+S-1; lengths: [B] PRE-chunk
    valid counts. One program per (sequence, cache block) streams each
    block's rows ONCE for all S×H queries (block-diagonal MXU head
    separation, per-row causal limits in-kernel), and the clamped index
    map elides DMAs past lengths+S — cache reads scale with live length,
    not capacity, which is what makes a verify step cost ~a decode step
    rather than a full-capacity pass."""
    b, s, h, d = q.shape
    hd_tot = kv_heads * d
    quant = kv_scales is not None
    if quant:
        _, rows, planes, lanes = kv.shape
        s_max = rows * 4
        assert planes == 2 and lanes == hd_tot and kv.dtype == jnp.int32
    else:
        _, s_max, planes, lanes = kv.shape
        assert planes == 2 and lanes == hd_tot
    assert h % kv_heads == 0
    q_per_kv = h // kv_heads
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    block_k = min(block_k, s_max)
    if s_max % block_k or block_k % 4 or quant is False and s_max < 8:
        if quant:
            from ..generate.kv_cache import (VSCALE_OFF,
                                             unpack_bf16_rows,
                                             unpack_int8_tokens)
            kq = unpack_int8_tokens(kv[:, :, 0])
            vq = unpack_int8_tokens(kv[:, :, 1])
            s_rows = kv_scales[:, :, 0]
            if kv_scales.dtype == jnp.int32:
                s_rows = unpack_bf16_rows(s_rows)
            kf = (kq.reshape(b, s_max, kv_heads, d).astype(jnp.float32)
                  * s_rows[:, :, :kv_heads, None])
            vf = (vq.reshape(b, s_max, kv_heads, d).astype(jnp.float32)
                  * s_rows[:, :, VSCALE_OFF:VSCALE_OFF + kv_heads, None])
            kvf = jnp.stack([kf.reshape(b, s_max, hd_tot),
                             vf.reshape(b, s_max, hd_tot)], axis=2)
            return _chunk_reference(q, kvf, lengths, kv_heads, scale)
        return _chunk_reference(q, kv, lengths, kv_heads, scale)
    n_k = s_max // block_k

    # Block-diagonal rows, query-major: row r = qi*H + head.
    onehot = jnp.eye(kv_heads, dtype=jnp.float32).repeat(q_per_kv, axis=0)
    q_full = (q[:, :, :, None, :]
              * onehot[None, None, :, :, None].astype(q.dtype)
              ).reshape(b, s * h, hd_tot)
    oh_rows = jnp.tile(onehot, (s, 1))

    def kv_index(bb, kk, lens):
        last = jnp.maximum(pl.cdiv(lens[bb] + s, block_k) - 1, 0)
        return (bb, jnp.minimum(kk, last), 0, 0)

    if quant:
        from ..generate.kv_cache import SCALE_LANES
        oh_s = _scale_selector(
            oh_rows, jnp.bfloat16 if kv_scales.dtype == jnp.int32
            else kv_scales.dtype)
        oh_arg, oh_block = oh_s, oh_s.shape
        kv_block = (1, block_k // 4, 2, hd_tot)

        def kv_index(bb, kk, lens):      # noqa: F811 (quant layout)
            last = jnp.maximum(pl.cdiv(lens[bb] + s, block_k) - 1, 0)
            return (bb, jnp.minimum(kk, last), 0, 0)
    else:
        oh_arg, oh_block = oh_rows, (s * h, kv_heads)
        kv_block = (1, block_k, 2, hd_tot)

    in_specs = [
        pl.BlockSpec((1, s * h, hd_tot), lambda bb, kk, lens: (bb, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(oh_block, lambda bb, kk, lens: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(kv_block, kv_index, memory_space=pltpu.VMEM),
    ]
    args = [jnp.asarray(lengths, jnp.int32), q_full, oh_arg, kv]
    kernel = functools.partial(_decode_fused_kernel, scale=scale,
                               block_k=block_k, n_k=n_k, chunk_s=s)
    if quant:
        def sc_index(bb, kk, lens):
            last = jnp.maximum(pl.cdiv(lens[bb] + s, block_k) - 1, 0)
            return (bb, jnp.minimum(kk, last), 0, 0)

        sc_block = (block_k // 2 if kv_scales.dtype == jnp.int32
                    else block_k)
        in_specs.append(pl.BlockSpec(
            (1, sc_block, 1, SCALE_LANES), sc_index,
            memory_space=pltpu.VMEM))
        args.append(kv_scales)

        def kernel(len_ref, q_ref, oh_ref, kv_ref, s_ref, *rest):
            return _decode_fused_kernel(len_ref, q_ref, oh_ref, kv_ref,
                                        *rest, scale=scale, block_k=block_k,
                                        n_k=n_k, scales_ref=s_ref,
                                        chunk_s=s)

    out_full = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_k),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, s * h, hd_tot),
                                   lambda bb, kk, lens: (bb, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((s * h, 1), jnp.float32),
                pltpu.VMEM((s * h, 1), jnp.float32),
                pltpu.VMEM((s * h, hd_tot), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, s * h, hd_tot), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * s * h * s_max * hd_tot,
            bytes_accessed=kv.size * kv.dtype.itemsize
            + 8 * b * s * h * hd_tot,
            transcendentals=b * s * h * s_max),
        interpret=_interpret(),
    )(*args)
    out5 = out_full.reshape(b, s, h, kv_heads, d)
    return jnp.einsum("bshgd,hg->bshd", out5, onehot.astype(out5.dtype))


def _decode_paged_kernel(tab_ref, len_ref, q_ref, onehot_ref, page_ref,
                         o_ref, m_ref, l_ref, acc_ref, *, scale, page_size,
                         n_pages_per_seq):
    pp = pl.program_id(1)
    b = pl.program_id(0)

    @pl.when(pp == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    length = len_ref[b]

    # Ragged skip (see _decode_fused_kernel): pages past the live
    # length were index-clamped to the last valid page (DMA elided);
    # skip their compute too.
    @pl.when(pp * page_size < length)
    def _():
        mapped = tab_ref[b, pp] >= 0
        q = q_ref[0]                   # [H, KVH*D] block-diagonal rows
        kblk = page_ref[0, :, 0, :]    # [page, KVH*D]
        vblk = page_ref[0, :, 1, :]
        h = q.shape[0]

        s = jax.lax.dot_general(q, kblk.astype(q.dtype),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        k_pos = pp * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (h, page_size), 1)
        valid = jnp.logical_and(k_pos < length, mapped)
        s = jnp.where(valid, s, _NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p, vblk.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = m_new

    @pl.when(pp == n_pages_per_seq - 1)
    def _():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(
            o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kv_heads", "scale"))
def flash_decode_paged(q, pool, page_table, lengths, kv_heads, scale=None):
    """Decode attention over a block-paged KV pool (vLLM-style).

    q: [B, H, D]; pool: [n_pages, page_size, 2, KVH*D] token-major
    shared pool; page_table: [B, P] int32 page ids (-1 = unmapped);
    lengths: [B] int32.

    The page table is a scalar-prefetch operand: each grid program's
    BlockSpec index map reads ``table[b, p]`` to DMA exactly that
    sequence's page from the pool — attention never materializes a
    contiguous copy of the cache. Head separation uses the same
    block-diagonal MXU trick as :func:`flash_decode_fused`."""
    b, h, d = q.shape
    n_pages, page_size, two, hd_tot = pool.shape
    assert two == 2 and hd_tot == kv_heads * d and h % kv_heads == 0
    q_per_kv = h // kv_heads
    n_pages_per_seq = page_table.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    onehot = jnp.eye(kv_heads, dtype=jnp.float32).repeat(q_per_kv, axis=0)
    q_full = (q[:, :, None, :] * onehot[None, :, :, None].astype(q.dtype)
              ).reshape(b, h, hd_tot)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # page_table, lengths
        grid=(b, n_pages_per_seq),
        in_specs=[
            pl.BlockSpec((1, h, hd_tot),
                         lambda bb, pp, tab, lens: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, kv_heads),
                         lambda bb, pp, tab, lens: (0, 0),
                         memory_space=pltpu.VMEM),
            # Ragged clamp: pages past the live length re-use the last
            # valid page's index (DMA elided on unchanged index; kernel
            # skips the compute). Unmapped in-range pages (-1) fall back
            # to page 0 and are masked in-kernel.
            pl.BlockSpec((1, page_size, 2, hd_tot),
                         lambda bb, pp, tab, lens: (
                             jnp.maximum(tab[bb, jnp.minimum(
                                 pp, jnp.maximum(
                                     pl.cdiv(lens[bb], page_size) - 1,
                                     0))], 0), 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, hd_tot),
                               lambda bb, pp, tab, lens: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, hd_tot), jnp.float32),
        ],
    )
    out_full = pl.pallas_call(
        functools.partial(_decode_paged_kernel, scale=scale,
                          page_size=page_size,
                          n_pages_per_seq=n_pages_per_seq),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, hd_tot), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n_pages_per_seq * page_size * hd_tot,
            bytes_accessed=(b * n_pages_per_seq * page_size * 2 * hd_tot
                            * pool.dtype.itemsize),
            transcendentals=b * h * n_pages_per_seq * page_size),
        interpret=_interpret(),
    )(jnp.asarray(page_table, jnp.int32), jnp.asarray(lengths, jnp.int32),
      q_full, onehot, pool)
    out4 = out_full.reshape(b, h, kv_heads, d)
    return jnp.einsum("bhgd,hg->bhd", out4, onehot.astype(out4.dtype))


@functools.partial(jax.jit, static_argnames=("scale", "block_k"))
def flash_decode(q, k_cache, v_cache, lengths, scale=None, block_k=256):
    """Single-step decode attention.

    q: [B, H, D] (one query token per sequence);
    k_cache/v_cache: [B, KVH, S_max, D] padded caches;
    lengths: [B] int32 — number of valid cache entries per sequence.
    Supports GQA when H is a multiple of KVH.
    """
    b, h, d = q.shape
    _, kvh, s_max, _ = k_cache.shape
    assert h % kvh == 0
    q_per_kv = h // kvh
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if s_max < block_k or s_max % block_k or d % 128:
        # Ragged shapes: jnp fallback with the same masking semantics.
        kf = jnp.repeat(k_cache, q_per_kv, axis=1)
        vf = jnp.repeat(v_cache, q_per_kv, axis=1)
        return _attn_reference(q[:, :, None, :], kf, vf, False, scale,
                               lengths)[:, :, 0, :]

    # Fold GQA into rows: per (batch, kv-head) the query block is
    # [q_per_kv, d].
    qg = q.reshape(b, kvh, q_per_kv, d)
    n_k = s_max // block_k
    grid = (b, kvh, n_k)
    out = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale, block_k=block_k,
                          n_k=n_k),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, q_per_kv, d),
                             lambda bb, hh, kk, lens: (bb, hh, 0, 0),
                             memory_space=pltpu.VMEM),
                # Ragged clamp: blocks past the live length re-use the
                # last valid block's index (DMA elided; compute skipped
                # in-kernel).
                pl.BlockSpec((1, 1, block_k, d),
                             lambda bb, hh, kk, lens: (
                                 bb, hh, jnp.minimum(kk, jnp.maximum(
                                     pl.cdiv(lens[bb], block_k) - 1, 0)),
                                 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_k, d),
                             lambda bb, hh, kk, lens: (
                                 bb, hh, jnp.minimum(kk, jnp.maximum(
                                     pl.cdiv(lens[bb], block_k) - 1, 0)),
                                 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, q_per_kv, d),
                                   lambda bb, hh, kk, lens: (bb, hh, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((q_per_kv, 1), jnp.float32),
                pltpu.VMEM((q_per_kv, 1), jnp.float32),
                pltpu.VMEM((q_per_kv, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, kvh, q_per_kv, d), q.dtype),
        interpret=_interpret(),
    )(jnp.asarray(lengths, jnp.int32), qg, k_cache, v_cache)
    return out.reshape(b, h, d)
