"""Collective/matmul overlap building blocks (SURVEY §2.3).

GSPMD's default lowering of a tensor-parallel matmul is
``dot → all-reduce`` (or ``all-gather → dot``): the collective sits on
the critical path AFTER/BEFORE the whole contraction. These ring
primitives decompose the collective into per-chunk ``ppermute`` steps
interleaved with per-chunk partial matmuls, so ICI transfers ride
UNDER the MXU work (XLA's latency-hiding scheduler overlaps each
step's independent send + dot; the reference's analog is rayon
worker-parallelism inside its GEMM, src/gemm.rs:818-837 — here the
"workers" are chips on the ICI ring).

Both primitives are written for use INSIDE ``shard_map`` over one mesh
axis and are numerically identical (up to f32 summation order for the
reduce-scatter) to the GSPMD collective+dot pair — pinned by
tests/test_overlap.py on the 8-device CPU mesh.

Chunking is bidirectional by default: the two half-chunks travel the
ring in opposite directions, using both ICI links of the axis each
step (2× ring bandwidth, same step count).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _perm(axis_size: int, shift: int):
    return [(j, (j + shift) % axis_size) for j in range(axis_size)]


def ring_all_gather_matmul(x, w, axis_name: str, bidirectional=True,
                           mm=None):
    """``all_gather(x, axis) @ w`` as a matmul-overlapped ring.

    Args (per-shard views inside shard_map):
      x: [m_local, k] — row shard of the [m_local * P, k] global operand.
      w: [k, n] — local weight (replicated or column shard; the ring
         never moves it).
      mm: optional chunk-matmul hook ``rows -> rows @ w`` (overrides
         ``w``; lets quantized-storage weights ride the ring through
         :func:`rten_tpu.models.transformer.linear`).
    Returns [m_local * P, n] — the full gathered product, every shard
    identical to ``all_gather(x) @ w``.

    Step c multiplies the chunk that arrived at step c-1 while
    ppermute-ing it onward — the transfer of chunk c+1 overlaps the
    MXU work on chunk c.
    """
    if mm is None:
        mm = lambda rows: rows @ w           # noqa: E731
    p = jax.lax.axis_size(axis_name)
    i = jax.lax.axis_index(axis_name)
    m = x.shape[0]
    probe = jax.eval_shape(mm, jax.ShapeDtypeStruct((m, x.shape[1]),
                                                    x.dtype))
    out = jnp.zeros((p * m, probe.shape[1]), probe.dtype)
    if p == 1:
        return jax.lax.dynamic_update_slice(
            out, mm(x).astype(out.dtype), (0, 0))

    if not bidirectional:
        buf = x
        for c in range(p):
            src = (i - c) % p                      # origin of buf
            y = mm(buf).astype(out.dtype)
            out = jax.lax.dynamic_update_slice(out, y, (src * m, 0))
            if c + 1 < p:
                buf = jax.lax.ppermute(buf, axis_name, _perm(p, 1))
        return out

    # Bidirectional: row-halves travel opposite directions, so each
    # step moves half the bytes on each of the two ring links.
    h = m // 2
    fwd, bwd = x[:h], x[h:]
    for c in range(p):
        sf = (i - c) % p                           # origin of fwd half
        sb = (i + c) % p                           # origin of bwd half
        yf = mm(fwd).astype(out.dtype)
        yb = mm(bwd).astype(out.dtype)
        out = jax.lax.dynamic_update_slice(out, yf, (sf * m, 0))
        out = jax.lax.dynamic_update_slice(out, yb, (sb * m + h, 0))
        if c + 1 < p:
            fwd = jax.lax.ppermute(fwd, axis_name, _perm(p, 1))
            bwd = jax.lax.ppermute(bwd, axis_name, _perm(p, -1))
    return out


def ring_all_gather(x, axis_name: str):
    """Plain all-gather along the LAST dim decomposed into ppermutes —
    for SMALL activations whose gather must not appear as an all-gather
    op (the overlap decode path keeps its HLO free of bare gather
    collectives; at decode sizes the p-1 hops of a [B, cols] tile are
    noise). Returns [..., P * cols] with shard ``i``'s columns at
    ``i * cols``."""
    p = jax.lax.axis_size(axis_name)
    i = jax.lax.axis_index(axis_name)
    cl = x.shape[-1]
    out = jnp.zeros(x.shape[:-1] + (p * cl,), x.dtype)
    buf = x
    for c in range(p):
        src = (i - c) % p
        out = jax.lax.dynamic_update_slice(
            out, buf, (0,) * (x.ndim - 1) + (src * cl,))
        if c + 1 < p:
            buf = jax.lax.ppermute(buf, axis_name, _perm(p, 1))
    return out


def ring_matmul_reduce_scatter(x, w, axis_name: str, bidirectional=True,
                               mm=None):
    """``reduce_scatter(x @ w, axis, rows)`` as a matmul-overlapped ring.

    Args (per-shard views inside shard_map):
      x: [m, k_local] — contraction shard of the activations.
      w: [k_local, n] — row shard of the weight (row-parallel layout).
      mm: optional chunk-matmul hook ``rows -> rows @ w`` (overrides
         ``w``; quantized-storage weights). Bidirectional mode needs the
         plain ``w`` (it splits the weight's columns), so ``mm`` forces
         unidirectional.
    Returns [m // P, n]: shard ``i`` of ``psum_scatter(x @ w)`` over the
    output's row dim — bit-comparable to
    ``jax.lax.psum_scatter(x @ w, axis, scatter_dimension=0)`` up to
    f32 summation order.

    Step s computes one chunk's local partial product and adds it to
    the accumulator that just arrived — the NEXT step's dot is
    independent of the incoming ppermute, so transfer and MXU overlap.
    """
    p = jax.lax.axis_size(axis_name)
    i = jax.lax.axis_index(axis_name)
    m = x.shape[0]
    assert m % p == 0, "rows must divide the axis for reduce-scatter"
    c = m // p
    if mm is not None:
        bidirectional = False

    def partial(j):
        rows = jax.lax.dynamic_slice_in_dim(x, j * c, c, 0)
        return rows @ w if mm is None else mm(rows)

    if p == 1:
        return partial(jnp.int32(0))

    # +1 ring: the accumulator that ends at device i after p-1 hops
    # started at device (i+1) holding chunk (i - (p-1) + (p-1)) = ...
    # concretely: start with chunk (i-1)%p, and at hop s add chunk
    # (i-1-s)%p — the final arrival is chunk i, matching psum_scatter.
    if not bidirectional:
        acc = partial((i - 1) % p)
        for s in range(1, p):
            acc = jax.lax.ppermute(acc, axis_name, _perm(p, 1))
            acc = acc + partial((i - 1 - s) % p)
        return acc      # chunk i, fully reduced

    # Bidirectional: column-halves of the output accumulate along
    # opposite rings.
    n = w.shape[1]
    hn = n // 2
    wf, wb = w[:, :hn], w[:, hn:]

    def part_cols(j, wc):
        rows = jax.lax.dynamic_slice_in_dim(x, j * c, c, 0)
        return rows @ wc

    accf = part_cols((i - 1) % p, wf)
    accb = part_cols((i + 1) % p, wb)
    for s in range(1, p):
        accf = jax.lax.ppermute(accf, axis_name, _perm(p, 1))
        accb = jax.lax.ppermute(accb, axis_name, _perm(p, -1))
        accf = accf + part_cols((i - 1 - s) % p, wf)
        accb = accb + part_cols((i + 1 + s) % p, wb)
    return jnp.concatenate([accf, accb], axis=1)
