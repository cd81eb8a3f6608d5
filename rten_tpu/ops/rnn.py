"""GRU / LSTM per the ONNX spec.

Reference: ``src/ops/rnn.rs`` (gate orders: GRU z,r,h; LSTM i,o,f,c;
``sequence_lens`` ignored, peephole weights unsupported — matched here).

TPU-first structure: the input-side projection ``X @ W^T`` for *all*
timesteps is hoisted out of the recurrence as one large MXU matmul; the
``lax.scan`` body only carries the hidden-side matmul, which is the true
sequential dependency.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fmt import schema
from .registry import register

_DIRECTIONS = schema.ENUMS["RNNDirection"]


def _direction_plan(direction):
    name = _DIRECTIONS[direction]
    if name == "Forward":
        return [False]
    if name == "Reverse":
        return [True]
    return [False, True]


def _sigmoid(x):
    return jax.nn.sigmoid(x)


@register("GRU")
def gru(ctx, attrs, x, w, r, b=None, seq_len=None, initial_h=None):
    hidden = int(attrs.get("hidden_size", 0)) or r.shape[-1]
    linear_before_reset = bool(attrs.get("linear_before_reset", False))
    directions = _direction_plan(int(attrs.get("direction", 0)))
    seq, batch, _ = x.shape

    ys, hs = [], []
    for d, reverse in enumerate(directions):
        wd, rd = w[d], r[d]                      # [3H, I], [3H, H]
        if b is not None:
            wb, rb = b[d, :3 * hidden], b[d, 3 * hidden:]
        else:
            wb = rb = jnp.zeros(3 * hidden, x.dtype)
        h0 = (initial_h[d] if initial_h is not None
              else jnp.zeros((batch, hidden), x.dtype))
        xs = jnp.flip(x, 0) if reverse else x
        # Hoisted input projection: one [seq*batch, I] @ [I, 3H] matmul.
        xw = jnp.einsum("sbi,gi->sbg", xs, wd,
                        preferred_element_type=jnp.float32) + wb

        rz, rr, rh = (rd[:hidden], rd[hidden:2 * hidden], rd[2 * hidden:])
        rbz, rbr, rbh = (rb[:hidden], rb[hidden:2 * hidden], rb[2 * hidden:])

        def step(h_prev, xw_t):
            xz = xw_t[:, :hidden]
            xr = xw_t[:, hidden:2 * hidden]
            xh = xw_t[:, 2 * hidden:]
            z = _sigmoid(xz + h_prev @ rz.T + rbz)
            rg = _sigmoid(xr + h_prev @ rr.T + rbr)
            if linear_before_reset:
                htilde = jnp.tanh(xh + rg * (h_prev @ rh.T + rbh))
            else:
                htilde = jnp.tanh(xh + (rg * h_prev) @ rh.T + rbh)
            h = (1 - z) * htilde + z * h_prev
            return h, h

        h_last, y = jax.lax.scan(step, h0, xw)
        if reverse:
            y = jnp.flip(y, 0)
        ys.append(y)
        hs.append(h_last)

    y = jnp.stack(ys, axis=1)        # [seq, dirs, batch, hidden]
    h_n = jnp.stack(hs, axis=0)      # [dirs, batch, hidden]
    return y, h_n


@register("LSTM")
def lstm(ctx, attrs, x, w, r, b=None, seq_len=None, initial_h=None,
         initial_c=None):
    hidden = int(attrs.get("hidden_size", 0)) or r.shape[-1]
    directions = _direction_plan(int(attrs.get("direction", 0)))
    seq, batch, _ = x.shape

    ys, hs, cs = [], [], []
    for d, reverse in enumerate(directions):
        wd, rd = w[d], r[d]                      # [4H, I], [4H, H]
        if b is not None:
            wb, rb = b[d, :4 * hidden], b[d, 4 * hidden:]
        else:
            wb = rb = jnp.zeros(4 * hidden, x.dtype)
        h0 = (initial_h[d] if initial_h is not None
              else jnp.zeros((batch, hidden), x.dtype))
        c0 = (initial_c[d] if initial_c is not None
              else jnp.zeros((batch, hidden), x.dtype))
        xs = jnp.flip(x, 0) if reverse else x
        xw = jnp.einsum("sbi,gi->sbg", xs, wd,
                        preferred_element_type=jnp.float32) + wb

        def gates(v):
            # ONNX gate order: input, output, forget, cell.
            return (v[..., :hidden], v[..., hidden:2 * hidden],
                    v[..., 2 * hidden:3 * hidden], v[..., 3 * hidden:])

        def step(carry, xw_t):
            h_prev, c_prev = carry
            hr = h_prev @ rd.T + rb
            xi, xo, xf, xc = gates(xw_t)
            hi, ho, hf, hc = gates(hr)
            i = _sigmoid(xi + hi)
            o = _sigmoid(xo + ho)
            f = _sigmoid(xf + hf)
            ctilde = jnp.tanh(xc + hc)
            c = f * c_prev + i * ctilde
            h = o * jnp.tanh(c)
            return (h, c), h

        (h_last, c_last), y = jax.lax.scan(step, (h0, c0), xw)
        if reverse:
            y = jnp.flip(y, 0)
        ys.append(y)
        hs.append(h_last)
        cs.append(c_last)

    y = jnp.stack(ys, axis=1)
    return y, jnp.stack(hs, axis=0), jnp.stack(cs, axis=0)
