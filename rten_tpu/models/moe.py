"""Mixture-of-Experts MLP block (Mixtral / Switch-Transformer class).

The reference has no MoE support (single-process CPU inference,
rten-examples covers dense models only; see SURVEY.md §2.2); this extends
the model-family surface per the north-star additions, designed TPU-first
rather than ported:

* **Routing** follows the Mixtral convention: softmax over all experts in
  f32, top-k, renormalize the selected weights (matches HF
  ``MixtralSparseMoeBlock``; parity-tested in tests/test_moe.py).
* **Decode / expert-parallel path** — dense all-experts einsum. At decode
  batch sizes every expert's weights stream from HBM regardless of
  routing, so masked dense compute is bandwidth-neutral; and the
  contraction over the expert dim is exactly what GSPMD needs to shard
  experts over an ``expert`` mesh axis (one psum per block, riding ICI).
* **Prefill path** — token sort + :func:`jax.lax.ragged_dot` grouped GEMM:
  dropless (no capacity factor, no token dropping — unacceptable at
  inference), static shapes (T·k assignment rows), MXU-tiled by XLA.

Weight layout: expert-stacked 3-D arrays ``[E, d_in, d_out]`` so one
GEMM/einsum covers all experts; int8 expert stacks (per-expert,
per-output-channel scales) take the dense path with an XLA-hoisted bf16
cast (same rationale as the dense-layer small-weight path, see
``transformer._WO_PALLAS_MIN_ELEMENTS``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def route_topk(router_logits, k):
    """Mixtral routing: softmax over ALL experts (f32), take top-k,
    renormalize. Returns (weights [T, k] f32, expert idx [T, k] i32)."""
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    weights, idx = lax.top_k(probs, k)
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    return weights, idx.astype(jnp.int32)


def combine_matrix(idx, weights, n_experts):
    """Sparse [T, k] routing → dense combine matrix [T, E] (zero where an
    expert is unselected)."""
    onehot = jax.nn.one_hot(idx, n_experts, dtype=weights.dtype)
    return jnp.einsum("tke,tk->te", onehot, weights)


def _as_float(w, dtype):
    """Expert weight stack → float array [E, K, N] (+ int8 dequant).
    The int8→bf16 cast is loop-invariant, so XLA hoists it out of decode
    scans; scales fold into the epilogue."""
    from .transformer import QuantWeight
    if isinstance(w, QuantWeight):
        if w.kind != "int8":
            raise NotImplementedError("MoE expert stacks support int8 only")
        return w.data.astype(dtype), w.scales  # scales [E, N]
    return w.astype(dtype), None


def _moe_dense(x2, cw, layer, act, compute_dtype):
    """All-experts path: h[e] = FFN_e(x) for every expert, combined with
    the sparse weights. x2 [T, d], cw [T, E] → [T, d] (f32)."""
    wu, su = _as_float(layer["w_up"], compute_dtype)
    wd, sd = _as_float(layer["w_down"], compute_dtype)
    xc = x2.astype(compute_dtype)
    up = jnp.einsum("td,edf->etf", xc, wu,
                    preferred_element_type=jnp.float32)
    if su is not None:
        up = up * su[:, None, :]
    if act == "swiglu":
        wg, sg = _as_float(layer["w_gate"], compute_dtype)
        gate = jnp.einsum("td,edf->etf", xc, wg,
                          preferred_element_type=jnp.float32)
        if sg is not None:
            gate = gate * sg[:, None, :]
        h = jax.nn.silu(gate) * up
    else:
        if "b_up" in layer:
            up = up + layer["b_up"][:, None, :]
        h = jax.nn.gelu(up, approximate=False)
    out = jnp.einsum("etf,efd->etd", h.astype(compute_dtype), wd,
                     preferred_element_type=jnp.float32)
    if sd is not None:
        out = out * sd[:, None, :]
    if "b_down" in layer:
        out = out + layer["b_down"][:, None, :]
    return jnp.einsum("etd,te->td", out, cw.astype(jnp.float32))


def _moe_ragged(x2, weights, idx, layer, act, n_experts, compute_dtype):
    """Dropless grouped-GEMM path: sort the T·k (token, expert)
    assignments by expert, run each projection as ONE ``lax.ragged_dot``
    over the expert-stacked weights, scatter-add back with the routing
    weights. x2 [T, d] → [T, d] (f32)."""
    T, d = x2.shape
    k = idx.shape[1]
    flat_e = idx.reshape(-1)                          # [A], A = T*k
    order = jnp.argsort(flat_e, stable=True)
    tok = order // k                                  # token per sorted row
    xg = jnp.take(x2, tok, axis=0).astype(compute_dtype)
    group_sizes = jnp.bincount(flat_e, length=n_experts).astype(jnp.int32)
    sorted_e = jnp.take(flat_e, order)

    def rdot(lhs, w):
        wf, scales = _as_float(w, compute_dtype)
        out = lax.ragged_dot(lhs.astype(compute_dtype), wf, group_sizes,
                             preferred_element_type=jnp.float32)
        if scales is not None:
            out = out * jnp.take(scales, sorted_e, axis=0)
        return out

    up = rdot(xg, layer["w_up"])
    if act == "swiglu":
        h = jax.nn.silu(rdot(xg, layer["w_gate"])) * up
    else:
        if "b_up" in layer:
            up = up + jnp.take(layer["b_up"], sorted_e, axis=0)
        h = jax.nn.gelu(up, approximate=False)
    out = rdot(h, layer["w_down"])
    if "b_down" in layer:
        out = out + jnp.take(layer["b_down"], sorted_e, axis=0)
    wsorted = jnp.take(weights.reshape(-1), order).astype(jnp.float32)
    y = jnp.zeros((T, d), jnp.float32)
    return y.at[tok].add(out * wsorted[:, None])


def moe_mlp(x, layer_params, cfg):
    """MoE feed-forward. x: [..., d] → same shape/dtype.

    Path choice (``cfg.moe_impl``): "dense" | "ragged" | "auto". Auto uses
    ragged grouped-GEMM for prefill-size token counts and dense for
    decode-size (where all-expert compute is HBM-neutral and the expert
    contraction shards); int8 expert stacks always take dense (ragged_dot
    wants float rhs; the hoisted-cast trick keeps dense cheap)."""
    from .transformer import QuantWeight
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    T = x2.shape[0]
    logits = jnp.matmul(x2.astype(jnp.float32),
                        layer_params["router"].astype(jnp.float32))
    weights, idx = route_topk(logits, cfg.experts_per_token)
    quantized = isinstance(layer_params["w_up"], QuantWeight)
    impl = cfg.moe_impl
    if impl == "auto":
        impl = "dense" if (T <= 64 or quantized) else "ragged"
    compute_dtype = (jnp.bfloat16 if cfg.dtype == "bfloat16"
                     else jnp.float32)
    if impl == "ragged" and not quantized:
        y = _moe_ragged(x2, weights, idx, layer_params, cfg.act,
                        cfg.n_experts, compute_dtype)
    else:
        cw = combine_matrix(idx, weights, cfg.n_experts)
        y = _moe_dense(x2, cw, layer_params, cfg.act, compute_dtype)
    return y.reshape(*lead, -1).astype(x.dtype)
