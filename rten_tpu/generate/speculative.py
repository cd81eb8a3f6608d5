"""Self-speculative decoding: on-device n-gram prompt-lookup drafts +
chunked verification.

A serving feature beyond the reference's surface (rten-generate decodes
strictly one token per step, rten-generate/src/generator.rs:456): each
decode step drafts ``k`` candidate tokens by matching the sequence's
trailing n-gram against its own history (prompt-lookup decoding — no
draft model), verifies all of them in ONE chunked forward
(``TransformerLM.verify_step``), and commits the longest prefix that
greedy decoding agrees with, plus the model's own next token. Greedy
output is therefore EXACTLY the token stream of plain decoding — only
the step count shrinks (by the acceptance rate), which matters most on
repetitive text (code, structured output, summarization overlap).

TPU-first design: drafting, verification, acceptance, and the token
history all live on device with static shapes, so a whole multi-step
speculative burst runs as one compiled program (one dispatch, one host
sync) — per-step host round trips through a high-latency dispatch link
would otherwise eat the speedup.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def ngram_draft(history, hist_len, n: int, k: int):
    """Prompt-lookup drafting, vectorized over the batch.

    ``history`` [B, cap] int32 — committed tokens per sequence (valid
    prefix ``hist_len[b]``; rows beyond are garbage). Finds the LAST
    position ``j < hist_len - n`` where ``history[j:j+n]`` equals the
    trailing n-gram, and proposes the ``k`` tokens that followed it.
    Sequences with no match draft their last token repeated (cheap, and
    greedy LMs do repeat).

    Returns drafts [B, k] int32.
    """
    b, cap = history.shape
    pos = jnp.arange(cap)
    tail_idx = jnp.clip(hist_len[:, None] - n + jnp.arange(n)[None, :],
                        0, cap - 1)
    tail = jnp.take_along_axis(history, tail_idx, axis=1)        # [B, n]

    def shifted(i):
        # history[:, j + i] for every j (tail-padded; masked below).
        return jnp.concatenate(
            [history[:, i:], jnp.zeros((b, i), history.dtype)], axis=1)

    match = functools.reduce(
        jnp.logical_and,
        [shifted(i) == tail[:, i:i + 1] for i in range(n)])
    # j must start a FULL n-gram strictly before the trailing one, with
    # at least one continuation token inside the valid prefix.
    match &= pos[None, :] < hist_len[:, None] - n
    found = jnp.any(match, axis=1)
    # Last matching j: argmax over reversed rows.
    j = cap - 1 - jnp.argmax(match[:, ::-1], axis=1)
    start = j + n
    draft_idx = start[:, None] + jnp.arange(k)[None, :]
    draft_idx = jnp.clip(draft_idx, 0, hist_len[:, None] - 1)
    drafts = jnp.take_along_axis(history, draft_idx, axis=1)
    last = jnp.take_along_axis(
        history, jnp.clip(hist_len[:, None] - 1, 0, cap - 1), axis=1)
    return jnp.where(found[:, None], drafts, last).astype(jnp.int32)


def make_spec_burst(model, n_gram: int, k_draft: int):
    """Build the speculative burst body: ``fn(params, history, cache,
    n_steps)`` → (history, cache, tokens [n, B, k+1], counts [n, B]).

    Each scan step: draft k, verify k+1 (last committed token + drafts)
    in one chunked forward, accept the agreeing prefix + the bonus
    token. ``history`` rows are written with the full greedy output
    (the committed prefix IS its first ``counts`` entries; the rest is
    overwritten by later steps before becoming valid). Cache lengths
    advance by the per-sequence accepted count.
    """

    def burst(params, history, cache, n_steps: int):
        def body(carry, _):
            history, cache = carry
            hist_len = cache.lengths + 1      # committed tokens per row
            drafts = ngram_draft(history, hist_len, n_gram, k_draft)
            last = jnp.take_along_axis(
                history, jnp.clip(hist_len[:, None] - 1, 0,
                                  history.shape[1] - 1), axis=1)
            tokens = jnp.concatenate([last, drafts], axis=1)  # [B, k+1]
            logits, cache = model.verify_step(params, tokens, cache)
            greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            ok = (drafts == greedy[:, :-1]).astype(jnp.int32)
            accepted = jnp.cumprod(ok, axis=1).sum(axis=1)    # [B]
            n_emit = accepted + 1                             # + bonus

            def write(row, toks, pos):
                return jax.lax.dynamic_update_slice(row, toks, (pos,))

            history = jax.vmap(write)(history, greedy, hist_len)
            cache = cache.with_lengths(cache.lengths + n_emit)
            return (history, cache), (greedy, n_emit)

        (history, cache), (toks, counts) = jax.lax.scan(
            body, (history, cache), None, length=n_steps)
        # Device-resident LAST COMMITTED token per sequence (round-5
        # fix): the engine chains the next plain burst on this array
        # directly — nulling it forced a host token re-upload at every
        # spec->plain transition, and through the dev tunnel's relay a
        # host upload costs 0.3-3 s (cProfile: batched_device_put
        # 288 ms+ per call), ~1.1 s/burst of phantom spec cost.
        last = jnp.take_along_axis(
            toks[-1], jnp.clip(counts[-1] - 1, 0,
                               toks.shape[-1] - 1)[:, None],
            axis=1)[:, 0]
        return history, cache, toks, counts, last

    return burst
