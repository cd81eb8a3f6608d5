"""Native serving engine: jitted prefill/decode over fixed shapes with
continuous batching.

This is the performance re-imagining of the reference's generation loop
(rten-generate): instead of an iterator re-running a growing graph, the
engine compiles exactly two programs per bucket —

* ``prefill(params, tokens[1, S_bucket], length)`` → per-request cache
  entries (one compile per prompt-length bucket), and
* ``decode(params, tokens[B], cache, key)`` → next tokens + updated cache
  (ONE compile total; the cache is donated, so HBM is updated in place).

Continuous batching: the batch is a set of slots. Finished sequences free
their slot; queued requests are prefilled (batch-1) and their KV entries
are scattered into the freed slot (``KVCache.insert_sequence``), so the
decode program never recompiles and the batch stays full — queueing
discipline the reference leaves to the caller
(docs/performance.md:139-141) is built in here.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .kv_cache import KVCache
from .metrics import Metrics
from .sampler import ArgMaxSampler, Sampler


def _bucket(n, buckets):
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


@dataclass
class Request:
    prompt_ids: list
    max_new_tokens: int = 128
    stop_ids: tuple = ()
    # filled by the engine:
    request_id: int = -1
    tokens: list = field(default_factory=list)
    done: bool = False
    metrics: Metrics = field(default_factory=Metrics)


class ServingEngine:
    def __init__(self, model, params, max_batch=8, capacity=1024,
                 sampler: Optional[Sampler] = None, quantized_cache=False,
                 prefill_buckets=(64, 128, 256, 512, 1024), seed=0,
                 mesh=None):
        """``mesh``: a `(data, model)` jax Mesh — weights go tensor-
        parallel over `model`, the KV cache shards over (batch=data,
        heads=model), and every compiled program runs under GSPMD with
        XLA inserting the ICI collectives. ``max_batch`` must divide by
        the data-axis size."""
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            from ..parallel import shard_params
            params = shard_params(params, mesh)
        self.params = params
        self.max_batch = max_batch
        self.capacity = capacity
        self.sampler = sampler or ArgMaxSampler()
        self.quantized_cache = quantized_cache
        self.prefill_buckets = tuple(
            b for b in prefill_buckets if b <= capacity) or (capacity,)
        self._key = jax.random.PRNGKey(seed)

        self.cache = model.new_cache(max_batch, capacity,
                                     quantized=quantized_cache)
        if mesh is not None:
            from ..parallel import shard_cache
            self.cache = shard_cache(self.cache, mesh)
        # Slot bookkeeping (host side).
        self.slot_request: list[Optional[Request]] = [None] * max_batch
        self.queue: list[Request] = []
        self._next_id = 0
        self.current_tokens = np.zeros(max_batch, np.int32)

        # --- compiled programs ---
        def prefill_fn(params, tokens, lengths):
            """Batched prefill: tokens [G, bucket], per-request lengths
            [G]. One compile per (bucket, G) pair; admission batches all
            same-bucket queued requests to amortize dispatch."""
            group = tokens.shape[0]
            cache = model.new_cache(group, capacity,
                                    quantized=quantized_cache)
            logits, cache = model.forward(
                params, tokens, cache,
                lengths=jnp.zeros(group, jnp.int32))
            # The bucket may exceed each true length: the cache holds
            # garbage past `lengths[g]`, which decode masks out; pick the
            # logits at each request's last *real* token.
            last = logits[jnp.arange(group), lengths - 1]
            cache = KVCache(cache.keys, cache.values,
                            jnp.asarray(lengths, jnp.int32),
                            cache.quant_scales)
            return last, cache

        self._prefill = jax.jit(prefill_fn)

        def decode_fn(params, tokens, cache, key):
            logits, cache = model.decode_step(params, tokens, cache)
            next_tokens = self.sampler.sample(key, logits)
            return next_tokens, logits, cache

        self._decode = jax.jit(decode_fn, donate_argnums=(2,))

        def burst_fn(params, tokens, cache, key, n):
            """n chained decode steps fully on device (one dispatch, one
            host sync) — amortizes host↔device latency over n tokens."""
            def body(carry, _):
                tokens, cache, key = carry
                key, sub = jax.random.split(key)
                logits, cache = model.decode_step(params, tokens, cache)
                nxt = self.sampler.sample(sub, logits)
                return (nxt, cache, key), nxt

            (tokens, cache, _), toks = jax.lax.scan(
                body, (tokens, cache, key), None, length=n)
            return toks, cache

        self._decode_burst = jax.jit(burst_fn, donate_argnums=(2,),
                                     static_argnums=(4,))

        def insert_fn(cache, prefilled, slot, length, token, src_slot):
            return cache.insert_sequence(prefilled, slot, length,
                                         src_slot=src_slot)

        self._insert = jax.jit(insert_fn, donate_argnums=(0,))

    # -- request lifecycle --------------------------------------------------

    def submit(self, prompt_ids, max_new_tokens=128, stop_ids=()) -> Request:
        req = Request(list(map(int, prompt_ids)), max_new_tokens,
                      tuple(stop_ids))
        req.request_id = self._next_id
        self._next_id += 1
        req.metrics.start()
        self.queue.append(req)
        return req

    def _admit(self):
        """Fill free slots from the queue: batched prefill per prompt-
        length bucket (one compiled program admits the whole group — the
        p50-TTFT lever), then scatter each sequence into its slot."""
        free = [s for s in range(self.max_batch)
                if self.slot_request[s] is None]
        if not free or not self.queue:
            return
        batch_reqs = self.queue[:len(free)]
        del self.queue[:len(batch_reqs)]
        by_bucket: dict = {}
        for req in batch_reqs:
            n = len(req.prompt_ids)
            if n >= self.capacity:
                raise ValueError(
                    f"prompt length {n} exceeds cache capacity")
            by_bucket.setdefault(_bucket(n, self.prefill_buckets),
                                 []).append(req)
        slot_iter = iter(free)
        for bucket, reqs in by_bucket.items():
            group = len(reqs)
            tokens = np.zeros((group, bucket), np.int32)
            lengths = np.zeros(group, np.int32)
            for gi, req in enumerate(reqs):
                tokens[gi, :len(req.prompt_ids)] = req.prompt_ids
                lengths[gi] = len(req.prompt_ids)
            last_logits, prefilled = self._prefill(
                self.params, jnp.asarray(tokens), jnp.asarray(lengths))
            self._key, sub = jax.random.split(self._key)
            firsts = np.asarray(self.sampler.sample(sub, last_logits))
            for gi, req in enumerate(reqs):
                slot = next(slot_iter)
                first = int(np.asarray(firsts).reshape(-1)[gi])
                self.cache = self._insert(self.cache, prefilled, slot,
                                          int(lengths[gi]), first, gi)
                req.tokens.append(first)
                req.metrics.step()
                self.current_tokens[slot] = first
                self.slot_request[slot] = req
                self._finish_if_done(slot, first, length=int(lengths[gi]))

    def _finish_if_done(self, slot, token, length=None):
        req = self.slot_request[slot]
        if req is None:
            return
        # `length` is passed from a single host-side snapshot per step —
        # reading self.cache.lengths[slot] here would be one device fetch
        # per token, which dominates through a high-latency link.
        if length is None:
            length = int(np.asarray(self.cache.lengths)[slot])
        if token in req.stop_ids or len(req.tokens) >= req.max_new_tokens \
                or length + 1 >= self.capacity:
            req.done = True
            self.slot_request[slot] = None

    def step(self) -> int:
        """One engine iteration: admit queued requests, run one decode
        step for every active slot. Returns number of active slots."""
        self._admit()
        active = [s for s in range(self.max_batch)
                  if self.slot_request[s] is not None]
        if not active:
            return 0
        self._key, sub = jax.random.split(self._key)
        next_tokens, logits, self.cache = self._decode(
            self.params, jnp.asarray(self.current_tokens), self.cache, sub)
        next_np = np.asarray(next_tokens)
        lengths_np = np.asarray(self.cache.lengths)
        for slot in active:
            req = self.slot_request[slot]
            token = int(next_np[slot])
            req.tokens.append(token)
            req.metrics.step()
            self.current_tokens[slot] = token
            self._finish_if_done(slot, token, length=int(lengths_np[slot]))
        return len(active)

    def step_burst(self, n: int) -> int:
        """Run ``n`` decode steps on-device for the current batch, then do
        host-side bookkeeping once. Stop tokens are honored post hoc (a
        request keeps its tokens up to the stop). Returns tokens emitted
        to live requests."""
        self._admit()
        active = [s for s in range(self.max_batch)
                  if self.slot_request[s] is not None]
        if not active:
            return 0
        lengths_np = np.asarray(self.cache.lengths)
        headroom = self.capacity - 1 - max(int(lengths_np[s]) for s in active)
        n = min(n, max(1, headroom))
        self._key, sub = jax.random.split(self._key)
        toks, self.cache = self._decode_burst(
            self.params, jnp.asarray(self.current_tokens), self.cache, sub,
            n)
        toks_np = np.asarray(toks)          # [n, B]
        emitted = 0
        for slot in active:
            req = self.slot_request[slot]
            for i in range(n):
                token = int(toks_np[i, slot])
                req.tokens.append(token)
                req.metrics.step()
                emitted += 1
                self.current_tokens[slot] = token
                self._finish_if_done(slot, token,
                                     length=int(lengths_np[slot]) + i + 1)
                if self.slot_request[slot] is None:
                    break
        return emitted

    def run(self, requests=None, max_steps=100000, burst=1):
        """Drive the engine until every request completes. ``burst`` > 1
        decodes that many tokens per device dispatch."""
        if requests:
            for req in requests:
                if req not in self.queue and not req.done:
                    self.queue.append(req)
        steps = 0
        while (self.queue or any(r is not None for r in self.slot_request)) \
                and steps < max_steps:
            if burst > 1:
                self.step_burst(burst)
            else:
                self.step()
            steps += 1
        return steps

    # -- batch convenience ---------------------------------------------------

    def generate(self, prompts, max_new_tokens=32, stop_ids=(), burst=1):
        """Synchronous batch API: returns a list of generated-token lists."""
        reqs = [self.submit(p, max_new_tokens, stop_ids) for p in prompts]
        self.run(burst=burst)
        return [r.tokens for r in reqs]
