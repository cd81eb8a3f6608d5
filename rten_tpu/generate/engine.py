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
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .metrics import Metrics
from .sampler import (ArgMaxSampler, PerRequestSampler, Sampler,
                      SamplingParams)

# Process-wide measured dispatch-floor cache (see
# _measure_dispatch_floor).
_DISPATCH_FLOOR = None


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
    # per-request sampling (used when the engine's sampler is a
    # PerRequestSampler; None = greedy)
    sampling: Optional[SamplingParams] = None
    # filled by the engine:
    request_id: int = -1
    tokens: list = field(default_factory=list)
    logprobs: list = field(default_factory=list)  # per sampled token,
    # filled when the engine runs with logprobs=True
    done: bool = False
    metrics: Metrics = field(default_factory=Metrics)


class ServingEngine:
    def __init__(self, model, params, max_batch=8, capacity=1024,
                 sampler: Optional[Sampler] = None, quantized_cache=False,
                 prefill_buckets=(64, 128, 256, 512, 1024), seed=0,
                 mesh=None, paged=False, page_size=64, pool_pages=None,
                 cache_dtype=None, fused_head=None, log_stats_every=None,
                 spec_draft=0, spec_ngram=3, spec_adaptive="auto",
                 spec_cost=1.9, spec_probe_every=16,
                 spec_k_adaptive=True, spec_probe_overhead=0.02,
                 logprobs=False, tail_window=None, overlap=False,
                 cache=None):
        """``mesh``: a `(data, model)` jax Mesh — weights go tensor-
        parallel over `model`, the KV cache shards over (batch=data,
        heads=model), and every compiled program runs under GSPMD with
        XLA inserting the ICI collectives. ``max_batch`` must divide by
        the data-axis size.

        ``paged=True``: block-paged KV cache — HBM holds only the pages
        sequences actually use (``pool_pages`` × ``page_size`` tokens
        shared across slots; default pool = max_batch × capacity, i.e.
        no oversubscription). Long and short requests share the pool;
        a request exceeding its mapped pages gets more from the host
        allocator before each decode burst."""
        # ``cache``: storage policy name ("auto" | "int8" | "bf16" |
        # "f32") that resolves quantized_cache/cache_dtype. "auto"
        # picks the measured-best supported layout (BASELINE.md:
        # token-packed int8 is 21% faster than bf16 at cap 512 / batch
        # 256 and 41% faster at cap 4096 — int8 whenever the Pallas
        # decode kernels can read it, bf16 otherwise), keyed on the
        # same config/capacity constraints the kernel selection uses.
        if cache is not None:
            assert cache in ("auto", "int8", "bf16", "f32"), cache
            assert cache_dtype is None and not quantized_cache, \
                "pass either cache= or quantized_cache/cache_dtype"
            if cache == "auto":
                cfg_c = getattr(model, "config", None)
                lg = 1 if mesh is None else dict(
                    mesh.shape).get("model", 1)
                int8_ok = (cfg_c is not None and cfg_c.use_pallas
                           and not cfg_c.scan_layers
                           and capacity % 4 == 0
                           and cfg_c.n_kv_heads % lg == 0
                           and cfg_c.n_kv_heads // lg <= 64)
                cache = "int8" if int8_ok else "bf16"
            if cache == "int8":
                quantized_cache = True
            elif cache == "bf16":
                cache_dtype = "bfloat16"
            elif cache == "f32":
                cache_dtype = "float32"
        self.mesh = mesh
        if mesh is not None:
            from ..parallel import shard_params
            params = shard_params(params, mesh)
            # Pallas × mesh: the model routes append+attention through
            # a shard_map island per layer when its config has
            # use_pallas (models/transformer.py::_attn_island); caches
            # created below pick the TP scale-row layout accordingly.
            # Shallow-copy so a sibling engine sharing this model object
            # keeps its own (un)meshed compilation paths.
            if hasattr(model, "mesh"):
                import copy
                model = copy.copy(model)
                model.mesh = mesh
                if overlap:
                    # Ring-overlapped TP decode projections
                    # (parallel/tp_overlap.py): decode_step runs as one
                    # shard_map whose collectives are per-chunk
                    # ppermutes riding under the projection matmuls.
                    model.overlap = True
        else:
            assert not overlap, "overlap=True requires a mesh"
        self.model = model
        self.params = params
        self.max_batch = max_batch
        self.capacity = capacity
        self.sampler = sampler or ArgMaxSampler()
        # Per-request sampling: temperature/top-k/top-p ride as [B]
        # runtime inputs through the SAME compiled decode program.
        self._per_request = isinstance(self.sampler, PerRequestSampler)
        self._samp = np.zeros((3, max_batch), np.float32)  # temp, k, p rows
        self.quantized_cache = quantized_cache
        self.cache_dtype = cache_dtype
        self.paged = paged
        self.page_size = page_size
        self.prefill_buckets = tuple(
            b for b in prefill_buckets if b <= capacity) or (capacity,)
        # Admission groups must shard over the mesh batch axes: a
        # single-request admission under data=2 built a batch-1 group
        # cache the shard_map island cannot split (round-4 fix). The
        # dummy pad rows prefill one token and are never scattered.
        self._admit_multiple = 1
        if mesh is not None:
            sizes = dict(mesh.shape)
            self._admit_multiple = (sizes.get("data", 1)
                                    * sizes.get("dcn", 1))
        self._key = jax.random.PRNGKey(seed)
        # logprobs=True: every decode step also emits the sampled
        # token's log-probability (one logsumexp over logits the step
        # already materialized). Disables the fused argmax head, which
        # never forms logits.
        self.logprobs = bool(logprobs)

        self._tail_flush = 0
        if paged:
            from .paged_cache import PagedKVCache
            dp = 1
            if mesh is not None:
                # Paged serving under a mesh: the page pool shards over
                # the batch axes with partition-aware allocation
                # (round 4); a `model` axis adds tensor parallelism via
                # the lane-grouped scale-page layout + head-sharded
                # paged island (round 5 — requires the Pallas island,
                # so cfg.use_pallas and TP-divisible heads).
                sizes = dict(mesh.shape)
                assert not any(
                    n > 1 and ax not in ("data", "dcn", "model")
                    for ax, n in sizes.items()), \
                    "paged mode shards over data/model axes only"
                tp_p = sizes.get("model", 1)
                cfg_p = getattr(model, "config", None)
                assert tp_p == 1 or (
                    cfg_p is not None and cfg_p.use_pallas
                    and cfg_p.n_heads % tp_p == 0
                    and cfg_p.n_kv_heads % tp_p == 0
                    and ((cfg_p.n_kv_heads // tp_p)
                         * cfg_p.head_dim) % 128 == 0), \
                    "paged x TP needs the Pallas island " \
                    "(use_pallas, heads divisible by tp, " \
                    "local features 128-lane aligned)"
                dp = sizes.get("data", 1) * sizes.get("dcn", 1)
                assert max_batch % dp == 0
            n_pages = pool_pages or (
                max_batch * (-(-capacity // page_size)) + dp)
            n_pages = -(-n_pages // dp) * dp   # even partitions
            self.cache = model.new_paged_cache(max_batch, capacity,
                                               page_size, n_pages,
                                               quantized=quantized_cache)
            self.allocator = PagedKVCache.make_allocator(
                n_pages, partitions=dp,
                slots_per_partition=max_batch // dp)
        else:
            # bf16 tail write-buffer (generate/kv_cache.py): decode
            # appends become ONE dense row write at a global window slot
            # instead of the token-packed RMW kernel's 4 scalar-issued
            # DMAs per sequence (131 us/layer at batch 256 — the largest
            # single cost of the serving step); the window flushes into
            # the packed cache every ``_tail_flush`` steps inside the
            # jitted burst, and on the host before any admission /
            # speculative burst. Single-chip flat-kernel configs only.
            cfg = getattr(model, "config", None)
            # Tail under a MESH (round-3 verdict item 3a): the bf16
            # window shards exactly like the KV buffers (batch/data,
            # head-features/model), appends+flat-kernel reads run
            # inside the per-layer shard_map island, and flushes run as
            # their own island (parallel/sharding.py::flush_tail_island)
            # — so the headline fast path survives scaling out. The
            # per-shard shapes must satisfy the same flat-kernel
            # constraints the single-chip gate checks globally.
            tp = dp = 1
            mesh_tail_ok = True
            if mesh is not None:
                sizes = dict(mesh.shape)
                tp = sizes.get("model", 1)
                dp = sizes.get("data", 1) * sizes.get("dcn", 1)
                # overlap=True composes with the tail since round 5:
                # decode_step_overlap appends into / reads the sharded
                # bf16 window inside its island (tp_overlap.attend),
                # flushes keep running as flush_tail_island.
                mesh_tail_ok = (
                    not any(n > 1 and ax not in
                            ("data", "model", "dcn", "expert")
                            for ax, n in sizes.items())
                    and cfg is not None and cfg.n_heads % tp == 0
                    and cfg.n_kv_heads % tp == 0
                    and max_batch % dp == 0)

            def tail_shape_ok(window=16):
                import os as _os
                if cfg is None or not mesh_tail_ok:
                    return False
                from ..models.transformer import flat_group_for
                h_l = cfg.n_heads // tp
                kvh_l = cfg.n_kv_heads // tp
                f_l = kvh_l * cfg.head_dim
                b_l = max_batch // dp
                group = flat_group_for(b_l)
                if not group:
                    return False
                # Long-capacity tail (round 5, verdict item 2): the
                # bf16-E flat kernel's buffers fit scoped VMEM at
                # block_k=128 (modeled via the same arithmetic the g32
                # widening uses — flat_vmem_bytes), so the write-buffer
                # fast path no longer stops at cap 2048. Requires the
                # flat long-context dispatch (RTEN_FLAT_QBF16 +
                # RTEN_FLAT_LONGCTX, both default on) and cap % 128.
                if capacity >= 2048:
                    from ..models.transformer import (_FLAT_VMEM_BUDGET,
                                                      flat_vmem_bytes)
                    if b_l % 8 == 0 and b_l >= 16:
                        group = 8     # the long-cap dispatch's choice
                    if (capacity % 128 != 0
                            or _os.environ.get("RTEN_FLAT_QBF16", "1")
                            == "0"
                            or _os.environ.get("RTEN_FLAT_LONGCTX",
                                               "1") == "0"
                            or flat_vmem_bytes(h_l, cfg.head_dim,
                                               kvh_l, group, 128,
                                               window)
                            > _FLAT_VMEM_BUDGET):
                        return False
                return (capacity % 64 == 0
                        and f_l % 128 == 0
                        # flash_decode_flat's E-matrix must fit VMEM
                        and (-(-h_l // 8) * 8) * cfg.head_dim * f_l * 4
                        <= 4 * 1024 * 1024)

            if tail_window is not None:
                # Explicit override (0 disables; tests/A-B tooling). A
                # nonzero override must satisfy the same exclusions as
                # the auto-gate: speculative verify appends chunks
                # that bypass the window (advisor r3 finding 3), and a
                # mesh config must pass the per-shard island checks
                # (a tail-less island would silently corrupt the
                # packed cache at flush time).
                if tail_window:
                    assert quantized_cache and spec_draft == 0 \
                        and (mesh is None or (
                            mesh_tail_ok and cfg.use_pallas
                            and tail_shape_ok(int(tail_window)))), \
                        "tail_window requires a quantized cache, " \
                        "spec_draft == 0, and (single chip or an " \
                        "island-compatible mesh)"
                self._tail_flush = int(tail_window)
            elif (spec_draft == 0 and quantized_cache
                    and cfg is not None and cfg.use_pallas
                    and getattr(cfg, "decode_attn", "auto")
                    in ("auto", "flat")
                    and tail_shape_ok()):
                self._tail_flush = 16
            self.cache = model.new_cache(max_batch, capacity,
                                         quantized=quantized_cache,
                                         cache_dtype=cache_dtype,
                                         tail_window=self._tail_flush)
        if mesh is not None:
            from ..parallel import shard_cache
            self.cache = shard_cache(self.cache, mesh)
        # Host mirror of cache.tail_count (exact: +1 per decode step,
        # reset by flushes — no device fetch needed).
        self._tail_fill = 0

        if mesh is not None and self._tail_flush:
            from ..parallel.sharding import flush_tail_island

            def flush_fn(cache, t):
                return flush_tail_island(cache, t, mesh)
        else:
            def flush_fn(cache, t):
                return cache.flush_tail(t)

        # The raw (traceable) flush — burst_fn inlines it between
        # chunks; the jitted form below serves host-side flushes.
        self._flush_impl = flush_fn
        self._flush_tail = jax.jit(flush_fn, donate_argnums=(0,),
                                   static_argnums=(1,))

        # (host-side flush of a partially filled window lives in
        # _host_flush below)
        # Slot bookkeeping. When the native C++ scheduler is built
        # (native/scheduler.cpp), it owns the queue, slot lifecycle, and
        # the per-token stop-condition scan; ``slot_request`` stays as a
        # mirror mapping slots to Request objects for token delivery.
        from .native_sched import NativeScheduler
        from .native_sched import available as _sched_available
        self._sched = (NativeScheduler(max_batch, capacity)
                       if _sched_available() else None)
        self._handle_req: dict[int, Request] = {}
        self.slot_request: list[Optional[Request]] = [None] * max_batch
        self.queue: list[Request] = []
        self._next_id = 0
        self.current_tokens = np.zeros(max_batch, np.int32)
        # Host mirror of cache.lengths: every device read of lengths is a
        # full round trip through the dispatch link (~31 ms on the tunnel
        # chip), but the engine knows the lengths exactly — inserts set
        # them, each decode step advances every slot by one.
        self._host_lengths = np.zeros(max_batch, np.int64)
        # Device-resident last tokens: pipelined bursts chain directly on
        # the previous burst's output without a host round trip.
        self._device_tokens = None
        # Serving observability (SURVEY §5: queue depth, batch occupancy,
        # tokens/s per chip): cheap host counters + stats() snapshots;
        # ``log_stats_every=N`` emits one JSON line to stderr every N
        # bursts/steps.
        self.counters = {"submitted": 0, "completed": 0, "tokens": 0,
                         "bursts": 0, "decode_steps": 0, "prefix_hits": 0,
                         "cancelled": 0}
        self._t_start = time.perf_counter()
        self._log_every = log_stats_every
        # Latency percentiles (bounded reservoirs): per-request TTFT at
        # first token, per-token inter-token latency at request finish
        # (burst landings split their interval evenly — metrics.step_n),
        # and decode-stall-during-admission (wall time _admit spends
        # prefilling while decode slots sit idle — the tail the cumulative
        # counters can't see).
        from collections import deque
        self._ttfts = deque(maxlen=2048)
        self._itls = deque(maxlen=8192)
        self._admit_stalls = deque(maxlen=2048)

        # --- compiled programs ---
        def prefill_fn(params, tokens, lengths, cap):
            """Batched prefill: tokens [G, bucket], per-request lengths
            [G]. One compile per (bucket, G, cap) triple; admission
            batches all same-bucket queued requests to amortize
            dispatch. ``cap`` (static) sizes the group cache: admission
            passes the bucket (insert only copies rows [0, bucket), and
            a full-capacity group cache doubles the persistent cache's
            footprint — it OOMed a G=256/cap=512 f32 config); prefix
            registration passes the engine capacity (the fragment is
            extended in place by suffix chunks)."""
            group, bucket = tokens.shape
            if self.paged:
                # Group cache with an identity page table: each prefilled
                # sequence owns ceil(bucket/page) pool pages, adopted
                # into the serving pool at insert time.
                cache = model.new_paged_cache(
                    group, bucket, self.page_size,
                    group * (-(-bucket // self.page_size)),
                    identity_table=True, quantized=quantized_cache)
            else:
                cache = model.new_cache(group, cap,
                                        quantized=quantized_cache,
                                        cache_dtype=self.cache_dtype)
            # The bucket may exceed each true length: the cache holds
            # garbage past `lengths[g]`, which decode masks out; only the
            # logits at each request's last *real* token matter. Models
            # exposing ``prefill_last`` never materialize the [G, bucket,
            # vocab] logits (the largest prefill intermediate — it OOMed
            # a [256, 64] GPT-2 admission group).
            if hasattr(model, "prefill_last"):
                last, cache = model.prefill_last(params, tokens, cache,
                                                 lengths - 1)
            else:
                logits, cache = model.forward(
                    params, tokens, cache,
                    lengths=jnp.zeros(group, jnp.int32))
                last = logits[jnp.arange(group), lengths - 1]
            cache = cache.with_lengths(lengths)
            return last, cache

        self._prefill = jax.jit(prefill_fn, static_argnums=(3,))

        # Greedy sampling + an int8 head takes the fused LM-head+argmax
        # kernel (model.decode_step_argmax): no [B, vocab] logits, one
        # fewer kernel on the step's critical path. Sharded engines keep
        # the generic path (the Pallas head kernel is single-device).
        greedy = (isinstance(self.sampler, ArgMaxSampler)
                  or getattr(self.sampler, "temperature", None) == 0.0)
        self._fused_head = (fused_head if fused_head is not None else
                            (greedy and mesh is None
                             and hasattr(model, "decode_step_argmax")))
        if self.logprobs:
            self._fused_head = False

        def decode_one(params, tokens, cache, key, samp):
            zeros = jnp.zeros(tokens.shape[0], jnp.float32)
            if self._fused_head:
                nxt, cache = model.decode_step_argmax(params, tokens,
                                                      cache)
                return nxt, zeros, cache
            logits, cache = model.decode_step(params, tokens, cache)
            if self._per_request:
                nxt = self.sampler.sample(key, logits, *samp)
            else:
                nxt = self.sampler.sample(key, logits)
            if self.logprobs:
                lp = (logits[jnp.arange(logits.shape[0]), nxt]
                      - jax.nn.logsumexp(logits, axis=-1))
            else:
                lp = zeros
            return nxt, lp, cache

        def decode_fn(params, tokens, cache, key, samp):
            next_tokens, lp, cache = decode_one(params, tokens, cache,
                                                key, samp)
            return next_tokens, lp, cache

        self._decode = jax.jit(decode_fn, donate_argnums=(2,))

        def burst_fn(params, tokens, cache, key, samp, n):
            """n chained decode steps fully on device (one dispatch, one
            host sync) — amortizes host↔device latency over n tokens.
            With the tail write-buffer active, the burst runs as chunks
            of ``_tail_flush`` steps with an in-device flush between
            (the window must never overfill; the engine host-flushes any
            remainder before the next admission or burst)."""
            def body(carry, _):
                tokens, cache, key = carry
                key, sub = jax.random.split(key)
                nxt, lp, cache = decode_one(params, tokens, cache, sub,
                                            samp)
                return (nxt, cache, key), (nxt, lp)

            fl = self._tail_flush
            if fl and getattr(cache, "tail", None) is not None:
                chunks, rem = divmod(n, fl)

                def chunk_body(carry, _):
                    carry, outs = jax.lax.scan(body, carry, None,
                                               length=fl)
                    tokens, cache, key = carry
                    return (tokens, self._flush_impl(cache, fl),
                            key), outs

                carry = (tokens, cache, key)
                toks = lps = None
                if chunks:
                    carry, (toks, lps) = jax.lax.scan(
                        chunk_body, carry, None, length=chunks)
                    toks = toks.reshape(chunks * fl, *toks.shape[2:])
                    lps = lps.reshape(chunks * fl, *lps.shape[2:])
                if rem:
                    carry, (rt, rl) = jax.lax.scan(body, carry, None,
                                                   length=rem)
                    toks = rt if toks is None else jnp.concatenate(
                        [toks, rt])
                    lps = rl if lps is None else jnp.concatenate(
                        [lps, rl])
                tokens, cache, _ = carry
                return toks, lps, cache

            (tokens, cache, _), (toks, lps) = jax.lax.scan(
                body, (tokens, cache, key), None, length=n)
            return toks, lps, cache

        self._decode_burst = jax.jit(burst_fn, donate_argnums=(2,),
                                     static_argnums=(5,))

        if self._per_request:
            self._first_sample = jax.jit(self.sampler.sample)

        def insert_fn(cache, prefilled, slot, length, token, src_slot):
            return cache.insert_sequence(prefilled, slot, length,
                                         src_slot=src_slot)

        self._insert = jax.jit(insert_fn, donate_argnums=(0,))

        def insert_group_fn(cache, prefilled, slots, lengths):
            """Scatter a WHOLE admission group into its slots in one
            program. Per-request insert dispatches cost a full dispatch-
            link round trip each (~31 ms on the dev tunnel): a 256-
            request admission paid ~8 s of pure dispatch latency, which
            WAS the driver-observed p50 TTFT (3.9 s = half the group).
            One compile per admission-group size (already power-of-two
            padded)."""
            def body(g, c):
                return c.insert_sequence(prefilled, slots[g], lengths[g],
                                         src_slot=g)
            return jax.lax.fori_loop(0, slots.shape[0], body, cache)

        self._insert_group = jax.jit(insert_group_fn, donate_argnums=(0,))

        # Prefix cache (register_prefix): admission for a hit runs a
        # chunked forward over just the suffix, continuing the stored
        # fragment at depth plen. The fragment is NOT donated — it is
        # reused by every later hit.
        def suffix_fn(params, tokens, frag, plen, slens):
            cache = frag.with_lengths(jnp.broadcast_to(plen, slens.shape))
            logits, cache = model.forward(params, tokens, cache,
                                          chunk=True)
            last = logits[jnp.arange(tokens.shape[0]), slens - 1]
            return last, cache.with_lengths(plen + slens)

        self._suffix_prefill = jax.jit(suffix_fn)
        self._prefixes: list = []   # (token tuple, KV fragment), longest 1st

        # Self-speculative decoding (generate/speculative.py): draft
        # ``spec_draft`` tokens per step by n-gram prompt lookup, verify
        # them in one chunked forward. Greedy-exact; entirely on device.
        self.spec_draft = spec_draft
        self.spec_ngram = spec_ngram
        if spec_draft:
            assert not paged and mesh is None, \
                "speculative mode is single-mesh, unpaged for now"
            assert isinstance(self.sampler, ArgMaxSampler), \
                "speculative decoding is greedy-only"
            assert not self.logprobs, \
                "speculative decoding does not emit logprobs"
            # Variable tokens-per-step doesn't fit the native scheduler's
            # rectangular commit_burst; spec mode keeps the Python queue.
            self._sched = None
            from .speculative import make_spec_burst
            self._spec_history = jnp.zeros((max_batch, capacity), jnp.int32)
            # Draft-length ladder: the verify chunk is shape-static, so
            # each K compiles its own burst program (built lazily —
            # adaptation typically visits 2-3 rungs).
            self._spec_bursts: dict = {}

            def spec_burst_for(k):
                if k not in self._spec_bursts:
                    self._spec_bursts[k] = jax.jit(
                        make_spec_burst(model, spec_ngram, k),
                        donate_argnums=(1, 2), static_argnums=(3,))
                return self._spec_bursts[k]

            self._spec_burst_for = spec_burst_for

            def hist_set(history, row, slot):
                return jax.lax.dynamic_update_slice(history, row[None, :],
                                                    (slot, 0))

            self._hist_set = jax.jit(hist_set, donate_argnums=(0,))

            def hist_set_group(history, rows, slots):
                # Whole admission group in one dispatch (same round-trip
                # amortization as insert_group_fn).
                return history.at[slots].set(rows)

            self._hist_set_group = jax.jit(hist_set_group,
                                           donate_argnums=(0,))

            def hist_burst(history, toks, base):
                """Write a PLAIN burst's tokens ([n, B]) into the spec
                history at each slot's pre-burst depth — drafting after
                a gated-off stretch must see the full committed stream
                (stale rows would draft garbage and depress the probe's
                measured acceptance)."""
                def write(row, col, pos):
                    return jax.lax.dynamic_update_slice(row, col, (pos,))
                return jax.vmap(write)(history, toks.T, base + 1)

            def burst_hist_fn(params, tokens, cache, key, samp, history,
                              base, n):
                """Plain burst + history update in ONE program: a
                separate dispatch per burst costs a full dispatch-link
                round trip (~31 ms on the dev tunnel)."""
                toks, lps, cache = burst_fn(params, tokens, cache, key,
                                            samp, n)
                return toks, lps, cache, hist_burst(history, toks, base)

            self._decode_burst_hist = jax.jit(
                burst_hist_fn, donate_argnums=(2, 5), static_argnums=(7,))

            # Acceptance-adaptive gating: speculation only pays when the
            # mean accepted tokens/step exceeds the spec step's cost in
            # plain-step units. The cost ratio is MEASURED online (wall
            # time per spec step vs per plain step, EMA), starting from
            # the ``spec_cost`` prior; ``spec_adaptive=False`` keeps the
            # always-draft behavior. The default is ``"auto"``: resolved
            # at warmup from the MEASURED per-dispatch fixed cost — on
            # rigs where one dispatch round trip dwarfs a burst's
            # compute (the dev tunnel: ~31 ms/dispatch), every gating
            # probe costs a full burst-equivalent and always-draft with
            # the adaptive-K ladder is strictly better (v5e A/B,
            # BASELINE.md round 3: gated random 0.10x plain vs
            # always-draft 1.02x); on hardware without that floor the
            # gate's probes cost ~spec_probe_overhead and gating wins
            # the low-acceptance regime.
            self.spec_adaptive = spec_adaptive
            # Gate start-state resolution (round-4 on-rig A/B): with
            # the gate ON at t=0 and unconfirmed, the engine runs
            # probe-sized spec bursts until the EMAs converge — on a
            # dispatch-floor-heavy rig that convergence phase alone
            # cost ~10x on random traffic. Resolved at first run():
            # start OFF when one dispatch round trip exceeds ~5 ms
            # (probes then re-arm drafting when traffic pays).
            self._spec_started = False
            # Draft-length (K) adaptation is independent of the on/off
            # gate since round 4 — always-draft mode needs the K ladder
            # too (it is what rescued the random worst case).
            self._k_adaptive = bool(spec_k_adaptive)
            # Probe budget in measured dispatch-cost units: a probe may
            # fire only after the accumulated plain-burst wall since the
            # last spec burst is >= (probe cost / spec_probe_overhead),
            # bounding probing to ~spec_probe_overhead of wall time on
            # ANY rig (the old fixed every-16-bursts cadence was tuned
            # for cheap dispatch).
            self._spec_probe_overhead = float(spec_probe_overhead)
            self._plain_wall_since_probe = 0.0
            self._spec_burst_wall = None  # EMA wall s per SPEC burst
            self._dispatch_floor = None   # measured s per dispatch RT
            self._spec_cost_prior = spec_cost
            self._spec_probe_every = max(1, spec_probe_every)
            self._spec_on = True
            self._spec_confirmed = False  # full-size bursts only after
                                          # the gate has seen eff > 1
            self._spec_tps = None        # EMA accepted tokens/step/seq
            self._spec_t = None          # EMA wall s per spec step
            self._plain_t = None         # EMA wall s per plain step
            self._plain_bursts_since_probe = 0
            # Adaptive draft length (VERDICT r2 item 8): K shrinks when
            # the per-draft acceptance fraction is low (verify cost
            # scales with K but unaccepted drafts emit nothing) and
            # grows back toward spec_draft when most drafts land.
            self._spec_k = spec_draft
            # Bound the unconfirmed-probe phase (advisor r2): with eff
            # stuck inside the hysteresis dead zone the gate previously
            # kept probe-sized bursts FOREVER (a dispatch round trip
            # every <=4 steps). After this many dead-zone probes the
            # gate commits one way.
            self._spec_dead_probes = 0
            # Last host-side n-gram acceptance estimate (probe-free
            # gating, round 5) — surfaced in stats().
            self._spec_est_tps = None
            # Sticky probe decline: the acceptance level a real probe
            # measured as not-paying (None = no block).
            self._spec_est_block = None
            # Serving burst size of the most recent run() loop — the
            # full-size probe's cost model needs it before the first
            # spec burst wall is measured.
            self._last_burst_n = 4
            # (k, n) spec-burst shapes already run once: the first call
            # at a shape carries its compile, so its wall is excluded
            # from the cost EMAs (see step_spec_burst).
            self._spec_seen_shapes = set()
            if spec_adaptive in (True, "auto"):
                # Measure the dispatch floor HERE, at construction —
                # never inside run() (round-5 fix: each device_put
                # probe costs 0.3-3 s through the dev tunnel's relay
                # upload path, and the first run() paid ~10 s for it
                # inside the serving loop). Process-cached, so one
                # engine per process pays it once.
                self._measure_dispatch_floor()
            # Stale-_plain_t guard (advisor r2): after this many
            # consecutive spec bursts a plain burst is interleaved so
            # the cost ratio's denominator re-measures at the current
            # occupancy.
            self._spec_only_bursts = 0

    # -- request lifecycle --------------------------------------------------

    def _samp_args(self):
        """Per-slot sampling parameter arrays for the decode program
        (None unless the engine's sampler is per-request)."""
        if not self._per_request:
            return None
        return (jnp.asarray(self._samp[0]), jnp.asarray(self._samp[1]),
                jnp.asarray(self._samp[2]))

    def submit(self, prompt_ids, max_new_tokens=128, stop_ids=(),
               sampling: Optional[SamplingParams] = None) -> Request:
        req = Request(list(map(int, prompt_ids)), max_new_tokens,
                      tuple(stop_ids), sampling=sampling)
        if len(req.prompt_ids) >= self.capacity:
            raise ValueError(f"prompt length {len(req.prompt_ids)} exceeds "
                             f"cache capacity")
        # The prompt (or its suffix after a prefix-cache hit) must fit a
        # prefill bucket — admission would otherwise overflow the padded
        # prefill program (and crash whichever thread runs _admit).
        hit = self._match_prefix(req.prompt_ids) if self._prefixes else None
        effective = (len(req.prompt_ids) - len(hit[0]) if hit
                     else len(req.prompt_ids))
        if effective > max(self.prefill_buckets):
            raise ValueError(
                f"prompt length {len(req.prompt_ids)} exceeds the largest "
                f"prefill bucket ({max(self.prefill_buckets)}); raise "
                f"prefill_buckets or register a covering prefix")
        req.request_id = self._next_id
        self._next_id += 1
        self.counters["submitted"] += 1
        req.metrics.start()
        if self._sched is not None:
            handle = self._sched.submit(len(req.prompt_ids),
                                        req.max_new_tokens, req.stop_ids)
            self._handle_req[handle] = req
            req._native_handle = handle
        else:
            self.queue.append(req)
        return req

    def _admit(self):
        """Fill free slots from the queue: batched prefill per prompt-
        length bucket (one compiled program admits the whole group — the
        p50-TTFT lever), then scatter each sequence into its slot.

        Admission runs on the decode driver thread, so its prefill wall
        time STALLS every active decode slot; when any slot is live the
        stall is recorded for the p99 in :meth:`stats` (the knob if it
        dominates is smaller admission groups / chunked prefill)."""
        had_active = any(r is not None for r in self.slot_request)
        t0 = time.perf_counter()
        try:
            return self._admit_inner()
        finally:
            dt = time.perf_counter() - t0
            if had_active and dt > 1e-4:
                self._admit_stalls.append(dt)

    def _host_flush(self):
        """Flush a partially filled tail window (static-t jit per fill
        value — at most ``_tail_flush`` distinct cheap compiles). Must
        run before anything that reads or rewrites the packed cache
        outside the flat decode kernel: admission inserts, speculative
        verify, snapshots."""
        if self._tail_flush and self._tail_fill:
            self.cache = self._flush_tail(self.cache, self._tail_fill)
            self._tail_fill = 0

    def _admit_inner(self):
        self._host_flush()
        if self._sched is not None:
            handles, slots = self._sched.admit()
            if len(handles) == 0:
                return
            pairs = [(self._handle_req[int(h)], int(s))
                     for h, s in zip(handles, slots)]
        else:
            free = [s for s in range(self.max_batch)
                    if self.slot_request[s] is None]
            if not free or not self.queue:
                return
            batch_reqs = self.queue[:len(free)]
            del self.queue[:len(batch_reqs)]
            pairs = list(zip(batch_reqs, free))
        if self._prefixes:
            rest = []
            for req, slot in pairs:
                hit = self._match_prefix(req.prompt_ids)
                if hit is None:
                    rest.append((req, slot))
                    continue
                ptoks, frag = hit
                suffix = req.prompt_ids[len(ptoks):]
                sbucket = _bucket(len(suffix), self.prefill_buckets)
                if len(ptoks) + sbucket >= self.capacity:
                    rest.append((req, slot))   # no room for the chunk
                    continue
                gpad = max(1, self._admit_multiple)
                tok = np.zeros((gpad, sbucket), np.int32)
                tok[0, :len(suffix)] = suffix
                slens = np.ones(gpad, np.int32)
                slens[0] = len(suffix)
                last_logits, filled = self._suffix_prefill(
                    self.params, jnp.asarray(tok), frag,
                    jnp.asarray(len(ptoks), jnp.int32),
                    jnp.asarray(slens))
                self.counters["prefix_hits"] += 1
                self._finish_admission(
                    [(req, slot)], np.asarray([len(req.prompt_ids)]),
                    last_logits, filled)
            pairs = rest
            if not pairs:
                return
        by_bucket: dict = {}
        for req, slot in pairs:
            n = len(req.prompt_ids)
            by_bucket.setdefault(_bucket(n, self.prefill_buckets),
                                 []).append((req, slot))
        for bucket, group_pairs in by_bucket.items():
            group = len(group_pairs)
            # Pad the admission group to a power of two (times the mesh
            # batch-axis size): the prefill program compiles per
            # (bucket, group) signature, and arbitrary arrival patterns
            # would otherwise compile one program per distinct group
            # size (a compile storm through a minutes-per-compile
            # link). Dummy rows prefill one pad token and are never
            # scattered into a slot.
            gpad = self._admit_multiple
            while gpad < group:
                gpad *= 2
            tokens = np.zeros((gpad, bucket), np.int32)
            lengths = np.ones(gpad, np.int32)
            for gi, (req, _) in enumerate(group_pairs):
                tokens[gi, :len(req.prompt_ids)] = req.prompt_ids
                lengths[gi] = len(req.prompt_ids)
            if self.paged:
                # Map pages covering the whole prefill bucket (insert
                # copies ceil(bucket/page) pages) plus the first decode
                # token's page.
                pages = -(-bucket // self.page_size)
                for req, slot in group_pairs:
                    # Clamp to capacity: bucket == capacity would ask
                    # for one page past the table (the +1 decode-token
                    # page); appends past capacity clamp like the
                    # contiguous cache's.
                    self.cache = self.allocator.ensure_capacity(
                        self.cache, slot,
                        min(pages * self.page_size + 1, self.capacity),
                        length=0)
            last_logits, prefilled = self._prefill(
                self.params, jnp.asarray(tokens), jnp.asarray(lengths),
                min(bucket, self.capacity))
            self._finish_admission(group_pairs, lengths, last_logits,
                                   prefilled)

    def _finish_admission(self, group_pairs, lengths, last_logits,
                          prefilled):
        """Sample each admitted request's first token and scatter its
        prefilled KV entry into its slot. ``lengths``: total prompt
        length per group row (cache depth after insert)."""
        self._key, sub = jax.random.split(self._key)
        if self._per_request:
            sps = [req.sampling or SamplingParams.GREEDY
                   for req, _ in group_pairs]
            # Pad the per-row knobs to the logits rows: admission groups
            # are power-of-two / mesh-multiple padded, so last_logits can
            # have more rows than group_pairs (pad rows sample greedily
            # and are discarded below).
            rows = int(last_logits.shape[0])
            gt = np.zeros(rows, np.float32)
            gk = np.zeros(rows, np.float32)
            gp = np.ones(rows, np.float32)
            gt[:len(sps)] = [sp.temperature for sp in sps]
            gk[:len(sps)] = [sp.top_k for sp in sps]
            gp[:len(sps)] = [sp.top_p for sp in sps]
            firsts = np.asarray(self._first_sample(
                sub, last_logits, gt, gk, gp))
            for (req, slot), sp in zip(group_pairs, sps):
                self._samp[:, slot] = (sp.temperature, sp.top_k,
                                       sp.top_p)
        else:
            firsts = np.asarray(self.sampler.sample(sub, last_logits))
        first_lps = None
        if self.logprobs:
            fl = jnp.asarray(np.asarray(firsts).reshape(-1))
            first_lps = np.asarray(
                jax.nn.log_softmax(last_logits, axis=-1)[
                    jnp.arange(fl.shape[0]), fl])
        # ONE device program per admission group for each of: the cache
        # scatter, the device-token scatter, and the spec-history write.
        # Anything per-request here is a dispatch-link round trip, and a
        # 256-request group turns that into seconds of TTFT.
        g_n = len(group_pairs)
        firsts_flat = np.asarray(firsts).reshape(-1)
        slots_np = np.asarray([slot for _, slot in group_pairs], np.int32)
        self.cache = self._insert_group(
            self.cache, prefilled, jnp.asarray(slots_np),
            jnp.asarray(np.asarray(lengths[:g_n], np.int32)))
        if self._device_tokens is not None:
            self._device_tokens = self._device_tokens.at[
                jnp.asarray(slots_np)].set(
                    jnp.asarray(firsts_flat[:g_n].astype(np.int32)))
        if self.spec_draft:
            rows = np.zeros((g_n, self.capacity), np.int32)
            for gi, (req, _) in enumerate(group_pairs):
                rows[gi, :len(req.prompt_ids)] = req.prompt_ids
                rows[gi, len(req.prompt_ids)] = int(firsts_flat[gi])
            self._spec_history = self._hist_set_group(
                self._spec_history, jnp.asarray(rows),
                jnp.asarray(slots_np))
            # New traffic may accept differently: probe at the next
            # opportunity if drafting is gated off, and lift the
            # sticky estimate block (the declined level belonged to
            # the previous mix).
            self._plain_bursts_since_probe = self._spec_probe_every
            self._spec_est_block = None
        for gi, (req, slot) in enumerate(group_pairs):
            first = int(firsts_flat[gi])
            req.tokens.append(first)
            if first_lps is not None:
                req.logprobs.append(float(first_lps[gi]))
            req.metrics.step()
            self.current_tokens[slot] = first
            self._host_lengths[slot] = int(lengths[gi])
            self.slot_request[slot] = req
            if self._sched is not None:
                if self._sched.commit_first(slot, first):
                    req.done = True
                    self._free_slot(slot)
            else:
                self._finish_if_done(slot, first,
                                     length=int(lengths[gi]))

    def register_prefix(self, tokens) -> int:
        """Precompute and pin the KV of a shared prompt prefix (e.g. a
        system prompt). Submissions whose prompt strictly extends it skip
        prefilling those tokens — admission runs ONE chunked forward over
        just the suffix (counted in ``stats()['prefix_hits']``). Returns
        the prefix length. Fragment memory: one full-capacity cache row
        per registered prefix (``_admit_multiple`` rows under a mesh —
        the fragment batch pads to the mesh batch-axis size exactly like
        admission groups; only row 0 is real)."""
        assert not self.paged, "prefix cache is unpaged for now"
        toks = tuple(int(t) for t in tokens)
        if not toks or len(toks) >= self.capacity:
            raise ValueError("prefix must be non-empty and below capacity")
        bucket = _bucket(len(toks), self.prefill_buckets)
        gpad = max(1, self._admit_multiple)
        arr = np.zeros((gpad, bucket), np.int32)
        arr[0, :len(toks)] = toks
        lens = np.ones(gpad, np.int32)
        lens[0] = len(toks)
        _, frag = self._prefill(self.params, jnp.asarray(arr),
                                jnp.asarray(lens), self.capacity)
        self._prefixes.append((toks, frag))
        self._prefixes.sort(key=lambda kv: -len(kv[0]))
        return len(toks)

    def _match_prefix(self, prompt):
        """Longest registered prefix that the prompt STRICTLY extends
        (at least one suffix token must remain to prefill)."""
        for toks, frag in self._prefixes:
            if len(toks) < len(prompt) \
                    and tuple(prompt[:len(toks)]) == toks:
                return toks, frag
        return None

    def cancel(self, req) -> bool:
        """Abort a request: drop it from the queue if waiting, free its
        slot if decoding (the slot is re-admitted next step; its stale
        burst column is rejected by the snapshot identity check)."""
        if req.done:
            return False
        req.done = True
        self.counters["cancelled"] += 1
        if self._sched is not None and getattr(req, "_native_handle", None) is not None:
            self._sched.cancel(req._native_handle)
        elif req in self.queue:
            self.queue.remove(req)
        for slot, r in enumerate(self.slot_request):
            if r is req:
                self.slot_request[slot] = None
                if self.paged:
                    self.cache = self.allocator.release_slot(self.cache,
                                                             slot)
                break
        return True

    def _free_slot(self, slot):
        """Mark a finished request's slot reusable (and return its KV
        pages to the pool in paged mode). Harvests the request's latency
        samples into the engine-level percentile reservoirs."""
        req = self.slot_request[slot]
        if req is not None:
            if req.metrics.ttft_s is not None:
                self._ttfts.append(req.metrics.ttft_s)
            self._itls.extend(req.metrics.step_times[1:])
        self.counters["completed"] += 1
        self.slot_request[slot] = None
        if self.paged:
            self.cache = self.allocator.release_slot(self.cache, slot)

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
            self._free_slot(slot)

    def _commit_tokens(self, toks_np, lengths_np, snapshot,
                       lps_np=None) -> int:
        """Deliver a [n, B] burst of sampled tokens to the requests that
        were active AT DISPATCH TIME (``snapshot``: (slot, Request)
        pairs), honoring stop conditions. Under pipelined serving a slot
        may have been freed and re-admitted between dispatch and landing;
        such stale columns are dropped (identity check / C++ handle
        check). The native scheduler scans the matrix in C++; the Python
        fallback loops per token."""
        emitted = 0
        if self._sched is not None:
            expected = np.full(self.max_batch, -1, np.int64)
            for slot, req in snapshot:
                expected[slot] = req._native_handle
            accepted, done, _ = self._sched.commit_burst(
                toks_np, lengths_np, expected)
            for slot, req in snapshot:
                n_acc = int(accepted[slot])
                if self.slot_request[slot] is not req or n_acc == 0:
                    continue
                req.tokens.extend(int(t) for t in toks_np[:n_acc, slot])
                if lps_np is not None:
                    req.logprobs.extend(
                        float(v) for v in lps_np[:n_acc, slot])
                req.metrics.step_n(n_acc)
                emitted += n_acc
                self.current_tokens[slot] = req.tokens[-1]
                if done[slot]:
                    req.done = True
                    self._free_slot(slot)
            return emitted
        n = toks_np.shape[0]
        for slot, req in snapshot:
            if self.slot_request[slot] is not req:
                continue
            for i in range(n):
                token = int(toks_np[i, slot])
                req.tokens.append(token)
                if lps_np is not None:
                    req.logprobs.append(float(lps_np[i, slot]))
                req.metrics.step()
                emitted += 1
                self.current_tokens[slot] = token
                self._finish_if_done(slot, token,
                                     length=int(lengths_np[slot]) + i + 1)
                if self.slot_request[slot] is None:
                    break
        return emitted

    def step(self) -> int:
        """One engine iteration: admit queued requests, run one decode
        step for every active slot. Returns number of active slots."""
        self._admit()
        active = [s for s in range(self.max_batch)
                  if self.slot_request[s] is not None]
        if not active:
            return 0
        lengths_np = self._host_lengths.copy()
        if self.paged:
            for slot in active:
                self.cache = self.allocator.ensure_capacity(
                    self.cache, slot, 2, length=int(lengths_np[slot]))
        self._key, sub = jax.random.split(self._key)
        next_tokens, lps, self.cache = self._decode(
            self.params, jnp.asarray(self.current_tokens), self.cache, sub,
            self._samp_args())
        self._host_lengths += 1
        if self._tail_flush:
            self._tail_fill += 1
            if self._tail_fill >= self._tail_flush:
                self._host_flush()
        self._device_tokens = None
        next_np = np.asarray(next_tokens)
        lps_np = np.asarray(lps)[None, :] if self.logprobs else None
        emitted = self._commit_tokens(
            next_np[None, :], lengths_np,
            [(s, self.slot_request[s]) for s in active], lps_np)
        self._count(emitted, 1)
        return len(active)

    def _dispatch_burst(self, n):
        """Dispatch ``n`` decode steps WITHOUT waiting for the result
        (jax dispatch is async; tokens chain on device). Returns the
        in-flight handle (tokens future, the slot→request snapshot, the
        pre-burst lengths, n) or None if no slot is active."""
        active = [s for s in range(self.max_batch)
                  if self.slot_request[s] is not None]
        if not active:
            return None
        lengths_np = self._host_lengths.copy()
        headroom = self.capacity - 1 - max(int(lengths_np[s]) for s in active)
        n = min(n, max(1, headroom))
        if self.paged:
            for slot in active:
                self.cache = self.allocator.ensure_capacity(
                    self.cache, slot, n + 1, length=int(lengths_np[slot]))
        if self._tail_flush and self._tail_fill:
            # The in-burst flush points assume an empty window at burst
            # start.
            self._host_flush()
        if self._device_tokens is None:
            self._device_tokens = jnp.asarray(self.current_tokens)
        self._key, sub = jax.random.split(self._key)
        if self.spec_draft:
            # Fused burst + spec-history update: the history must stay
            # current through gated-off stretches (a later probe drafts
            # from it), and a separate dispatch would cost one
            # dispatch-link round trip per burst.
            toks, lps, self.cache, self._spec_history = \
                self._decode_burst_hist(
                    self.params, self._device_tokens, self.cache, sub,
                    self._samp_args(), self._spec_history,
                    jnp.asarray(lengths_np), n)
        else:
            toks, lps, self.cache = self._decode_burst(
                self.params, self._device_tokens, self.cache, sub,
                self._samp_args(), n)
        self._device_tokens = toks[-1]
        self._host_lengths += n     # the device advances every slot
        if self._tail_flush:
            self._tail_fill = n % self._tail_flush
        snapshot = [(s, self.slot_request[s]) for s in active]
        return (toks, lps, snapshot, lengths_np, n)

    def _land_burst(self, inflight) -> int:
        """Wait for an in-flight burst's tokens (the only host sync) and
        run the bookkeeping against the dispatch-time snapshot."""
        toks, lps, snapshot, lengths_np, n = inflight
        toks_np = np.asarray(toks)          # [n, B]
        lps_np = np.asarray(lps) if self.logprobs else None
        emitted = self._commit_tokens(toks_np, lengths_np, snapshot,
                                      lps_np)
        self._count(emitted, n)
        return emitted

    def _count(self, emitted, steps):
        c = self.counters
        c["tokens"] += emitted
        c["decode_steps"] += steps
        c["bursts"] += 1
        if self._log_every and c["bursts"] % self._log_every == 0:
            import json
            import sys
            print(json.dumps({"engine_stats": self.stats()}),
                  file=sys.stderr, flush=True)

    @staticmethod
    def _pctl(samples, q):
        if not samples:
            return None
        s = sorted(samples)
        return s[min(len(s) - 1, int(q * len(s)))]

    def stats(self) -> dict:
        """Serving counters snapshot: queue depth, batch occupancy,
        cumulative tokens/s, plus TTFT / inter-token-latency /
        admission-stall percentiles (SURVEY §5 observability)."""
        active = sum(r is not None for r in self.slot_request)
        queued = (self._sched.queued() if self._sched is not None
                  else len(self.queue))
        uptime = time.perf_counter() - self._t_start
        out = {**self.counters, "active": active, "queued": queued,
               "occupancy": active / self.max_batch,
               "uptime_s": round(uptime, 3),
               "tokens_per_s": round(self.counters["tokens"]
                                     / max(uptime, 1e-9), 1)}
        for name, res in (("ttft", self._ttfts), ("itl", self._itls),
                          ("admit_stall", self._admit_stalls)):
            for q, label in ((0.5, "p50"), (0.99, "p99")):
                v = self._pctl(res, q)
                if v is not None:
                    out[f"{name}_{label}_ms"] = round(1000 * v, 2)
        if self._admit_stalls:
            out["admit_stall_max_ms"] = round(
                1000 * max(self._admit_stalls), 2)
        if self.spec_draft:
            out["spec_on"] = self._spec_on
            out["spec_adaptive"] = self.spec_adaptive
            out["spec_k"] = self._spec_k
            if self._spec_est_tps is not None:
                out["spec_est_tps"] = round(self._spec_est_tps, 3)
            if self._spec_tps is not None:
                out["spec_tokens_per_step"] = round(self._spec_tps, 2)
            if self._dispatch_floor is not None:
                out["dispatch_floor_ms"] = round(
                    1000 * self._dispatch_floor, 3)
        return out

    def _commit_spec(self, toks_np, counts_np, lengths_np, snapshot) -> int:
        """Deliver a speculative burst: ``toks_np`` [n, B, k+1] greedy
        outputs, ``counts_np`` [n, B] accepted counts (incl. the bonus
        token). Each step's committed tokens are the first ``counts``
        entries of its row."""
        emitted = 0
        n_steps = toks_np.shape[0]
        for slot, req in snapshot:
            if self.slot_request[slot] is not req:
                continue
            base = int(lengths_np[slot])
            off = 0
            for i in range(n_steps):
                c = int(counts_np[i, slot])
                for j in range(c):
                    token = int(toks_np[i, slot, j])
                    req.tokens.append(token)
                    req.metrics.step()
                    emitted += 1
                    self.current_tokens[slot] = token
                    self._finish_if_done(slot, token,
                                         length=base + off + j + 1)
                    if self.slot_request[slot] is None:
                        break
                off += c
                if self.slot_request[slot] is None:
                    break
        return emitted

    def step_spec_burst(self, n: int) -> int:
        """Run ``n`` speculative decode steps on device (each step emits
        1..spec_draft+1 tokens per sequence). Returns tokens emitted."""
        self._admit()
        active = [s for s in range(self.max_batch)
                  if self.slot_request[s] is not None]
        if not active:
            return 0
        lengths_np = self._host_lengths.copy()
        k = self._spec_k if self._k_adaptive else self.spec_draft
        k1 = k + 1
        # Worst case every step accepts everything: keep k1*n inside the
        # cache (the chunk append clamps, but tokens past capacity would
        # be garbage).
        headroom = self.capacity - 1 - max(int(lengths_np[s])
                                           for s in active)
        n = min(n, max(1, headroom // k1))
        t0 = time.perf_counter()
        self._spec_history, self.cache, toks, counts, last_dev = \
            self._spec_burst_for(k)(
                self.params, self._spec_history, self.cache, n)
        self._spec_only_bursts += 1
        # Chain the next (plain or spec) burst on the device-resident
        # last tokens — a None here forced a host re-upload at every
        # spec->plain transition (~0.3-3 s each through the tunnel).
        self._device_tokens = last_dev
        counts_np = np.asarray(counts)
        toks_np = np.asarray(toks)
        wall = time.perf_counter() - t0
        dt = wall / n
        # The FIRST burst at a given (k, n) shape compiles its program
        # — through a remote-compile link that wall is minutes, and one
        # poisoned sample wedged the cost EMA at ~58x plain (round-5
        # CPU repro), permanently gating speculation OFF on traffic
        # whose measured acceptance was 3.7 tokens/step. Use the
        # burst's TOKENS (acceptance is timing-free) but discard its
        # wall from the cost EMAs.
        cold = (k, n) not in self._spec_seen_shapes
        self._spec_seen_shapes.add((k, n))
        self.counters["spec_bursts"] = (
            self.counters.get("spec_bursts", 0) + 1)
        self.counters["spec_steps"] = (
            self.counters.get("spec_steps", 0) + n)
        self.counters["spec_wall_s"] = round(
            self.counters.get("spec_wall_s", 0.0) + wall, 4)
        if not cold:
            self._spec_t = dt if self._spec_t is None \
                else 0.6 * self._spec_t + 0.4 * dt
            # Any spec burst re-measures acceptance — reset the probe
            # wall budget; its own wall is what a future probe costs.
            self._spec_burst_wall = wall \
                if self._spec_burst_wall is None \
                else 0.6 * self._spec_burst_wall + 0.4 * wall
        self._plain_wall_since_probe = 0.0
        self._host_lengths += counts_np.sum(axis=0)
        emitted = self._commit_spec(
            toks_np, counts_np, lengths_np,
            [(s, self.slot_request[s]) for s in active])
        # Acceptance EMA from LIVE emissions only — counts for finished
        # slots keep accepting their own stale drafts and would inflate
        # the gate's tokens/step estimate.
        tps = emitted / (n * len(active))
        self._spec_tps = tps if self._spec_tps is None \
            else 0.6 * self._spec_tps + 0.4 * tps
        self._adapt_k()
        self._count(emitted, n)
        return emitted

    def step_burst(self, n: int) -> int:
        """Run ``n`` decode steps on-device for the current batch, then do
        host-side bookkeeping once. Stop tokens are honored post hoc (a
        request keeps its tokens up to the stop). Returns tokens emitted
        to live requests."""
        self._admit()
        t0 = time.perf_counter()
        inflight = self._dispatch_burst(n)
        if inflight is None:
            return 0
        emitted = self._land_burst(inflight)
        if self.spec_draft:
            wall = time.perf_counter() - t0
            dt = wall / inflight[4]
            self._plain_t = dt if self._plain_t is None \
                else 0.6 * self._plain_t + 0.4 * dt
            self._plain_wall_since_probe += wall
            self._spec_only_bursts = 0
        return emitted

    def _measure_dispatch_floor(self):
        """Measured fixed cost of one dispatch round trip: a device_put +
        value fetch of a tiny array (no compile — through a remote
        dispatch link this is the same fixed latency every dispatched
        program pays; ~31 ms on the dev tunnel, sub-ms on local
        runtimes). min of 3 so host jitter doesn't inflate it."""
        if self._dispatch_floor is None:
            # Process-wide cache: the floor is a property of the
            # device link, not of this engine — re-measuring per
            # engine cost ~3 round trips (~100 ms on the tunnel),
            # visible on short-lived engines (round-5 profile_spec:
            # a 0.5 s run read 0.84x plain from this alone).
            global _DISPATCH_FLOOR
            if _DISPATCH_FLOOR is None:
                samples = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    np.asarray(jax.device_put(np.zeros(64, np.float32)))
                    samples.append(time.perf_counter() - t0)
                _DISPATCH_FLOOR = min(samples)
            self._dispatch_floor = _DISPATCH_FLOOR
        return self._dispatch_floor

    def _resolve_spec_auto(self, burst_n):
        """Resolve ``spec_adaptive="auto"``: the GATE, with its start
        state picked from the measured dispatch floor
        (:meth:`_resolve_spec_start`). With the floor-aware OFF start
        and wall-budgeted probes (round 4) the gate's worst case is
        bounded on any rig (~2% probe overhead), while always-draft
        loses ~2x on unacceptable traffic whenever dispatch is cheap
        enough for compute to show — so the gate is the resolution and
        ``spec_adaptive=False`` stays the explicit choice for traffic
        the operator KNOWS drafts well (v5e A/B, BASELINE.md round 4).
        ``burst_n`` kept for telemetry/compat."""
        del burst_n
        self.spec_adaptive = True

    def _resolve_spec_start(self):
        """Gate start state (round-4 on-rig A/B): starting ON while
        unconfirmed runs probe-sized spec bursts until the EMAs
        converge — on a dispatch-floor-heavy rig that phase alone cost
        ~10x on random traffic. When one dispatch round trip exceeds
        ~5 ms, start OFF and let the wall-budgeted probes re-arm
        drafting when traffic pays."""
        if self._spec_started or self.spec_adaptive is not True:
            return
        self._spec_started = True
        # The floor was measured at CONSTRUCTION (never here — the
        # round-5 cProfile showed the in-run measurement costing
        # ~10 s through the tunnel's relay-upload path: 0.3-3 s per
        # device_put probe, which is NOT the ~31 ms dispatch floor a
        # compiled program pays). Unknown floor starts OFF — the
        # probe-free estimator re-arms drafting cheaply on any rig.
        floor = self._dispatch_floor
        if floor is None:
            floor = _DISPATCH_FLOOR
        if floor is None or floor > 0.005:
            self._spec_on = False
            self._plain_bursts_since_probe = self._spec_probe_every

    def _estimate_spec_tps(self, max_slots=8, sample=24):
        """Probe-free acceptance estimate (round-5 verdict item 8):
        replay the n-gram draft rule (speculative.ngram_draft
        semantics) on tokens ALREADY emitted, host-side — ZERO device
        dispatches — and score the accepted prefix against what the
        model actually produced. On a rig where every probe costs a
        burst-equivalent (~31 ms dispatch floor on the dev tunnel),
        this decides whether a real probe is worth arming at all.
        Returns estimated emitted tokens/step (accepted + bonus), or
        None when no slot has enough history."""
        from numpy.lib.stride_tricks import sliding_window_view
        n = self.spec_ngram
        k = max(self._spec_k, 1)
        vals = []
        live = [r for r in self.slot_request if r is not None]
        for req in live[:max_slots]:
            s = np.asarray(req.prompt_ids + req.tokens, dtype=np.int64)
            length = s.size
            lo = max(n + 1, length - k - sample)
            if length < n + k + 1 or lo >= length - k:
                continue
            grams = sliding_window_view(s, n)        # [L-n+1, n]
            acc_sum = cnt = 0
            for p in range(lo, length - k):
                # Draft for a hypothetical history of length p: find
                # the LAST j < p - n whose n-gram matches the trailing
                # one, copy the k tokens that followed (clipped to the
                # history, exactly like ngram_draft); no match drafts
                # the last token repeated.
                idx = np.flatnonzero(
                    (grams[:p - n] == grams[p - n]).all(axis=1))
                if idx.size:
                    di = np.minimum(idx[-1] + n + np.arange(k), p - 1)
                    draft = s[di]
                else:
                    draft = np.full(k, s[p - 1])
                acc_sum += int(np.cumprod(draft == s[p:p + k]).sum()) + 1
                cnt += 1
            if cnt:
                vals.append(acc_sum / cnt)
        est = float(np.mean(vals)) if vals else None
        self._spec_est_tps = est
        return est

    def _estimate_says_go(self):
        """Arm a real probe only when the host-side estimate clears
        ~90% of the gate's break-even (slightly below the 1.05 ON
        threshold so borderline traffic still gets measured on
        device). An unavailable estimate (not enough history) lets the
        probe through — the old behavior."""
        est = self._estimate_spec_tps()
        if est is None:
            return True
        # Sticky decline (round-5): when a real probe already measured
        # the gate OFF at some acceptance level, the estimator must
        # read MATERIALLY higher traffic before paying for another
        # probe — steady dead-zone traffic (est ~ measured acc ~ the
        # cost ratio) otherwise re-armed a probe every cadence, each
        # costing burst-equivalents on a dispatch-floor rig.
        if self._spec_est_block is not None:
            return est >= 1.15 * self._spec_est_block
        if self._spec_t is not None and self._plain_t is not None \
                and self._plain_t > 0:
            cost = self._spec_t / self._plain_t
        else:
            cost = self._spec_cost_prior
        return est / max(cost, 1e-6) >= 0.9

    def _probe_affordable(self):
        """Probe budget in measured dispatch-cost units: a probe may fire
        once its estimated cost is <= ``spec_probe_overhead`` of the
        plain wall time accumulated since the last spec burst."""
        cost = self._spec_burst_wall
        if cost is None:
            # Probes run FULL-SIZE (round 5), so the unmeasured-cost
            # fallback prices one probe as floor + burst_n spec steps
            # at the cost-prior multiple of a plain step (the old
            # `4 * plain_t` modeled the retired 4-step probe and
            # under-priced by ~burst/4, firing probes far above the
            # spec_probe_overhead budget).
            cost = ((self._dispatch_floor or 0.0)
                    + (self._last_burst_n * self._spec_cost_prior
                       * (self._plain_t or 0.0)))
        if cost <= 0:
            return True
        return (self._plain_wall_since_probe
                >= cost / self._spec_probe_overhead)

    def _adapt_k(self):
        """Draft-length ladder (independent of the on/off gate): the
        acceptance FRACTION (accepted drafts / drafted) prices K
        directly — verify cost grows with K while unaccepted tail
        drafts emit nothing. Shrink fast below 35%, regrow above 70%
        (fractions bracket the break-even of the chunk-verify cost
        model)."""
        if not (self._k_adaptive and self.spec_draft > 1) \
                or self._spec_tps is None:
            return
        frac = (self._spec_tps - 1.0) / max(self._spec_k, 1)
        if frac < 0.35 and self._spec_k > 1:
            self._spec_k -= 1
        elif frac > 0.70 and self._spec_k < self.spec_draft:
            self._spec_k += 1

    def _spec_gate(self):
        """Flip speculation on/off from the measured efficiency: a spec
        step costs ``cost`` plain steps (measured wall-time ratio, or
        the static prior before both are known) and emits ``tps``
        tokens; drafting pays iff tps/cost > 1 (with hysteresis)."""
        if not (self.spec_draft and self.spec_adaptive is True) \
                or self._spec_tps is None:
            return
        if self._spec_t is not None and self._plain_t is not None \
                and self._plain_t > 0:
            cost = self._spec_t / self._plain_t
        else:
            cost = self._spec_cost_prior
        eff = self._spec_tps / max(cost, 1e-6)
        if self._spec_on and eff < 0.95:
            self._spec_on = False
            self._spec_confirmed = False
        elif not self._spec_on and eff > 1.05:
            self._spec_on = True
        if eff > 1.05:
            self._spec_confirmed = True
            self._spec_dead_probes = 0
            self._spec_est_block = None
        elif eff < 0.95:
            self._spec_dead_probes = 0
            # Probe measured NOT-paying: block further probes until
            # the host-side estimate rises above this traffic level
            # (see _estimate_says_go; admissions reset the block).
            # Prefer the JUST-MEASURED acceptance over the host
            # estimate: after a long ON stretch _spec_est_tps is stale
            # (the estimator only runs at probe decisions), and a
            # stale-high level would block re-arming forever.
            self._spec_est_block = (self._spec_tps
                                    or self._spec_est_tps)
        elif not self._spec_confirmed:
            # Hysteresis dead zone while unconfirmed: probe-sized
            # bursts pay a dispatch round trip per <=4 steps, so this
            # phase must be bounded (advisor r2). After 4 inconclusive
            # probes, commit: eff ~ 1 means drafting neither pays nor
            # costs in tokens, but probe overhead is pure loss — gate
            # off until traffic shifts (admissions re-arm probing).
            self._spec_dead_probes += 1
            if self._spec_dead_probes >= 4:
                self._spec_on = False
                self._spec_dead_probes = 0
                self._spec_est_block = (self._spec_tps
                                        or self._spec_est_tps)
        self._plain_bursts_since_probe = 0

    def _pending(self) -> bool:
        if self._sched is not None:
            return bool(self._sched.queued() or self._sched.active())
        return bool(self.queue
                    or any(r is not None for r in self.slot_request))

    def run(self, requests=None, max_steps=100000, burst=1,
            pipeline=False):
        """Drive the engine until every request completes. ``burst`` > 1
        decodes that many tokens per device dispatch.

        ``pipeline=True`` dispatches burst k+1 (tokens chained on
        device) before burst k's results are fetched, so host
        bookkeeping and the dispatch-link round trip overlap device
        compute; admission lags one burst and a request finishing
        mid-burst wastes at most one burst of device steps — the
        standard async-serving trade. Off by default: it presumes true
        async dispatch (standard jax runtimes); the remote-execution
        tunnel used in development serializes dispatches whose inputs
        are not yet ready and measured 12× SLOWER pipelined (it appears
        to materialize the in-flight cache). Paged mode is always
        un-pipelined (an in-flight burst could append into pages the
        landing just released)."""
        if requests and self._sched is None:
            for req in requests:
                if req not in self.queue and not req.done:
                    self.queue.append(req)
        steps = 0
        if self.spec_draft:
            while self._pending() and steps < max_steps:
                if self.spec_adaptive == "auto":
                    # Resolution needs one landed plain burst (for
                    # _plain_t); until then serve plainly — on the rigs
                    # where auto matters (huge dispatch floor) plain
                    # bursts are also the safe interim.
                    if self._plain_t is None:
                        self.step_burst(max(burst, 1))
                        steps += 1
                        continue
                    self._resolve_spec_auto(max(burst, 1))
                self._resolve_spec_start()
                self._last_burst_n = max(burst, 1)
                probe = (self.spec_adaptive is True and not self._spec_on
                         and self._plain_bursts_since_probe
                         >= self._spec_probe_every
                         and self._probe_affordable())
                if probe and not self._estimate_says_go():
                    # Host-side estimate says drafting would not pay:
                    # skip the (burst-equivalent-priced) probe and
                    # restart the cadence — the estimate re-reads the
                    # live streams next time, so a traffic shift still
                    # re-arms probing with zero wasted dispatches.
                    probe = False
                    self._plain_bursts_since_probe = 0
                    self._plain_wall_since_probe = 0.0
                if (self.spec_adaptive is True and self._spec_on
                        and self._spec_only_bursts >= 32):
                    # Long spec-only stretch: _plain_t may be stale
                    # (measured at a different occupancy — advisor r2).
                    # One plain burst re-measures the cost ratio's
                    # denominator; tokens it emits are ordinary output.
                    self.step_burst(max(burst, 1))
                    steps += 1
                    continue
                if self._spec_on or self.spec_adaptive is False or probe:
                    # Probes run FULL-SIZE since round 5: the host-side
                    # estimator already pre-filters unpromising traffic
                    # (zero dispatches), and a 4-step probe's wall is
                    # dispatch-floor-dominated — its cost-per-step read
                    # ~2.6x the full burst's, systematically
                    # under-valuing speculation (on-rig: the n=4 probe
                    # gated OFF traffic at acceptance 3.88 that
                    # full-burst speculation serves at 1.59x plain).
                    self.step_spec_burst(max(burst, 1))
                    self._spec_gate()
                else:
                    self.step_burst(max(burst, 1))
                    self._plain_bursts_since_probe += 1
                steps += 1
            return steps
        if burst <= 1 or self.paged or not pipeline:
            while self._pending() and steps < max_steps:
                if burst > 1:
                    self.step_burst(burst)
                else:
                    self.step()
                steps += 1
            return steps

        inflight = None
        while steps < max_steps:
            self._admit()
            nxt = self._dispatch_burst(burst)
            if nxt is not None:
                steps += 1
            if inflight is not None:
                self._land_burst(inflight)
            inflight = nxt
            if nxt is None and inflight is None and not self._pending():
                break
        if inflight is not None:
            self._land_burst(inflight)
        # A request admitted by the very last landing may still be
        # pending; drain synchronously.
        while self._pending() and steps < max_steps:
            self.step_burst(burst)
            steps += 1
        return steps

    # -- batch convenience ---------------------------------------------------

    def generate(self, prompts, max_new_tokens=32, stop_ids=(), burst=1):
        """Synchronous batch API: returns a list of generated-token lists."""
        reqs = [self.submit(p, max_new_tokens, stop_ids) for p in prompts]
        self.run(burst=burst)
        return [r.tokens for r in reqs]
