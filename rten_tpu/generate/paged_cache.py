"""Block-paged KV cache (vLLM-style).

The slot-contiguous :class:`~rten_tpu.generate.kv_cache.KVCache` wastes
capacity when sequence lengths vary: every slot reserves ``capacity``
tokens. The paged cache allocates fixed-size *pages* from a shared pool
and maps them per sequence through a page table, so HBM holds only the
pages actually used and long/short requests share the pool.

Layout (per layer):
  * ``pool``   — [n_pages, 2, page_size, KVH, D]  (k=0 / v=1 planes)
  * page table — [B, max_pages] int32 page ids (-1 = unallocated)
  * lengths    — [B] tokens written per sequence

Appends write into the tail page via ``dynamic_update_slice`` (donated
under jit — in-place HBM updates). Attention gathers the pages of each
sequence into a contiguous [cap, KVH, D] view and reuses the masked
decode attention; a Pallas gather-attention over the page table directly
is the round-2 upgrade.

Page allocation/free is HOST-side bookkeeping (the scheduler owns it),
mirroring how the engine owns slots; device code only sees the table.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclass
class PagedKVCache:
    pools: list          # per layer [n_pages, 2, page, KVH, D]
    page_table: object   # [B, max_pages] int32
    lengths: object      # [B] int32
    page_size: int

    def tree_flatten(self):
        return ((self.pools, self.page_table, self.lengths),
                (self.page_size,))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], aux[0])

    # -- construction ------------------------------------------------------

    @staticmethod
    def create(n_layers, n_pages, page_size, kv_heads, head_dim, batch,
               max_pages_per_seq, dtype=jnp.float32):
        pools = [jnp.zeros((n_pages, 2, page_size, kv_heads, head_dim),
                           dtype) for _ in range(n_layers)]
        table = jnp.full((batch, max_pages_per_seq), -1, jnp.int32)
        return PagedKVCache(pools, table,
                            jnp.zeros(batch, jnp.int32), page_size)

    @property
    def n_layers(self):
        return len(self.pools)

    @property
    def n_pages(self):
        return self.pools[0].shape[0]

    @property
    def max_pages_per_seq(self):
        return self.page_table.shape[1]

    # -- device ops --------------------------------------------------------

    def append_token(self, layer, k, v):
        """Write one token's K/V ([B, KVH, D]) for every sequence at its
        current length. The tail page must already be mapped (host
        allocator guarantees it before the decode step)."""
        page_idx = self.lengths // self.page_size
        offset = self.lengths % self.page_size
        page_ids = jnp.take_along_axis(self.page_table, page_idx[:, None],
                                       axis=1)[:, 0]

        def write_one(pool, page_id, off, kv_tok):
            # kv_tok: [2, KVH, D] → write at [page_id, :, off]
            return jax.lax.dynamic_update_slice(
                pool, kv_tok[None, :, None].astype(pool.dtype),
                (page_id, 0, off, 0, 0))

        kv_tok = jnp.stack([k, v], axis=1)          # [B, 2, KVH, D]
        pool = self.pools[layer]

        def body(i, pool):
            return write_one(pool, page_ids[i], offset[i], kv_tok[i])

        pool = jax.lax.fori_loop(0, kv_tok.shape[0], body, pool)
        pools = list(self.pools)
        pools[layer] = pool
        return PagedKVCache(pools, self.page_table, self.lengths,
                            self.page_size)

    def gather_sequence_kv(self, layer):
        """Materialize contiguous K/V [B, KVH, cap, D] from the pages
        (cap = max_pages_per_seq * page_size). Unmapped pages read page 0
        but are masked out by ``lengths`` in attention."""
        pool = self.pools[layer]
        safe_table = jnp.maximum(self.page_table, 0)   # [B, P]
        pages = pool[safe_table]        # [B, P, 2, page, KVH, D]
        b, p, _, ps, kvh, d = pages.shape
        k = pages[:, :, 0].reshape(b, p * ps, kvh, d).transpose(0, 2, 1, 3)
        v = pages[:, :, 1].reshape(b, p * ps, kvh, d).transpose(0, 2, 1, 3)
        return k, v

    def advance(self, n=1):
        return PagedKVCache(self.pools, self.page_table, self.lengths + n,
                            self.page_size)

    # -- host-side page allocator -----------------------------------------

    @staticmethod
    def make_allocator(n_pages):
        return _PageAllocator(n_pages)


class _PageAllocator:
    """Host bookkeeping: free-list of pool pages; the engine maps pages
    into sequences' tables before steps that will need them."""

    def __init__(self, n_pages):
        self.free = list(range(n_pages - 1, -1, -1))

    def alloc(self) -> int:
        if not self.free:
            raise MemoryError("KV page pool exhausted")
        return self.free.pop()

    def release(self, pages):
        for page in pages:
            if page >= 0:
                self.free.append(int(page))

    def ensure_capacity(self, cache: PagedKVCache, slot: int,
                        tokens_ahead: int):
        """Map enough pages on ``slot``'s table for ``tokens_ahead`` more
        tokens; returns the updated cache (host-side table update)."""
        table = np.asarray(cache.page_table)
        length = int(np.asarray(cache.lengths)[slot])
        needed_pages = (length + tokens_ahead + cache.page_size - 1) \
            // cache.page_size
        mapped = int((table[slot] >= 0).sum())
        new_table = table.copy()
        for i in range(mapped, needed_pages):
            if i >= cache.max_pages_per_seq:
                raise MemoryError("sequence exceeds max pages")
            new_table[slot, i] = self.alloc()
        return PagedKVCache(cache.pools, jnp.asarray(new_table),
                            cache.lengths, cache.page_size)

    def release_slot(self, cache: PagedKVCache, slot: int) -> PagedKVCache:
        table = np.asarray(cache.page_table)
        self.release(table[slot])
        new_table = table.copy()
        new_table[slot] = -1
        lengths = np.asarray(cache.lengths).copy()
        lengths[slot] = 0
        return PagedKVCache(cache.pools, jnp.asarray(new_table),
                            jnp.asarray(lengths), cache.page_size)
