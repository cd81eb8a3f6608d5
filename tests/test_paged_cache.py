"""Paged KV cache tests: page allocation, appends across page
boundaries, gather parity with the contiguous cache, slot recycling."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rten_tpu.generate.paged_cache import PagedKVCache
from rten_tpu.kernels.attention import _attn_reference

PAGE = 4
KVH, D = 2, 8


def make_cache(batch=2, n_pages=16, max_pages=4, layers=1):
    return PagedKVCache.create(layers, n_pages, PAGE, KVH, D, batch,
                               max_pages)


def test_allocator_alloc_release():
    alloc = PagedKVCache.make_allocator(4)
    pages = [alloc.alloc() for _ in range(4)]
    assert sorted(pages) == [0, 1, 2, 3]
    with pytest.raises(MemoryError):
        alloc.alloc()
    alloc.release([2])
    assert alloc.alloc() == 2


def test_append_across_page_boundary_and_gather():
    rng = np.random.RandomState(0)
    cache = make_cache()
    alloc = PagedKVCache.make_allocator(cache.n_pages)
    n_tokens = PAGE * 2 + 1   # crosses two page boundaries
    ks = rng.randn(n_tokens, 2, KVH, D).astype(np.float32)
    vs = rng.randn(n_tokens, 2, KVH, D).astype(np.float32)
    for slot in range(2):
        cache = alloc.ensure_capacity(cache, slot, n_tokens)
    for t in range(n_tokens):
        cache = cache.append_token(0, jnp.asarray(ks[t]),
                                   jnp.asarray(vs[t])).advance(1)
    k, v = cache.gather_sequence_kv(0)
    assert k.shape == (2, KVH, PAGE * 4, D)
    # Valid region matches what was appended, in order.
    np.testing.assert_allclose(
        np.asarray(k[:, :, :n_tokens]),
        ks.transpose(1, 2, 0, 3), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(v[:, :, :n_tokens]),
        vs.transpose(1, 2, 0, 3), rtol=1e-6)


def test_paged_attention_matches_contiguous():
    """Decode attention over gathered pages == attention over a plain
    contiguous cache with the same contents."""
    rng = np.random.RandomState(1)
    cache = make_cache(batch=2)
    alloc = PagedKVCache.make_allocator(cache.n_pages)
    lengths = [5, 9]
    max_len = max(lengths)
    contiguous_k = np.zeros((2, KVH, PAGE * 4, D), np.float32)
    contiguous_v = np.zeros_like(contiguous_k)
    for slot in range(2):
        cache = alloc.ensure_capacity(cache, slot, max_len)
    for t in range(max_len):
        k_t = rng.randn(2, KVH, D).astype(np.float32)
        v_t = rng.randn(2, KVH, D).astype(np.float32)
        for slot in range(2):
            if t < lengths[slot]:
                contiguous_k[slot, :, t] = k_t[slot]
                contiguous_v[slot, :, t] = v_t[slot]
        # paged append writes for every slot; extra tokens past a slot's
        # length are masked by `lengths` in attention
        cache = cache.append_token(0, jnp.asarray(k_t),
                                   jnp.asarray(v_t)).advance(1)
    k, v = cache.gather_sequence_kv(0)
    q = jnp.asarray(rng.randn(2, KVH, D).astype(np.float32))
    lengths_arr = jnp.asarray(lengths, jnp.int32)
    out_paged = _attn_reference(q[:, :, None], k, v, False, D ** -0.5,
                                lengths_arr)[:, :, 0]
    out_contig = _attn_reference(q[:, :, None], jnp.asarray(contiguous_k),
                                 jnp.asarray(contiguous_v), False,
                                 D ** -0.5, lengths_arr)[:, :, 0]
    np.testing.assert_allclose(np.asarray(out_paged),
                               np.asarray(out_contig), rtol=1e-5,
                               atol=1e-6)


def test_release_slot_recycles_pages():
    cache = make_cache(batch=2, n_pages=4, max_pages=2)
    alloc = PagedKVCache.make_allocator(cache.n_pages)
    cache = alloc.ensure_capacity(cache, 0, PAGE * 2)  # uses 2 pages
    cache = alloc.ensure_capacity(cache, 1, PAGE * 2)  # uses 2 more
    assert not alloc.free
    cache = alloc.release_slot(cache, 0)
    assert len(alloc.free) == 2
    assert int(np.asarray(cache.lengths)[0]) == 0
    assert (np.asarray(cache.page_table)[0] == -1).all()
    # Slot 1 untouched.
    assert (np.asarray(cache.page_table)[1] >= 0).all()


def test_pool_exhaustion_raises():
    cache = make_cache(batch=1, n_pages=1, max_pages=4)
    alloc = PagedKVCache.make_allocator(cache.n_pages)
    cache = alloc.ensure_capacity(cache, 0, PAGE)
    with pytest.raises(MemoryError):
        alloc.ensure_capacity(cache, 0, PAGE * 2)


def test_append_is_jittable_with_donation():
    cache = make_cache(batch=2)
    alloc = PagedKVCache.make_allocator(cache.n_pages)
    for slot in range(2):
        cache = alloc.ensure_capacity(cache, slot, 4)
    k = jnp.ones((2, KVH, D))
    v = jnp.full((2, KVH, D), 2.0)

    @jax.jit
    def step(cache, k, v):
        return cache.append_token(0, k, v).advance(1)

    cache = step(cache, k, v)
    cache = step(cache, k, v)
    assert int(cache.lengths[0]) == 2
    kk, vv = cache.gather_sequence_kv(0)
    np.testing.assert_allclose(np.asarray(kk[0, 0, :2]), 1.0)
