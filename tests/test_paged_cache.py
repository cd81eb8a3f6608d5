"""Block-paged KV cache tests: pool/page-table mechanics, the Pallas
paged append + paged flash-decode kernels, the host allocator, and
end-to-end paged serving parity vs the contiguous engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rten_tpu.generate.paged_cache import PagedKVCache

KVH, D, PAGE = 2, 64, 8          # KVH*D = 128 → Pallas append path


def make_cache(layers=1, n_pages=16, batch=2, max_pages=4):
    return PagedKVCache.create(layers, n_pages, PAGE, KVH, D, batch,
                               max_pages)


def test_allocator_alloc_release():
    # Page 0 is reserved as the garbage page (dead slots' in-flight
    # appends clamp to it) — never allocated.
    alloc = PagedKVCache.make_allocator(4)
    pages = [alloc.alloc() for _ in range(3)]
    assert sorted(pages) == [1, 2, 3]
    with pytest.raises(MemoryError):
        alloc.alloc()
    alloc.release([2])
    assert alloc.alloc() == 2


def test_ensure_capacity_maps_pages():
    cache = make_cache()
    alloc = PagedKVCache.make_allocator(cache.n_pages)
    cache = alloc.ensure_capacity(cache, slot=0, tokens_ahead=PAGE + 1)
    table = np.asarray(cache.page_table)
    assert (table[0] >= 0).sum() == 2 and (table[1] >= 0).sum() == 0
    # Idempotent when capacity is already mapped.
    cache2 = alloc.ensure_capacity(cache, 0, PAGE + 1)
    np.testing.assert_array_equal(np.asarray(cache2.page_table), table)
    with pytest.raises(MemoryError):
        alloc.ensure_capacity(cache, 0, cache.capacity + PAGE)


def test_decode_append_lands_in_mapped_page():
    cache = make_cache()
    alloc = PagedKVCache.make_allocator(cache.n_pages)
    for slot in (0, 1):
        cache = alloc.ensure_capacity(cache, slot, 2 * PAGE)
    # Slot 0 at depth 3 (page 0), slot 1 at depth PAGE+1 (page 1).
    cache = cache.with_lengths(jnp.asarray([3, PAGE + 1], jnp.int32))
    rng = np.random.RandomState(0)
    k = jnp.asarray(rng.randn(2, KVH, 1, D).astype(np.float32))
    v = jnp.asarray(rng.randn(2, KVH, 1, D).astype(np.float32))
    out = cache.append(0, k, v)
    kk, vv = out.layer_kv(0)       # [B, KVH, cap, D]
    np.testing.assert_allclose(np.asarray(kk)[0, :, 3], np.asarray(k)[0, :, 0])
    np.testing.assert_allclose(np.asarray(vv)[1, :, PAGE + 1],
                               np.asarray(v)[1, :, 0])


def test_prefill_append_scatters_pages():
    cache = make_cache(batch=1)
    alloc = PagedKVCache.make_allocator(cache.n_pages)
    S = PAGE + 3                   # crosses a page boundary
    cache = alloc.ensure_capacity(cache, 0, S + 1)
    rng = np.random.RandomState(1)
    k = jnp.asarray(rng.randn(1, KVH, S, D).astype(np.float32))
    v = jnp.asarray(rng.randn(1, KVH, S, D).astype(np.float32))
    out = cache.append(0, k, v, position=0).with_lengths(
        jnp.asarray([S], jnp.int32))
    kk, _ = out.layer_kv(0)
    np.testing.assert_allclose(np.asarray(kk)[0, :, :S], np.asarray(k)[0])


def test_paged_attention_matches_contiguous():
    """flash_decode_paged over scattered pages == dense attention."""
    from rten_tpu.kernels.attention import (_attn_reference,
                                            flash_decode_paged)
    B, H, P = 2, 4, 4
    cache = make_cache(batch=B, n_pages=32, max_pages=P)
    alloc = PagedKVCache.make_allocator(cache.n_pages)
    # Scramble allocation order so pages are non-contiguous in the pool.
    for _ in range(5):
        alloc.alloc()
    lengths = [PAGE + 2, 3 * PAGE - 1]
    rng = np.random.RandomState(2)
    for slot in (0, 1):
        cache = alloc.ensure_capacity(cache, slot, lengths[slot])
    S = 3 * PAGE
    k = jnp.asarray(rng.randn(B, KVH, S, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, KVH, S, D).astype(np.float32))
    cache = cache.append(0, k, v, position=0).with_lengths(
        jnp.asarray(lengths, jnp.int32))
    q = jnp.asarray(rng.randn(B, H, D).astype(np.float32))

    out = flash_decode_paged(q, cache.fused_layer(0), cache.page_table,
                             cache.lengths, KVH)
    kc, vc = cache.layer_kv(0)
    kc = jnp.repeat(kc, H // KVH, axis=1)
    vc = jnp.repeat(vc, H // KVH, axis=1)
    ref = _attn_reference(q[:, :, None, :], kc, vc, False,
                          1.0 / np.sqrt(D), cache.lengths)[:, :, 0, :]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_paged_engine_matches_contiguous_engine():
    """End to end: the paged engine emits the same tokens as the
    contiguous engine, while using only the pages it needs."""
    from rten_tpu.generate.engine import ServingEngine
    from rten_tpu.models.transformer import TransformerConfig, TransformerLM

    cfg = TransformerConfig.tiny_test(n_heads=2, d_model=128)  # KVH*D=128
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    prompts = [[5, 17, 3, 9, 2, 11], [40, 41]]

    ref_eng = ServingEngine(model, params, max_batch=2, capacity=64,
                            prefill_buckets=(8,))
    ref = ref_eng.generate(prompts, max_new_tokens=6, burst=3)

    eng = ServingEngine(model, params, max_batch=2, capacity=64,
                        prefill_buckets=(8,), paged=True, page_size=8)
    got = eng.generate(prompts, max_new_tokens=6, burst=3)
    assert got == ref
    # All pages returned to the pool after completion (page 0 reserved).
    assert sum(len(f) for f in eng.allocator.free) == \
        eng.cache.n_pages - eng.allocator.partitions
    assert (np.asarray(eng.cache.page_table) == -1).all()


def test_paged_pool_oversubscription():
    """A pool smaller than batch×capacity serves short requests fine and
    raises MemoryError only when truly exhausted."""
    from rten_tpu.generate.engine import ServingEngine
    from rten_tpu.models.transformer import TransformerConfig, TransformerLM

    cfg = TransformerConfig.tiny_test(n_heads=2, d_model=128)
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    # capacity 64 → 8 pages/slot max, pool of only 6 pages total.
    eng = ServingEngine(model, params, max_batch=2, capacity=64,
                        prefill_buckets=(8,), paged=True, page_size=8,
                        pool_pages=6)
    outs = eng.generate([[1, 2, 3], [4, 5]], max_new_tokens=4, burst=2)
    assert all(len(t) == 4 for t in outs)
    assert sum(len(f) for f in eng.allocator.free) == \
        eng.cache.n_pages - 1  # page 0 reserved


def test_dead_slot_appends_go_to_garbage_page():
    """A finished slot keeps decoding until reuse (the jitted decode runs
    the whole batch); its appends must land in reserved page 0, never in
    a live sequence's pages."""
    from rten_tpu.generate.engine import ServingEngine
    from rten_tpu.models.transformer import TransformerConfig, TransformerLM

    cfg = TransformerConfig.tiny_test(n_heads=2, d_model=128)
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    eng = ServingEngine(model, params, max_batch=2, capacity=64,
                        prefill_buckets=(8,), paged=True, page_size=8)
    # Request 0 finishes after 2 tokens; request 1 keeps going for 20 —
    # slot 0 sits dead while slot 1 decodes.
    r0 = eng.submit([1, 2, 3], max_new_tokens=2)
    r1 = eng.submit([4, 5, 6], max_new_tokens=20)
    # Snapshot r1's greedy continuation from a solo engine (no dead
    # neighbor): outputs must be identical.
    solo = ServingEngine(model, params, max_batch=2, capacity=64,
                         prefill_buckets=(8,), paged=True, page_size=8)
    sr = solo.submit([4, 5, 6], max_new_tokens=20)
    solo.run(burst=4)
    eng.run(burst=4)
    assert r1.tokens == sr.tokens


def test_paged_grouped_attention_matches_contiguous():
    """flash_decode_paged_grouped (G sequences/program, in-kernel page
    resolution) == dense attention over the same scattered pages."""
    from rten_tpu.kernels.attention import (_attn_reference,
                                            flash_decode_paged_grouped)
    B, H, P = 4, 4, 4
    cache = make_cache(batch=B, n_pages=32, max_pages=P)
    alloc = PagedKVCache.make_allocator(cache.n_pages)
    for _ in range(3):
        alloc.alloc()
    lengths = [PAGE + 2, 3 * PAGE - 1, 1, 2 * PAGE]
    rng = np.random.RandomState(4)
    for slot in range(B):
        cache = alloc.ensure_capacity(cache, slot, lengths[slot])
    S = 3 * PAGE
    k = jnp.asarray(rng.randn(B, KVH, S, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, KVH, S, D).astype(np.float32))
    cache = cache.append(0, k, v, position=0).with_lengths(
        jnp.asarray(lengths, jnp.int32))
    q = jnp.asarray(rng.randn(B, H, D).astype(np.float32))

    out = flash_decode_paged_grouped(q, cache.fused_layer(0),
                                     cache.page_table, cache.lengths,
                                     KVH, group=2)
    kc, vc = cache.layer_kv(0)
    kc = jnp.repeat(kc, H // KVH, axis=1)
    vc = jnp.repeat(vc, H // KVH, axis=1)
    ref = _attn_reference(q[:, :, None, :], kc, vc, False,
                          1.0 / np.sqrt(D), cache.lengths)[:, :, 0, :]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_paged_quantized_roundtrip():
    """Quantized paged pool: prefill pages + decode RMW appends must
    dequantize back within int8 error at ragged depths."""
    cache = PagedKVCache.create(1, n_pages=8, page_size=PAGE, kv_heads=KVH,
                                head_dim=D, batch=2, max_pages_per_seq=3,
                                quantized=True)
    table = jnp.asarray([[0, 1, -1], [2, 3, 4]], jnp.int32)
    cache = PagedKVCache(cache.pools, table, cache.lengths, PAGE, KVH, D,
                         quant_scales=cache.quant_scales)
    rng = np.random.RandomState(0)
    k = jnp.asarray(rng.randn(2, KVH, 10, D).astype(np.float32))
    v = jnp.asarray(rng.randn(2, KVH, 10, D).astype(np.float32))
    cache = cache.append(0, k, v, position=0).with_lengths(
        jnp.asarray([10, 7], jnp.int32))
    # decode append lands mid-page (token 10 / 7)
    k1 = jnp.asarray(rng.randn(2, KVH, 1, D).astype(np.float32))
    v1 = jnp.asarray(rng.randn(2, KVH, 1, D).astype(np.float32))
    cache = cache.append(0, k1, v1)
    kk, vv = cache.layer_kv(0)     # [B, KVH, cap, D] dequantized
    tol = np.abs(np.asarray(k)).max() / 50
    np.testing.assert_allclose(np.asarray(kk[0, :, :10]),
                               np.asarray(k[0]), atol=tol)
    np.testing.assert_allclose(np.asarray(vv[1, :, :7]),
                               np.asarray(v[1, :, :7]), atol=tol)
    np.testing.assert_allclose(np.asarray(kk[0, :, 10]),
                               np.asarray(k1[0, :, 0]), atol=tol)
    np.testing.assert_allclose(np.asarray(vv[1, :, 7]),
                               np.asarray(v1[1, :, 0]), atol=tol)


def test_paged_quantized_grouped_attention_matches_reference():
    """flash_decode_paged_grouped over a quantized pool must match jnp
    attention over the dequantized gathered pages."""
    from rten_tpu.kernels.attention import (_attn_reference,
                                            flash_decode_paged_grouped)
    B, H, S = 4, 4, 21
    rng = np.random.RandomState(3)
    cache = PagedKVCache.create(1, n_pages=16, page_size=PAGE,
                                kv_heads=KVH, head_dim=D, batch=B,
                                max_pages_per_seq=4, quantized=True)
    table = jnp.asarray(np.arange(16).reshape(B, 4), jnp.int32)
    cache = PagedKVCache(cache.pools, table, cache.lengths, PAGE, KVH, D,
                         quant_scales=cache.quant_scales)
    k = jnp.asarray(rng.randn(B, KVH, S, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, KVH, S, D).astype(np.float32))
    cache = cache.append(0, k, v, position=0)
    lengths = jnp.asarray([21, 5, 16, 1], jnp.int32)
    cache = cache.with_lengths(lengths)
    q = jnp.asarray(rng.randn(B, H, D).astype(np.float32))

    got = flash_decode_paged_grouped(q, cache.fused_layer(0),
                                     cache.page_table, lengths, KVH,
                                     group=2,
                                     kv_scales=cache.quant_scales[0])
    kc, vc = cache.layer_kv(0)
    kc = jnp.repeat(kc, H // KVH, axis=1)
    vc = jnp.repeat(vc, H // KVH, axis=1)
    want = _attn_reference(q[:, :, None, :], kc, vc, False,
                           1.0 / np.sqrt(D), lengths)[:, :, 0, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_engine_paged_quantized_generates():
    """End-to-end: paged engine with the quantized pool (paged prefill,
    RMW decode appends through the page table, grouped quant paged
    attention) completes generation with the right counts."""
    from rten_tpu.generate.engine import ServingEngine
    from rten_tpu.models.transformer import TransformerConfig, TransformerLM
    cfg = TransformerConfig.tiny_test(n_heads=2, d_model=128)  # KVH*D=128
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    eng = ServingEngine(model, params, max_batch=4, capacity=32,
                        prefill_buckets=(8,), paged=True, page_size=8,
                        quantized_cache=True)
    prompts = [[1, 2, 3], [4, 5, 6, 7, 8], [9, 10], [11] * 7]
    outs = eng.generate(prompts, max_new_tokens=6)
    assert all(len(o) == 6 for o in outs)
    # sanity vs the unpaged quantized engine (same tolerance philosophy
    # as test_engine_quantized_kv_cache_close: counts, not tokens)
    ref = ServingEngine(model, params, max_batch=4, capacity=32,
                        prefill_buckets=(8,),
                        quantized_cache=True).generate(
                            prompts, max_new_tokens=6)
    assert all(len(o) == 6 for o in ref)


# -- data-parallel paged serving (round 4) ------------------------------


def test_page_allocator_partitions():
    from rten_tpu.generate.paged_cache import _PageAllocator
    a = _PageAllocator(8, partitions=2, slots_per_partition=2)
    # Partition 0 owns pages 1..3 (0 = its garbage), partition 1 owns
    # 5..7 (4 = its garbage).
    p0 = {a.alloc(0), a.alloc(1), a.alloc(1)}
    assert p0 == {1, 2, 3}
    p1 = {a.alloc(2), a.alloc(3)}
    assert p1 <= {5, 6, 7}
    a.release([2, 6])
    assert 2 in a.free[0] and 6 in a.free[1]
    import pytest as _pytest
    a.alloc(0)  # page 2 back
    with _pytest.raises(MemoryError):
        a.alloc(0)


@pytest.mark.parametrize("quant", [False, True])
def test_paged_engine_data_mesh_parity(quant):
    """Paged serving over a data=2 mesh (pool pages partitioned across
    shards, per-shard paged islands) must match the single-chip paged
    engine token-for-token."""
    import jax
    from rten_tpu.generate.engine import ServingEngine
    from rten_tpu.models.transformer import (TransformerConfig,
                                             TransformerLM)
    from rten_tpu.parallel import make_mesh

    cfg = TransformerConfig.tiny_test(n_heads=2, kv_heads=2, d_model=128,
                                      use_pallas=True)
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(11))
    prompts = [[1, 2, 3], [10, 20], [7], [4, 5, 6, 8],
               [9, 9], [11, 12, 13], [3], [2, 4]]

    plain = ServingEngine(model, params, max_batch=8, capacity=64,
                          prefill_buckets=(16,), paged=True,
                          page_size=16, quantized_cache=quant)
    want = plain.generate(prompts, max_new_tokens=5)

    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    sharded = ServingEngine(model, params, max_batch=8, capacity=64,
                            prefill_buckets=(16,), paged=True,
                            page_size=16, quantized_cache=quant,
                            mesh=mesh)
    assert sharded.allocator.partitions == 2
    with mesh:
        got = sharded.generate(prompts, max_new_tokens=5)
    assert got == want


@pytest.mark.parametrize("quant", [False, True])
def test_paged_engine_tp_mesh_parity(quant):
    """Paged serving over a (data=2, model=2) mesh (round-5 plan item:
    paged x TENSOR parallelism): heads shard over `model`, the pool's
    feature dim splits with them, and quant scale PAGES take the
    lane-group layout so each shard's slice is a standard single-chip
    scale page. Token-exact vs the single-chip paged engine."""
    import jax
    from rten_tpu.generate.engine import ServingEngine
    from rten_tpu.models.transformer import (TransformerConfig,
                                             TransformerLM)
    from rten_tpu.parallel import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    # head_dim 64, kv_heads 4, tp 2 -> local features 2*64 = 128.
    cfg = TransformerConfig(
        vocab_size=128, n_layers=2, n_heads=4, kv_heads=4, d_model=256,
        d_ff=128, max_seq_len=64, pos="learned", norm="layernorm",
        act="gelu", use_pallas=True)
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(17))
    prompts = [[1, 2, 3], [10, 20], [7], [4, 5, 6, 8],
               [9, 9], [11, 12, 13], [3], [2, 4]]

    plain = ServingEngine(model, params, max_batch=8, capacity=64,
                          prefill_buckets=(16,), paged=True,
                          page_size=16, quantized_cache=quant)
    want = plain.generate(prompts, max_new_tokens=5)

    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    sharded = ServingEngine(model, params, max_batch=8, capacity=64,
                            prefill_buckets=(16,), paged=True,
                            page_size=16, quantized_cache=quant,
                            mesh=mesh)
    assert sharded.allocator.partitions == 2   # data axes only
    if quant:
        from rten_tpu.generate.kv_cache import SCALE_LANES
        assert sharded.cache.quant_scales[0].shape[-1] == 2 * SCALE_LANES
    with mesh:
        got = sharded.generate(prompts, max_new_tokens=5)
    assert got == want
