"""Generation-loop tests.

Follows the reference's FakeModel pattern
(rten-generate/src/generator.rs:644-1009): the whole loop is driven
against a scripted model that records the exact inputs of every step, so
KV-cache plumbing, attention-mask/position-id synthesis and sampling are
asserted without any real weights."""

import numpy as np
import jax.numpy as jnp
import pytest

from rten_tpu.generate import (ArgMaxSampler, Generator, GeneratorConfig,
                               KVCache, Metrics, TopKSampler, TopPSampler)
from rten_tpu.generate.generator import GeneratorError, ModelInputsConfig


class FakeModel:
    """Scripted stand-in for runtime.Model: returns canned logits per step
    and grows KV outputs like a real decoder would."""

    def __init__(self, vocab=16, n_layers=2, heads=2, size=4,
                 scripted_tokens=(), with_mask=True, with_positions=True,
                 with_kv=True):
        self.vocab = vocab
        self.n_layers = n_layers
        self.heads = heads
        self.size = size
        self.scripted = list(scripted_tokens)
        self.steps = []          # recorded inputs per run()
        names = ["input_ids"]
        if with_mask:
            names.append("attention_mask")
        if with_positions:
            names.append("position_ids")
        if with_kv:
            for i in range(n_layers):
                names += [f"past_key_values.{i}.key",
                          f"past_key_values.{i}.value"]
        self._input_names = names
        self._all_names = set(names) | {"logits"}
        if with_kv:
            for i in range(n_layers):
                self._all_names |= {f"present.{i}.key", f"present.{i}.value"}

    def input_names(self):
        return list(self._input_names)

    def node_id(self, name):
        return name if name in self._all_names else None

    def input_shape(self, node_id):
        if str(node_id).startswith("past_key_values."):
            return ["batch", self.heads, "seq", self.size]
        return None

    class _Exec:
        def partial_run(self, inputs):
            return {}
    executor = _Exec()

    def run(self, inputs, outputs, options=None):
        self.steps.append({k: np.asarray(v) for k, v in inputs.items()})
        step = len(self.steps) - 1
        n_cur = np.asarray(inputs["input_ids"]).shape[1]
        logits = np.zeros((1, n_cur, self.vocab), np.float32)
        token = self.scripted[step] if step < len(self.scripted) else 0
        logits[0, -1, token] = 10.0
        results = [logits]
        for name in outputs[1:]:
            past_name = name.replace("present.", "past_key_values.")
            past = np.asarray(inputs[past_name])
            cur = np.full((1, self.heads, n_cur, self.size), step,
                          np.float32)
            results.append(np.concatenate([past, cur], axis=2))
        return results


def test_generator_kv_cache_flow():
    model = FakeModel(scripted_tokens=[5, 7, 3])
    gen = Generator(model, [11, 12], GeneratorConfig(max_seq_len=16))
    tokens = [next(gen) for _ in range(3)]
    assert tokens == [5, 7, 3]

    # Step 0: full prompt, empty caches.
    s0 = model.steps[0]
    np.testing.assert_array_equal(s0["input_ids"], [[11, 12]])
    np.testing.assert_array_equal(s0["attention_mask"], [[1, 1]])
    np.testing.assert_array_equal(s0["position_ids"], [[0, 1]])
    assert s0["past_key_values.0.key"].shape == (1, 2, 0, 4)

    # Step 1: single new token, caches have 2 entries, positions continue.
    s1 = model.steps[1]
    np.testing.assert_array_equal(s1["input_ids"], [[5]])
    np.testing.assert_array_equal(s1["attention_mask"], [[1, 1, 1]])
    np.testing.assert_array_equal(s1["position_ids"], [[2]])
    assert s1["past_key_values.1.value"].shape == (1, 2, 2, 4)

    # Step 2: caches have 3 entries and contain step-stamped data.
    s2 = model.steps[2]
    assert s2["past_key_values.0.key"].shape == (1, 2, 3, 4)
    np.testing.assert_array_equal(
        s2["past_key_values.0.key"][0, 0, :, 0], [0, 0, 1])


def test_generator_without_kv_cache_feeds_full_sequence():
    model = FakeModel(scripted_tokens=[4, 6], with_kv=False)
    gen = Generator(model, [9], GeneratorConfig(max_seq_len=8))
    assert [next(gen) for _ in range(2)] == [4, 6]
    np.testing.assert_array_equal(model.steps[0]["input_ids"], [[9]])
    np.testing.assert_array_equal(model.steps[1]["input_ids"], [[9, 4]])


def test_generator_stop_on_tokens():
    model = FakeModel(scripted_tokens=[5, 2, 7])
    gen = Generator(model, [1], GeneratorConfig(max_seq_len=32))
    out = list(gen.stop_on_tokens([2]))
    assert out == [5]


def test_generator_max_seq_len_stops():
    model = FakeModel(scripted_tokens=[3] * 10)
    gen = Generator(model, [1, 2], GeneratorConfig(max_seq_len=5))
    assert len(list(gen)) == 3  # 2 prompt + 3 generated = 5


def test_generator_requires_input_ids():
    model = FakeModel()
    model._input_names = ["attention_mask"]
    with pytest.raises(GeneratorError):
        Generator(model, [1])


def test_metrics_accounting():
    m = Metrics()
    m.start()
    import time
    time.sleep(0.01)
    m.step()
    time.sleep(0.005)
    m.step()
    m.step()
    assert m.ttft_s >= 0.01
    assert len(m.step_times) == 3
    assert m.tokens_per_second() > 0
    assert "tokens/s" in m.summary()


# ---------------------------------------------------------------------------
# Samplers
# ---------------------------------------------------------------------------

def test_argmax_sampler():
    import jax
    logits = jnp.asarray([0.1, 5.0, -1.0])
    out = ArgMaxSampler().sample(jax.random.PRNGKey(0), logits)
    assert int(out) == 1


def test_topk_sampler_restricts_support():
    import jax
    logits = jnp.asarray([10.0, 9.0, -50.0, -50.0])
    s = TopKSampler(k=2, temperature=1.0)
    for seed in range(20):
        token = int(s.sample(jax.random.PRNGKey(seed), logits))
        assert token in (0, 1)


def test_topk_temperature_zero_is_argmax():
    import jax
    logits = jnp.asarray([1.0, 3.0, 2.0])
    s = TopKSampler(k=3, temperature=0.0)
    assert int(s.sample(jax.random.PRNGKey(0), logits)) == 1


def test_topp_sampler():
    import jax
    logits = jnp.asarray([10.0, 1.0, 0.5, 0.1])
    s = TopPSampler(p=0.5, temperature=1.0)
    for seed in range(10):
        assert int(s.sample(jax.random.PRNGKey(seed), logits)) == 0


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------

def test_kv_cache_append_and_advance():
    cache = KVCache.create(batch=2, n_layers=2, kv_heads=3, capacity=8,
                           head_dim=4)
    k = jnp.ones((2, 3, 2, 4))
    v = jnp.full((2, 3, 2, 4), 2.0)
    cache = cache.append(0, k, v, position=0).advance(2)
    np.testing.assert_array_equal(np.asarray(cache.lengths), [2, 2])
    kk, vv = cache.layer_kv(0)
    np.testing.assert_array_equal(np.asarray(kk[:, :, :2]), np.asarray(k))
    np.testing.assert_array_equal(np.asarray(kk[:, :, 2:]), 0)
    # Append one more token at the current length.
    cache = cache.append(0, jnp.full((2, 3, 1, 4), 9.0),
                         jnp.full((2, 3, 1, 4), 9.0))
    kk, _ = cache.layer_kv(0)
    np.testing.assert_array_equal(np.asarray(kk[0, 0, 2]), [9, 9, 9, 9])


def test_kv_cache_quantized_roundtrip():
    cache = KVCache.create(batch=1, n_layers=1, kv_heads=2, capacity=4,
                           head_dim=8, quantized=True)
    rng = np.random.RandomState(0)
    k = jnp.asarray(rng.randn(1, 2, 3, 8).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 2, 3, 8).astype(np.float32))
    cache = cache.append(0, k, v, position=0).advance(3)
    kk, vv = cache.layer_kv(0)
    # int8 per-token quantization: ~1% relative error
    np.testing.assert_allclose(np.asarray(kk[:, :, :3]), np.asarray(k),
                               atol=np.abs(np.asarray(k)).max() / 100)
    np.testing.assert_allclose(np.asarray(vv[:, :, :3]), np.asarray(v),
                               atol=np.abs(np.asarray(v)).max() / 100)


def test_kv_cache_is_pytree():
    import jax
    cache = KVCache.create(1, 1, 1, 4, 4)
    leaves = jax.tree_util.tree_leaves(cache)
    assert len(leaves) == 3  # fused kv, lengths, tail_count
    out = jax.jit(lambda c: c.advance(1))(cache)
    assert int(out.lengths[0]) == 1


def test_generator_whisper_style_kv_names():
    """Encoder-decoder exports name caches past_key_values.N.decoder.key /
    past_key_values.N.encoder.key; discovery must map both to present.*."""
    model = FakeModel(scripted_tokens=[5, 7], n_layers=1)
    model._input_names = [
        "input_ids",
        "past_key_values.0.decoder.key", "past_key_values.0.decoder.value",
        "past_key_values.0.encoder.key", "past_key_values.0.encoder.value",
    ]
    model._all_names = set(model._input_names) | {
        "logits",
        "present.0.decoder.key", "present.0.decoder.value",
        "present.0.encoder.key", "present.0.encoder.value",
    }
    gen = Generator(model, [3], GeneratorConfig(max_seq_len=8))
    assert {n for n, _ in gen._kv_inputs} == {
        "past_key_values.0.decoder.key", "past_key_values.0.decoder.value",
        "past_key_values.0.encoder.key", "past_key_values.0.encoder.value"}
    outs = dict(gen._kv_inputs)
    assert outs["past_key_values.0.encoder.value"] == \
        "present.0.encoder.value"
    assert [next(gen) for _ in range(2)] == [5, 7]


def test_generator_constant_inputs_passed_through():
    """Encoder outputs flow as constant inputs each step (the reference's
    add-constant-input path, generator.rs:425)."""
    model = FakeModel(scripted_tokens=[4, 6])
    model._input_names.append("encoder_hidden_states")
    model._all_names.add("encoder_hidden_states")
    enc = np.ones((1, 7, 4), np.float32)
    gen = Generator(model, [2], GeneratorConfig(max_seq_len=8),
                    constant_inputs={"encoder_hidden_states": enc})
    next(gen)
    next(gen)
    for step in model.steps:
        np.testing.assert_array_equal(step["encoder_hidden_states"], enc)


def test_pack_int8_tokens_roundtrip():
    from rten_tpu.generate.kv_cache import (pack_int8_tokens,
                                            unpack_int8_tokens)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(-128, 128, (3, 8, 16)), jnp.int32)
    packed = pack_int8_tokens(x)
    assert packed.shape == (3, 2, 16)
    np.testing.assert_array_equal(np.asarray(unpack_int8_tokens(packed)),
                                  np.asarray(x))


def test_quant_append_chunk_matches_stepwise():
    """Chunked per-sequence appends (speculative verify) merge bytes
    into the token-packed rows via the XLA read-modify-write window;
    the result must be byte-identical to appending the same tokens one
    at a time through the Pallas RMW kernel — at ragged depths that
    straddle int32 row boundaries."""
    t = 5
    rng = np.random.RandomState(1)
    k = jnp.asarray(rng.randn(3, 2, t, 8).astype(np.float32))
    v = jnp.asarray(rng.randn(3, 2, t, 8).astype(np.float32))
    depths = [0, 3, 6]   # aligned, mid-row, straddling two rows

    # pre-fill junk below the depths so the merge must preserve it
    kj = jnp.asarray(rng.randn(3, 2, 8, 8).astype(np.float32))

    def fresh():
        c = KVCache.create(batch=3, n_layers=1, kv_heads=2, capacity=16,
                           head_dim=8, quantized=True)
        c = c.append(0, kj, kj, position=0)
        return c.with_lengths(jnp.asarray(depths, jnp.int32))

    chunk = fresh().append(0, k, v)                     # one RMW window
    step = fresh()
    for i in range(t):                                   # t Pallas RMWs
        step = step.append(0, k[:, :, i:i + 1], v[:, :, i:i + 1])
        step = step.with_lengths(step.lengths + 1)
    step = step.with_lengths(jnp.asarray(depths, jnp.int32))

    np.testing.assert_array_equal(np.asarray(chunk.kv[0]),
                                  np.asarray(step.kv[0]))
    got_s, want_s = chunk.quant_scales[0], step.quant_scales[0]
    for b, d0 in enumerate(depths):
        np.testing.assert_array_equal(np.asarray(got_s[b, d0:d0 + t]),
                                      np.asarray(want_s[b, d0:d0 + t]))
