"""Tests for the native C++ continuous-batching scheduler
(native/scheduler.cpp via generate/native_sched.py) and its engine
integration. Skipped when the library is not built."""

import numpy as np
import pytest

from rten_tpu.generate import native_sched

pytestmark = pytest.mark.skipif(not native_sched.available(),
                                reason="librten_native.so not built")


def test_scheduler_admission_and_slot_recycling():
    s = native_sched.NativeScheduler(max_batch=2, capacity=32)
    h = [s.submit(4, 3) for _ in range(3)]
    assert s.queued() == 3
    handles, slots = s.admit()
    assert sorted(map(int, handles)) == [h[0], h[1]]
    assert sorted(map(int, slots)) == [0, 1]
    assert s.active() == 2 and s.queued() == 1
    for slot in (0, 1):
        assert not s.commit_first(slot, token=7)
    # Burst of 2 steps: each request allows 3 tokens total -> both finish.
    toks = np.asarray([[10, 11], [12, 13]], np.int32)
    accepted, done, total = s.commit_burst(toks, np.asarray([5, 5], np.int32))
    assert total == 4 and done.all() and list(accepted) == [2, 2]
    assert s.active() == 0
    handles2, slots2 = s.admit()   # the queued request takes a freed slot
    assert list(map(int, handles2)) == [h[2]]


def test_scheduler_stop_ids_and_capacity():
    s = native_sched.NativeScheduler(max_batch=1, capacity=8)
    s.submit(2, 100, stop_ids=(42,))
    s.admit()
    s.commit_first(0, token=1)
    toks = np.asarray([[5], [42], [6]], np.int32)
    accepted, done, total = s.commit_burst(toks, np.asarray([3], np.int32))
    assert int(accepted[0]) == 2 and done[0]     # stops AT the stop id
    # Capacity: a request at depth cap-2 finishes after one more token.
    s2 = native_sched.NativeScheduler(max_batch=1, capacity=8)
    s2.submit(2, 100)
    s2.admit()
    s2.commit_first(0, token=1)
    toks = np.asarray([[5], [5], [5], [5], [5]], np.int32)
    accepted, done, total = s2.commit_burst(toks, np.asarray([5], np.int32))
    assert done[0] and int(accepted[0]) <= 2


def test_scheduler_oversized_prompt_rejected():
    s = native_sched.NativeScheduler(max_batch=1, capacity=8)
    assert s.submit(8, 4) == -1


def test_engine_native_vs_python_scheduler_parity(monkeypatch):
    """The engine must emit identical tokens with and without the native
    scheduler."""
    import jax
    from rten_tpu.generate.engine import ServingEngine
    from rten_tpu.models.transformer import TransformerConfig, TransformerLM

    cfg = TransformerConfig.tiny_test()
    model = TransformerLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    prompts = [[5, 17, 3], [9, 2], [40, 41, 42, 43]]

    def run(native):
        if not native:
            monkeypatch.setenv("RTEN_TPU_NO_NATIVE", "1")
        else:
            monkeypatch.delenv("RTEN_TPU_NO_NATIVE", raising=False)
        eng = ServingEngine(model, params, max_batch=2, capacity=32,
                            prefill_buckets=(8,))
        assert (eng._sched is not None) == native
        return eng.generate(prompts, max_new_tokens=5, burst=2)

    assert run(True) == run(False)
