"""ctypes bridge to the C++ continuous-batching scheduler
(native/scheduler.cpp).

The serving engine's host loop delegates queue/slot lifecycle and the
per-token stop-condition scan over decode bursts to native code; Python
keeps only the JAX dispatches and per-request token lists. Falls back
silently (the engine checks :func:`available`) when the library has not
been built (``make -C native``) or ``RTEN_TPU_NO_NATIVE=1``.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from ..utils.env import env_flag

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                         "librten_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(_LIB_PATH)
    lib.sched_create.restype = ctypes.c_void_p
    lib.sched_create.argtypes = [ctypes.c_int32, ctypes.c_int32]
    lib.sched_destroy.argtypes = [ctypes.c_void_p]
    lib.sched_submit.restype = ctypes.c_int64
    lib.sched_submit.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                 ctypes.c_int32, ctypes.c_void_p,
                                 ctypes.c_int32]
    lib.sched_admit.restype = ctypes.c_int32
    lib.sched_admit.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_void_p]
    lib.sched_commit_first.restype = ctypes.c_int32
    lib.sched_commit_first.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                       ctypes.c_int32]
    lib.sched_commit_burst.restype = ctypes.c_int32
    lib.sched_commit_burst.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_int32, ctypes.c_void_p,
                                       ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_void_p]
    lib.sched_active.restype = ctypes.c_int32
    lib.sched_active.argtypes = [ctypes.c_void_p]
    lib.sched_queued.restype = ctypes.c_int32
    lib.sched_queued.argtypes = [ctypes.c_void_p]
    if hasattr(lib, "sched_cancel"):   # older .so builds lack it
        lib.sched_cancel.restype = ctypes.c_int32
        lib.sched_cancel.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    _lib = lib
    return lib


def available() -> bool:
    if env_flag("RTEN_TPU_NO_NATIVE"):
        return False
    return os.path.exists(_LIB_PATH)


class NativeScheduler:
    """Thin object wrapper; all state lives in the C++ Scheduler."""

    def __init__(self, max_batch: int, capacity: int):
        self._lib = _load()
        self._handle = ctypes.c_void_p(
            self._lib.sched_create(max_batch, capacity))
        self.max_batch = max_batch
        # Reused output buffers.
        self._adm_handles = np.empty(max_batch, np.int64)
        self._adm_slots = np.empty(max_batch, np.int32)
        self._accepted = np.empty(max_batch, np.int32)
        self._done = np.empty(max_batch, np.uint8)

    def __del__(self):
        try:
            self._lib.sched_destroy(self._handle)
        except Exception:
            pass

    def submit(self, prompt_len: int, max_new_tokens: int,
               stop_ids=()) -> int:
        stops = np.asarray(list(stop_ids), np.int32)
        return int(self._lib.sched_submit(
            self._handle, prompt_len, max_new_tokens,
            stops.ctypes.data if stops.size else None, stops.size))

    def admit(self):
        """Returns (handles, slots) of newly admitted requests."""
        n = self._lib.sched_admit(self._handle,
                                  self._adm_handles.ctypes.data,
                                  self._adm_slots.ctypes.data)
        return self._adm_handles[:n].copy(), self._adm_slots[:n].copy()

    def commit_first(self, slot: int, token: int) -> bool:
        """Record a prefill's first sampled token; True if request done."""
        return bool(self._lib.sched_commit_first(self._handle, slot, token))

    def commit_burst(self, tokens: np.ndarray, lengths: np.ndarray,
                     expected=None):
        """tokens: [steps, max_batch] int32; lengths: [max_batch] int32
        depths before the burst; expected: per-slot request handles at
        dispatch time (stale-slot guard for pipelined serving). Returns
        (accepted [max_batch], done [max_batch] bool, total)."""
        tokens = np.ascontiguousarray(tokens, np.int32)
        lengths = np.ascontiguousarray(lengths, np.int32)
        exp_ptr = None
        if expected is not None:
            expected = np.ascontiguousarray(expected, np.int64)
            exp_ptr = expected.ctypes.data
        total = self._lib.sched_commit_burst(
            self._handle, tokens.ctypes.data, tokens.shape[0],
            lengths.ctypes.data, exp_ptr, self._accepted.ctypes.data,
            self._done.ctypes.data)
        return self._accepted.copy(), self._done.astype(bool), int(total)

    def active(self) -> int:
        return int(self._lib.sched_active(self._handle))

    def cancel(self, handle: int) -> bool:
        """Dequeue or free-slot a request; returns True if state
        changed (False also when the .so predates sched_cancel)."""
        if not hasattr(self._lib, "sched_cancel"):
            return False
        return bool(self._lib.sched_cancel(self._handle,
                                           ctypes.c_int64(handle)))

    def queued(self) -> int:
        return int(self._lib.sched_queued(self._handle))
