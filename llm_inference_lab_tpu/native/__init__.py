"""Native runtime layer: C++ scheduler core with Python-identical fallback.

The compute path is Pallas/XLA (ops/pallas); this package holds the
host-side native pieces — the continuous-batching scheduler core
(scheduler.cc). Selection mirrors the reference's kernel fallback chain
(CUDA -> Triton -> torch; here C++ -> Python, src/kernels/build.py:136-187).
"""

from __future__ import annotations

import ctypes
from collections import deque
from typing import List, Optional

from llm_inference_lab_tpu.native.build import build_and_load

_LIB = build_and_load("scheduler")
if _LIB is not None:
    _LIB.sched_create.restype = ctypes.c_void_p
    _LIB.sched_create.argtypes = [
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_double, ctypes.c_int32,
    ]
    _LIB.sched_destroy.argtypes = [ctypes.c_void_p]
    _LIB.sched_submit.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32
    ]
    _LIB.sched_pending.argtypes = [ctypes.c_void_p]
    _LIB.sched_pending.restype = ctypes.c_int32
    _LIB.sched_admit.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.POINTER(ctypes.c_int64)
    ]
    _LIB.sched_admit.restype = ctypes.c_int32
    _LIB.sched_record_step.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32
    ]
    _LIB.sched_record_step.restype = ctypes.c_int32
    _LIB.sched_acceptance_ema.argtypes = [ctypes.c_void_p]
    _LIB.sched_acceptance_ema.restype = ctypes.c_double
    _LIB.sched_current_k.argtypes = [ctypes.c_void_p]
    _LIB.sched_current_k.restype = ctypes.c_int32


class NativeScheduler:
    """C++-backed admission scheduler (length-aware + FCFS fairness) with an
    EMA adaptive-K tracker. Falls back to a pure-Python implementation with
    identical semantics when the toolchain is unavailable."""

    def __init__(
        self,
        length_bucket: int = 32,
        max_wait: int = 64,
        init_k: int = 4,
        min_k: int = 1,
        max_k: int = 8,
        target_acceptance: float = 0.5,
        window: int = 32,
        force_python: bool = False,
    ):
        self.backend = "python" if (force_python or _LIB is None) else "cpp"
        self._params = (length_bucket, max_wait, init_k, min_k, max_k,
                        target_acceptance, window)
        if self.backend == "cpp":
            self._h = ctypes.c_void_p(
                _LIB.sched_create(length_bucket, max_wait, init_k, min_k,
                                  max_k, target_acceptance, window)
            )
        else:
            self._queue = deque()
            self._seq = 0
            self._round = 0
            self._ema = 0.5
            self._alpha = 2.0 / (window + 1.0)
            self._k = init_k

    def __del__(self):
        if getattr(self, "backend", None) == "cpp" and _LIB is not None:
            _LIB.sched_destroy(self._h)

    def submit(self, req_id: int, prompt_len: int, max_new: int) -> None:
        if self.backend == "cpp":
            _LIB.sched_submit(self._h, req_id, prompt_len, max_new)
        else:
            self._queue.append((req_id, prompt_len, self._seq, self._round))
            self._seq += 1

    def pending(self) -> int:
        if self.backend == "cpp":
            return _LIB.sched_pending(self._h)
        return len(self._queue)

    def admit(self, n_slots: int) -> List[int]:
        if self.backend == "cpp":
            buf = (ctypes.c_int64 * n_slots)()
            n = _LIB.sched_admit(self._h, n_slots, buf)
            return list(buf[:n])
        # Python fallback — same algorithm as scheduler.cc sched_admit.
        bucket_w, max_wait = self._params[0], self._params[1]
        out: List[int] = []
        self._round += 1
        while len(out) < n_slots and self._queue:
            if (self._round - self._queue[0][3]) > max_wait:
                bucket = self._queue[0][1] // bucket_w
            else:
                counts: dict = {}
                for _, plen, _seq, _rnd in self._queue:
                    counts[plen // bucket_w] = counts.get(plen // bucket_w, 0) + 1
                bucket = max(sorted(counts), key=lambda b: counts[b])
            keep = deque()
            for item in self._queue:
                same = (item[1] // bucket_w) == bucket
                overdue = (self._round - item[3]) > max_wait
                if len(out) < n_slots and (same or overdue):
                    out.append(item[0])
                else:
                    keep.append(item)
            self._queue = keep
        return out

    def record_step(self, proposed: int, accepted: int) -> int:
        """Feed one step's outcome; returns the suggested K."""
        if self.backend == "cpp":
            return _LIB.sched_record_step(self._h, proposed, accepted)
        if proposed > 0:
            rate = accepted / proposed
            self._ema += self._alpha * (rate - self._ema)
            tgt = self._params[5]
            if self._ema > tgt + 0.1 and self._k < self._params[4]:
                self._k += 1
            elif self._ema < tgt - 0.1 and self._k > self._params[3]:
                self._k -= 1
        return self._k

    @property
    def acceptance_ema(self) -> float:
        if self.backend == "cpp":
            return _LIB.sched_acceptance_ema(self._h)
        return self._ema

    @property
    def k(self) -> int:
        if self.backend == "cpp":
            return _LIB.sched_current_k(self._h)
        return self._k
