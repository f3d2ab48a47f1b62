"""Native C++ scheduler tests — run against BOTH backends (cpp + python
fallback) to pin their semantics together (reference model: kernel-vs-
reference equivalence, tests/test_kernels_verify.py:67)."""

import pytest

from llm_inference_lab_tpu.native import NativeScheduler, _LIB


def both_backends():
    scheds = []
    if _LIB is not None:
        scheds.append("cpp")
    scheds.append("python")
    return scheds


def make(backend, **kw):
    s = NativeScheduler(**kw)
    if backend == "python" and s.backend == "cpp":
        # Force the fallback path.
        s2 = NativeScheduler.__new__(NativeScheduler)
        NativeScheduler.__init__(s2, **kw)
        s2.backend = "python"
        from collections import deque

        s2._queue = deque()
        s2._seq = 0
        s2._ema = 0.5
        s2._alpha = 2.0 / (kw.get("window", 32) + 1.0)
        s2._k = kw.get("init_k", 4)
        return s2
    return s


def test_cpp_backend_built():
    # The toolchain is part of the environment: the native path must build.
    assert _LIB is not None, "C++ scheduler failed to build"


@pytest.mark.parametrize("backend", both_backends())
def test_fcfs_when_all_same_bucket(backend):
    s = make(backend, length_bucket=32)
    for i in range(5):
        s.submit(i, 10, 64)
    assert s.admit(3) == [0, 1, 2]
    assert s.admit(3) == [3, 4]
    assert s.pending() == 0


@pytest.mark.parametrize("backend", both_backends())
def test_length_grouping_prefers_same_bucket(backend):
    s = make(backend, length_bucket=32, max_wait=1000)
    s.submit(0, 10, 64)   # bucket 0 (anchor)
    s.submit(1, 100, 64)  # bucket 3
    s.submit(2, 12, 64)   # bucket 0 -> grouped with anchor
    out = s.admit(2)
    assert out == [0, 2]
    assert s.admit(2) == [1]


@pytest.mark.parametrize("backend", both_backends())
def test_fairness_overdue_request_admitted(backend):
    s = make(backend, length_bucket=32, max_wait=2)
    s.submit(0, 10, 64)
    s.submit(1, 500, 64)  # different bucket
    for i in range(2, 8):
        s.submit(i, 10, 64)  # many same-bucket arrivals overtake id=1
    first = s.admit(3)
    assert first[0] == 0
    # id=1 must appear within the next admission (overtaken > max_wait).
    second = s.admit(3)
    assert 1 in first or 1 in second


@pytest.mark.parametrize("backend", both_backends())
def test_adaptive_k_ema(backend):
    s = make(backend, init_k=4, target_acceptance=0.5, window=8)
    for _ in range(20):
        k = s.record_step(4, 4)  # 100% acceptance
    assert k > 4 or s.k == 8
    for _ in range(40):
        k = s.record_step(4, 0)
    assert s.k == 1
    assert 0.0 <= s.acceptance_ema <= 1.0


def test_backends_agree():
    if _LIB is None:
        pytest.skip("no C++ backend")
    a = make("cpp", length_bucket=16, max_wait=3)
    b = make("python", length_bucket=16, max_wait=3)
    pattern = [(0, 5), (1, 40), (2, 6), (3, 90), (4, 7), (5, 41)]
    for rid, ln in pattern:
        a.submit(rid, ln, 64)
        b.submit(rid, ln, 64)
    while a.pending() or b.pending():
        ra, rb = a.admit(2), b.admit(2)
        assert ra == rb, (ra, rb)
