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
    return NativeScheduler(force_python=(backend == "python"), **kw)


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
    """A minority-length request must be admitted within max_wait admission
    rounds even while the majority bucket keeps winning."""
    s = make(backend, length_bucket=32, max_wait=2)
    s.submit(0, 10, 64)
    s.submit(1, 500, 64)  # minority bucket
    for i in range(2, 12):
        s.submit(i, 10, 64)  # majority bucket keeps the anchor
    rounds = []
    for _ in range(4):
        rounds.append(s.admit(3))
    admitted_round = next(i for i, r in enumerate(rounds) if 1 in r)
    assert admitted_round <= 3  # within max_wait+1 rounds


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
