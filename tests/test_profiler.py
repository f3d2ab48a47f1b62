"""Profiler tests (reference tests/test_structured_profiler.py:
record/aggregate/save-json, disabled-is-noop; test_metrics_profiler.py:
histogram + timing contexts)."""

import json

from llm_inference_lab_tpu.metrics.profiler import (
    StructuredProfiler,
    device_memory_stats,
)


def test_disabled_is_noop():
    p = StructuredProfiler(enabled=False)
    p.record_step(5.0, accepted=2)
    p.record_prefill(10.0)
    s = p.summary()
    assert s["step_ms"]["n"] == 0
    assert s["acceptance_histogram"] == {}


def test_record_and_aggregate():
    p = StructuredProfiler(enabled=True)
    for ms, acc in [(10.0, 0), (20.0, 2), (30.0, 2)]:
        p.record_step(ms, accepted=acc)
    s = p.summary()
    assert s["step_ms"]["n"] == 3
    assert abs(s["step_ms"]["mean"] - 20.0) < 1e-9
    assert s["acceptance_histogram"] == {0: 1, 2: 2}


def test_save_json(tmp_path):
    p = StructuredProfiler(enabled=True)
    p.record_step(1.5)
    path = str(tmp_path / "prof.json")
    p.save_json(path)
    data = json.load(open(path))
    assert data["step_ms"]["n"] == 1


def test_time_step_context():
    p = StructuredProfiler(enabled=True)
    with p.time_step():
        pass
    assert p.summary()["step_ms"]["n"] == 1


def test_memory_stats_shape():
    d = device_memory_stats().as_dict()
    assert set(d) == {"device_mem_mb", "device_peak_mb", "mem_rss_mb"}
