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


def test_profile_phase_breakdown():
    """A profiled run must surface per-phase attribution (draft/verify/
    commit ms) in the summary — reference StructuredProfiler parity
    (/root/reference/src/metrics/structured_profiler.py:88-156). The TPU
    step is one fused program, so phases are slope-timed as isolated
    programs (Engine.profile_phases)."""
    import jax

    from llm_inference_lab_tpu.config import EngineConfig
    from llm_inference_lab_tpu.core.engine import Engine
    from llm_inference_lab_tpu.models.llama import LlamaModel

    def tiny(seed):
        return LlamaModel.create(
            "llama-tiny", rng=jax.random.PRNGKey(seed),
            dtype=jax.numpy.float32,
        )

    eng = Engine(
        EngineConfig(implementation="hf", max_draft=2, max_new_tokens=4,
                     max_seq_len=128, dtype="float32", profile=True),
        target_model=tiny(0), draft_model=tiny(1),
    )
    eng.generate("phase attribution probe")
    s = eng.profiler.summary()
    ph = s["phase_ms"]
    assert ph is not None and "error" not in ph, ph
    assert ph["k"] == 2 and ph["draft_forwards"] == 2
    for key in ("draft_ms", "verify_ms", "commit_sample_ms", "step_ms"):
        assert key in ph
    # The decomposition sums to the measured step by construction; the
    # parts must be sane (non-negative draft/verify, step covers them).
    assert ph["draft_ms"] >= 0 and ph["verify_ms"] >= 0
    # Each phase is round()ed to 4 decimals independently, so the sum can
    # be off by a few 1e-4 — the tolerance must cover the rounding, not
    # just float noise (failed a full-suite run at 1e-6 exactly here).
    assert abs(
        ph["draft_ms"] + ph["verify_ms"] + ph["commit_sample_ms"]
        - ph["step_ms"]
    ) < 1e-3
    # Cached per (k, batch): a second call must not re-measure.
    again = eng.profile_phases()
    assert again is ph or again == ph
