"""Long-run stability (reference tests/stress_test_long_run.py: hundreds of
steps, memory-leak and responsiveness bounds). Marked slow; a shorter smoke
version runs in the default suite."""

import resource
import time

import pytest

from llm_inference_lab_tpu.config import EngineConfig
from llm_inference_lab_tpu.core.batching import ContinuousBatcher
from llm_inference_lab_tpu.core.engine import Engine


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def test_repeated_generation_stable():
    """Many generations on one engine: no per-call recompiles (fast after
    warmup), bounded RSS growth."""
    eng = Engine(EngineConfig(implementation="fake", base_model="fake",
                              draft_model="fake", max_draft=2,
                              max_new_tokens=8))
    eng.generate("warmup prompt")
    rss0 = _rss_mb()
    t0 = time.perf_counter()
    for i in range(30):
        r = eng.generate(f"prompt {i % 4}")
        assert r["generated_tokens"] > 0
    elapsed = time.perf_counter() - t0
    assert elapsed < 30, f"30 warm generations took {elapsed:.1f}s (recompiling?)"
    assert _rss_mb() - rss0 < 500, "RSS grew >500MB over 30 generations"


@pytest.mark.slow
def test_long_batcher_run():
    eng = Engine(EngineConfig(implementation="fake", base_model="fake",
                              draft_model="fake", max_draft=2,
                              max_new_tokens=16, max_seq_len=256))
    b = ContinuousBatcher(eng, n_slots=4)
    for i in range(40):
        b.submit(f"stress prompt number {i}")
    results = b.run()
    assert len(results) == 40
    assert all(r["generated_tokens"] > 0 for r in results)
