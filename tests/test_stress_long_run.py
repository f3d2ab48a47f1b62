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


def test_stress_churn_hundreds_of_steps():
    """The real harness (bench/stress.py): 120 requests with skewed prompt
    lengths and mixed 2..32-token budgets arriving over time — hundreds of
    decode steps with constant admission/retirement churn. Bounds: every
    request completes non-empty, RSS growth stays bounded, and late-run poll
    latency does not degrade vs early-run (no leak-driven slowdown).
    Reference stress model: /root/reference/tests/stress_test_long_run.py
    (hundreds of steps, memory + responsiveness bounds)."""
    from llm_inference_lab_tpu.bench.stress import StressConfig, run_stress

    eng = Engine(EngineConfig(implementation="fake", base_model="fake",
                              draft_model="fake", max_draft=2,
                              max_new_tokens=32, max_seq_len=256))
    report = run_stress(
        eng,
        StressConfig(total_requests=120, n_slots=4, prompt_len_cap=120,
                     max_wall_s=240.0),
    )
    assert report["completed"] == 120
    assert report["all_nonempty"]
    # decode_steps counts device-EXECUTED steps (polls resync stats.steps
    # from the state's step counter; the dispatched chunk bound used to
    # inflate this by the early-exit gap — round-4 ADVICE #4).
    assert report["decode_steps"] >= 150, report["decode_steps"]
    assert report["rss_growth_mb"] < 600, report["rss_growth_mb"]
    assert report["latency_degradation"] < 2.5, report["latency_degradation"]


def test_stress_churn_paged():
    """Same churn through the paged-KV serving path with a page pool sized
    BELOW slots x max_seq (memory-aware admission must queue, not fail)."""
    import jax

    from llm_inference_lab_tpu.bench.stress import StressConfig, run_stress
    from llm_inference_lab_tpu.models.llama import LlamaModel

    def tiny(seed):
        return LlamaModel.create("llama-tiny", rng=jax.random.PRNGKey(seed),
                                 dtype=jax.numpy.float32)

    eng = Engine(EngineConfig(implementation="hf", max_draft=2,
                              max_new_tokens=16, max_seq_len=256,
                              dtype="float32",
                              kv_layout="paged", kv_page_size=32,
                              kv_pages=3 * (256 // 32)),  # 3 full seqs / 4 slots
                 target_model=tiny(0), draft_model=tiny(1))
    report = run_stress(
        eng,
        StressConfig(total_requests=30, n_slots=4, prompt_len_cap=100,
                     max_new_choices=(2, 4, 8, 16), max_wall_s=240.0),
    )
    assert report["completed"] == 30
    assert report["all_nonempty"]
