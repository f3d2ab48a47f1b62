"""Continuous-batching tests (reference: SequencePool scheduling semantics,
tests via src/specdec/core/sequence_pool.py + batch EOS retirement)."""

import pytest

from llm_inference_lab_tpu.config import EngineConfig
from llm_inference_lab_tpu.core.batching import ContinuousBatcher
from llm_inference_lab_tpu.core.engine import Engine
from llm_inference_lab_tpu.utils.sequence import group_by_length


def make_engine(**kw):
    defaults = dict(implementation="fake", base_model="fake", draft_model="fake",
                    max_draft=2, max_new_tokens=8, max_seq_len=256)
    defaults.update(kw)
    return Engine(EngineConfig(**defaults))


def test_batcher_drains_queue_larger_than_slots():
    eng = make_engine()
    b = ContinuousBatcher(eng, n_slots=2)
    prompts = [f"prompt number {i}" for i in range(5)]
    ids = [b.submit(p) for p in prompts]
    results = b.run()
    assert len(results) == 5
    assert [r["req_id"] for r in results] == sorted(ids)
    for r in results:
        assert 0 < r["generated_tokens"] <= 8


def test_batcher_matches_engine_output():
    """Slot decode must produce the same tokens as plain generate (greedy)."""
    eng = make_engine()
    single = eng.generate("consistency prompt")["generated_ids"]
    b = ContinuousBatcher(eng, n_slots=2)
    b.submit("consistency prompt")
    out = b.run()
    assert out[0]["generated_ids"] == single


def test_batcher_mixed_lengths():
    eng = make_engine()
    b = ContinuousBatcher(eng, n_slots=3)
    for p in ["a", "bb" * 30, "c" * 10, "dd"]:
        b.submit(p)
    results = b.run()
    assert len(results) == 4


def test_batcher_incremental_submission():
    eng = make_engine()
    b = ContinuousBatcher(eng, n_slots=2)
    b.submit("first")
    b.run()
    b.submit("second")  # submit after a drain: slots must be reusable
    out = b.run()
    assert len(out) == 2  # run() returns all completed so far


def test_group_by_length():
    groups = group_by_length([5, 5, 5, 9, 9, 2], max_group_size=2)
    assert all(len(g) <= 2 for g in groups)
    flat = sorted(i for g in groups for i in g)
    assert flat == [0, 1, 2, 3, 4, 5]
    # Same-length sequences batch together first.
    assert [0, 1] in groups or [1, 0] in groups
