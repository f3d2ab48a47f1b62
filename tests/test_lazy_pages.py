"""Lazy paged allocation + preemption (round-3 VERDICT item 4).

Worst-case reservation (kv_lazy_pages=False) holds prompt+max_new+K+2 pages
for a request's whole lifetime; lazy allocation reserves prompt+margin and
grows on demand, preempting the youngest slot (resume by recompute) when the
pool runs dry. vLLM-grade behavior the reference never had (it has no paged
KV at all — SURVEY.md §2.5)."""

import numpy as np
import pytest

from llm_inference_lab_tpu.config import EngineConfig
from llm_inference_lab_tpu.core.batching import ContinuousBatcher
from llm_inference_lab_tpu.core.engine import Engine


def _engine(lazy: bool, kv_pages, max_new=48, max_draft=2):
    return Engine(EngineConfig(
        base_model="llama-tiny", draft_model=None, implementation="hf",
        max_draft=max_draft, max_new_tokens=max_new, max_seq_len=256,
        dtype="float32", kv_layout="paged", kv_page_size=16,
        kv_pages=kv_pages, kv_lazy_pages=lazy,
    ))


def _reference_ids(prompts, max_new=48):
    """Uninterrupted single-slot runs on a roomy pool: the ground truth the
    lazy/preempted runs must reproduce exactly (greedy, deterministic)."""
    eng = _engine(lazy=False, kv_pages=None, max_new=max_new)
    return [eng.generate(p, max_new_tokens=max_new)["generated_ids"]
            for p in prompts]


def test_lazy_admits_where_eager_refuses():
    """Worst-case reservation refuses the second request (pool < 2x the
    full budget); lazy admission runs both concurrently from the start."""
    prompts = ["lazy pages alpha", "lazy pages beta"]
    # One request's worst case: ~5 + 48 + 2 + 2 = ~57 tokens -> 4 pages of
    # 16. Pool of 7 usable pages fits one reservation, not two.
    eager = ContinuousBatcher(_engine(lazy=False, kv_pages=8), n_slots=2)
    for p in prompts:
        eager.submit(p)
    eager._admit_pending()
    assert sum(s is not None for s in eager._slots) == 1  # one waits

    lazy = ContinuousBatcher(_engine(lazy=True, kv_pages=8), n_slots=2)
    for p in prompts:
        lazy.submit(p)
    lazy._admit_pending()
    assert sum(s is not None for s in lazy._slots) == 2  # both admitted

    out = {r["req_id"]: r for r in lazy.run()}
    ref = _reference_ids(prompts)
    for rid, want in enumerate(ref):
        assert out[rid]["generated_ids"] == want
    # Everything returned to the pool.
    assert lazy.allocator.free_pages == 7


def test_growth_without_preemption_matches_eager():
    """Roomy pool: lazy growth happens (page_grows > 0) but no preemption;
    outputs equal the eager run exactly."""
    prompts = ["grow check one", "grow check two longer prompt"]
    lazy = ContinuousBatcher(_engine(lazy=True, kv_pages=None), n_slots=2)
    for p in prompts:
        lazy.submit(p)
    out = {r["req_id"]: r for r in lazy.run()}
    assert lazy.stats.page_grows > 0
    assert lazy.stats.preemptions == 0
    for rid, want in enumerate(_reference_ids(prompts)):
        assert out[rid]["generated_ids"] == want


def test_preemption_resumes_by_recompute():
    """Pool too small for both requests' full growth: the youngest slot is
    preempted mid-decode, requeued, and resumes by recomputing its
    prompt+generated context — final outputs still equal uninterrupted
    greedy decoding."""
    prompts = ["preempt victim check", "preempt survivor check"]
    b = ContinuousBatcher(_engine(lazy=True, kv_pages=8), n_slots=2)
    for p in prompts:
        b.submit(p)
    out = {r["req_id"]: r for r in b.run()}
    assert b.stats.preemptions >= 1
    for rid, want in enumerate(_reference_ids(prompts)):
        assert out[rid]["generated_ids"] == want, rid
    assert b.allocator.free_pages == 7


def test_lazy_serving_memory_is_live_tokens():
    """The admission footprint is prompt+margin pages, not the worst-case
    budget — kv_pages is a true live-token budget under lazy allocation."""
    b = ContinuousBatcher(_engine(lazy=True, kv_pages=None, max_new=128),
                          n_slots=2)
    b.submit("tiny prompt")
    b._admit_pending()
    req = next(r for r in b._slots if r is not None)
    # Worst case would be ceil((~4+128+4)/16) ~ 9 pages; the lazy margin
    # (2*poll*commit + K + 2) keeps it at 2.
    assert len(req.pages) <= 3, len(req.pages)


def test_preemption_with_prefix_caching():
    """Preempting a prefix-cached request must unwind refcounts cleanly and
    still produce correct resumed output."""
    shared = "common system prefix " * 8  # > page-size tokens shared
    prompts = [shared + "tail A", shared + "tail B"]
    eng = Engine(EngineConfig(
        base_model="llama-tiny", draft_model=None, implementation="hf",
        max_draft=2, max_new_tokens=48, max_seq_len=512, dtype="float32",
        kv_layout="paged", kv_page_size=16, kv_pages=16,
        kv_lazy_pages=True, prefix_caching=True,
    ))
    b = ContinuousBatcher(eng, n_slots=2)
    for p in prompts:
        b.submit(p)
    out = {r["req_id"]: r for r in b.run()}
    ref_eng = Engine(EngineConfig(
        base_model="llama-tiny", draft_model=None, implementation="hf",
        max_draft=2, max_new_tokens=48, max_seq_len=512, dtype="float32",
    ))
    for rid, p in enumerate(prompts):
        want = ref_eng.generate(p, max_new_tokens=48)["generated_ids"]
        assert out[rid]["generated_ids"] == want, rid
