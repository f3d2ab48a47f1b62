"""Automatic prefix caching (paged KV): requests sharing a prompt prefix
reuse its KV pages, and prefill computes the suffix only.

Beyond the reference (no KV reuse across requests there at all) — this is
the vLLM-style serving feature on our paged layout (models/paged.py
PrefixPageCache + core/batching.py make_admit_prefix)."""

import jax
import numpy as np
import pytest

from llm_inference_lab_tpu.config import EngineConfig
from llm_inference_lab_tpu.core.batching import ContinuousBatcher
from llm_inference_lab_tpu.core.engine import Engine
from llm_inference_lab_tpu.models.paged import PrefixPageCache


# ---------------------------------------------------------------- host unit
def test_chain_hash_full_chunks_only():
    c = PrefixPageCache(n_pages=16, page_size=4)
    ids = list(range(10))  # 2 full chunks + partial
    assert len(c.chunk_hashes(ids)) == 2
    # The chain: chunk 2 under a different chunk 1 hashes differently.
    other = [99, 98, 97, 96] + ids[4:]
    assert c.chunk_hashes(ids)[1] != c.chunk_hashes(other)[1]


def test_match_register_refcount_cycle():
    c = PrefixPageCache(n_pages=16, page_size=4)
    ids = list(range(12))
    pages = c.alloc(4)  # 3 prompt pages + headroom
    c.register(ids, pages, reuse_len=0)
    # Second request with the same prompt: full chunks up to plen-2 reuse.
    shared, reuse = c.match(ids, len(ids) - 2)
    assert reuse == 8 and shared == pages[:2]  # cap 10 tokens -> 2 chunks
    # Refcounts: registered(1) + match(1) = 2 on the shared pages.
    c.free(shared)  # second request retires
    c.free(pages)  # first request retires (all its pages)
    # All registered pages now refcount 0 but still cached (resident).
    assert c.reclaimable_pages == 3
    shared2, reuse2 = c.match(ids, len(ids) - 2)
    assert reuse2 == 8  # still served from cache after both freed


def test_lru_eviction_under_pressure():
    c = PrefixPageCache(n_pages=5, page_size=4)  # page 0 reserved -> 4 usable
    a = c.alloc(2)
    c.register(list(range(8)), a, 0)
    c.free(a)  # cached, refcount 0
    b = c.alloc(2)
    c.register(list(range(100, 108)), b, 0)
    c.free(b)
    # Pool exhausted (4 cached pages); a new alloc must evict the LRU pair.
    fresh = c.alloc(2)
    assert fresh is not None
    # Oldest (a's) hashes are gone; b's may survive.
    shared, reuse = c.match(list(range(8)), 8)
    assert reuse == 0


def test_match_respects_cap():
    c = PrefixPageCache(n_pages=16, page_size=4)
    ids = list(range(8))
    pages = c.alloc(2)
    c.register(ids, pages, 0)
    shared, reuse = c.match(ids, len(ids) - 2)  # cap 6 -> only 1 full chunk
    assert reuse == 4 and len(shared) == 1


# ------------------------------------------------------------------ engine
def _engine(prefix: bool, draft: bool = True, **kw):
    return Engine(
        EngineConfig(
            base_model="llama-tiny",
            draft_model="llama-tiny" if draft else None,
            implementation="hf",
            max_draft=2,
            max_new_tokens=8,
            max_seq_len=256,
            dtype="float32",
            kv_layout="paged",
            kv_page_size=16,
            prefix_caching=prefix,
            **kw,
        )
    )


# Short enough (ByteTokenizer: 1 token/char) to never hit submit()'s
# max_new-dependent truncation, long enough for several 16-token pages.
LONG = "the quick brown fox jumps over the lazy dog and then " * 3


def test_prefix_cached_repeat_matches_uncached():
    """Same prompt twice: the second admission reuses prefix pages and
    produces byte-identical greedy output."""
    base = ContinuousBatcher(_engine(False), n_slots=2)
    for _ in range(2):
        base.submit(LONG)
    expected = [r["generated_ids"] for r in base.run()]
    assert expected[0] == expected[1]

    b = ContinuousBatcher(_engine(True), n_slots=1)  # serialize admissions
    r1 = b.submit(LONG)
    out1 = b.run()
    r2 = b.submit(LONG)
    out2 = b.run()
    assert out1[0]["generated_ids"] == expected[0]
    assert out2[-1]["generated_ids"] == expected[1]
    assert out1[0]["prompt_tokens_reused"] == 0
    assert out2[-1]["prompt_tokens_reused"] > 0
    assert b.allocator.hits > 0


def test_shared_prefix_different_suffixes():
    """Two prompts sharing a long common prefix: cached run == uncached."""
    p1 = LONG + "ending one"
    p2 = LONG + "a different ending entirely"
    base = ContinuousBatcher(_engine(False), n_slots=2)
    ids = [base.submit(p) for p in (p1, p2)]
    expected = {r["req_id"]: r["generated_ids"] for r in base.run()}

    b = ContinuousBatcher(_engine(True), n_slots=1)
    got = {}
    for p in (p1, p2):
        rid = b.submit(p)
        got.update({r["req_id"]: r for r in b.run() if r["req_id"] == rid})
    assert got[0]["generated_ids"] == expected[0]
    assert got[1]["generated_ids"] == expected[1]
    assert got[1]["prompt_tokens_reused"] > 0


def test_concurrent_shared_pages_survive_retirement():
    """A page shared by two in-flight requests stays valid when one
    retires first (refcounting, no reuse-after-free)."""
    eng = _engine(True, draft=False)
    base = ContinuousBatcher(_engine(False, draft=False), n_slots=1)
    base.submit(LONG)
    expected = base.run()[0]["generated_ids"]

    b = ContinuousBatcher(eng, n_slots=2)
    b.submit(LONG)
    b.run()
    # Two concurrent requests now both reuse the cached prefix.
    b.submit(LONG, max_new_tokens=4)  # rid 1, retires earlier
    b.submit(LONG)  # rid 2
    out = {r["req_id"]: r for r in b.run()}
    assert out[1]["prompt_tokens_reused"] > 0
    assert out[2]["prompt_tokens_reused"] > 0
    assert out[1]["generated_ids"] == expected[:4]
    assert out[2]["generated_ids"] == expected


def test_prefix_caching_with_ngram_drafting():
    """Draft-model-free mode (ngram) + prefix caching: outputs match the
    plain engine."""
    eng = _engine(True, draft=False)
    single = Engine(
        EngineConfig(
            base_model="llama-tiny", draft_model=None, implementation="hf",
            max_new_tokens=8, max_seq_len=256, dtype="float32",
        )
    ).generate(LONG)["generated_ids"]
    b = ContinuousBatcher(eng, n_slots=1)
    b.submit(LONG)
    b.run()
    b.submit(LONG)
    out = b.run()
    assert out[-1]["generated_ids"] == single
    assert out[-1]["prompt_tokens_reused"] > 0
