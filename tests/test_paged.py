"""Paged KV cache tests (north-star SURVEY §7 item 4b; the reference has no
paged KV — serving memory there is slots x max_seq regardless of load)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_inference_lab_tpu.config import EngineConfig
from llm_inference_lab_tpu.core.batching import ContinuousBatcher
from llm_inference_lab_tpu.core.engine import Engine
from llm_inference_lab_tpu.models.paged import (
    PageAllocator,
    PagedKVCache,
    gather_pages,
    update_paged_layer,
)


def test_update_then_gather_roundtrip():
    """Rows scattered into pages must read back contiguously at their
    absolute positions."""
    N, KVH, P, D, B, S = 7, 2, 8, 4, 2, 3
    rng = np.random.default_rng(0)
    k_pool = jnp.zeros((N, KVH, P, D), jnp.float32)
    v_pool = jnp.zeros((N, KVH, P, D), jnp.float32)
    ks = jnp.ones((N, KVH, P), jnp.float32)
    vs = jnp.ones((N, KVH, P), jnp.float32)
    # seq0 owns pages [1, 2]; seq1 owns pages [3, 4]
    table = jnp.array([[1, 2, 0], [3, 4, 0]], jnp.int32)
    k_new = jnp.asarray(rng.normal(size=(B, S, KVH, D)), jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(B, S, KVH, D)), jnp.float32)
    start = jnp.array([6, 1], jnp.int32)  # seq0 writes across a page boundary

    k_pool, v_pool, ks, vs = update_paged_layer(
        k_pool, v_pool, ks, vs, k_new, v_new, start, table
    )
    k_seq = gather_pages(k_pool, table)  # [B, KVH, 24, D]
    for b in range(B):
        for s in range(S):
            pos = int(start[b]) + s
            np.testing.assert_allclose(
                np.asarray(k_seq[b, :, pos]), np.asarray(k_new[b, s]), rtol=1e-6
            )


@pytest.mark.parametrize("quant", [None, "int8"])
def test_paged_engine_matches_contiguous(quant):
    """generate_batch output with kv_layout='paged' must equal the
    contiguous layout exactly (greedy)."""
    common = dict(
        base_model="llama-tiny", draft_model="llama-tiny", implementation="hf",
        max_draft=3, max_new_tokens=16, max_seq_len=256, dtype="float32",
        kv_quantization=quant,
    )
    cont = Engine(EngineConfig(**common))
    paged = Engine(EngineConfig(**common, kv_layout="paged", kv_page_size=64))
    prompts = ["paged equivalence check", "second prompt with more words here"]
    r_c = cont.generate_batch(prompts)
    r_p = paged.generate_batch(prompts)
    for a, b in zip(r_c, r_p):
        assert a["generated_ids"] == b["generated_ids"]


def test_paged_batcher_matches_contiguous():
    common = dict(
        base_model="llama-tiny", draft_model="llama-tiny", implementation="hf",
        max_draft=2, max_new_tokens=8, max_seq_len=256, dtype="float32",
    )
    cont = Engine(EngineConfig(**common))
    single = cont.generate("paged serving check")["generated_ids"]
    paged = Engine(EngineConfig(**common, kv_layout="paged", kv_page_size=64))
    b = ContinuousBatcher(paged, n_slots=2)
    for i in range(3):
        b.submit("paged serving check")
    out = b.run()
    assert len(out) == 3
    for r in out:
        assert r["generated_ids"] == single


def test_paged_memory_aware_admission():
    """With a pool smaller than the queue's demand, requests wait for pages
    and all still complete; the allocator ends with everything freed."""
    eng = Engine(EngineConfig(
        base_model="llama-tiny", draft_model="llama-tiny", implementation="hf",
        max_draft=2, max_new_tokens=8, max_seq_len=256, dtype="float32",
        kv_layout="paged", kv_page_size=64,
        kv_pages=5,  # 4 usable pages: one request needs ~2 -> 2 in flight max
    ))
    b = ContinuousBatcher(eng, n_slots=4)
    for i in range(5):
        b.submit(f"memory pressure {i}")
    out = b.run()
    assert len(out) == 5
    assert b.allocator.free_pages == 4  # all pages returned
    # With 4 usable pages and 2 pages/request, at most 2 ran concurrently.
    assert all(r["generated_tokens"] > 0 for r in out)


def test_paged_empty_slot_does_not_poison_occupied():
    """Regression: an EMPTY slot (position -1, all attention lanes masked)
    used to produce NaN attention output, write NaN KV into the shared
    dummy page 0, and poison every other slot's value sum (0-weight x NaN
    = NaN). A single request in a 2-slot paged batcher must decode exactly
    like in a 1-slot batcher."""
    def run(n_slots):
        eng = Engine(EngineConfig(
            base_model="llama-tiny", draft_model=None, implementation="hf",
            max_new_tokens=8, max_seq_len=256, dtype="float32",
            kv_layout="paged", kv_page_size=64,
        ))
        b = ContinuousBatcher(eng, n_slots=n_slots)
        b.submit("empty slot nan regression")
        return b.run()[0]["generated_ids"]

    assert run(2) == run(1)


def test_paged_kv_verify_aligned():
    from llm_inference_lab_tpu.config import EnvFlags

    eng = Engine(
        EngineConfig(
            base_model="llama-tiny", draft_model="llama-tiny",
            implementation="hf", max_draft=2, max_new_tokens=8,
            dtype="float32", kv_layout="paged", kv_page_size=64,
        ),
        flags=EnvFlags(debug_kv_verify=True),
    )
    r = eng.generate("paged kv verify")
    assert r["kv_verify"]["aligned"], r["kv_verify"]


def test_allocator():
    a = PageAllocator(8, 64)
    assert a.free_pages == 7  # page 0 reserved as dummy
    p1 = a.alloc(3)
    assert len(p1) == 3 and 0 not in p1
    assert a.alloc(5) is None  # only 4 left
    a.free(p1)
    assert a.free_pages == 7
    assert a.pages_needed(1) == 1 and a.pages_needed(65) == 2


def test_tree_mode_accepts_paged():
    """Round-4: tree speculation composes with paged KV (the engine used
    to refuse; correctness parity lives in tests/test_treespec.py
    test_tree_paged_matches_contiguous). The FAKE model still has no paged
    write path, so construction must succeed with the hf implementation."""
    eng = Engine(EngineConfig(
        implementation="hf", base_model="llama-tiny", draft_model=None,
        draft_mode="tree", kv_layout="paged", kv_page_size=16,
        dtype="float32", max_seq_len=128, max_new_tokens=4,
    ))
    assert eng.generate("tree paged ok")["generated_tokens"] > 0


def test_retired_slot_cannot_corrupt_reused_pages():
    """Regression: a retired slot's lane still rides every compiled step
    and junk-writes K+1 KV rows at its stale (length-1) offset. Before the
    fix, its stale page-table row aimed those writes into FREED pages —
    observed overwriting a new request's prompt KV (rows at the stale
    offsets changed mid-decode). Retirement now zeroes the slot's table
    rows so junk lands in the reserved dummy page 0."""
    eng = Engine(EngineConfig(
        implementation="hf", base_model="llama-tiny",
        draft_model="llama-tiny", max_draft=3, max_new_tokens=24,
        kv_layout="paged", kv_page_size=16, max_seq_len=256,
        dtype="float32", kv_pages=64,
    ))
    b = ContinuousBatcher(eng, n_slots=3)
    b.submit("short one")
    b.submit("short two here")
    b.run()  # both retire; their pages return to the free list
    tbl = np.asarray(b.state.target_cache.table)
    assert (tbl[:2] == 0).all(), "retired table rows must be cleared"
    # New request reuses the freed pages; decode must leave its prompt KV
    # untouched by the (still-stepping) inactive lanes.
    rid = b.submit("probe " * 10)
    b._admit_pending()
    slot = next(i for i, r in enumerate(b._slots) if r is not None)
    row = np.asarray(b.state.target_cache.table)[slot]
    first_page = int(row[0])
    assert first_page != 0
    before = np.asarray(b.state.target_cache.k[0, first_page]).copy()
    b.step_chunk(2)
    after = np.asarray(b.state.target_cache.k[0, first_page])
    plen = len(b._slots[slot].ids)
    guard = min(16, plen)  # page rows holding prompt KV must be stable
    np.testing.assert_array_equal(before[:, :guard], after[:, :guard])
    # and the request still completes correctly
    res = {r["req_id"]: r for r in b.run()}[rid]
    assert res["generated_tokens"] > 0


def test_paged_gemma2_matches_contiguous():
    """gemma2-tiny (BINDING sliding window 16 + softcap + alternating
    local/global layers + query_pre_attn_scalar) through the paged layout
    must equal the contiguous layout exactly — this config raised
    NotImplementedError before the paged window/softcap support."""
    common = dict(
        base_model="gemma2-tiny", draft_model=None, implementation="hf",
        max_new_tokens=12, max_seq_len=64, dtype="float32",
    )
    cont = Engine(EngineConfig(**common))
    paged = Engine(EngineConfig(**common, kv_layout="paged", kv_page_size=16))
    prompts = ["paged gemma2 window check", "short"]
    r_c = cont.generate_batch(prompts)
    r_p = paged.generate_batch(prompts)
    for a, b in zip(r_c, r_p):
        assert a["generated_ids"] == b["generated_ids"]
