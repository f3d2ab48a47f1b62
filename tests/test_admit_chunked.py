"""Interleaved (chunked) admission: long prompts prefill into a detached
scratch C tokens per decode chunk (vLLM-style chunked prefill for the
serving path); the final splice is the only DecodeState touch. Outputs
must be bit-identical to one-shot admission, and decoding slots must keep
making progress while a long admission is in flight."""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from llm_inference_lab_tpu.config import EngineConfig
from llm_inference_lab_tpu.core.batching import ContinuousBatcher
from llm_inference_lab_tpu.core.engine import Engine

LONG = "interleaved admission equivalence check " * 6
SHORT = "short req"


def _fake_engine(**kw):
    defaults = dict(implementation="fake", base_model="fake",
                    draft_model="fake", max_draft=3, max_new_tokens=16,
                    max_seq_len=512)
    defaults.update(kw)
    return Engine(EngineConfig(**defaults))


def _drain(b, rids):
    out = {r["req_id"]: r for r in b.run()}
    return [out[r] for r in rids]


def test_incremental_equals_oneshot_contiguous():
    def run(chunk):
        b = ContinuousBatcher(_fake_engine(admit_chunk=chunk), n_slots=2)
        rids = [b.submit(SHORT), b.submit(LONG)]
        return _drain(b, rids)

    (s0, l0), (s1, l1) = run(None), run(64)
    assert s0["generated_ids"] == s1["generated_ids"]
    assert l0["generated_ids"] == l1["generated_ids"]
    np.testing.assert_allclose(
        l0["prompt_logprobs"][1:], l1["prompt_logprobs"][1:], atol=1e-4
    )


def test_incremental_equals_oneshot_paged():
    def run(chunk):
        eng = Engine(EngineConfig(
            implementation="hf", base_model="llama-tiny",
            draft_model="llama-tiny", max_draft=3, max_new_tokens=12,
            kv_layout="paged", kv_page_size=16, max_seq_len=512,
            dtype="float32", admit_chunk=chunk))
        b = ContinuousBatcher(eng, n_slots=2)
        rids = [b.submit(SHORT), b.submit(LONG)]
        return _drain(b, rids)

    (s0, l0), (s1, l1) = run(None), run(64)
    assert s0["generated_ids"] == s1["generated_ids"]
    assert l0["generated_ids"] == l1["generated_ids"]
    np.testing.assert_allclose(
        l0["prompt_logprobs"][1:], l1["prompt_logprobs"][1:], atol=1e-3
    )


def test_decode_progresses_during_long_admission():
    """While the long prompt prefills chunk-by-chunk, the already-running
    slot must commit tokens (the whole point of interleaving)."""
    b = ContinuousBatcher(_fake_engine(admit_chunk=64), n_slots=2)
    b.submit(SHORT)
    b._admit_pending()
    slot0 = next(i for i, r in enumerate(b._slots) if r is not None)
    b.submit(LONG)
    b._admit_pending()  # begins incremental admission
    assert b._prefilling is not None
    len_before = int(np.asarray(b.state.lengths)[slot0])
    b.step_chunk(2)  # decode chunk + ONE admission chunk
    assert b._prefilling is not None  # long admission still in flight
    len_after = int(np.asarray(b.state.lengths)[slot0])
    assert len_after > len_before  # short slot kept decoding


def test_cancel_mid_prefill():
    b = ContinuousBatcher(_fake_engine(admit_chunk=64), n_slots=2)
    rid = b.submit(LONG)
    b._admit_pending()
    assert b._prefilling is not None
    assert b.cancel(rid)
    res = b.run()
    (r,) = [x for x in res if x["req_id"] == rid]
    assert r["finish_reason"] == "cancelled"
    assert b._prefilling is None
    assert all(s is None for s in b._slots)


def test_admit_chunk_bucket_validation():
    with pytest.raises(ValueError):
        ContinuousBatcher(_fake_engine(admit_chunk=48), n_slots=2)


def test_short_prompts_stay_oneshot():
    b = ContinuousBatcher(_fake_engine(admit_chunk=64), n_slots=2)
    b.submit(SHORT)  # shorter than the chunk: one-shot path
    b._admit_pending()
    assert b._prefilling is None
    assert any(r is not None for r in b._slots)
