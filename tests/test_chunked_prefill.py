"""Chunked prefill must be observationally identical to single-shot prefill
(long-context axis: bounded activation memory for >=16k prompts; the
reference has no chunked prefill — hf_wrappers.py:98 runs one sdpa over the
whole prompt)."""

import jax
import pytest

from llm_inference_lab_tpu.config import EngineConfig
from llm_inference_lab_tpu.core.engine import Engine
from llm_inference_lab_tpu.models.llama import LlamaModel

PROMPT = "chunked prefill equivalence check " * 6  # ~200 byte-tokens


def tiny(seed=0):
    return LlamaModel.create("llama-tiny", rng=jax.random.PRNGKey(seed),
                             dtype=jax.numpy.float32)


def gen(chunk, **kw):
    cfg = dict(implementation="hf", max_draft=3, max_new_tokens=16,
               dtype="float32", prefill_chunk=chunk)
    cfg.update(kw)
    draft = None if cfg.get("draft_mode") else tiny(0)
    eng = Engine(EngineConfig(**cfg), target_model=tiny(0), draft_model=draft)
    return eng.generate(PROMPT)


def test_chunked_prefill_matches_single_shot():
    want = gen(None)
    got = gen(64)
    assert got["generated_ids"] == want["generated_ids"]
    assert got["acceptance_rate"] > 0.95  # same-weights draft still accepted


def test_chunked_prefill_medusa_hidden_carry():
    """Medusa mode consumes the prefill's last-hidden carry; the chunked
    scan must select the same row (plen-2) across chunk boundaries."""
    want = gen(None, draft_mode="medusa", max_draft=2)
    got = gen(64, draft_mode="medusa", max_draft=2)
    assert got["generated_ids"] == want["generated_ids"]


def test_chunked_prefill_ragged_batch():
    """Rows whose prompts end mid-chunk (and a row shorter than one chunk)
    must carry the right hidden row and lengths."""
    prompts = [PROMPT, "short", PROMPT[:90]]
    cfgs = dict(implementation="hf", max_draft=3, max_new_tokens=12,
                dtype="float32")
    eng_a = Engine(EngineConfig(**cfgs), target_model=tiny(0),
                   draft_model=tiny(0))
    eng_b = Engine(EngineConfig(prefill_chunk=64, **cfgs),
                   target_model=tiny(0), draft_model=tiny(0))
    ra = eng_a.generate_batch(prompts)
    rb = eng_b.generate_batch(prompts)
    for a, b in zip(ra, rb):
        assert a["generated_ids"] == b["generated_ids"]


def test_short_prompt_skips_chunking():
    """P <= chunk takes the single-shot path (no padding blowup)."""
    cfgs = dict(implementation="hf", max_draft=3, max_new_tokens=8,
                dtype="float32", prefill_chunk=512)
    eng = Engine(EngineConfig(**cfgs), target_model=tiny(0),
                 draft_model=tiny(0))
    r = eng.generate("short prompt")
    assert r["generated_tokens"] > 0
