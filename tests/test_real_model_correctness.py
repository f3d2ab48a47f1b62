"""The load-bearing correctness invariant on REAL transformer weights:
greedy speculative decoding must produce EXACTLY the target model's own
greedy continuation, regardless of the draft (reference invariant: accepted
tokens are base-model tokens, pipeline.py:3039-3061)."""

import jax
import jax.numpy as jnp
import pytest

from llm_inference_lab_tpu.config import EngineConfig
from llm_inference_lab_tpu.core.engine import Engine
from llm_inference_lab_tpu.models.llama import LlamaModel


def tiny(seed, dtype=jnp.float32):
    return LlamaModel.create("llama-tiny", rng=jax.random.PRNGKey(seed), dtype=dtype)


def gen_ids(engine, prompt="real model invariant check", n=24):
    return engine.generate(prompt, max_new_tokens=n)["generated_ids"]


@pytest.fixture(scope="module")
def baseline_ids():
    eng = Engine(
        EngineConfig(implementation="hf", draft_model=None, max_new_tokens=24,
                     dtype="float32"),
        target_model=tiny(0),
    )
    return gen_ids(eng)


def test_same_model_draft_full_acceptance(baseline_ids):
    eng = Engine(
        EngineConfig(implementation="hf", max_draft=3, max_new_tokens=24,
                     dtype="float32"),
        target_model=tiny(0),
        draft_model=tiny(0),  # identical weights
    )
    r = eng.generate("real model invariant check", max_new_tokens=24)
    assert r["generated_ids"] == baseline_ids
    assert r["acceptance_rate"] > 0.95  # identical models agree everywhere


def test_different_draft_same_output(baseline_ids):
    eng = Engine(
        EngineConfig(implementation="hf", max_draft=3, max_new_tokens=24,
                     dtype="float32"),
        target_model=tiny(0),
        draft_model=tiny(99),  # unrelated random draft
    )
    r = eng.generate("real model invariant check", max_new_tokens=24)
    assert r["generated_ids"] == baseline_ids  # verification guarantees this
    # (No acceptance-rate assertion: tiny random models tend to share a
    # repeating-token attractor, so even an unrelated draft can be accepted —
    # the output equality above is the invariant that matters.)


@pytest.mark.parametrize("mode", ["medusa", "eagle", "tree"])
def test_head_modes_same_output(baseline_ids, mode):
    eng = Engine(
        EngineConfig(implementation="hf", draft_model=None, draft_mode=mode,
                     max_draft=2, max_new_tokens=24, dtype="float32"),
        target_model=tiny(0),
    )
    assert gen_ids(eng) == baseline_ids


def test_kv_quant_small_divergence(baseline_ids):
    """int8 KV cache may flip a token eventually, but early tokens should
    match (error is ~1%)."""
    eng = Engine(
        EngineConfig(implementation="hf", draft_model=None, max_new_tokens=24,
                     dtype="float32", kv_quantization="int8"),
        target_model=tiny(0),
    )
    ids = gen_ids(eng)
    agree_prefix = 0
    for a, b in zip(ids, baseline_ids):
        if a != b:
            break
        agree_prefix += 1
    assert agree_prefix >= 4, (ids[:8], baseline_ids[:8])
