"""Quantization quality gates (BASELINE.json: quantized perplexity within
0.1 of the full-precision model; reference quality harness:
src/benchmarks/quality_eval.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_inference_lab_tpu.bench.quality_eval import (
    PerplexityEvaluator,
    perplexity_delta,
)
from llm_inference_lab_tpu.models.llama import LlamaModel
from llm_inference_lab_tpu.ops.quant import quantize_params


def tiny(dtype=jnp.float32):
    return LlamaModel.create("llama-tiny", rng=jax.random.PRNGKey(3), dtype=dtype)


def quantized_clone(model, mode):
    m = dataclasses.replace(model)
    m.params = quantize_params(model.params, mode, min_size=1024)
    return m


@pytest.fixture(scope="module")
def token_batches():
    rng = np.random.default_rng(0)
    return [rng.integers(1, 255, (24,)).tolist() for _ in range(3)]


def test_perplexity_evaluator_basic(token_batches):
    ev = PerplexityEvaluator(tiny())
    ppl = ev.perplexity_ids(token_batches[0])
    assert np.isfinite(ppl) and ppl > 1.0


def test_int8_ppl_delta_small(token_batches):
    fp = tiny()
    q = quantized_clone(fp, "int8")
    out = perplexity_delta(fp, q, token_batches)
    # Random tiny model ppl ~ vocab size; int8 per-channel should stay tight.
    assert abs(out["delta"]) / out["ppl_a"] < 0.02, out


def test_int4_ppl_delta_bounded(token_batches):
    fp = tiny()
    q = quantized_clone(fp, "int4")
    out = perplexity_delta(fp, q, token_batches)
    assert abs(out["delta"]) / out["ppl_a"] < 0.15, out


def test_quantized_generation_runs():
    from llm_inference_lab_tpu.config import EngineConfig
    from llm_inference_lab_tpu.core.engine import Engine

    eng = Engine(
        EngineConfig(base_model="llama-tiny", draft_model="llama-tiny",
                     implementation="hf", max_draft=2, max_new_tokens=8,
                     quantization="int8", dtype="float32"),
    )
    r = eng.generate("quantized engine")
    assert r["generated_tokens"] > 0
    assert r["quantization"] == "int8"


def test_quantize_params_skips_small_and_norms():
    m = tiny()
    q = quantize_params(m.params, "int8", min_size=1 << 62)  # nothing big enough
    chex = jax.tree_util.tree_structure(q)
    assert chex == jax.tree_util.tree_structure(m.params)
