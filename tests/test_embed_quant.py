"""Embedding/lm_head quantization tests (EmbedQuant: per-row int8)."""

import jax
import jax.numpy as jnp
import numpy as np

from llm_inference_lab_tpu.config import EngineConfig
from llm_inference_lab_tpu.core.engine import Engine
from llm_inference_lab_tpu.models.llama import LlamaModel
from llm_inference_lab_tpu.ops.quant import EmbedQuant, quantize_embed, quantize_params


def test_lookup_roundtrip():
    rng = np.random.default_rng(0)
    e = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    eq = quantize_embed(e)
    toks = jnp.asarray([[1, 5, 63]], jnp.int32)
    got = eq.lookup(toks, jnp.float32)
    want = e[toks[0]][None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.03, rtol=0.03)


def test_head_logits_close():
    rng = np.random.default_rng(1)
    e = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    eq = quantize_embed(e)
    x = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    got = eq.head_logits(x)
    want = x @ e.T
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.2, rtol=0.1)
    # Greedy argmax must agree nearly always.
    assert (np.asarray(got).argmax(-1) == np.asarray(want).argmax(-1)).mean() > 0.9


def test_quantize_params_include_embed():
    m = LlamaModel.create("llama-tiny", rng=jax.random.PRNGKey(0), dtype=jnp.float32)
    q = quantize_params(m.params, "int8", min_size=1024, include_embed=True)
    assert isinstance(q["embed"], EmbedQuant)


def test_engine_quantize_embed_end_to_end():
    eng = Engine(
        EngineConfig(base_model="llama-tiny", draft_model="llama-tiny",
                     implementation="hf", max_draft=2, max_new_tokens=8,
                     quantization="int8", quantize_embed=True, dtype="float32"),
    )
    r = eng.generate("embed quant")
    assert r["generated_tokens"] > 0


def test_checkpoint_roundtrip_embed_quant(tmp_path):
    from llm_inference_lab_tpu.models.checkpoint import load_params, save_params

    m = LlamaModel.create("llama-tiny", rng=jax.random.PRNGKey(1), dtype=jnp.float32)
    q = quantize_params(m.params, "int8", min_size=1024, include_embed=True)
    p = str(tmp_path / "eq.safetensors")
    save_params(q, p)
    loaded = load_params(p)
    assert isinstance(loaded["embed"], EmbedQuant)
    np.testing.assert_array_equal(
        np.asarray(q["embed"].q), np.asarray(loaded["embed"].q)
    )
