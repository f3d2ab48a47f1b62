"""Embedding/lm_head quantization tests (EmbedQuant int8 / EmbedQuant4)."""

import jax
import jax.numpy as jnp
import numpy as np

from llm_inference_lab_tpu.config import EngineConfig
from llm_inference_lab_tpu.core.engine import Engine
from llm_inference_lab_tpu.models.llama import LlamaModel
from llm_inference_lab_tpu.ops.quant import (
    EmbedQuant,
    EmbedQuant4,
    quantize_embed,
    quantize_embed4,
    quantize_params,
)


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


def test_embed4_lookup_roundtrip():
    rng = np.random.default_rng(2)
    e = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    eq = quantize_embed4(e)
    assert eq.shape == (64, 16)
    toks = jnp.asarray([[1, 5, 63], [0, 2, 7]], jnp.int32)
    got = eq.lookup(toks, jnp.float32)
    want = e[np.asarray(toks)]
    # int4 per-row: tolerance is amax/7 per element (vs /127 for int8).
    amax = np.abs(np.asarray(e)).max(axis=1)[np.asarray(toks)]
    assert np.abs(np.asarray(got) - want).max() <= (amax / 14 + 1e-6).max()


def test_embed4_head_logits_close():
    rng = np.random.default_rng(3)
    e = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    eq = quantize_embed4(e)
    x = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    got = np.asarray(eq.head_logits(x))
    want = np.asarray(x) @ np.asarray(e).T
    # int4 error bound: each of the d=16 terms carries up to
    # |x| * scale/2 of rounding; bound with the worst row scale.
    bound = (
        np.abs(np.asarray(x)).sum(-1, keepdims=True)
        * (np.abs(np.asarray(e)).max(axis=1) / 14)[None, :]
    )
    assert (np.abs(got - want) <= bound + 1e-4).all()


def test_embed4_lookup_head_consistent():
    # The SAME dequantized table must feed both paths: lookup(t) dotted
    # with x must equal head_logits(x)[t] exactly (one weight, two reads).
    rng = np.random.default_rng(4)
    e = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
    eq = quantize_embed4(e)
    x = jnp.asarray(rng.normal(size=(1, 16)).astype(np.float32))
    rows = eq.lookup(jnp.arange(32, dtype=jnp.int32)[None], jnp.float32)[0]
    via_lookup = np.asarray(x) @ np.asarray(rows).T
    via_head = np.asarray(eq.head_logits(x))
    np.testing.assert_allclose(via_lookup, via_head, atol=1e-3, rtol=1e-4)


def test_quantize_params_embed_bits4():
    m = LlamaModel.create("llama-tiny", rng=jax.random.PRNGKey(0), dtype=jnp.float32)
    q = quantize_params(m.params, "int4", min_size=1024, include_embed=True,
                        embed_bits=4)
    assert isinstance(q["embed"], EmbedQuant4)


def test_engine_embed_bits4_end_to_end():
    eng = Engine(
        EngineConfig(base_model="llama-tiny", draft_model="llama-tiny",
                     implementation="hf", max_draft=2, max_new_tokens=8,
                     quantization="int4", quantize_embed=True, embed_bits=4,
                     dtype="float32"),
    )
    r = eng.generate("embed quant int4")
    assert r["generated_tokens"] > 0


def test_quantized_init_embed_bits4():
    from llm_inference_lab_tpu.models import transformer
    from llm_inference_lab_tpu.models.llama import LLAMA_CONFIGS

    cfg = LLAMA_CONFIGS["llama-tiny"]
    params = transformer.init_params_quantized(
        cfg, jax.random.PRNGKey(0), mode="int4", quantize_embed=4
    )
    assert isinstance(params["embed"], EmbedQuant4)
    assert params["embed"].shape == (cfg.vocab_size, cfg.d_model)


def test_checkpoint_roundtrip_embed4(tmp_path):
    from llm_inference_lab_tpu.models.checkpoint import load_params, save_params

    m = LlamaModel.create("llama-tiny", rng=jax.random.PRNGKey(5), dtype=jnp.float32)
    q = quantize_params(m.params, "int4", min_size=1024, include_embed=True,
                        embed_bits=4)
    p = str(tmp_path / "eq4.safetensors")
    save_params(q, p)
    loaded = load_params(p)
    assert isinstance(loaded["embed"], EmbedQuant4)
    np.testing.assert_array_equal(
        np.asarray(q["embed"].qt.data), np.asarray(loaded["embed"].qt.data)
    )


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
