"""Model correctness: the gold test is incremental-KV == full-context
equivalence — prefill + token-by-token decode must reproduce the same logits
as one full forward (this is what the reference's KV verification debug mode
checks at runtime, src/specdec/core/kv_cache_verification.py:63-189)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_inference_lab_tpu.models.base import KVCache
from llm_inference_lab_tpu.models.gpt2 import GPT2Model
from llm_inference_lab_tpu.models.llama import LLAMA_CONFIGS, LlamaModel
from llm_inference_lab_tpu.models import transformer
from llm_inference_lab_tpu.models.fake import make_fake_model


def tiny_llama():
    return LlamaModel.create("llama-tiny", rng=jax.random.PRNGKey(1), dtype=jnp.float32)


def tiny_gpt2():
    from dataclasses import replace

    from llm_inference_lab_tpu.models.base import Model
    from functools import partial

    cfg = replace(
        LLAMA_CONFIGS["llama-tiny"],
        name="gpt2-tiny",
        arch="gpt2",
        use_learned_pos=True,
        use_bias=True,
        act="gelu",
        n_kv_heads=4,
        max_position_embeddings=128,
        dtype=jnp.float32,
    )
    params = transformer.init_params(cfg, jax.random.PRNGKey(2))
    return Model(config=cfg, params=params, apply_fn=partial(transformer.forward, cfg))


def tiny_opt():
    from dataclasses import replace

    from llm_inference_lab_tpu.models.base import Model
    from functools import partial

    cfg = replace(
        LLAMA_CONFIGS["llama-tiny"],
        name="opt-tiny",
        arch="opt",
        use_learned_pos=True,
        use_bias=True,
        act="relu",
        pos_offset=2,
        n_kv_heads=4,
        max_position_embeddings=128,
        dtype=jnp.float32,
    )
    params = transformer.init_params(cfg, jax.random.PRNGKey(3))
    return Model(config=cfg, params=params, apply_fn=partial(transformer.forward, cfg))


def tiny_qwen():
    """Llama arch + fused qkv bias (Qwen2)."""
    from dataclasses import replace

    from llm_inference_lab_tpu.models.base import Model
    from functools import partial

    cfg = replace(
        LLAMA_CONFIGS["llama-tiny"], name="qwen-tiny", qkv_bias=True,
        dtype=jnp.float32,
    )
    params = transformer.init_params(cfg, jax.random.PRNGKey(4))
    # Non-zero biases so the test exercises them.
    params["layers"]["b_qkv"] = (
        jax.random.normal(jax.random.PRNGKey(5), params["layers"]["b_qkv"].shape)
        * 0.3
    ).astype(jnp.float32)
    return Model(config=cfg, params=params, apply_fn=partial(transformer.forward, cfg))


def tiny_mistral():
    """Llama arch + a sliding window that BINDS at the test lengths."""
    from dataclasses import replace

    from llm_inference_lab_tpu.models.base import Model
    from functools import partial

    cfg = replace(
        LLAMA_CONFIGS["llama-tiny"], name="mistral-tiny", sliding_window=5,
        dtype=jnp.float32,
    )
    params = transformer.init_params(cfg, jax.random.PRNGKey(6))
    return Model(config=cfg, params=params, apply_fn=partial(transformer.forward, cfg))


ALL_ARCHS = [tiny_llama, tiny_gpt2, tiny_opt, tiny_qwen, tiny_mistral]


@pytest.mark.parametrize("factory", ALL_ARCHS)
def test_forward_shapes(factory):
    m = factory()
    B, S, T = 2, 5, 32
    cache = m.init_cache(B, T)
    tokens = jnp.arange(B * S, dtype=jnp.int32).reshape(B, S) % m.config.vocab_size
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    logits, cache2 = m.apply(m.params, tokens, pos, cache, jnp.zeros((B,), jnp.int32))
    assert logits.shape == (B, S, m.config.vocab_size)
    assert logits.dtype == jnp.float32
    assert cache2.k.shape == cache.k.shape


@pytest.mark.parametrize("factory", ALL_ARCHS)
def test_incremental_equals_full(factory):
    """Prefill(T0) + single-token decode steps == one full forward."""
    m = factory()
    B, T = 2, 24
    total = 10
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, m.config.vocab_size, (B, total)), jnp.int32)
    pos_full = jnp.broadcast_to(jnp.arange(total, dtype=jnp.int32)[None], (B, total))

    full_logits, _ = m.apply(
        m.params, tokens, pos_full, m.init_cache(B, T), jnp.zeros((B,), jnp.int32)
    )

    # Prefill first 4, then decode one token at a time.
    split = 4
    cache = m.init_cache(B, T)
    logits_pre, cache = m.apply(
        m.params,
        tokens[:, :split],
        pos_full[:, :split],
        cache,
        jnp.zeros((B,), jnp.int32),
    )
    step_logits = [logits_pre]
    for t in range(split, total):
        lg, cache = m.apply(
            m.params,
            tokens[:, t : t + 1],
            pos_full[:, t : t + 1],
            cache,
            jnp.full((B,), t, jnp.int32),
        )
        step_logits.append(lg)
    inc_logits = jnp.concatenate(step_logits, axis=1)
    np.testing.assert_allclose(
        np.asarray(inc_logits), np.asarray(full_logits), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("factory", ALL_ARCHS)
def test_chunked_decode_matches_single_steps(factory):
    """A K+1-token verify chunk must equal K+1 single-token decodes (the
    correctness core of single-pass verification)."""
    m = factory()
    B, T = 1, 32
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, m.config.vocab_size, (B, 12)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(12, dtype=jnp.int32)[None], (B, 12))

    cache = m.init_cache(B, T)
    _, cache = m.apply(m.params, tokens[:, :6], pos[:, :6], cache, jnp.zeros((B,), jnp.int32))
    chunk_logits, _ = m.apply(
        m.params, tokens[:, 6:12], pos[:, 6:12], cache, jnp.full((B,), 6, jnp.int32)
    )

    cache2 = m.init_cache(B, T)
    _, cache2 = m.apply(m.params, tokens[:, :6], pos[:, :6], cache2, jnp.zeros((B,), jnp.int32))
    singles = []
    for t in range(6, 12):
        lg, cache2 = m.apply(
            m.params, tokens[:, t : t + 1], pos[:, t : t + 1], cache2,
            jnp.full((B,), t, jnp.int32),
        )
        singles.append(lg)
    np.testing.assert_allclose(
        np.asarray(chunk_logits),
        np.asarray(jnp.concatenate(singles, axis=1)),
        rtol=2e-4,
        atol=2e-4,
    )


def test_per_sequence_offsets():
    """Different cache_lens per batch lane write at different offsets."""
    m = tiny_llama()
    B, T = 2, 16
    cache = m.init_cache(B, T)
    tokens = jnp.array([[5], [7]], dtype=jnp.int32)
    lens = jnp.array([3, 9], jnp.int32)
    _, cache2 = m.apply(m.params, tokens, lens[:, None], cache, lens)
    k = np.asarray(cache2.k)  # [L, B, KV, T, D]
    assert np.abs(k[0, 0, :, 3]).sum() > 0 and np.abs(k[0, 0, :, 9]).sum() == 0
    assert np.abs(k[0, 1, :, 9]).sum() > 0 and np.abs(k[0, 1, :, 3]).sum() == 0


def test_fake_model_determinism_and_acceptance_sim():
    m1 = make_fake_model()
    m2 = make_fake_model()
    m3 = make_fake_model(miss_permille=500)
    tokens = jnp.arange(32, dtype=jnp.int32)[None, :]
    pos = jnp.arange(32, dtype=jnp.int32)[None, :]
    lens = jnp.zeros((1,), jnp.int32)
    l1, _ = m1.apply(m1.params, tokens, pos, None, lens)
    l2, _ = m2.apply(m2.params, tokens, pos, None, lens)
    l3, _ = m3.apply(m3.params, tokens, pos, None, lens)
    assert (jnp.argmax(l1, -1) == jnp.argmax(l2, -1)).all()
    assert not (jnp.argmax(l1, -1) == jnp.argmax(l3, -1)).all()


def test_gpt2_factory_smoke():
    m = GPT2Model.create("distilgpt2", rng=jax.random.PRNGKey(0), dtype=jnp.float32)
    assert m.config.n_layers == 6
    assert m.params["embed"].shape == (50257, 768)


def test_gemma_tiny_generates():
    """Gemma wrinkles live end-to-end: decoupled head_dim, embed scale,
    (1+w) norms, GeGLU, MQA."""
    from llm_inference_lab_tpu.config import EngineConfig
    from llm_inference_lab_tpu.core.engine import Engine

    eng = Engine(EngineConfig(base_model="gemma-tiny", draft_model=None,
                              implementation="hf", max_new_tokens=8,
                              max_seq_len=128))
    r = eng.generate("gemma")
    assert r["generated_tokens"] > 0
    r2 = eng.generate("gemma")
    assert r["generated_ids"] == r2["generated_ids"]


def test_gemma2_tiny_generates_spec():
    """Gemma-2 wrinkles through the FULL spec-decode engine: softcaps,
    sandwich norms, alternating binding window (16 < max_seq), decoupled
    attention scale. Lossless: spec output == baseline output."""
    from llm_inference_lab_tpu.config import EngineConfig
    from llm_inference_lab_tpu.core.engine import Engine

    kw = dict(implementation="hf", max_new_tokens=8, max_seq_len=128)
    base = Engine(EngineConfig(base_model="gemma2-tiny", draft_model=None,
                               **kw)).generate("g2")
    spec = Engine(EngineConfig(base_model="gemma2-tiny",
                               draft_model="gemma2-tiny", max_draft=3,
                               **kw)).generate("g2")
    assert base["generated_tokens"] > 0
    assert spec["generated_ids"] == base["generated_ids"]
