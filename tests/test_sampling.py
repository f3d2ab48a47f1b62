"""Sampler tests (reference sample_bonus_token_from_logits semantics,
src/specdec/core/pipeline.py:48-147)."""

import jax
import jax.numpy as jnp
import numpy as np

from llm_inference_lab_tpu.ops.sampling import sample_tokens

RNG = jax.random.PRNGKey(0)


def test_greedy_is_argmax():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(4, 32)), jnp.float32)
    out = sample_tokens(RNG, logits, greedy=True)
    assert out.tolist() == jnp.argmax(logits, -1).tolist()


def test_zero_temperature_is_greedy():
    logits = jnp.asarray(np.random.default_rng(1).normal(size=(2, 16)), jnp.float32)
    out = sample_tokens(RNG, logits, temperature=0.0, greedy=False)
    assert out.tolist() == jnp.argmax(logits, -1).tolist()


def test_top_k_restricts_support():
    logits = jnp.asarray([[5.0, 4.0, 3.0, -1.0, -2.0, -3.0]] * 64, jnp.float32)
    for i in range(20):
        out = sample_tokens(
            jax.random.fold_in(RNG, i), logits, temperature=2.0, top_k=3
        )
        assert (out < 3).all(), out


def test_top_p_keeps_top_token():
    logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0]], jnp.float32)
    out = sample_tokens(RNG, logits, temperature=1.0, top_p=0.01)
    assert out.tolist() == [0]  # nucleus keeps at least the top token


def test_top_p_restricts_tail():
    # token 0 has ~88% mass at temp 1; top_p=0.5 must always pick it.
    logits = jnp.asarray([[4.0, 2.0, 1.0, 0.0]] * 16, jnp.float32)
    for i in range(20):
        out = sample_tokens(jax.random.fold_in(RNG, i), logits, top_p=0.5)
        assert (out == 0).all()


def test_nan_fallback_to_argmax():
    logits = jnp.asarray([[jnp.nan, jnp.nan, 1.0]], jnp.float32)
    out = sample_tokens(RNG, logits, temperature=1.0)
    assert 0 <= int(out[0]) < 3  # clamped, no crash


def test_sampling_deterministic_per_key():
    logits = jnp.asarray(np.random.default_rng(2).normal(size=(3, 64)), jnp.float32)
    a = sample_tokens(RNG, logits, temperature=1.0)
    b = sample_tokens(RNG, logits, temperature=1.0)
    assert a.tolist() == b.tolist()


def test_output_in_vocab():
    logits = jnp.asarray(np.random.default_rng(3).normal(size=(8, 11)), jnp.float32)
    out = sample_tokens(RNG, logits, temperature=5.0, top_k=100)
    assert ((out >= 0) & (out < 11)).all()
