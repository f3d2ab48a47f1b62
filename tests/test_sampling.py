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


# ---- per-request (array-parameter) sampling --------------------------------


def test_dynamic_uniform_matches_static():
    """[B]-array params with one uniform value must match the static path
    exactly (same filters, same categorical draw)."""
    from llm_inference_lab_tpu.ops.sampling import filtered_logits

    rng = jax.random.PRNGKey(0)
    logits = jax.random.normal(jax.random.PRNGKey(1), (4, 64)) * 3.0
    for t, k, p in [(0.7, 0, 1.0), (1.3, 5, 1.0), (0.9, 0, 0.8), (1.0, 7, 0.9)]:
        stat = filtered_logits(logits, t, k, p)
        dyn = filtered_logits(
            logits,
            jnp.full((4,), t, jnp.float32),
            jnp.full((4,), k, jnp.int32),
            jnp.full((4,), p, jnp.float32),
        )
        np.testing.assert_allclose(np.asarray(stat), np.asarray(dyn), atol=1e-6)
        s1 = sample_tokens(rng, logits, t, k, p)
        s2 = sample_tokens(
            rng, logits, jnp.full((4,), t, jnp.float32),
            jnp.full((4,), k, jnp.int32), jnp.full((4,), p, jnp.float32),
        )
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_dynamic_per_row_temperature_zero_is_greedy():
    """Rows with temperature <= 0 decode greedily; other rows sample —
    a mixed greedy/sampled batch in one call."""
    logits = jax.random.normal(jax.random.PRNGKey(2), (3, 32))
    t = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    out = sample_tokens(jax.random.PRNGKey(3), logits, temperature=t)
    am = np.asarray(jnp.argmax(logits, -1))
    got = np.asarray(out)
    assert got[0] == am[0] and got[2] == am[2]


def test_dynamic_per_row_top_k():
    """Each row's top-k support is its own k."""
    from llm_inference_lab_tpu.ops.sampling import filtered_logits

    logits = jnp.asarray(
        [np.arange(16, dtype=np.float32), np.arange(16, dtype=np.float32)]
    )
    k = jnp.asarray([2, 5], jnp.int32)
    f = np.asarray(filtered_logits(logits, temperature=jnp.ones((2,)), top_k=k))
    assert np.isfinite(f[0]).sum() == 2
    assert np.isfinite(f[1]).sum() == 5


def test_dynamic_per_row_top_p():
    from llm_inference_lab_tpu.ops.sampling import filtered_logits

    logits = jnp.asarray([[0.0, 0.0, 0.0, 10.0]] * 2, jnp.float32)
    p = jnp.asarray([0.5, 1.0], jnp.float32)
    f = np.asarray(filtered_logits(logits, temperature=jnp.ones((2,)), top_p=p))
    assert np.isfinite(f[0]).sum() == 1  # nucleus = the dominant token
    assert np.isfinite(f[1]).sum() == 4  # 1.0 keeps everything


def test_top_p_nucleus_keeps_full_nucleus():
    """Regression: the nucleus must contain EVERY token whose exclusive
    cumulative mass is under top_p — not just the argmax (the cutoff is the
    smallest kept logit, not the largest)."""
    from llm_inference_lab_tpu.ops.sampling import filtered_logits

    logits = jnp.asarray([[3.0, 2.9, 2.8, 0.0]], jnp.float32)
    # probs ~ [.357, .323, .292, .018]; exclusive cum [0, .357, .68, .973]
    f = np.asarray(filtered_logits(logits, 1.0, 0, 0.95))
    assert np.isfinite(f[0, :3]).all() and not np.isfinite(f[0, 3])


def test_min_p_static_restricts_support():
    # probs at temp 1: token0 ~0.84, token1 ~0.11, rest < 0.03.
    logits = jnp.asarray([[4.0, 2.0, 1.0, 0.0]] * 16, jnp.float32)
    for i in range(20):
        out = sample_tokens(
            jax.random.fold_in(RNG, i), logits, temperature=1.0, min_p=0.1
        )
        assert (out <= 1).all(), out  # only tokens with p >= 0.1*p_max


def test_min_p_keeps_top_token():
    logits = jnp.asarray([[5.0, 0.0, 0.0]], jnp.float32)
    out = sample_tokens(RNG, logits, temperature=1.0, min_p=0.99)
    assert out.tolist() == [0]


def test_min_p_dynamic_matches_static():
    from llm_inference_lab_tpu.ops.sampling import filtered_logits

    logits = jnp.asarray(
        np.random.default_rng(3).normal(size=(4, 64)), jnp.float32
    )
    static = filtered_logits(logits, temperature=0.8, min_p=0.2)
    dynamic = filtered_logits(
        logits,
        temperature=jnp.full((4,), 0.8, jnp.float32),
        min_p=jnp.full((4,), 0.2, jnp.float32),
    )
    np.testing.assert_allclose(
        np.asarray(static), np.asarray(dynamic), rtol=1e-6
    )


def test_min_p_zero_disables():
    from llm_inference_lab_tpu.ops.sampling import filtered_logits

    logits = jnp.asarray(
        np.random.default_rng(4).normal(size=(2, 32)), jnp.float32
    )
    out = filtered_logits(
        logits, temperature=jnp.ones((2,), jnp.float32),
        min_p=jnp.zeros((2,), jnp.float32),
    )
    assert bool(jnp.all(jnp.isfinite(out)))
