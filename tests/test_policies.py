"""Acceptance-policy tests (reference tests/specdec/test_policies.py: exact /
partial / no match, threshold behavior, per-policy semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_inference_lab_tpu.core.policies import (
    POLICIES,
    conf_threshold,
    create_policy,
    longest_prefix,
    rejection,
    rejection_bonus_logits,
    topk_agree,
    typical,
)

RNG = jax.random.PRNGKey(0)


def peaked(ids, vocab, peak=8.0):
    """[B, K] ids -> [B, K, V] logits peaked at ids."""
    ids = np.asarray(ids)
    out = np.zeros((*ids.shape, vocab), np.float32)
    for i in range(ids.shape[0]):
        for j in range(ids.shape[1]):
            out[i, j, ids[i, j]] = peak
    return jnp.asarray(out)


def test_longest_prefix_exact_partial_none():
    draft = jnp.array([[1, 2, 3], [1, 9, 3], [9, 9, 9]], dtype=jnp.int32)
    tgt = peaked([[1, 2, 3, 4]] * 3, 16)
    a = longest_prefix(RNG, draft, peaked(draft, 16), tgt)
    assert a.tolist() == [3, 1, 0]


def test_conf_threshold():
    draft = jnp.array([[1, 2]], dtype=jnp.int32)
    # First position confident (peak 10), second diffuse (all zeros).
    dl = np.zeros((1, 2, 16), np.float32)
    dl[0, 0, 1] = 10.0
    tgt = peaked([[1, 2, 3]], 16)
    a = conf_threshold(RNG, draft, jnp.asarray(dl), tgt, tau=0.5)
    assert a.tolist() == [1]
    a = conf_threshold(RNG, draft, jnp.asarray(dl), tgt, tau=0.01)
    assert a.tolist() == [2]


def test_topk_agree():
    draft = jnp.array([[5, 6]], dtype=jnp.int32)
    tgt = np.zeros((1, 3, 16), np.float32)
    tgt[0, 0, [1, 5]] = [9.0, 8.0]  # 5 in top-2
    tgt[0, 1, [2, 3]] = [9.0, 8.0]  # 6 not in top-2
    a = topk_agree(RNG, draft, peaked(draft, 16), jnp.asarray(tgt), k=2)
    assert a.tolist() == [1]


def test_typical():
    draft = jnp.array([[1, 2]], dtype=jnp.int32)
    tgt = peaked([[1, 9, 0]], 16, peak=20.0)  # p(1)≈1 at pos0; p(2)≈0 at pos1
    a = typical(RNG, draft, peaked(draft, 16), tgt, p=0.9)
    assert a.tolist() == [1]


def test_rejection_accepts_when_target_agrees():
    draft = jnp.array([[3, 4, 5]], dtype=jnp.int32)
    dl = peaked(draft, 16, peak=20.0)
    tgt = peaked([[3, 4, 5, 6]], 16, peak=20.0)
    # p_t/p_d ≈ 1 at every position -> always accepted.
    a = rejection(RNG, draft, dl, tgt)
    assert a.tolist() == [3]


def test_rejection_rejects_when_target_disagrees():
    draft = jnp.array([[3]], dtype=jnp.int32)
    dl = peaked(draft, 16, peak=20.0)
    tgt = peaked([[9, 9]], 16, peak=20.0)  # target puts ~0 mass on 3
    a = rejection(RNG, draft, dl, tgt)
    assert a.tolist() == [0]


def test_rejection_bonus_residual():
    draft = jnp.array([[3]], dtype=jnp.int32)
    dl = peaked(draft, 8, peak=20.0)
    tgt = peaked([[5, 6]], 8, peak=20.0)
    bl = rejection_bonus_logits(dl, tgt, jnp.array([0], jnp.int32))
    # Residual max(0, p_t - p_d) concentrates on target's token 5.
    assert int(jnp.argmax(bl[0])) == 5
    # All-accepted -> row K (target bonus distribution at token 6).
    bl = rejection_bonus_logits(dl, tgt, jnp.array([1], jnp.int32))
    assert int(jnp.argmax(bl[0])) == 6


@pytest.mark.parametrize(
    "temperature,top_p,draft_scale,min_p",
    [
        (1.0, 1.0, 1.0, 0.0),
        (0.7, 1.0, 1.5, 0.0),
        (1.3, 0.9, 1.5, 0.0),
        # min_p must thread into BOTH p_d and p_t or exactness breaks
        # (round-2 code-review finding: min_p was silently dropped).
        (0.8, 1.0, 1.5, 0.15),
        (1.0, 0.9, 1.0, 0.1),
    ],
)
def test_rejection_is_distribution_exact(temperature, top_p, draft_scale,
                                         min_p):
    """End-to-end single-position check of the speculative-sampling theorem:
    emit accepted-draft-or-residual-bonus must be distributed EXACTLY like
    sampling the target directly (incl. temperature != 1 and top-p filters —
    the round-1 ADVICE.md double-scaling bug breaks this)."""
    from llm_inference_lab_tpu.ops.sampling import (
        proposal_log_probs,
        sample_tokens,
    )

    V, N = 16, 40000
    key = jax.random.PRNGKey(42)
    k_t, k_d, k_draft, k_pol, k_bonus = jax.random.split(key, 5)
    tl_row = jax.random.normal(k_t, (V,)) * 2.0
    dl_row = jax.random.normal(k_d, (V,)) * 2.0
    draft_temp = temperature / draft_scale

    dl = jnp.broadcast_to(dl_row, (N, 1, V))
    tl = jnp.broadcast_to(tl_row, (N, 2, V))
    d_tok = sample_tokens(
        jax.random.split(k_draft, 1)[0], dl[:, 0],
        temperature=draft_temp, top_p=top_p, min_p=min_p,
    )[:, None]
    a = rejection(
        k_pol, d_tok, dl, tl, temperature=temperature, top_p=top_p,
        min_p=min_p, draft_temperature=draft_temp,
    )
    bl = rejection_bonus_logits(
        dl, tl, a, temperature=temperature, top_p=top_p, min_p=min_p,
        draft_temperature=draft_temp,
    )
    bonus = sample_tokens(k_bonus, bl, temperature=1.0)
    emitted = np.where(np.asarray(a) == 1, np.asarray(d_tok[:, 0]), np.asarray(bonus))

    emp = np.bincount(emitted, minlength=V) / N
    want = np.exp(np.asarray(
        proposal_log_probs(tl_row, temperature, 0, top_p, min_p)
    ))
    tv = 0.5 * np.abs(emp - want).sum()
    assert tv < 0.02, (tv, emp, want)


def test_factory():
    for name in POLICIES:
        assert create_policy(name) is POLICIES[name]
    with pytest.raises(ValueError):
        create_policy("nope")


def test_policies_are_jittable():
    draft = jnp.array([[1, 2]], dtype=jnp.int32)
    dl = peaked(draft, 16)
    tgt = peaked([[1, 2, 3]], 16)
    for name, fn in POLICIES.items():
        out = jax.jit(lambda r, d, l, t: fn(r, d, l, t))(RNG, draft, dl, tgt)
        assert out.shape == (1,), name
