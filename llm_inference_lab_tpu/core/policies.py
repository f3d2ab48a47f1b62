"""Acceptance policies — pure, batched, jittable functions.

Reference parity: src/specdec/policies/policies.py — `AcceptancePolicy` ABC
(:35), LongestPrefixPolicy (:76), ConfidenceThresholdPolicy (:213),
TopKAgreementPolicy (:272), TypicalAcceptancePolicy (:331), `create_policy`
factory (:399). Plus one policy beyond the reference: `rejection` — full
stochastic speculative sampling (Leviathan et al.), which the reference lists
as out of scope (its verification is always greedy,
src/scheduler/speculative_scheduler.py:192-198).

Contract:
    policy(rng, draft_tokens, draft_logits, target_logits, **params)
        -> accept_len [B] int32 in [0, K]
      draft_tokens:  [B, K] int32
      draft_logits:  [B, K, V] — draft distribution at each proposed position
      target_logits: [B, K+1, V] — target distribution at positions L..L+K
                     (only the first K rows are used for acceptance; row K is
                     the free bonus distribution when everything is accepted)
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from llm_inference_lab_tpu.ops.registry import get_op


def _prefix_len(accept_mask: jax.Array) -> jax.Array:
    """[B, K] bool -> [B] length of all-True prefix."""
    return jnp.sum(jnp.cumprod(accept_mask.astype(jnp.int32), axis=-1), axis=-1).astype(
        jnp.int32
    )


def longest_prefix(rng, draft_tokens, draft_logits, target_logits, **_):
    """Greedy argmax match (reference policies.py:76-210, default policy)."""
    accept_len, _ = get_op("verify_prefix")(draft_tokens, target_logits[:, :-1])
    return accept_len


def conf_threshold(rng, draft_tokens, draft_logits, target_logits, *, tau: float = 0.5, **_):
    """Accept while draft max-softmax-prob >= tau (reference :213-269)."""
    conf = jnp.max(jax.nn.softmax(draft_logits.astype(jnp.float32), axis=-1), axis=-1)
    return _prefix_len(conf >= tau)


def topk_agree(rng, draft_tokens, draft_logits, target_logits, *, k: int = 5, **_):
    """Accept while draft token is in target top-k (reference :272-328)."""
    _, topk_ids = jax.lax.top_k(target_logits[:, :-1], k)
    in_topk = jnp.any(topk_ids == draft_tokens[..., None], axis=-1)
    return _prefix_len(in_topk)


def typical(rng, draft_tokens, draft_logits, target_logits, *, p: float = 0.9, **_):
    """Accept while target prob of draft token >= p (reference :331-396)."""
    probs = jax.nn.softmax(target_logits[:, :-1].astype(jnp.float32), axis=-1)
    p_draft = jnp.take_along_axis(probs, draft_tokens[..., None], axis=-1)[..., 0]
    return _prefix_len(p_draft >= p)


def rejection(rng, draft_tokens, draft_logits, target_logits, *, temperature: float = 1.0, **_):
    """Stochastic speculative sampling: accept d_i w.p. min(1, p_t/p_d).

    Distribution-exact w.r.t. the target model (not in the reference; its
    Phase 4D lists lossless sampling-based verification as future work).
    The residual-distribution bonus resample is handled by
    `rejection_bonus_logits` below.
    """
    t = jnp.maximum(temperature, 1e-6)
    p_t = jax.nn.softmax(target_logits[:, :-1].astype(jnp.float32) / t, axis=-1)
    p_d = jax.nn.softmax(draft_logits.astype(jnp.float32) / t, axis=-1)
    pt_i = jnp.take_along_axis(p_t, draft_tokens[..., None], axis=-1)[..., 0]
    pd_i = jnp.take_along_axis(p_d, draft_tokens[..., None], axis=-1)[..., 0]
    ratio = pt_i / jnp.maximum(pd_i, 1e-20)
    u = jax.random.uniform(rng, draft_tokens.shape)
    return _prefix_len(u < ratio)


def rejection_bonus_logits(
    draft_logits: jax.Array,  # [B, K, V]
    target_logits: jax.Array,  # [B, K+1, V]
    accept_len: jax.Array,  # [B]
    temperature: float = 1.0,
) -> jax.Array:
    """Residual distribution max(0, p_t - p_d) (log-space) at the first
    rejected position; plain target logits when everything was accepted."""
    B, K, V = draft_logits.shape
    t = jnp.maximum(temperature, 1e-6)
    idx = jnp.minimum(accept_len, K - 1)
    tl = jnp.take_along_axis(target_logits, idx[:, None, None], axis=1)[:, 0]
    dl = jnp.take_along_axis(draft_logits, idx[:, None, None], axis=1)[:, 0]
    resid = jnp.maximum(
        jax.nn.softmax(tl.astype(jnp.float32) / t, -1)
        - jax.nn.softmax(dl.astype(jnp.float32) / t, -1),
        0.0,
    )
    # Degenerate (p_t <= p_d everywhere) -> fall back to target distribution.
    total = jnp.sum(resid, axis=-1, keepdims=True)
    resid_logits = jnp.where(resid > 0, jnp.log(jnp.maximum(resid, 1e-30)), -jnp.inf)
    fallback = tl.astype(jnp.float32) / t
    resid_logits = jnp.where(total > 1e-9, resid_logits, fallback)
    # All-accepted -> bonus comes from the free K-th target row.
    full = jnp.take_along_axis(target_logits, jnp.full((B, 1, 1), K), axis=1)[:, 0]
    return jnp.where((accept_len >= K)[:, None], full.astype(jnp.float32) / t, resid_logits)


POLICIES: Dict[str, Callable] = {
    "longest_prefix": longest_prefix,
    "conf_threshold": conf_threshold,
    "topk_agree": topk_agree,
    "typical": typical,
    "rejection": rejection,
}


def create_policy(name: str) -> Callable:
    """Name -> policy fn (reference create_policy, policies.py:399-425)."""
    try:
        return POLICIES[name]
    except KeyError:
        raise ValueError(f"unknown policy {name!r}; known: {sorted(POLICIES)}") from None
