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


def rejection(
    rng,
    draft_tokens,
    draft_logits,
    target_logits,
    *,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    min_p: float = 0.0,
    draft_temperature: float = 1.0,
    draft_greedy: bool = False,
    **_,
):
    """Stochastic speculative sampling: accept d_i w.p. min(1, p_t/p_d).

    Distribution-exact w.r.t. the target model's SAMPLING distribution
    (post temperature/top-k/top-p) — not in the reference; its Phase 4D
    lists lossless sampling-based verification as future work. Exactness
    holds for ANY proposal q as long as p_d is the distribution the draft
    actually sampled from (Leviathan et al.): here both p_t and p_d are the
    true filtered sampling distributions, including the greedy point-mass
    case. The residual-distribution bonus resample is handled by
    `rejection_bonus_logits` below.
    """
    from llm_inference_lab_tpu.ops.sampling import proposal_log_probs

    lp_t = proposal_log_probs(
        target_logits[:, :-1], temperature, top_k, top_p, min_p
    )
    lp_d = proposal_log_probs(
        draft_logits, draft_temperature, top_k, top_p, min_p,
        greedy=draft_greedy,
    )
    lpt_i = jnp.take_along_axis(lp_t, draft_tokens[..., None], axis=-1)[..., 0]
    lpd_i = jnp.take_along_axis(lp_d, draft_tokens[..., None], axis=-1)[..., 0]
    # p_d(d_i) > 0 by construction (d_i was sampled from p_d); the -inf
    # guard covers only numeric edge cases.
    ratio = jnp.exp(jnp.minimum(lpt_i - jnp.maximum(lpd_i, -30.0), 0.0))
    ratio = jnp.where(jnp.isfinite(lpt_i), ratio, 0.0)
    u = jax.random.uniform(rng, draft_tokens.shape)
    return _prefix_len(u < ratio)


def rejection_bonus_logits(
    draft_logits: jax.Array,  # [B, K, V]
    target_logits: jax.Array,  # [B, K+1, V]
    accept_len: jax.Array,  # [B]
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    min_p: float = 0.0,
    draft_temperature: float = 1.0,
    draft_greedy: bool = False,
) -> jax.Array:
    """Log-probs of the bonus distribution: residual max(0, p_t - p_d) at
    the first rejected position, the target sampling distribution when
    everything was accepted. p_t/p_d are the same filtered distributions the
    `rejection` policy used — the result is FINAL (sample it at temperature
    1.0 with no further filtering, or the distribution would be scaled
    twice; round-1 ADVICE.md finding)."""
    from llm_inference_lab_tpu.ops.sampling import proposal_log_probs

    B, K, V = draft_logits.shape
    idx = jnp.minimum(accept_len, K - 1)
    tl = jnp.take_along_axis(target_logits, idx[:, None, None], axis=1)[:, 0]
    dl = jnp.take_along_axis(draft_logits, idx[:, None, None], axis=1)[:, 0]
    lp_t = proposal_log_probs(tl, temperature, top_k, top_p, min_p)
    lp_d = proposal_log_probs(
        dl, draft_temperature, top_k, top_p, min_p, greedy=draft_greedy
    )
    resid = jnp.maximum(jnp.exp(lp_t) - jnp.exp(lp_d), 0.0)
    # Degenerate (p_t <= p_d everywhere) -> fall back to target distribution.
    total = jnp.sum(resid, axis=-1, keepdims=True)
    resid_logits = jnp.where(resid > 0, jnp.log(jnp.maximum(resid, 1e-30)), -jnp.inf)
    resid_logits = jnp.where(total > 1e-9, resid_logits, lp_t)
    # All-accepted -> bonus comes from the free K-th target row.
    full = jnp.take_along_axis(target_logits, jnp.full((B, 1, 1), K), axis=1)[:, 0]
    lp_full = proposal_log_probs(full, temperature, top_k, top_p, min_p)
    return jnp.where((accept_len >= K)[:, None], lp_full, resid_logits)


POLICIES: Dict[str, Callable] = {
    "longest_prefix": longest_prefix,
    "conf_threshold": conf_threshold,
    "topk_agree": topk_agree,
    "typical": typical,
    "rejection": rejection,
}

# Policy-aware logit buffering (round-3 VERDICT item 9): policies that only
# compare token ids never read draft_logits, so the spec step skips
# materializing the [B, K, V] draft-logit stacks entirely (the buffers +
# their HBM traffic are what tipped 8B spec configs over a 16 GB chip).
# Custom policies without the attribute default to True (safe).
longest_prefix.needs_draft_logits = False
topk_agree.needs_draft_logits = False
typical.needs_draft_logits = False
conf_threshold.needs_draft_logits = True
rejection.needs_draft_logits = True


def create_policy(name: str) -> Callable:
    """Name -> policy fn (reference create_policy, policies.py:399-425)."""
    try:
        return POLICIES[name]
    except KeyError:
        raise ValueError(f"unknown policy {name!r}; known: {sorted(POLICIES)}") from None
