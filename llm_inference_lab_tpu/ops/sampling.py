"""Token sampling: temperature / top-k / top-p with NaN fallback.

Reference parity: `sample_bonus_token_from_logits`
(src/specdec/core/pipeline.py:48-147) — temperature scaling, top-k filter
(:95-102), top-p nucleus (:104-121), multinomial-or-argmax with NaN fallback
(:124-137), clamp to vocab (:143-144). Here it is a pure, batched, jittable
function; randomness comes from an explicit PRNG key (replacing the
reference's global torch seeding, src/specdec/utils/deterministic.py).

`proposal_log_probs` exposes the EXACT distribution `sample_tokens` draws
from (post temperature + top-k + top-p), which the distribution-exact
`rejection` acceptance policy needs: min(1, p_t/p_d) is only correct when
p_d is the draft's true proposal distribution, filters included.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def filtered_logits(
    logits: jax.Array,  # [..., V]
    temperature: float = 1.0,
    top_k: int = 0,  # 0 = disabled; static
    top_p: float = 1.0,  # 1.0 = disabled
) -> jax.Array:
    """Temperature-scale then mask (-inf) everything outside the top-k /
    top-p nucleus — the pre-softmax form of the sampling distribution."""
    V = logits.shape[-1]
    scaled = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)

    if top_k and top_k > 0:
        kth = jax.lax.top_k(scaled, min(top_k, V))[0][..., -1:]
        scaled = jnp.where(scaled < kth, -jnp.inf, scaled)

    if top_p < 1.0:
        sorted_logits = jnp.sort(scaled, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Keep tokens whose *exclusive* cumulative mass is < top_p (always
        # keeps at least the top token — reference pipeline.py:112-116).
        keep_sorted = (cum - probs) < top_p
        cutoff = jnp.max(
            jnp.where(keep_sorted, sorted_logits, -jnp.inf), axis=-1, keepdims=True
        )
        scaled = jnp.where(scaled < cutoff, -jnp.inf, scaled)
    return scaled


def proposal_log_probs(
    logits: jax.Array,  # [..., V]
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    greedy: bool = False,
) -> jax.Array:
    """Log-probs of the distribution `sample_tokens` actually samples from
    with these settings. Greedy sampling is a point mass at the argmax."""
    if greedy or temperature <= 0.0:
        best = jnp.argmax(logits, axis=-1, keepdims=True)
        onehot = jnp.arange(logits.shape[-1]) == best
        return jnp.where(onehot, 0.0, -jnp.inf)
    return jax.nn.log_softmax(filtered_logits(logits, temperature, top_k, top_p), axis=-1)


def sample_tokens(
    rng: jax.Array,
    logits: jax.Array,  # [B, V] float32
    temperature: float = 1.0,
    top_k: int = 0,  # 0 = disabled; static
    top_p: float = 1.0,  # 1.0 = disabled
    greedy: bool = False,
) -> jax.Array:
    """Returns [B] int32 sampled token ids, always clamped to [0, V)."""
    V = logits.shape[-1]
    if greedy or temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    scaled = filtered_logits(logits, temperature, top_k, top_p)
    sampled = jax.random.categorical(rng, scaled, axis=-1).astype(jnp.int32)
    # NaN/all-inf fallback to plain argmax (reference pipeline.py:124-137).
    bad = ~jnp.all(jnp.isfinite(jnp.max(scaled, axis=-1, keepdims=False))[..., None], axis=-1)
    fallback = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    out = jnp.where(bad, fallback, sampled)
    return jnp.clip(out, 0, V - 1)
