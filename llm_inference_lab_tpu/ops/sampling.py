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


def _dynamic(*params) -> bool:
    """Any sampling parameter given as an array (per-sequence values)?"""
    return any(isinstance(p, jax.Array) for p in params)


def _bcast(p, logits: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Reshape a per-sequence [B] parameter to broadcast against
    [B, ..., V] logits (scalars pass through)."""
    p = jnp.asarray(p, dtype)
    if p.ndim == 0:
        return p
    return p.reshape(p.shape + (1,) * (logits.ndim - p.ndim))


def fold_rows(row_keys: jax.Array, site) -> jax.Array:
    """Fold a per-site id into [B, 2] per-row PRNG keys (site may be a
    traced scalar — e.g. the draft-scan position index)."""
    return jax.vmap(jax.random.fold_in, (0, None))(row_keys, site)


def token_counts(
    tokens: jax.Array,  # [B, T] int32 token buffer
    lengths: jax.Array,  # [B] int32 committed lengths
    vocab_size: int,
) -> jax.Array:
    """Per-sequence occurrence counts of every vocab token in the committed
    prefix: counts[b, v] = |{t < lengths[b] : tokens[b, t] == v}|. One
    scatter-add over the token buffer — O(B*T) work, [B, V] output."""
    B, T = tokens.shape
    valid = jnp.arange(T, dtype=jnp.int32)[None, :] < lengths[:, None]
    return (
        jnp.zeros((B, vocab_size), jnp.int32)
        .at[jnp.arange(B)[:, None], jnp.clip(tokens, 0, vocab_size - 1)]
        .add(valid.astype(jnp.int32))
    )


def apply_penalties(
    logits: jax.Array,  # [B, ..., V]
    counts: jax.Array,  # [B, V] or [B, ..., V] occurrence counts
    repetition=1.0,  # float or [B]; 1.0 = disabled (HF convention)
    presence=0.0,  # float or [B]; OpenAI presence_penalty
    frequency=0.0,  # float or [B]; OpenAI frequency_penalty
) -> jax.Array:
    """Penalize logits of already-seen tokens, BEFORE temperature/filters
    (HF processor order). Repetition penalty (Keskar et al. 2019 / HF
    RepetitionPenaltyLogitsProcessor): seen & logit > 0 -> logit/r, seen &
    logit < 0 -> logit*r. Presence/frequency (OpenAI API semantics):
    logit -= presence*1[count>0] + frequency*count. Applies over the whole
    committed text (prompt + generation), the HF/vLLM repetition
    convention; EOS is not special-cased."""
    x = logits.astype(jnp.float32)
    c = counts.astype(jnp.float32)
    if c.ndim < x.ndim:  # [B, V] counts against [B, K, V] logits
        c = c.reshape(c.shape[:1] + (1,) * (x.ndim - c.ndim) + c.shape[1:])
    rep = _bcast(repetition, x)
    pres = _bcast(presence, x)
    freq = _bcast(frequency, x)
    seen = c > 0
    x = jnp.where(seen & (x > 0), x / rep, jnp.where(seen, x * rep, x))
    return x - pres * seen.astype(jnp.float32) - freq * c


def logit_bias_row(
    bias_ids: jax.Array,  # [B, N] int32 token ids; -1 = empty slot
    bias_vals: jax.Array,  # [B, N] float32 additive biases
    vocab_size: int,
) -> jax.Array:
    """Dense [B, V] additive-bias row from fixed-width (id, value) pairs.
    Loop-invariant within a decode step — compute ONCE and broadcast-add,
    instead of re-scattering at every draft position."""
    B = bias_ids.shape[0]
    valid = bias_ids >= 0
    return (
        jnp.zeros((B, vocab_size), jnp.float32)
        .at[jnp.arange(B)[:, None], jnp.clip(bias_ids, 0, vocab_size - 1)]
        .add(jnp.where(valid, bias_vals, 0.0))
    )


def apply_logit_bias(
    logits: jax.Array,  # [B, ..., V]
    bias_ids: jax.Array,  # [B, N] int32 token ids; -1 = empty slot
    bias_vals: jax.Array,  # [B, N] float32 additive biases
) -> jax.Array:
    """OpenAI `logit_bias`: add per-token biases before temperature/filters.
    Fixed-width [B, N] id/value arrays keep the step shape-static; empty
    slots are id -1. A -100 bias effectively bans a token, +100 forces it
    (the OpenAI convention)."""
    row = logit_bias_row(bias_ids, bias_vals, logits.shape[-1])
    row = row.reshape(row.shape[:1] + (1,) * (logits.ndim - 2) + row.shape[1:])
    return logits.astype(jnp.float32) + row


def filtered_logits(
    logits: jax.Array,  # [..., V]
    temperature=1.0,  # float or [B] array (per-request)
    top_k=0,  # int or [B] array; 0 = disabled
    top_p=1.0,  # float or [B] array; 1.0 = disabled
    min_p=0.0,  # float or [B] array; 0.0 = disabled
) -> jax.Array:
    """Temperature-scale then mask (-inf) everything outside the min-p /
    top-k / top-p filters — the pre-softmax form of the sampling
    distribution. min_p (vLLM semantics) drops tokens whose probability is
    below min_p * max_prob; on logits that is the SORT-FREE test
    l_i < l_max + log(min_p). Order: temperature -> min_p -> top_k ->
    top_p.

    Static (python-scalar) parameters compile to the minimal op sequence
    (disabled filters cost nothing); array parameters take a one-sort path
    that evaluates all filters with per-sequence values — the serving
    engine's per-request sampling."""
    V = logits.shape[-1]
    if not _dynamic(temperature, top_k, top_p, min_p):
        scaled = logits.astype(jnp.float32) / jnp.maximum(temperature, 1e-6)

        if min_p and min_p > 0.0:
            mx = jnp.max(scaled, axis=-1, keepdims=True)
            scaled = jnp.where(
                scaled < mx + jnp.log(min_p), -jnp.inf, scaled
            )

        if top_k and top_k > 0:
            kth = jax.lax.top_k(scaled, min(top_k, V))[0][..., -1:]
            scaled = jnp.where(scaled < kth, -jnp.inf, scaled)

        if top_p < 1.0:
            sorted_logits = jnp.sort(scaled, axis=-1)[..., ::-1]
            probs = jax.nn.softmax(sorted_logits, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            # Keep tokens whose *exclusive* cumulative mass is < top_p (always
            # keeps at least the top token — reference pipeline.py:112-116).
            # The mask threshold is the SMALLEST kept logit.
            keep_sorted = ((cum - probs) < top_p) & jnp.isfinite(sorted_logits)
            cutoff = jnp.min(
                jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
            )
            scaled = jnp.where(scaled < cutoff, -jnp.inf, scaled)
        return scaled

    t = _bcast(temperature, logits)
    scaled = logits.astype(jnp.float32) / jnp.maximum(t, 1e-6)
    mp = _bcast(min_p, logits)
    mx = jnp.max(scaled, axis=-1, keepdims=True)
    scaled = jnp.where(
        (mp > 0.0) & (scaled < mx + jnp.log(jnp.maximum(mp, 1e-9))),
        -jnp.inf,
        scaled,
    )
    sorted_desc = jnp.sort(scaled, axis=-1)[..., ::-1]
    # Dynamic top-k: the k-th largest value per row is the threshold
    # (gathered at a per-row index — lax.top_k needs a static k).
    k_arr = _bcast(top_k, logits, jnp.int32)
    kth = jnp.take_along_axis(
        sorted_desc, jnp.broadcast_to(
            jnp.clip(k_arr - 1, 0, V - 1), scaled.shape[:-1] + (1,)
        ), axis=-1,
    )
    scaled = jnp.where((k_arr > 0) & (scaled < kth), -jnp.inf, scaled)
    # Dynamic top-p over the same sort, applied AFTER top-k (matching the
    # static path's order): rank >= k entries drop out of the nucleus mass.
    ranks = jnp.arange(V, dtype=jnp.int32)
    sorted_masked = jnp.where(
        (k_arr > 0) & (ranks >= k_arr), -jnp.inf, sorted_desc
    )
    probs = jax.nn.softmax(sorted_masked, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # Exclusive-mass rule keeps at least the top token for any top_p; rows
    # at 1.0 keep everything. Threshold = the smallest kept logit.
    # Rows at top_p >= 1.0 disable the filter outright (float32 cum can
    # saturate at 1.0 and spuriously drop zero-mass tail tokens otherwise).
    p_arr = _bcast(top_p, logits)
    keep_sorted = (((cum - probs) < p_arr) | (p_arr >= 1.0)) & jnp.isfinite(
        sorted_masked
    )
    cutoff = jnp.min(
        jnp.where(keep_sorted, sorted_masked, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(scaled < cutoff, -jnp.inf, scaled)


def proposal_log_probs(
    logits: jax.Array,  # [..., V]
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    min_p: float = 0.0,
    greedy: bool = False,
) -> jax.Array:
    """Log-probs of the distribution `sample_tokens` actually samples from
    with these settings. Greedy sampling is a point mass at the argmax."""
    if greedy or temperature <= 0.0:
        best = jnp.argmax(logits, axis=-1, keepdims=True)
        onehot = jnp.arange(logits.shape[-1]) == best
        return jnp.where(onehot, 0.0, -jnp.inf)
    return jax.nn.log_softmax(
        filtered_logits(logits, temperature, top_k, top_p, min_p), axis=-1
    )


def sample_tokens(
    rng: jax.Array,
    logits: jax.Array,  # [B, V] float32
    temperature=1.0,  # float or [B] array (per-request)
    top_k=0,  # int or [B] array; 0 = disabled
    top_p=1.0,  # float or [B] array; 1.0 = disabled
    min_p=0.0,  # float or [B] array; 0.0 = disabled
    greedy: bool = False,
    row_keys: Optional[jax.Array] = None,  # [B, 2] per-row PRNG keys
) -> jax.Array:
    """Returns [B] int32 sampled token ids, always clamped to [0, V).

    With array parameters, rows whose temperature <= 0 decode greedily
    (the OpenAI temperature=0 convention) — mixed greedy/sampled batches
    work inside one compiled step.

    row_keys: per-row keys (OpenAI per-request `seed`). Each row draws
    from its OWN key so its sample is independent of batch composition
    and slot index; `rng` is ignored for the draw. [B, V] logits only."""
    V = logits.shape[-1]
    dynamic = _dynamic(temperature, top_k, top_p, min_p)
    if not dynamic and (greedy or temperature <= 0.0):
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    fallback = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def _sample(logits):
        scaled = filtered_logits(logits, temperature, top_k, top_p, min_p)
        if row_keys is not None:
            sampled = jax.vmap(
                lambda k, s: jax.random.categorical(k, s)
            )(row_keys, scaled).astype(jnp.int32)
        else:
            sampled = jax.random.categorical(rng, scaled, axis=-1).astype(
                jnp.int32
            )
        # NaN/all-inf fallback to plain argmax (reference pipeline.py:124-137).
        bad = ~jnp.all(
            jnp.isfinite(jnp.max(scaled, axis=-1, keepdims=False))[..., None],
            axis=-1,
        )
        return jnp.where(bad, fallback, sampled)

    if not dynamic:
        return jnp.clip(_sample(logits), 0, V - 1)

    t = jnp.asarray(temperature, jnp.float32)
    row_greedy = (
        jnp.reshape(t, t.shape + (1,) * (logits.ndim - 1 - t.ndim)) <= 0.0
        if t.ndim
        else t <= 0.0
    )
    if greedy:  # static greedy engines stay greedy regardless of rows
        return jnp.clip(fallback, 0, V - 1)
    # The dynamic path's per-row filters need a full-vocab sort — expensive
    # at serving batch x 128k vocab. Greedy rows (OpenAI temperature=0, the
    # default traffic) don't: skip the whole sampling branch when every row
    # is greedy this step. lax.cond executes only one branch at runtime.
    out = jax.lax.cond(
        jnp.all(row_greedy),
        lambda l: fallback,
        lambda l: jnp.where(row_greedy, fallback, _sample(l)),
        logits,
    )
    return jnp.clip(out, 0, V - 1)
