"""The jitted speculative-decoding step: one shape-static state transition.

This is the TPU replacement for the reference's entire eager orchestration
(draft stream + verify stream + acceptance loop + KV realignment,
src/specdec/core/pipeline.py:1984-3708). Per step:

  1. Draft K tokens autoregressively (lax.scan over K single-token forwards,
     KV cache threaded through the carry).
  2. Verify with ONE target forward over [last_committed, d_1..d_K] — K+1
     logit rows. (The reference re-runs a full autoregressive generate to
     verify, speculative_scheduler.py:192-198; and needs an *extra* forward
     for the bonus token when everything is accepted, pipeline.py:3174-3248.
     Here row K of the verify logits IS the bonus distribution — free.)
  3. Acceptance policy -> accept_len a in [0, K] per sequence.
  4. Bonus token sampled from target row a — this uniformly covers the
     EQSPEC bonus (a < K), the all-accepted bonus (a == K), and the
     all-rejected fallback (a == 0 samples from the target's first row,
     reference pipeline.py:3341-3420) with zero special cases.
  5. Commit: write a+1 tokens, advance lengths, truncate at EOS, deactivate
     finished lanes. KV "rollback" is just not advancing the length.

Draft and verify overlap (the reference's CUDA-stream raison d'être) falls
out of XLA's async dispatch: the K draft forwards and the verify forward are
all one fused program; XLA's scheduler overlaps their HBM traffic.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from llm_inference_lab_tpu.core.policies import rejection_bonus_logits
from llm_inference_lab_tpu.core.state import DecodeState
from llm_inference_lab_tpu.ops.sampling import (
    apply_penalties,
    fold_rows,
    logit_bias_row,
    sample_tokens,
    token_counts,
)


def _gather_last(tokens: jax.Array, lengths: jax.Array) -> jax.Array:
    """tokens[b, lengths[b]-1] — the last committed token per sequence."""
    idx = jnp.maximum(lengths - 1, 0)
    return jnp.take_along_axis(tokens, idx[:, None], axis=1)[:, 0]


def make_spec_step(
    target_model,
    draft_model,
    *,
    k: int,
    policy_fn: Callable,
    policy_params: Optional[dict] = None,
    greedy: bool = True,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    min_p: float = 0.0,
    draft_temperature_scale: float = 1.5,
    repetition_penalty: float = 1.0,
    presence_penalty: float = 0.0,
    frequency_penalty: float = 0.0,
    eos_token_id: Optional[int] = None,
    use_rejection_bonus: bool = False,
    draft_mode: str = "vanilla",  # | "medusa" | "eagle"
    medusa_cfg: Optional[dict] = None,
    eagle_cfg: Optional[dict] = None,
    ngram_cfg: Optional[dict] = None,
    adaptive_cfg: Optional[dict] = None,
    per_request_sampling: bool = False,
    logprobs_topk: int = 0,
    constrain_tbl=None,  # constrain.runtime.device_tables output, or None
    donate: bool = True,
    jit: bool = True,
):
    """Build the jitted step: (target_params, draft_params, state) -> state.

    draft_mode:
      vanilla — autoregressive draft model (reference default path).
      medusa  — Medusa-lite: K projection heads over the target's last
                hidden state, sharing the target lm_head (reference
                modes/medusa.py:17 + pipeline.py:655-763; unlike the
                reference's fresh-random-per-call heads, ours are persistent
                params passed as `draft_params["medusa_proj"]`).
      eagle   — EAGLE-lite: hidden-state linear extrapolation
                h' = h + alpha*(h - h_prev), logits via the target lm_head
                (reference modes/eagle.py:16 + pipeline.py:765-889).
      ngram   — prompt-lookup speculation: propose the continuation of the
                most recent earlier occurrence of the last n committed
                tokens (vectorized match over the token buffer, fully
                device-side). No draft model, no draft forwards — near-zero
                draft cost; shines on repetitive text (summarization, code,
                RAG contexts). Beyond the reference's mode set.
    Medusa/EAGLE read the hidden-state carry maintained in DecodeState, and
    ngram reads only the token buffer, so none of them needs a separate
    draft model or draft cache.

    adaptive_cfg (device-side adaptive K; round-1 VERDICT #6): when set, k
    is the STATIC upper bound and the effective draft length comes from
    ``state.ctrl_k``. The vanilla draft loop becomes a dynamic-trip-count
    ``lax.while_loop`` (only ctrl_k draft forwards actually run), the verify
    forward stays at the static k+1 positions (the extra rows are junk the
    causal mask isolates and later writes overwrite — negligible cost at
    decode shapes), acceptance is clipped to ctrl_k, and the controller
    update (acceptance EMA + hysteresis step, reference
    controllers.py:109-118 semantics) runs ON DEVICE. The whole adaptive
    generation therefore remains ONE dispatch — eliminating the measured 2x
    host-observation tax of the host-stepped adaptive path (RESULTS.md).
    Keys: min_k, target_acceptance, window, step_size.

    per_request_sampling: draft/bonus sampling reads per-sequence
    temperature/top_k/top_p from DecodeState instead of the compiled-in
    scalars (serving: OpenAI per-request parameters; rows with
    temperature <= 0 decode greedily). The static path is unchanged —
    and faster — when off. Not compatible with the distribution-exact
    `rejection` policy, whose proposal/target distributions are compiled in.
    """
    policy_params = dict(policy_params or {})
    if per_request_sampling and use_rejection_bonus:
        raise NotImplementedError(
            "per-request sampling parameters are not supported with the "
            "rejection policy (its distributions are compiled in)"
        )
    target_apply = target_model.apply_fn
    draft_apply = draft_model.apply_fn if draft_model is not None else None
    head_fn = target_model.head_fn
    K = int(k)
    # Reference subtlety for acceptance parity: the draft samples at
    # temperature/1.5 (pipeline.py:2324-2328) while verify stays greedy.
    draft_temp = temperature / draft_temperature_scale
    if use_rejection_bonus:
        # The rejection policy and its residual bonus need the EXACT draft
        # and target sampling distributions (temperature + top-k/top-p +
        # greedy point-mass) — min(1, p_t/p_d) with any other p_d is not
        # distribution-preserving (round-1 ADVICE.md finding).
        policy_params.update(
            temperature=temperature,
            top_k=top_k,
            top_p=top_p,
            min_p=min_p,
            draft_temperature=draft_temp,
            draft_greedy=greedy,
        )
    medusa_cfg = dict(medusa_cfg or {})
    eagle_alpha = float((eagle_cfg or {}).get("alpha", 0.7))
    compute_dtype = target_model.config.dtype
    adaptive = adaptive_cfg is not None
    # Policy-aware logit buffering: id-comparing policies (longest_prefix,
    # topk_agree, typical) never read draft_logits — skip stacking the
    # [B, K, V] buffers entirely (the stacks + traffic are what pushed 8B
    # spec configs out of 16 GB; round-3 VERDICT item 9).
    need_draft_logits = (
        bool(getattr(policy_fn, "needs_draft_logits", True))
        or use_rejection_bonus
    )
    # Penalties (HF repetition + OpenAI presence/frequency): static scalars
    # compile in; per_request_sampling reads per-row values from the state.
    # Exactness inside a spec step: the verify row for write-slot i is
    # penalized with counts of (committed prefix + drafts d_0..d_{i-1}) —
    # the same incremental counts the draft loop used when proposing d_i —
    # so greedy spec output == greedy penalized baseline output, and the
    # rejection policy's p_t/p_d both refer to the penalized distributions.
    use_pen = per_request_sampling or (
        repetition_penalty != 1.0
        or presence_penalty != 0.0
        or frequency_penalty != 0.0
    )
    # OpenAI logit_bias is per-request-only (serving); applied after
    # penalties, identically on draft and verify sides.
    use_bias = per_request_sampling

    # Grammar constraints (constrain/): verify-side masking is the
    # soundness guarantee (invalid tokens get -inf BEFORE acceptance and
    # bonus sampling, so they can never commit); draft-side masking is the
    # acceptance-quality lever and needs the draft to share the target's
    # vocabulary (tables are target-vocab indexed).
    use_fsm = constrain_tbl is not None
    fsm_draft_ok = use_fsm and not (
        draft_mode == "vanilla"
        and draft_model is not None
        and draft_model.config.vocab_size != target_model.config.vocab_size
    )
    if use_fsm:
        from llm_inference_lab_tpu.constrain.runtime import (
            apply_mask,
            token_mask,
            transition as fsm_transition,
            walk_window,
            window_mask,
        )

    def _pen_params(state):
        if per_request_sampling:
            return (state.rep_penalty, state.presence_penalty,
                    state.freq_penalty)
        return (repetition_penalty, presence_penalty, frequency_penalty)

    # Draft-side penalties/bias need the draft to share the target's
    # vocabulary (counts/bias rows are indexed by token id). Mismatched
    # vocabs: STATIC penalties are a config error; per-request penalties
    # skip the draft side only — verification stays penalized (authoritative
    # output is still exact), the draft just proposes unpenalized tokens and
    # loses acceptance when penalties bind.
    pen_vocab_ok = not (
        draft_mode == "vanilla"
        and draft_model is not None
        and draft_model.config.vocab_size != target_model.config.vocab_size
    )
    if use_pen and not per_request_sampling and not pen_vocab_ok:
        raise ValueError(
            "penalties need draft and target to share a vocabulary "
            f"(draft {draft_model.config.vocab_size} != "
            f"target {target_model.config.vocab_size})"
        )

    def _ctx_penalize(state, sctx, logits, cnt, draft_side=False):
        """Apply penalties + logit bias with the step context. Per-request
        engines skip ALL the work at runtime (lax.cond) when every slot has
        penalties/bias disabled — the common serving case (the [B, V]
        scatter + one-hot traffic otherwise computes an identity)."""
        logits = logits.astype(jnp.float32)
        if use_pen and not (draft_side and not pen_vocab_ok):
            pen = lambda l, c: apply_penalties(l, c, *_pen_params(state))
            pa = sctx["pen_active"]
            if pa is None:  # static penalties: always on
                logits = pen(logits, cnt)
            else:
                logits = jax.lax.cond(
                    pa, pen, lambda l, c: l, logits, cnt
                )
        if use_bias and not (draft_side and not pen_vocab_ok):
            row = sctx["bias_row"]
            if logits.ndim == 3:
                row = row[:, None, :]
            logits = jax.lax.cond(
                sctx["bias_active"],
                lambda l: l + row,
                lambda l: l,
                logits,
            )
        return logits

    def _draft_samp(state, sctx=None, site=None):
        """Draft-sampling kwargs: per-sequence arrays or compiled scalars.
        Per-request engines draw row-wise from the slot's seed key (folded
        with the draft position `site`) so each request's stream is
        batch-composition independent."""
        if per_request_sampling:
            kw = dict(
                temperature=state.temperature / draft_temperature_scale,
                top_k=state.top_k, top_p=state.top_p, min_p=state.min_p,
                greedy=False,
            )
            if sctx is not None and sctx.get("row_keys") is not None:
                kw["row_keys"] = fold_rows(sctx["row_keys"], site)
            return kw
        return dict(temperature=draft_temp, top_k=top_k, top_p=top_p,
                    min_p=min_p, greedy=greedy)

    a_min_k = int((adaptive_cfg or {}).get("min_k", 1))
    a_target = float((adaptive_cfg or {}).get("target_acceptance", 0.5))
    a_alpha = 2.0 / (float((adaptive_cfg or {}).get("window", 32)) + 1.0)
    a_step = int((adaptive_cfg or {}).get("step_size", 1))

    def _draft_vanilla(state, draft_params, last, base, rng_draft, eff_k,
                       sctx):
        B = last.shape[0]
        pen_draft = use_pen and pen_vocab_ok
        cnt0 = sctx["counts"] if pen_draft else jnp.zeros((B, 1), jnp.int32)

        def _penalize(logits, cnt):
            return _ctx_penalize(state, sctx, logits, cnt, draft_side=True)

        def _bump(cnt, nxt):
            if pen_draft:
                return cnt.at[jnp.arange(B), nxt].add(1)
            return cnt

        fsm0 = (
            (state.fsm_lex, state.fsm_stack, state.fsm_sp)
            if fsm_draft_ok
            else None
        )

        def _fsm_mask(logits, fsm):
            if fsm is None:
                return logits
            # Runtime skip: the [B, V] table gathers only run when some
            # slot is actually constrained (same policy as the verify
            # side) — an engine built with constrain= pays nothing while
            # serving unconstrained traffic.
            return jax.lax.cond(
                jnp.any(state.fsm_lex != -1),
                lambda l: apply_mask(l, token_mask(constrain_tbl, *fsm)),
                lambda l: l.astype(jnp.float32),
                logits,
            )

        def _fsm_step(fsm, nxt):
            if fsm is None:
                return None
            return fsm_transition(constrain_tbl, *fsm, nxt)

        if not adaptive:
            def draft_body(carry, inp):
                x, cache, cnt, fsm = carry
                i, rng_i = inp
                pos = base + i  # [B]
                logits, cache = draft_apply(
                    draft_params, x[:, None], pos[:, None], cache, pos
                )
                logits = _fsm_mask(_penalize(logits[:, 0], cnt), fsm)
                nxt = sample_tokens(rng_i, logits, **_draft_samp(state, sctx, i))
                return (
                    (nxt, cache, _bump(cnt, nxt), _fsm_step(fsm, nxt)),
                    (nxt, logits if need_draft_logits else None),
                )

            (_, draft_cache, _, _), (d, draft_logits) = jax.lax.scan(
                draft_body,
                (last, state.draft_cache, cnt0, fsm0),
                (jnp.arange(K, dtype=jnp.int32), jax.random.split(rng_draft, K)),
            )
            return (
                jnp.moveaxis(d, 0, 1),  # [B, K]
                (jnp.moveaxis(draft_logits, 0, 1)  # [B, K, V]
                 if need_draft_logits else None),
                draft_cache,
            )

        # Adaptive: dynamic trip count — only eff_k draft forwards run.
        Vd = draft_model.config.vocab_size
        d_buf = jnp.zeros((B, K), jnp.int32)
        l_buf = (
            jnp.zeros((B, K, Vd), jnp.float32) if need_draft_logits else None
        )

        def cond(c):
            # eff_k is per-row ([B]); the loop runs to the active max and
            # acceptance clips each row to its own depth afterwards.
            return c[0] < sctx["eff_k_max"]

        def body(c):
            i, x, cache, db, lb, cnt, fsm = c
            pos = base + i
            logits, cache = draft_apply(
                draft_params, x[:, None], pos[:, None], cache, pos
            )
            logits = _fsm_mask(_penalize(logits[:, 0], cnt), fsm)
            nxt = sample_tokens(
                jax.random.fold_in(rng_draft, i), logits,
                **_draft_samp(state, sctx, i)
            )
            db = jax.lax.dynamic_update_index_in_dim(db, nxt, i, 1)
            if lb is not None:
                lb = jax.lax.dynamic_update_index_in_dim(lb, logits, i, 1)
            return (i + 1, nxt, cache, db, lb, _bump(cnt, nxt),
                    _fsm_step(fsm, nxt))

        _, _, draft_cache, d_buf, l_buf, _, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), last, state.draft_cache, d_buf, l_buf, cnt0,
             fsm0),
        )
        return d_buf, l_buf, draft_cache

    def _draft_medusa(state, draft_params, last, base, rng_draft, eff_k,
                      sctx):
        proj = draft_params["medusa_proj"]  # [K, D, D]
        h = state.last_hidden.astype(compute_dtype)  # [B, D]
        m_temp = float(medusa_cfg.get("temperature", 0.7))
        m_top_p = float(medusa_cfg.get("top_p", 0.9))
        B = last.shape[0]
        counts = sctx["counts"]
        fsm = (
            (state.fsm_lex, state.fsm_stack, state.fsm_sp)
            if fsm_draft_ok else None
        )
        ds, ls = [], []
        for i in range(K):
            logits_i = head_fn(
                target_params_ref[0], jnp.dot(h, proj[i].astype(h.dtype))
            )  # [B, V]
            logits_i = _ctx_penalize(state, sctx, logits_i, counts)
            if fsm is not None:
                logits_i = jax.lax.cond(
                    jnp.any(state.fsm_lex != -1),
                    lambda l, f=fsm: apply_mask(
                        l, token_mask(constrain_tbl, *f)
                    ),
                    lambda l: l.astype(jnp.float32),
                    logits_i,
                )
            d_i = sample_tokens(
                jax.random.fold_in(rng_draft, i), logits_i,
                temperature=m_temp, top_p=m_top_p, greedy=greedy,
            )
            if fsm is not None:
                fsm = fsm_transition(constrain_tbl, *fsm, d_i)
            if use_pen:
                counts = counts.at[jnp.arange(B), d_i].add(1)
            ds.append(d_i)
            if need_draft_logits:
                ls.append(logits_i)
        return (
            jnp.stack(ds, 1),
            jnp.stack(ls, 1) if need_draft_logits else None,
            state.draft_cache,
        )

    def _draft_eagle(state, draft_params, last, base, rng_draft, eff_k,
                     sctx):
        # Head drafting is one [B, D] matmul per level — drafting all K and
        # clipping acceptance to eff_k is cheaper than a dynamic loop.
        h_cur = state.last_hidden
        h_prev = state.prev_hidden
        B = last.shape[0]
        counts = sctx["counts"]
        fsm = (
            (state.fsm_lex, state.fsm_stack, state.fsm_sp)
            if fsm_draft_ok else None
        )
        ds, ls = [], []
        for i in range(K):
            h_next = h_cur + eagle_alpha * (h_cur - h_prev)
            logits_i = head_fn(
                target_params_ref[0], h_next.astype(compute_dtype)
            )  # [B, V]; greedy argmax (reference eagle.py:149-150)
            logits_i = _ctx_penalize(state, sctx, logits_i, counts)
            if fsm is not None:
                logits_i = jax.lax.cond(
                    jnp.any(state.fsm_lex != -1),
                    lambda l, f=fsm: apply_mask(
                        l, token_mask(constrain_tbl, *f)
                    ),
                    lambda l: l.astype(jnp.float32),
                    logits_i,
                )
            d_i = jnp.argmax(logits_i, axis=-1).astype(jnp.int32)
            if fsm is not None:
                fsm = fsm_transition(constrain_tbl, *fsm, d_i)
            if use_pen:
                counts = counts.at[jnp.arange(B), d_i].add(1)
            ds.append(d_i)
            if need_draft_logits:
                ls.append(logits_i)
            h_prev, h_cur = h_cur, h_next
        return (
            jnp.stack(ds, 1),
            jnp.stack(ls, 1) if need_draft_logits else None,
            state.draft_cache,
        )

    ngram_n = int((ngram_cfg or {}).get("n", 2))

    def _draft_ngram(state, draft_params, last, base, rng_draft, eff_k,
                     sctx):
        # Proposals are deterministic buffer lookups — penalties act on the
        # verify side only (wrong proposals just fail verification).
        tokens = state.tokens  # [B, T]
        B, T = tokens.shape
        N = ngram_n
        # Query: the last N committed tokens.
        qpos = state.lengths[:, None] - N + jnp.arange(N, dtype=jnp.int32)[None]
        query = jnp.take_along_axis(tokens, jnp.clip(qpos, 0, T - 1), axis=1)
        # Window at position p is tokens[p : p+N] (N rolled views stacked).
        shifted = jnp.stack(
            [jnp.roll(tokens, -i, axis=1) for i in range(N)], axis=-1
        )  # [B, T, N]
        match = jnp.all(shifted == query[:, None, :], axis=-1)  # [B, T]
        pos = jnp.arange(T, dtype=jnp.int32)[None, :]
        # Candidates fully inside the committed prefix, strictly before the
        # query's own occurrence at lengths-N.
        hit = match & (pos < state.lengths[:, None] - N)
        any_hit = jnp.any(hit, axis=1)
        best = jnp.argmax(jnp.where(hit, pos, -1), axis=1).astype(jnp.int32)
        # Propose the K tokens after the matched n-gram; where the
        # continuation leaves the committed region (or no match), repeat
        # the last token — wrong guesses just get rejected.
        prop_pos = best[:, None] + N + jnp.arange(K, dtype=jnp.int32)[None]
        cont = jnp.take_along_axis(tokens, jnp.clip(prop_pos, 0, T - 1), axis=1)
        usable = any_hit[:, None] & (prop_pos < state.lengths[:, None])
        d = jnp.where(usable, cont, last[:, None])
        if not need_draft_logits:
            return d, None, state.draft_cache
        # Point-mass pseudo draft logits: the proposal is deterministic, so
        # confidence-style policies (and rejection's p_d) see certainty 1.
        V = target_model.config.vocab_size
        onehot = jnp.arange(V, dtype=jnp.int32)[None, None, :] == d[..., None]
        draft_logits = jnp.where(onehot, 0.0, -30.0).astype(jnp.float32)
        return d, draft_logits, state.draft_cache

    draft_fn = {
        "vanilla": _draft_vanilla,
        "medusa": _draft_medusa,
        "eagle": _draft_eagle,
        "ngram": _draft_ngram,
    }[draft_mode]
    # Medusa/EAGLE heads need the target params inside the draft closure;
    # threaded via this one-element ref set per call (keeps draft_fn
    # signatures uniform without passing target_params through every mode).
    target_params_ref = [None]

    def step(target_params, draft_params, state: DecodeState) -> DecodeState:
        B = state.tokens.shape[0]
        max_len = state.tokens.shape[1]
        rng, rng_draft, rng_policy, rng_bonus = jax.random.split(state.rng, 4)
        last = _gather_last(state.tokens, state.lengths)  # [B]
        base = state.lengths - 1  # write/read offset: cache holds [0, L-1)
        # Per-slot adaptive K: eff_k is [B]; the draft while_loop runs to
        # the max over ACTIVE rows (inactive rows must not extend it) and
        # each row's acceptance clips to its own depth.
        if adaptive:
            eff_k = jnp.clip(state.ctrl_k, a_min_k, K)  # [B]
            eff_k_max = jnp.max(jnp.where(state.active, eff_k, a_min_k))
        else:
            eff_k = jnp.full((B,), K, jnp.int32)
            eff_k_max = jnp.int32(K)

        # ---- 1. Draft K tokens ----
        target_params_ref[0] = target_params
        Vt = target_model.config.vocab_size
        sctx = {"counts": None, "pen_active": None,
                "bias_active": None, "bias_row": None, "row_keys": None,
                "eff_k_max": eff_k_max}
        if per_request_sampling:
            # Per-slot seed stream: fold the slot key with the committed
            # length (strictly increases every step a slot is active), so
            # every step draws fresh per-row keys that depend only on the
            # request's own seed and progress (OpenAI `seed` semantics).
            sctx["row_keys"] = jax.vmap(jax.random.fold_in)(
                state.slot_rng, state.lengths
            )
        if use_pen:
            mk_counts = lambda: token_counts(state.tokens, state.lengths, Vt)
            if per_request_sampling:
                # Runtime skip: no slot has penalties on -> no counts
                # scatter, no penalty math anywhere this step.
                sctx["pen_active"] = (
                    jnp.any(state.rep_penalty != 1.0)
                    | jnp.any(state.presence_penalty != 0.0)
                    | jnp.any(state.freq_penalty != 0.0)
                )
                sctx["counts"] = jax.lax.cond(
                    sctx["pen_active"], mk_counts,
                    lambda: jnp.zeros((B, Vt), jnp.int32),
                )
            else:
                sctx["counts"] = mk_counts()
        if use_bias:
            sctx["bias_active"] = jnp.any(state.bias_ids >= 0)
            sctx["bias_row"] = jax.lax.cond(
                sctx["bias_active"],
                lambda: logit_bias_row(state.bias_ids, state.bias_vals, Vt),
                lambda: jnp.zeros((B, Vt), jnp.float32),
            )
        d, draft_logits, draft_cache = draft_fn(
            state, draft_params, last, base, rng_draft, eff_k, sctx
        )

        # ---- 2. Verify: ONE forward over K+1 positions ----
        verify_in = jnp.concatenate([last[:, None], d], axis=1)  # [B, K+1]
        positions = base[:, None] + jnp.arange(K + 1, dtype=jnp.int32)[None, :]
        target_logits, target_cache, hidden = target_apply(
            target_params, verify_in, positions, state.target_cache, base,
            return_hidden=True, lora_ids=state.lora_ids,
        )  # [B, K+1, V], cache, [B, K+1, D]
        if use_pen:
            # Verify row i predicts write-slot i having seen prefix +
            # d_0..d_{i-1}: penalize with exactly those incremental counts
            # (matches what the draft loop saw when it proposed d_i, so
            # greedy spec == greedy penalized baseline, token for token).
            def pen_verify(tl):
                inc = jnp.cumsum(
                    jax.nn.one_hot(d, Vt, dtype=jnp.int32), axis=1
                )  # [B, K, Vt]
                window_counts = sctx["counts"][:, None, :] + jnp.concatenate(
                    [jnp.zeros_like(inc[:, :1]), inc], axis=1
                )  # [B, K+1, Vt]
                return apply_penalties(
                    tl, window_counts, *_pen_params(state)
                )

            tl32 = target_logits.astype(jnp.float32)
            target_logits = (
                pen_verify(tl32)
                if sctx["pen_active"] is None
                else jax.lax.cond(
                    sctx["pen_active"], pen_verify, lambda t: t, tl32
                )
            )
        if use_bias:
            target_logits = jax.lax.cond(
                sctx["bias_active"],
                lambda t: t + sctx["bias_row"][:, None, :],
                lambda t: t,
                target_logits.astype(jnp.float32),
            )

        # Grammar constraint, verify side (the soundness guarantee): walk
        # the draft window through the FSM and -inf every invalid token at
        # every verify position. Skipped at runtime when no slot is
        # constrained (the gathers read ~[B, K, V] of table rows).
        if use_fsm:
            fsm_lexs, fsm_stacks, fsm_sps = walk_window(
                constrain_tbl, state.fsm_lex, state.fsm_stack,
                state.fsm_sp, d,
            )
            any_fsm = jnp.any(state.fsm_lex != -1)
            target_logits = jax.lax.cond(
                any_fsm,
                lambda t: apply_mask(
                    t, window_mask(
                        constrain_tbl, fsm_lexs, fsm_stacks, fsm_sps
                    ),
                ),
                lambda t: t.astype(jnp.float32),
                target_logits,
            )

        # ---- 3. Acceptance ---- (the stochastic `rejection` policy is
        # build-time incompatible with per_request_sampling, so acceptance
        # draws never need per-slot seed streams here)
        a = policy_fn(rng_policy, d, draft_logits, target_logits,
                      **policy_params)
        a = jnp.clip(a, 0, K)
        if adaptive:
            # Positions beyond the row's effective K were never really
            # proposed.
            a = jnp.minimum(a, eff_k)
            # Device-side controller update, PER SLOT (reference hysteresis
            # rule, controllers.py:109-118, applied per sequence): each
            # active row tracks its own acceptance EMA and steps its own K
            # — serving mixes hard and easy requests at different depths.
            rate = a.astype(jnp.float32) / jnp.maximum(
                eff_k, 1
            ).astype(jnp.float32)
            new_ema = jnp.where(
                state.active,
                state.acc_ema + a_alpha * (rate - state.acc_ema),
                state.acc_ema,
            )
            stepped = jnp.where(
                new_ema > a_target + 0.1,
                jnp.minimum(state.ctrl_k + a_step, K),
                jnp.where(
                    new_ema < a_target - 0.1,
                    jnp.maximum(state.ctrl_k - a_step, a_min_k),
                    state.ctrl_k,
                ),
            )
            new_ctrl_k = jnp.where(state.active, stepped, state.ctrl_k)
        else:
            new_ema, new_ctrl_k = state.acc_ema, state.ctrl_k

        # ---- 4. Bonus token ----
        if use_rejection_bonus:
            # Already a FINAL log-prob distribution (filters + temperature
            # applied inside) — sample it raw or it would be scaled twice.
            bonus_logits = rejection_bonus_logits(
                draft_logits, target_logits, a, temperature=temperature,
                top_k=top_k, top_p=top_p, min_p=min_p,
                draft_temperature=draft_temp, draft_greedy=greedy,
            )
            bonus = sample_tokens(
                rng_bonus, bonus_logits, temperature=1.0, greedy=greedy,
                row_keys=(
                    fold_rows(sctx["row_keys"], K)
                    if per_request_sampling else None
                ),
            )
        else:
            bonus_logits = jnp.take_along_axis(
                target_logits, a[:, None, None], axis=1
            )[:, 0]
            if per_request_sampling:
                bonus = sample_tokens(
                    rng_bonus, bonus_logits, temperature=state.temperature,
                    top_k=state.top_k, top_p=state.top_p, min_p=state.min_p,
                    greedy=False,
                    row_keys=fold_rows(sctx["row_keys"], K),  # site id K:
                    # draft sites are 0..K-1, so the bonus never collides
                )
            else:
                bonus = sample_tokens(
                    rng_bonus, bonus_logits, temperature=temperature,
                    top_k=top_k, top_p=top_p, min_p=min_p, greedy=greedy,
                )

        # ---- 5. Commit ----
        # Slot values: accepted draft tokens then the bonus everywhere after
        # (only slot `a` of the tail matters — length stops there).
        arange = jnp.arange(K + 1, dtype=jnp.int32)[None, :]
        d_pad = jnp.concatenate([d, d[:, -1:]], axis=1)  # [B, K+1]
        write_vals = jnp.where(arange < a[:, None], d_pad, bonus[:, None])

        commit = a + 1
        if eos_token_id is not None:
            is_eos = (write_vals == eos_token_id) & (arange < commit[:, None])
            any_eos = jnp.any(is_eos, axis=1)
            first_eos = jnp.argmax(is_eos, axis=1).astype(jnp.int32)
            commit = jnp.where(any_eos, first_eos + 1, commit)
        # Per-sequence generation budget (state.max_new): server requests
        # carry their own max_tokens (reference API contract; round-1
        # ADVICE.md finding — the budget must not be a compile-time constant).
        remaining = state.prompt_lens + state.max_new - state.lengths
        commit = jnp.minimum(commit, jnp.maximum(remaining, 0))
        commit = jnp.minimum(commit, max_len - state.lengths - 1)
        commit = jnp.where(state.active, commit, 0)

        # Constraint FSM advance by exactly the committed tokens: walked
        # draft states up to `commit`, plus one bonus transition when the
        # bonus committed (commit == a+1). Unconstrained slots are frozen
        # inside transition/walk (lex < 0).
        if use_fsm:
            D_fsm = state.fsm_stack.shape[1]
            idx = jnp.minimum(commit, K)
            lex_c = jnp.take_along_axis(fsm_lexs, idx[:, None], 1)[:, 0]
            stack_c = jnp.take_along_axis(
                fsm_stacks,
                jnp.broadcast_to(idx[:, None, None], (B, 1, D_fsm)), 1,
            )[:, 0]
            sp_c = jnp.take_along_axis(fsm_sps, idx[:, None], 1)[:, 0]
            lex_a = jnp.take_along_axis(fsm_lexs, a[:, None], 1)[:, 0]
            stack_a = jnp.take_along_axis(
                fsm_stacks,
                jnp.broadcast_to(a[:, None, None], (B, 1, D_fsm)), 1,
            )[:, 0]
            sp_a = jnp.take_along_axis(fsm_sps, a[:, None], 1)[:, 0]
            bl, bst, bsp = fsm_transition(
                constrain_tbl, lex_a, stack_a, sp_a, bonus
            )
            use_b = commit == a + 1
            new_fsm_lex = jnp.where(use_b, bl, lex_c)
            new_fsm_stack = jnp.where(use_b[:, None], bst, stack_c)
            new_fsm_sp = jnp.where(use_b, bsp, sp_c)
            new_fsm_lex = jnp.where(
                state.active, new_fsm_lex, state.fsm_lex
            )
            new_fsm_stack = jnp.where(
                state.active[:, None], new_fsm_stack, state.fsm_stack
            )
            new_fsm_sp = jnp.where(state.active, new_fsm_sp, state.fsm_sp)
        else:
            new_fsm_lex = state.fsm_lex
            new_fsm_stack = state.fsm_stack
            new_fsm_sp = state.fsm_sp

        def write(tok_b, vals_b, start):
            return jax.lax.dynamic_update_slice(tok_b, vals_b, (start,))

        new_tokens = jax.vmap(write)(state.tokens, write_vals, state.lengths)
        # Inactive lanes wrote junk beyond their length — harmless by the
        # state invariant, but keep the buffer bit-stable for determinism:
        new_tokens = jnp.where(state.active[:, None], new_tokens, state.tokens)

        # Target log-prob of every committed token (the verify logits cover
        # every slot: row i is the target distribution at write slot i —
        # accepted drafts at their own rows, the bonus at row a). Free
        # observability: powers the OpenAI logprobs field.
        logz = jax.scipy.special.logsumexp(target_logits, axis=-1)  # [B, K+1]
        tok_logit = jnp.take_along_axis(
            target_logits, write_vals[..., None], axis=-1
        )[..., 0]
        new_lp = jax.vmap(write)(
            state.token_logprobs, tok_logit - logz, state.lengths
        )
        new_lp = jnp.where(state.active[:, None], new_lp, state.token_logprobs)
        if logprobs_topk:
            # Top-N alternatives at every write slot — free observability
            # from the verify logits (OpenAI `logprobs: N`).
            tvals, tids = jax.lax.top_k(target_logits, logprobs_topk)
            tlps = tvals - logz[..., None]  # [B, K+1, N]

            def write2(buf_b, vals_b, start):
                return jax.lax.dynamic_update_slice(buf_b, vals_b, (start, 0))

            new_tids = jax.vmap(write2)(state.top_ids, tids, state.lengths)
            new_tlps = jax.vmap(write2)(state.top_lps, tlps, state.lengths)
            act2 = state.active[:, None, None]
            new_tids = jnp.where(act2, new_tids, state.top_ids)
            new_tlps = jnp.where(act2, new_tlps, state.top_lps)
        else:
            new_tids, new_tlps = state.top_ids, state.top_lps

        new_lengths = state.lengths + commit
        hit_eos = (
            jnp.any(
                (write_vals == eos_token_id) & (arange < commit[:, None]), axis=1
            )
            if eos_token_id is not None
            else jnp.zeros((B,), jnp.bool_)
        )
        exhausted = (new_lengths - state.prompt_lens) >= state.max_new
        # Next step needs room for K+1 writes starting at new_lengths-1.
        no_room = new_lengths + K + 1 > max_len
        new_active = state.active & ~hit_eos & ~exhausted & ~no_room

        # Hidden carry for Medusa/EAGLE: the hidden row that predicted the
        # bonus token becomes last_hidden (frozen for inactive lanes).
        h_row = jnp.take_along_axis(hidden, a[:, None, None], axis=1)[:, 0].astype(
            jnp.float32
        )
        new_last_hidden = jnp.where(state.active[:, None], h_row, state.last_hidden)
        new_prev_hidden = jnp.where(
            state.active[:, None], state.last_hidden, state.prev_hidden
        )

        act = state.active.astype(jnp.int32)
        return state.replace(
            tokens=new_tokens,
            lengths=new_lengths,
            active=new_active,
            target_cache=target_cache,
            draft_cache=draft_cache,
            rng=rng,
            proposed=state.proposed + eff_k * act,
            accepted=state.accepted + a * act,
            bonus=state.bonus + act,
            steps=state.steps + 1,
            last_hidden=new_last_hidden,
            prev_hidden=new_prev_hidden,
            ctrl_k=new_ctrl_k,
            acc_ema=new_ema,
            token_logprobs=new_lp,
            top_ids=new_tids,
            top_lps=new_tlps,
            fsm_lex=new_fsm_lex,
            fsm_stack=new_fsm_stack,
            fsm_sp=new_fsm_sp,
        )

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(2,) if donate else ())


def make_decode_loop(step_fn, max_steps: int, is_spec: bool = True,
                     donate: bool = True, dynamic: bool = False,
                     jit: bool = True):
    """Wrap an UNJITTED step function in a device-side lax.while_loop.

    One dispatch decodes everything: the loop exits exactly when all lanes
    are inactive (or at the max_steps safety cap), with ZERO host round
    trips. This matters enormously on remote/tunneled TPUs where a host
    completion poll costs a full RTT (measured ~27 ms here vs ~3 ms of step
    compute for a 3B model); it is also the idiomatic XLA structure — the
    whole generation is one compiled program. The host-loop path in
    core/engine.py remains for adaptive-K (K changes shapes) and per-step
    profiling.

    dynamic=True adds a traced `n_steps` bound (clamped to the static
    max_steps cap) so the continuous batcher can end a chunk exactly at
    the earliest guaranteed lane retirement with ONE compiled loop —
    per-value static bounds would recompile the whole decode program for
    every distinct chunk length the scheduler picks.
    """

    if dynamic:
        def loop_dyn(target_params, draft_params, state: DecodeState,
                     n_steps):
            start = state.steps
            cap = jnp.minimum(
                jnp.asarray(max_steps, jnp.int32),
                jnp.asarray(n_steps, jnp.int32),
            )

            def cond(s: DecodeState):
                return jnp.any(s.active) & (s.steps - start < cap)

            def body(s: DecodeState):
                if is_spec:
                    return step_fn(target_params, draft_params, s)
                return step_fn(target_params, s)

            return jax.lax.while_loop(cond, body, state)

        if not jit:
            return loop_dyn  # composed into a larger jit (fused admit+chunk)
        return jax.jit(loop_dyn, donate_argnums=(2,) if donate else ())

    def loop(target_params, draft_params, state: DecodeState):
        start = state.steps

        def cond(s: DecodeState):
            return jnp.any(s.active) & (s.steps - start < max_steps)

        def body(s: DecodeState):
            if is_spec:
                return step_fn(target_params, draft_params, s)
            return step_fn(target_params, s)

        return jax.lax.while_loop(cond, body, state)

    if not jit:
        return loop
    return jax.jit(loop, donate_argnums=(2,) if donate else ())


def make_baseline_step(
    target_model,
    *,
    greedy: bool = True,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    min_p: float = 0.0,
    repetition_penalty: float = 1.0,
    presence_penalty: float = 0.0,
    frequency_penalty: float = 0.0,
    eos_token_id: Optional[int] = None,
    per_request_sampling: bool = False,
    logprobs_topk: int = 0,
    constrain_tbl=None,
    donate: bool = True,
    jit: bool = True,
):
    """Non-speculative decode step: forward the last token, sample one
    (reference `_generate_batch_baseline`, pipeline.py:1415-1603).
    Ignores the draft cache in the state."""
    target_apply = target_model.apply_fn
    use_pen = per_request_sampling or (
        repetition_penalty != 1.0
        or presence_penalty != 0.0
        or frequency_penalty != 0.0
    )
    if constrain_tbl is not None:
        from llm_inference_lab_tpu.constrain.runtime import (
            apply_mask,
            token_mask,
            transition as fsm_transition,
        )

    def step(target_params, state: DecodeState) -> DecodeState:
        max_len = state.tokens.shape[1]
        rng, rng_s = jax.random.split(state.rng)
        last = _gather_last(state.tokens, state.lengths)
        base = state.lengths - 1
        logits, target_cache = target_apply(
            target_params, last[:, None], base[:, None], state.target_cache,
            base, lora_ids=state.lora_ids,
        )
        row = logits[:, 0].astype(jnp.float32)
        if use_pen:
            Vt = target_model.config.vocab_size
            B0 = row.shape[0]
            pen = (
                (state.rep_penalty, state.presence_penalty, state.freq_penalty)
                if per_request_sampling
                else (repetition_penalty, presence_penalty, frequency_penalty)
            )

            def pen_row(r):
                counts = token_counts(state.tokens, state.lengths, Vt)
                return apply_penalties(r, counts, *pen)

            if per_request_sampling:
                pen_active = (
                    jnp.any(state.rep_penalty != 1.0)
                    | jnp.any(state.presence_penalty != 0.0)
                    | jnp.any(state.freq_penalty != 0.0)
                )
                row = jax.lax.cond(pen_active, pen_row, lambda r: r, row)
            else:
                row = pen_row(row)
        if per_request_sampling:
            bias_active = jnp.any(state.bias_ids >= 0)
            row = jax.lax.cond(
                bias_active,
                lambda r: r + logit_bias_row(
                    state.bias_ids, state.bias_vals, row.shape[-1]
                ),
                lambda r: r,
                row,
            )
        if constrain_tbl is not None:
            row = jax.lax.cond(
                jnp.any(state.fsm_lex != -1),
                lambda r: apply_mask(
                    r, token_mask(constrain_tbl, state.fsm_lex,
                                  state.fsm_stack, state.fsm_sp),
                ),
                lambda r: r,
                row,
            )
        if per_request_sampling:
            nxt = sample_tokens(
                rng_s, row, temperature=state.temperature,
                top_k=state.top_k, top_p=state.top_p, min_p=state.min_p,
                greedy=False,
                # Per-request seed stream (same derivation as the spec
                # step: slot key folded with committed length).
                row_keys=jax.vmap(jax.random.fold_in)(
                    state.slot_rng, state.lengths
                ),
            )
        else:
            nxt = sample_tokens(
                rng_s, row, temperature=temperature, top_k=top_k,
                top_p=top_p, min_p=min_p, greedy=greedy,
            )
        commit = jnp.where(state.active, 1, 0)
        remaining = state.prompt_lens + state.max_new - state.lengths
        commit = jnp.minimum(commit, jnp.maximum(remaining, 0))
        if constrain_tbl is not None:
            new_fsm = fsm_transition(
                constrain_tbl, state.fsm_lex, state.fsm_stack,
                state.fsm_sp, nxt, active=state.active & (commit > 0),
            )
        else:
            new_fsm = (state.fsm_lex, state.fsm_stack, state.fsm_sp)
        new_tokens = jax.vmap(
            lambda t, v, s: jax.lax.dynamic_update_slice(t, v[None], (s,))
        )(state.tokens, nxt, state.lengths)
        new_tokens = jnp.where(state.active[:, None], new_tokens, state.tokens)
        # `row` is the (possibly penalty-adjusted) sampling distribution —
        # reported logprobs describe what was actually sampled from.
        lp = jnp.take_along_axis(row, nxt[:, None], axis=-1)[
            :, 0
        ] - jax.scipy.special.logsumexp(row, axis=-1)
        new_lp = jax.vmap(
            lambda t, v, s: jax.lax.dynamic_update_slice(t, v[None], (s,))
        )(state.token_logprobs, lp, state.lengths)
        new_lp = jnp.where(state.active[:, None], new_lp, state.token_logprobs)
        if logprobs_topk:
            tvals, tids = jax.lax.top_k(row, logprobs_topk)  # [B, N]
            tlps = tvals - jax.scipy.special.logsumexp(row, axis=-1)[:, None]
            w2 = jax.vmap(
                lambda t, v, s: jax.lax.dynamic_update_slice(t, v[None], (s, 0))
            )
            new_tids = w2(state.top_ids, tids, state.lengths)
            new_tlps = w2(state.top_lps, tlps, state.lengths)
            act2 = state.active[:, None, None]
            new_tids = jnp.where(act2, new_tids, state.top_ids)
            new_tlps = jnp.where(act2, new_tlps, state.top_lps)
        else:
            new_tids, new_tlps = state.top_ids, state.top_lps
        new_lengths = state.lengths + commit
        hit_eos = (
            (nxt == eos_token_id) & (commit > 0)
            if eos_token_id is not None
            else jnp.zeros_like(state.active)
        )
        exhausted = (new_lengths - state.prompt_lens) >= state.max_new
        no_room = new_lengths + 2 > max_len
        return state.replace(
            tokens=new_tokens,
            lengths=new_lengths,
            active=state.active & ~hit_eos & ~exhausted & ~no_room,
            target_cache=target_cache,
            rng=rng,
            bonus=state.bonus + commit,
            steps=state.steps + 1,
            token_logprobs=new_lp,
            top_ids=new_tids,
            top_lps=new_tlps,
            fsm_lex=new_fsm[0],
            fsm_stack=new_fsm[1],
            fsm_sp=new_fsm[2],
        )

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(1,) if donate else ())


def make_prefill(target_model, draft_model, prefill_draft: bool = True,
                 chunk: int = None, context_parallel: tuple = None):
    """Jitted prompt prefill: populate both caches over the padded prompt
    block in one forward each. Prompts are right-padded; junk KV rows beyond
    each prompt's length sit at positions the attention mask never reaches
    until they are overwritten (see ops/attention.py masking rule).

    With `chunk` set and P > chunk, the prompt is prefilled in a lax.scan of
    fixed-size chunks: chunk i's queries attend to the cache rows chunks
    0..i-1 already wrote plus its own freshly-written rows — activation
    memory is O(chunk * d_model) instead of O(P * d_model), which is what
    makes >=16k-token prompts fit (long-context axis; the reference has no
    chunked prefill, hf_wrappers.py:98 runs one sdpa over the whole prompt).

    Prompt logprobs ride for free: the prefill logits (already computed by
    the forward) score each prompt token given its prefix, written into
    DecodeState.token_logprobs[1:plen] (position 0 has no conditional) —
    the OpenAI echo+logprobs / vLLM prompt_logprobs surface. Computed as
    gathered-logit minus logsumexp, never materializing a [B, P, V]
    log-softmax."""
    target_apply = target_model.apply_fn
    draft_apply = draft_model.apply_fn if draft_model is not None else None

    @partial(jax.jit, donate_argnums=(2,))
    def prefill(
        target_params, draft_params, state: DecodeState,
        prompt_block: jax.Array,  # [B, P] right-padded prompt tokens
        prompt_lens: jax.Array,  # [B]
    ) -> DecodeState:
        B, P = prompt_block.shape
        # The hidden row that predicted the last prompt token (index
        # plen-2, clamped) seeds the Medusa/EAGLE carry.
        h_idx = jnp.maximum(prompt_lens - 2, 0)

        if chunk is not None and P > chunk:
            assert P % chunk == 0, (P, chunk)
            NC = P // chunk
            toks = jnp.swapaxes(
                prompt_block.reshape(B, NC, chunk), 0, 1
            )  # [NC, B, C]
            arange_c = jnp.arange(chunk, dtype=jnp.int32)

            # Next-token targets for prompt scoring: row j of chunk i
            # predicts prompt position i*chunk+j+1.
            shifted = jnp.roll(prompt_block, -1, axis=1)

            def body(carry, xs):
                tc, dc, h, lpbuf = carry
                i, tok = xs
                positions = i * chunk + jnp.broadcast_to(
                    arange_c[None], (B, chunk)
                )
                start = jnp.full((B,), i * chunk, jnp.int32)
                lg, tc, hid = target_apply(
                    target_params, tok, positions, tc, start,
                    return_hidden=True, lora_ids=state.lora_ids,
                )
                if prefill_draft and draft_apply is not None:
                    _, dc = draft_apply(draft_params, tok, positions, dc, start)
                nxt = jax.lax.dynamic_slice(
                    shifted, (0, i * chunk), (B, chunk)
                )
                lg32 = lg.astype(jnp.float32)
                row_lp = jnp.take_along_axis(
                    lg32, nxt[..., None], axis=-1
                )[..., 0] - jax.scipy.special.logsumexp(lg32, axis=-1)
                valid = (positions + 1) < prompt_lens[:, None]
                row_lp = jnp.where(valid, row_lp, 0.0)
                lpbuf = jax.lax.dynamic_update_slice(
                    lpbuf, row_lp, (0, i * chunk + 1)
                )
                local = h_idx - i * chunk
                sel = jnp.take_along_axis(
                    hid, jnp.clip(local, 0, chunk - 1)[:, None, None], axis=1
                )[:, 0].astype(jnp.float32)
                in_chunk = ((local >= 0) & (local < chunk))[:, None]
                return (tc, dc, jnp.where(in_chunk, sel, h), lpbuf), None

            (target_cache, draft_cache, h_last, lp_buf), _ = jax.lax.scan(
                body,
                (state.target_cache, state.draft_cache,
                 jnp.zeros_like(state.last_hidden), state.token_logprobs),
                (jnp.arange(NC, dtype=jnp.int32), toks),
            )
        else:
            positions = jnp.broadcast_to(
                jnp.arange(P, dtype=jnp.int32)[None], (B, P)
            )
            zeros = jnp.zeros((B,), jnp.int32)
            # Context-parallel (ring-attention) prefill only applies to the
            # single-shot path: the block is the whole sequence, so attention
            # is pure causal self-attention (parallel/context.py).
            cp_kw = {"cp": context_parallel} if context_parallel else {}
            lg, target_cache, hidden = target_apply(
                target_params, prompt_block, positions, state.target_cache,
                zeros, return_hidden=True, lora_ids=state.lora_ids, **cp_kw,
            )
            if prefill_draft and draft_apply is not None:
                _, draft_cache = draft_apply(
                    draft_params, prompt_block, positions, state.draft_cache,
                    zeros, **cp_kw,
                )
            else:
                draft_cache = state.draft_cache
            h_last = jnp.take_along_axis(
                hidden, h_idx[:, None, None], axis=1
            )[:, 0].astype(jnp.float32)
            lg32 = lg[:, :-1].astype(jnp.float32)
            row_lp = jnp.take_along_axis(
                lg32, prompt_block[:, 1:, None], axis=-1
            )[..., 0] - jax.scipy.special.logsumexp(lg32, axis=-1)
            valid = (positions[:, 1:]) < prompt_lens[:, None]
            row_lp = jnp.where(valid, row_lp, 0.0)
            lp_buf = jax.lax.dynamic_update_slice(
                state.token_logprobs, row_lp, (0, 1)
            )
        tokens = jax.lax.dynamic_update_slice(
            state.tokens, prompt_block, (0, 0)
        )
        return state.replace(
            tokens=tokens,
            lengths=prompt_lens,
            prompt_lens=prompt_lens,
            active=prompt_lens > 0,
            target_cache=target_cache,
            draft_cache=draft_cache,
            last_hidden=h_last,
            prev_hidden=h_last,
            token_logprobs=lp_buf,
        )

    return prefill
