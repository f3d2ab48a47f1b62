"""DecodeState: the complete, immutable, device-resident decoding state.

This single pytree replaces the reference's scattered mutable state
(sequence lists, SafeKVCacheManager dicts, per-sequence Python bookkeeping —
src/specdec/core/pipeline.py:1767-1934). Every spec step is
``state -> state`` with donated buffers, so XLA updates it in place.

Invariants
----------
* ``tokens[b, :lengths[b]]`` are the committed tokens of sequence b; the
  buffer beyond is scratch.
* Both KV caches hold exactly the committed tokens ``[0, lengths[b]-1)`` —
  everything except the last committed token (the "cache-tail invariant",
  see models/base.py). Cache slot index == absolute position.
* ``active[b]`` is False once b hit EOS / max_new_tokens / buffer end;
  inactive lanes still flow through the batched step but commit nothing.
"""

from __future__ import annotations

import flax.struct as struct

from llm_inference_lab_tpu.constrain.runtime import (
    STACK_DEPTH as _FSM_STACK_DEPTH,
)
import jax
import jax.numpy as jnp

from llm_inference_lab_tpu.models.base import KVCache, Model


@struct.dataclass
class DecodeState:
    tokens: jax.Array  # [B, max_len] int32
    lengths: jax.Array  # [B] int32 — committed length L
    prompt_lens: jax.Array  # [B] int32
    max_new: jax.Array  # [B] int32 — per-sequence generation budget
    active: jax.Array  # [B] bool
    target_cache: KVCache
    draft_cache: KVCache
    rng: jax.Array
    # Device-side metric accumulators (polled, never per-step synced)
    proposed: jax.Array  # [B] int32 — draft tokens proposed
    accepted: jax.Array  # [B] int32 — draft tokens accepted
    bonus: jax.Array  # [B] int32 — bonus/fallback tokens emitted
    steps: jax.Array  # [] int32
    # Hidden-state carry for Medusa/EAGLE draft heads (core/draft_modes.py):
    # target hidden at the position that predicted the latest bonus token,
    # and the previous step's value (EAGLE extrapolation history,
    # reference modes/eagle.py:178-183).
    last_hidden: jax.Array  # [B, D_target] float32
    prev_hidden: jax.Array  # [B, D_target] float32
    # Device-side adaptive-K controller state (reference AdaptiveKController
    # semantics, controllers.py:109-118, moved INTO the compiled step so the
    # one-dispatch decode loop keeps adapting with zero host round trips).
    # PER-SLOT ([B]): serving mixes heterogeneous requests, so each row
    # adapts its own draft depth; the draft loop's trip count is the max
    # over active rows and acceptance clips per row (round-3 VERDICT #8).
    ctrl_k: jax.Array  # [B] int32 — current effective draft length per slot
    acc_ema: jax.Array  # [B] float32 — acceptance-rate EMA per slot
    # Per-sequence sampling parameters (OpenAI per-request temperature /
    # top_k / top_p). Read by steps built with per_request_sampling=True;
    # temperature <= 0 means greedy for that row. Ignored (engine-config
    # scalars compiled in) otherwise.
    temperature: jax.Array  # [B] float32
    top_k: jax.Array  # [B] int32
    top_p: jax.Array  # [B] float32
    min_p: jax.Array  # [B] float32 — vLLM min-p filter; 0.0 = off
    # Multi-LoRA serving (models/lora.py): which adapter each slot decodes
    # with; -1 = base model. The forward gathers the slot's A/B rows from
    # the stacked pack in params["layers"].
    lora_ids: jax.Array  # [B] int32
    # Grammar-constrained decoding (constrain/runtime.py): per-slot FSM.
    # fsm_lex -1 = unconstrained slot, -2 = dead (invalid token slipped
    # in — masks collapse to EOS-only); >= 0 = lexer state of the JSON
    # pushdown automaton. The nesting stack is explicit per slot.
    fsm_lex: jax.Array    # [B] int32
    fsm_stack: jax.Array  # [B, FSM_DEPTH] int32
    fsm_sp: jax.Array     # [B] int32
    # Per-slot sampling PRNG key (OpenAI per-request `seed`). Sampling
    # sites in per-request steps draw row-wise from
    # fold_in(slot_rng[b], lengths[b], site) so a request's token stream
    # depends only on its own seed/params/prompt — NOT on batch
    # composition or slot index. Set at admission; requests without a
    # seed get a deterministic per-request key from the engine seed.
    slot_rng: jax.Array  # [B, 2] uint32
    # Per-sequence penalty parameters (OpenAI presence/frequency, HF
    # repetition). Disabled values (1.0 / 0.0 / 0.0) are the defaults; only
    # steps built with per_request_sampling=True (or static engine-config
    # penalties) read them. Counts come from the token buffer at step time —
    # no extra state to maintain.
    rep_penalty: jax.Array  # [B] float32 — 1.0 = off
    presence_penalty: jax.Array  # [B] float32 — 0.0 = off
    freq_penalty: jax.Array  # [B] float32 — 0.0 = off
    # OpenAI logit_bias: fixed-width per-slot (token id, additive bias)
    # pairs; id -1 = empty. Shape-static so serving steps stay compiled.
    bias_ids: jax.Array  # [B, N_BIAS] int32
    bias_vals: jax.Array  # [B, N_BIAS] float32
    # Target-model log-prob of each committed token (written alongside the
    # token at commit; prompt positions stay 0). Powers the OpenAI
    # `logprobs` response field and perplexity-style quality checks with no
    # extra forward (the verify pass already has the logits).
    token_logprobs: jax.Array  # [B, max_len] float32
    # Top-N alternative tokens + log-probs per committed position (OpenAI
    # `logprobs: N` / chat `top_logprobs`). Sized [B, max_len, N] when the
    # engine is built with logprobs_topk=N; [B, 1, 1] placeholders when off
    # (pytree stays uniform). Captured from the verify logits at commit —
    # no extra forward.
    top_ids: jax.Array  # [B, max_len|1, N|1] int32
    top_lps: jax.Array  # [B, max_len|1, N|1] float32


def init_state(
    target_model: Model,
    draft_model: Model | None,
    batch_size: int,
    max_seq_len: int,
    seed: int = 0,
    kv_quantized: bool = False,
    max_new_tokens: int = 64,
    init_k: int = 4,
    paged: bool = False,
    page_size: int = 64,
    n_pages: int | None = None,
    table=None,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    min_p: float = 0.0,
    repetition_penalty: float = 1.0,
    presence_penalty: float = 0.0,
    frequency_penalty: float = 0.0,
    n_bias: int = 32,
    logprobs_topk: int = 0,
    fsm_init: int = -1,  # -1 = unconstrained; else initial lexer state
    lora_id: int = -1,  # -1 = base model; else adapter index in the pack
) -> DecodeState:
    B = batch_size
    kv_kw = dict(quantized=kv_quantized)
    if paged:
        kv_kw.update(paged=True, page_size=page_size, n_pages=n_pages, table=table)
    # Baseline / Medusa / EAGLE modes have no autoregressive draft model;
    # keep a minimal placeholder cache so the state pytree is uniform.
    draft_cache = (
        draft_model.init_cache(B, max_seq_len, **kv_kw)
        if draft_model is not None
        else KVCache(
            k=jnp.zeros((1, B, 1, 1, 1), target_model.config.dtype),
            v=jnp.zeros((1, B, 1, 1, 1), target_model.config.dtype),
            k_scale=jnp.ones((1, B, 1, 1), jnp.float32),
            v_scale=jnp.ones((1, B, 1, 1), jnp.float32),
        )
    )
    return DecodeState(
        tokens=jnp.zeros((B, max_seq_len), jnp.int32),
        lengths=jnp.zeros((B,), jnp.int32),
        prompt_lens=jnp.zeros((B,), jnp.int32),
        max_new=jnp.full((B,), max_new_tokens, jnp.int32),
        active=jnp.zeros((B,), jnp.bool_),
        target_cache=target_model.init_cache(B, max_seq_len, **kv_kw),
        draft_cache=draft_cache,
        rng=jax.random.PRNGKey(seed),
        proposed=jnp.zeros((B,), jnp.int32),
        accepted=jnp.zeros((B,), jnp.int32),
        bonus=jnp.zeros((B,), jnp.int32),
        steps=jnp.int32(0),
        last_hidden=jnp.zeros((B, target_model.config.d_model), jnp.float32),
        prev_hidden=jnp.zeros((B, target_model.config.d_model), jnp.float32),
        ctrl_k=jnp.full((B,), init_k, jnp.int32),
        acc_ema=jnp.full((B,), 0.5, jnp.float32),
        # Scalar (engine default) or per-sequence list/array both broadcast.
        temperature=jnp.broadcast_to(
            jnp.asarray(temperature, jnp.float32), (B,)
        ),
        top_k=jnp.broadcast_to(jnp.asarray(top_k, jnp.int32), (B,)),
        top_p=jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (B,)),
        min_p=jnp.broadcast_to(jnp.asarray(min_p, jnp.float32), (B,)),
        lora_ids=jnp.full((B,), lora_id, jnp.int32),
        fsm_lex=jnp.full((B,), fsm_init, jnp.int32),
        fsm_stack=jnp.zeros((B, _FSM_STACK_DEPTH), jnp.int32),
        fsm_sp=jnp.zeros((B,), jnp.int32),
        slot_rng=jax.vmap(
            lambda i: jax.random.fold_in(jax.random.PRNGKey(seed), i)
        )(jnp.arange(B, dtype=jnp.int32)),
        rep_penalty=jnp.broadcast_to(
            jnp.asarray(repetition_penalty, jnp.float32), (B,)
        ),
        presence_penalty=jnp.broadcast_to(
            jnp.asarray(presence_penalty, jnp.float32), (B,)
        ),
        freq_penalty=jnp.broadcast_to(
            jnp.asarray(frequency_penalty, jnp.float32), (B,)
        ),
        bias_ids=jnp.full((B, n_bias), -1, jnp.int32),
        bias_vals=jnp.zeros((B, n_bias), jnp.float32),
        token_logprobs=jnp.zeros((B, max_seq_len), jnp.float32),
        top_ids=jnp.zeros(
            (B, max_seq_len, logprobs_topk) if logprobs_topk else (B, 1, 1),
            jnp.int32,
        ),
        top_lps=jnp.zeros(
            (B, max_seq_len, logprobs_topk) if logprobs_topk else (B, 1, 1),
            jnp.float32,
        ),
    )
