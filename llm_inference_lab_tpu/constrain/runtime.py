"""Device-side constrained-decoding runtime: jittable token masks and FSM
transitions over the precompiled effect tables (jsonfsm.TokenTables).

Per-slot FSM state lives in DecodeState:
  fsm_lex   [B] int32  — lexer state; -1 = slot unconstrained, -2 = dead
  fsm_stack [B, D] int32 — nesting symbols (SYM_OBJ/SYM_ARR), bottom-first
  fsm_sp    [B] int32  — stack height

The hot path is `token_mask`: two [B, V] gathers from the [S, V] tables
plus MAX_POP stack-tail compares — all inside the compiled step, no host
involvement (contrast: llama.cpp-style grammars re-walk on the host every
token). `transition` applies the chosen token's stack effect with a
masked [B, D] update.

Soundness: a dead slot (draft fed an invalid token during the verify
walk) masks everything but EOS, and the acceptance rule can never commit
past the invalidating position because the masked target distribution
assigns it -inf.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from llm_inference_lab_tpu.constrain.jsonfsm import (
    MAX_POP,
    MAX_PUSH,
    TokenTables,
)

UNCONSTRAINED = -1
DEAD_STATE = -2
STACK_DEPTH = 32  # max JSON nesting per slot


def device_tables(tt: TokenTables) -> Dict[str, jax.Array]:
    """Upload the effect tables once; gathered per step. int16 states
    (schema DFAs exceed 127 states), int8 effects — ~100 MB for a 128k
    vocab on the generic JSON grammar."""
    return {
        "state_out": jnp.asarray(tt.state_out, jnp.int16),  # [S_ext, V]
        "n_pop": jnp.asarray(tt.n_pop, jnp.int8),
        "pop_syms": jnp.asarray(tt.pop_syms, jnp.int8),  # [S_ext, V, MAX_POP]
        "n_push": jnp.asarray(tt.n_push, jnp.int8),
        "push_syms": jnp.asarray(tt.push_syms, jnp.int8),  # [S_ext, V, MAX_PUSH]
        "accepting": jnp.asarray(tt.accepting, jnp.bool_),  # [S_ext]
        # Base-state -> top-conditioned row maps (see jsonfsm.SPLIT_STATES)
        "variant_obj": jnp.asarray(tt.variant_obj, jnp.int32),  # [S_base]
        "variant_arr": jnp.asarray(tt.variant_arr, jnp.int32),
        "eos_id": int(tt.eos_id),
        "initial": int(tt.initial),
        "initial_objonly": int(tt.initial_objonly),
    }


def effective_lex(
    tbl: Dict[str, jax.Array],
    lex: jax.Array,    # [B] BASE lexer state
    stack: jax.Array,  # [B, D]
    sp: jax.Array,     # [B]
) -> jax.Array:
    """Row index to gather from: split states (',' routing consults the
    stack top) use their OBJ/ARR variant row when the slot's top symbol
    is known; everything else (and empty stacks) uses the base row."""
    S_base = tbl["variant_obj"].shape[0]
    lex_c = jnp.clip(lex, 0, S_base - 1)
    top = jnp.take_along_axis(
        stack, jnp.clip(sp - 1, 0, stack.shape[1] - 1)[:, None], axis=1
    )[:, 0]
    top = jnp.where(sp > 0, top, 0)
    eff = jnp.where(
        top == 1, tbl["variant_obj"][lex_c],
        jnp.where(top == 2, tbl["variant_arr"][lex_c], lex_c),
    )
    return eff


def token_mask(
    tbl: Dict[str, jax.Array],
    lex: jax.Array,    # [B] int32
    stack: jax.Array,  # [B, D] int32
    sp: jax.Array,     # [B] int32
) -> jax.Array:
    """[B, V] bool — which tokens may be emitted from each slot's state."""
    B = lex.shape[0]
    lex_c = effective_lex(tbl, lex, stack, sp)
    so = tbl["state_out"][lex_c]      # [B, V]
    n_pop = tbl["n_pop"][lex_c]       # [B, V]
    n_push = tbl["n_push"][lex_c]     # [B, V]

    valid = so >= 0
    valid &= n_pop <= sp[:, None]
    for j in range(MAX_POP):
        need = n_pop > j
        idx = jnp.clip(sp - 1 - j, 0, stack.shape[1] - 1)
        sym = jnp.take_along_axis(stack, idx[:, None], axis=1)  # [B, 1]
        valid &= ~need | (tbl["pop_syms"][lex_c, :, j] == sym)
    valid &= (sp[:, None] - n_pop + n_push) <= stack.shape[1]

    # Dead slots (invalid token slipped in via an unmasked draft) emit
    # nothing but EOS from here on.
    dead = lex == DEAD_STATE
    valid &= ~dead[:, None]

    # EOS: only when the emitted text is a complete JSON value — or the
    # slot is dead/starved (then EOS terminates the stream instead of
    # sampling garbage).
    acc = (tbl["accepting"][lex_c] & (sp == 0)) | dead
    acc = acc | ~jnp.any(valid, axis=-1)
    valid = valid.at[:, tbl["eos_id"]].set(acc)

    # Unconstrained slots pass everything through.
    return jnp.where((lex == UNCONSTRAINED)[:, None], True, valid)


def apply_mask(logits: jax.Array, mask: jax.Array) -> jax.Array:
    """-inf out invalid tokens (shapes broadcast: [B, V] or [B, K, V])."""
    return jnp.where(mask, logits.astype(jnp.float32), -jnp.inf)


def transition(
    tbl: Dict[str, jax.Array],
    lex: jax.Array,    # [B]
    stack: jax.Array,  # [B, D]
    sp: jax.Array,     # [B]
    tok: jax.Array,    # [B] committed token ids
    active: jax.Array | None = None,  # [B] bool; False rows unchanged
):
    """Advance each slot's FSM by one committed token. Total: invalid
    tokens send the slot to DEAD_STATE (mask then yields EOS-only)."""
    B, D = stack.shape
    lex_c = effective_lex(tbl, lex, stack, sp)
    tok_c = jnp.clip(tok, 0, tbl["state_out"].shape[1] - 1)
    rows = jnp.arange(B)
    so = tbl["state_out"][lex_c, tok_c]          # [B]
    n_pop = tbl["n_pop"][lex_c, tok_c]
    n_push = tbl["n_push"][lex_c, tok_c]
    pushes = tbl["push_syms"][lex_c, tok_c]      # [B, MAX_PUSH]
    pop_req = tbl["pop_syms"][lex_c, tok_c]      # [B, MAX_POP]

    ok = (so >= 0) & (n_pop <= sp)
    for j in range(MAX_POP):
        idx = jnp.clip(sp - 1 - j, 0, D - 1)
        sym = jnp.take_along_axis(stack, idx[:, None], axis=1)[:, 0]
        ok &= (n_pop <= j) | (pop_req[:, j] == sym)
    # EOS while accepting is a no-op transition (slot retires anyway).
    is_eos = tok == tbl["eos_id"]
    eos_ok = is_eos & tbl["accepting"][lex_c] & (sp == 0)

    base = sp - n_pop
    rel = jnp.arange(D, dtype=jnp.int32)[None, :] - base[:, None]  # [B, D]
    write = (rel >= 0) & (rel < n_push[:, None])
    val = jnp.take_along_axis(
        pushes, jnp.clip(rel, 0, MAX_PUSH - 1), axis=1
    )
    new_stack = jnp.where(write, val, stack)
    new_sp = jnp.clip(base + n_push, 0, D)
    new_lex = jnp.where(ok, so, jnp.int32(DEAD_STATE))
    new_lex = jnp.where(eos_ok, lex, new_lex)
    new_stack = jnp.where((ok & ~is_eos)[:, None], new_stack, stack)
    new_sp = jnp.where(ok & ~is_eos, new_sp, sp)

    frozen = lex < 0  # unconstrained or already dead: unchanged
    if active is not None:
        frozen |= ~active
    new_lex = jnp.where(frozen, lex, new_lex)
    new_stack = jnp.where(frozen[:, None], stack, new_stack)
    new_sp = jnp.where(frozen, sp, new_sp)
    del rows
    return new_lex, new_stack, new_sp


def walk_window(
    tbl: Dict[str, jax.Array],
    lex: jax.Array,    # [B]
    stack: jax.Array,  # [B, D]
    sp: jax.Array,     # [B]
    toks: jax.Array,   # [B, K] draft tokens
):
    """FSM states BEFORE each of the K+1 verify positions: walk the draft
    window. Returns (lexs [B, K+1], stacks [B, K+1, D], sps [B, K+1])."""
    K = toks.shape[1]

    def body(carry, t):
        l, st, p = carry
        nl, nst, np_ = transition(tbl, l, st, p, t)
        return (nl, nst, np_), (l, st, p)

    (fl, fst, fsp), (ls, sts, ps) = jax.lax.scan(
        body, (lex, stack, sp), jnp.moveaxis(toks, 1, 0)
    )
    lexs = jnp.concatenate([jnp.moveaxis(ls, 0, 1), fl[:, None]], axis=1)
    stacks = jnp.concatenate(
        [jnp.moveaxis(sts, 0, 1), fst[:, None]], axis=1
    )
    sps = jnp.concatenate([jnp.moveaxis(ps, 0, 1), fsp[:, None]], axis=1)
    return lexs, stacks, sps


def window_mask(
    tbl: Dict[str, jax.Array],
    lexs: jax.Array,    # [B, K1]
    stacks: jax.Array,  # [B, K1, D]
    sps: jax.Array,     # [B, K1]
) -> jax.Array:
    """[B, K1, V] masks for every walked position (flattened batch)."""
    B, K1 = lexs.shape
    m = token_mask(
        tbl,
        lexs.reshape(B * K1),
        stacks.reshape(B * K1, -1),
        sps.reshape(B * K1),
    )
    return m.reshape(B, K1, -1)


def init_fsm(B: int, np_mod=np):
    """Unconstrained initial FSM arrays (host numpy or jnp)."""
    return (
        np_mod.full((B,), UNCONSTRAINED, np_mod.int32),
        np_mod.zeros((B, STACK_DEPTH), np_mod.int32),
        np_mod.zeros((B,), np_mod.int32),
    )
