"""Device FSM runtime vs the host table mirror: masks, transitions, and
window walks must agree with char-level truth on random generations."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from llm_inference_lab_tpu.constrain import (
    compile_token_tables,
    json_char_automaton,
)
from llm_inference_lab_tpu.constrain.runtime import (
    DEAD_STATE,
    STACK_DEPTH,
    UNCONSTRAINED,
    device_tables,
    token_mask,
    transition,
    walk_window,
    window_mask,
)
from tests.test_constrain_fsm import _apply_tables, _mock_vocab

AUTO = json_char_automaton()
TOKS, ARR, LENS = _mock_vocab()
TT = compile_token_tables(AUTO, ARR, LENS, eos_id=0)
TBL = device_tables(TT)
V = len(TOKS)


def _host_mask(state, stack):
    m = np.zeros((V,), bool)
    for t in range(1, V):
        m[t] = _apply_tables(TT, state, tuple(stack), t) is not None
    m[0] = bool(TT.accepting[state]) and not stack
    return m


def _pack(states_stacks):
    B = len(states_stacks)
    lex = np.zeros((B,), np.int32)
    stack = np.zeros((B, STACK_DEPTH), np.int32)
    sp = np.zeros((B,), np.int32)
    for b, (s, st) in enumerate(states_stacks):
        lex[b] = s
        stack[b, : len(st)] = st
        sp[b] = len(st)
    return jnp.asarray(lex), jnp.asarray(stack), jnp.asarray(sp)


def test_mask_matches_host_mirror():
    ctxs = [
        (TT.initial, ()),
        (TT.initial_objonly, ()),
        (5, (1,)),            # AFTER_VALUE inside an object
        (5, (2, 1, 2)),       # nested
        (0, (2,)),            # VALUE inside array
        (6, (1,)),            # inside a value string
        (20, ()),             # complete int at top level
    ]
    lex, stack, sp = _pack(ctxs)
    dm = np.asarray(jax.jit(lambda a, b, c: token_mask(TBL, a, b, c))(
        lex, stack, sp
    ))
    for b, (s, st) in enumerate(ctxs):
        hm = _host_mask(s, st)
        assert (dm[b] == hm).all(), (b, s, st,
                                     np.nonzero(dm[b] != hm)[0][:10])


def test_unconstrained_and_dead_rows():
    lex = jnp.asarray([UNCONSTRAINED, DEAD_STATE], jnp.int32)
    stack = jnp.zeros((2, STACK_DEPTH), jnp.int32)
    sp = jnp.zeros((2,), jnp.int32)
    m = np.asarray(token_mask(TBL, lex, stack, sp))
    assert m[0].all()                      # unconstrained: everything
    assert m[1, 0] and m[1, 1:].sum() == 0  # dead: EOS only


def test_transition_matches_host_and_random_generation():
    rng = np.random.default_rng(1)
    for _ in range(10):
        state, stack, out = TT.initial, (), b""
        lex, stk, sp = _pack([(state, stack)])
        for _ in range(80):
            hm = _host_mask(state, tuple(stack))
            dm = np.asarray(token_mask(TBL, lex, stk, sp))[0]
            assert (dm == hm).all()
            choices = np.nonzero(hm[1:])[0] + 1
            if hm[0] and (len(choices) == 0 or rng.random() < 0.3):
                break
            tok = int(choices[rng.integers(len(choices))])
            out += TOKS[tok]
            state, stack = _apply_tables(TT, state, stack, tok)
            lex, stk, sp = transition(
                TBL, lex, stk, sp, jnp.asarray([tok], jnp.int32)
            )
            assert int(lex[0]) == state
            assert int(sp[0]) == len(stack)
            assert list(np.asarray(stk)[0][: len(stack)]) == list(stack)
        else:
            continue
        json.loads(out.decode())


def test_transition_invalid_token_goes_dead():
    lex, stk, sp = _pack([(TT.initial, ())])
    bad = TOKS.index(b"}")  # '}' invalid at top-of-value
    lex, stk, sp = transition(TBL, lex, stk, sp,
                              jnp.asarray([bad], jnp.int32))
    assert int(lex[0]) == DEAD_STATE
    m = np.asarray(token_mask(TBL, lex, stk, sp))[0]
    assert m[0] and m[1:].sum() == 0


def test_walk_window_states():
    """walk_window's per-position states equal sequential transitions."""
    seq = [TOKS.index(b'{"'), TOKS.index(b'a'), TOKS.index(b'":'),
           TOKS.index(b'1')]
    lex, stk, sp = _pack([(TT.initial, ())])
    toks = jnp.asarray([seq], jnp.int32)
    lexs, stacks, sps = walk_window(TBL, lex, stk, sp, toks)
    s, st = TT.initial, ()
    for i, t in enumerate(seq):
        assert int(lexs[0, i]) == s
        assert int(sps[0, i]) == len(st)
        s, st = _apply_tables(TT, s, st, t)
    assert int(lexs[0, len(seq)]) == s

    masks = np.asarray(window_mask(TBL, lexs, stacks, sps))
    s, st = TT.initial, ()
    for i, t in enumerate(seq + [None]):
        assert (masks[0, i] == _host_mask(s, st)).all(), i
        if t is not None:
            s, st = _apply_tables(TT, s, st, t)
