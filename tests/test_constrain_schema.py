"""Schema -> char-DFA builder: accepted strings conform, deviations die."""

import json

import numpy as np
import pytest

from llm_inference_lab_tpu.constrain.jsonfsm import compile_token_tables
from llm_inference_lab_tpu.constrain.schema import build_schema_automaton
from tests.test_constrain_fsm import _apply_tables, _mock_vocab

SCHEMA = {
    "type": "object",
    "properties": {
        "name": {"type": "string"},
        "age": {"type": "integer"},
        "mood": {"enum": ["happy", "sad", "ok"]},
        "tags": {"type": "array", "items": {"type": "string"},
                 "maxItems": 3},
        "address": {
            "type": "object",
            "properties": {"city": {"type": "string"},
                           "zip": {"type": "string"}},
        },
        "score": {"type": "number"},
        "active": {"type": "boolean"},
        "extra": {"type": "null"},
    },
}


def _walk(auto, text: bytes):
    s = auto.initial
    for ch in text:
        e = int(auto.table[s, ch])
        if e < 0:
            return None
        s = e & 0xFFFFFF
    return s


def _accepts(auto, text: bytes) -> bool:
    s = _walk(auto, text)
    return s is not None and bool(auto.accepting[s])


GOOD = [
    b'{"name": "bo", "age": 3, "mood": "ok", "tags": [], '
    b'"address": {"city": "x", "zip": "1"}, "score": -0.5e3, '
    b'"active": true, "extra": null}',
    b'{"name":"a\\nb","age":0,"mood":"happy","tags":["t","u","v"],'
    b'"address":{"city":"","zip":"z"},"score":12,"active":false,'
    b'"extra":null}',
    b'  {"name": "", "age": 42, "mood": "sad", "tags": ["one"], '
    b'"address": {"city": "c", "zip": "p"}, "score": 0, '
    b'"active": true, "extra": null}  ',
]

BAD = [
    b'{"age": 3}',                      # missing / out-of-order keys
    b'{"name": 5, ...',                 # wrong type
    b'{"name": "bo", "age": 3.5, ',     # integer with fraction
    b'{"name": "bo", "age": 3, "mood": "angry"',  # not in enum
    b'["array"]',                       # wrong top-level type
    b'{"name": "bo", "age": 03',        # leading zero
]


def test_schema_accepts_conforming_documents():
    auto = build_schema_automaton(SCHEMA, whitespace=True)
    for doc in GOOD:
        assert _accepts(auto, doc), doc
        json.loads(doc.decode())  # sanity: also valid JSON


def test_schema_rejects_deviations():
    auto = build_schema_automaton(SCHEMA, whitespace=True)
    for doc in BAD:
        # Dead mid-walk or non-accepting at end — either way rejected.
        assert not _accepts(auto, doc), doc


def test_array_bounds():
    auto = build_schema_automaton(
        {"type": "array", "items": {"type": "integer"},
         "minItems": 2, "maxItems": 4}, whitespace=True,
    )
    assert not _accepts(auto, b"[1]")
    assert _accepts(auto, b"[1, 2]")
    assert _accepts(auto, b"[1,2,3,4]")
    assert not _accepts(auto, b"[1,2,3,4,5]")
    # Unbounded tail
    auto2 = build_schema_automaton(
        {"type": "array", "items": {"enum": ["x"]}, "minItems": 1},
        whitespace=True,
    )
    assert not _accepts(auto2, b"[]")
    assert _accepts(auto2, b'["x"]')
    assert _accepts(auto2, b'["x", "x", "x", "x", "x"]')


def test_enum_shared_prefixes():
    auto = build_schema_automaton({"enum": ["ab", "abc", "a"]})
    for ok in (b'"ab"', b'"abc"', b'"a"'):
        assert _accepts(auto, ok), ok
    for bad in (b'"abcd"', b'"b"', b'"ab'):
        assert not _accepts(auto, bad), bad


def test_unsupported_schema_raises():
    with pytest.raises(ValueError):
        build_schema_automaton({"type": "object",
                                "properties": {"x": {"$ref": "#/defs/y"}}})


def test_schema_token_tables_generate_conforming_docs():
    """Drive the token tables as a generator over the mock BPE vocab:
    every completed output must parse AND conform (spot fields)."""
    auto = build_schema_automaton({
        "type": "object",
        "properties": {"a": {"type": "integer"},
                       "b": {"enum": ["x", "y"]}},
    })
    toks, arr, lens = _mock_vocab()
    tt = compile_token_tables(auto, arr, lens, eos_id=0)
    rng = np.random.default_rng(3)
    completed = 0
    for _ in range(30):
        state, stack, out = tt.initial, (), b""
        for _ in range(60):
            valid = [t for t in range(1, len(toks))
                     if _apply_tables(tt, state, tuple(stack), t)
                     is not None]
            can_eos = bool(tt.accepting[state]) and not stack
            if can_eos and (not valid or rng.random() < 0.3):
                obj = json.loads(out.decode())
                assert isinstance(obj["a"], int)
                assert obj["b"] in ("x", "y")
                assert list(obj) == ["a", "b"]
                completed += 1
                break
            if not valid:
                break  # mock vocab lacks a continuation char: abandon
            tok = int(valid[rng.integers(len(valid))])
            out += toks[tok]
            state, stack = _apply_tables(tt, state, tuple(stack), tok)
    assert completed >= 5


def test_compact_mode_rejects_whitespace():
    """Default (compact) grammars have no optional whitespace states."""
    auto = build_schema_automaton({"type": "object",
                                   "properties": {"a": {"type": "null"}}})
    assert _accepts(auto, b'{"a":null}')
    assert not _accepts(auto, b'{"a": null}')
    assert not _accepts(auto, b' {"a":null}')


def test_integer_schema_reaches_eos():
    """Round-2 code-review regression: number-complete states inherit the
    continuation's ACCEPTING flag, so a top-level integer schema can stop
    instead of growing digits until the budget dies."""
    auto = build_schema_automaton({"type": "integer"})
    s = _walk(auto, b"42")
    assert s is not None and auto.accepting[s]
    s = _walk(auto, b"-0")
    assert s is not None and auto.accepting[s]
    assert _walk(auto, b"4.5") is None  # integer: no fraction


def test_prefix_enum_options_generable():
    auto = build_schema_automaton({"enum": ["ab", "abc"]})
    assert _accepts(auto, b'"ab"')
    assert _accepts(auto, b'"abc"')


def test_large_schema_over_127_states():
    """Round-2 code-review regression: >127-state DFAs need int16 state
    tables (int8 wrapped them negative and starved generation)."""
    from tests.test_constrain_fsm import _apply_tables, _mock_vocab

    auto = build_schema_automaton(SCHEMA, whitespace=True)
    assert auto.table.shape[0] > 127
    toks, arr, lens = _mock_vocab()
    tt = compile_token_tables(auto, arr, lens, eos_id=0)
    doc = (b'{"name": "bo", "age": 3, "mood": "ok", "tags": [], '
           b'"address": {"city": "x", "zip": "1"}, "score": -0.5e3, '
           b'"active": true, "extra": null}')
    # Drive the tables byte-token by byte-token through the whole doc.
    state, stack = tt.initial, ()
    for ch in doc:
        tok = 1 + (ch - 0x20) if 0x20 <= ch < 0x7F else None
        assert toks[tok] == bytes([ch])
        r = _apply_tables(tt, state, tuple(stack), tok)
        assert r is not None, (chr(ch), state)
        state, stack = r
    assert tt.accepting[state] and not stack


def test_anyof_nullable_and_union_types():
    """anyOf / oneOf / list-form types: alternatives with disjoint first
    chars (distinct JSON types — the nullable-field case) compile into
    one union DFA; ambiguous unions raise."""
    nullable = build_schema_automaton({
        "type": "object",
        "properties": {
            "city": {"anyOf": [{"type": "string"}, {"type": "null"}]},
            "days": {"type": ["integer", "null"]},
            "mode": {"oneOf": [{"enum": ["a", "b"]}, {"type": "boolean"}]},
        },
    })

    def ok(t):
        s = _walk(nullable, t)
        return s is not None and bool(nullable.accepting[s])

    assert ok(b'{"city":"SF","days":3,"mode":"a"}')
    assert ok(b'{"city":null,"days":null,"mode":true}')
    assert ok(b'{"city":"x","days":null,"mode":"b"}')
    assert _walk(nullable, b'{"city":3') is None       # not in union
    assert _walk(nullable, b'{"city":null,"days":1.5') is None  # int only
    assert _walk(nullable, b'{"city":null,"days":2,"mode":"c"') is None

    with pytest.raises(ValueError):  # two string alternatives collide
        build_schema_automaton({"anyOf": [
            {"type": "string"}, {"enum": ["x"]},
        ]})


def test_anyof_top_level_eos():
    """A top-level union value still unlocks EOS exactly at completion."""
    auto = build_schema_automaton({"type": ["number", "boolean"]})
    for good in (b"true", b"-1.5e3", b"false", b"0"):
        s = _walk(auto, good)
        assert s is not None and bool(auto.accepting[s]), good
    assert not _accepts(auto, b"tru")
    assert _walk(auto, b"truefalse") is None
