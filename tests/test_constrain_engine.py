"""Constrained decoding through the engine, batcher, and server.

The fake model + ByteTokenizer give an exact testbed: token ids map to
single bytes, so the JSON pushdown tables are exact and every constrained
output must parse with json.loads (or be a truncation when the budget
ran out mid-value — excluded here by generous budgets and whitespace-able
states)."""

import json

import jax

jax.config.update("jax_platforms", "cpu")

import pytest

from llm_inference_lab_tpu.config import EngineConfig
from llm_inference_lab_tpu.core.batching import ContinuousBatcher
from llm_inference_lab_tpu.core.engine import Engine


def _engine(**kw):
    defaults = dict(
        implementation="fake", base_model="fake", draft_model="fake",
        max_draft=3, max_new_tokens=32,
    )
    defaults.update(kw)
    return Engine(EngineConfig(**defaults))


def _parses(text: str):
    json.loads(text)  # raises on invalid


def test_engine_json_mode_spec():
    r = _engine(constrain="json").generate("emit json")
    assert r["generated_tokens"] > 0
    _parses(r["text"])


def test_engine_json_mode_baseline():
    r = _engine(constrain="json", draft_model=None).generate("emit json")
    _parses(r["text"])


def test_engine_json_object_mode():
    r = _engine(constrain="json_object", draft_model=None).generate("obj")
    out = r["text"].strip()
    assert out.startswith("{")
    _parses(out)


def test_spec_equals_baseline_under_constraint():
    """Greedy constrained spec == greedy constrained baseline, token for
    token — verification over MASKED logits preserves the lossless-ness
    invariant."""
    spec = _engine(constrain="json").generate("match me")
    base = _engine(constrain="json", draft_model=None).generate("match me")
    assert spec["generated_ids"] == base["generated_ids"]


@pytest.mark.parametrize("mode", ["medusa", "eagle", "ngram"])
def test_constraint_with_draft_modes(mode):
    """Model-free draft modes stay sound under constraints (verify-side
    masking): output parses and equals the constrained baseline."""
    r = _engine(constrain="json", draft_mode=mode).generate("modes")
    base = _engine(constrain="json", draft_model=None).generate("modes")
    assert r["generated_ids"] == base["generated_ids"]
    _parses(r["text"])


def test_tree_mode_rejects_constraint():
    with pytest.raises(ValueError):
        _engine(constrain="json", draft_mode="tree")


def test_bad_constrain_value():
    with pytest.raises(ValueError):
        _engine(constrain="yaml")


def test_batcher_per_request_constraint_and_isolation():
    """response_format constrains ONLY the requesting slot; neighbours
    decode exactly as they would in an unconstrained engine."""
    eng = _engine(constrain="json")
    b = ContinuousBatcher(eng, n_slots=3)
    r1 = b.submit("json please", response_format="json")
    r2 = b.submit("free neighbour")
    r3 = b.submit("obj", response_format="json_object")
    out = {r["req_id"]: r for r in b.run()}
    _parses(out[r1]["text"])
    _parses(out[r3]["text"])
    assert out[r3]["text"].strip().startswith("{")

    plain_eng = _engine()
    bb = ContinuousBatcher(plain_eng, n_slots=3)
    rid = bb.submit("free neighbour")
    plain = {r["req_id"]: r for r in bb.run()}[rid]["text"]
    assert plain == out[r2]["text"]


def test_batcher_requires_engine_tables():
    b = ContinuousBatcher(_engine(), n_slots=2)
    b.submit("x", response_format="json")
    with pytest.raises(ValueError):
        b.run()


def test_slot_reuse_resets_fsm():
    """A retired constrained slot re-admitted with an unconstrained
    request must not inherit FSM state (and vice versa)."""
    eng = _engine(constrain="json", max_new_tokens=12)
    b = ContinuousBatcher(eng, n_slots=1)  # force slot reuse
    r1 = b.submit("a", response_format="json")
    r2 = b.submit("b")
    r3 = b.submit("c", response_format="json_object")
    out = {r["req_id"]: r for r in b.run()}
    _parses(out[r1]["text"])
    _parses(out[r3]["text"])
    assert out[r3]["text"].strip().startswith("{")


def test_server_response_format():
    import urllib.error
    import urllib.request

    from llm_inference_lab_tpu.server import InferenceServer

    def post(srv, body, path="/v1/completions"):
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}{path}",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            return json.loads(r.read())

    srv = InferenceServer(_engine(constrain="json"), n_slots=2, port=0)
    srv.start()
    try:
        out = post(srv, {"prompt": "j", "max_tokens": 24,
                         "response_format": {"type": "json_object"}})
        txt = out["choices"][0]["text"]
        assert txt.strip().startswith("{")
        _parses(txt)
        # text format passes through unconstrained
        post(srv, {"prompt": "j", "max_tokens": 4,
                   "response_format": {"type": "text"}})
        with pytest.raises(urllib.error.HTTPError):
            post(srv, {"prompt": "j", "max_tokens": 4,
                       "response_format": {"type": "xml"}})
    finally:
        srv.stop()

    # Engine without tables: response_format is a 400, not a crash.
    srv2 = InferenceServer(_engine(), n_slots=2, port=0)
    srv2.start()
    try:
        with pytest.raises(urllib.error.HTTPError):
            post(srv2, {"prompt": "j", "max_tokens": 4,
                        "response_format": {"type": "json_object"}})
    finally:
        srv2.stop()


SCHEMA = {"type": "object",
          "properties": {"a": {"type": "integer"},
                         "b": {"enum": ["x", "y"]}}}


def test_engine_json_schema_mode():
    """Structured outputs: generation conforms to the compiled schema
    (fixed key order, typed values) and terminates at completion."""
    r = _engine(constrain="json_schema",
                constrain_schema=SCHEMA).generate("structured")
    obj = json.loads(r["text"])
    assert isinstance(obj["a"], int)
    assert obj["b"] in ("x", "y")
    assert list(obj) == ["a", "b"]
    # Compact grammar + EOS-at-completion: way under budget.
    assert r["generated_tokens"] < 32


def test_json_schema_requires_schema():
    with pytest.raises(ValueError):
        _engine(constrain="json_schema")


def test_json_schema_spec_equals_baseline():
    spec = _engine(constrain="json_schema",
                   constrain_schema=SCHEMA).generate("m")
    base = _engine(constrain="json_schema", constrain_schema=SCHEMA,
                   draft_model=None).generate("m")
    assert spec["generated_ids"] == base["generated_ids"]


def test_server_json_schema():
    import urllib.error
    import urllib.request

    from llm_inference_lab_tpu.server import InferenceServer

    def post(srv, body):
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/completions",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            return json.loads(r.read())

    srv = InferenceServer(
        _engine(constrain="json_schema", constrain_schema=SCHEMA),
        n_slots=2, port=0,
    )
    srv.start()
    try:
        out = post(srv, {"prompt": "s", "max_tokens": 32,
                         "response_format": {"type": "json_schema"}})
        obj = json.loads(out["choices"][0]["text"])
        assert list(obj) == ["a", "b"]
        # Matching schema in the request body is accepted.
        out = post(srv, {"prompt": "s", "max_tokens": 32,
                         "response_format": {
                             "type": "json_schema",
                             "json_schema": {"schema": SCHEMA}}})
        json.loads(out["choices"][0]["text"])
        # A DIFFERENT schema is a 400 (this deployment serves one schema).
        with pytest.raises(urllib.error.HTTPError):
            post(srv, {"prompt": "s", "max_tokens": 8,
                       "response_format": {
                           "type": "json_schema",
                           "json_schema": {"schema": {"type": "string"}}}})
        # json_object doesn't match a schema deployment's grammar.
        with pytest.raises(urllib.error.HTTPError):
            post(srv, {"prompt": "s", "max_tokens": 8,
                       "response_format": {"type": "json_object"}})
    finally:
        srv.stop()
