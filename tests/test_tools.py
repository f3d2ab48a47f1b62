"""Tool calling (OpenAI `tools` / function calling): the tool-call
grammar constrains decode to {"name":...,"arguments":<schema>}, the
server maps tool_choice onto grammar initials and shapes tool_calls
responses. Fake model + ByteTokenizer give byte-exact tables."""

import json

import jax

jax.config.update("jax_platforms", "cpu")

import pytest

from llm_inference_lab_tpu.config import EngineConfig
from llm_inference_lab_tpu.constrain.tools import (
    build_tools_automaton,
    normalize_tools,
)
from llm_inference_lab_tpu.core.batching import ContinuousBatcher
from llm_inference_lab_tpu.core.engine import Engine
from llm_inference_lab_tpu.server.serving import _parse_tool_call

TOOLS = [
    {"type": "function", "function": {"name": "get_weather", "parameters": {
        "type": "object", "properties": {
            "city": {"type": "string"},
            "days": {"type": "integer"},
        }}}},
    {"type": "function", "function": {"name": "get_time", "parameters": {
        "type": "object", "properties": {
            "tz": {"enum": ["utc", "local"]},
        }}}},
]

# Generation tests use bounded-argument tools (enums/booleans) so EVERY
# grammar path completes well inside the token budget regardless of what
# greedy random-weight decoding picks; free-form strings/integers can
# legitimately run to the budget and truncate with finish_reason
# "length" (exercised at the automaton level above instead).
GEN_TOOLS = [
    {"type": "function", "function": {"name": "get_time", "parameters": {
        "type": "object", "properties": {
            "tz": {"enum": ["utc", "local"]},
        }}}},
    {"type": "function", "function": {"name": "toggle", "parameters": {
        "type": "object", "properties": {
            "on": {"type": "boolean"},
        }}}},
]
GEN_NAMES = ("get_time", "toggle")


def _engine(**kw):
    defaults = dict(implementation="fake", base_model="fake",
                    draft_model="fake", max_draft=3, max_new_tokens=64,
                    tools=GEN_TOOLS)
    defaults.update(kw)
    return Engine(EngineConfig(**defaults))


# ------------------------------------------------------------- automaton
def _accepts(auto, initials, key, text):
    s = initials[key]
    for ch in text:
        s = int(auto.table[s, ord(ch)])
        if s < 0:
            return False
    return bool(auto.accepting[s])


def test_automaton_accepts_exact_calls_only():
    auto, initials = build_tools_automaton(TOOLS)
    ok = '{"name":"get_weather","arguments":{"city":"SF","days":3}}'
    assert _accepts(auto, initials, "tool_call", ok)
    assert _accepts(auto, initials, "tool_call:get_weather", ok)
    assert not _accepts(auto, initials, "tool_call:get_time", ok)
    # wrong argument shape for the named tool dies mid-walk
    bad = '{"name":"get_weather","arguments":{"tz":"utc"}}'
    assert not _accepts(auto, initials, "tool_call", bad)
    # unknown name, truncation, trailing garbage
    assert not _accepts(auto, initials, "tool_call",
                        '{"name":"nope","arguments":{}}')
    assert not _accepts(auto, initials, "tool_call", ok[:-1])
    assert not _accepts(auto, initials, "tool_call", ok + "x")


def test_normalize_rejects_duplicates_and_garbage():
    with pytest.raises(ValueError):
        normalize_tools([{"function": {"name": "a"}},
                         {"function": {"name": "a"}}])
    with pytest.raises(ValueError):
        normalize_tools([{"type": "function"}])
    # flat form + missing parameters -> empty-object arguments
    (name, params) = normalize_tools([{"name": "ping"}])[0]
    assert name == "ping" and params["type"] == "object"


# ---------------------------------------------------------------- engine
def test_engine_tool_call_any_and_forced():
    eng = _engine()
    r = eng.generate("call a tool", response_format="tool_call")
    d = json.loads(r["text"])
    assert set(d) == {"name", "arguments"}
    assert d["name"] in GEN_NAMES
    r2 = eng.generate("forced", response_format="tool_call:get_time")
    d2 = json.loads(r2["text"])
    assert d2["name"] == "get_time"
    assert d2["arguments"]["tz"] in ("utc", "local")


def test_engine_default_stays_unconstrained():
    r = _engine().generate("free text")
    assert r["generated_tokens"] > 0  # no grammar applied by default


def test_tools_exclusive_with_constrain():
    with pytest.raises(ValueError):
        _engine(constrain="json")


def test_unknown_grammar_key_rejected():
    with pytest.raises(ValueError):
        _engine().generate("x", response_format="json")
    with pytest.raises(ValueError):
        _engine().generate("x", response_format="tool_call:nope")


def test_spec_equals_baseline_under_tool_constraint():
    spec = _engine().generate("match", response_format="tool_call")
    base = _engine(draft_model=None).generate(
        "match", response_format="tool_call"
    )
    assert spec["generated_ids"] == base["generated_ids"]


def test_batcher_tool_call():
    # get_time's arguments are enum-bounded, so the call always completes
    # inside the budget (get_weather's free-form string can legitimately
    # truncate at max_new_tokens with finish_reason "length").
    eng = _engine()
    b = ContinuousBatcher(eng, n_slots=2)
    rid = b.submit("tool please", response_format="tool_call:get_time")
    out = {r["req_id"]: r for r in b.run()}[rid]
    d = json.loads(out["text"])
    assert d["name"] == "get_time"


# ---------------------------------------------------------------- parser
def test_parse_tool_call_strictness():
    assert _parse_tool_call('{"name":"f","arguments":{"a":1}}') == \
        ("f", {"a": 1})
    assert _parse_tool_call("not json") is None
    assert _parse_tool_call('{"name":"f"}') is None
    assert _parse_tool_call('{"name":"f","arguments":{},"x":1}') is None
    assert _parse_tool_call('{"name":"f","arguments":{}}',
                            allowed=["g"]) is None


# ---------------------------------------------------------------- server
def _post(port, path, payload):
    import urllib.request

    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def tool_server():
    from llm_inference_lab_tpu.server import InferenceServer

    srv = InferenceServer(_engine(), n_slots=2, port=0)
    srv.start()
    yield srv
    srv.stop()


def test_server_tool_choice_required(tool_server):
    code, out = _post(tool_server.port, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "weather in SF?"}],
        "tools": GEN_TOOLS, "tool_choice": "required", "max_tokens": 64,
    })
    assert code == 200
    ch = out["choices"][0]
    assert ch["finish_reason"] == "tool_calls"
    assert ch["message"]["content"] is None
    (tc,) = ch["message"]["tool_calls"]
    assert tc["type"] == "function"
    assert tc["function"]["name"] in GEN_NAMES
    json.loads(tc["function"]["arguments"])  # valid JSON string
    assert tc["id"].startswith("call_")


def test_server_tool_choice_named(tool_server):
    code, out = _post(tool_server.port, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "time?"}],
        "tools": GEN_TOOLS,
        "tool_choice": {"type": "function",
                        "function": {"name": "get_time"}},
        "max_tokens": 64,
    })
    assert code == 200
    (tc,) = out["choices"][0]["message"]["tool_calls"]
    assert tc["function"]["name"] == "get_time"
    args = json.loads(tc["function"]["arguments"])
    assert args["tz"] in ("utc", "local")


def test_server_tool_choice_none_and_auto(tool_server):
    # none: plain content comes back even with tools present
    code, out = _post(tool_server.port, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hi"}],
        "tools": GEN_TOOLS, "tool_choice": "none", "max_tokens": 8,
    })
    assert code == 200
    assert out["choices"][0]["message"].get("tool_calls") is None
    # auto: unconstrained output from the fake model won't parse as a
    # call -> content passes through with a normal finish_reason
    code, out = _post(tool_server.port, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hi"}],
        "tools": GEN_TOOLS, "tool_choice": "auto", "max_tokens": 8,
    })
    assert code == 200
    ch = out["choices"][0]
    assert ch["finish_reason"] in ("stop", "length")
    assert ch["message"]["content"] is not None


def test_server_unknown_tool_rejected(tool_server):
    code, _ = _post(tool_server.port, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "x"}],
        "tools": GEN_TOOLS,
        "tool_choice": {"type": "function", "function": {"name": "nope"}},
    })
    assert code == 400


def test_server_streamed_tool_call(tool_server):
    """stream + constrained tool_choice emits OpenAI tool_calls chunks:
    the first carries id/type/name, later ones argument deltas; the
    concatenated arguments parse as JSON conforming to the tool."""
    import urllib.request

    req = urllib.request.Request(
        f"http://127.0.0.1:{tool_server.port}/v1/chat/completions",
        data=json.dumps({
            "messages": [{"role": "user", "content": "time?"}],
            "tools": GEN_TOOLS,
            "tool_choice": {"type": "function",
                            "function": {"name": "get_time"}},
            "stream": True, "max_tokens": 64,
        }).encode(),
        headers={"Content-Type": "application/json"},
    )
    chunks = []
    with urllib.request.urlopen(req, timeout=120) as r:
        for line in r:
            line = line.decode().strip()
            if not line.startswith("data: "):
                continue
            if line == "data: [DONE]":
                break
            chunks.append(json.loads(line[6:]))
    deltas = [c["choices"][0]["delta"] for c in chunks]
    tool_deltas = [d["tool_calls"][0] for d in deltas if "tool_calls" in d]
    assert tool_deltas, chunks
    first = tool_deltas[0]
    assert first["id"].startswith("call_")
    assert first["type"] == "function"
    assert first["function"]["name"] == "get_time"
    args = "".join(d["function"]["arguments"] for d in tool_deltas)
    assert json.loads(args)["tz"] in ("utc", "local")
    finishes = [c["choices"][0]["finish_reason"] for c in chunks]
    assert finishes[-1] == "tool_calls"


def test_server_tool_and_role_tool_messages(tool_server):
    # Round 2 of a tool conversation: assistant tool_calls + tool result
    # messages render through the fallback template without error.
    code, out = _post(tool_server.port, "/v1/chat/completions", {
        "messages": [
            {"role": "user", "content": "weather in SF?"},
            {"role": "assistant", "tool_calls": [{
                "id": "call_1", "type": "function",
                "function": {"name": "get_weather",
                             "arguments": "{\"city\":\"SF\"}"}}]},
            {"role": "tool", "tool_call_id": "call_1",
             "content": "{\"temp\": 18}"},
        ],
        "tools": GEN_TOOLS, "max_tokens": 8,
    })
    assert code == 200
    assert out["choices"][0]["message"]["content"] is not None


def test_server_required_without_tool_grammar():
    """A server started WITHOUT EngineConfig(tools=...) rejects
    constrained tool_choice but still serves auto/none."""
    from llm_inference_lab_tpu.server import InferenceServer

    srv = InferenceServer(_engine(tools=None), n_slots=2, port=0)
    srv.start()
    try:
        code, _ = _post(srv.port, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "x"}],
            "tools": GEN_TOOLS, "tool_choice": "required",
        })
        assert code == 400
        code, out = _post(srv.port, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "x"}],
            "tools": GEN_TOOLS, "max_tokens": 8,
        })
        assert code == 200
    finally:
        srv.stop()
