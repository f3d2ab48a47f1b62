"""Guided-regex decoding: regex -> Thompson NFA -> subset DFA -> the
device-side token-mask runtime. Constrained output must full-match the
pattern; speculation stays lossless under the mask."""

import json
import re

import jax

jax.config.update("jax_platforms", "cpu")

import pytest

from llm_inference_lab_tpu.config import EngineConfig
from llm_inference_lab_tpu.constrain.regex import build_regex_automaton
from llm_inference_lab_tpu.core.batching import ContinuousBatcher
from llm_inference_lab_tpu.core.engine import Engine


def _accepts(auto, text: str) -> bool:
    s = auto.initial
    for b in text.encode():
        s = int(auto.table[s, b])
        if s < 0:
            return False
    return bool(auto.accepting[s])


CASES = [
    (r"[a-z]+@[a-z]+\.(com|org)",
     ["ab@cd.com", "x@y.org"], ["ab@cd.net", "@x.com", "ab@cd.comx"]),
    (r"\d{3}-\d{4}", ["555-1234"], ["5551234", "55-1234", "555-12345"]),
    (r"(foo|bar)*baz", ["baz", "foobaz", "barfoobaz"], ["bafoo", "bazz"]),
    (r"[A-F0-9]{2}(:[A-F0-9]{2}){5}",
     ["AB:CD:EF:01:23:45"], ["AB:CD", "ab:cd:ef:01:23:45"]),
    (r"yes|no|maybe", ["yes", "no", "maybe"], ["y", "nope", ""]),
    (r"a?b{2,3}c", ["bbc", "abbbc"], ["bc", "bbbbc"]),
    (r".*stop", ["xystop", "stop"], ["sto"]),
    (r"h\wllo\s+w[^z]rld", ["hello  world"], ["hello wzrld", "helloworld"]),
    (r"héllo", ["héllo"], ["hello"]),
]


@pytest.mark.parametrize("pattern,good,bad", CASES)
def test_regex_dfa_full_match(pattern, good, bad):
    auto = build_regex_automaton(pattern)
    for g in good:
        assert _accepts(auto, g), (pattern, g)
        assert re.fullmatch(pattern, g), (pattern, g)  # oracle agreement
    for b in bad:
        assert not _accepts(auto, b), (pattern, b)


def test_regex_rejects_bad_syntax():
    for pat in ("a(b", "a[b", "^abc$", "a{3,1}", "*a"):
        with pytest.raises(ValueError):
            build_regex_automaton(pat)


def test_regex_state_bound():
    with pytest.raises(ValueError):
        build_regex_automaton("(a|b)" * 600, max_states=100)


def _engine(pattern, **kw):
    defaults = dict(implementation="fake", base_model="fake",
                    draft_model="fake", max_draft=3, max_new_tokens=48,
                    constrain="regex", constrain_regex=pattern)
    defaults.update(kw)
    return Engine(EngineConfig(**defaults))


def test_engine_regex_constrained_generation():
    pat = r"(yes|no|maybe)(, (yes|no|maybe)){0,3}"
    r = _engine(pat).generate("answer please")
    assert re.fullmatch(pat, r["text"]), r["text"]


def test_engine_regex_spec_equals_baseline():
    pat = r"\d{2}:\d{2}"
    spec = _engine(pat).generate("time")
    base = _engine(pat, draft_model=None).generate("time")
    assert spec["generated_ids"] == base["generated_ids"]
    assert re.fullmatch(pat, spec["text"]), spec["text"]


def test_batcher_and_server_regex():
    import urllib.request

    from llm_inference_lab_tpu.server import InferenceServer

    pat = r"(red|green|blue)"
    eng = _engine(pat)
    b = ContinuousBatcher(eng, n_slots=2)
    rid = b.submit("pick a color", response_format="regex")
    out = {r["req_id"]: r for r in b.run()}[rid]
    assert re.fullmatch(pat, out["text"]), out["text"]

    srv = InferenceServer(_engine(pat), n_slots=2, port=0)
    srv.start()
    try:
        def post(payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/v1/completions",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            try:
                with urllib.request.urlopen(req, timeout=120) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        code, out = post({"prompt": "color?", "max_tokens": 24,
                          "guided_regex": pat})
        assert code == 200
        assert re.fullmatch(pat, out["choices"][0]["text"])
        code, out = post({"prompt": "color?", "max_tokens": 24,
                          "response_format": {"type": "regex"}})
        assert code == 200
        assert re.fullmatch(pat, out["choices"][0]["text"])
        code, _ = post({"prompt": "x", "guided_regex": r"different"})
        assert code == 400  # pattern mismatch vs compiled deployment
    finally:
        srv.stop()


def test_server_regex_unavailable_without_grammar():
    import urllib.request

    from llm_inference_lab_tpu.server import InferenceServer

    eng = Engine(EngineConfig(implementation="fake", base_model="fake",
                              draft_model="fake", max_new_tokens=8))
    srv = InferenceServer(eng, n_slots=2, port=0)
    srv.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/completions",
            data=json.dumps({"prompt": "x",
                             "guided_regex": "a+"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=60)
            code = 200
        except urllib.error.HTTPError as e:
            code = e.code
        assert code == 400
    finally:
        srv.stop()
