"""HTTP serving tests (OpenAI-compatible surface over the batcher)."""

import json
import urllib.request

import pytest

from llm_inference_lab_tpu.config import EngineConfig
from llm_inference_lab_tpu.core.engine import Engine
from llm_inference_lab_tpu.server import InferenceServer


@pytest.fixture(scope="module")
def server():
    eng = Engine(EngineConfig(implementation="fake", base_model="fake",
                              draft_model="fake", max_draft=2,
                              max_new_tokens=8, max_seq_len=256))
    srv = InferenceServer(eng, n_slots=2, port=0)  # port 0 = ephemeral
    srv.start()
    yield srv
    srv.stop()


def _post(server, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read())


def _get(server, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}{path}", timeout=10
    ) as resp:
        return json.loads(resp.read())


def test_health(server):
    out = _get(server, "/health")
    assert out["status"] == "ok"
    assert out["model"] == "fake"


def test_models(server):
    out = _get(server, "/v1/models")
    assert out["data"][0]["id"] == "fake"


def test_completion(server):
    out = _post(server, "/v1/completions", {"prompt": "hello server", "max_tokens": 6})
    assert out["object"] == "text_completion"
    assert out["usage"]["completion_tokens"] > 0
    assert isinstance(out["choices"][0]["text"], str)
    assert "acceptance_rate" in out["specdx"]


def test_chat_completion(server):
    out = _post(server, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 6,
    })
    assert out["object"] == "chat.completion"
    assert out["choices"][0]["message"]["role"] == "assistant"


def test_concurrent_requests(server):
    import concurrent.futures

    def one(i):
        return _post(server, "/v1/completions",
                     {"prompt": f"concurrent {i}", "max_tokens": 5})

    with concurrent.futures.ThreadPoolExecutor(max_workers=5) as ex:
        outs = list(ex.map(one, range(5)))
    assert all(o["usage"]["completion_tokens"] > 0 for o in outs)


def test_http_bench_client_against_server(server):
    """BenchmarkRunner http mode: health poll, retries, completions + chat
    endpoints (reference VLLMPingClient, src/server/ping_vllm.py:24-305)."""
    from llm_inference_lab_tpu.bench.run_bench import BenchmarkRunner

    runner = BenchmarkRunner(
        mode="http", iterations=1,
        server_url=f"http://127.0.0.1:{server.port}",
    )
    out = runner.run(["bench client prompt"], max_new_tokens=5)
    assert out["healthy"] is True
    assert out["success_rate"] == 1.0
    assert out["tokens_per_sec"]["mean"] > 0
    runner.http_chat = True
    out = runner.run(["chat prompt"], max_new_tokens=5)
    assert out["endpoint"] == "chat/completions"
    assert out["success_rate"] == 1.0


def test_http_bench_client_unreachable():
    from llm_inference_lab_tpu.bench.run_bench import BenchmarkRunner

    runner = BenchmarkRunner(
        mode="http", iterations=1, server_url="http://127.0.0.1:9"  # discard port
    )
    runner.health_timeout_s = 1.0
    out = runner.run(["x"], max_new_tokens=2)
    assert out["healthy"] is False
    assert out["success_rate"] == 0.0


def _post_stream(server, path, body):
    """POST with stream=true; returns (deltas list, finish_reason, saw_done)."""
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    deltas, finish, done = [], None, False
    with urllib.request.urlopen(req, timeout=60) as resp:
        assert resp.headers["Content-Type"].startswith("text/event-stream")
        for raw in resp:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            payload = line[len("data: "):]
            if payload == "[DONE]":
                done = True
                break
            obj = json.loads(payload)
            ch = obj["choices"][0]
            if "delta" in ch:
                deltas.append(ch["delta"].get("content", ""))
            else:
                deltas.append(ch["text"])
            finish = ch["finish_reason"] or finish
    return deltas, finish, done


def test_streaming_completion_matches_non_stream(server):
    body = {"prompt": "stream me", "max_tokens": 8}
    full = _post(server, "/v1/completions", body)
    deltas, finish, done = _post_stream(
        server, "/v1/completions", {**body, "stream": True}
    )
    assert done and finish in ("stop", "length")
    assert "".join(deltas) == full["choices"][0]["text"]


def test_streaming_chat(server):
    deltas, finish, done = _post_stream(
        server, "/v1/chat/completions",
        {"messages": [{"role": "user", "content": "hi"}],
         "max_tokens": 6, "stream": True},
    )
    assert done and finish in ("stop", "length")
    assert isinstance("".join(deltas), str)


def test_stop_sequence_truncates_and_finishes_early(server):
    base = _post(server, "/v1/completions",
                 {"prompt": "halt here", "max_tokens": 8})
    text = base["choices"][0]["text"]
    if len(text) < 4:
        pytest.skip("fake output too short to carve a stop sequence")
    stop = text[2:4]
    out = _post(server, "/v1/completions",
                {"prompt": "halt here", "max_tokens": 8, "stop": stop})
    got = out["choices"][0]["text"]
    assert stop not in got
    assert got == text[: text.find(stop)]
    assert out["choices"][0]["finish_reason"] == "stop"


def test_finish_reason_length(server):
    out = _post(server, "/v1/completions",
                {"prompt": "run to budget", "max_tokens": 5})
    if out["usage"]["completion_tokens"] == 5:
        assert out["choices"][0]["finish_reason"] == "length"
    else:  # fake model hit EOS before the budget
        assert out["choices"][0]["finish_reason"] == "stop"


def test_per_request_temperature():
    """A per-request-sampling server honors request temperature: temp-0
    requests reproduce the greedy engine deterministically."""
    from llm_inference_lab_tpu.server import InferenceServer

    greedy_eng = Engine(EngineConfig(implementation="fake", base_model="fake",
                                     draft_model="fake", max_draft=2,
                                     greedy=True, max_new_tokens=8,
                                     max_seq_len=256))
    want = greedy_eng.generate("sampled server")["text"]
    eng = Engine(EngineConfig(implementation="fake", base_model="fake",
                              draft_model="fake", max_draft=2,
                              greedy=False, temperature=1.0,
                              per_request_sampling=True,
                              max_new_tokens=8, max_seq_len=256))
    srv = InferenceServer(eng, n_slots=2, port=0)
    srv.start()
    try:
        out = _post(srv, "/v1/completions",
                    {"prompt": "sampled server", "max_tokens": 8,
                     "temperature": 0})
        assert out["choices"][0]["text"] == want
        out2 = _post(srv, "/v1/completions",
                     {"prompt": "sampled server", "max_tokens": 8,
                      "temperature": 1.4, "top_p": 0.9})
        assert out2["usage"]["completion_tokens"] > 0
    finally:
        srv.stop()


def test_echo(server):
    out = _post(server, "/v1/completions",
                {"prompt": "echo this", "max_tokens": 4, "echo": True})
    assert out["choices"][0]["text"].startswith("echo this")


def test_echo_applies_to_all_n_choices(server):
    """OpenAI echo prepends the prompt to EVERY choice, not just index 0
    (round-2 code-review finding)."""
    out = _post(server, "/v1/completions",
                {"prompt": "all of us", "max_tokens": 4, "echo": True,
                 "n": 3})
    for c in out["choices"]:
        assert c["text"].startswith("all of us"), c


def test_bad_json(server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/v1/completions",
        data=b"{not json",
        headers={"Content-Type": "application/json"},
    )
    try:
        urllib.request.urlopen(req, timeout=10)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_logprobs_field(server):
    out = _post(server, "/v1/completions",
                {"prompt": "logprob me", "max_tokens": 5, "logprobs": 1})
    lp = out["choices"][0]["logprobs"]
    assert lp is not None
    assert len(lp["token_logprobs"]) == out["usage"]["completion_tokens"]
    assert all(x <= 0.0 for x in lp["token_logprobs"])
    # Not requested -> null.
    out2 = _post(server, "/v1/completions",
                 {"prompt": "logprob me", "max_tokens": 5})
    assert out2["choices"][0]["logprobs"] is None


def test_metrics_endpoint(server):
    import urllib.request

    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/metrics", timeout=10
    ) as resp:
        body = resp.read().decode()
    assert "specdx_requests_served_total" in body
    assert "specdx_slots_total 2" in body


def test_n_choices(server):
    """OpenAI `n`: independent completions, indexed choices, summed usage.
    Greedy fake model -> all n choices identical text."""
    out = _post(server, "/v1/completions",
                {"prompt": "n test", "max_tokens": 6, "n": 3})
    assert len(out["choices"]) == 3
    assert [c["index"] for c in out["choices"]] == [0, 1, 2]
    texts = [c["text"] for c in out["choices"]]
    assert texts[0] == texts[1] == texts[2]
    assert out["usage"]["completion_tokens"] == 3 * 6


def test_n_with_stream_rejected(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/v1/completions",
              {"prompt": "x", "max_tokens": 4, "n": 2, "stream": True})
    assert e.value.code == 400


def test_request_timeout_cancels():
    """Server-side request_timeout cancels a long request and frees the
    slot; the client gets finish_reason "cancelled" with partial output."""
    import time as _time

    eng = Engine(EngineConfig(implementation="fake", base_model="fake",
                              draft_model="fake", max_draft=2,
                              max_new_tokens=4096, max_seq_len=8192))
    srv = InferenceServer(eng, n_slots=1, port=0, poll_every=2,
                          request_timeout=0.5)
    srv.start()
    try:
        t0 = _time.time()
        out = _post(srv, "/v1/completions",
                    {"prompt": "slow", "max_tokens": 4096})
        assert _time.time() - t0 < 30
        assert out["choices"][0]["finish_reason"] == "cancelled"
    finally:
        srv.stop()


def test_best_of_selects_highest_logprob():
    """best_of > n: the server generates best_of candidates and returns
    the n with the highest mean token logprob; usage counts them all."""
    eng = Engine(EngineConfig(implementation="fake", base_model="fake",
                              draft_model="fake", max_draft=2,
                              per_request_sampling=True,
                              max_new_tokens=8, max_seq_len=256))
    srv = InferenceServer(eng, n_slots=4, port=0)
    srv.start()
    try:
        out = _post(srv, "/v1/completions",
                    {"prompt": "pick best", "max_tokens": 6, "n": 1,
                     "best_of": 4, "temperature": 2.5, "logprobs": 0})
        assert len(out["choices"]) == 1
        assert out["usage"]["completion_tokens"] == 4 * 6
        # Returned choice's mean logprob must be >= a fresh single sample's
        # (statistically almost-sure with 4 hot candidates; exact check:
        # it equals the max over the candidates, which we can't see — so
        # just sanity-check the field exists and the request succeeded).
        assert out["choices"][0]["text"]
    finally:
        srv.stop()


def test_best_of_stream_mismatch_rejected(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError):
        _post(server, "/v1/completions",
              {"prompt": "x", "max_tokens": 4, "stream": True,
               "best_of": 3})


def test_stream_options_include_usage(server):
    """OpenAI stream_options.include_usage: one extra final chunk with
    empty choices and the usage counts, before [DONE]."""
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/v1/completions",
        data=json.dumps({"prompt": "usage stream", "max_tokens": 6,
                         "stream": True,
                         "stream_options": {"include_usage": True}}).encode(),
        headers={"Content-Type": "application/json"},
    )
    chunks = []
    with urllib.request.urlopen(req, timeout=60) as r:
        for line in r:
            line = line.decode().strip()
            if line == "data: [DONE]":
                break
            if line.startswith("data: "):
                chunks.append(json.loads(line[6:]))
    assert chunks[-1]["choices"] == []
    u = chunks[-1]["usage"]
    assert u["prompt_tokens"] > 0 and u["completion_tokens"] == 6
    assert u["total_tokens"] == u["prompt_tokens"] + u["completion_tokens"]
    # without the option no usage chunk appears
    assert all("usage" not in c for c in chunks[:-1])


def test_chat_top_logprobs_trims_captured_n():
    """The chat `top_logprobs` count (and the completions int form) trim
    the engine-captured alternatives down per request."""
    eng = Engine(EngineConfig(implementation="fake", base_model="fake",
                              draft_model="fake", max_draft=2,
                              max_new_tokens=6, max_seq_len=256,
                              logprobs_topk=5))
    srv = InferenceServer(eng, n_slots=2, port=0)
    srv.start()
    try:
        out = _post(srv, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 4, "logprobs": True, "top_logprobs": 2,
        })
        content = out["choices"][0]["logprobs"]["content"]
        assert all(len(pos["top_logprobs"]) == 2 for pos in content)
        out = _post(srv, "/v1/completions", {
            "prompt": "hi", "max_tokens": 4, "logprobs": 3,
        })
        tops = out["choices"][0]["logprobs"]["top_logprobs"]
        assert all(len(pos) <= 3 for pos in tops)
    finally:
        srv.stop()
