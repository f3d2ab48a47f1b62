"""Prompt logprobs (OpenAI echo+logprobs / vLLM prompt_logprobs): the
prefill scores every prompt token against a manual forward recompute."""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from llm_inference_lab_tpu.config import EngineConfig
from llm_inference_lab_tpu.core.batching import ContinuousBatcher
from llm_inference_lab_tpu.core.engine import Engine


def _engine(**kw):
    defaults = dict(implementation="fake", base_model="fake",
                    draft_model="fake", max_draft=2, max_new_tokens=6)
    defaults.update(kw)
    return Engine(EngineConfig(**defaults))


def _manual_prompt_lps(eng, prompt: str):
    ids = eng.tokenizer.encode(prompt)
    m = eng.target
    P = len(ids)
    cache = m.init_cache(1, 128)
    toks = jnp.asarray([ids], jnp.int32)
    logits, _ = m.apply_fn(
        m.params, toks, jnp.arange(P, dtype=jnp.int32)[None], cache,
        jnp.zeros((1,), jnp.int32),
    )
    lp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
    return [float(lp[i - 1, ids[i]]) for i in range(1, P)]


def test_generate_prompt_logprobs_match_manual():
    eng = _engine()
    r = eng.generate("score this prompt please")
    want = _manual_prompt_lps(eng, "score this prompt please")
    got = r["prompt_logprobs"]
    assert got[0] is None
    assert len(got) == len(want) + 1
    np.testing.assert_allclose(got[1:], want, rtol=1e-4, atol=1e-4)


def test_chunked_prefill_prompt_logprobs_match():
    """Chunked prefill writes the same prompt scores as single-shot
    (chunk boundaries score the next chunk's first token correctly)."""
    long_prompt = "chunk boundary check " * 12
    plain = _engine().generate(long_prompt)["prompt_logprobs"]
    chunked = _engine(prefill_chunk=32).generate(
        long_prompt
    )["prompt_logprobs"]
    assert len(plain) == len(chunked)
    np.testing.assert_allclose(
        [x for x in plain[1:]], [x for x in chunked[1:]],
        rtol=1e-4, atol=1e-4,
    )


def test_batcher_admit_prompt_logprobs():
    eng = _engine()
    b = ContinuousBatcher(eng, n_slots=2)
    rid = b.submit("admitted prompt scoring")
    out = {r["req_id"]: r for r in b.run()}[rid]
    want = _manual_prompt_lps(eng, "admitted prompt scoring")
    got = out["prompt_logprobs"]
    assert got[0] is None
    np.testing.assert_allclose(got[1:], want, rtol=1e-4, atol=1e-4)


def test_prefix_cached_positions_report_none():
    """Prefix-cache-served positions were never re-forwarded: their
    entries are None; the suffix is still scored. (Paged caches need the
    real transformer path — the fake model's toy cache isn't paged.)"""
    eng = Engine(EngineConfig(
        base_model="llama-tiny", draft_model="llama-tiny",
        implementation="hf", max_draft=2, max_new_tokens=8,
        max_seq_len=512, dtype="float32", kv_layout="paged",
        kv_page_size=16, prefix_caching=True,
    ))
    b = ContinuousBatcher(eng, n_slots=2)
    shared = "a shared system prompt header long enough to fill pages " * 2
    r1 = b.submit(shared + "tail one")
    out1 = {r["req_id"]: r for r in b.run()}[r1]
    assert out1["prompt_logprobs"][0] is None
    r2 = b.submit(shared + "tail two")
    out2 = {r["req_id"]: r for r in b.run()}[r2]
    reused = sum(1 for x in out2["prompt_logprobs"] if x is None)
    assert reused > 1  # the shared header came from the cache
    assert any(x is not None for x in out2["prompt_logprobs"])  # suffix scored


def test_server_echo_logprobs_covers_prompt():
    import json
    import urllib.request

    from llm_inference_lab_tpu.server import InferenceServer

    srv = InferenceServer(_engine(), n_slots=2, port=0)
    srv.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/completions",
            data=json.dumps({"prompt": "echo lp", "max_tokens": 4,
                             "echo": True, "logprobs": 0}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        lp = out["choices"][0]["logprobs"]
        n_prompt = len(srv.engine.tokenizer.encode("echo lp"))
        assert len(lp["tokens"]) == len(lp["token_logprobs"])
        assert len(lp["tokens"]) >= n_prompt + 1
        assert lp["token_logprobs"][0] is None
        assert all(x is not None for x in lp["token_logprobs"][n_prompt:])
    finally:
        srv.stop()
