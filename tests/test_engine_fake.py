"""End-to-end engine tests on the fake model (reference
tests/specdec/test_pipeline_new.py: init, generate, accepted-length bounds,
determinism, max-tokens limit, empty prompt, metrics, dependency injection)."""

import jax
import pytest

from llm_inference_lab_tpu.config import EngineConfig
from llm_inference_lab_tpu.core.engine import Engine
from llm_inference_lab_tpu.models.fake import make_fake_model


def make_engine(**kw):
    defaults = dict(implementation="fake", base_model="fake", draft_model="fake",
                    max_draft=4, max_new_tokens=16)
    defaults.update(kw)
    return Engine(EngineConfig(**defaults))


def test_generate_basic():
    eng = make_engine()
    r = eng.generate("hello world")
    assert r["generated_tokens"] > 0
    assert r["generated_tokens"] <= 16
    assert r["steps"] >= 1
    assert 0.0 <= r["acceptance_rate"] <= 1.0
    assert isinstance(r["text"], str)


def test_max_tokens_respected():
    eng = make_engine(max_new_tokens=8)
    r = eng.generate("abcdef")
    assert r["generated_tokens"] <= 8


def test_determinism():
    eng = make_engine()
    r1 = eng.generate("same prompt", seed=7)
    r2 = eng.generate("same prompt", seed=7)
    assert r1["generated_ids"] == r2["generated_ids"]


def test_perfect_draft_full_acceptance():
    """Identical fake draft and target -> every proposal accepted."""
    target = make_fake_model()
    draft = make_fake_model()
    eng = Engine(
        EngineConfig(implementation="fake", max_draft=4, max_new_tokens=16),
        target_model=target,
        draft_model=draft,
    )
    r = eng.generate("x" * 20)
    assert r["acceptance_rate"] == 1.0
    # K+1 tokens per step when everything is accepted (+2: the engine's
    # delayed completion poll may dispatch up to two no-op trailing steps).
    assert r["steps"] <= (16 // 5) + 3


def test_imperfect_draft_partial_acceptance():
    target = make_fake_model()
    draft = make_fake_model(miss_permille=400)
    eng = Engine(
        EngineConfig(implementation="fake", max_draft=4, max_new_tokens=32),
        target_model=target,
        draft_model=draft,
    )
    r = eng.generate("y" * 30)
    assert 0.0 < r["acceptance_rate"] < 1.0
    # Output must STILL equal the target's own argmax sequence: accepted
    # tokens are checked against the target and the bonus comes from the
    # target (reference invariant: base tokens are ground truth,
    # pipeline.py:3039-3061).
    base = Engine(
        EngineConfig(implementation="fake", draft_model=None, max_new_tokens=32),
        target_model=make_fake_model(),
    )
    rb = base.generate("y" * 30)
    assert r["generated_ids"] == rb["generated_ids"]


def test_baseline_mode():
    eng = Engine(
        EngineConfig(implementation="fake", draft_model=None, max_new_tokens=12),
        target_model=make_fake_model(),
    )
    r = eng.generate("baseline")
    assert r["generated_tokens"] == 12
    assert r["proposed"] == 0


def test_batch_generation():
    eng = make_engine(max_new_tokens=10)
    rs = eng.generate_batch(["alpha", "beta longer prompt", "g"])
    assert len(rs) == 3
    for i, r in enumerate(rs):
        assert r["batch_index"] == i
        assert r["batch_size"] == 3
        assert r["generated_tokens"] > 0


def test_batch_matches_single():
    """Greedy decode per prompt must not depend on batch composition."""
    eng = make_engine(max_new_tokens=10)
    single = [eng.generate(p)["generated_ids"] for p in ["aaa", "bb bb"]]
    batch = [r["generated_ids"] for r in eng.generate_batch(["aaa", "bb bb"])]
    assert single == batch


def test_empty_prompt():
    eng = make_engine()
    r = eng.generate("")
    assert r["generated_tokens"] > 0


def test_eos_stops_generation():
    # Fake model with shift chosen so EOS (id 0) appears: mult=0, shift=0
    # makes every next token (31*pos)%vocab; pos where that hits 0 -> EOS.
    target = make_fake_model(mult=1, shift=0, vocab_size=16)
    draft = make_fake_model(mult=1, shift=0, vocab_size=16)
    eng = Engine(
        EngineConfig(implementation="fake", max_draft=2, max_new_tokens=40,
                     eos_token_id=0),
        target_model=target,
        draft_model=draft,
    )
    r = eng.generate("q")
    if 0 in r["generated_ids"]:
        assert r["generated_ids"].index(0) == len(r["generated_ids"]) - 1


def test_policies_run_end_to_end():
    for policy in ["longest_prefix", "conf_threshold", "topk_agree", "typical",
                   "rejection"]:
        eng = make_engine(policy=policy, max_new_tokens=8)
        r = eng.generate("policy test")
        assert r["generated_tokens"] > 0, policy


def test_adaptive_controller_end_to_end():
    eng = make_engine(controller="adaptive", max_new_tokens=24)
    r = eng.generate("adaptive run")
    assert r["controller"]["type"] == "adaptive"
    assert 1 <= r["controller"]["k"] <= 8


def test_metrics_schema():
    r = make_engine().generate("schema")
    for key in [
        "text", "generated_tokens", "latency_ms", "proposed", "accepted",
        "acceptance_rate", "tokens_per_sec", "steps", "policy", "controller",
        "impl", "device", "dtype", "base_model", "draft_model", "draft_mode",
        "batch_index", "batch_size", "batch_metrics", "mem_rss_mb",
    ]:
        assert key in r, key


def test_fast_path_matches_host_path():
    """The device-side while_loop fast path and the observed host-step path
    must produce identical tokens (profiling must not change results)."""
    fast = make_engine(max_new_tokens=12)
    host = make_engine(max_new_tokens=12, profile=True)  # forces host path
    for prompt in ["path check", "another one two three"]:
        assert (
            fast.generate(prompt)["generated_ids"]
            == host.generate(prompt)["generated_ids"]
        )


def test_profiler_enabled():
    eng = make_engine(profile=True, max_new_tokens=8)
    eng.generate("profiled")
    s = eng.profiler.summary()
    assert s["step_ms"]["n"] >= 1
    assert s["prefill_ms"]["n"] == 1


def test_per_request_sampling_greedy_rows_match_greedy_engine():
    """per_request_sampling: rows with temperature 0 reproduce the static
    greedy engine exactly; a sampled row (temp > 0) shares the same batch."""
    from llm_inference_lab_tpu.config import EngineConfig
    from llm_inference_lab_tpu.core.engine import Engine

    kw = dict(implementation="fake", base_model="fake", draft_model="fake",
              max_draft=2, max_new_tokens=10, max_seq_len=256)
    eng_greedy = Engine(EngineConfig(greedy=True, **kw))
    want = eng_greedy.generate("per request probe")["generated_ids"]

    eng_pr = Engine(EngineConfig(greedy=False, temperature=1.0,
                                 per_request_sampling=True, **kw))
    outs = eng_pr.generate_batch(
        ["per request probe", "per request probe"],
        temperature=[0.0, 1.3],
    )
    assert outs[0]["generated_ids"] == want
    # Sampled row generated the full budget too (different path, same step).
    assert outs[1]["generated_tokens"] == 10


def test_per_request_sampling_requires_flag():
    from llm_inference_lab_tpu.config import EngineConfig
    from llm_inference_lab_tpu.core.engine import Engine
    import pytest as _pytest

    eng = Engine(EngineConfig(implementation="fake", base_model="fake",
                              draft_model="fake", max_new_tokens=4))
    with _pytest.raises(ValueError):
        eng.generate("x", temperature=0.5)


def test_token_logprobs_match_full_forward():
    """Committed-token logprobs written by the step must equal log-softmax
    of an independent full-context forward at those positions."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from llm_inference_lab_tpu.config import EngineConfig
    from llm_inference_lab_tpu.core.engine import Engine
    from llm_inference_lab_tpu.models.llama import LlamaModel

    m = LlamaModel.create("llama-tiny", rng=jax.random.PRNGKey(5),
                          dtype=jnp.float32)
    eng = Engine(EngineConfig(max_draft=3, max_new_tokens=8, greedy=True,
                              max_seq_len=256), target_model=m,
                 draft_model=LlamaModel.create(
                     "llama-tiny", rng=jax.random.PRNGKey(5),
                     dtype=jnp.float32))
    r = eng.generate("logprob gold check")
    ids = eng.tokenizer.encode("logprob gold check") + r["generated_ids"]
    S = len(ids)
    cache = m.init_cache(1, S + 8)
    pos = jnp.arange(S, dtype=jnp.int32)[None]
    logits, _ = m.apply(m.params, jnp.asarray([ids], jnp.int32), pos, cache,
                        jnp.zeros((1,), jnp.int32))
    lsm = np.asarray(jax.nn.log_softmax(logits[0], axis=-1))
    plen = S - len(r["generated_ids"])
    # logprob of generated token t comes from the row that predicted it.
    want = [float(lsm[plen - 1 + i, tok])
            for i, tok in enumerate(r["generated_ids"])]
    np.testing.assert_allclose(r["token_logprobs"], want, atol=5e-3)
    # All logprobs are valid (non-positive) numbers.
    assert all(x <= 0.0 for x in r["token_logprobs"])
