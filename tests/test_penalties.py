"""Repetition / presence / frequency penalties.

Reference has no penalty support (sampling is temperature/top-k/top-p only,
src/specdec/core/pipeline.py:48-147); these implement the HF
RepetitionPenaltyLogitsProcessor and OpenAI presence/frequency semantics as
production-serving parity. The load-bearing property in SPEC decode: the
verify row for write-slot i is penalized with counts of (prefix + accepted
drafts before i) — exactly what a penalized baseline would have seen — so
greedy spec output equals greedy penalized-baseline output token for token.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_inference_lab_tpu.config import EngineConfig
from llm_inference_lab_tpu.core.batching import ContinuousBatcher
from llm_inference_lab_tpu.core.engine import Engine
from llm_inference_lab_tpu.models.fake import make_fake_model
from llm_inference_lab_tpu.ops.sampling import apply_penalties, token_counts


def test_token_counts():
    tokens = jnp.asarray([[3, 1, 3, 9, 0, 0], [2, 2, 2, 2, 2, 2]], jnp.int32)
    lengths = jnp.asarray([4, 3], jnp.int32)
    c = token_counts(tokens, lengths, 10)
    assert c.shape == (2, 10)
    assert c[0, 3] == 2 and c[0, 1] == 1 and c[0, 9] == 1 and c[0, 0] == 0
    assert c[1, 2] == 3 and int(c[1].sum()) == 3  # beyond-length ignored


def test_repetition_penalty_values():
    logits = jnp.asarray([[2.0, -2.0, 1.0]], jnp.float32)
    counts = jnp.asarray([[1, 1, 0]], jnp.int32)
    out = apply_penalties(logits, counts, repetition=2.0)
    # HF rule: seen positive -> /r, seen negative -> *r, unseen unchanged.
    np.testing.assert_allclose(np.asarray(out[0]), [1.0, -4.0, 1.0])


def test_presence_and_frequency_values():
    logits = jnp.zeros((1, 4), jnp.float32)
    counts = jnp.asarray([[0, 1, 3, 0]], jnp.int32)
    out = apply_penalties(logits, counts, presence=0.5, frequency=0.25)
    np.testing.assert_allclose(
        np.asarray(out[0]), [0.0, -0.75, -1.25, 0.0]
    )


def test_per_row_penalty_broadcast():
    logits = jnp.ones((2, 3), jnp.float32)
    counts = jnp.ones((2, 3), jnp.int32)
    out = apply_penalties(
        logits, counts, presence=jnp.asarray([1.0, 0.0], jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(out), [[0.0] * 3, [1.0] * 3])


def test_window_counts_shape_broadcast():
    # [B, V] counts against [B, K, V] logits (the verify-window case).
    logits = jnp.zeros((2, 3, 4), jnp.float32)
    counts = jnp.asarray([[1, 0, 0, 0], [0, 0, 0, 2]], jnp.int32)
    out = apply_penalties(logits, counts, frequency=1.0)
    assert out.shape == (2, 3, 4)
    assert float(out[0, 1, 0]) == -1.0 and float(out[1, 2, 3]) == -2.0


def _engine(**kw):
    defaults = dict(
        implementation="fake", base_model="fake", draft_model="fake",
        max_draft=4, max_new_tokens=16,
    )
    defaults.update(kw)
    return Engine(EngineConfig(**defaults))


def test_frequency_penalty_forbids_repeats():
    """Huge frequency penalty + greedy: no generated token can repeat any
    token seen before it (prompt included)."""
    eng = _engine(draft_model=None, frequency_penalty=1e4)
    r = eng.generate("ab")
    ids = r["generated_ids"]
    assert len(ids) > 4
    assert len(set(ids)) == len(ids), ids


def test_spec_equals_baseline_under_penalties():
    """Greedy spec decode with penalties is lossless vs the penalized
    baseline — exercises the incremental in-window counts on both the
    accept and reject paths (draft model differs from target)."""
    pen = dict(repetition_penalty=1.3, presence_penalty=0.4,
               frequency_penalty=0.2)
    base = Engine(
        EngineConfig(implementation="fake", max_new_tokens=24, **pen),
        target_model=make_fake_model(mult=7),
    ).generate("qrs")
    spec = Engine(
        EngineConfig(implementation="fake", max_draft=4, max_new_tokens=24,
                     **pen),
        target_model=make_fake_model(mult=7),
        # 25% disagreement -> both accept and reject paths exercised
        draft_model=make_fake_model(mult=7, miss_permille=250),
    ).generate("qrs")
    assert spec["generated_ids"] == base["generated_ids"]
    assert 0.0 < spec["acceptance_rate"] < 1.0  # both paths exercised


def test_spec_equals_baseline_penalties_perfect_draft():
    """Full-acceptance path: bonus row K's counts include all K drafts."""
    pen = dict(frequency_penalty=0.7)
    base = Engine(
        EngineConfig(implementation="fake", max_new_tokens=20, **pen),
        target_model=make_fake_model(),
    ).generate("xyz")
    spec = Engine(
        EngineConfig(implementation="fake", max_draft=4, max_new_tokens=20,
                     **pen),
        target_model=make_fake_model(),
        draft_model=make_fake_model(),
    ).generate("xyz")
    assert spec["generated_ids"] == base["generated_ids"]
    assert spec["acceptance_rate"] == 1.0


def test_batcher_per_request_penalties():
    """A per-request frequency penalty changes that slot's decode while the
    unpenalized slot matches the default engine output."""
    plain = _engine().generate("penalty mix")["generated_ids"]
    eng = _engine(per_request_sampling=True)
    b = ContinuousBatcher(eng, n_slots=2)
    r0 = b.submit("penalty mix")
    r1 = b.submit("penalty mix", frequency_penalty=1e4)
    out = {r["req_id"]: r for r in b.run()}
    assert out[r0]["generated_ids"] == plain
    ids1 = out[r1]["generated_ids"]
    assert len(set(ids1)) == len(ids1)  # no repeats under the huge penalty
    assert ids1 != plain


def test_tree_mode_rejects_penalties():
    with pytest.raises(ValueError):
        _engine(draft_mode="tree", repetition_penalty=1.5).generate("x")


def test_tree_mode_supports_logprobs_topk():
    """Round 3: the tree commit now captures top-N alternatives from the
    verify rows (treespec.py) — logprobs_topk must produce real values,
    not error (reverses the round-2 rejection, which guarded fabricated
    all-zero buffers)."""
    r = _engine(draft_mode="tree", logprobs_topk=3).generate("x")
    assert r["top_logprobs"] is not None
    assert len(r["top_logprobs"]) == r["generated_tokens"]
    assert all(len(alts) == 3 for alts in r["top_logprobs"])


def test_per_request_vocab_mismatch_allowed_without_penalties():
    """A vanilla draft with a different vocab must still CONSTRUCT under
    per_request_sampling (penalties default off per request); only the
    draft side skips penalty math. Static penalties stay a config error
    (round-2 code-review finding: the guard hard-failed construction)."""
    from llm_inference_lab_tpu.core.policies import create_policy
    from llm_inference_lab_tpu.core.specstep import make_spec_step
    from llm_inference_lab_tpu.models.fake import make_fake_model

    tgt = make_fake_model(vocab_size=256)
    drf = make_fake_model(vocab_size=48)
    # Per-request: constructs fine (runtime-disabled penalties).
    make_spec_step(
        tgt, drf, k=2, policy_fn=create_policy("longest_prefix"),
        eos_token_id=None, per_request_sampling=True, jit=False,
    )
    # Static penalty with mismatched vocab: config error at build time.
    with pytest.raises(ValueError):
        make_spec_step(
            tgt, drf, k=2, policy_fn=create_policy("longest_prefix"),
            eos_token_id=None, repetition_penalty=1.5, jit=False,
        )


# ---------------------------------------------------------------- logit_bias
def test_apply_logit_bias_values():
    from llm_inference_lab_tpu.ops.sampling import apply_logit_bias

    logits = jnp.zeros((2, 5), jnp.float32)
    ids = jnp.asarray([[1, 3, -1], [-1, -1, -1]], jnp.int32)
    vals = jnp.asarray([[2.0, -4.0, 9.0], [9.0, 9.0, 9.0]], jnp.float32)
    out = apply_logit_bias(logits, ids, vals)
    np.testing.assert_allclose(np.asarray(out[0]), [0, 2.0, 0, -4.0, 0])
    np.testing.assert_allclose(np.asarray(out[1]), [0.0] * 5)  # all empty


def test_apply_logit_bias_window_broadcast():
    from llm_inference_lab_tpu.ops.sampling import apply_logit_bias

    logits = jnp.zeros((1, 3, 4), jnp.float32)  # [B, K+1, V]
    out = apply_logit_bias(
        logits, jnp.asarray([[2]], jnp.int32), jnp.asarray([[5.0]], jnp.float32)
    )
    assert out.shape == (1, 3, 4)
    assert float(out[0, 1, 2]) == 5.0 and float(out[0, 1, 0]) == 0.0


def test_batcher_logit_bias_forces_and_bans():
    """+100 bias forces a token every step; the spec path (draft + verify
    both biased) still commits it — OpenAI logit_bias semantics."""
    eng = _engine(per_request_sampling=True)
    b = ContinuousBatcher(eng, n_slots=2)
    forced = b.submit("bias f", logit_bias={42: 100.0})
    plain = b.submit("bias f")
    out = {r["req_id"]: r for r in b.run()}
    assert all(t == 42 for t in out[forced]["generated_ids"]), out[forced]
    assert out[plain]["generated_ids"] == _engine().generate(
        "bias f")["generated_ids"]


def test_server_logit_bias():
    import urllib.request, json as _json
    from llm_inference_lab_tpu.server import InferenceServer

    eng = _engine(per_request_sampling=True, max_new_tokens=6)
    srv = InferenceServer(eng, n_slots=2, port=0)
    srv.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/completions",
            data=_json.dumps({
                "prompt": "srv bias", "max_tokens": 6,
                "logit_bias": {"7": 100.0},
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            out = _json.loads(resp.read())
        # Token 7 forced at every position.
        assert out["usage"]["completion_tokens"] == 6
        assert out["choices"][0]["text"] == eng.tokenizer.decode([7] * 6)
    finally:
        srv.stop()


# ------------------------------------------------------------- top_logprobs
def test_top_logprobs_spec_engine():
    """logprobs_topk=N captures the top-N alternatives per generated token,
    and the committed token's logprob appears among them (greedy decode:
    the argmax IS the committed token, so entry 0 matches token_logprobs)."""
    eng = _engine(logprobs_topk=3, max_new_tokens=6)
    r = eng.generate("tops")
    tops = r["top_logprobs"]
    assert tops is not None and len(tops) == r["generated_tokens"]
    for pos, (tok, lp) in enumerate(zip(r["generated_ids"],
                                        r["token_logprobs"])):
        alts = tops[pos]
        assert len(alts) == 3
        assert alts[0]["id"] == tok  # greedy: committed == top-1
        assert abs(alts[0]["logprob"] - lp) < 1e-4
        # descending order
        assert alts[0]["logprob"] >= alts[1]["logprob"] >= alts[2]["logprob"]


def test_top_logprobs_baseline_and_off():
    eng = _engine(draft_model=None, logprobs_topk=2, max_new_tokens=5)
    r = eng.generate("tops b")
    assert len(r["top_logprobs"]) == r["generated_tokens"]
    assert all(len(p) == 2 for p in r["top_logprobs"])
    off = _engine(draft_model=None).generate("tops b")
    assert off["top_logprobs"] is None


def test_top_logprobs_serving():
    import urllib.request, json as _json
    from llm_inference_lab_tpu.server import InferenceServer

    eng = _engine(logprobs_topk=2, max_new_tokens=4)
    srv = InferenceServer(eng, n_slots=2, port=0)
    srv.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/completions",
            data=_json.dumps({"prompt": "srv tops", "max_tokens": 4,
                              "logprobs": 2}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            out = _json.loads(resp.read())
        lp = out["choices"][0]["logprobs"]
        assert len(lp["top_logprobs"]) == 4
        assert all(len(d) >= 1 for d in lp["top_logprobs"])
    finally:
        srv.stop()
