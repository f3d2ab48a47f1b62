"""Per-request `seed` (OpenAI API): sampling draws ride per-slot PRNG keys
(DecodeState.slot_rng folded with the slot's committed length and a site
id), so a request's sampled stream depends only on its own seed, prompt,
and params — not on batch composition, slot index, or admission order.
Reference analogue: global torch seeding (src/specdec/utils/deterministic.py)
gives whole-process determinism only; per-request streams are the
TPU-native re-design."""

import jax

jax.config.update("jax_platforms", "cpu")

from llm_inference_lab_tpu.config import EngineConfig
from llm_inference_lab_tpu.core.batching import ContinuousBatcher
from llm_inference_lab_tpu.core.engine import Engine


def _engine(**kw):
    defaults = dict(
        implementation="fake", base_model="fake", draft_model="fake",
        max_draft=3, max_new_tokens=16, per_request_sampling=True,
    )
    defaults.update(kw)
    return Engine(EngineConfig(**defaults))


HOT = dict(temperature=3.0)  # diverse sampling on the peaked fake logits


def _ids(batcher_results, rid):
    return {r["req_id"]: r for r in batcher_results}[rid]["generated_ids"]


def test_seed_reproducible_across_batch_compositions():
    """Same seed + prompt -> identical ids whether the request runs alone
    or alongside unrelated traffic in other slots."""
    eng = _engine()
    b1 = ContinuousBatcher(eng, n_slots=4)
    rid1 = b1.submit("seeded prompt", seed=1234, **HOT)
    alone = _ids(b1.run(), rid1)

    b2 = ContinuousBatcher(eng, n_slots=4)
    b2.submit("some other request padding the batch", **HOT)
    rid = b2.submit("seeded prompt", seed=1234, **HOT)
    b2.submit("yet another neighbour", temperature=2.0)
    with_traffic = _ids(b2.run(), rid)

    assert alone == with_traffic


def test_seed_distinguishes_and_reproduces():
    """Different seeds -> different samples; same seed -> same samples,
    independent of submission order (slot assignment)."""
    eng = _engine()
    b = ContinuousBatcher(eng, n_slots=4)
    r_a = b.submit("p", seed=7, **HOT)
    r_b = b.submit("p", seed=8, **HOT)
    r_c = b.submit("p", seed=7, **HOT)
    out = b.run()
    a, bb, c = _ids(out, r_a), _ids(out, r_b), _ids(out, r_c)
    assert a == c  # same seed, different slots
    assert a != bb  # different seed


def test_unseeded_requests_are_deterministic_per_engine_seed():
    """No seed given: the per-request key derives from (engine seed,
    request id), so a full serving trace replays identically."""
    eng = _engine()
    b1 = ContinuousBatcher(eng, n_slots=2)
    rid1 = b1.submit("replay me", **HOT)
    first = _ids(b1.run(), rid1)
    b2 = ContinuousBatcher(eng, n_slots=2)
    rid2 = b2.submit("replay me", **HOT)
    second = _ids(b2.run(), rid2)
    assert first == second


def test_seed_reproducible_with_penalties_and_bias():
    """Seed streams compose with the other per-request knobs (penalties +
    logit_bias) and stay batch-composition independent."""
    kw = dict(seed=42, temperature=3.0, presence_penalty=0.4,
              frequency_penalty=0.2, logit_bias={5: -100.0})
    eng = _engine()
    b1 = ContinuousBatcher(eng, n_slots=2)
    rid1 = b1.submit("rep", **kw)
    one = _ids(b1.run(), rid1)
    b2 = ContinuousBatcher(eng, n_slots=2)
    b2.submit("noise neighbour", **HOT)
    rid = b2.submit("rep", **kw)
    two = _ids(b2.run(), rid)
    assert one == two
    assert 5 not in one  # the -100 bias bans token 5


def test_server_seed_field():
    """HTTP `seed` is honored end-to-end: two identical seeded requests
    return identical text; an unseeded hot request needn't match."""
    import json
    import urllib.request

    from llm_inference_lab_tpu.server import InferenceServer

    eng = _engine()
    srv = InferenceServer(eng, n_slots=2, port=0)
    srv.start()
    try:
        def post(body):
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/v1/completions",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                return json.loads(r.read())["choices"][0]["text"]

        body = {"prompt": "seeded http", "max_tokens": 12,
                "temperature": 3.0, "seed": 99}
        assert post(body) == post(body)
    finally:
        srv.stop()


def test_best_of_candidates_differ_under_explicit_seed():
    """Round-2 code-review regression: n/best_of fan-out perturbs an
    explicit seed per candidate — otherwise per-request seed streams
    would make every candidate byte-identical."""
    import json
    import urllib.request

    from llm_inference_lab_tpu.server import InferenceServer

    srv = InferenceServer(_engine(max_new_tokens=12), n_slots=4, port=0)
    srv.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/completions",
            data=json.dumps({"prompt": "spread", "max_tokens": 12,
                             "temperature": 3.0, "seed": 7, "n": 3}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        texts = [c["text"] for c in out["choices"]]
        assert len(set(texts)) > 1, texts
        # And the whole request stays reproducible: same seed -> same set.
        with urllib.request.urlopen(req, timeout=60) as r:
            out2 = json.loads(r.read())
        assert texts == [c["text"] for c in out2["choices"]]
    finally:
        srv.stop()
