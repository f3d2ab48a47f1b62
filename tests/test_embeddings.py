"""Embeddings (OpenAI /v1/embeddings): pooled final hidden states from
the target model — Engine.embed and the server endpoint."""

import base64
import json

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from llm_inference_lab_tpu.config import EngineConfig
from llm_inference_lab_tpu.core.engine import Engine


@pytest.fixture(scope="module")
def eng():
    return Engine(EngineConfig(
        implementation="fake", base_model="fake", draft_model=None,
        max_new_tokens=4,
    ))


def test_embed_shapes_and_normalization(eng):
    emb, n = eng.embed(["hello world", "a longer sentence for pooling"])
    assert emb.shape[0] == 2 and emb.shape[1] > 0
    assert emb.dtype == np.float32
    assert n > 0
    np.testing.assert_allclose(
        np.linalg.norm(emb, axis=-1), 1.0, rtol=1e-5
    )


def test_embed_deterministic_and_batch_independent(eng):
    solo, _ = eng.embed(["same text"])
    batched, _ = eng.embed(["same text", "other"])
    np.testing.assert_allclose(solo[0], batched[0], rtol=1e-5, atol=1e-6)
    again, _ = eng.embed(["same text"])
    np.testing.assert_allclose(solo[0], again[0], rtol=0, atol=0)


def test_embed_pooling_modes_differ(eng):
    mean, _ = eng.embed(["pooling check text"], pooling="mean")
    last, _ = eng.embed(["pooling check text"], pooling="last")
    assert not np.allclose(mean, last)
    with pytest.raises(ValueError):
        eng.embed(["x"], pooling="max")


def test_server_embeddings_endpoint(eng):
    import urllib.request

    from llm_inference_lab_tpu.server import InferenceServer

    srv = InferenceServer(eng, n_slots=2, port=0)
    srv.start()

    def post(payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/embeddings",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=120) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    try:
        code, out = post({"input": ["alpha", "beta"]})
        assert code == 200
        assert out["object"] == "list" and len(out["data"]) == 2
        assert out["data"][1]["index"] == 1
        v = out["data"][0]["embedding"]
        assert isinstance(v, list) and len(v) > 0
        assert out["usage"]["prompt_tokens"] > 0

        # base64 encoding round-trips to the float payload
        code, out64 = post({"input": "alpha", "encoding_format": "base64"})
        assert code == 200
        raw = np.frombuffer(
            base64.b64decode(out64["data"][0]["embedding"]), dtype="<f4"
        )
        np.testing.assert_allclose(raw, v, rtol=1e-6)

        code, _ = post({"input": 42})
        assert code == 400
        code, _ = post({"input": "x", "encoding_format": "int8"})
        assert code == 400
    finally:
        srv.stop()
