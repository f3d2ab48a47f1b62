"""Multi-LoRA serving: batched per-slot adapters (models/lora.py).

Ground truth is MERGED weights: for each layer, w_site += A @ B gives a
dense model that must produce bit-identical-ish logits to the pack path
(same dtype/ordering up to matmul association). Base slots (-1) must be
untouched by the presence of the pack."""

import os

import jax

jax.config.update("jax_platforms", "cpu")

from dataclasses import replace
from functools import partial

import jax.numpy as jnp
import numpy as np
import pytest

from llm_inference_lab_tpu.config import EngineConfig
from llm_inference_lab_tpu.core.batching import ContinuousBatcher
from llm_inference_lab_tpu.core.engine import Engine
from llm_inference_lab_tpu.models import transformer
from llm_inference_lab_tpu.models.base import Model
from llm_inference_lab_tpu.models.llama import LLAMA_CONFIGS
from llm_inference_lab_tpu.models.lora import (
    Adapter,
    build_pack,
    load_peft_adapter,
    make_adapter,
)

CFG = replace(LLAMA_CONFIGS["llama-tiny"], dtype=jnp.float32)


def _model(params=None):
    p = params if params is not None else transformer.init_params(
        CFG, jax.random.PRNGKey(7)
    )
    return Model(
        config=CFG, params=p,
        apply_fn=partial(transformer.forward, CFG),
        head_fn=partial(transformer.lm_head_logits, CFG),
    )


def _merged_params(base_params, adapter: Adapter):
    """Dense-merge the adapter into copies of the fused weights."""
    import copy

    p = copy.deepcopy(jax.tree_util.tree_map(np.asarray, base_params))
    site_key = {"qkv": "w_qkv", "o": "wo", "gate_up": "w_gate_up",
                "down": "w_down"}
    for site, key in site_key.items():
        w = adapter.weights.get(site)
        if w is None:
            continue
        A, B = w  # [L, in, R], [L, R, out]
        delta = np.einsum("lir,lro->lio", A, B)
        p["layers"][key] = (
            np.asarray(p["layers"][key], np.float32) + delta
        ).astype(np.float32)
    return jax.tree_util.tree_map(jnp.asarray, p)


def _fwd(model, lora_ids=None):
    toks = jnp.arange(1, 9, dtype=jnp.int32)[None].repeat(
        len(lora_ids) if lora_ids is not None else 1, 0
    )
    B, S = toks.shape
    cache = model.init_cache(B, 32)
    logits, _ = model.apply_fn(
        model.params, toks,
        jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S)),
        cache, jnp.zeros((B,), jnp.int32),
        lora_ids=None if lora_ids is None else jnp.asarray(
            lora_ids, jnp.int32
        ),
    )
    return np.asarray(logits)


# alpha is cranked so the delta reliably shifts the tiny random model's
# greedy argmax (it decodes degenerately; a subtle adapter wouldn't bite).
ADAPTERS = [
    make_adapter(CFG, "math", rank=4, alpha=512.0, targets=("q", "v"),
                 rng=np.random.default_rng(1)),
    make_adapter(CFG, "code", rank=2, alpha=512.0,
                 targets=("q", "k", "v", "o", "gate", "up", "down"),
                 rng=np.random.default_rng(2)),
]


def test_pack_matches_merged_weights():
    base = _model()
    pack, names = build_pack(CFG, ADAPTERS, dtype=jnp.float32)
    assert names == {"math": 0, "code": 1}
    packed = dict(base.params)
    packed["layers"] = dict(base.params["layers"])
    packed["layers"].update(pack)
    m = _model(packed)
    for name, j in names.items():
        got = _fwd(m, lora_ids=[j])
        want = _fwd(_model(_merged_params(base.params, ADAPTERS[j])))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4), name


def test_base_rows_unaffected_and_mixed_batch():
    base = _model()
    plain = _fwd(base)
    pack, _ = build_pack(CFG, ADAPTERS, dtype=jnp.float32)
    packed = dict(base.params)
    packed["layers"] = dict(base.params["layers"])
    packed["layers"].update(pack)
    m = _model(packed)
    # One batch mixing base / math / code rows:
    out = _fwd(m, lora_ids=[-1, 0, 1])
    np.testing.assert_allclose(out[0], plain[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out[1], _fwd(m, lora_ids=[0])[0],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out[2], _fwd(m, lora_ids=[1])[0],
                               rtol=1e-5, atol=1e-5)
    assert not np.allclose(out[1], out[0], atol=1e-3)  # adapter does bite


def _engine(**kw):
    return Engine(
        EngineConfig(implementation="hf", base_model="llama-tiny",
                     draft_model=None, max_new_tokens=10, greedy=True,
                     dtype="float32", **kw),
        target_model=_model(),
        lora_adapters=ADAPTERS,
    )


def test_engine_generate_with_adapter():
    eng = _engine()
    base_ids = eng.generate("adapt me")["generated_ids"]
    math_ids = eng.generate("adapt me", adapter="math")["generated_ids"]
    # Merged-weight engine is the ground truth for the adapter decode.
    merged = Engine(
        EngineConfig(implementation="hf", base_model="llama-tiny",
                     draft_model=None, max_new_tokens=10, greedy=True,
                     dtype="float32"),
        target_model=_model(_merged_params(_model().params, ADAPTERS[0])),
    )
    assert math_ids == merged.generate("adapt me")["generated_ids"]
    assert base_ids != math_ids  # the random adapters shift greedy argmax


def test_batcher_per_request_adapters():
    eng = _engine()
    b = ContinuousBatcher(eng, n_slots=3)
    r_base = b.submit("same prompt")
    r_math = b.submit("same prompt", lora="math")
    r_code = b.submit("same prompt", lora="code")
    out = {r["req_id"]: r for r in b.run()}
    assert out[r_base]["generated_ids"] != out[r_math]["generated_ids"]
    assert out[r_math]["generated_ids"] != out[r_code]["generated_ids"]
    # Each equals its whole-batch-adapter engine run.
    assert (out[r_math]["generated_ids"]
            == _engine().generate("same prompt", adapter="math")[
                "generated_ids"])


def test_batcher_unknown_adapter_errors():
    b = ContinuousBatcher(_engine(), n_slots=2)
    b.submit("x", lora="nope")
    with pytest.raises(ValueError):
        b.run()


def test_server_model_routing():
    import json as _json
    import urllib.error
    import urllib.request

    from llm_inference_lab_tpu.server import InferenceServer

    srv = InferenceServer(_engine(), n_slots=2, port=0)
    srv.start()

    def post(body):
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/completions",
            data=_json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            return _json.loads(r.read())

    try:
        models = _json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/v1/models", timeout=10
        ).read())
        ids = [m["id"] for m in models["data"]]
        assert "llama-tiny" in ids and "math" in ids and "code" in ids

        base = post({"prompt": "route", "max_tokens": 8})
        math = post({"prompt": "route", "max_tokens": 8, "model": "math"})
        again = post({"prompt": "route", "max_tokens": 8,
                      "model": "llama-tiny"})
        assert base["choices"][0]["text"] == again["choices"][0]["text"]
        assert base["choices"][0]["text"] != math["choices"][0]["text"]
        with pytest.raises(urllib.error.HTTPError):
            post({"prompt": "route", "max_tokens": 4, "model": "ghost"})
    finally:
        srv.stop()


def test_peft_loader_roundtrip(tmp_path):
    """HF PEFT directory (adapter_config.json + adapter_model.safetensors,
    torch-layout lora_A [r, in] / lora_B [out, r]) loads into matrices
    that reproduce the make_adapter pack exactly."""
    import json as _json

    from safetensors.numpy import save_file

    rng = np.random.default_rng(5)
    r = 4
    H, KV, Dh, D = CFG.n_heads, CFG.n_kv_heads, CFG.head_dim, CFG.d_model
    tensors = {}
    a_q = rng.normal(0, 0.1, (CFG.n_layers, D, r)).astype(np.float32)
    b_q = rng.normal(0, 0.1, (CFG.n_layers, r, H * Dh)).astype(np.float32)
    a_v = rng.normal(0, 0.1, (CFG.n_layers, D, r)).astype(np.float32)
    b_v = rng.normal(0, 0.1, (CFG.n_layers, r, KV * Dh)).astype(np.float32)
    for i in range(CFG.n_layers):
        pre = f"base_model.model.model.layers.{i}.self_attn"
        tensors[f"{pre}.q_proj.lora_A.weight"] = a_q[i].T.copy()
        tensors[f"{pre}.q_proj.lora_B.weight"] = b_q[i].T.copy()
        tensors[f"{pre}.v_proj.lora_A.weight"] = a_v[i].T.copy()
        tensors[f"{pre}.v_proj.lora_B.weight"] = b_v[i].T.copy()
    adir = tmp_path / "my-adapter"
    os.makedirs(adir)
    save_file(tensors, str(adir / "adapter_model.safetensors"))
    (adir / "adapter_config.json").write_text(
        _json.dumps({"r": r, "lora_alpha": 8})
    )

    got = load_peft_adapter(str(adir), CFG)
    assert got.name == "my-adapter"
    want = make_adapter(CFG, "w", rank=r, alpha=8.0,
                        matrices={"q": (a_q, b_q), "v": (a_v, b_v)})
    for site in ("qkv", "o", "gate_up", "down"):
        gw, ww = got.weights[site], want.weights[site]
        if ww is None:
            assert gw is None
            continue
        np.testing.assert_allclose(gw[0], ww[0], rtol=1e-6)
        np.testing.assert_allclose(gw[1], ww[1], rtol=1e-6)
