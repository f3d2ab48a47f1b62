"""Mixture-of-experts (Mixtral family) + expert parallelism.

Beyond the reference's model zoo (no MoE there). Covers: the two exact MoE
implementations against a per-token loop, HF-checkpoint round-trip parity
against transformers.MixtralForCausalLM, engine end-to-end, and the
"expert" mesh axis (weights sharded on E, dispatch-einsum path)."""

from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llm_inference_lab_tpu.config import EngineConfig
from llm_inference_lab_tpu.core.engine import Engine
from llm_inference_lab_tpu.models import transformer
from llm_inference_lab_tpu.models.base import KVCache
from llm_inference_lab_tpu.models.mixtral import MIXTRAL_CONFIGS, MixtralModel
from llm_inference_lab_tpu.ops.moe import moe_dense, moe_ragged
from llm_inference_lab_tpu.parallel.mesh import make_mesh
from llm_inference_lab_tpu.parallel.sharding import shard_params


def _loop_reference(x, w_router, w_gate_up, w_down, top_k):
    """Per-token python loop: literal Mixtral semantics."""
    x = np.asarray(x, np.float32)
    T, D = x.shape
    E, _, FF2 = w_gate_up.shape
    F = FF2 // 2
    out = np.zeros((T, D), np.float32)
    logits = x @ np.asarray(w_router, np.float32)
    for t in range(T):
        top = np.argsort(logits[t])[::-1][:top_k]
        w = np.exp(logits[t][top] - logits[t][top].max())
        w = w / w.sum()
        for wi, e in zip(w, top):
            h = x[t] @ np.asarray(w_gate_up[e], np.float32)
            a = h[:F] / (1 + np.exp(-h[:F])) * h[F:]  # silu(gate) * up
            out[t] += wi * (a @ np.asarray(w_down[e], np.float32))
    return out


def _random_moe(T=12, D=16, F=24, E=4, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(T, D)), jnp.float32)
    wr = jnp.asarray(rng.normal(size=(D, E)), jnp.float32)
    wgu = jnp.asarray(rng.normal(size=(E, D, 2 * F)) * 0.2, jnp.float32)
    wd = jnp.asarray(rng.normal(size=(E, F, D)) * 0.2, jnp.float32)
    return x, wr, wgu, wd


@pytest.mark.parametrize("impl", [moe_ragged, moe_dense])
def test_moe_matches_loop_reference(impl):
    x, wr, wgu, wd = _random_moe()
    got = np.asarray(jax.jit(partial(impl, top_k=2))(x, wr, wgu, wd))
    ref = _loop_reference(x, wr, wgu, wd, top_k=2)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_moe_ragged_equals_dense():
    x, wr, wgu, wd = _random_moe(T=33, D=8, F=16, E=3, seed=1)
    a = np.asarray(moe_ragged(x, wr, wgu, wd, top_k=2))
    b = np.asarray(moe_dense(x, wr, wgu, wd, top_k=2))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_mixtral_hf_roundtrip(tmp_path):
    """Loader parity against transformers.MixtralForCausalLM bytes."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from llm_inference_lab_tpu.models.loader import (
        config_from_hf,
        load_hf_config,
        load_mixtral_checkpoint,
    )

    hf_cfg = transformers.MixtralConfig(
        vocab_size=96, hidden_size=32, intermediate_size=56,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=64, sliding_window=None,
    )
    m = transformers.MixtralForCausalLM(hf_cfg).eval()
    m.save_pretrained(tmp_path, safe_serialization=True)

    cfg = config_from_hf(load_hf_config(str(tmp_path)), "mixtral-test", jnp.float32)
    assert cfg.n_experts == 4 and cfg.experts_per_token == 2
    params = load_mixtral_checkpoint(str(tmp_path), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 96, size=(2, 11)).astype(np.int32)
    cache = KVCache.create(cfg, 2, 32)
    positions = jnp.broadcast_to(jnp.arange(11, dtype=jnp.int32)[None], (2, 11))
    ours, _ = transformer.forward(
        cfg, params, jnp.asarray(ids), positions, cache,
        jnp.zeros((2,), jnp.int32),
    )
    with torch.no_grad():
        theirs = m(torch.tensor(ids)).logits.float().numpy()
    d = np.abs(np.asarray(ours) - theirs).max()
    assert d < 2e-4, f"max logit diff {d}"


def _tiny_engine(mesh_shape=None, **kw):
    return Engine(
        EngineConfig(
            base_model="mixtral-tiny", draft_model=None, implementation="hf",
            greedy=True, max_new_tokens=10, max_seq_len=128, dtype="float32",
            mesh_shape=mesh_shape or {}, **kw,
        ),
        target_model=MixtralModel.create(
            "mixtral-tiny", rng=jax.random.PRNGKey(11), dtype=jnp.float32
        ),
    )


def test_mixtral_engine_end_to_end():
    eng = _tiny_engine()
    r1 = eng.generate("mixture of experts engine check")
    r2 = eng.generate("mixture of experts engine check")
    assert r1["generated_ids"] == r2["generated_ids"]
    assert r1["generated_tokens"] == 10


def test_mixtral_ngram_spec_matches_baseline():
    base = _tiny_engine()
    spec = _tiny_engine(draft_mode="ngram", max_draft=3)
    p = "the cat sat. the cat sat. the"
    assert spec.generate(p)["generated_ids"] == base.generate(p)["generated_ids"]


# ------------------------------------------------------------- expert mesh
def test_expert_parallel_forward_matches():
    """Expert-sharded dense-dispatch forward == unsharded ragged forward."""
    cfg = MIXTRAL_CONFIGS["mixtral-tiny"]
    import dataclasses

    cfg = dataclasses.replace(cfg, dtype=jnp.float32)
    params = transformer.init_params(cfg, jax.random.PRNGKey(3))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(2, 8)), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32)[None], (2, 8))
    ref, _ = transformer.forward(
        cfg, params, ids, positions, KVCache.create(cfg, 2, 32),
        jnp.zeros((2,), jnp.int32),
    )

    mesh = make_mesh(expert=4)
    sharded = shard_params(params, mesh)
    w = sharded["layers"]["w_gate_up"]
    assert len(w.addressable_shards) == 4
    assert w.addressable_shards[0].data.shape[1] == 1  # 1 of 4 experts/device
    ep_cfg = dataclasses.replace(cfg, moe_impl="dense")
    with jax.set_mesh(mesh):
        got, _ = jax.jit(partial(transformer.forward, ep_cfg))(
            sharded, ids, positions, KVCache.create(cfg, 2, 32),
            jnp.zeros((2,), jnp.int32),
        )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_expert_parallel_engine():
    base = _tiny_engine()
    ep = _tiny_engine(mesh_shape={"expert": 4})
    assert ep.target.config.moe_impl == "dense"
    p = "expert parallel engine check"
    assert ep.generate(p)["generated_ids"] == base.generate(p)["generated_ids"]
