"""Checkpoint loader tests: synthesize an HF-format safetensors file and
load it (reference has no checkpoint subsystem, SURVEY.md §5.4; weight-name
conventions follow HF llama/gpt2)."""

import numpy as np
import pytest

from llm_inference_lab_tpu.models.base import ModelConfig
from llm_inference_lab_tpu.models.loader import (
    load_gpt2_checkpoint,
    load_llama_checkpoint,
)

pytest.importorskip("safetensors")
from safetensors.numpy import save_file  # noqa: E402


def tiny_llama_cfg():
    return ModelConfig(
        arch="llama", vocab_size=64, n_layers=2, n_heads=4, n_kv_heads=2,
        d_model=16, d_ff=32, tie_word_embeddings=True,
    )


def make_llama_ckpt(path, cfg):
    rng = np.random.default_rng(0)
    t = {}
    D, F, H, KV, dh = cfg.d_model, cfg.d_ff, cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    t["model.embed_tokens.weight"] = rng.normal(size=(cfg.vocab_size, D)).astype(np.float32)
    t["model.norm.weight"] = np.ones((D,), np.float32)
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = np.ones((D,), np.float32)
        t[p + "post_attention_layernorm.weight"] = np.ones((D,), np.float32)
        t[p + "self_attn.q_proj.weight"] = rng.normal(size=(H * dh, D)).astype(np.float32)
        t[p + "self_attn.k_proj.weight"] = rng.normal(size=(KV * dh, D)).astype(np.float32)
        t[p + "self_attn.v_proj.weight"] = rng.normal(size=(KV * dh, D)).astype(np.float32)
        t[p + "self_attn.o_proj.weight"] = rng.normal(size=(D, H * dh)).astype(np.float32)
        t[p + "mlp.gate_proj.weight"] = rng.normal(size=(F, D)).astype(np.float32)
        t[p + "mlp.up_proj.weight"] = rng.normal(size=(F, D)).astype(np.float32)
        t[p + "mlp.down_proj.weight"] = rng.normal(size=(D, F)).astype(np.float32)
    save_file(t, path)
    return t


def test_llama_loader_shapes_and_transpose(tmp_path):
    cfg = tiny_llama_cfg()
    raw = make_llama_ckpt(str(tmp_path / "model.safetensors"), cfg)
    params = load_llama_checkpoint(str(tmp_path), cfg)
    L, D = cfg.n_layers, cfg.d_model
    H, KV, dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    assert params["embed"].shape == (cfg.vocab_size, D)
    assert params["layers"]["w_qkv"].shape == (L, D, (H + 2 * KV) * dh)
    # torch [out, in] -> ours [in, out]; q occupies the first H*dh columns
    np.testing.assert_allclose(
        np.asarray(params["layers"]["w_qkv"][0][:, : H * dh]),
        raw["model.layers.0.self_attn.q_proj.weight"].T,
        rtol=1e-2, atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(params["layers"]["w_qkv"][0][:, H * dh : (H + KV) * dh]),
        raw["model.layers.0.self_attn.k_proj.weight"].T,
        rtol=1e-2, atol=1e-2,
    )


def test_llama_loader_runs_forward(tmp_path):
    import jax, jax.numpy as jnp
    from dataclasses import replace
    from functools import partial
    from llm_inference_lab_tpu.models import transformer
    from llm_inference_lab_tpu.models.base import KVCache

    cfg = replace(tiny_llama_cfg(), dtype=jnp.float32)
    make_llama_ckpt(str(tmp_path / "model.safetensors"), cfg)
    params = load_llama_checkpoint(str(tmp_path), cfg)
    tokens = jnp.ones((1, 4), jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)[None]
    cache = KVCache.create(cfg, 1, 16)
    logits, _ = transformer.forward(
        cfg, params, tokens, pos, cache, jnp.zeros((1,), jnp.int32)
    )
    assert logits.shape == (1, 4, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_gpt2_loader(tmp_path):
    cfg = ModelConfig(
        arch="gpt2", vocab_size=64, n_layers=2, n_heads=2, n_kv_heads=2,
        d_model=8, d_ff=16, use_learned_pos=True, use_bias=True, act="gelu",
        max_position_embeddings=32,
    )
    rng = np.random.default_rng(1)
    D, F = cfg.d_model, cfg.d_ff
    t = {
        "wte.weight": rng.normal(size=(64, D)).astype(np.float32),
        "wpe.weight": rng.normal(size=(32, D)).astype(np.float32),
        "ln_f.weight": np.ones((D,), np.float32),
        "ln_f.bias": np.zeros((D,), np.float32),
    }
    for i in range(2):
        p = f"h.{i}."
        t[p + "ln_1.weight"] = np.ones((D,), np.float32)
        t[p + "ln_1.bias"] = np.zeros((D,), np.float32)
        t[p + "ln_2.weight"] = np.ones((D,), np.float32)
        t[p + "ln_2.bias"] = np.zeros((D,), np.float32)
        t[p + "attn.c_attn.weight"] = rng.normal(size=(D, 3 * D)).astype(np.float32)
        t[p + "attn.c_attn.bias"] = np.zeros((3 * D,), np.float32)
        t[p + "attn.c_proj.weight"] = rng.normal(size=(D, D)).astype(np.float32)
        t[p + "attn.c_proj.bias"] = np.zeros((D,), np.float32)
        t[p + "mlp.c_fc.weight"] = rng.normal(size=(D, F)).astype(np.float32)
        t[p + "mlp.c_fc.bias"] = np.zeros((F,), np.float32)
        t[p + "mlp.c_proj.weight"] = rng.normal(size=(F, D)).astype(np.float32)
        t[p + "mlp.c_proj.bias"] = np.zeros((D,), np.float32)
    save_file(t, str(tmp_path / "model.safetensors"))
    params = load_gpt2_checkpoint(str(tmp_path), cfg)
    assert params["layers"]["w_qkv"].shape == (2, D, 3 * D)
    # Conv1D NOT transposed; fused c_attn loaded as-is.
    np.testing.assert_allclose(
        np.asarray(params["layers"]["w_qkv"][0]),
        t["h.0.attn.c_attn.weight"],
        rtol=1e-2, atol=1e-2,
    )
