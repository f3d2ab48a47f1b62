"""Quantized KV cache tests (the north star's "quantized KV-cache append";
the reference's KV machinery is fp-only, src/kernels/cuda/kv_cache.cu)."""

import os

os.environ["SPECDX_PALLAS_INTERPRET"] = "1"

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_inference_lab_tpu.models.base import KVCache, update_cache_layer
from llm_inference_lab_tpu.models.llama import LlamaModel
from llm_inference_lab_tpu.ops.attention import attend_xla


def test_quantized_append_roundtrip():
    B, T, H, D = 2, 8, 4, 16
    k_cache = jnp.zeros((B, H, T, D), jnp.int8)  # heads-major layout
    scales = jnp.ones((B, H, T), jnp.float32)
    rng = np.random.default_rng(0)
    k_new = jnp.asarray(rng.normal(size=(B, 3, H, D)).astype(np.float32))
    start = jnp.array([0, 2], jnp.int32)
    kq, vq, ks, vs = update_cache_layer(
        k_cache, k_cache, scales, scales, k_new, k_new, start
    )
    # Dequantized rows must approximate the source rows (compare heads-major).
    deq = np.asarray(kq, np.float32) * np.asarray(ks)[..., None]  # [B, H, T, D]
    src = np.swapaxes(np.asarray(k_new), 1, 2)  # [B, H, 3, D]
    np.testing.assert_allclose(deq[0, :, 0:3], src[0], atol=0.02, rtol=0.02)
    np.testing.assert_allclose(deq[1, :, 2:5], src[1], atol=0.02, rtol=0.02)
    # Untouched rows stay zero.
    assert np.abs(np.asarray(kq)[0, :, 3:]).sum() == 0


def test_quantized_attention_close_to_fp():
    rng = np.random.default_rng(1)
    B, S, H, D, T = 2, 3, 4, 32, 16
    q = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, T, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, T, D)).astype(np.float32))
    pos = jnp.broadcast_to(jnp.arange(8, 8 + S, dtype=jnp.int32)[None], (B, S))

    ref = attend_xla(q, k, v, pos)

    from llm_inference_lab_tpu.models.base import _quantize_rows

    kq, ks = _quantize_rows(k)
    vq, vs = _quantize_rows(v)
    out = attend_xla(q, kq, vq, pos, ks, vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.05, rtol=0.05)


def test_flash_quant_kernel_matches_xla():
    rng = np.random.default_rng(2)
    B, S, group, KVH, D, T = 1, 2, 2, 2, 128, 256
    H = group * KVH
    q = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, KVH, T, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, KVH, T, D)).astype(np.float32))
    pos = jnp.asarray([[100, 101]], jnp.int32)

    from llm_inference_lab_tpu.models.base import _quantize_rows
    from llm_inference_lab_tpu.ops.pallas.flash_decode import flash_decode_attention

    kq, ks = _quantize_rows(k)
    vq, vs = _quantize_rows(v)
    ref = attend_xla(q, kq, vq, pos, ks, vs)
    out = flash_decode_attention(q, kq, vq, pos, ks, vs, interpret=True, block_t=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3, rtol=5e-3)


def test_model_decode_with_quantized_cache_close():
    m = LlamaModel.create("llama-tiny", rng=jax.random.PRNGKey(5), dtype=jnp.float32)
    B, T, total = 1, 32, 10
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(0, 255, (B, total)), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(total, dtype=jnp.int32)[None], (B, total))

    fp_logits, _ = m.apply(
        m.params, tokens, pos, m.init_cache(B, T), jnp.zeros((B,), jnp.int32)
    )
    q_logits, _ = m.apply(
        m.params, tokens, pos, m.init_cache(B, T, quantized=True),
        jnp.zeros((B,), jnp.int32),
    )
    # int8 KV error should barely move the logits.
    fp = np.asarray(fp_logits)
    qd = np.asarray(q_logits)
    assert np.abs(fp - qd).max() < 0.35 * (np.abs(fp).max() + 1)
    # Greedy tokens should mostly agree.
    agree = (fp.argmax(-1) == qd.argmax(-1)).mean()
    assert agree > 0.8, agree


def test_engine_kv_quantized_end_to_end():
    from llm_inference_lab_tpu.config import EngineConfig
    from llm_inference_lab_tpu.core.engine import Engine

    eng = Engine(
        EngineConfig(base_model="llama-tiny", draft_model="llama-tiny",
                     implementation="hf", max_draft=2, max_new_tokens=8,
                     kv_quantization="int8", dtype="float32"),
    )
    r = eng.generate("kv quant engine")
    assert r["generated_tokens"] > 0
