"""Qwen2/Qwen2.5 family — config presets + factory.

Llama-architecture variant (RMSNorm, rotary, GQA, gated-silu MLP) with one
delta: biases on the q/k/v projections only (ModelConfig.qkv_bias; the
loader concatenates them to match the fused qkv matmul). Beyond the
reference's model zoo (its HFWrapper loads any HF causal LM —
src/specdec/models/hf_wrappers.py:80-141 — so family breadth is part of
backend parity). The 0.5B draft + 7B target pair is a common spec-decode
pairing.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from llm_inference_lab_tpu.models.base import Model, ModelConfig

_QWEN_COMMON = dict(
    arch="llama",
    vocab_size=151936,
    rope_theta=1000000.0,
    rms_norm_eps=1e-6,
    qkv_bias=True,
    max_position_embeddings=32768,
)

QWEN2_CONFIGS = {
    "qwen2.5-0.5b": ModelConfig(
        name="qwen2.5-0.5b", n_layers=24, n_heads=14, n_kv_heads=2,
        d_model=896, d_ff=4864, tie_word_embeddings=True, **_QWEN_COMMON,
    ),
    "qwen2.5-1.5b": ModelConfig(
        name="qwen2.5-1.5b", n_layers=28, n_heads=12, n_kv_heads=2,
        d_model=1536, d_ff=8960, tie_word_embeddings=True, **_QWEN_COMMON,
    ),
    "qwen2.5-7b": ModelConfig(
        name="qwen2.5-7b", n_layers=28, n_heads=28, n_kv_heads=4,
        d_model=3584, d_ff=18944, tie_word_embeddings=False, **_QWEN_COMMON,
    ),
}


class Qwen2Model:
    @staticmethod
    def create(
        name: str = "qwen2.5-0.5b",
        rng: Optional[jax.Array] = None,
        dtype=jnp.bfloat16,
        checkpoint_path: Optional[str] = None,
        quantized_init: Optional[str] = None,
        quantize_embed: bool = False,
    ) -> Model:
        from llm_inference_lab_tpu.models.factory import create_family_model
        from llm_inference_lab_tpu.models.loader import load_llama_checkpoint

        return create_family_model(
            QWEN2_CONFIGS, load_llama_checkpoint, name, rng=rng, dtype=dtype,
            checkpoint_path=checkpoint_path, quantized_init=quantized_init,
            quantize_embed=quantize_embed,
        )
