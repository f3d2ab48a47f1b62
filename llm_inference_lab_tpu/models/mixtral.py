"""Mixtral family — sparse mixture-of-experts (config presets + factory).

Mistral attention (GQA + optional sliding window) with a top-2-routed
8-expert gated-MLP block per layer (ops/moe.py; HF modeling_mixtral.py
semantics: softmax over the top-k router logits). Beyond the reference's
model zoo — it has no MoE models (its HFWrapper loads dense causal LMs,
src/specdec/models/hf_wrappers.py:80-141).

Expert parallelism: an "expert" mesh axis shards the [L, E, ...] expert
stacks (parallel/sharding.py); the engine switches the MoE layer to the
dispatch-einsum implementation so GSPMD partitions the per-expert lanes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from llm_inference_lab_tpu.models.base import Model, ModelConfig

MIXTRAL_CONFIGS = {
    "mixtral-8x7b": ModelConfig(
        name="mixtral-8x7b",
        arch="llama",
        vocab_size=32000,
        n_layers=32,
        n_heads=32,
        n_kv_heads=8,
        d_model=4096,
        d_ff=14336,
        max_position_embeddings=32768,
        rope_theta=1e6,
        rms_norm_eps=1e-5,
        tie_word_embeddings=False,
        n_experts=8,
        experts_per_token=2,
    ),
    # Test-scale geometry: same structure, tiny dims.
    "mixtral-tiny": ModelConfig(
        name="mixtral-tiny",
        arch="llama",
        vocab_size=256,
        n_layers=2,
        n_heads=4,
        n_kv_heads=2,
        d_model=64,
        d_ff=128,
        max_position_embeddings=512,
        tie_word_embeddings=True,
        n_experts=4,
        experts_per_token=2,
    ),
}


class MixtralModel:
    @staticmethod
    def create(
        name: str = "mixtral-8x7b",
        rng: Optional[jax.Array] = None,
        dtype=jnp.bfloat16,
        checkpoint_path: Optional[str] = None,
        quantized_init: Optional[str] = None,
        quantize_embed: bool = False,
    ) -> Model:
        from llm_inference_lab_tpu.models.factory import create_family_model
        from llm_inference_lab_tpu.models.loader import load_mixtral_checkpoint

        if quantized_init:
            raise NotImplementedError(
                "quantized random init for MoE expert stacks is not "
                "implemented; use bf16 init or a real checkpoint"
            )
        return create_family_model(
            MIXTRAL_CONFIGS, load_mixtral_checkpoint, name, rng=rng,
            dtype=dtype, checkpoint_path=checkpoint_path,
            quantized_init=None, quantize_embed=quantize_embed,
        )
