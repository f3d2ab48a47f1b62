"""Phi-3 family — config presets + factory.

Llama-architecture variant (RMSNorm, rotary, gated-silu MLP, untied head)
whose HF checkpoints store PRE-FUSED qkv_proj / gate_up_proj weights —
load_phi3_checkpoint maps them straight onto our fused matmul layout.
The mini-4k config carries a BINDING sliding window (2047 < 4096).
Beyond the reference's model zoo (its HFWrapper loads any HF causal LM,
src/specdec/models/hf_wrappers.py:80-141, so family breadth is backend
parity). phi-3-mini pairs with qwen2.5-0.5b-style drafts or ngram mode.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from llm_inference_lab_tpu.models.base import Model, ModelConfig

PHI3_CONFIGS = {
    "phi-3-mini-4k-instruct": ModelConfig(
        name="phi-3-mini-4k-instruct", arch="llama",
        vocab_size=32064, n_layers=32, n_heads=32, n_kv_heads=32,
        d_model=3072, d_ff=8192, max_position_embeddings=4096,
        rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False, sliding_window=2047,
    ),
    # Tiny preset for tests / CI (same conventions, toy dims).
    "phi3-tiny": ModelConfig(
        name="phi3-tiny", arch="llama",
        vocab_size=256, n_layers=2, n_heads=4, n_kv_heads=4,
        d_model=32, d_ff=64, max_position_embeddings=512,
        rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False, sliding_window=None,
    ),
}


class Phi3Model:
    @staticmethod
    def create(
        name: str = "phi-3-mini-4k-instruct",
        rng: Optional[jax.Array] = None,
        dtype=jnp.bfloat16,
        checkpoint_path: Optional[str] = None,
        quantized_init: Optional[str] = None,
        quantize_embed: bool = False,
    ) -> Model:
        from llm_inference_lab_tpu.models.factory import create_family_model
        from llm_inference_lab_tpu.models.loader import load_phi3_checkpoint

        return create_family_model(
            PHI3_CONFIGS, load_phi3_checkpoint, name, rng=rng, dtype=dtype,
            checkpoint_path=checkpoint_path, quantized_init=quantized_init,
            quantize_embed=quantize_embed,
        )
