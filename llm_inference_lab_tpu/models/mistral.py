"""Mistral family — config presets + factory.

Llama-architecture variant (identical checkpoint key layout; the loader is
shared) plus sliding-window attention (ModelConfig.sliding_window; the
window mask lives in ops/attention.attend_xla and only binds when the KV
cache is longer than the window — Mistral-7B-v0.1's window is 4096).
Beyond the reference's model zoo (its HFWrapper loads any HF causal LM —
src/specdec/models/hf_wrappers.py:80-141).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from llm_inference_lab_tpu.models.base import Model, ModelConfig

MISTRAL_CONFIGS = {
    "mistral-7b": ModelConfig(
        name="mistral-7b",
        arch="llama",
        vocab_size=32000,
        n_layers=32,
        n_heads=32,
        n_kv_heads=8,
        d_model=4096,
        d_ff=14336,
        max_position_embeddings=32768,
        rope_theta=10000.0,
        rms_norm_eps=1e-5,
        sliding_window=4096,
        tie_word_embeddings=False,
    ),
    # Test-scale variant with a BINDING window (16 << any test max_seq):
    # exercises the sliding-window mask and the rolling-buffer (kv_ring)
    # cache paths on CPU in milliseconds.
    "mistral-tiny": ModelConfig(
        name="mistral-tiny",
        arch="llama",
        vocab_size=256,
        n_layers=2,
        n_heads=4,
        n_kv_heads=2,
        d_model=64,
        d_ff=128,
        max_position_embeddings=1024,
        sliding_window=16,
        tie_word_embeddings=True,
    ),
}


class MistralModel:
    @staticmethod
    def create(
        name: str = "mistral-7b",
        rng: Optional[jax.Array] = None,
        dtype=jnp.bfloat16,
        checkpoint_path: Optional[str] = None,
        quantized_init: Optional[str] = None,
        quantize_embed: bool = False,
    ) -> Model:
        from llm_inference_lab_tpu.models.factory import create_family_model
        from llm_inference_lab_tpu.models.loader import load_llama_checkpoint

        return create_family_model(
            MISTRAL_CONFIGS, load_llama_checkpoint, name, rng=rng, dtype=dtype,
            checkpoint_path=checkpoint_path, quantized_init=quantized_init,
            quantize_embed=quantize_embed,
        )
