"""Gemma family — config presets + factory.

Llama-architecture variant with four wrinkles (HF modeling_gemma):
head_dim decoupled from d_model/n_heads (256 regardless), a sqrt(d_model)
input-embedding normalizer cast to the compute dtype, RMSNorm weights
stored as (w - 1) so the effective scale is 1 + w, and GeGLU — the gated
MLP's gate activation is tanh-approximated gelu, not silu. Checkpoint key
layout is identical to Llama (the loader is shared); embeddings are tied.
Beyond the reference's model zoo (its HFWrapper loads any HF causal LM —
src/specdec/models/hf_wrappers.py:80-141).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from llm_inference_lab_tpu.models.base import Model, ModelConfig

_COMMON = dict(
    arch="llama",
    vocab_size=256000,
    rope_theta=10000.0,
    rms_norm_eps=1e-6,
    max_position_embeddings=8192,
    tie_word_embeddings=True,
    head_dim_override=256,
    embed_scale=True,
    rms_one_offset=True,
    act="gelu_tanh",
)

GEMMA_CONFIGS = {
    "gemma-2b": ModelConfig(
        name="gemma-2b", n_layers=18, n_heads=8, n_kv_heads=1,
        d_model=2048, d_ff=16384, **_COMMON,
    ),
    "gemma-7b": ModelConfig(
        name="gemma-7b", n_layers=28, n_heads=16, n_kv_heads=16,
        d_model=3072, d_ff=24576, **_COMMON,
    ),
    # Tiny config for tests: keeps every gemma wrinkle (decoupled head_dim,
    # embed scale, (1+w) norms, GeGLU, MQA) at toy size.
    "gemma-tiny": ModelConfig(
        name="gemma-tiny", n_layers=2, n_heads=4, n_kv_heads=1,
        d_model=64, d_ff=128, **{**_COMMON, "vocab_size": 256,
                                 "head_dim_override": 32},
    ),
}


_COMMON2 = dict(
    **{**_COMMON, "max_position_embeddings": 8192},
    attn_logit_softcap=50.0,
    final_logit_softcap=30.0,
    post_norms=True,
    alt_window=True,
    sliding_window=4096,
)

GEMMA2_CONFIGS = {
    "gemma-2-2b": ModelConfig(
        name="gemma-2-2b", n_layers=26, n_heads=8, n_kv_heads=4,
        d_model=2304, d_ff=9216, query_pre_attn_scalar=256.0, **_COMMON2,
    ),
    "gemma-2-9b": ModelConfig(
        name="gemma-2-9b", n_layers=42, n_heads=16, n_kv_heads=8,
        d_model=3584, d_ff=14336, query_pre_attn_scalar=256.0, **_COMMON2,
    ),
    "gemma2-tiny": ModelConfig(
        name="gemma2-tiny", n_layers=4, n_heads=4, n_kv_heads=2,
        d_model=64, d_ff=128,
        # Tiny window so the alternating local/global masks actually bind
        # in tests; qpas != head_dim exercises the decoupled scale.
        query_pre_attn_scalar=24.0,
        **{**_COMMON2, "vocab_size": 256, "head_dim_override": 32,
           "sliding_window": 16},
    ),
}
GEMMA_CONFIGS.update(GEMMA2_CONFIGS)


class GemmaModel:
    @staticmethod
    def create(
        name: str = "gemma-2b",
        rng: Optional[jax.Array] = None,
        dtype=jnp.bfloat16,
        checkpoint_path: Optional[str] = None,
        quantized_init: Optional[str] = None,
        quantize_embed: bool = False,
    ) -> Model:
        from llm_inference_lab_tpu.models.factory import create_family_model
        from llm_inference_lab_tpu.models.loader import load_llama_checkpoint

        return create_family_model(
            GEMMA_CONFIGS, load_llama_checkpoint, name, rng=rng, dtype=dtype,
            checkpoint_path=checkpoint_path, quantized_init=quantized_init,
            quantize_embed=quantize_embed,
        )
