"""GPT-2 family (gpt2, distilgpt2, …) — config presets + model factory.

Reference parity: the reference's default bench pair is gpt2 + distilgpt2
via HF (src/specdec/core/pipeline.py:464-515). Implemented from scratch on
the shared decoder in models/transformer.py (learned positions, LayerNorm
with bias, gelu MLP, tied lm_head).
"""

from __future__ import annotations

from dataclasses import replace
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from llm_inference_lab_tpu.models import transformer
from llm_inference_lab_tpu.models.base import Model, ModelConfig

GPT2_CONFIGS = {
    "gpt2": ModelConfig(
        name="gpt2",
        arch="gpt2",
        vocab_size=50257,
        n_layers=12,
        n_heads=12,
        n_kv_heads=12,
        d_model=768,
        d_ff=3072,
        max_position_embeddings=1024,
        use_learned_pos=True,
        use_bias=True,
        act="gelu",
        tie_word_embeddings=True,
    ),
    "distilgpt2": ModelConfig(
        name="distilgpt2",
        arch="gpt2",
        vocab_size=50257,
        n_layers=6,
        n_heads=12,
        n_kv_heads=12,
        d_model=768,
        d_ff=3072,
        max_position_embeddings=1024,
        use_learned_pos=True,
        use_bias=True,
        act="gelu",
        tie_word_embeddings=True,
    ),
    "gpt2-medium": ModelConfig(
        name="gpt2-medium",
        arch="gpt2",
        vocab_size=50257,
        n_layers=24,
        n_heads=16,
        n_kv_heads=16,
        d_model=1024,
        d_ff=4096,
        max_position_embeddings=1024,
        use_learned_pos=True,
        use_bias=True,
        act="gelu",
        tie_word_embeddings=True,
    ),
}


class GPT2Model:
    @staticmethod
    def create(
        name: str = "gpt2",
        rng: Optional[jax.Array] = None,
        dtype=jnp.bfloat16,
        checkpoint_path: Optional[str] = None,
        quantized_init: Optional[str] = None,
        quantize_embed: bool = False,
    ) -> Model:
        from llm_inference_lab_tpu.models.loader import (
            config_from_hf,
            find_cached_checkpoint,
            load_gpt2_checkpoint,
            load_hf_config,
        )

        cfg = replace(GPT2_CONFIGS[name], dtype=dtype)
        # Prefer real weights whenever a local HF snapshot exists (round-1
        # VERDICT missing #1: acceptance/quality numbers need real bytes).
        source = "random"
        if checkpoint_path is None and quantized_init is None:
            checkpoint_path = find_cached_checkpoint(name)
        if checkpoint_path:
            try:
                cfg = config_from_hf(load_hf_config(checkpoint_path), name, dtype)
            except (FileNotFoundError, KeyError, ValueError):
                pass  # no/odd config.json: keep the preset hyperparams
            params = load_gpt2_checkpoint(checkpoint_path, cfg)
            source = checkpoint_path
        elif quantized_init:
            params = transformer.init_params_quantized(
                cfg, rng if rng is not None else jax.random.PRNGKey(0),
                mode=quantized_init, quantize_embed=quantize_embed,
            )
        else:
            params = transformer.init_params(cfg, rng if rng is not None else jax.random.PRNGKey(0))
        return Model(config=cfg, params=params, apply_fn=partial(transformer.forward, cfg),
                     head_fn=partial(transformer.lm_head_logits, cfg),
                     extras={"weights_source": source})
