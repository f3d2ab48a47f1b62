"""OPT family (facebook/opt-125m, opt-1.3b) — config presets + factory.

Reference parity: the reference exercises facebook/opt-125m throughout its
baseline/bench surface (src/server/local_baseline.py, src/benchmarks/
run_bench.py, src/specdec/verifier.py). Implemented from scratch on the
shared decoder in models/transformer.py: LayerNorm with bias, learned
positions with the HF +2 index offset, ReLU MLP, tied lm_head.

opt-350m is deliberately unsupported (word_embed_proj_dim != hidden_size
needs embed in/out projections; loader.config_from_hf rejects it).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from llm_inference_lab_tpu.models.base import Model, ModelConfig

_OPT_COMMON = dict(
    arch="opt",
    vocab_size=50272,
    max_position_embeddings=2048,
    use_learned_pos=True,
    use_bias=True,
    act="relu",
    pos_offset=2,
    tie_word_embeddings=True,
)

OPT_CONFIGS = {
    "opt-125m": ModelConfig(
        name="opt-125m", n_layers=12, n_heads=12, n_kv_heads=12,
        d_model=768, d_ff=3072, **_OPT_COMMON,
    ),
    "opt-1.3b": ModelConfig(
        name="opt-1.3b", n_layers=24, n_heads=32, n_kv_heads=32,
        d_model=2048, d_ff=8192, **_OPT_COMMON,
    ),
}


class OPTModel:
    @staticmethod
    def create(
        name: str = "opt-125m",
        rng: Optional[jax.Array] = None,
        dtype=jnp.bfloat16,
        checkpoint_path: Optional[str] = None,
        quantized_init: Optional[str] = None,
        quantize_embed: bool = False,
    ) -> Model:
        from llm_inference_lab_tpu.models.factory import create_family_model
        from llm_inference_lab_tpu.models.loader import load_opt_checkpoint

        return create_family_model(
            OPT_CONFIGS, load_opt_checkpoint, name, rng=rng, dtype=dtype,
            checkpoint_path=checkpoint_path, quantized_init=quantized_init,
            quantize_embed=quantize_embed,
        )
