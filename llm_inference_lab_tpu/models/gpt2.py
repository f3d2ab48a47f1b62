"""GPT-2 family (gpt2, distilgpt2, …) — config presets + model factory.

Reference parity: the reference's default bench pair is gpt2 + distilgpt2
via HF (src/specdec/core/pipeline.py:464-515). Implemented from scratch on
the shared decoder in models/transformer.py (learned positions, LayerNorm
with bias, gelu MLP, tied lm_head).
"""

from __future__ import annotations

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
    def create(name: str = "gpt2", **kw) -> Model:
        from llm_inference_lab_tpu.models.factory import create_family_model
        from llm_inference_lab_tpu.models.loader import load_gpt2_checkpoint

        return create_family_model(GPT2_CONFIGS, load_gpt2_checkpoint, name, **kw)
