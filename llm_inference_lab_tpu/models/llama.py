"""Llama family (Llama-3.2-1B/3B, Llama-3.1-8B) — config presets + factory.

Reference parity: the reference's headline benchmark pair is
Llama-3.2-3B target + Llama-3.2-1B draft (README.md:130-136). RMSNorm,
rotary embeddings, GQA, gated-silu MLP on the shared decoder in
models/transformer.py.
"""

from __future__ import annotations

from llm_inference_lab_tpu.models.base import Model, ModelConfig

LLAMA_CONFIGS = {
    "llama-3.2-1b": ModelConfig(
        name="llama-3.2-1b",
        arch="llama",
        vocab_size=128256,
        n_layers=16,
        n_heads=32,
        n_kv_heads=8,
        d_model=2048,
        d_ff=8192,
        max_position_embeddings=131072,
        rope_theta=500000.0,
        rope_scaling=("llama3", 32.0, 1.0, 4.0, 8192),
        tie_word_embeddings=True,
    ),
    "llama-3.2-3b": ModelConfig(
        name="llama-3.2-3b",
        arch="llama",
        vocab_size=128256,
        n_layers=28,
        n_heads=24,
        n_kv_heads=8,
        d_model=3072,
        d_ff=8192,
        max_position_embeddings=131072,
        rope_theta=500000.0,
        rope_scaling=("llama3", 32.0, 1.0, 4.0, 8192),
        tie_word_embeddings=True,
    ),
    "llama-3.1-8b": ModelConfig(
        name="llama-3.1-8b",
        arch="llama",
        vocab_size=128256,
        n_layers=32,
        n_heads=32,
        n_kv_heads=8,
        d_model=4096,
        d_ff=14336,
        max_position_embeddings=131072,
        rope_theta=500000.0,
        rope_scaling=("llama3", 8.0, 1.0, 4.0, 8192),
        tie_word_embeddings=False,
    ),
    # Tiny config for tests (CPU-fast, same code path as the real sizes)
    "llama-tiny": ModelConfig(
        name="llama-tiny",
        arch="llama",
        vocab_size=256,
        n_layers=2,
        n_heads=4,
        n_kv_heads=2,
        d_model=64,
        d_ff=128,
        max_position_embeddings=512,
        tie_word_embeddings=True,
    ),
}


class LlamaModel:
    @staticmethod
    def create(name: str = "llama-3.2-1b", **kw) -> Model:
        from llm_inference_lab_tpu.models.factory import create_family_model
        from llm_inference_lab_tpu.models.loader import load_llama_checkpoint

        return create_family_model(LLAMA_CONFIGS, load_llama_checkpoint, name, **kw)
