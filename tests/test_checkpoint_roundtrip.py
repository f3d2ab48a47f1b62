"""HF checkpoint round-trip: byte-correct parity with the HF implementation.

Round-1 VERDICT missing #1: the loader conventions (GPT-2 Conv1D layout,
fused c_attn, q/k/v concat order, rope theta + llama3 rope scaling, GQA,
tied/untied lm_head) were never proven against real checkpoint bytes. Zero
egress blocks hub downloads, so these tests CREATE HF-format checkpoints on
disk with `transformers` itself (random-init, save_pretrained safetensors —
exact key names and layouts of the published models), load them through
`models/loader.py`, and assert logit equivalence against the torch forward.

Reference analogue: src/specdec/models/hf_wrappers.py:80-141 (the reference
delegates all of this to HF `from_pretrained`).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llm_inference_lab_tpu.models import transformer
from llm_inference_lab_tpu.models.loader import (
    config_from_hf,
    load_gpt2_checkpoint,
    load_hf_config,
    load_llama_checkpoint,
)


def _our_logits(cfg, params, ids: np.ndarray) -> np.ndarray:
    B, S = ids.shape
    cache = __import__(
        "llm_inference_lab_tpu.models.base", fromlist=["KVCache"]
    ).KVCache.create(cfg, B, S + 8)
    positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    logits, _ = transformer.forward(
        cfg, params, jnp.asarray(ids), positions, cache, jnp.zeros((B,), jnp.int32)
    )
    return np.asarray(logits)


def _torch_logits(model, ids: np.ndarray) -> np.ndarray:
    with torch.no_grad():
        return model(torch.tensor(ids)).logits.float().numpy()


def _compare(cfg, params, hf_model, vocab: int, atol=2e-4):
    rng = np.random.default_rng(0)
    ids = rng.integers(0, vocab, size=(2, 13)).astype(np.int32)
    ours = _our_logits(cfg, params, ids)
    theirs = _torch_logits(hf_model, ids)
    # Compare log-softmax (logit offsets don't affect the distribution) in
    # fp32; both sides computed in float32.
    d = np.abs(ours - theirs).max()
    assert d < atol, f"max logit diff {d}"


def test_gpt2_roundtrip(tmp_path):
    """Conv1D (NOT transposed) + fused c_attn + learned positions + gelu_new
    + tied lm_head, against transformers.GPT2LMHeadModel."""
    hf_cfg = transformers.GPT2Config(
        vocab_size=96, n_positions=64, n_embd=32, n_layer=3, n_head=4,
    )
    m = transformers.GPT2LMHeadModel(hf_cfg).eval()
    m.save_pretrained(tmp_path, safe_serialization=True)

    cfg = config_from_hf(load_hf_config(str(tmp_path)), "gpt2-test", jnp.float32)
    assert cfg.arch == "gpt2" and cfg.n_layers == 3 and cfg.d_ff == 128
    params = load_gpt2_checkpoint(str(tmp_path), cfg)
    _compare(cfg, params, m, 96)


def test_llama_roundtrip_gqa_rope_scaling(tmp_path):
    """GQA + rope theta + LLAMA3 ROPE SCALING + untied lm_head, against
    transformers.LlamaForCausalLM (the Llama-3.1/3.2 convention)."""
    hf_cfg = transformers.LlamaConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=50000.0,
        rope_scaling={
            "rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
            "high_freq_factor": 4.0, "original_max_position_embeddings": 16,
        },
        tie_word_embeddings=False,
    )
    m = transformers.LlamaForCausalLM(hf_cfg).eval()
    m.save_pretrained(tmp_path, safe_serialization=True)

    cfg = config_from_hf(load_hf_config(str(tmp_path)), "llama-test", jnp.float32)
    assert cfg.rope_scaling == ("llama3", 8.0, 1.0, 4.0, 16)
    assert cfg.n_kv_heads == 2 and not cfg.tie_word_embeddings
    params = load_llama_checkpoint(str(tmp_path), cfg)
    _compare(cfg, params, m, 96)


def test_llama_roundtrip_tied_sharded(tmp_path):
    """Tied embeddings + MULTI-SHARD safetensors (the 3B/8B on-disk layout)."""
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, tie_word_embeddings=True,
    )
    m = transformers.LlamaForCausalLM(hf_cfg).eval()
    m.save_pretrained(tmp_path, safe_serialization=True, max_shard_size="40KB")
    shards = [f for f in tmp_path.iterdir() if f.suffix == ".safetensors"]
    assert len(shards) > 1, "expected a sharded checkpoint"

    cfg = config_from_hf(load_hf_config(str(tmp_path)), "llama-tied", jnp.float32)
    params = load_llama_checkpoint(str(tmp_path), cfg)
    _compare(cfg, params, m, 128)


def test_opt_roundtrip(tmp_path):
    """Separate q/k/v Linears fused on load + biases + LayerNorm + learned
    positions with the HF +2 offset + ReLU MLP + tied lm_head, against
    transformers.OPTForCausalLM (the reference's opt-125m surface,
    src/server/local_baseline.py)."""
    hf_cfg = transformers.OPTConfig(
        vocab_size=96, hidden_size=32, ffn_dim=64, num_hidden_layers=3,
        num_attention_heads=4, max_position_embeddings=64,
        do_layer_norm_before=True, word_embed_proj_dim=32,
    )
    m = transformers.OPTForCausalLM(hf_cfg).eval()
    m.save_pretrained(tmp_path, safe_serialization=True)

    from llm_inference_lab_tpu.models.loader import load_opt_checkpoint

    cfg = config_from_hf(load_hf_config(str(tmp_path)), "opt-test", jnp.float32)
    assert cfg.arch == "opt" and cfg.pos_offset == 2 and cfg.act == "relu"
    params = load_opt_checkpoint(str(tmp_path), cfg)
    assert params["pos_embed"].shape[0] == 64 + 2
    _compare(cfg, params, m, 96)


def test_qwen2_roundtrip_qkv_bias(tmp_path):
    """Llama-layout checkpoint + q/k/v biases (fused to b_qkv on load) + GQA,
    against transformers.Qwen2ForCausalLM."""
    hf_cfg = transformers.Qwen2Config(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=100000.0,
        tie_word_embeddings=False,
    )
    m = transformers.Qwen2ForCausalLM(hf_cfg).eval()
    # Qwen2's q/k/v biases are zero-init; randomize so the test actually
    # proves the fused-bias load order.
    with torch.no_grad():
        for layer in m.model.layers:
            for proj in (layer.self_attn.q_proj, layer.self_attn.k_proj,
                         layer.self_attn.v_proj):
                proj.bias.normal_(0.0, 0.5)
    m.save_pretrained(tmp_path, safe_serialization=True)

    cfg = config_from_hf(load_hf_config(str(tmp_path)), "qwen2-test", jnp.float32)
    assert cfg.arch == "llama" and cfg.qkv_bias and cfg.sliding_window is None
    params = load_llama_checkpoint(str(tmp_path), cfg)
    assert params["layers"]["b_qkv"].shape == (2, (4 + 2 + 2) * 8)
    _compare(cfg, params, m, 96)


def test_mistral_roundtrip_sliding_window(tmp_path):
    """Llama-layout checkpoint + a sliding window SMALL ENOUGH TO BIND at the
    test sequence length, against transformers.MistralForCausalLM — proves
    the window mask (ops/attention.attend_xla) matches HF's."""
    hf_cfg = transformers.MistralConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, sliding_window=5,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    m = transformers.MistralForCausalLM(hf_cfg).eval()
    m.save_pretrained(tmp_path, safe_serialization=True)

    cfg = config_from_hf(load_hf_config(str(tmp_path)), "mistral-test", jnp.float32)
    assert cfg.arch == "llama" and cfg.sliding_window == 5
    params = load_llama_checkpoint(str(tmp_path), cfg)
    # The test prompt is 13 tokens > window 5: the mask binds.
    _compare(cfg, params, m, 96)


def test_engine_prefers_cached_checkpoint(tmp_path, monkeypatch):
    """get_model auto-loads from a seeded HF hub cache (bench.py reports
    real acceptance the moment weights exist)."""
    hf_cfg = transformers.LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=True,
    )
    m = transformers.LlamaForCausalLM(hf_cfg).eval()
    snap = (
        tmp_path / "hub" / "models--meta-llama--Llama-3.2-1B" / "snapshots" / "abc123"
    )
    snap.mkdir(parents=True)
    m.save_pretrained(snap, safe_serialization=True)
    monkeypatch.setenv("HF_HOME", str(tmp_path))

    from llm_inference_lab_tpu.models.registry import get_model

    model = get_model("llama-3.2-1b", "hf", dtype=jnp.float32)
    assert model.extras["weights_source"] == str(snap)
    # Hyperparams came from the checkpoint's config.json, not the preset.
    assert model.config.d_model == 16 and model.config.n_layers == 2
    ids = np.array([[1, 2, 3, 4]], np.int32)
    _compare(model.config, model.params, m, 64, atol=3e-4)


def test_gemma_roundtrip(tmp_path):
    """Decoupled head_dim + sqrt(d) embed normalizer + (1+w) RMSNorm +
    GeGLU + MQA + tied embeddings, against transformers.GemmaForCausalLM."""
    hf_cfg = transformers.GemmaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=1,
        head_dim=16, max_position_embeddings=64,
        hidden_activation="gelu_pytorch_tanh",
    )
    m = transformers.GemmaForCausalLM(hf_cfg).eval()
    m.save_pretrained(tmp_path, safe_serialization=True)

    cfg = config_from_hf(load_hf_config(str(tmp_path)), "gemma-test", jnp.float32)
    assert cfg.head_dim == 16 and cfg.embed_scale and cfg.rms_one_offset
    assert cfg.act == "gelu_tanh" and cfg.tie_word_embeddings
    params = load_llama_checkpoint(str(tmp_path), cfg)
    _compare(cfg, params, m, 128)


def test_gemma2_roundtrip(tmp_path):
    """Gemma-2: sandwich norms (4 per layer), attention + final logit
    softcaps, query_pre_attn_scalar != head_dim, ALTERNATING local/global
    attention with a window small enough to bind, against
    transformers.Gemma2ForCausalLM."""
    hf_cfg = transformers.Gemma2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=64,
        query_pre_attn_scalar=24, sliding_window=8,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        hidden_activation="gelu_pytorch_tanh",
    )
    m = transformers.Gemma2ForCausalLM(hf_cfg).eval()
    m.save_pretrained(tmp_path, safe_serialization=True)

    cfg = config_from_hf(load_hf_config(str(tmp_path)), "gemma2-test", jnp.float32)
    assert cfg.post_norms and cfg.alt_window and cfg.sliding_window == 8
    assert cfg.attn_logit_softcap == 50.0 and cfg.final_logit_softcap == 30.0
    assert cfg.query_pre_attn_scalar == 24.0
    params = load_llama_checkpoint(str(tmp_path), cfg)
    _compare(cfg, params, m, 128)


def test_phi3_roundtrip_fused_projections(tmp_path):
    """Phi-3: checkpoint stores PRE-FUSED qkv_proj ([q|k|v]) and
    gate_up_proj ([gate|up]) — the load must land them on our fused
    layout without reordering, against transformers.Phi3ForCausalLM.
    Window disabled (phi3 window semantics differ from mistral's by one;
    the real mini-4k window (2047) never binds at test lengths anyway)."""
    hf_cfg = transformers.Phi3Config(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, sliding_window=None,
        tie_word_embeddings=False, attn_implementation="eager",
        pad_token_id=0, bos_token_id=1, eos_token_id=2,  # default 32000 > toy vocab
    )
    m = transformers.Phi3ForCausalLM(hf_cfg).eval()
    m.save_pretrained(tmp_path, safe_serialization=True)

    from llm_inference_lab_tpu.models.loader import load_phi3_checkpoint

    cfg = config_from_hf(load_hf_config(str(tmp_path)), "phi3-test",
                         jnp.float32)
    assert cfg.arch == "llama" and not cfg.qkv_bias
    params = load_phi3_checkpoint(str(tmp_path), cfg)
    assert params["layers"]["w_qkv"].shape == (2, 32, (4 + 2 + 2) * 8)
    _compare(cfg, params, m, 96)
