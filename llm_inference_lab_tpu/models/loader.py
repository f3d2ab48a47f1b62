"""HF safetensors checkpoint -> stacked-layer JAX params.

Reference parity: the reference loads weights through HF
`from_pretrained` (src/specdec/models/hf_wrappers.py:80-141); here we read
the safetensors shards directly into the framework's own param tree (the
reference has no checkpoint subsystem at all — SURVEY.md §5.4 — so this is
also the checkpoint/resume green-field component).

Conventions handled:
* torch Linear weights are [out, in] -> transposed to [in, out].
* GPT-2 uses Conv1D ([in, out], NOT transposed) and a fused c_attn that is
  split into q/k/v.
* Per-layer tensors are stacked along a leading layer axis to match the
  lax.scan transformer body.
* Optional sharding: pass a Mesh to place each stacked tensor with the
  parallel.sharding rules as it loads (no full-model host copy per device).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from llm_inference_lab_tpu.models.base import ModelConfig


def _open_shards(path: str) -> Dict[str, np.ndarray]:
    """Load all tensors from *.safetensors in `path` (file or directory)."""
    from safetensors import safe_open

    files = (
        [path]
        if path.endswith(".safetensors")
        else sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".safetensors")
        )
    )
    if not files:
        raise FileNotFoundError(f"no .safetensors under {path}")
    out: Dict[str, np.ndarray] = {}
    for f in files:
        with safe_open(f, framework="numpy") as st:
            for key in st.keys():
                out[key] = st.get_tensor(key)
    return out


def _to_jax(x: np.ndarray, dtype) -> jax.Array:
    if x.dtype == np.uint16:  # bfloat16 raw storage
        import ml_dtypes

        x = x.view(ml_dtypes.bfloat16)
    return jnp.asarray(x).astype(dtype)


def load_llama_checkpoint(path: str, cfg: ModelConfig) -> Any:
    w = _open_shards(path)
    dt = cfg.dtype
    L = cfg.n_layers

    def layer_stack(fmt: str, transpose: bool = True):
        ts = []
        for i in range(L):
            t = w[fmt.format(i=i)]
            ts.append(t.T if transpose else t)
        return _to_jax(np.stack(ts), dt)

    def fused_stack(fmts):
        """Stack [L, D, sum(out)] concatenating projections on the out dim
        (the runtime uses fused QKV / gate-up matmuls)."""
        ts = []
        for i in range(L):
            ts.append(np.concatenate([w[f.format(i=i)].T for f in fmts], axis=-1))
        return _to_jax(np.stack(ts), dt)

    # Gemma2 "sandwich" norms remap the names: the pre-mlp norm is
    # pre_feedforward_layernorm (post_attention_layernorm becomes the
    # post-ATTENTION output norm). Everyone else: post_attention = pre-mlp.
    mlp_norm_key = (
        "model.layers.{i}.pre_feedforward_layernorm.weight"
        if cfg.post_norms
        else "model.layers.{i}.post_attention_layernorm.weight"
    )
    layers = {
        "attn_norm_scale": layer_stack(
            "model.layers.{i}.input_layernorm.weight", transpose=False
        ),
        "mlp_norm_scale": layer_stack(mlp_norm_key, transpose=False),
        "w_qkv": fused_stack([
            "model.layers.{i}.self_attn.q_proj.weight",
            "model.layers.{i}.self_attn.k_proj.weight",
            "model.layers.{i}.self_attn.v_proj.weight",
        ]),
        "wo": layer_stack("model.layers.{i}.self_attn.o_proj.weight"),
        "w_gate_up": fused_stack([
            "model.layers.{i}.mlp.gate_proj.weight",
            "model.layers.{i}.mlp.up_proj.weight",
        ]),
        "w_down": layer_stack("model.layers.{i}.mlp.down_proj.weight"),
    }
    if cfg.post_norms:
        layers["post_attn_norm_scale"] = layer_stack(
            "model.layers.{i}.post_attention_layernorm.weight", transpose=False
        )
        layers["post_mlp_norm_scale"] = layer_stack(
            "model.layers.{i}.post_feedforward_layernorm.weight",
            transpose=False,
        )
    if cfg.qkv_bias:  # qwen2: q/k/v biases, concatenated to match fused qkv
        layers["b_qkv"] = fused_stack([
            "model.layers.{i}.self_attn.q_proj.bias",
            "model.layers.{i}.self_attn.k_proj.bias",
            "model.layers.{i}.self_attn.v_proj.bias",
        ])
    params = {
        "embed": _to_jax(w["model.embed_tokens.weight"], dt),
        "layers": layers,
        "final_norm_scale": _to_jax(w["model.norm.weight"], dt),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = _to_jax(w["lm_head.weight"].T, dt)
    return params


def load_phi3_checkpoint(path: str, cfg: ModelConfig) -> Any:
    """HF Phi-3: llama architecture with PRE-FUSED projections in the
    checkpoint — self_attn.qkv_proj ([q|k|v] rows) and mlp.gate_up_proj
    ([gate|up] rows, HF modeling_phi3 chunk order) — so the transpose
    lands directly on our fused [D, out] layout with no concatenation."""
    w = _open_shards(path)
    dt = cfg.dtype
    L = cfg.n_layers

    def layer_stack(fmt: str, transpose: bool = True):
        ts = []
        for i in range(L):
            t = w[fmt.format(i=i)]
            ts.append(t.T if transpose else t)
        return _to_jax(np.stack(ts), dt)

    layers = {
        "attn_norm_scale": layer_stack(
            "model.layers.{i}.input_layernorm.weight", transpose=False
        ),
        "mlp_norm_scale": layer_stack(
            "model.layers.{i}.post_attention_layernorm.weight",
            transpose=False,
        ),
        "w_qkv": layer_stack("model.layers.{i}.self_attn.qkv_proj.weight"),
        "wo": layer_stack("model.layers.{i}.self_attn.o_proj.weight"),
        "w_gate_up": layer_stack("model.layers.{i}.mlp.gate_up_proj.weight"),
        "w_down": layer_stack("model.layers.{i}.mlp.down_proj.weight"),
    }
    params = {
        "embed": _to_jax(w["model.embed_tokens.weight"], dt),
        "layers": layers,
        "final_norm_scale": _to_jax(w["model.norm.weight"], dt),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = _to_jax(w["lm_head.weight"].T, dt)
    return params


def load_mixtral_checkpoint(path: str, cfg: ModelConfig) -> Any:
    """HF Mixtral: llama-style attention + block_sparse_moe MLP. Expert
    weights stack to [L, E, D, 2F] (w1=gate, w3=up fused on the out dim)
    and [L, E, F, D] (w2=down); the router gate transposes to [L, D, E].
    Key layout: model.layers.{i}.block_sparse_moe.gate.weight and
    .experts.{e}.w{1,2,3}.weight (HF modeling_mixtral.py)."""
    base = load_llama_like_attention(path, cfg)
    w = _open_shards(path)
    dt = cfg.dtype
    L, E = cfg.n_layers, cfg.n_experts

    def moe_stacks():
        routers, gate_ups, downs = [], [], []
        for i in range(L):
            pre = f"model.layers.{i}.block_sparse_moe"
            routers.append(w[f"{pre}.gate.weight"].T)  # [D, E]
            gu, dn = [], []
            for e in range(E):
                w1 = w[f"{pre}.experts.{e}.w1.weight"].T  # [D, F] gate
                w3 = w[f"{pre}.experts.{e}.w3.weight"].T  # [D, F] up
                gu.append(np.concatenate([w1, w3], axis=-1))  # [D, 2F]
                dn.append(w[f"{pre}.experts.{e}.w2.weight"].T)  # [F, D]
            gate_ups.append(np.stack(gu))  # [E, D, 2F]
            downs.append(np.stack(dn))  # [E, F, D]
        return (
            _to_jax(np.stack(routers), dt),
            _to_jax(np.stack(gate_ups), dt),
            _to_jax(np.stack(downs), dt),
        )

    router, gate_up, down = moe_stacks()
    base["layers"]["w_router"] = router
    base["layers"]["w_gate_up"] = gate_up
    base["layers"]["w_down"] = down
    return base


def load_llama_like_attention(path: str, cfg: ModelConfig) -> Any:
    """The attention/norm/embedding subset of load_llama_checkpoint —
    shared by MoE archs whose MLP weights live elsewhere."""
    w = _open_shards(path)
    dt = cfg.dtype
    L = cfg.n_layers

    def layer_stack(fmt: str, transpose: bool = True):
        ts = [w[fmt.format(i=i)] for i in range(L)]
        if transpose:
            ts = [t.T for t in ts]
        return _to_jax(np.stack(ts), dt)

    def fused_stack(fmts):
        return _to_jax(
            np.stack(
                [
                    np.concatenate([w[f.format(i=i)].T for f in fmts], axis=-1)
                    for i in range(L)
                ]
            ),
            dt,
        )

    layers = {
        "attn_norm_scale": layer_stack(
            "model.layers.{i}.input_layernorm.weight", transpose=False
        ),
        "mlp_norm_scale": layer_stack(
            "model.layers.{i}.post_attention_layernorm.weight", transpose=False
        ),
        "w_qkv": fused_stack([
            "model.layers.{i}.self_attn.q_proj.weight",
            "model.layers.{i}.self_attn.k_proj.weight",
            "model.layers.{i}.self_attn.v_proj.weight",
        ]),
        "wo": layer_stack("model.layers.{i}.self_attn.o_proj.weight"),
    }
    params = {
        "embed": _to_jax(w["model.embed_tokens.weight"], dt),
        "layers": layers,
        "final_norm_scale": _to_jax(w["model.norm.weight"], dt),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = _to_jax(w["lm_head.weight"].T, dt)
    return params


def load_gpt2_checkpoint(path: str, cfg: ModelConfig) -> Any:
    w = _open_shards(path)
    dt = cfg.dtype
    L = cfg.n_layers
    D = cfg.d_model

    def g(name: str, i: int) -> np.ndarray:
        for prefix in ("", "transformer."):
            key = f"{prefix}h.{i}.{name}"
            if key in w:
                return w[key]
        raise KeyError(name)

    def top(name: str) -> np.ndarray:
        for prefix in ("", "transformer."):
            if prefix + name in w:
                return w[prefix + name]
        raise KeyError(name)

    def stack(fn):
        return np.stack([fn(i) for i in range(L)])

    # GPT-2 Conv1D weights are already [in, out]; c_attn is already the
    # fused qkv matmul the runtime wants — no split needed.
    layers = {
        "attn_norm_scale": _to_jax(stack(lambda i: g("ln_1.weight", i)), dt),
        "attn_norm_bias": _to_jax(stack(lambda i: g("ln_1.bias", i)), dt),
        "mlp_norm_scale": _to_jax(stack(lambda i: g("ln_2.weight", i)), dt),
        "mlp_norm_bias": _to_jax(stack(lambda i: g("ln_2.bias", i)), dt),
        "w_qkv": _to_jax(stack(lambda i: g("attn.c_attn.weight", i)), dt),
        "b_qkv": _to_jax(stack(lambda i: g("attn.c_attn.bias", i)), dt),
        "wo": _to_jax(stack(lambda i: g("attn.c_proj.weight", i)), dt),
        "bo": _to_jax(stack(lambda i: g("attn.c_proj.bias", i)), dt),
        "w_fc": _to_jax(stack(lambda i: g("mlp.c_fc.weight", i)), dt),
        "b_fc": _to_jax(stack(lambda i: g("mlp.c_fc.bias", i)), dt),
        "w_proj": _to_jax(stack(lambda i: g("mlp.c_proj.weight", i)), dt),
        "b_proj": _to_jax(stack(lambda i: g("mlp.c_proj.bias", i)), dt),
    }
    return {
        "embed": _to_jax(top("wte.weight"), dt),
        "pos_embed": _to_jax(top("wpe.weight"), dt),
        "layers": layers,
        "final_norm_scale": _to_jax(top("ln_f.weight"), dt),
        "final_norm_bias": _to_jax(top("ln_f.bias"), dt),
    }


def load_opt_checkpoint(path: str, cfg: ModelConfig) -> Any:
    """HF OPT (facebook/opt-*): torch Linear layout (transposed), separate
    q/k/v projections with biases fused here, LayerNorm with bias, learned
    positions with the HF +2 index offset (the table has max_pos+2 rows —
    kept whole; the runtime adds cfg.pos_offset when indexing)."""
    w = _open_shards(path)
    dt = cfg.dtype
    L = cfg.n_layers

    def g(name: str, i: int) -> np.ndarray:
        for prefix in ("model.decoder.", "decoder."):
            key = f"{prefix}layers.{i}.{name}"
            if key in w:
                return w[key]
        raise KeyError(name)

    def top(name: str) -> np.ndarray:
        for prefix in ("model.decoder.", "decoder."):
            if prefix + name in w:
                return w[prefix + name]
        raise KeyError(name)

    def stack(name: str, transpose: bool = False):
        ts = [g(name, i) for i in range(L)]
        return _to_jax(np.stack([t.T if transpose else t for t in ts]), dt)

    def fused(names, transpose: bool):
        ts = []
        for i in range(L):
            ts.append(
                np.concatenate(
                    [g(n, i).T if transpose else g(n, i) for n in names], axis=-1
                )
            )
        return _to_jax(np.stack(ts), dt)

    qkv = ["self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"]
    layers = {
        "attn_norm_scale": stack("self_attn_layer_norm.weight"),
        "attn_norm_bias": stack("self_attn_layer_norm.bias"),
        # OPT's per-layer `final_layer_norm` is the pre-MLP norm.
        "mlp_norm_scale": stack("final_layer_norm.weight"),
        "mlp_norm_bias": stack("final_layer_norm.bias"),
        "w_qkv": fused([n + ".weight" for n in qkv], transpose=True),
        "b_qkv": fused([n + ".bias" for n in qkv], transpose=False),
        "wo": stack("self_attn.out_proj.weight", transpose=True),
        "bo": stack("self_attn.out_proj.bias"),
        "w_fc": stack("fc1.weight", transpose=True),
        "b_fc": stack("fc1.bias"),
        "w_proj": stack("fc2.weight", transpose=True),
        "b_proj": stack("fc2.bias"),
    }
    params = {
        "embed": _to_jax(top("embed_tokens.weight"), dt),
        "pos_embed": _to_jax(top("embed_positions.weight"), dt),
        "layers": layers,
        "final_norm_scale": _to_jax(top("final_layer_norm.weight"), dt),
        "final_norm_bias": _to_jax(top("final_layer_norm.bias"), dt),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = _to_jax(w["lm_head.weight"].T, dt)
    return params


def resolve_hf_dir(name: str) -> Optional[str]:
    """Find a model's snapshot dir in the local HF hub cache, if present."""
    root = os.path.expanduser(
        os.environ.get("HF_HOME", "~/.cache/huggingface")
    )
    cand = os.path.join(root, "hub", f"models--{name.replace('/', '--')}", "snapshots")
    if not os.path.isdir(cand):
        return None
    snaps = sorted(os.listdir(cand))
    return os.path.join(cand, snaps[-1]) if snaps else None


# Framework model key -> candidate HF hub repo ids (first cached wins).
HF_REPO_IDS = {
    "gpt2": ["gpt2", "openai-community/gpt2"],
    "distilgpt2": ["distilgpt2", "distilbert/distilgpt2"],
    "gpt2-medium": ["gpt2-medium", "openai-community/gpt2-medium"],
    "llama-3.2-1b": ["meta-llama/Llama-3.2-1B", "meta-llama/Llama-3.2-1B-Instruct"],
    "llama-3.2-3b": ["meta-llama/Llama-3.2-3B", "meta-llama/Llama-3.2-3B-Instruct"],
    "llama-3.1-8b": [
        "meta-llama/Llama-3.1-8B",
        "meta-llama/Meta-Llama-3.1-8B",
        "meta-llama/Llama-3.1-8B-Instruct",
    ],
    "opt-125m": ["facebook/opt-125m"],
    "opt-1.3b": ["facebook/opt-1.3b"],
    "qwen2.5-0.5b": ["Qwen/Qwen2.5-0.5B", "Qwen/Qwen2.5-0.5B-Instruct"],
    "qwen2.5-1.5b": ["Qwen/Qwen2.5-1.5B", "Qwen/Qwen2.5-1.5B-Instruct"],
    "qwen2.5-7b": ["Qwen/Qwen2.5-7B", "Qwen/Qwen2.5-7B-Instruct"],
    "gemma-2b": ["google/gemma-2b", "google/gemma-1.1-2b-it"],
    "gemma-7b": ["google/gemma-7b", "google/gemma-1.1-7b-it"],
    "gemma-2-2b": ["google/gemma-2-2b", "google/gemma-2-2b-it"],
    "gemma-2-9b": ["google/gemma-2-9b", "google/gemma-2-9b-it"],
    "mistral-7b": [
        "mistralai/Mistral-7B-v0.1",
        "mistralai/Mistral-7B-v0.3",
        "mistralai/Mistral-7B-Instruct-v0.3",
    ],
}


def find_cached_checkpoint(key: str) -> Optional[str]:
    """Snapshot dir with weights for a framework model key, if the local HF
    cache has one (zero-egress environments: present only when pre-seeded).
    The engine prefers real weights whenever this returns a path."""
    for repo in HF_REPO_IDS.get(key, [key]):
        d = resolve_hf_dir(repo)
        if d and any(f.endswith(".safetensors") for f in os.listdir(d)):
            return d
    return None


def load_hf_config(path: str) -> dict:
    with open(os.path.join(path, "config.json")) as f:
        return json.load(f)


def config_from_hf(hf: dict, name: str, dtype) -> ModelConfig:
    """HF config.json -> ModelConfig, so hyperparameters (rope theta/scaling,
    eps, GQA heads) come from the CHECKPOINT, not a preset — byte-correct
    parity with whatever snapshot is cached (reference loads these via
    AutoModel, hf_wrappers.py:80-141)."""
    mt = hf.get("model_type", "")
    if mt == "gpt2":
        return ModelConfig(
            name=name,
            arch="gpt2",
            vocab_size=hf["vocab_size"],
            n_layers=hf["n_layer"],
            n_heads=hf["n_head"],
            n_kv_heads=hf["n_head"],
            d_model=hf["n_embd"],
            d_ff=hf.get("n_inner") or 4 * hf["n_embd"],
            max_position_embeddings=hf["n_positions"],
            layer_norm_eps=hf.get("layer_norm_epsilon", 1e-5),
            use_learned_pos=True,
            use_bias=True,
            act="gelu",
            tie_word_embeddings=hf.get("tie_word_embeddings", True),
            dtype=dtype,
        )
    if mt == "opt":
        if hf.get("word_embed_proj_dim", hf["hidden_size"]) != hf["hidden_size"]:
            raise ValueError(
                "OPT checkpoints with word_embed_proj_dim != hidden_size "
                "(opt-350m) use embed in/out projections we do not implement"
            )
        if not hf.get("do_layer_norm_before", True):
            raise ValueError("post-norm OPT (do_layer_norm_before=False) unsupported")
        return ModelConfig(
            name=name,
            arch="opt",
            vocab_size=hf["vocab_size"],
            n_layers=hf["num_hidden_layers"],
            n_heads=hf["num_attention_heads"],
            n_kv_heads=hf["num_attention_heads"],
            d_model=hf["hidden_size"],
            d_ff=hf["ffn_dim"],
            max_position_embeddings=hf["max_position_embeddings"],
            layer_norm_eps=1e-5,
            use_learned_pos=True,
            use_bias=True,
            act=hf.get("activation_function", "relu"),
            pos_offset=2,
            tie_word_embeddings=hf.get("tie_word_embeddings", True),
            dtype=dtype,
        )
    if mt == "phi3":
        # Phi-3: llama architecture, fused qkv/gate_up in the checkpoint
        # (load_phi3_checkpoint), sliding window (binding on mini-4k:
        # sliding_window=2047 < max_position_embeddings).
        return ModelConfig(
            name=name,
            arch="llama",
            vocab_size=hf["vocab_size"],
            n_layers=hf["num_hidden_layers"],
            n_heads=hf["num_attention_heads"],
            n_kv_heads=hf.get("num_key_value_heads",
                              hf["num_attention_heads"]),
            d_model=hf["hidden_size"],
            d_ff=hf["intermediate_size"],
            max_position_embeddings=hf.get("max_position_embeddings", 4096),
            rope_theta=float(hf.get("rope_theta", 10000.0)),
            rms_norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
            tie_word_embeddings=hf.get("tie_word_embeddings", False),
            sliding_window=hf.get("sliding_window"),
            dtype=dtype,
        )
    if mt in ("llama", "qwen2", "mistral", "mixtral"):
        rs = hf.get("rope_scaling")
        rope_scaling = None
        if rs:
            kind = rs.get("rope_type", rs.get("type", "llama3"))
            rope_scaling = (
                kind,
                float(rs["factor"]),
                float(rs.get("low_freq_factor", 1.0)),
                float(rs.get("high_freq_factor", 4.0)),
                int(rs.get("original_max_position_embeddings", 8192)),
            )
        return ModelConfig(
            name=name,
            arch="llama",
            vocab_size=hf["vocab_size"],
            n_layers=hf["num_hidden_layers"],
            n_heads=hf["num_attention_heads"],
            n_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
            d_model=hf["hidden_size"],
            d_ff=hf["intermediate_size"],
            max_position_embeddings=hf.get("max_position_embeddings", 2048),
            rope_theta=float(hf.get("rope_theta", 10000.0)),
            rope_scaling=rope_scaling,
            rms_norm_eps=float(hf.get("rms_norm_eps", 1e-5)),
            tie_word_embeddings=hf.get("tie_word_embeddings", False),
            # Qwen2 puts biases on q/k/v only (modeling_qwen2: qkv_bias).
            qkv_bias=mt == "qwen2" and hf.get("qkv_bias", True),
            # Mistral enables the window whenever set; Qwen2 gates it behind
            # use_sliding_window (HF default False).
            sliding_window=(
                hf.get("sliding_window")
                if (mt != "qwen2" or hf.get("use_sliding_window", False))
                else None
            ),
            # Mixtral: routed MoE MLP (num_local_experts gated experts,
            # top num_experts_per_tok per token).
            n_experts=hf.get("num_local_experts", 0) if mt == "mixtral" else 0,
            experts_per_token=hf.get("num_experts_per_tok", 2),
            dtype=dtype,
        )
    if mt == "gemma2":
        # Gemma-2 = Gemma conventions + logit softcaps + sandwich norms +
        # query_pre_attn_scalar scale + alternating local/global attention
        # (HF modeling_gemma2).
        return ModelConfig(
            name=name,
            arch="llama",
            vocab_size=hf["vocab_size"],
            n_layers=hf["num_hidden_layers"],
            n_heads=hf["num_attention_heads"],
            n_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
            d_model=hf["hidden_size"],
            d_ff=hf["intermediate_size"],
            max_position_embeddings=hf.get("max_position_embeddings", 8192),
            rope_theta=float(hf.get("rope_theta", 10000.0)),
            rms_norm_eps=float(hf.get("rms_norm_eps", 1e-6)),
            tie_word_embeddings=hf.get("tie_word_embeddings", True),
            head_dim_override=hf.get("head_dim", 256),
            embed_scale=True,
            rms_one_offset=True,
            act="gelu_tanh",
            attn_logit_softcap=hf.get("attn_logit_softcapping", 50.0),
            final_logit_softcap=hf.get("final_logit_softcapping", 30.0),
            query_pre_attn_scalar=float(
                hf.get("query_pre_attn_scalar", hf.get("head_dim", 256))
            ),
            post_norms=True,
            alt_window=True,
            sliding_window=hf.get("sliding_window", 4096),
            dtype=dtype,
        )
    if mt == "gemma":
        # Gemma-1: decoupled head_dim, sqrt(d) embedding scale, RMSNorm
        # weights stored as (w - 1), GeGLU (tanh-gelu gated mlp), tied
        # embeddings (HF modeling_gemma).
        return ModelConfig(
            name=name,
            arch="llama",
            vocab_size=hf["vocab_size"],
            n_layers=hf["num_hidden_layers"],
            n_heads=hf["num_attention_heads"],
            n_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
            d_model=hf["hidden_size"],
            d_ff=hf["intermediate_size"],
            max_position_embeddings=hf.get("max_position_embeddings", 8192),
            rope_theta=float(hf.get("rope_theta", 10000.0)),
            rms_norm_eps=float(hf.get("rms_norm_eps", 1e-6)),
            tie_word_embeddings=hf.get("tie_word_embeddings", True),
            head_dim_override=hf.get("head_dim", 256),
            embed_scale=True,
            rms_one_offset=True,
            act="gelu_tanh",
            dtype=dtype,
        )
    raise ValueError(f"unsupported HF model_type {mt!r}")
