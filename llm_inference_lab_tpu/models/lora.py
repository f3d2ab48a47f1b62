"""Multi-LoRA serving: batched per-slot low-rank adapters.

vLLM-style multi-tenant adapters, TPU-native: all n adapters live stacked
on device ([L, n, D_in, R] / [L, n, R, D_out] per target site) and every
decode step GATHERS each slot's adapter rows by its `lora_id` — one batch
serves different fine-tunes simultaneously, with the base model as id -1.
The delta is two small einsums per site (R <= ~192), negligible next to
the main weight-bound matmul, and works unchanged on paged caches,
quantized base weights, and under GSPMD sharding (the pack replicates).

Target sites match the fused matmul layout (models/transformer.py):
  qkv      — per-matrix PEFT A/B for q/k/v fuse into a block-diagonal
             [3R-rank] pair whose product EQUALS the per-matrix deltas
  o        — attention output projection
  gate_up  — per-matrix gate/up fused the same way
  down     — MLP down projection

PEFT checkpoints (adapter_model.safetensors + adapter_config.json) load
via load_peft_adapter; build_pack stacks any number of adapters
(zero-padding ranks so one shape serves all). The reference has no
adapter machinery (single-model runtime) — this is a serving north-star
feature.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from llm_inference_lab_tpu.models.base import ModelConfig

SITES = ("qkv", "o", "gate_up", "down")


def _site_dims(cfg: ModelConfig):
    H, KV, Dh, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim, cfg.d_model
    return {
        "qkv": (D, (H + 2 * KV) * Dh),
        "o": (H * Dh, D),
        "gate_up": (D, 2 * cfg.d_ff),
        "down": (cfg.d_ff, D),
    }


def _fuse_block_diag(parts, in_dim, out_slices, rank):
    """Fuse per-matrix (A [in, r], B [r, out_i]) LoRAs into ONE pair whose
    product equals the per-matrix deltas: A_f = concat(A_i) on the rank
    axis; B_f places each B_i block-diagonally at its output slice."""
    total_r = rank * len(parts)
    out_dim = out_slices[-1][1]
    A = np.zeros((in_dim, total_r), np.float32)
    B = np.zeros((total_r, out_dim), np.float32)
    for i, (ab, (lo, hi)) in enumerate(zip(parts, out_slices)):
        if ab is None:
            continue
        a, b = ab
        r = a.shape[1]
        A[:, i * rank : i * rank + r] = a
        B[i * rank : i * rank + r, lo:hi] = b
    return A, B


class Adapter:
    """One adapter's per-layer, per-site A/B (numpy, scaling folded in).

    weights[site] = (A [L, in, R_site], B [L, R_site, out]) or None."""

    def __init__(self, name: str, weights: Dict[str, Any]):
        self.name = name
        self.weights = weights


def make_adapter(
    cfg: ModelConfig,
    name: str,
    rank: int = 8,
    alpha: float = 16.0,
    targets: tuple = ("q", "v"),
    rng: Optional[np.random.Generator] = None,
    matrices: Optional[Dict[str, tuple]] = None,
) -> Adapter:
    """Build an adapter from per-matrix (A [in, r], B [r, out]) numpy pairs
    (`matrices` keyed q/k/v/o/gate/up/down; missing = not adapted), or
    random-init one for `targets` when matrices is None (B ~ N(0, .02) so
    the delta is nonzero — unlike PEFT's zero-B training init — which is
    what tests want). Scaling alpha/r is folded into B here."""
    H, KV, Dh, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim, cfg.d_model
    L = cfg.n_layers
    scale = alpha / rank
    if matrices is None:
        rng = rng or np.random.default_rng(0)
        matrices = {}
        dims = {"q": (D, H * Dh), "k": (D, KV * Dh), "v": (D, KV * Dh),
                "o": (H * Dh, D), "gate": (D, cfg.d_ff),
                "up": (D, cfg.d_ff), "down": (cfg.d_ff, D)}
        for t in targets:
            di, do = dims[t]
            matrices[t] = (
                rng.normal(0, 0.02, (L, di, rank)).astype(np.float32),
                rng.normal(0, 0.02, (L, rank, do)).astype(np.float32),
            )

    def per_layer(t, i):
        m = matrices.get(t)
        if m is None:
            return None
        return m[0][i], m[1][i] * scale

    dims = _site_dims(cfg)
    weights: Dict[str, Any] = {}
    qs = [(0, H * Dh), (H * Dh, (H + KV) * Dh),
          ((H + KV) * Dh, (H + 2 * KV) * Dh)]
    gs = [(0, cfg.d_ff), (cfg.d_ff, 2 * cfg.d_ff)]
    for site, parts_keys, slices in (
        ("qkv", ("q", "k", "v"), qs),
        ("gate_up", ("gate", "up"), gs),
    ):
        if not any(k in matrices for k in parts_keys):
            weights[site] = None
            continue
        As, Bs = [], []
        for i in range(L):
            A, B = _fuse_block_diag(
                [per_layer(k, i) for k in parts_keys],
                dims[site][0], slices, rank,
            )
            As.append(A)
            Bs.append(B)
        weights[site] = (np.stack(As), np.stack(Bs))
    for site in ("o", "down"):
        if site in matrices:
            A = matrices[site][0]
            B = matrices[site][1] * scale
            weights[site] = (A, B)
        else:
            weights[site] = None
    return Adapter(name, weights)


def build_pack(cfg: ModelConfig, adapters: List[Adapter], dtype=jnp.bfloat16):
    """Stack adapters into device arrays: per site, A [L, n, in, R_max] and
    B [L, n, R_max, out] — LAYER-major so the forward's lax.scan consumes
    the leading axis directly (no per-step transpose). Rank zero-padded;
    absent sites all-zero so the delta vanishes. Returns (pack dict for
    params['lora'], name->id map)."""
    dims = _site_dims(cfg)
    L = cfg.n_layers
    n = len(adapters)
    pack: Dict[str, Any] = {}
    for site in SITES:
        rs = [
            a.weights[site][0].shape[-1]
            for a in adapters
            if a.weights.get(site) is not None
        ]
        if not rs:
            continue
        R = max(rs)
        di, do = dims[site]
        A = np.zeros((L, n, di, R), np.float32)
        B = np.zeros((L, n, R, do), np.float32)
        for j, a in enumerate(adapters):
            w = a.weights.get(site)
            if w is None:
                continue
            r = w[0].shape[-1]
            A[:, j, :, :r] = w[0]
            B[:, j, :r, :] = w[1]
        # Keys live inside params["layers"] so the pack rides the
        # forward's existing lax.scan xs (leading axis = L).
        pack[f"lora_A_{site}"] = jnp.asarray(A, dtype)
        pack[f"lora_B_{site}"] = jnp.asarray(B, dtype)
    names = {a.name: j for j, a in enumerate(adapters)}
    return pack, names


def lora_delta(A: jax.Array, B_: jax.Array, lora_ids: jax.Array,
               x: jax.Array) -> jax.Array:
    """Per-slot adapter delta for one layer's matmul. A [n, in, R] and
    B_ [n, R, out] are the LAYER slices (the scan consumed the L axis).
    lora_ids [B]; -1 = base (zero delta). x [B, S, in] -> [B, S, out]."""
    idx = jnp.clip(lora_ids, 0, A.shape[0] - 1)
    Ag = A[idx]  # [B, in, R]
    Bg = B_[idx]  # [B, R, out]
    h = jnp.einsum("bsd,bdr->bsr", x.astype(Ag.dtype), Ag)
    out = jnp.einsum("bsr,bro->bso", h, Bg)
    return jnp.where((lora_ids >= 0)[:, None, None], out, 0.0).astype(x.dtype)


def load_peft_adapter(path: str, cfg: ModelConfig, name: Optional[str] = None) -> Adapter:
    """Load an HF PEFT LoRA directory (adapter_config.json +
    adapter_model.safetensors). Keys look like
    base_model.model.model.layers.{i}.self_attn.q_proj.lora_A.weight
    with lora_A [r, in] / lora_B [out, r] (torch row-major) — transposed
    here. Unadapted layers get zero blocks (rank preserved)."""
    from safetensors import safe_open

    with open(os.path.join(path, "adapter_config.json")) as f:
        acfg = json.load(f)
    rank = int(acfg.get("r", 8))
    alpha = float(acfg.get("lora_alpha", rank))
    fn = os.path.join(path, "adapter_model.safetensors")
    tensors = {}
    with safe_open(fn, framework="np") as f:
        for k in f.keys():
            tensors[k] = f.get_tensor(k).astype(np.float32)

    proj_of = {"q_proj": "q", "k_proj": "k", "v_proj": "v", "o_proj": "o",
               "gate_proj": "gate", "up_proj": "up", "down_proj": "down"}
    H, KV, Dh, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim, cfg.d_model
    dims = {"q": (D, H * Dh), "k": (D, KV * Dh), "v": (D, KV * Dh),
            "o": (H * Dh, D), "gate": (D, cfg.d_ff), "up": (D, cfg.d_ff),
            "down": (cfg.d_ff, D)}
    L = cfg.n_layers
    matrices: Dict[str, tuple] = {}
    for key, t in tensors.items():
        if ".lora_A." not in key:
            continue
        parts = key.split(".")
        try:
            i = int(parts[parts.index("layers") + 1])
        except ValueError:
            continue
        proj = next((p for p in parts if p in proj_of), None)
        if proj is None:
            continue
        m = proj_of[proj]
        if m not in matrices:
            di, do = dims[m]
            matrices[m] = (
                np.zeros((L, di, rank), np.float32),
                np.zeros((L, rank, do), np.float32),
            )
        b_key = key.replace(".lora_A.", ".lora_B.")
        matrices[m][0][i] = t.T  # [in, r]
        matrices[m][1][i] = tensors[b_key].T  # [r, out]
    return make_adapter(
        cfg, name or os.path.basename(os.path.normpath(path)),
        rank=rank, alpha=alpha, matrices=matrices,
    )
