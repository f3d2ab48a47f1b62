"""Runtime KV-cache alignment verification (debug mode).

Reference parity: src/specdec/core/kv_cache_verification.py —
`compute_kv_checksum` (:16), `verify_kv_cache_alignment` (:63-130, layerwise
allclose between a target-only decode's KV and the speculative KV) and
`debug_verify_kv_cache_step` (:133-189, runs a parallel target-only decode),
gated by `SPECDEC_DEBUG_KV_VERIFY` (pipeline.py:2859-2866).

TPU re-design: the reference must cross-check *every step* because eager
mutation + realignment can corrupt the cache anywhere. Here the cache
invariant is structural (slot == absolute position, rows [0, L-1) committed),
so one check per generation suffices: re-prefill the committed tokens from
scratch with the same model and compare the caches row-for-row under the
length mask. Gated by `SPECDX_DEBUG_KV_VERIFY`.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from llm_inference_lab_tpu.core.state import DecodeState
from llm_inference_lab_tpu.models.base import KVCache


def _dequant(vals: jax.Array, scale: jax.Array) -> jax.Array:
    """[L, B, H, T, D] int8/fp + [L, B, H, T] scales -> float32 values."""
    v = vals.astype(jnp.float32)
    if vals.dtype == jnp.int8:
        v = v * scale[..., None]
    return v


def compute_kv_checksum(cache: KVCache, lengths: jax.Array) -> float:
    """Scalar checksum over the committed rows [0, L-1) of every sequence
    (reference compute_kv_checksum, kv_cache_verification.py:16)."""
    T = cache.max_seq_len
    mask = (jnp.arange(T)[None, :] < jnp.maximum(lengths - 1, 0)[:, None]).astype(
        jnp.float32
    )  # [B, T]
    m = mask[None, :, None, :, None]
    k = _dequant(cache.k, cache.k_scale)
    v = _dequant(cache.v, cache.v_scale)
    return float(jnp.sum(jnp.abs(k) * m) + jnp.sum(jnp.abs(v) * m))


def kv_alignment_report(
    model,
    params,
    state: DecodeState,
    atol: float = 5e-2,
    rtol: float = 5e-2,
) -> Dict[str, Any]:
    """Compare the live speculative cache against a from-scratch prefill of
    the committed tokens (the reference's target-only parallel decode,
    kv_cache_verification.py:133-189, collapsed into one forward).

    Committed rows must agree up to chunked-vs-single-forward rounding
    (bf16 matmul tiling); int8 caches are compared dequantized.
    """
    tokens = state.tokens
    lengths = state.lengths
    B, T = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    live = state.target_cache
    from llm_inference_lab_tpu.models.paged import PagedKVCache, gather_pages, gather_scale_pages

    if isinstance(live, PagedKVCache):
        # Gather the paged pool into the contiguous view for comparison.
        gp = jax.vmap(gather_pages, in_axes=(0, None))
        gs = jax.vmap(gather_scale_pages, in_axes=(0, None))
        live = KVCache(
            k=gp(live.k, live.table)[:, :, :, :T, :],
            v=gp(live.v, live.table)[:, :, :, :T, :],
            k_scale=gs(live.k_scale, live.table)[..., :T],
            v_scale=gs(live.v_scale, live.table)[..., :T],
        )
    fresh = model.init_cache(B, T, quantized=live.quantized)
    _, fresh = model.apply_fn(
        params, tokens, positions, fresh, jnp.zeros((B,), jnp.int32),
        # The recompute must use the SAME per-slot adapters as the live
        # decode or LoRA runs would report false misalignment.
        lora_ids=state.lora_ids,
    )

    # Mask: committed cache rows are [0, L-1) per sequence.
    mask = (
        jnp.arange(T)[None, :] < jnp.maximum(lengths - 1, 0)[:, None]
    )[None, :, None, :, None]

    diffs = {}
    aligned = True
    for name, live_c, fresh_c, live_s, fresh_s in (
        ("k", live.k, fresh.k, live.k_scale, fresh.k_scale),
        ("v", live.v, fresh.v, live.v_scale, fresh.v_scale),
    ):
        a = _dequant(live_c, live_s)
        b = _dequant(fresh_c, fresh_s)
        denom = jnp.maximum(jnp.abs(b), 1.0)
        d = jnp.where(mask, jnp.abs(a - b) / denom, 0.0)
        mx = float(jnp.max(d))
        diffs[f"max_rel_diff_{name}"] = mx
        aligned = aligned and mx <= max(atol, rtol)
    return {
        "aligned": bool(aligned),
        **diffs,
        "checksum_live": compute_kv_checksum(live, lengths),
        "checksum_fresh": compute_kv_checksum(fresh, lengths),
        "committed_rows": int(np.asarray(jnp.sum(jnp.maximum(lengths - 1, 0)))),
    }
