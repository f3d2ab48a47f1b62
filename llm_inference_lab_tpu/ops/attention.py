"""Decode attention over a length-masked static KV cache.

The XLA reference implementation is a fused-friendly einsum chain (XLA fuses
the mask/softmax into the matmuls on TPU); the Pallas flash-decode kernel
(ops/pallas/flash_decode.py) takes over for long contexts where streaming the
KV from HBM in tiles wins. Contract shared by both:

    attend(q, k_cache, v_cache, positions, k_scale, v_scale) -> out
      q:            [B, S, n_heads, d]   (S = 1 draft step or K+1 verify chunk)
      k/v_cache:    [B, n_kv_heads, T, d] (T = max_seq, slot index == position)
      positions:    [B, S] absolute positions of the queries
      k/v_scale:    [B, n_kv_heads, T] per-row scales (int8 caches only)
      out:          [B, S, n_heads, d]

Masking rule: query at absolute position p attends to cache slots [0, p].
Because the engine writes new KV rows at their absolute positions *before*
attention, slots <= p are always valid (committed prefix or freshly written)
and slots > p are dead — no separate "cache length" mask is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from llm_inference_lab_tpu.ops.registry import PRIORITY_XLA, registry


def attend_xla(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    positions: jax.Array,
    k_scale: jax.Array = None,
    v_scale: jax.Array = None,
    tree_mask: jax.Array = None,  # [S, S] intra-chunk ancestry (tree spec)
    chunk_start: jax.Array = None,  # [B] chunk base slot (required w/ tree_mask)
    window: int = None,  # sliding window (Mistral): attend to (p-window, p]
    window_on: jax.Array = None,  # [] bool: per-layer window gate (gemma2
    #   alternating local/global layers; rides the layer scan's xs)
    ring_len: int = None,  # rolling-buffer cache (slot = pos % ring_len):
    #   T == ring_len and the mask works in (p - slot) mod R arithmetic
    scale: float = None,  # score scale; default head_dim**-0.5 (gemma2
    #   uses query_pre_attn_scalar**-0.5 instead)
    softcap: float = None,  # attention logit softcap: cap * tanh(s / cap)
) -> jax.Array:
    if k_cache.dtype == jnp.int8:
        # Reference path for the quantized cache: dequantize then attend.
        # (The Pallas flash kernel dequantizes per tile in VMEM instead.)
        k_cache = (k_cache.astype(jnp.float32) * k_scale[..., None]).astype(q.dtype)
        v_cache = (v_cache.astype(jnp.float32) * v_scale[..., None]).astype(q.dtype)
    B, S, H, D = q.shape
    n_kv, T = k_cache.shape[1], k_cache.shape[2]
    group = H // n_kv

    qg = q.reshape(B, S, n_kv, group, D)
    if scale is None:
        scale = 1.0 / (D**0.5)
    # scores: [B, n_kv, group, S, T]
    scores = jnp.einsum(
        "bsngd,bntd->bngst", qg, k_cache, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    if softcap is not None:
        scores = jnp.tanh(scores / softcap) * softcap
    kv_pos = jnp.arange(T, dtype=positions.dtype)
    if ring_len is not None:
        # Rolling buffer: slot s holds the LATEST position <= p congruent
        # to s mod R, i.e. q_s = p - ((p - s) mod R). Valid iff q_s is
        # inside the window ((p - s) mod R < window) and non-negative
        # ((p - s) mod R <= p — also kills empty slots at p = -1). The
        # ring is sized so rows inside any live window are never
        # clobbered, making this exact (see ModelConfig.kv_ring_len).
        assert window is not None and tree_mask is None
        rel = jnp.mod(
            positions[:, None, None, :, None]
            - kv_pos[None, None, None, None, :],
            ring_len,
        )
        mask = (rel < window) & (
            rel <= positions[:, None, None, :, None]
        )
    elif tree_mask is None:
        # Chain decode: slot index == position; causal by position compare.
        mask = kv_pos[None, None, None, None, :] <= positions[:, None, None, :, None]
        if window is not None:
            wmask = (
                kv_pos[None, None, None, None, :]
                > positions[:, None, None, :, None] - window
            )
            if window_on is not None:  # gemma2: odd layers are global
                wmask = wmask | ~window_on
            mask &= wmask
    else:
        # Tree speculation: slots [chunk_start, chunk_start+S) hold tree
        # nodes whose intra-chunk visibility is the ancestry mask; slots
        # before the chunk are committed prefix (always visible).
        S_q = q.shape[1]
        rel = kv_pos[None, :] - chunk_start[:, None]  # [B, T]
        prefix_ok = rel < 0
        in_chunk = (rel >= 0) & (rel < S_q)
        anc = tree_mask[:, jnp.clip(rel, 0, S_q - 1)]  # [S_q, B, T]
        anc = jnp.moveaxis(anc, 0, 1)  # [B, S_q, T]
        mask = (prefix_ok[:, None, :] | (in_chunk[:, None, :] & anc))[
            :, None, None, :, :
        ]  # [B, 1, 1, S_q, T]
    scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    # All-masked rows (softmax over only -inf = 0/0 = NaN) must yield 0, not
    # NaN: they arise for EMPTY batch slots (position -1 under continuous
    # batching), and a NaN written into a shared dummy page would poison
    # OTHER slots' value sums (0-weight x NaN = NaN in probs @ v).
    probs = jnp.where(mask.any(-1, keepdims=True), probs, 0.0)
    out = jnp.einsum(
        "bngst,bntd->bsngd",
        probs.astype(v_cache.dtype),
        v_cache,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, S, H, D).astype(q.dtype)


registry.register(
    "decode_attention", attend_xla, backend="xla", priority=PRIORITY_XLA
)
