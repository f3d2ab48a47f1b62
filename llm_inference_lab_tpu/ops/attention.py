"""Decode attention over a length-masked static KV cache.

The XLA reference implementation is a fused-friendly einsum chain (XLA fuses
the mask/softmax into the matmuls on TPU); the Pallas flash-decode kernel
(ops/pallas/flash_decode.py) takes over for long contexts where streaming the
KV from HBM in tiles wins. Contract shared by both:

    attend(q, k_cache, v_cache, positions) -> out
      q:            [B, S, n_heads, d]   (S = 1 draft step or K+1 verify chunk)
      k/v_cache:    [B, T, n_kv_heads, d] (T = max_seq, slot index == position)
      positions:    [B, S] absolute positions of the queries
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
) -> jax.Array:
    B, S, H, D = q.shape
    T = k_cache.shape[1]
    n_kv = k_cache.shape[2]
    group = H // n_kv

    qg = q.reshape(B, S, n_kv, group, D)
    scale = 1.0 / (D**0.5)
    # scores: [B, n_kv, group, S, T]
    scores = jnp.einsum(
        "bsngd,btnd->bngst", qg, k_cache, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    kv_pos = jnp.arange(T, dtype=positions.dtype)
    mask = kv_pos[None, None, None, None, :] <= positions[:, None, None, :, None]
    scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bngst,btnd->bsngd",
        probs.astype(v_cache.dtype),
        v_cache,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, S, H, D).astype(q.dtype)


registry.register(
    "decode_attention", attend_xla, backend="xla", priority=PRIORITY_XLA
)
