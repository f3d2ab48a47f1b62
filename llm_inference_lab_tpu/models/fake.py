"""Deterministic fake model — the central test fixture.

Reference parity: src/specdec/models/fake_lm.py:18 (`FakeLM`: next token is a
deterministic hash of the input, letting the whole pipeline run on CPU in
milliseconds) and :150 (`FakeLMWithAcceptance`: simulates a configurable
draft/target acceptance rate).

JAX twist: the fake must be a *pure, shape-static* function usable inside the
same jitted spec-step as real models. Next-token rule:

    next = (mult * token + 31 * position + shift) % vocab

Two FakeModels with identical (mult, shift) agree everywhere (acceptance 1.0).
`miss_permille` injects pseudo-random disagreements at a controllable rate —
a hash of (token, position) decides whether this draft prediction is off by
one — giving the acceptance-rate simulation of FakeLMWithAcceptance without
any host-side randomness.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from llm_inference_lab_tpu.models.base import KVCache, Model, ModelConfig


def fake_forward(
    cfg: ModelConfig,
    params: dict,
    tokens: jax.Array,  # [B, S]
    positions: jax.Array,  # [B, S]
    cache: Optional[KVCache],
    cache_lens: jax.Array,  # [B]
    return_hidden: bool = False,
    tree_mask: Optional[jax.Array] = None,  # accepted for protocol parity
    lora_ids: Optional[jax.Array] = None,  # accepted for protocol parity
) -> Tuple[jax.Array, Optional[KVCache]]:
    V = cfg.vocab_size
    mult = params["mult"]
    shift = params["shift"]
    miss = params["miss_permille"]

    nxt = (mult * tokens + 31 * positions + shift) % V
    # Pseudo-random disagreement: Knuth multiplicative hash of (token, pos).
    h = (tokens.astype(jnp.uint32) * jnp.uint32(2654435761)
         + positions.astype(jnp.uint32) * jnp.uint32(40503)) % jnp.uint32(1000)
    nxt = (nxt + (h.astype(jnp.int32) < miss).astype(jnp.int32)) % V

    # Peaked logits at `nxt` with a smooth, position-dependent tail so top-k /
    # top-p / confidence policies see a realistic distribution.
    vocab_ids = jnp.arange(V, dtype=jnp.int32)
    tail = jnp.cos(
        (vocab_ids[None, None, :] + positions[..., None]).astype(jnp.float32) * 0.1
    )
    logits = tail + 8.0 * jax.nn.one_hot(nxt, V, dtype=jnp.float32)

    if cache is not None:
        # Exercise the real cache-write path: store the token value broadcast
        # over the (tiny) head dims at its absolute position (heads-major
        # cache layout [B, n_kv, T, d]).
        val = tokens.astype(cache.k.dtype)[:, None, :, None]
        val = jnp.broadcast_to(
            val, (tokens.shape[0], cfg.n_kv_heads, tokens.shape[1], cfg.head_dim)
        )

        def upd(cache_b, new_b, s):
            return jax.lax.dynamic_update_slice(cache_b, new_b, (0, s, 0))

        k = jax.vmap(upd)(cache.k[0], val, cache_lens)[None]
        cache = KVCache(k=k, v=k, k_scale=cache.k_scale, v_scale=cache.v_scale)
    if return_hidden:
        # Fake hidden state encodes (token, position) in channels 0/1 so the
        # fake head can reproduce the model's exact next-token rule —
        # Medusa/EAGLE/tree paths then exercise real acceptance without a
        # trained model.
        hidden = jnp.zeros((*tokens.shape, cfg.d_model), jnp.float32)
        hidden = hidden.at[..., 0].set(tokens.astype(jnp.float32))
        hidden = hidden.at[..., 1].set(positions.astype(jnp.float32))
        return logits, cache, hidden
    return logits, cache


FAKE_CONFIG = ModelConfig(
    name="fake",
    arch="fake",
    vocab_size=256,
    n_layers=1,
    n_heads=1,
    n_kv_heads=1,
    d_model=8,
    d_ff=8,
    max_position_embeddings=65536,
)


def make_fake_model(
    vocab_size: int = 256,
    mult: int = 7,
    shift: int = 3,
    miss_permille: int = 0,
    name: str = "fake",
) -> Model:
    cfg = replace(FAKE_CONFIG, vocab_size=vocab_size, name=name)
    params = {
        "mult": jnp.int32(mult),
        "shift": jnp.int32(shift),
        "miss_permille": jnp.int32(miss_permille),
    }

    def fake_head(p, hidden):
        """Hidden channels 0/1 carry (token, position); emit peaked logits
        at the model's own next-token rule, so a head fed the hidden of the
        row that predicted token x at position q proposes exactly the
        model's prediction for the token AFTER x."""
        t = jnp.round(hidden[..., 0]).astype(jnp.int32)
        pos = jnp.round(hidden[..., 1]).astype(jnp.int32)
        V = cfg.vocab_size
        # One step of the model recurrence gives the token this row
        # predicts; a second step predicts the token after it.
        x1 = (p["mult"] * t + 31 * pos + p["shift"]) % V
        x2 = (p["mult"] * x1 + 31 * (pos + 1) + p["shift"]) % V
        return jax.nn.one_hot(x2, V, dtype=jnp.float32) * 8.0

    return Model(
        config=cfg,
        params=params,
        apply_fn=partial(fake_forward, cfg),
        head_fn=fake_head,
    )
