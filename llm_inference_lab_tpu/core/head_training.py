"""Medusa head training: distill multi-step prediction from the target.

The reference's Medusa-lite heads are randomly initialized per call and
never trained (src/specdec/core/pipeline.py:696-702 — "effectively untrained
placeholders"); ours are persistent params (engine `_draft_params`), which
makes them trainable. This module distills them: head d, fed the hidden
state that predicted token t+1, learns to predict token t+1+d' (d'=d+1) of
the TARGET's own distribution — exactly the quantity the spec step verifies,
so every point of head accuracy is accepted speculation.

Self-distillation needs no external data: trajectories come from the target
model itself (its greedy continuations of seed prompts), or from any token
corpus you pass in.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def collect_hidden_targets(
    model,
    token_seqs: jnp.ndarray,  # [N, T] int32 training sequences
    num_heads: int,
    max_cache: int = 512,
):
    """One target forward per batch: hidden[t] + the tokens at t+2..t+1+H.

    Returns (hidden [N, T', D], targets [N, T', H], mask [N, T']) where
    T' = T - 1 - num_heads (positions with all lookaheads in range).
    """
    N, T = token_seqs.shape
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (N, T))
    cache = model.init_cache(N, max(T, max_cache))
    _, _, hidden = model.apply_fn(
        model.params, token_seqs, positions, cache,
        jnp.zeros((N,), jnp.int32), return_hidden=True,
    )
    Tp = T - 1 - num_heads
    hid = hidden[:, :Tp]
    # head d (0-indexed) predicts token at position t + 2 + d
    tgt = jnp.stack(
        [token_seqs[:, 2 + d : 2 + d + Tp] for d in range(num_heads)], axis=-1
    )
    return hid, tgt


def train_medusa_heads(
    target_model,
    token_seqs,  # [N, T] int32 (e.g. the target's own generations)
    num_heads: int = 2,
    steps: int = 200,
    lr: float = 1e-2,
    init_proj: Optional[jnp.ndarray] = None,
    seed: int = 0,
) -> Tuple[jnp.ndarray, List[float]]:
    """Returns (medusa_proj [num_heads, D, D], loss history).

    The head logits share the target's lm_head (same parameterization the
    spec step uses: head_fn(params, h @ proj[d])), so only the D x D
    projections train — small, fast, and checkpointable via
    models/checkpoint.save_params({"medusa_proj": proj}, ...).
    """
    import optax

    token_seqs = jnp.asarray(token_seqs, jnp.int32)
    D = target_model.config.d_model
    head_fn = target_model.head_fn
    params = target_model.params
    dtype = target_model.config.dtype

    hid, tgt = collect_hidden_targets(target_model, token_seqs, num_heads)
    hid = hid.astype(jnp.float32)

    proj = (
        jnp.asarray(init_proj, jnp.float32)
        if init_proj is not None
        else jnp.broadcast_to(jnp.eye(D, dtype=jnp.float32), (num_heads, D, D)).copy()
    )
    opt = optax.adam(lr)
    opt_state = opt.init(proj)

    def loss_fn(proj_):
        total = 0.0
        for d in range(num_heads):
            h = jnp.dot(hid, proj_[d].astype(jnp.float32))
            logits = head_fn(params, h.astype(dtype)).astype(jnp.float32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, tgt[..., d : d + 1], axis=-1)
            total = total + jnp.mean(nll)
        return total / num_heads

    @jax.jit
    def step(proj_, opt_state_):
        loss, grads = jax.value_and_grad(loss_fn)(proj_)
        updates, opt_state_ = opt.update(grads, opt_state_)
        return optax.apply_updates(proj_, updates), opt_state_, loss

    history: List[float] = []
    for i in range(steps):
        proj, opt_state, loss = step(proj, opt_state)
        if i % max(1, steps // 10) == 0 or i == steps - 1:
            history.append(float(loss))
    return proj, history


def self_distill_medusa(
    engine,
    seed_prompts: List[str],
    num_heads: Optional[int] = None,
    tokens_per_prompt: int = 64,
    steps: int = 200,
    lr: float = 1e-2,
) -> Tuple[jnp.ndarray, List[float]]:
    """End-to-end: generate trajectories with the engine's target (baseline
    greedy), train the heads on them, install them into the engine."""
    num_heads = num_heads or engine._draft_params["medusa_proj"].shape[0]
    seqs = []
    for p in seed_prompts:
        r = engine.generate(p, max_new_tokens=tokens_per_prompt)
        ids = engine.tokenizer.encode(p) + r["generated_ids"]
        seqs.append(ids)
    T = min(len(s) for s in seqs)
    batch = np.stack([s[:T] for s in seqs]).astype(np.int32)
    proj, hist = train_medusa_heads(
        engine.target, batch, num_heads=num_heads, steps=steps, lr=lr,
        init_proj=engine._draft_params["medusa_proj"].astype(jnp.float32),
    )
    engine._draft_params = {
        "medusa_proj": proj.astype(engine.target.config.dtype)
    }
    return proj, hist
