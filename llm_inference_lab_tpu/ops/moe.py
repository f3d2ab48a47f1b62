"""Mixture-of-experts gated-MLP layer (Mixtral block).

No reference analogue (GogoRit/llm-inference-lab has no MoE models) — this
is the framework-completeness piece behind the "mixtral" family. Two exact
(no token dropping) implementations share one contract:

    moe_mlp(x, w_router, w_gate_up, w_down, top_k) -> y
      x:          [T, D]  flattened tokens (B*S)
      w_router:   [D, E]
      w_gate_up:  [E, D, 2F]  gate and up fused per expert
      w_down:     [E, F, D]
      y:          [T, D]

Router semantics match HF Mixtral (modeling_mixtral.py): softmax over the
top-k router LOGITS per token (not over all E), weights NOT renormalized
beyond that softmax.

1. `moe_ragged` (default single-device path): sort the T*K (token, expert)
   pairs by expert and run `lax.ragged_dot` against the expert-stacked
   weights — grouped matmul, compute proportional to T*K*D*F (the MoE
   speed-of-light), no capacity bound, no drops. Mosaic lowers ragged_dot
   on TPU; argsort/segment bookkeeping is O(T*K).

2. `moe_dense` (expert-parallel path): GShard-style one-hot dispatch
   einsums with capacity C = T (exact worst case: every token may route to
   the same expert). [E, C, D] activations shard on the mesh "expert" axis
   under GSPMD, so per-device compute is T*D*F per selected expert slot —
   EP scaling without hand-written all_to_alls. Used when the engine mesh
   has an expert axis (parallel/sharding.py routes expert-stacked weights
   there), and as the reference implementation in equivalence tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from llm_inference_lab_tpu.ops.registry import PRIORITY_XLA, registry


def _route(x: jax.Array, w_router: jax.Array, top_k: int):
    """Top-k routing. Returns (weights [T, K] f32, experts [T, K] i32)."""
    logits = jnp.dot(
        x, w_router.astype(x.dtype), preferred_element_type=jnp.float32
    )  # [T, E]
    vals, idx = jax.lax.top_k(logits, top_k)
    weights = jax.nn.softmax(vals, axis=-1)  # softmax over the top-k logits
    return weights, idx


def _expert_mlp(h: jax.Array, act: str) -> jax.Array:
    F = h.shape[-1] // 2
    if act == "silu":
        return jax.nn.silu(h[..., :F]) * h[..., F:]
    return jax.nn.gelu(h[..., :F]) * h[..., F:]


def moe_ragged(
    x: jax.Array,
    w_router: jax.Array,
    w_gate_up: jax.Array,
    w_down: jax.Array,
    top_k: int = 2,
    act: str = "silu",
) -> jax.Array:
    T, D = x.shape
    E = w_gate_up.shape[0]
    weights, experts = _route(x, w_router, top_k)  # [T, K]

    flat_e = experts.reshape(-1)  # [T*K]
    order = jnp.argsort(flat_e)  # stable; groups rows by expert
    inv = jnp.argsort(order)
    xs = x[order // top_k]  # token row for each sorted (token, expert) pair
    group_sizes = jnp.bincount(flat_e, length=E).astype(jnp.int32)

    h = jax.lax.ragged_dot(xs, w_gate_up.astype(x.dtype), group_sizes)
    h = _expert_mlp(h, act)
    y_rows = jax.lax.ragged_dot(h, w_down.astype(x.dtype), group_sizes)

    y_rows = y_rows[inv] * weights.reshape(-1, 1).astype(y_rows.dtype)
    return y_rows.reshape(T, top_k, D).sum(axis=1).astype(x.dtype)


def moe_dense(
    x: jax.Array,
    w_router: jax.Array,
    w_gate_up: jax.Array,
    w_down: jax.Array,
    top_k: int = 2,
    act: str = "silu",
) -> jax.Array:
    T, D = x.shape
    E = w_gate_up.shape[0]
    weights, experts = _route(x, w_router, top_k)  # [T, K]

    # Combine matrix [T, E]: summed routing weight of each expert per token
    # (an expert never repeats within a token's top-k, so sum == select).
    onehot = jax.nn.one_hot(experts, E, dtype=jnp.float32)  # [T, K, E]
    combine = jnp.einsum("tk,tke->te", weights, onehot)

    # Dispatch all tokens to every expert lane, weight on the way back.
    # [E, T, D] activations: exact (capacity = T), shardable on E.
    xe = jnp.einsum("td,te->etd", x, (combine > 0).astype(x.dtype))
    h = jnp.einsum(
        "etd,edf->etf", xe, w_gate_up.astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    h = _expert_mlp(h, act)
    ye = jnp.einsum(
        "etf,efd->etd", h, w_down.astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    return jnp.einsum("etd,te->td", ye, combine).astype(x.dtype)


registry.register("moe_mlp", moe_ragged, backend="xla", priority=PRIORITY_XLA + 5)
registry.register("moe_mlp", moe_dense, backend="xla", priority=PRIORITY_XLA)
