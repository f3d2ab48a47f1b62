"""Flash decode attention over the length-masked KV cache — Pallas kernel.

Streams KV tiles HBM->VMEM with online-softmax accumulation (flash style), so
attention memory traffic is O(T·D) HBM reads with no [S, T] score
materialization in HBM. Replaces (at pallas priority) the XLA reference in
ops/attention.py for long contexts; contract is identical:

    attend(q[B,S,H,D], k[B,T,KVH,D], v[B,T,KVH,D], positions[B,S]) -> [B,S,H,D]

Grid: (B, KV heads, T tiles); the (m, l, acc) online-softmax state lives in
VMEM scratch across the T sweep. GQA: the `group` query heads sharing a KV
head are flattened into the row axis of one MXU matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_inference_lab_tpu.ops.registry import PRIORITY_PALLAS, registry

NEG_INF = -1e30


def _kernel(pos_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
    t = pl.program_id(2)
    BT = k_ref.shape[1]

    @pl.when(t == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    S, group, D = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    Sg = S * group
    q = q_ref[0].reshape(Sg, D)  # [S*group, D]
    k = k_ref[0]  # [BT, D] (kv-head dim squeezed by the BlockSpec)
    v = v_ref[0]  # [BT, D]

    scale = 1.0 / (D**0.5)
    scores = (
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )  # [Sg, BT]

    kv_pos = t * BT + jax.lax.broadcasted_iota(jnp.int32, (S, group, BT), 2)
    allowed = kv_pos <= pos_ref[0][:, None, None]  # [S, group, BT]
    scores = jnp.where(allowed.reshape(Sg, BT), scores, NEG_INF)

    m_prev = m_ref[:]  # [Sg, 1]
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
    p = jnp.exp(scores - m_new)  # [Sg, BT]
    alpha = jnp.exp(m_prev - m_new)  # [Sg, 1]
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new

    @pl.when(t == pl.num_programs(2) - 1)
    def _():
        out = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        o_ref[0] = out.reshape(S, group, D).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "block_t"))
def flash_decode_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    positions: jax.Array,
    interpret: bool = False,
    block_t: int = 256,
) -> jax.Array:
    B, S, H, D = q.shape
    T, KVH = k_cache.shape[1], k_cache.shape[2]
    group = H // KVH
    BT = min(block_t, T)
    assert T % BT == 0, f"T={T} not divisible by BT={BT}"

    qg = q.reshape(B, S, KVH, group, D)
    grid = (B, KVH, T // BT)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, S), lambda b, h, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, S, None, group, D), lambda b, h, t: (b, 0, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, BT, None, D), lambda b, h, t: (b, t, h, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, BT, None, D), lambda b, h, t: (b, t, h, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, S, None, group, D), lambda b, h, t: (b, 0, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, KVH, group, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((S * group, 1), jnp.float32),
            pltpu.VMEM((S * group, 1), jnp.float32),
            pltpu.VMEM((S * group, D), jnp.float32),
        ],
        interpret=interpret,
    )(positions.astype(jnp.int32), qg, k_cache, v_cache)
    return out.reshape(B, S, H, D)


def _kernel_wrapper(q, k_cache, v_cache, positions):
    from llm_inference_lab_tpu.ops.pallas import INTERPRET

    T = k_cache.shape[1]
    D = q.shape[-1]
    if T % 128 != 0 or D % 128 != 0:
        from llm_inference_lab_tpu.ops.attention import attend_xla

        return attend_xla(q, k_cache, v_cache, positions)
    bt = 256 if T % 256 == 0 else 128
    return flash_decode_attention(
        q, k_cache, v_cache, positions, interpret=INTERPRET, block_t=bt
    )


registry.register(
    "decode_attention",
    _kernel_wrapper,
    backend="pallas",
    priority=PRIORITY_PALLAS,
    platforms=("tpu",) if jax.default_backend() == "tpu" else ("tpu", "cpu"),
)
