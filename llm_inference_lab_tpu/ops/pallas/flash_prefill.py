"""Flash prefill attention — Pallas kernel for long query blocks.

The decode kernel (flash_decode.py) keeps the whole [S*group, BT] score tile
in VMEM, which caps S at verify-chunk size; this kernel adds a QUERY-block
grid axis so prefill-length S streams through the same online-softmax tile
body. Grid: (B, KV heads, S blocks, T tiles) with the T sweep innermost so
the (m, l, acc) scratch carries across tiles of one query block.

Causality gives a free 2x: a KV tile whose first position exceeds the query
block's max position is fully masked, so its matmuls are skipped with
`pl.when` (the DMA still runs — Mosaic prefetches blocks by grid index — but
on TPU the MXU, not HBM, is the prefill bottleneck at these shapes).

Contract matches ops/attention.py attend_xla (chain decode case): query at
absolute position p attends to cache slots [0, p]. Replaces the O(S·T)
score materialization of the XLA path for long prompts; the reference has no
long-context machinery at all (SURVEY §5.7 — HF sdpa, hf_wrappers.py:98).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_inference_lab_tpu.ops.pallas.flash_decode import (
    _accum_tile,
    _finalize,
    _init_state,
)


def _body(pos_ref, q_ref, k, v, kv_scale, o_ref, m_ref, l_ref, acc_ref,
          scale=None, softcap=None, window=None):
    t = pl.program_id(3)
    BT = k.shape[0]

    @pl.when(t == 0)
    def _():
        _init_state(m_ref, l_ref, acc_ref)

    # Causal tile skip: this query block's max position bounds the last
    # live KV tile. With a sliding window, tiles entirely below every
    # query's window start are dead too (min_pos uses >= 0 so dead rows
    # at position -1 keep the skip conservative, not wrong).
    max_pos = jnp.max(pos_ref[0])
    live = t * BT <= max_pos
    if window is not None:
        min_pos = jnp.min(jnp.maximum(pos_ref[0], 0))
        live &= (t + 1) * BT > min_pos - window + 1

    @pl.when(live)
    def _():
        _accum_tile(pos_ref, q_ref, k, v, kv_scale, m_ref, l_ref, acc_ref,
                    t * BT, scale=scale, softcap=softcap, window=window)

    @pl.when(t == pl.num_programs(3) - 1)
    def _():
        _finalize(o_ref, m_ref, l_ref, acc_ref)


def _kernel(pos_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
            scale=None, softcap=None, window=None):
    _body(pos_ref, q_ref, k_ref[0].astype(q_ref.dtype), v_ref[0], None,
          o_ref, m_ref, l_ref, acc_ref, scale=scale, softcap=softcap,
          window=window)


def _kernel_quant(pos_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                  o_ref, m_ref, l_ref, acc_ref,
                  scale=None, softcap=None, window=None):
    dt = q_ref.dtype
    _body(pos_ref, q_ref, k_ref[0].astype(dt), v_ref[0].astype(dt),
          (ks_ref[0], vs_ref[0]), o_ref, m_ref, l_ref, acc_ref,
          scale=scale, softcap=softcap, window=window)


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "block_s", "block_t", "scale", "softcap",
                     "window"),
)
def flash_prefill_attention(
    q: jax.Array,  # [B, S, H, D]
    k_cache: jax.Array,  # [B, KVH, T, D]
    v_cache: jax.Array,
    positions: jax.Array,  # [B, S]
    k_scale: jax.Array = None,
    v_scale: jax.Array = None,
    interpret: bool = False,
    block_s: int = 256,
    block_t: int = 256,
    scale: float = None,
    softcap: float = None,
    window: int = None,
) -> jax.Array:
    B, S, H, D = q.shape
    KVH, T = k_cache.shape[1], k_cache.shape[2]
    group = H // KVH
    BS = min(block_s, S)
    BT = min(block_t, T)
    assert S % BS == 0 and T % BT == 0, (S, BS, T, BT)
    quantized = k_cache.dtype == jnp.int8

    qg = q.reshape(B, S, KVH, group, D)
    grid = (B, KVH, S // BS, T // BT)
    pos3 = positions.astype(jnp.int32)[:, :, None]  # [B, S, 1]
    pos_spec = pl.BlockSpec(
        (1, BS, 1), lambda b, h, s, t: (b, s, 0), memory_space=pltpu.VMEM
    )
    q_spec = pl.BlockSpec(
        (1, BS, None, group, D), lambda b, h, s, t: (b, s, h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    kv_spec = pl.BlockSpec(
        (1, None, BT, D), lambda b, h, s, t: (b, h, t, 0),
        memory_space=pltpu.VMEM,
    )
    scale_spec = pl.BlockSpec(
        (1, None, 1, BT), lambda b, h, s, t: (b, h, 0, t),
        memory_space=pltpu.VMEM,
    )
    common = dict(
        grid=grid,
        out_specs=pl.BlockSpec(
            (1, BS, None, group, D), lambda b, h, s, t: (b, s, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, KVH, group, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((BS * group, 1), jnp.float32),
            pltpu.VMEM((BS * group, 1), jnp.float32),
            pltpu.VMEM((BS * group, D), jnp.float32),
        ],
        interpret=interpret,
    )
    extras = dict(scale=scale, softcap=softcap, window=window)
    if quantized:
        out = pl.pallas_call(
            functools.partial(_kernel_quant, **extras),
            in_specs=[pos_spec, q_spec, kv_spec, kv_spec, scale_spec,
                      scale_spec],
            **common,
        )(
            pos3, qg, k_cache, v_cache,
            k_scale.astype(jnp.float32)[:, :, None, :],
            v_scale.astype(jnp.float32)[:, :, None, :],
        )
    else:
        out = pl.pallas_call(
            functools.partial(_kernel, **extras),
            in_specs=[pos_spec, q_spec, kv_spec, kv_spec],
            **common,
        )(pos3, qg, k_cache, v_cache)
    return out.reshape(B, S, H, D)


def pick_block_s(S: int, group: int) -> int:
    """Largest query block with S % BS == 0 and a bounded VMEM score tile."""
    for bs in (512, 256, 128):
        if S % bs == 0 and bs * group <= 2048:
            return bs
    return 0
