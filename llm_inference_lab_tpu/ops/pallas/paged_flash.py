"""Paged flash decode attention — Pallas kernel with page-table indirection.

The paged twin of flash_decode.py (north-star SURVEY §7 item 4b: "paged-KV
attention kernel"). The T-tile sweep becomes a PAGE sweep: grid axis 2 walks
a sequence's page ordinals, and the KV block for ordinal j is fetched from
the pool at page id table[b, j] via PrefetchScalarGridSpec — the page table
is a scalar-prefetch operand, so the index map can read it to aim each
block's DMA. No contiguous [B, KVH, T, D] gather is ever materialized in
HBM (the XLA reference in ops/paged_attention.py does exactly that gather).

Masking is position-based and identical to the contiguous kernel: page
ordinal j holds absolute positions [j*P, (j+1)*P), so dummy table entries
(id 0) and unwritten page tails sit at positions the causal rule excludes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_inference_lab_tpu.ops.pallas.flash_decode import _attend_tile
from llm_inference_lab_tpu.ops.registry import PRIORITY_PALLAS, registry


def _kernel(table_ref, pos_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
    _attend_tile(
        pos_ref, q_ref, k_ref[0].astype(q_ref.dtype), v_ref[0], None,
        o_ref, m_ref, l_ref, acc_ref,
    )


def _kernel_quant(table_ref, pos_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                  o_ref, m_ref, l_ref, acc_ref):
    dt = q_ref.dtype
    _attend_tile(
        pos_ref, q_ref, k_ref[0].astype(dt), v_ref[0].astype(dt),
        (ks_ref[0], vs_ref[0]), o_ref, m_ref, l_ref, acc_ref,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_flash_attention(
    q: jax.Array,  # [B, S, H, D]
    k_pool: jax.Array,  # [N, KVH, P, D]
    v_pool: jax.Array,
    positions: jax.Array,  # [B, S]
    k_scale: jax.Array = None,  # [N, KVH, P]
    v_scale: jax.Array = None,
    table: jax.Array = None,  # [B, M]
    interpret: bool = False,
) -> jax.Array:
    B, S, H, D = q.shape
    KVH, P = k_pool.shape[1], k_pool.shape[2]
    M = table.shape[1]
    group = H // KVH
    quantized = k_pool.dtype == jnp.int8

    qg = q.reshape(B, S, KVH, group, D)
    grid = (B, KVH, M)  # page ordinal j is the online-softmax sweep axis
    pos3 = positions.astype(jnp.int32)[:, :, None]
    pos_spec = pl.BlockSpec(
        (1, S, 1), lambda b, h, j, tbl: (b, 0, 0), memory_space=pltpu.VMEM
    )
    q_spec = pl.BlockSpec(
        (1, S, None, group, D), lambda b, h, j, tbl: (b, 0, h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    # The page indirection: block j of the sweep comes from pool page
    # table[b, j] — the index map reads the scalar-prefetched table.
    kv_spec = pl.BlockSpec(
        (1, None, P, D), lambda b, h, j, tbl: (tbl[b, j], h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    scale_spec = pl.BlockSpec(
        (1, None, 1, P), lambda b, h, j, tbl: (tbl[b, j], h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [pos_spec, q_spec, kv_spec, kv_spec]
    args = [pos3, qg, k_pool, v_pool]
    kernel = _kernel
    if quantized:
        in_specs += [scale_spec, scale_spec]
        args += [
            k_scale.astype(jnp.float32)[:, :, None, :],  # [N, KVH, 1, P]
            v_scale.astype(jnp.float32)[:, :, None, :],
        ]
        kernel = _kernel_quant

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, S, None, group, D), lambda b, h, j, tbl: (b, 0, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((S * group, 1), jnp.float32),
            pltpu.VMEM((S * group, 1), jnp.float32),
            pltpu.VMEM((S * group, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, S, KVH, group, D), q.dtype),
        interpret=interpret,
    )(table.astype(jnp.int32), *args)
    return out.reshape(B, S, H, D)


def _wrapper(q, k_pool, v_pool, positions, k_scale=None, v_scale=None,
             table=None):
    from llm_inference_lab_tpu.ops.pallas import interpret_mode, use_pallas

    D = q.shape[-1]
    P = k_pool.shape[2]
    # Decode-shaped chunks only (same guard rationale as flash_decode);
    # P and D must satisfy Mosaic tiling (int8 sublane = 32).
    if (
        q.shape[1] > 32
        or D % 128 != 0
        or P % 32 != 0
        or not use_pallas()
    ):
        from llm_inference_lab_tpu.ops.paged_attention import paged_attend_xla

        return paged_attend_xla(q, k_pool, v_pool, positions, k_scale,
                                v_scale, table)
    return paged_flash_attention(
        q, k_pool, v_pool, positions, k_scale, v_scale, table,
        interpret=interpret_mode(),
    )


registry.register(
    "paged_attention",
    _wrapper,
    backend="pallas",
    priority=PRIORITY_PALLAS,
    platforms=("tpu", "cpu"),
)
