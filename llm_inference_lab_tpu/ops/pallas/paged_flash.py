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

Live-page clamp: a second scalar-prefetch operand carries each sequence's
(start, last) live page ordinals. The index map clamps dead sweep steps to
the LAST live ordinal — Mosaic skips the DMA when consecutive grid steps
map to the same block — and `pl.when` skips their compute, so per-step
attention traffic is proportional to the sequence's actual length, not
max_pages. A binding sliding window additionally shrinks the sweep grid
statically (ordinal = start + j with only ceil((window+S-1)/P)+1 steps).
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
from llm_inference_lab_tpu.ops.registry import PRIORITY_PALLAS, registry


def _body(aux_ref, pos_ref, q_ref, k, v, kv_scale,
          o_ref, m_ref, l_ref, acc_ref, P,
          scale=None, softcap=None, window=None):
    b, j = pl.program_id(0), pl.program_id(2)

    @pl.when(j == 0)
    def _():
        _init_state(m_ref, l_ref, acc_ref)

    ordinal = aux_ref[b, 0] + j

    @pl.when(ordinal <= aux_ref[b, 1])  # dead pages: DMA deduped, no compute
    def _():
        _accum_tile(pos_ref, q_ref, k, v, kv_scale, m_ref, l_ref, acc_ref,
                    ordinal * P, scale=scale, softcap=softcap, window=window)

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        _finalize(o_ref, m_ref, l_ref, acc_ref)


def _kernel(table_ref, aux_ref, pos_ref, q_ref, k_ref, v_ref,
            o_ref, m_ref, l_ref, acc_ref,
            P=None, scale=None, softcap=None, window=None):
    _body(aux_ref, pos_ref, q_ref, k_ref[0].astype(q_ref.dtype), v_ref[0],
          None, o_ref, m_ref, l_ref, acc_ref, P,
          scale=scale, softcap=softcap, window=window)


def _kernel_quant(table_ref, aux_ref, pos_ref, q_ref, k_ref, v_ref, ks_ref,
                  vs_ref, o_ref, m_ref, l_ref, acc_ref,
                  P=None, scale=None, softcap=None, window=None):
    dt = q_ref.dtype
    _body(aux_ref, pos_ref, q_ref, k_ref[0].astype(dt), v_ref[0].astype(dt),
          (ks_ref[0], vs_ref[0]), o_ref, m_ref, l_ref, acc_ref, P,
          scale=scale, softcap=softcap, window=window)


@functools.partial(
    jax.jit, static_argnames=("interpret", "scale", "softcap", "window")
)
def paged_flash_attention(
    q: jax.Array,  # [B, S, H, D]
    k_pool: jax.Array,  # [N, KVH, P, D]
    v_pool: jax.Array,
    positions: jax.Array,  # [B, S]
    k_scale: jax.Array = None,  # [N, KVH, P]
    v_scale: jax.Array = None,
    table: jax.Array = None,  # [B, M]
    interpret: bool = False,
    scale: float = None,
    softcap: float = None,
    window: int = None,
) -> jax.Array:
    B, S, H, D = q.shape
    KVH, P = k_pool.shape[1], k_pool.shape[2]
    M = table.shape[1]
    group = H // KVH
    quantized = k_pool.dtype == jnp.int8

    # Live page-ordinal range per sequence. Decode-chunk positions are
    # contiguous, so the window's lowest attended position is
    # min_pos - window + 1; dead rows (position -1) clamp to 0, which only
    # widens the range (conservative, never wrong).
    pos_i = jnp.maximum(positions.astype(jnp.int32), 0)
    last = jnp.max(pos_i, axis=1) // P  # [B]
    if window is not None:
        start = jnp.maximum(jnp.min(pos_i, axis=1) - window + 1, 0) // P
        # Static bound on live ordinals: window + S - 1 positions span at
        # most ceil((window+S-1)/P) + 1 pages.
        M_sweep = min(M, -(-(window + S - 1) // P) + 1)
    else:
        start = jnp.zeros((B,), jnp.int32)
        M_sweep = M
    aux = jnp.stack([start.astype(jnp.int32), last.astype(jnp.int32)], axis=1)

    qg = q.reshape(B, S, KVH, group, D)
    grid = (B, KVH, M_sweep)  # page ordinal j is the online-softmax sweep axis
    pos3 = positions.astype(jnp.int32)[:, :, None]
    pos_spec = pl.BlockSpec(
        (1, S, 1), lambda b, h, j, tbl, aux: (b, 0, 0), memory_space=pltpu.VMEM
    )
    q_spec = pl.BlockSpec(
        (1, S, None, group, D), lambda b, h, j, tbl, aux: (b, 0, h, 0, 0),
        memory_space=pltpu.VMEM,
    )

    # The page indirection: sweep step j covers ordinal start[b]+j, clamped
    # to the last live ordinal (repeated index => Mosaic reuses the already
    # fetched block), and fetched from pool page table[b, ordinal].
    def page_of(b, j, tbl, aux):
        ordinal = jnp.minimum(aux[b, 0] + j, aux[b, 1])
        return tbl[b, ordinal]

    kv_spec = pl.BlockSpec(
        (1, None, P, D),
        lambda b, h, j, tbl, aux: (page_of(b, j, tbl, aux), h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    scale_spec = pl.BlockSpec(
        (1, None, 1, P),
        lambda b, h, j, tbl, aux: (page_of(b, j, tbl, aux), h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [pos_spec, q_spec, kv_spec, kv_spec]
    args = [pos3, qg, k_pool, v_pool]
    extras = dict(P=P, scale=scale, softcap=softcap, window=window)
    kernel = functools.partial(_kernel, **extras)
    if quantized:
        in_specs += [scale_spec, scale_spec]
        args += [
            k_scale.astype(jnp.float32)[:, :, None, :],  # [N, KVH, 1, P]
            v_scale.astype(jnp.float32)[:, :, None, :],
        ]
        kernel = functools.partial(_kernel_quant, **extras)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, S, None, group, D), lambda b, h, j, tbl, aux: (b, 0, h, 0, 0),
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
    )(table.astype(jnp.int32), aux, *args)
    return out.reshape(B, S, H, D)


def _wrapper(q, k_pool, v_pool, positions, k_scale=None, v_scale=None,
             table=None, window=None, window_on=None, scale=None,
             softcap=None, tree_mask=None, chunk_start=None):
    from llm_inference_lab_tpu.ops.pallas import interpret_mode, use_pallas

    D = q.shape[-1]
    P = k_pool.shape[2]
    M = table.shape[1] if table is not None else 0
    # Window can only bind when the paged span exceeds it (see
    # flash_decode._kernel_wrapper); a non-binding window drops, and with it
    # the window_on gate.
    eff_window = window if (window is not None and M * P > window) else None
    # Decode-shaped chunks only (same guard rationale as flash_decode);
    # P and D must satisfy Mosaic tiling (int8 sublane = 32). Tree-spec
    # verify chunks (ancestry masking) take the XLA gather path — the
    # kernel's sweep masks by position ordering only.
    if (
        q.shape[1] > 32
        or D % 128 != 0
        or P % 32 != 0
        or tree_mask is not None
        or not use_pallas()
    ):
        from llm_inference_lab_tpu.ops.paged_attention import paged_attend_xla

        return paged_attend_xla(q, k_pool, v_pool, positions, k_scale,
                                v_scale, table, window=window,
                                window_on=window_on, scale=scale,
                                softcap=softcap, tree_mask=tree_mask,
                                chunk_start=chunk_start)

    def flash(win):
        return paged_flash_attention(
            q, k_pool, v_pool, positions, k_scale, v_scale, table,
            interpret=interpret_mode(), scale=scale, softcap=softcap,
            window=win,
        )

    if eff_window is not None and window_on is not None:
        # Traced per-layer gate (gemma2 alternating local/global): compile
        # both variants, lax.cond executes one (flash_decode does the same).
        return jax.lax.cond(
            jnp.asarray(window_on, jnp.bool_),
            lambda: flash(eff_window),
            lambda: flash(None),
        )
    return flash(eff_window)


registry.register(
    "paged_attention",
    _wrapper,
    backend="pallas",
    priority=PRIORITY_PALLAS,
    platforms=("tpu", "cpu"),
)
