"""Paged decode attention — XLA reference implementation.

Contract (the Pallas kernel in ops/pallas/paged_flash.py is drop-in):

    paged_attend(q, k_pool, v_pool, positions, k_scale, v_scale, table) -> out
      q:          [B, S, n_heads, d]
      k/v_pool:   [n_pages, n_kv_heads, page, d]  (one layer's pool)
      k/v_scale:  [n_pages, n_kv_heads, page]     (int8 pools)
      positions:  [B, S] absolute query positions
      table:      [B, max_pages] page ids in position order
      out:        [B, S, n_heads, d]

The reference path gathers each sequence's pages into a contiguous
[B, KVH, T, d] view (T = max_pages * page) and defers to attend_xla — the
causal position mask carries over unchanged because page ordinal j holds
absolute positions [j*page, (j+1)*page). The gather materializes the
contiguous view in HBM (fine for correctness/CPU); the Pallas kernel reads
pages in place via the table instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from llm_inference_lab_tpu.models.paged import gather_pages, gather_scale_pages
from llm_inference_lab_tpu.ops.attention import attend_xla
from llm_inference_lab_tpu.ops.registry import PRIORITY_XLA, registry


def paged_attend_xla(
    q: jax.Array,
    k_pool: jax.Array,
    v_pool: jax.Array,
    positions: jax.Array,
    k_scale: jax.Array = None,
    v_scale: jax.Array = None,
    table: jax.Array = None,
    window: int = None,
    window_on: jax.Array = None,
    scale: float = None,
    softcap: float = None,
    tree_mask: jax.Array = None,  # [S, S] intra-chunk ancestry (tree spec)
    chunk_start: jax.Array = None,  # [B] chunk base SLOT (with tree_mask)
) -> jax.Array:
    k_cache = gather_pages(k_pool, table)
    v_cache = gather_pages(v_pool, table)
    if k_pool.dtype == jnp.int8:
        ks = gather_scale_pages(k_scale, table)
        vs = gather_scale_pages(v_scale, table)
    else:
        ks = vs = None
    # Tree speculation transfers unchanged: gathered slot index == logical
    # slot (page ordinal * P + offset), so attend_xla's ancestry-window
    # masking over [chunk_start, chunk_start + S) applies verbatim.
    return attend_xla(q, k_cache, v_cache, positions, ks, vs,
                      tree_mask=tree_mask, chunk_start=chunk_start,
                      window=window, window_on=window_on, scale=scale,
                      softcap=softcap)


registry.register(
    "paged_attention", paged_attend_xla, backend="xla", priority=PRIORITY_XLA
)
