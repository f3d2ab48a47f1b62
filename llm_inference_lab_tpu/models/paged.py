"""Paged KV cache: page-pool storage + per-sequence page tables.

North-star component (SURVEY.md §7 item 4b; reference has no paged KV —
its caches are per-sequence contiguous torch tensors, kv_types.py:15).
Serving memory with the contiguous `KVCache` is B_slots x max_seq_len
regardless of what's actually in flight; with paging it is
(pool pages) x page_size, sized to the LIVE token budget, and admission
becomes memory-aware: a request only admits when enough free pages exist.

Layout (mirrors KVCache's heads-major, scan-friendly convention):
    k/v pools  [n_layers, n_pages, n_kv_heads, page_size, head_dim]
    scales     [n_layers, n_pages, n_kv_heads, page_size]   (int8 mode)
    table      [B, max_pages_per_seq] int32 — page ids, in position order:
               page j of a sequence holds absolute positions
               [j*page_size, (j+1)*page_size). Unused entries point at
               page 0; the position mask keeps them unreachable.

The attention contract (logical position == page-ordinal * P + offset)
means the existing causal masking rule transfers unchanged: a query at
position p attends to gathered slots <= p, and junk rows (unwritten page
tails, dummy table entries) sit at masked-out positions.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp

from llm_inference_lab_tpu.models.base import ModelConfig, _quantize_rows


@jax.tree_util.register_pytree_node_class
@dataclass
class PagedKVCache:
    k: jax.Array  # [L, N_pages, KVH, P, D]
    v: jax.Array
    k_scale: jax.Array  # [L, N_pages, KVH, P]
    v_scale: jax.Array
    table: jax.Array  # [B, max_pages] int32

    def tree_flatten(self):
        return (self.k, self.v, self.k_scale, self.v_scale, self.table), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(
        cls,
        cfg: ModelConfig,
        batch_size: int,
        max_seq_len: int,
        n_pages: Optional[int] = None,
        page_size: int = 64,
        quantized: bool = False,
        table: Optional[jax.Array] = None,
    ) -> "PagedKVCache":
        """Default table: slot b owns pages [b*m, (b+1)*m) — equivalent to a
        contiguous cache (engine.generate_batch path). Serving passes its
        own allocator-driven table."""
        P = page_size
        m = (max_seq_len + P - 1) // P
        n_pages = n_pages if n_pages is not None else batch_size * m
        shape = (cfg.n_layers, n_pages, cfg.n_kv_heads, P, cfg.head_dim)
        dtype = jnp.int8 if quantized else cfg.dtype
        if table is None:
            table = (
                jnp.arange(batch_size * m, dtype=jnp.int32).reshape(batch_size, m)
                % n_pages
            )
        else:
            # Private copy: the target and draft caches each carry a table
            # leaf inside the (donated) DecodeState, and donating the same
            # buffer twice is an XLA error.
            table = jnp.array(table, jnp.int32, copy=True)
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            k_scale=jnp.ones(shape[:-1], jnp.float32),
            v_scale=jnp.ones(shape[:-1], jnp.float32),
            table=table,
        )

    @property
    def quantized(self) -> bool:
        return self.k.dtype == jnp.int8

    @property
    def page_size(self) -> int:
        return self.k.shape[3]

    @property
    def max_pages_per_seq(self) -> int:
        return self.table.shape[1]

    @property
    def max_seq_len(self) -> int:  # logical, per sequence
        return self.max_pages_per_seq * self.page_size

    @property
    def batch_size(self) -> int:
        return self.table.shape[0]


def update_paged_layer(
    k_pool: jax.Array,  # [N_pages, KVH, P, D] (one layer)
    v_pool: jax.Array,
    ks_pool: jax.Array,  # [N_pages, KVH, P]
    vs_pool: jax.Array,
    k_new: jax.Array,  # [B, S, KVH, D] (model compute order)
    v_new: jax.Array,
    start: jax.Array,  # [B] absolute write offsets
    table: jax.Array,  # [B, max_pages]
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Scatter S new KV rows per sequence into their pages (quantizing on
    the fly for int8 pools). Equivalent of base.update_cache_layer for the
    paged layout: row (b, s) lands at page table[b, (start[b]+s)//P],
    offset (start[b]+s)%P."""
    B, S = k_new.shape[:2]
    P = k_pool.shape[2]  # page rows live at axis 2 of [N, KVH, P, D]? no:
    P = k_pool.shape[-2]
    abs_pos = start[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]  # [B, S]
    max_pages = table.shape[1]
    ordinal = jnp.clip(abs_pos // P, 0, max_pages - 1)
    pages = jnp.take_along_axis(table, ordinal, axis=1)  # [B, S]
    offs = abs_pos % P

    if k_pool.dtype == jnp.int8:
        kq, ks = _quantize_rows(k_new)  # [B, S, KVH, D], [B, S, KVH]
        vq, vs = _quantize_rows(v_new)
        k_pool = k_pool.at[pages, :, offs, :].set(kq)
        v_pool = v_pool.at[pages, :, offs, :].set(vq)
        ks_pool = ks_pool.at[pages, :, offs].set(ks)
        vs_pool = vs_pool.at[pages, :, offs].set(vs)
    else:
        k_pool = k_pool.at[pages, :, offs, :].set(k_new.astype(k_pool.dtype))
        v_pool = v_pool.at[pages, :, offs, :].set(v_new.astype(v_pool.dtype))
    return k_pool, v_pool, ks_pool, vs_pool


def gather_pages(pool: jax.Array, table: jax.Array) -> jax.Array:
    """[N_pages, KVH, P, D] + [B, max_pages] -> contiguous [B, KVH, T, D]
    (T = max_pages * P). The XLA-reference read path; the Pallas kernel
    reads pages in place instead."""
    g = pool[table]  # [B, max_pages, KVH, P, D]
    B, M, KVH, P, D = g.shape
    g = jnp.moveaxis(g, 2, 1)  # [B, KVH, max_pages, P, D]
    return g.reshape(B, KVH, M * P, D)


def gather_scale_pages(pool: jax.Array, table: jax.Array) -> jax.Array:
    """[N_pages, KVH, P] + [B, max_pages] -> [B, KVH, T]."""
    g = pool[table]  # [B, M, KVH, P]
    g = jnp.moveaxis(g, 2, 1)
    B, KVH, M, P = g.shape
    return g.reshape(B, KVH, M * P)


class PageAllocator:
    """Host-side free-list allocator (serving admission). Not a device
    object: page ids flow into the jitted steps only through table rows."""

    def __init__(self, n_pages: int, page_size: int):
        self.page_size = page_size
        self.n_pages = n_pages
        # Page 0 is the shared dummy target of unused table entries — never
        # handed out, so stale table tails can't alias a live page.
        self._free: List[int] = list(range(n_pages - 1, 0, -1))

    def pages_needed(self, n_tokens: int) -> int:
        return (n_tokens + self.page_size - 1) // self.page_size

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> Optional[List[int]]:
        """n pages or None if the pool can't satisfy the request (caller
        keeps the request queued — memory-aware admission)."""
        if n > len(self._free):
            return None
        out = [self._free.pop() for _ in range(n)]
        return out

    def free(self, pages: List[int]) -> None:
        for p in pages:
            if p != 0:
                self._free.append(p)
