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


def scatter_paged_stack(
    k_pool: jax.Array,  # [L, N_pages, KVH, P, D] — FULL stacked pool
    v_pool: jax.Array,
    ks_pool: jax.Array,  # [L, N_pages, KVH, P]
    vs_pool: jax.Array,
    k_new: jax.Array,  # [B, S, KVH, D]
    v_new: jax.Array,
    start: jax.Array,  # [B]
    table: jax.Array,  # [B, max_pages]
    layer_idx: jax.Array,  # [] int32 traced layer index
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """update_paged_layer on the STACKED pool at a dynamic layer index —
    the scan-carry form that avoids per-step whole-pool copies (see
    base.scatter_stack_layer)."""
    B, S = k_new.shape[:2]
    P = k_pool.shape[-2]
    abs_pos = start[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    max_pages = table.shape[1]
    ordinal = jnp.clip(abs_pos // P, 0, max_pages - 1)
    pages = jnp.take_along_axis(table, ordinal, axis=1)  # [B, S]
    offs = abs_pos % P
    if k_pool.dtype == jnp.int8:
        kq, ks = _quantize_rows(k_new)
        vq, vs = _quantize_rows(v_new)
        k_pool = k_pool.at[layer_idx, pages, :, offs, :].set(kq)
        v_pool = v_pool.at[layer_idx, pages, :, offs, :].set(vq)
        ks_pool = ks_pool.at[layer_idx, pages, :, offs].set(ks)
        vs_pool = vs_pool.at[layer_idx, pages, :, offs].set(vs)
    else:
        k_pool = k_pool.at[layer_idx, pages, :, offs, :].set(
            k_new.astype(k_pool.dtype)
        )
        v_pool = v_pool.at[layer_idx, pages, :, offs, :].set(
            v_new.astype(v_pool.dtype)
        )
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


class PrefixPageCache(PageAllocator):
    """PageAllocator + automatic prefix caching (vLLM-style, host-side).

    Full page_size-token chunks of a prompt are content-addressed by a
    CHAIN hash (chunk tokens + parent chunk's hash, so a page is only
    reusable under the exact same prefix). Admission asks `match()` for the
    longest cached prefix — those pages are shared (refcounted, never
    re-written: decode writes land at positions >= prompt_len, which is
    past every shared full chunk) and their prefill compute is skipped
    entirely. After a request's own prefill, its fresh full prompt pages
    are registered for future requests.

    Pages whose refcount drops to zero stay cached (that is the feature:
    a system prompt survives between requests) and move to an LRU pool
    that `alloc` evicts from only when the free list runs dry.

    Not a device object; shared pages reach the jitted steps only as
    ordinary page ids inside table rows. No reference analogue (the
    reference has no KV reuse across requests at all).
    """

    def __init__(self, n_pages: int, page_size: int):
        super().__init__(n_pages, page_size)
        self._by_hash: dict = {}  # chain_hash -> page_id
        self._meta: dict = {}  # page_id -> [chain_hash, refcount, last_use]
        self._clock = 0
        self.hits = 0  # pages served from cache (stats)
        self.misses = 0  # fresh pages registered

    # -- hashing ---------------------------------------------------------
    def chunk_hashes(self, ids: List[int]) -> List[Any]:
        """Chain hash per FULL page_size chunk of the token list."""
        out: List[Any] = []
        parent: Any = None
        P = self.page_size
        for j in range(len(ids) // P):
            parent = hash((parent, tuple(ids[j * P : (j + 1) * P])))
            out.append(parent)
        return out

    # -- allocation with LRU eviction of unreferenced cached pages -------
    def _evict(self, n: int) -> int:
        """Evict up to n unreferenced cached pages (oldest first)."""
        victims = sorted(
            (m[2], pid) for pid, m in self._meta.items() if m[1] == 0
        )[:n]
        for _, pid in victims:
            h = self._meta.pop(pid)[0]
            self._by_hash.pop(h, None)
            self._free.append(pid)
        return len(victims)

    def alloc(self, n: int) -> Optional[List[int]]:
        if n > len(self._free):
            self._evict(n - len(self._free))
        return super().alloc(n)

    @property
    def reclaimable_pages(self) -> int:
        return sum(1 for m in self._meta.values() if m[1] == 0)

    # -- the admission-facing API ----------------------------------------
    def match(self, ids: List[int], max_tokens: int) -> Tuple[List[int], int]:
        """Longest cached prefix of `ids`, capped at `max_tokens` tokens
        (callers cap at len(ids)-2 so the suffix always re-computes the
        hidden states the drafting modes need). Returns (shared_pages,
        reuse_len); takes a refcount on each returned page."""
        pages: List[int] = []
        self._clock += 1
        for h in self.chunk_hashes(ids[: max(max_tokens, 0)]):
            pid = self._by_hash.get(h)
            if pid is None:
                break
            pages.append(pid)
        for pid in pages:
            self._meta[pid][1] += 1
            self._meta[pid][2] = self._clock
        self.hits += len(pages)
        return pages, len(pages) * self.page_size

    def register(self, ids: List[int], pages: List[int], reuse_len: int) -> None:
        """After prefill: publish the request's own FULL prompt chunks
        (beyond the reused prefix) for future sharing. `pages` is the
        request's complete table prefix (shared + fresh, position order)."""
        self._clock += 1
        hashes = self.chunk_hashes(ids)
        for j in range(reuse_len // self.page_size, len(hashes)):
            pid = pages[j]
            if hashes[j] in self._by_hash:  # raced duplicate: keep first
                continue
            self._by_hash[hashes[j]] = pid
            self._meta[pid] = [hashes[j], 1, self._clock]
        self.misses += len(hashes) - reuse_len // self.page_size

    def free(self, pages: List[int]) -> None:
        """Release a retired request's pages: cached (registered) pages
        drop a refcount and stay resident for reuse; others free as usual."""
        self._clock += 1
        for p in pages:
            m = self._meta.get(p)
            if m is not None:
                m[1] = max(m[1] - 1, 0)
                m[2] = self._clock
            elif p != 0:
                self._free.append(p)
