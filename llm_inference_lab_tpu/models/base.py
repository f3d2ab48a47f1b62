"""Model protocol + static-shape KV cache.

TPU-first design notes
----------------------
The reference mutates Python-side KV state (`SafeKVCacheManager`,
src/specdec/cache/kv_cache_manager.py:16) and "realigns" caches after partial
acceptance (`realign_kv_cache`, :353-479). On TPU all of that collapses:

* The cache is one static array per tensor, ``[n_layers, B, max_seq, n_kv, d]``
  (layers stacked so the transformer body is a ``lax.scan`` — one compiled
  layer, fast compiles, XLA still pipelines).
* Each sequence carries an explicit ``cache_len``; attention masks by length.
* Acceptance/rejection just moves ``cache_len``. Stale slots beyond the
  length are dead by masking and get overwritten by the next step's writes —
  rollback is free, and the reference's "disable KV reuse after partial
  acceptance" workaround (pipeline.py:3666-3677) is unnecessary.

Cache-tail invariant (what makes single-pass verification work):
the cache holds KV for committed tokens ``[0, L-1)`` — everything *except the
last committed token*. Each draft/verify forward starts from that last token,
so verify is ONE forward over ``[t_{L-1}, d_1..d_K]`` producing K+1 logit rows
(the reference instead re-runs a full autoregressive generate to verify —
src/scheduler/speculative_scheduler.py:192-198 — which we deliberately do not
replicate).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters shared by all decoder models."""

    name: str = "model"
    # "llama" (also Qwen2/Mistral: RMSNorm + rotary + gated mlp),
    # "gpt2" / "opt" (LayerNorm + learned positions + plain mlp), "fake".
    arch: str = "llama"
    vocab_size: int = 32000
    n_layers: int = 12
    n_heads: int = 12
    n_kv_heads: int = 12  # < n_heads => GQA
    d_model: int = 768
    d_ff: int = 3072
    max_position_embeddings: int = 2048
    rope_theta: float = 10000.0
    # Llama-3 rope frequency scaling, as ("llama3", factor, low_freq_factor,
    # high_freq_factor, original_max_position_embeddings) — tuple so the
    # frozen config stays hashable. None = plain rotary. Real Llama-3.1/3.2
    # checkpoints REQUIRE this (HF config.json rope_scaling): without it the
    # low-frequency rotary components diverge from the released weights.
    rope_scaling: Optional[tuple] = None
    rms_norm_eps: float = 1e-5
    layer_norm_eps: float = 1e-5
    tie_word_embeddings: bool = True
    dtype: Any = jnp.bfloat16
    # GPT-2 / OPT specifics
    use_learned_pos: bool = False  # learned absolute position embeddings
    use_bias: bool = False  # bias terms on projections / layernorms
    act: str = "silu"  # "silu" (gated mlp) | "gelu" (gpt2) | "relu" (opt)
    pos_offset: int = 0  # learned-pos table index offset (HF OPT uses 2)
    # Qwen2: bias on the fused q/k/v projection only (not on o_proj/mlp)
    qkv_bias: bool = False
    # Mistral: local attention window (token at position p attends to
    # (p - window, p]); None = full causal attention
    sliding_window: Optional[int] = None
    # Gemma: head_dim decoupled from d_model/n_heads (gemma-2b: 2048/8 but
    # head_dim 256), sqrt(d_model) input-embedding scale, RMSNorm computed
    # as x_hat * (1 + w) (HF GemmaRMSNorm), GeGLU (gated mlp with tanh-gelu
    # activation — act="gelu_tanh").
    head_dim_override: Optional[int] = None
    embed_scale: bool = False
    rms_one_offset: bool = False
    # Gemma-2: logit softcaps (x -> cap * tanh(x / cap)) on attention scores
    # and final lm_head logits; sandwich ("post") norms around both blocks;
    # attention scale from query_pre_attn_scalar instead of head_dim
    # (gemma2-27b: 144 vs head_dim 128); sliding window on every OTHER
    # layer (even layers local, odd layers global).
    attn_logit_softcap: Optional[float] = None
    final_logit_softcap: Optional[float] = None
    query_pre_attn_scalar: Optional[float] = None
    post_norms: bool = False
    alt_window: bool = False
    # Rolling-buffer KV for sliding-window models (round-3 VERDICT item 5):
    # when set, the contiguous cache is a RING of this many slots (slot =
    # position mod ring) instead of max_seq — per-layer KV memory and the
    # decode sweep become O(window), not O(T). Sized by the engine to
    # window + prefill_chunk + K + slack so speculative scratch writes and
    # chunked-prefill writes can never clobber a row still inside any live
    # query's window (writes at position p clobber p - ring, which is
    # below every window bound by construction). Uniform-window models
    # only (Mistral); gemma-2's alternating global layers need the full
    # cache. None = plain position-indexed cache.
    kv_ring_len: Optional[int] = None
    # lax.scan unroll factor for the layer stack. Measured on v5e: unroll=4
    # REGRESSED 3B decode 2.6x (39.9 -> 15.4 tok/s) — larger loop bodies
    # scheduled worse than the rolled scan. Keep 1 unless re-measured.
    scan_unroll: int = 1
    # Mixture-of-experts (Mixtral): n_experts gated-MLP experts per layer
    # with a top-k router. 0 = dense MLP.
    n_experts: int = 0
    experts_per_token: int = 2
    # "ragged": lax.ragged_dot grouped matmul (single-device fast path).
    # "dense": one-hot dispatch einsums — required under expert parallelism
    # (the engine re-partials the forward with this when the mesh has an
    # "expert" axis; GSPMD shards the [E, T, D] lanes, ragged_dot wouldn't).
    moe_impl: str = "ragged"

    @property
    def head_dim(self) -> int:
        if self.head_dim_override is not None:
            return self.head_dim_override
        return self.d_model // self.n_heads

    @property
    def use_layernorm(self) -> bool:
        """LayerNorm-with-bias archs (gpt2/opt) vs RMSNorm (llama family)."""
        return self.arch in ("gpt2", "opt")

    @property
    def gated_mlp(self) -> bool:
        """Gated MLP (llama: silu gate; gemma: tanh-gelu gate) vs plain
        2-layer MLP (gpt2 gelu / opt relu)."""
        return self.act in ("silu", "gelu_tanh")

    @property
    def moe(self) -> bool:
        return self.n_experts > 0


@jax.tree_util.register_pytree_node_class
@dataclass
class KVCache:
    """Static-shape KV cache. k/v: [n_layers, B, n_kv_heads, max_seq, head_dim]
    (heads-major — the reference's torch layout [batch, heads, seq, dim],
    kv_types.py:15, and the layout Pallas TPU blocking requires: the
    per-(batch, head) [seq_tile, head_dim] tiles are the trailing dims).

    Replaces reference KVCache (src/specdec/cache/kv_types.15) and
    SafeKVCacheManager. `slice_prefix`/`realign` equivalents are just length
    bookkeeping done by the engine.

    Quantized mode (the north star's "quantized KV-cache append", absent
    from the reference whose KV-append path is fp only,
    src/kernels/cuda/kv_cache.cu): k/v are int8 with per-(head, position)
    symmetric scales in k_scale/v_scale [n_layers, B, n_kv, max_seq].
    Scale tensors always exist (D/2 bytes per 2*D-byte row is noise) so the
    pytree structure is uniform; bf16 caches simply never read them.
    """

    k: jax.Array
    v: jax.Array
    k_scale: jax.Array
    v_scale: jax.Array

    def tree_flatten(self):
        return (self.k, self.v, self.k_scale, self.v_scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(
        cls,
        cfg: ModelConfig,
        batch_size: int,
        max_seq_len: int,
        dtype: Any = None,
        quantized: bool = False,
    ) -> "KVCache":
        shape = (cfg.n_layers, batch_size, cfg.n_kv_heads, max_seq_len, cfg.head_dim)
        dtype = jnp.int8 if quantized else (dtype or cfg.dtype)
        sshape = shape[:-1]
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            k_scale=jnp.ones(sshape, jnp.float32),
            v_scale=jnp.ones(sshape, jnp.float32),
        )

    @property
    def quantized(self) -> bool:
        return self.k.dtype == jnp.int8

    @property
    def max_seq_len(self) -> int:
        return self.k.shape[3]

    @property
    def batch_size(self) -> int:
        return self.k.shape[1]


def _quantize_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[..., D] -> (int8 values, [...] scales): symmetric per-row."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def scatter_stack_layer(
    k_stack: jax.Array,  # [L, B, n_kv, T, d] — the FULL stacked cache
    v_stack: jax.Array,
    ks_stack: jax.Array,  # [L, B, n_kv, T]
    vs_stack: jax.Array,
    k_new: jax.Array,  # [B, S, n_kv, d] (model compute order)
    v_new: jax.Array,
    start: jax.Array,  # [B] int32 per-sequence write offsets
    layer_idx: jax.Array,  # [] int32 — TRACED layer index (scan iteration)
    ring_len: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Write S new KV rows directly into the stacked cache at a dynamic
    layer index — a pure scatter of S rows.

    This exists because threading per-layer caches through ``lax.scan`` as
    xs/ys makes XLA materialize a fresh stacked output every step: the
    WHOLE cache is copied (read+write) per decode step — measured 2.7 ms
    at B=16/T=256 on v5e for the 3B cache, the dominant batch-scaling cost
    of the decode step (docs/results/serving/attn_b_probe.json). Carrying
    the stacks through the scan and scattering rows in place eliminates
    the copy; attention reads a (fusion-friendly) dynamic slice.
    """
    B, S = k_new.shape[:2]
    T = k_stack.shape[3]
    pos = start[:, None] + jnp.arange(S, dtype=jnp.int32)[None]  # [B, S]
    if ring_len is not None:
        R = ring_len
        slots = pos % R
        if S > R:  # only the last R rows of an oversized block may land
            slots = jnp.where(pos >= pos[:, -1:] - (R - 1), slots, R)
        mode = "drop"
    else:
        # dynamic_update_slice semantics clamped writes to the buffer; the
        # engine guarantees headroom, clip keeps stray rows at the tail.
        slots = jnp.clip(pos, 0, T - 1)
        mode = "clip"
    b_idx = jnp.arange(B, dtype=jnp.int32)[:, None]  # [B, 1]
    # stack.at[i, b, :, slot, :]: advanced indices (scalar, [B,1], [B,S])
    # separated by the head slice -> indexed shape [B, S, n_kv, d], which
    # is exactly the model-order row block.
    if k_stack.dtype == jnp.int8:
        kq, ks = _quantize_rows(k_new)
        vq, vs = _quantize_rows(v_new)
        k_stack = k_stack.at[layer_idx, b_idx, :, slots, :].set(kq, mode=mode)
        v_stack = v_stack.at[layer_idx, b_idx, :, slots, :].set(vq, mode=mode)
        ks_stack = ks_stack.at[layer_idx, b_idx, :, slots].set(ks, mode=mode)
        vs_stack = vs_stack.at[layer_idx, b_idx, :, slots].set(vs, mode=mode)
    else:
        k_stack = k_stack.at[layer_idx, b_idx, :, slots, :].set(
            k_new.astype(k_stack.dtype), mode=mode
        )
        v_stack = v_stack.at[layer_idx, b_idx, :, slots, :].set(
            v_new.astype(v_stack.dtype), mode=mode
        )
    return k_stack, v_stack, ks_stack, vs_stack


def update_cache_layer(
    k_cache: jax.Array,  # [B, n_kv, max_seq, d] (one layer, heads-major)
    v_cache: jax.Array,
    ks_cache: jax.Array,  # [B, n_kv, max_seq] scales (unused for fp caches)
    vs_cache: jax.Array,
    k_new: jax.Array,  # [B, S, n_kv, d] (model compute order: seq-major)
    v_new: jax.Array,
    start: jax.Array,  # [B] int32 — per-sequence write offsets
    ring_len: Optional[int] = None,  # rolling-buffer cache: slot = pos % R
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Write S new KV rows at per-sequence offsets (quantizing on the fly
    for int8 caches — the "quantized KV append" path).

    vmapped dynamic_update_slice: each sequence writes at its own offset
    (sequences advance by *different* accepted lengths each spec step).
    Replaces the reference's concat-then-realign (kv_cache_manager.py:149-285).

    ring_len: rolling-buffer mode for sliding-window models — row for
    position p lands at slot p % ring_len (scatter; the slice is no longer
    contiguous across the wrap). When S > ring_len only the LAST ring_len
    rows land (earlier rows scatter to index R, dropped) — scatter order
    for colliding indices is unspecified, so stale rows must never be
    issued at all.
    """
    k_new = jnp.swapaxes(k_new, 1, 2)  # -> [B, n_kv, S, d]
    v_new = jnp.swapaxes(v_new, 1, 2)

    if ring_len is not None:
        B, _, S, _ = k_new.shape
        R = ring_len
        pos = start[:, None] + jnp.arange(S, dtype=jnp.int32)[None]  # [B,S]
        slots = pos % R
        if S > R:  # drop rows a later row in this batch would overwrite
            slots = jnp.where(pos >= pos[:, -1:] - (R - 1), slots, R)

        def ring_upd(cache_b, new_b, s_b):
            # cache_b [n_kv, R, d]; new_b [n_kv, S, d]; scatter on axis 1
            # (a single advanced index between slices keeps its position,
            # so the indexed shape is [n_kv, S, d] — new_b as-is).
            return cache_b.at[:, s_b, :].set(new_b, mode="drop")

        def ring_upd_scale(cache_b, new_b, s_b):
            return cache_b.at[:, s_b].set(new_b, mode="drop")

        if k_cache.dtype == jnp.int8:
            kq, ks = _quantize_rows(k_new)
            vq, vs = _quantize_rows(v_new)
            k_cache = jax.vmap(ring_upd)(k_cache, kq, slots)
            v_cache = jax.vmap(ring_upd)(v_cache, vq, slots)
            ks_cache = jax.vmap(ring_upd_scale)(ks_cache, ks, slots)
            vs_cache = jax.vmap(ring_upd_scale)(vs_cache, vs, slots)
        else:
            k_cache = jax.vmap(ring_upd)(
                k_cache, k_new.astype(k_cache.dtype), slots
            )
            v_cache = jax.vmap(ring_upd)(
                v_cache, v_new.astype(v_cache.dtype), slots
            )
        return k_cache, v_cache, ks_cache, vs_cache

    def upd(cache_b, new_b, s):
        return jax.lax.dynamic_update_slice(cache_b, new_b, (0, s, 0))

    def upd_scale(cache_b, new_b, s):
        return jax.lax.dynamic_update_slice(cache_b, new_b, (0, s))

    if k_cache.dtype == jnp.int8:
        kq, ks = _quantize_rows(k_new)
        vq, vs = _quantize_rows(v_new)
        k_cache = jax.vmap(upd)(k_cache, kq, start)
        v_cache = jax.vmap(upd)(v_cache, vq, start)
        ks_cache = jax.vmap(upd_scale)(ks_cache, ks, start)
        vs_cache = jax.vmap(upd_scale)(vs_cache, vs, start)
    else:
        k_cache = jax.vmap(upd)(k_cache, k_new.astype(k_cache.dtype), start)
        v_cache = jax.vmap(upd)(v_cache, v_new.astype(v_cache.dtype), start)
    return k_cache, v_cache, ks_cache, vs_cache


@dataclass
class Model:
    """A bound model: config + params + pure apply function.

    ``apply(params, tokens, positions, cache, cache_lens) -> (logits, cache)``
      tokens:     [B, S] int32 — new tokens to forward
      positions:  [B, S] int32 — absolute positions of those tokens
      cache:      KVCache or None (None = no-cache prefill-only forward)
      cache_lens: [B] int32 — valid cache length per sequence; new KV rows are
                  written starting at cache_lens
      logits:     [B, S, vocab] float32
    """

    config: ModelConfig
    params: Any
    apply_fn: Callable[..., Tuple[jax.Array, Optional[KVCache]]]
    extras: dict = field(default_factory=dict)  # e.g. medusa head params
    # Optional hidden->logits projection (the model's lm_head), used by the
    # Medusa/EAGLE draft heads: head_fn(params, hidden [..., D]) -> logits.
    head_fn: Optional[Callable[..., jax.Array]] = None

    def apply(self, params, tokens, positions, cache, cache_lens):
        return self.apply_fn(params, tokens, positions, cache, cache_lens)

    def init_cache(
        self,
        batch_size: int,
        max_seq_len: int,
        quantized: bool = False,
        paged: bool = False,
        page_size: int = 64,
        n_pages: Optional[int] = None,
        table: Any = None,
    ):
        if paged:
            from llm_inference_lab_tpu.models.paged import PagedKVCache

            return PagedKVCache.create(
                self.config, batch_size, max_seq_len, n_pages=n_pages,
                page_size=page_size, quantized=quantized, table=table,
            )
        if self.config.kv_ring_len is not None:
            max_seq_len = min(max_seq_len, self.config.kv_ring_len)
        return KVCache.create(self.config, batch_size, max_seq_len, quantized=quantized)


