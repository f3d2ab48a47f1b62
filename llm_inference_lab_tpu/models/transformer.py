"""Config-driven decoder transformer shared by the GPT-2 and Llama families.

One compiled layer, scanned over the stacked-layer params/cache
(``lax.scan``) — fast XLA compiles at any depth, and every matmul routes
through ``ops.quant.dense`` so weight-only INT8/INT4 applies uniformly.

Replaces the reference's HF-model backend (src/specdec/models/hf_wrappers.py)
with a from-scratch implementation: same observable contract (tokens in,
logits + KV out), TPU-native internals.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from llm_inference_lab_tpu.models.base import (
    KVCache,
    ModelConfig,
    update_cache_layer,
)
from llm_inference_lab_tpu.ops.attention import attend_xla
from llm_inference_lab_tpu.ops.quant import dense
from llm_inference_lab_tpu.ops.registry import get_op


def rms_norm(
    x: jax.Array, scale: jax.Array, eps: float, one_offset: bool = False
) -> jax.Array:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + eps)
    s = scale.astype(jnp.float32)
    if one_offset:  # gemma convention: weights stored as (w - 1)
        s = 1.0 + s
    return (y * s).astype(x.dtype)


def layer_norm(
    x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float
) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


from functools import lru_cache


@lru_cache(maxsize=32)
def _rope_inv_freq(head_dim: int, theta: float, rope_scaling: Optional[tuple]):
    """Inverse rotary frequencies [head_dim//2], with optional llama3
    scaling (HF modeling_rope_utils._compute_llama3_parameters: frequencies
    whose wavelength exceeds original_max/low_freq_factor are divided by
    `factor`, with a smooth ramp in the medium band). Host-side numpy,
    cached — becomes a compile-time constant under jit."""
    import numpy as np

    half = head_dim // 2
    inv = theta ** (-np.arange(0, half, dtype=np.float64) / half)
    if rope_scaling is not None:
        kind, factor, low_f, high_f, orig = rope_scaling
        if kind != "llama3":
            raise ValueError(f"unsupported rope_scaling type {kind!r}")
        wavelen = 2.0 * np.pi / inv
        low_wl = orig / low_f
        high_wl = orig / high_f
        scaled = np.where(wavelen > low_wl, inv / factor, inv)
        smooth = (orig / wavelen - low_f) / (high_f - low_f)
        smoothed = (1.0 - smooth) / factor * inv + smooth * inv
        medium = (wavelen >= high_wl) & (wavelen <= low_wl)
        inv = np.where(medium, smoothed, scaled)
    # Return a NUMPY constant: the lru_cache is shared across jit traces, and
    # a cached jax.Array materialized inside one trace leaks into the next
    # (UnexpectedTracerError); numpy closures are always safe.
    return np.asarray(inv, np.float32)


def rope(
    x: jax.Array,
    positions: jax.Array,
    theta: float,
    rope_scaling: Optional[tuple] = None,
) -> jax.Array:
    """Rotary embedding (half-split rotate convention, matching HF Llama).
    x: [B, S, H, D], positions: [B, S]."""
    D = x.shape[-1]
    half = D // 2
    freqs = _rope_inv_freq(D, theta, rope_scaling)
    angles = positions[..., None].astype(jnp.float32) * freqs  # [B, S, half]
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = x[..., :half].astype(jnp.float32), x[..., half:].astype(jnp.float32)
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)


def _norm(cfg: ModelConfig, x, p, prefix):
    if cfg.use_layernorm:
        return layer_norm(x, p[f"{prefix}_scale"], p[f"{prefix}_bias"], cfg.layer_norm_eps)
    return rms_norm(x, p[f"{prefix}_scale"], cfg.rms_norm_eps, cfg.rms_one_offset)


def _lora(p: Any, site: str, lora_ids, x: jax.Array):
    """Additive per-slot adapter delta (models/lora.py) when the layer
    params carry a pack for `site` and the call threads slot ids."""
    A = p.get(f"lora_A_{site}") if hasattr(p, "get") else None
    if A is None or lora_ids is None:
        return 0.0
    from llm_inference_lab_tpu.models.lora import lora_delta

    return lora_delta(A, p[f"lora_B_{site}"], lora_ids, x)


def _qkv(cfg: ModelConfig, p: Any, x: jax.Array, positions: jax.Array,
         lora_ids) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused QKV projection + rotary. One matmul instead of three — decode
    steps are dominated by per-matmul fixed cost, not FLOPs (HF gpt2's
    Conv1D c_attn is fused the same way; for llama the loader concatenates
    q/k/v projections)."""
    B, S, _ = x.shape
    H, KV, Dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    qkv = dense(x, p["w_qkv"], p.get("b_qkv")) + _lora(p, "qkv", lora_ids, x)
    q = qkv[..., : H * Dh].reshape(B, S, H, Dh)
    k = qkv[..., H * Dh : (H + KV) * Dh].reshape(B, S, KV, Dh)
    v = qkv[..., (H + KV) * Dh :].reshape(B, S, KV, Dh)
    if not cfg.use_learned_pos:  # llama: rotary on q and k
        q = rope(q, positions, cfg.rope_theta, cfg.rope_scaling)
        k = rope(k, positions, cfg.rope_theta, cfg.rope_scaling)
    return q, k, v


def _attn_extras(cfg: ModelConfig, win_on) -> dict:
    g2 = {}
    if cfg.query_pre_attn_scalar is not None:
        g2["scale"] = cfg.query_pre_attn_scalar**-0.5
    if cfg.attn_logit_softcap is not None:
        g2["softcap"] = cfg.attn_logit_softcap
    if win_on is not None:
        g2["window_on"] = win_on
    return g2


def _attn_block_stacked(
    cfg: ModelConfig,
    p: Any,  # one layer's params
    x: jax.Array,  # [B, S, D]
    positions: jax.Array,  # [B, S]
    kst: Tuple[jax.Array, jax.Array, jax.Array, jax.Array],  # FULL stacks
    layer_idx: jax.Array,  # [] int32 — traced layer index
    cache_lens: jax.Array,  # [B]
    tree_mask: Optional[jax.Array] = None,
    page_table: Optional[jax.Array] = None,
    cp: Optional[tuple] = None,
    win_on: Optional[jax.Array] = None,
    lora_ids: Optional[jax.Array] = None,
):
    """Attention with the KV cache carried as FULL stacks: new rows
    scatter in place at `layer_idx` and attention reads a dynamic slice.
    This is the scan-carry form of _attn_block — threading per-layer
    caches through the scan as xs/ys made XLA copy the whole cache every
    step (see base.scatter_stack_layer)."""
    from llm_inference_lab_tpu.models.base import scatter_stack_layer

    B, S, _ = x.shape
    H, Dh = cfg.n_heads, cfg.head_dim
    q, k, v = _qkv(cfg, p, x, positions, lora_ids)

    if cp is not None:
        from llm_inference_lab_tpu.parallel.context import ring_self_attention

        kst = scatter_stack_layer(
            *kst, k, v, cache_lens, layer_idx, ring_len=cfg.kv_ring_len
        )
        attn = ring_self_attention(q, k, v, mesh=cp[0], axis=cp[1])
    elif page_table is not None:
        from llm_inference_lab_tpu.models.paged import scatter_paged_stack

        kst = scatter_paged_stack(
            *kst, k, v, cache_lens, page_table, layer_idx
        )
        kl = tuple(
            jax.lax.dynamic_index_in_dim(t, layer_idx, 0, keepdims=False)
            for t in kst
        )
        attn = get_op("paged_attention")(
            q, kl[0], kl[1], positions, kl[2], kl[3],
            page_table, window=cfg.sliding_window,
            tree_mask=tree_mask,
            chunk_start=cache_lens if tree_mask is not None else None,
            **_attn_extras(cfg, win_on),
        )
    else:
        kst = scatter_stack_layer(
            *kst, k, v, cache_lens, layer_idx, ring_len=cfg.kv_ring_len
        )
        kl = tuple(
            jax.lax.dynamic_index_in_dim(t, layer_idx, 0, keepdims=False)
            for t in kst
        )
        g2 = _attn_extras(cfg, win_on)
        if cfg.kv_ring_len is not None:
            g2["ring_len"] = cfg.kv_ring_len
        attn = get_op("decode_attention")(
            q, kl[0], kl[1], positions, kl[2], kl[3],
            tree_mask, cache_lens if tree_mask is not None else None,
            window=cfg.sliding_window, **g2,
        )
    a_flat = attn.reshape(B, S, H * Dh)
    out = dense(a_flat, p["wo"], p.get("bo")) + _lora(p, "o", lora_ids, a_flat)
    return out, kst


def _attn_block(
    cfg: ModelConfig,
    p: Any,  # one layer's params
    x: jax.Array,  # [B, S, D]
    positions: jax.Array,  # [B, S]
    kv_layer: Tuple[jax.Array, jax.Array, jax.Array, jax.Array],  # one layer's (k, v, k_scale, v_scale)
    cache_lens: jax.Array,  # [B]
    tree_mask: Optional[jax.Array] = None,
    page_table: Optional[jax.Array] = None,  # [B, max_pages] (paged caches)
    cp: Optional[tuple] = None,  # (Mesh, seq-axis name): ring-attention prefill
    win_on: Optional[jax.Array] = None,  # [] bool per-layer window gate (gemma2)
    lora_ids: Optional[jax.Array] = None,  # [B] adapter ids; None = no LoRA
):
    """Per-layer-cache variant (pipeline parallelism's microbatch loop
    slices its own cache rows; the main forward uses _attn_block_stacked)."""
    B, S, _ = x.shape
    H, KV, Dh = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    q, k, v = _qkv(cfg, p, x, positions, lora_ids)

    # Write new KV at absolute positions BEFORE attending (see ops.attention).
    if cp is not None:
        # Context-parallel single-shot prefill: the chunk IS the whole
        # sequence so far (cache_lens == 0), so attention is pure causal
        # self-attention over the chunk — ring attention shards the sequence
        # over the mesh's seq axis and rotates KV blocks via ppermute
        # (parallel/context.py); no [S, T] score tile ever materializes and
        # per-device activations are O(S/n). The KV write still lands in the
        # cache (sequence-sharded on T) for the decode phase that follows.
        from llm_inference_lab_tpu.parallel.context import ring_self_attention

        kv_layer = update_cache_layer(*kv_layer, k, v, cache_lens)
        attn = ring_self_attention(q, k, v, mesh=cp[0], axis=cp[1])
    elif page_table is not None:
        from llm_inference_lab_tpu.models.paged import update_paged_layer

        kv_layer = update_paged_layer(*kv_layer, k, v, cache_lens, page_table)
        g2 = {}
        if cfg.query_pre_attn_scalar is not None:
            g2["scale"] = cfg.query_pre_attn_scalar**-0.5
        if cfg.attn_logit_softcap is not None:
            g2["softcap"] = cfg.attn_logit_softcap
        if win_on is not None:
            g2["window_on"] = win_on
        attn = get_op("paged_attention")(
            q, kv_layer[0], kv_layer[1], positions, kv_layer[2], kv_layer[3],
            page_table, window=cfg.sliding_window,
            tree_mask=tree_mask,
            chunk_start=cache_lens if tree_mask is not None else None,
            **g2,
        )
    else:
        kv_layer = update_cache_layer(
            *kv_layer, k, v, cache_lens, ring_len=cfg.kv_ring_len
        )
        g2 = {}
        if cfg.query_pre_attn_scalar is not None:
            g2["scale"] = cfg.query_pre_attn_scalar**-0.5
        if cfg.attn_logit_softcap is not None:
            g2["softcap"] = cfg.attn_logit_softcap
        if win_on is not None:
            g2["window_on"] = win_on
        if cfg.kv_ring_len is not None:
            g2["ring_len"] = cfg.kv_ring_len
        attn = get_op("decode_attention")(
            q, kv_layer[0], kv_layer[1], positions, kv_layer[2], kv_layer[3],
            tree_mask, cache_lens if tree_mask is not None else None,
            window=cfg.sliding_window, **g2,
        )
    a_flat = attn.reshape(B, S, H * Dh)
    out = dense(a_flat, p["wo"], p.get("bo")) + _lora(p, "o", lora_ids, a_flat)
    return out, kv_layer


def _mlp_block(cfg: ModelConfig, p: Any, x: jax.Array,
               lora_ids: Optional[jax.Array] = None) -> jax.Array:
    if cfg.moe:  # Mixtral: top-k routed gated-MLP experts (ops/moe.py)
        from llm_inference_lab_tpu.ops.moe import moe_dense

        B, S, D = x.shape
        fn = moe_dense if cfg.moe_impl == "dense" else get_op("moe_mlp")
        y = fn(
            x.reshape(B * S, D), p["w_router"], p["w_gate_up"], p["w_down"],
            top_k=cfg.experts_per_token, act=cfg.act,
        )
        return y.reshape(B, S, D)
    if not cfg.gated_mlp:  # gpt2 gelu / opt relu: plain 2-layer mlp
        act = jax.nn.gelu if cfg.act == "gelu" else jax.nn.relu
        h = act(dense(x, p["w_fc"], p.get("b_fc")))
        return dense(h, p["w_proj"], p.get("b_proj"))
    # llama gated silu / gemma GeGLU; gate and up fused into one matmul
    gu = dense(x, p["w_gate_up"]) + _lora(p, "gate_up", lora_ids, x)
    F = gu.shape[-1] // 2
    gate_act = (
        (lambda v: jax.nn.gelu(v, approximate=True))
        if cfg.act == "gelu_tanh"
        else jax.nn.silu
    )
    h = gate_act(gu[..., :F]) * gu[..., F:]
    return dense(h, p["w_down"]) + _lora(p, "down", lora_ids, h)


def forward(
    cfg: ModelConfig,
    params: Any,
    tokens: jax.Array,  # [B, S] int32
    positions: jax.Array,  # [B, S] int32
    cache: Optional[KVCache],
    cache_lens: jax.Array,  # [B] int32
    return_hidden: bool = False,
    tree_mask: Optional[jax.Array] = None,  # [S, S] ancestry (tree spec)
    cp: Optional[tuple] = None,  # (Mesh, axis): context-parallel prefill
    lora_ids: Optional[jax.Array] = None,  # [B] per-slot adapter ids
) -> Tuple[jax.Array, Optional[KVCache]]:
    """Full decoder forward. Returns (logits [B, S, V] float32, updated cache),
    plus the final (post-norm) hidden states [B, S, D] when return_hidden —
    consumed by the Medusa/EAGLE draft heads. With tree_mask, intra-chunk
    attention follows the tree ancestry instead of slot order
    (core/treespec.py). Paged caches (models/paged.py) route the KV write
    and attention through the paged ops; the page table is loop-invariant
    across layers so it rides the closure, not the scan."""
    from llm_inference_lab_tpu.models.paged import PagedKVCache
    from llm_inference_lab_tpu.ops.quant import EmbedQuant, EmbedQuant4

    page_table = cache.table if isinstance(cache, PagedKVCache) else None
    if (
        cfg.attn_logit_softcap is not None
        or cfg.query_pre_attn_scalar is not None
    ) and cp is not None:
        raise NotImplementedError(
            "gemma2 attention (softcap / query_pre_attn_scalar) is "
            "implemented on the contiguous and paged chain-decode paths "
            "(the ring-prefill variant is future work)"
        )
    if cfg.sliding_window is not None and (
        cp is not None or tree_mask is not None
    ):
        # The window mask is implemented on the contiguous and paged
        # chain-decode paths. (With max_seq <= window the mask never binds,
        # so any path is exact; attend_xla's tree branch ignores `window`,
        # so a binding window + tree speculation must refuse, not silently
        # decode globally.)
        max_t = cache.k.shape[-2] * (cache.table.shape[-1] if page_table is not None else 1)
        if max_t > cfg.sliding_window:
            raise NotImplementedError(
                "sliding-window attention with context-parallel / tree "
                "caches longer than the window is not supported"
            )

    embed = params["embed"]
    if isinstance(embed, (EmbedQuant, EmbedQuant4)):
        x = embed.lookup(tokens, cfg.dtype)
    else:
        x = jnp.take(embed, tokens, axis=0).astype(cfg.dtype)
    if cfg.embed_scale:
        # Gemma input normalizer: sqrt(d_model) CAST TO THE COMPUTE DTYPE
        # before multiplying (HF casts the scalar to hidden dtype; matching
        # the rounding matters for byte-parity).
        x = x * jnp.asarray(cfg.d_model**0.5, cfg.dtype)
    if cfg.use_learned_pos:
        pos = positions + cfg.pos_offset if cfg.pos_offset else positions
        x = x + jnp.take(params["pos_embed"], pos, axis=0).astype(cfg.dtype)

    # Gemma2 alternating attention: even layers use the sliding window,
    # odd layers are global. The per-layer gate rides the scan's xs.
    win_flags = (
        jnp.arange(cfg.n_layers) % 2 == 0 if cfg.alt_window else None
    )

    # LoRA ids thread as a closure constant; the adapter pack itself lives
    # inside params["layers"] (lora_A_*/lora_B_*, layer-major) so it rides
    # the scan's xs with zero extra plumbing.
    lids = lora_ids if any(
        k.startswith("lora_") for k in params["layers"]
    ) else None

    # The KV stacks are the scan CARRY, not xs/ys: per-layer ys would make
    # XLA materialize a fresh whole-cache copy every step (measured 2.7 ms
    # at B=16/T=256 for the 3B cache — the dominant batch-scaling cost).
    # Each layer scatters its S new rows in place at its index and
    # attention reads a fusion-friendly dynamic slice.
    #
    # Quantized weight leaves likewise stay OUT of the scanned xs: an xs
    # slice feeding the Pallas dequant kernel is a materialized copy
    # (~50 MB/layer at int4-3B). They ride the closure as full stacks and
    # each layer binds a QuantStackRef(stack, i); the kernel reads blocks
    # via a scalar-prefetched index map (ops/pallas/quant_matmul.py).
    from llm_inference_lab_tpu.ops.quant import QuantStackRef, QuantTensor

    scan_layers = params["layers"]
    qstacks = {
        k: v for k, v in scan_layers.items() if isinstance(v, QuantTensor)
    }
    if qstacks:
        scan_layers = {
            k: v for k, v in scan_layers.items() if k not in qstacks
        }

    def layer(carry, xs):
        x, kst = carry
        if win_flags is not None:
            p, li, win_on = xs
        else:
            (p, li), win_on = xs, None
        if qstacks:
            p = {**p, **{k: QuantStackRef(v, li) for k, v in qstacks.items()}}
        a, kst = _attn_block_stacked(
            cfg, p, _norm(cfg, x, p, "attn_norm"), positions, kst, li,
            cache_lens, tree_mask, page_table, cp, win_on, lids,
        )
        if cfg.post_norms:  # gemma2 sandwich norms (modeling_gemma2)
            a = _norm(cfg, a, p, "post_attn_norm")
        x = x + a
        h = _mlp_block(cfg, x=_norm(cfg, x, p, "mlp_norm"), p=p,
                       lora_ids=lids)
        if cfg.post_norms:
            h = _norm(cfg, h, p, "post_mlp_norm")
        x = x + h
        return (x, kst), None

    unroll = max(1, min(cfg.scan_unroll, cfg.n_layers))
    if cfg.n_layers % unroll:
        unroll = 1
    kv_stack = (cache.k, cache.v, cache.k_scale, cache.v_scale)
    lidx = jnp.arange(cfg.n_layers, dtype=jnp.int32)
    xs = (
        (scan_layers, lidx, win_flags)
        if win_flags is not None
        else (scan_layers, lidx)
    )
    (x, kv_new), _ = jax.lax.scan(layer, (x, kv_stack), xs, unroll=unroll)
    if page_table is not None:
        new_cache = PagedKVCache(*kv_new, table=page_table)
    else:
        new_cache = KVCache(*kv_new)

    if cfg.use_layernorm:
        x = layer_norm(
            x, params["final_norm_scale"], params["final_norm_bias"], cfg.layer_norm_eps
        )
    else:
        x = rms_norm(
            x, params["final_norm_scale"], cfg.rms_norm_eps, cfg.rms_one_offset
        )

    logits = lm_head_logits(cfg, params, x)
    if return_hidden:
        return logits, new_cache, x
    return logits, new_cache


def lm_head_logits(cfg: ModelConfig, params: Any, x: jax.Array) -> jax.Array:
    """Project hidden states [.., D] to vocab logits (shared with the
    Medusa/EAGLE heads)."""
    from llm_inference_lab_tpu.ops.quant import EmbedQuant, EmbedQuant4

    head = None
    if cfg.tie_word_embeddings:
        embed = params["embed"]
        if isinstance(embed, (EmbedQuant, EmbedQuant4)):
            logits = embed.head_logits(x)
        else:
            head = embed.T
    else:
        head = params["lm_head"]
    if head is not None:
        if isinstance(head, jax.Array):
            logits = jnp.dot(
                x, head.astype(x.dtype), preferred_element_type=jnp.float32
            )
        else:  # QuantTensor lm_head
            logits = dense(x, head)
    logits = logits.astype(jnp.float32)
    if cfg.final_logit_softcap is not None:  # gemma2
        cap = cfg.final_logit_softcap
        logits = jnp.tanh(logits / cap) * cap
    return logits


def init_params_quantized(cfg: ModelConfig, rng: jax.Array, mode: str = "int8",
                          quantize_embed: bool = False) -> Any:
    """Random init DIRECTLY in quantized form — for benchmarking models whose
    bf16 params would not fit HBM during init (e.g. Llama-3.1-8B int4 on a
    16 GB chip). Weight distributions match init_params' N(0, 0.02²) after
    dequantization."""
    from llm_inference_lab_tpu.ops.quant import EmbedQuant, QuantTensor

    params = init_params(
        dataclasses_replace_dtype(cfg, jnp.bfloat16), rng, skip_big=True
    )

    def rand_bytes(key, shape):
        # random.bits in uint8 avoids the int32 temporaries that
        # random.randint materializes (an 8B gate_up stack would need a
        # ~15 GB int32 scratch — instant OOM on a 16 GB chip).
        return jax.lax.convert_element_type(
            jax.random.bits(key, shape, dtype=jnp.uint8), jnp.int8
        )

    def rand_qt(key, d_in, d_out, layers=None):
        shape = (d_in // (2 if mode == "int4" else 1), d_out)
        maxq_eff = 127 if mode == "int8" else 7
        if layers is not None:
            # Generate per layer to bound temporary memory.
            keys_l = jax.random.split(key, layers)
            data = jnp.stack([rand_bytes(keys_l[i], shape) for i in range(layers)])
        else:
            data = rand_bytes(key, shape)
        scale_shape = (layers, d_out) if layers is not None else (d_out,)
        scale = jnp.full(scale_shape, 0.02 / maxq_eff, jnp.float32)
        bits = 4 if mode == "int4" else 8
        return QuantTensor(data, scale, bits=bits)

    keys = iter(jax.random.split(jax.random.fold_in(rng, 1), 16))
    D, F, H, KV, Dh, L = (cfg.d_model, cfg.d_ff, cfg.n_heads, cfg.n_kv_heads,
                          cfg.head_dim, cfg.n_layers)
    params["layers"]["w_qkv"] = rand_qt(next(keys), D, (H + 2 * KV) * Dh, L)
    params["layers"]["wo"] = rand_qt(next(keys), H * Dh, D, L)
    if not cfg.gated_mlp:
        params["layers"]["w_fc"] = rand_qt(next(keys), D, F, L)
        params["layers"]["w_proj"] = rand_qt(next(keys), F, D, L)
    else:
        params["layers"]["w_gate_up"] = rand_qt(next(keys), D, 2 * F, L)
        params["layers"]["w_down"] = rand_qt(next(keys), F, D, L)
    if quantize_embed:
        # quantize_embed carries the bit width: True/8 -> int8 EmbedQuant,
        # 4 -> int4 head-layout EmbedQuant4 (opt-in, EngineConfig.embed_bits).
        if quantize_embed == 4:
            from llm_inference_lab_tpu.ops.quant import (
                EmbedQuant4,
                repack_int4_rows,
            )

            e4 = rand_bytes(next(keys), (D // 2, cfg.vocab_size))
            params["embed"] = EmbedQuant4(
                QuantTensor(
                    e4,
                    jnp.full((cfg.vocab_size,), 0.02 / 7, jnp.float32),
                    bits=4,
                ),
                repack_int4_rows(e4),
            )
        else:
            eq = rand_bytes(next(keys), (cfg.vocab_size, D))
            params["embed"] = EmbedQuant(
                eq, jnp.full((cfg.vocab_size,), 0.02 / 127, jnp.float32)
            )
        if not cfg.tie_word_embeddings:
            params["lm_head"] = rand_qt(next(keys), D, cfg.vocab_size)
    elif not cfg.tie_word_embeddings:
        params["lm_head"] = rand_qt(next(keys), D, cfg.vocab_size)
    return params


def dataclasses_replace_dtype(cfg: ModelConfig, dtype):
    import dataclasses

    return dataclasses.replace(cfg, dtype=dtype)


def init_params(cfg: ModelConfig, rng: jax.Array, skip_big: bool = False) -> Any:
    """Random init with correct shapes/dtypes (benchmarking + tests; real
    checkpoints come from models.loader). skip_big: leave the large matmul
    weights out (init_params_quantized replaces them)."""
    keys = iter(jax.random.split(rng, 32))
    D, F, H, KV, Dh, L = (
        cfg.d_model,
        cfg.d_ff,
        cfg.n_heads,
        cfg.n_kv_heads,
        cfg.head_dim,
        cfg.n_layers,
    )
    dt = cfg.dtype
    # Generate directly in the target dtype: f32 intermediates for a
    # multi-GB model would double peak HBM during init.
    init = lambda k, shape, s=0.02: jax.random.normal(k, shape, dt) * jnp.asarray(s, dt)

    # Gemma stores RMSNorm weights as (w - 1): identity init is zeros.
    norm_one = jnp.zeros if cfg.rms_one_offset else jnp.ones
    layers = {
        "attn_norm_scale": norm_one((L, D), dt),
        "mlp_norm_scale": norm_one((L, D), dt),
    }
    if cfg.post_norms:  # gemma2 sandwich norms
        layers["post_attn_norm_scale"] = norm_one((L, D), dt)
        layers["post_mlp_norm_scale"] = norm_one((L, D), dt)
    if not skip_big:
        layers.update(
            w_qkv=init(next(keys), (L, D, (H + 2 * KV) * Dh)),
            wo=init(next(keys), (L, H * Dh, D)),
        )
    if cfg.use_layernorm:  # gpt2 / opt: LayerNorm biases + projection biases
        layers.update(
            attn_norm_bias=jnp.zeros((L, D), dt),
            mlp_norm_bias=jnp.zeros((L, D), dt),
            b_qkv=jnp.zeros((L, (H + 2 * KV) * Dh), dt),
            bo=jnp.zeros((L, D), dt),
            b_fc=jnp.zeros((L, F), dt),
            b_proj=jnp.zeros((L, D), dt),
        )
    elif cfg.qkv_bias:  # qwen2: bias on the fused qkv projection only
        layers["b_qkv"] = jnp.zeros((L, (H + 2 * KV) * Dh), dt)
    if not skip_big:
        if cfg.moe:  # Mixtral: router + expert-stacked gated MLPs
            E = cfg.n_experts
            layers.update(
                w_router=init(next(keys), (L, D, E)),
                w_gate_up=init(next(keys), (L, E, D, 2 * F)),
                w_down=init(next(keys), (L, E, F, D)),
            )
        elif cfg.gated_mlp:
            layers.update(
                w_gate_up=init(next(keys), (L, D, 2 * F)),
                w_down=init(next(keys), (L, F, D)),
            )
        else:
            layers.update(
                w_fc=init(next(keys), (L, D, F)),
                w_proj=init(next(keys), (L, F, D)),
            )

    params = {
        "embed": init(next(keys), (cfg.vocab_size, D)),
        "layers": layers,
        "final_norm_scale": norm_one((D,), dt),
    }
    if cfg.use_learned_pos:
        params["pos_embed"] = init(
            next(keys), (cfg.max_position_embeddings + cfg.pos_offset, D)
        )
    if cfg.use_layernorm:
        params["final_norm_bias"] = jnp.zeros((D,), dt)
    if not cfg.tie_word_embeddings and not skip_big:
        params["lm_head"] = init(next(keys), (D, cfg.vocab_size))
    return params
