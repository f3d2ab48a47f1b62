"""Pipeline parallelism: layer stages over a "stage" mesh axis.

The reference plans "tensor and pipeline parallelism" as Phase 4C
(/root/reference/README.md:393-395) but implements neither; this is the
green-field PP half (TP is parallel/sharding.py).

TPU-first design — GPipe-style microbatch pipelining expressed as a
`shard_map` over the stage axis:

  - The stacked-layer params [L, ...] and KV cache [L, B, ...] shard on
    the LAYER axis: stage s holds layers [s*L/S, (s+1)*L/S) — per-device
    parameter and cache memory is O(L/S), which is the reason PP exists
    (models whose weights don't fit one chip / one TP group).
  - The batch splits into M microbatches. A `lax.scan` over M+S-1 ticks
    runs the classic pipeline schedule: at tick t, stage s processes
    microbatch (t-s); activations hop stage->stage+1 via `ppermute`
    (ICI neighbor hops — the cheapest collective there is). Fill/drain
    bubble is the usual (S-1)/(M+S-1); M defaults to the local batch so
    the bubble shrinks as batch grows.
  - Embedding and lm_head stay outside the stage loop (they are the
    first/last "stage 0 / stage S-1" work), so they keep whatever GSPMD
    sharding the mesh gives them.
  - PP composes with DP (batch axis) and with TP: the shard_map is
    PARTIAL-manual — only "stage" (and "data") are manual axes; the
    "model" axis stays in GSPMD auto mode inside the stage body, so the
    per-layer matmuls keep their Megatron shardings and XLA inserts the
    TP collectives exactly as in the non-PP path. No hand-written
    reduce-scatters, no permuted fused-weight layouts.

Everything is one compiled program: no host round-trips between stages,
no send/recv runtime — XLA sees the whole schedule and overlaps the
ppermute with the next tick's compute.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from llm_inference_lab_tpu.models.base import KVCache, ModelConfig
from llm_inference_lab_tpu.models.transformer import (
    _attn_block,
    _mlp_block,
    _norm,
    layer_norm,
    lm_head_logits,
    rms_norm,
)

from jax import shard_map


def _pick_microbatches(batch_local: int, n_stages: int,
                       requested: Optional[int]) -> int:
    """Largest divisor of the local batch <= requested (default: the local
    batch itself — microbatch size 1 minimizes the pipeline bubble; each
    tick is small but there are only M+S-1 of them either way)."""
    m = min(requested or batch_local, batch_local)
    while batch_local % m:
        m -= 1
    return max(m, 1)


def forward_pp(
    cfg: ModelConfig,
    mesh: Mesh,
    params: Any,
    tokens: jax.Array,  # [B, S] int32
    positions: jax.Array,  # [B, S] int32
    cache: KVCache,
    cache_lens: jax.Array,  # [B] int32
    return_hidden: bool = False,
    tree_mask: Optional[jax.Array] = None,
    cp: Optional[tuple] = None,
    microbatches: Optional[int] = None,
    lora_ids: Optional[jax.Array] = None,  # protocol parity; PP+LoRA is
    # unsupported (the adapter pack would need stage-sharding plumbing)
) -> Tuple[jax.Array, KVCache]:
    """Drop-in replacement for transformer.forward when the mesh has a
    "stage" axis. Same contract: (logits [B,S,V] f32, updated cache[, hidden]).

    Scope: contiguous KV cache (no paging) and no ring-attention prefill
    (cp) — both guarded explicitly. DP and TP compose (see module doc)."""
    from llm_inference_lab_tpu.models.paged import PagedKVCache
    from llm_inference_lab_tpu.ops.quant import EmbedQuant, EmbedQuant4

    if cp is not None:
        raise NotImplementedError("ring-attention prefill under pipeline "
                                  "parallelism is not supported")
    if tree_mask is not None:
        raise NotImplementedError("tree speculation under pipeline "
                                  "parallelism is not supported")
    if isinstance(cache, PagedKVCache):
        raise NotImplementedError("paged KV under pipeline parallelism is "
                                  "not supported")
    n_stages = mesh.shape["stage"]
    if cfg.n_layers % n_stages:
        raise ValueError(
            f"n_layers={cfg.n_layers} not divisible by {n_stages} stages"
        )
    data_ax = "data" if "data" in mesh.axis_names else None

    # ---- embedding (replicated over stage; batch-sharded over data) ----
    embed = params["embed"]
    if isinstance(embed, (EmbedQuant, EmbedQuant4)):
        x = embed.lookup(tokens, cfg.dtype)
    else:
        x = jnp.take(embed, tokens, axis=0).astype(cfg.dtype)
    if cfg.use_learned_pos:
        pos = positions + cfg.pos_offset if cfg.pos_offset else positions
        x = x + jnp.take(params["pos_embed"], pos, axis=0).astype(cfg.dtype)

    kv_tuple = (cache.k, cache.v, cache.k_scale, cache.v_scale)

    def spec_layers(leaf):
        return P("stage", *([None] * (jnp.ndim(leaf) - 1)))

    def spec_kv(leaf):
        return P("stage", data_ax, *([None] * (jnp.ndim(leaf) - 2)))

    layers_p = params["layers"]
    in_specs = (
        jax.tree.map(spec_layers, layers_p),
        jax.tree.map(spec_kv, kv_tuple),
        P(data_ax, None, None),  # x
        P(data_ax, None),  # positions
        P(data_ax),  # cache_lens
    )
    out_specs = (
        P(data_ax, None, None),  # final hidden
        jax.tree.map(spec_kv, kv_tuple),
    )

    def stage_fn(lp, kv, x_loc, pos_loc, cl_loc):
        sid = jax.lax.axis_index("stage")
        Bl, S, D = x_loc.shape
        M = _pick_microbatches(Bl, n_stages, microbatches)
        mb = Bl // M
        ticks = M + n_stages - 1

        def one_tick(carry, t):
            cur, kv, out_buf = carry
            mb_idx = t - sid  # my microbatch this tick
            active = (mb_idx >= 0) & (mb_idx < M)
            row = jnp.clip(mb_idx, 0, M - 1) * mb
            # Stage 0 feeds from the embedded input; later stages consume
            # the activation ppermuted in at the end of the previous tick.
            inp = jnp.where(
                sid == 0,
                jax.lax.dynamic_slice_in_dim(x_loc, row, mb, 0),
                cur,
            )
            pos_mb = jax.lax.dynamic_slice_in_dim(pos_loc, row, mb, 0)
            cl_mb = jax.lax.dynamic_slice_in_dim(cl_loc, row, mb, 0)

            def layer(h, xs):
                p, kv_l = xs  # kv_l leaves: [Bl, KV, T, d] / scales
                kv_mb = tuple(
                    jax.lax.dynamic_slice_in_dim(z, row, mb, 0) for z in kv_l
                )
                a, kv_mb_new = _attn_block(
                    cfg, p, _norm(cfg, h, p, "attn_norm"), pos_mb, kv_mb,
                    cl_mb, tree_mask,
                )
                h = h + a
                h = h + _mlp_block(cfg, p, _norm(cfg, h, p, "mlp_norm"))
                # Inactive (fill/drain) ticks compute on garbage rows —
                # keep the old KV so the discard is total.
                kv_l = tuple(
                    jax.lax.dynamic_update_slice_in_dim(
                        z, jnp.where(active, zn, zo), row, 0
                    )
                    for z, zn, zo in zip(kv_l, kv_mb_new, kv_mb)
                )
                return h, kv_l

            h, kv = jax.lax.scan(layer, inp, (lp, kv))

            # Last stage banks the finished microbatch.
            cur_rows = jax.lax.dynamic_slice_in_dim(out_buf, row, mb, 0)
            out_buf = jax.lax.dynamic_update_slice_in_dim(
                out_buf,
                jnp.where(active & (sid == n_stages - 1), h, cur_rows),
                row,
                0,
            )
            # Hand the activation to the next stage (ring hop; the wrap
            # last->0 carries garbage that stage 0 never reads).
            nxt = jax.lax.ppermute(
                h, "stage",
                [(i, (i + 1) % n_stages) for i in range(n_stages)],
            )
            return (nxt, kv, out_buf), None

        init = (
            jnp.zeros((mb, S, D), x_loc.dtype),
            kv,
            jnp.zeros_like(x_loc),
        )
        (cur, kv, out_buf), _ = jax.lax.scan(
            one_tick, init, jnp.arange(ticks, dtype=jnp.int32)
        )
        # Only the last stage's buffer is real; psum replicates it.
        out = jax.lax.psum(
            jnp.where(sid == n_stages - 1, out_buf, jnp.zeros_like(out_buf)),
            "stage",
        )
        return out, kv

    # Partial-manual: only stage/data are manual collectives axes; "model"
    # (tensor parallelism) stays under GSPMD inside the body, so per-layer
    # matmuls keep their Megatron shardings with XLA-inserted collectives.
    manual = frozenset(a for a in ("stage", "data") if a in mesh.axis_names)
    x, kv_new = shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        axis_names=manual,
        check_vma=False,
    )(layers_p, kv_tuple, x, positions, cache_lens)

    new_cache = KVCache(*kv_new)
    if cfg.use_layernorm:
        x = layer_norm(
            x, params["final_norm_scale"], params["final_norm_bias"],
            cfg.layer_norm_eps,
        )
    else:
        x = rms_norm(x, params["final_norm_scale"], cfg.rms_norm_eps)
    logits = lm_head_logits(cfg, params, x)
    if return_hidden:
        return logits, new_cache, x
    return logits, new_cache
