"""Sharding rules: param/state leaf path -> PartitionSpec.

Megatron-style tensor parallelism expressed declaratively; GSPMD inserts the
collectives (all-gather for column-parallel inputs, reduce-scatter/psum after
row-parallel projections) and the XLA latency-hiding scheduler overlaps them
with compute — the "overlapped collectives" capability of BASELINE.json.

Layout (stacked-layer leaves have a leading layer axis, spec gets a None):
  w_qkv      [L, D, (H+2KV)*dh] -> (None, None, 'model')   column parallel
  wo         [L, H*dh, D]       -> (None, 'model', None)   row parallel
  w_gate_up  [L, D, 2F]         -> (None, None, 'model')
  w_down     [L, F, D]          -> (None, 'model', None)
  embed      [V, D]             -> ('model', None)         vocab parallel
  lm_head    [D, V]             -> (None, 'model')
  norms / biases                -> replicated
  KV cache   [L, B, KVH, T, dh] -> (None, 'data', 'model', None, None)
  tokens/lengths/active         -> ('data',) on the batch axis
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llm_inference_lab_tpu.core.state import DecodeState
from llm_inference_lab_tpu.models.base import KVCache
from llm_inference_lab_tpu.ops.quant import QuantTensor

# last param-tree key -> spec WITHOUT the stacked-layer axis. Applied to the
# trailing dims; leading extra dims (layer stack) are padded with None.
PARAM_RULES = {
    "w_qkv": P(None, "model"),
    "wo": P("model", None),
    "w_gate_up": P(None, "model"),
    "w_fc": P(None, "model"),
    "w_down": P("model", None),
    "w_proj": P("model", None),
    "b_qkv": P("model"),
    "b_fc": P("model"),
    "bo": P(),
    "b_proj": P(),
    "pos_embed": P(),
    "embed": P("model", None),
    "lm_head": P(None, "model"),
}

_LAST_KEY = re.compile(r"\['?([^'\[\]]+)'?\]$")


def _spec_for(path: str, ndim: int, stage: bool = False,
              expert: bool = False) -> P:
    """`path` is a jax.tree_util.keystr string like "['layers']['wq']".
    stage: shard the leading stacked-layer axis over the pipeline "stage"
    mesh axis (parallel/pipeline.py) — applies to ['layers'] leaves only.
    expert: shard the expert-stack axis (dim 1 of [L, E, ...] MoE leaves —
    the only layer leaves padded by >= 2) over the "expert" mesh axis."""
    m = _LAST_KEY.search(path)
    spec = PARAM_RULES.get(m.group(1)) if m else None
    is_layer_leaf = "['layers']" in path
    if spec is None:
        if stage and is_layer_leaf and ndim >= 1:
            return P("stage", *([None] * (ndim - 1)))
        return P()  # replicate (norms, scalars, unknown leaves)
    pad = ndim - len(spec)
    if pad < 0:  # scale vectors etc. — keep the trailing dims of the spec
        return P(*spec[-ndim:])
    lead = ["stage"] if stage and is_layer_leaf and pad >= 1 else [None]
    if expert and is_layer_leaf and pad >= 2:
        lead = lead[:1] + ["expert"]
    lead = lead[:pad]
    return P(*lead, *([None] * (pad - len(lead))), *spec)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """device_put every leaf with its rule-derived NamedSharding.
    QuantTensor leaves: data shards like the logical weight; per-out-channel
    scales shard on the output dim."""

    stage = "stage" in mesh.axis_names
    expert = "expert" in mesh.axis_names

    def place(path, leaf):
        from llm_inference_lab_tpu.ops.quant import EmbedQuant, EmbedQuant4

        name = jax.tree_util.keystr(path)
        if isinstance(leaf, EmbedQuant):
            return EmbedQuant(
                jax.device_put(leaf.q, NamedSharding(mesh, P("model", None))),
                jax.device_put(leaf.scale, NamedSharding(mesh, P("model"))),
            )
        if isinstance(leaf, EmbedQuant4):
            # Vocab shards on "model" everywhere it appears: axis 1 of the
            # head layout, axis 0 of the row-lookup layout, the scale —
            # mirroring EmbedQuant's vocab-row sharding.
            return EmbedQuant4(
                QuantTensor(
                    jax.device_put(
                        leaf.qt.data, NamedSharding(mesh, P(None, "model"))
                    ),
                    jax.device_put(
                        leaf.qt.scale, NamedSharding(mesh, P("model"))
                    ),
                    bits=4,
                ),
                jax.device_put(
                    leaf.rq, NamedSharding(mesh, P("model", None))
                ),
            )
        if isinstance(leaf, QuantTensor):
            dspec = _spec_for(name, leaf.data.ndim, stage, expert)
            out_axis = dspec[-1] if len(dspec) else None
            lead = ["stage"] if stage and dspec and dspec[0] == "stage" else []
            sspec = P(*lead,
                      *([None] * (leaf.scale.ndim - 1 - len(lead))), out_axis)
            return QuantTensor(
                jax.device_put(leaf.data, NamedSharding(mesh, dspec)),
                jax.device_put(leaf.scale, NamedSharding(mesh, sspec)),
                bits=leaf.bits,
            )
        return jax.device_put(
            leaf, NamedSharding(mesh, _spec_for(name, leaf.ndim, stage, expert))
        )

    from llm_inference_lab_tpu.ops.quant import EmbedQuant as _EQ
    from llm_inference_lab_tpu.ops.quant import EmbedQuant4 as _EQ4

    return jax.tree_util.tree_map_with_path(
        place, params,
        is_leaf=lambda x: isinstance(x, (QuantTensor, _EQ, _EQ4)),
    )


def _cache_sharding(mesh: Mesh, shape, paged: bool = False) -> NamedSharding:
    # [L, B, n_kv, T, d]: batch on data, kv heads on model; with a seq axis
    # in the mesh (context parallelism) the T dim shards over it, so the
    # long-context KV footprint is O(T/n_seq) per device. Axes whose dim
    # doesn't divide (e.g. the [1,B,1,1,1] placeholder draft cache in
    # medusa/baseline modes) replicate instead. Paged pools
    # [L, n_pages, KVH, page, d] share pages across all slots, so only the
    # head axis shards (on model); the page axis never maps to data.
    seq_ax = "seq" if "seq" in mesh.axis_names else None
    stage_ax = "stage" if "stage" in mesh.axis_names else None
    if paged:
        axes = [None, None, "model", None, None][: len(shape)]
    else:
        axes = [stage_ax, "data", "model", seq_ax, None][: len(shape)]
    axes = [
        a if a and shape[i] % mesh.shape[a] == 0 else None
        for i, a in enumerate(axes)
    ]
    return NamedSharding(mesh, P(*axes))


def shard_state(state: DecodeState, mesh: Mesh) -> DecodeState:
    batch = NamedSharding(mesh, P("data"))
    batch2 = NamedSharding(mesh, P("data", None))
    rep = NamedSharding(mesh, P())

    def place_cache(c: KVCache) -> KVCache:
        from llm_inference_lab_tpu.models.paged import PagedKVCache

        paged = isinstance(c, PagedKVCache)
        parts = (
            jax.device_put(c.k, _cache_sharding(mesh, c.k.shape, paged)),
            jax.device_put(c.v, _cache_sharding(mesh, c.v.shape, paged)),
            jax.device_put(c.k_scale, _cache_sharding(mesh, c.k_scale.shape, paged)),
            jax.device_put(c.v_scale, _cache_sharding(mesh, c.v_scale.shape, paged)),
        )
        if paged:
            # The page table is tiny per-slot metadata — replicated.
            return PagedKVCache(*parts, jax.device_put(c.table, rep))
        return KVCache(*parts)

    return DecodeState(
        tokens=jax.device_put(state.tokens, batch2),
        lengths=jax.device_put(state.lengths, batch),
        prompt_lens=jax.device_put(state.prompt_lens, batch),
        max_new=jax.device_put(state.max_new, batch),
        active=jax.device_put(state.active, batch),
        target_cache=place_cache(state.target_cache),
        draft_cache=place_cache(state.draft_cache),
        rng=jax.device_put(state.rng, rep),
        proposed=jax.device_put(state.proposed, batch),
        accepted=jax.device_put(state.accepted, batch),
        bonus=jax.device_put(state.bonus, batch),
        steps=jax.device_put(state.steps, rep),
        last_hidden=jax.device_put(state.last_hidden, batch2),
        prev_hidden=jax.device_put(state.prev_hidden, batch2),
        # Per-slot controller state ([B]) shards with the batch axis; the
        # draft loop bound is a cross-shard max (one tiny all-reduce XLA
        # inserts automatically).
        ctrl_k=jax.device_put(state.ctrl_k, batch),
        acc_ema=jax.device_put(state.acc_ema, batch),
        temperature=jax.device_put(state.temperature, batch),
        top_k=jax.device_put(state.top_k, batch),
        top_p=jax.device_put(state.top_p, batch),
        min_p=jax.device_put(state.min_p, batch),
        lora_ids=jax.device_put(state.lora_ids, batch),
        fsm_lex=jax.device_put(state.fsm_lex, batch),
        fsm_stack=jax.device_put(state.fsm_stack, batch2),
        fsm_sp=jax.device_put(state.fsm_sp, batch),
        slot_rng=jax.device_put(state.slot_rng, batch2),
        rep_penalty=jax.device_put(state.rep_penalty, batch),
        presence_penalty=jax.device_put(state.presence_penalty, batch),
        freq_penalty=jax.device_put(state.freq_penalty, batch),
        bias_ids=jax.device_put(state.bias_ids, batch2),
        bias_vals=jax.device_put(state.bias_vals, batch2),
        token_logprobs=jax.device_put(state.token_logprobs, batch2),
        top_ids=jax.device_put(
            state.top_ids, NamedSharding(mesh, P("data", None, None))
        ),
        top_lps=jax.device_put(
            state.top_lps, NamedSharding(mesh, P("data", None, None))
        ),
    )
