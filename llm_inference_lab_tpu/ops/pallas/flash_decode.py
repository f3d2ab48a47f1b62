"""Flash decode attention over the length-masked KV cache — Pallas kernel.

Streams KV tiles HBM->VMEM with online-softmax accumulation (flash style), so
attention memory traffic is O(T·D) HBM reads with no [S, T] score
materialization in HBM. Replaces (at pallas priority) the XLA reference in
ops/attention.py for long contexts; contract is identical:

    attend(q[B,S,H,D], k[B,KVH,T,D], v[B,KVH,T,D], positions[B,S]) -> [B,S,H,D]

Grid: (B, KV heads, T tiles); the (m, l, acc) online-softmax state lives in
VMEM scratch across the T sweep. GQA: the `group` query heads sharing a KV
head are flattened into the row axis of one MXU matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_inference_lab_tpu.ops.registry import PRIORITY_PALLAS, registry

NEG_INF = -1e30


def _init_state(m_ref, l_ref, acc_ref):
    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)


def _finalize(o_ref, m_ref, l_ref, acc_ref):
    S, group, D = o_ref.shape[1], o_ref.shape[2], o_ref.shape[3]
    out = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
    o_ref[0] = out.reshape(S, group, D).astype(o_ref.dtype)


def _accum_tile(pos_ref, q_ref, k, v, kv_scale, m_ref, l_ref, acc_ref, kv_base,
                scale=None, softcap=None, window=None, ring_len=None):
    """Online-softmax accumulation of one KV tile whose first row sits at
    absolute position `kv_base`. k/v: [BT, D] (any dtype the MXU takes after
    cast); kv_scale: None for fp caches, else a pair of [1, BT] per-row int8
    scales — k's scales multiply score COLUMNS and v's scales multiply p's
    columns, so dequantization never touches the [BT, D] tiles.

    Static extras (compiled in, matching ops/attention.py attend_xla):
    `scale` overrides the default D**-0.5 score scale (gemma2
    query_pre_attn_scalar); `softcap` applies cap*tanh(s/cap) AFTER the int8
    column dequant (both are linear, so ordering vs kv_scale is exact) and
    BEFORE masking; `window` adds the sliding lower bound kv_pos > p - window
    (Mistral / gemma2 local layers)."""
    BT = k.shape[0]
    S, group, D = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    Sg = S * group
    q = q_ref[0].reshape(Sg, D)  # [S*group, D]

    sc = (1.0 / (D**0.5)) if scale is None else scale
    scores = (
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * sc
    )  # [Sg, BT]
    if kv_scale is not None:
        scores = scores * kv_scale[0]  # [1, BT] broadcast over rows
    if softcap is not None:
        scores = jnp.tanh(scores / softcap) * softcap

    kv_pos = kv_base + jax.lax.broadcasted_iota(jnp.int32, (S, group, BT), 2)
    # pos_ref block: (1, S, 1) -> [0] is [S, 1]; broadcast over (group, BT).
    p_q = pos_ref[0][:, :, None]  # [S, 1, 1]
    if ring_len is not None:
        # Rolling-buffer cache: kv_pos is the SLOT index; slot s holds the
        # latest position <= p congruent to s mod R (ops/attention.py ring
        # rule). Valid iff inside the window and non-negative.
        rel = jnp.mod(p_q - kv_pos, ring_len)
        allowed = (rel < window) & (rel <= p_q)
    else:
        allowed = kv_pos <= p_q  # [S, group, BT]
        if window is not None:
            allowed &= kv_pos > p_q - window
    scores = jnp.where(allowed.reshape(Sg, BT), scores, NEG_INF)

    m_prev = m_ref[:]  # [Sg, 1]
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
    p = jnp.exp(scores - m_new)  # [Sg, BT]
    alpha = jnp.exp(m_prev - m_new)  # [Sg, 1]
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    if kv_scale is not None:
        p = p * kv_scale[1]  # [1, BT]
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new


def _attend_tile(pos_ref, q_ref, k, v, kv_scale, o_ref, m_ref, l_ref, acc_ref,
                 scale=None, softcap=None, window=None, ring_len=None):
    """Decode-grid tile body: the T sweep is grid axis 2 (shared with
    paged_flash.py, whose page sweep is also axis 2)."""
    t = pl.program_id(2)
    BT = k.shape[0]

    @pl.when(t == 0)
    def _():
        _init_state(m_ref, l_ref, acc_ref)

    _accum_tile(pos_ref, q_ref, k, v, kv_scale, m_ref, l_ref, acc_ref, t * BT,
                scale=scale, softcap=softcap, window=window,
                ring_len=ring_len)

    @pl.when(t == pl.num_programs(2) - 1)
    def _():
        _finalize(o_ref, m_ref, l_ref, acc_ref)


def _kernel(pos_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
            scale=None, softcap=None, window=None, ring_len=None):
    _attend_tile(
        pos_ref, q_ref, k_ref[0].astype(q_ref.dtype), v_ref[0], None,
        o_ref, m_ref, l_ref, acc_ref, scale=scale, softcap=softcap,
        window=window, ring_len=ring_len,
    )


def _kernel_quant(pos_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                  o_ref, m_ref, l_ref, acc_ref,
                  scale=None, softcap=None, window=None, ring_len=None):
    dt = q_ref.dtype
    _attend_tile(
        pos_ref, q_ref, k_ref[0].astype(dt), v_ref[0].astype(dt),
        (ks_ref[0], vs_ref[0]), o_ref, m_ref, l_ref, acc_ref,  # [1, BT] scales
        scale=scale, softcap=softcap, window=window, ring_len=ring_len,
    )


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "block_t", "scale", "softcap", "window",
                     "ring_len"),
)
def flash_decode_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    positions: jax.Array,
    k_scale: jax.Array = None,
    v_scale: jax.Array = None,
    interpret: bool = False,
    block_t: int = 256,
    scale: float = None,
    softcap: float = None,
    window: int = None,
    ring_len: int = None,
) -> jax.Array:
    B, S, H, D = q.shape
    KVH, T = k_cache.shape[1], k_cache.shape[2]
    group = H // KVH
    BT = min(block_t, T)
    assert T % BT == 0, f"T={T} not divisible by BT={BT}"
    quantized = k_cache.dtype == jnp.int8

    qg = q.reshape(B, S, KVH, group, D)
    grid = (B, KVH, T // BT)
    # Mosaic block-mapping rule: the trailing two block dims must be
    # tile-divisible or span the whole array dim — hence the singleton
    # reshapes on positions/scales below.
    pos3 = positions.astype(jnp.int32)[:, :, None]  # [B, S, 1]
    pos_spec = pl.BlockSpec(
        (1, S, 1), lambda b, h, t: (b, 0, 0), memory_space=pltpu.VMEM
    )
    q_spec = pl.BlockSpec(
        (1, S, None, group, D), lambda b, h, t: (b, 0, h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    kv_spec = pl.BlockSpec(
        (1, None, BT, D), lambda b, h, t: (b, h, t, 0), memory_space=pltpu.VMEM
    )
    scale_spec = pl.BlockSpec(
        (1, None, 1, BT), lambda b, h, t: (b, h, 0, t), memory_space=pltpu.VMEM
    )
    common = dict(
        grid=grid,
        out_specs=pl.BlockSpec(
            (1, S, None, group, D), lambda b, h, t: (b, 0, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, S, KVH, group, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((S * group, 1), jnp.float32),
            pltpu.VMEM((S * group, 1), jnp.float32),
            pltpu.VMEM((S * group, D), jnp.float32),
        ],
        interpret=interpret,
    )
    extras = dict(scale=scale, softcap=softcap, window=window,
                  ring_len=ring_len)
    if quantized:
        out = pl.pallas_call(
            functools.partial(_kernel_quant, **extras),
            in_specs=[pos_spec, q_spec, kv_spec, kv_spec, scale_spec, scale_spec],
            **common,
        )(
            pos3, qg, k_cache, v_cache,
            k_scale.astype(jnp.float32)[:, :, None, :],  # [B, KVH, 1, T]
            v_scale.astype(jnp.float32)[:, :, None, :],
        )
    else:
        out = pl.pallas_call(
            functools.partial(_kernel, **extras),
            in_specs=[pos_spec, q_spec, kv_spec, kv_spec],
            **common,
        )(pos3, qg, k_cache, v_cache)
    return out.reshape(B, S, H, D)


def _kernel_wrapper(q, k_cache, v_cache, positions, k_scale=None, v_scale=None,
                    tree_mask=None, chunk_start=None, window=None,
                    window_on=None, scale=None, softcap=None, ring_len=None):
    from llm_inference_lab_tpu.ops.pallas import interpret_mode, use_pallas

    T = k_cache.shape[2]
    # Sliding window can only bind when the cache is longer than the window
    # (kv_pos > p - window is vacuous for p < window <= T); dropping a
    # non-binding window also makes window_on irrelevant. A ring cache
    # keeps the window unconditionally (the mask is modular arithmetic).
    eff_window = window if (
        window is not None and (T > window or ring_len is not None)
    ) else None
    if ring_len is not None and eff_window is None:
        ring_len = None  # window can't bind: plain positional mask is exact
    S, D = q.shape[1], q.shape[-1]
    group = q.shape[2] // k_cache.shape[1]
    quantized = k_cache.dtype == jnp.int8
    ok = (
        tree_mask is None and T % 128 == 0 and D % 128 == 0 and use_pallas()
        # Ring prefill chunks (S > 32) fall back to XLA: flash_prefill has
        # no modular mask (chunks are compute-bound; decode is the win).
        and (ring_len is None or S <= 32)
        # Measured on v5e with the scan-carry cache (slope timing,
        # docs/results/serving/batch_scaling_r3_carry.json): for bf16
        # caches at decode shapes, XLA's fused mask/softmax einsum beats
        # the kernel at every batch — the kernel pays a materialized
        # dynamic-slice input plus a B x KVH-program grid (3B step at
        # B=16: 7.41 ms pallas vs 5.72 ms XLA). The kernel keeps int8
        # caches (its per-tile dequant avoids materializing a bf16 copy
        # of the layer, which is what the XLA path does).
        and (quantized or S > 32)
    )
    bt = 256 if T % 256 == 0 else 128

    def flash(win):
        # scale/softcap/window are static (python floats/ints from the model
        # config), so they compile into the tile body.
        if S <= 32:
            # Decode/verify chunk: the whole q block lives in VMEM.
            return flash_decode_attention(
                q, k_cache, v_cache, positions, k_scale, v_scale,
                interpret=interpret_mode(), block_t=bt,
                scale=scale, softcap=softcap, window=win,
                ring_len=ring_len,
            )
        # Prefill-length S: sweep query blocks too (flash_prefill.py).
        from llm_inference_lab_tpu.ops.pallas.flash_prefill import (
            flash_prefill_attention,
            pick_block_s,
        )

        bs = pick_block_s(S, group)
        # Measured on TPU v5e (llama-3.2-3b geometry, scalar-fetch timing —
        # relay block_until_ready acks early): bt=512 beats 256 at every S;
        # bs=512/bt=512 is 1.73x XLA at S=8k (17.7 vs 30.6 ms), 1.39x at 4k.
        bt_pre = 512 if T % 512 == 0 else bt
        return flash_prefill_attention(
            q, k_cache, v_cache, positions, k_scale, v_scale,
            interpret=interpret_mode(), block_s=bs, block_t=bt_pre,
            scale=scale, softcap=softcap, window=win,
        )

    from llm_inference_lab_tpu.ops.pallas.flash_prefill import pick_block_s

    viable = ok and (S <= 32 or pick_block_s(S, group) != 0)  # all static
    if viable:
        if eff_window is not None and window_on is not None:
            # Gemma2 alternating local/global layers: window_on is a TRACED
            # per-layer scalar (it rides the layer scan's xs), so the window
            # cannot be a static kernel parameter. Compile both variants and
            # let lax.cond execute exactly one — one extra kernel compile,
            # zero per-step host involvement.
            return jax.lax.cond(
                jnp.asarray(window_on, jnp.bool_),
                lambda: flash(eff_window),
                lambda: flash(None),
            )
        return flash(eff_window)
    from llm_inference_lab_tpu.ops.attention import attend_xla

    return attend_xla(q, k_cache, v_cache, positions, k_scale, v_scale,
                      tree_mask, chunk_start, window=window,
                      window_on=window_on, scale=scale, softcap=softcap,
                      ring_len=ring_len)


registry.register(
    "decode_attention",
    _kernel_wrapper,
    backend="pallas",
    priority=PRIORITY_PALLAS,
    platforms=("tpu", "cpu"),
)
