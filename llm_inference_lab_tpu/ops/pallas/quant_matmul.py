"""Fused dequantizing matmul (INT8/INT4 weight-only) — Pallas TPU kernel.

The decode speed-of-light lever (BASELINE.json north star): batch-1 decode is
HBM-bandwidth-bound on weights, so streaming int8/int4 tiles and dequantizing
in VMEM halves/quarters the bytes moved vs bf16. Per-output-channel scales
factor out of the contraction, so dequantization is applied once to the f32
accumulator tile as an epilogue (not per K-tile).

Contract (matches ops.quant.quant_matmul_xla):
    y[M, N] = (x[M, K] @ unpack(w_q)[K, N]) * scale[N]

Grid: (N tiles, K tiles), K minor → the f32 accumulator tile lives in VMEM
scratch across the K sweep; Pallas double-buffers the HBM->VMEM weight-tile
DMAs automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_inference_lab_tpu.ops.quant import QuantTensor
from llm_inference_lab_tpu.ops.registry import PRIORITY_PALLAS, registry


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# int4 (BN, BK) tile override table — EMPTY by design after the round-5
# re-measurement; kept (with its env gate) as the mechanism for future
# per-deployment tuning. History, with artifacts:
#
# Round 4 populated this table from a FLAT-buffer sweep
# (scripts/int4_tile_sweep.py, int4_tiles_r4.json) and regressed the
# shipped BS=1 headline 180.3 -> 154.6 tok/s (BENCH_r03 vs BENCH_r04;
# A/B isolating the table: docs/results/serving/int4_ab_r5.json). The
# round-5 re-measurement on the STACKED scalar-prefetch path the model
# actually runs (scripts/int4_tile_sweep_r5.py, int4_tiles_r5.json, L=4
# layer stack with the layer index cycling per call) found that every
# candidate "winner" is PARAMETER-IDENTICAL to the heuristic below
# (BN=1024; BK = whole half-K when it fits the 2 MB VMEM budget, else
# 2048): the apparent 2-14% spreads between identically-tiled runs bound
# the slope-timing noise, not a win. The two r4 entries that actually
# differed from the heuristic — (3072,3072)->(3072,768), which exceeds
# the kernel's own VMEM tile budget, and (8192,3072)->(512,2048) — are
# what the headline paid 14% for. Conclusion: the heuristic is optimal
# within measurement noise on every llama-3B/8B projection; ship no
# overrides. Keys are (Mp, K, N) with Mp the PADDED row count (all
# decode M <= 16 share the 16-row kernel).
_INT4_TILES: dict = {}


def _kernel_int8(x_ref, w_ref, s_ref, o_ref, acc_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        x_ref[:],
        w_ref[:].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[0, :].astype(jnp.float32)).astype(o_ref.dtype)


def _kernel_int4(xd_ref, xh_ref, w_ref, s_ref, c_ref, o_ref, acc_ref):
    """int4 split-K-halves: each packed byte tile covers rows [j*BK, j*BK+BK)
    of the LOW half and rows [half + j*BK, ...) of the HIGH half.

    Per-byte dequant is ONE int8 AND and TWO i8->bf16 converts — no shifts,
    no subtracts, no i32 expansion (Mosaic legalizes none of i8 sub/shift).
    With the v2 nibble encoding (ops.quant.quantize_int4: byte = 16*h +
    (l+8) as a signed int8), the contraction refactors as

        x_lo . l + x_hi . h
          = (x_lo - x_hi/16) . t  +  (x_hi/16) . byte  -  8 * sum(x_lo)

    where t = byte & 0x0F. The caller passes xd = x_lo - x_hi/16 and
    xh = x_hi/16 as the two activation tiles and the -8*rowsum(x_lo)
    correction (c_ref, [Mp, 1]) folds into the epilogue — so the kernel
    body is exactly two MXU dots on cheaply-converted byte tiles.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:]
    tb = (w & 0x0F).astype(jnp.bfloat16)  # lo_biased in 0..15
    wb = w.astype(jnp.bfloat16)  # 16*h + (l+8), exact in bf16
    acc_ref[:] += jnp.dot(xd_ref[:], tb, preferred_element_type=jnp.float32)
    acc_ref[:] += jnp.dot(xh_ref[:], wb, preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = (
            (acc_ref[:] + c_ref[:, :1].astype(jnp.float32))
            * s_ref[0, :].astype(jnp.float32)
        ).astype(o_ref.dtype)


def _kernel_int8_st(li_ref, x_ref, w_ref, s_ref, o_ref, acc_ref):
    # Stacked variant: the scalar-prefetched layer index aims the weight
    # block DMAs (index maps below); the body is identical.
    _kernel_int8(x_ref, w_ref, s_ref, o_ref, acc_ref)


def _kernel_int4_st(li_ref, xd_ref, xh_ref, w_ref, s_ref, c_ref, o_ref,
                    acc_ref):
    _kernel_int4(xd_ref, xh_ref, w_ref, s_ref, c_ref, o_ref, acc_ref)


@functools.partial(jax.jit, static_argnames=("interpret", "bn", "bk"))
def quant_matmul_pallas(x: jax.Array, qt: QuantTensor, layer_idx=None,
                        interpret: bool = False, bn: int = 0, bk: int = 0):
    """x: [M, K(logical)] bf16/f32; qt int8 [K, N] or int4-packed [K//2, N].

    STACKED form: qt leaves carry a leading layer axis ([L, Kp, N] data,
    [L, N] scales) and `layer_idx` (traced scalar) selects the layer via a
    scalar-prefetched index map — the kernel DMAs blocks straight out of
    the stacked parameter buffer. This exists because the model's layer
    scan slices its xs per iteration, and a dynamic slice feeding a
    pallas_call is a MATERIALIZED copy (~50 MB/layer for the int4 3B):
    the copies cost more than the matmuls they feed.
    """
    M, K = x.shape
    stacked = qt.data.ndim == 3
    if stacked:
        K = qt.data.shape[1] * (2 if qt.bits == 4 else 1)
    N = qt.data.shape[-1]
    out_dtype = x.dtype

    # Pad M to the sublane tile (decode M is tiny: B*(K+1)).
    Mp = _round_up(max(M, 1), 16)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))

    # Tile selection: minimize grid steps (per-step overhead dominates at
    # decode M). Full-K blocks when they fit VMEM (K*BN int8 <= ~4MB), so
    # the accumulator is written once per N tile. Measured on v5e (slope
    # timing over a 4000-call dependent chain, 2026-08-18): BN=1024 beats
    # BN=512 by ~15% on the llama matmul shapes (fewer grid steps, larger
    # DMAs) — int4 [2048,8192] 0.0207 -> 0.0173 ms, [8192,2048]
    # 0.0189 -> 0.0163 ms; ~60% of the HBM speed-of-light per matmul.
    import os as _os

    if (
        not bn and not bk and qt.bits == 4
        and _os.environ.get("SPECDX_INT4_TILE_TABLE", "1") == "1"
        and (Mp, K, N) in _INT4_TILES
    ):
        bn, bk = _INT4_TILES[(Mp, K, N)]
    BN = bn or (
        1024
        if N % 1024 == 0
        # 768 catches llama's 128k vocab head (128256 = 167*768): without
        # it the fallback lands on BN=256 (501 grid steps of small DMAs,
        # 57.3% SoL measured for the int4 EmbedQuant4 head —
        # docs/results/serving/int4_head_r5.json).
        else 768 if N % 768 == 0
        else 512 if N % 512 == 0 else 256 if N % 256 == 0 else 128
    )

    def pick_bk(k_total: int, budget: int) -> int:
        if bk:
            return bk
        if k_total * BN <= budget and k_total % 128 == 0:
            return k_total  # whole reduction in one block
        for cand in (2048, 1024, 512, 256, 128):
            if k_total % cand == 0 and cand * BN <= budget:
                return cand
        return k_total

    def call(kernel, kernel_st, in_specs, operands, scratch):
        common = dict(
            out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
            interpret=interpret,
        )
        out_spec_flat = pl.BlockSpec(
            (Mp, BN), lambda i, j: (0, i), memory_space=pltpu.VMEM
        )
        if not stacked:
            return pl.pallas_call(
                kernel, grid=grid, in_specs=in_specs,
                out_specs=out_spec_flat, scratch_shapes=scratch, **common,
            )(*operands)
        li = jnp.asarray(layer_idx, jnp.int32).reshape(1)
        # Index maps gain the prefetch ref as a trailing arg; weight/scale
        # maps read the layer index from it.
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (Mp, BN), lambda i, j, li: (0, i), memory_space=pltpu.VMEM
            ),
            scratch_shapes=scratch,
        )
        return pl.pallas_call(kernel_st, grid_spec=grid_spec, **common)(
            li, *operands
        )

    def xspec(shape, index_flat, index_st):
        return pl.BlockSpec(
            shape, index_st if stacked else index_flat,
            memory_space=pltpu.VMEM,
        )

    if qt.bits == 8:
        BK = pick_bk(K, 4 << 20)
        grid = (N // BN, K // BK)
        scale_op = (
            qt.scale.reshape(-1, 1, N) if stacked else qt.scale.reshape(1, N)
        )
        in_specs = [
            xspec((Mp, BK), lambda i, j: (0, j), lambda i, j, li: (0, j)),
            xspec(
                ((None, BK, BN) if stacked else (BK, BN)),
                lambda i, j: (j, i), lambda i, j, li: (li[0], j, i),
            ),
            xspec(
                ((None, 1, BN) if stacked else (1, BN)),
                lambda i, j: (0, i), lambda i, j, li: (li[0], 0, i),
            ),
        ]
        out = call(
            _kernel_int8, _kernel_int8_st, in_specs,
            (x, qt.data, scale_op),
            [pltpu.VMEM((Mp, BN), jnp.float32)],
        )
    else:
        half = K // 2
        # v2 dequant holds tile int8 x2 + bf16 x2 (~6 bytes/packed elem) —
        # roomier than the old i32 expansion, but still tighter than int8.
        BK = pick_bk(half, 2 << 20)
        grid = (N // BN, half // BK)
        x_lo = x[:, :half]
        # 1/16 prescale + the xd/xh/corr refactoring (see _kernel_int4):
        # all [M, K/2]-sized prep, negligible vs the dots and fused by XLA.
        x_hi = x[:, half:] * jnp.asarray(0.0625, x.dtype)
        x_d = x_lo - x_hi
        corr = (-8.0 * jnp.sum(x_lo.astype(jnp.float32), axis=-1,
                               keepdims=True)).astype(jnp.float32)  # [Mp,1]
        scale_op = (
            qt.scale.reshape(-1, 1, N) if stacked else qt.scale.reshape(1, N)
        )
        in_specs = [
            xspec((Mp, BK), lambda i, j: (0, j), lambda i, j, li: (0, j)),
            xspec((Mp, BK), lambda i, j: (0, j), lambda i, j, li: (0, j)),
            xspec(
                ((None, BK, BN) if stacked else (BK, BN)),
                lambda i, j: (j, i), lambda i, j, li: (li[0], j, i),
            ),
            xspec(
                ((None, 1, BN) if stacked else (1, BN)),
                lambda i, j: (0, i), lambda i, j, li: (li[0], 0, i),
            ),
            xspec((Mp, 1), lambda i, j: (0, 0), lambda i, j, li: (0, 0)),
        ]
        out = call(
            _kernel_int4, _kernel_int4_st, in_specs,
            (x_d, x_hi, qt.data, scale_op, corr),
            [pltpu.VMEM((Mp, BN), jnp.float32)],
        )

    return out[:M]


def _dispatch(x: jax.Array, qt) -> jax.Array:
    from llm_inference_lab_tpu.ops.pallas import interpret_mode, use_pallas
    from llm_inference_lab_tpu.ops.quant import QuantStackRef

    # Measured on v5e (slope-timed, docs/results/serving/int4_bench_r3.json):
    # int8: XLA fuses int8->bf16 into the dot at 75-92% of HBM
    # speed-of-light — it wins, so int8 defaults to XLA. int4 v2 (two-dot
    # mask+convert dequant): 69-82% SoL and 1.3-1.9x faster than int8 on
    # the llama shapes — the kernel is the int4 default, reading stacked
    # weights via scalar-prefetch under the layer scan.
    # Override with SPECDX_PALLAS_QUANT_MATMUL=1/0.
    import os

    ref = isinstance(qt, QuantStackRef)
    inner = qt.qt if ref else qt
    K = inner.data.shape[-2] * (2 if inner.bits == 4 else 1)
    N = inner.data.shape[-1]
    env = os.environ.get("SPECDX_PALLAS_QUANT_MATMUL")
    prefer_pallas = (inner.bits == 4) if env is None else env == "1"
    if (
        not prefer_pallas
        or x.shape[0] > 32  # decode kernel: prefill-sized M blows VMEM
        or K % 256 != 0
        or N % 128 != 0
        or not use_pallas()
    ):
        from llm_inference_lab_tpu.ops.quant import quant_matmul_xla

        return quant_matmul_xla(x, qt)
    if ref:
        return quant_matmul_pallas(
            x, qt.qt, layer_idx=qt.idx, interpret=interpret_mode()
        )
    return quant_matmul_pallas(x, qt, interpret=interpret_mode())


registry.register(
    "quant_matmul",
    _dispatch,
    backend="pallas",
    priority=PRIORITY_PALLAS,
    platforms=("tpu", "cpu"),
)
