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


def _kernel_int4(x_lo_ref, x_hi_ref, w_ref, s_ref, o_ref, acc_ref):
    """int4 split-K-halves: each packed byte tile covers rows [j*BK, j*BK+BK)
    of the LOW half and rows [half + j*BK, ...) of the HIGH half, so the
    kernel receives the two matching x tiles and does two MXU dots.

    Dequant is three int8 VPU ops — no shifts, no i32 expansion (the v2
    nibble encoding in ops.quant.quantize_int4 stores lo biased +8 and hi
    two's-complement, so ``byte - (byte & 0x0F)`` is EXACTLY 16x the signed
    high weight). The caller pre-scales the high-half activations by 1/16.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:]
    t = w & 0x0F  # lo_biased in 0..15 (int8)
    lo = (t - 8).astype(jnp.bfloat16)  # signed low-half weight
    hi16 = (w - t).astype(jnp.bfloat16)  # 16 * signed high-half weight
    acc_ref[:] += jnp.dot(x_lo_ref[:], lo, preferred_element_type=jnp.float32)
    acc_ref[:] += jnp.dot(x_hi_ref[:], hi16, preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[0, :].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def quant_matmul_pallas(x: jax.Array, qt: QuantTensor, interpret: bool = False):
    """x: [M, K(logical)] bf16/f32; qt int8 [K, N] or int4-packed [K//2, N]."""
    M, K = x.shape
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
    BN = (
        1024
        if N % 1024 == 0
        else 512 if N % 512 == 0 else 256 if N % 256 == 0 else 128
    )
    scale2d = qt.scale.reshape(1, N)

    def pick_bk(k_total: int, budget: int) -> int:
        if k_total * BN <= budget and k_total % 128 == 0:
            return k_total  # whole reduction in one block
        for cand in (2048, 1024, 512, 256, 128):
            if k_total % cand == 0 and cand * BN <= budget:
                return cand
        return k_total

    if qt.bits == 8:
        BK = pick_bk(K, 4 << 20)
        grid = (N // BN, K // BK)
        out = pl.pallas_call(
            _kernel_int8,
            grid=grid,
            in_specs=[
                pl.BlockSpec((Mp, BK), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((BK, BN), lambda i, j: (j, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BN), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (Mp, BN), lambda i, j: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
            scratch_shapes=[pltpu.VMEM((Mp, BN), jnp.float32)],
            interpret=interpret,
        )(x, qt.data, scale2d)
    else:
        half = K // 2
        # v2 dequant holds tile int8 x2 + bf16 x2 (~6 bytes/packed elem) —
        # roomier than the old i32 expansion, but still tighter than int8.
        BK = pick_bk(half, 2 << 20)
        grid = (N // BN, half // BK)
        x_lo = x[:, :half]
        # 1/16 prescale pairs with the kernel's 16x high-nibble dequant
        # (exact: power of two; [M, K/2] elementwise, negligible vs the dot).
        x_hi = x[:, half:] * jnp.asarray(0.0625, x.dtype)
        out = pl.pallas_call(
            _kernel_int4,
            grid=grid,
            in_specs=[
                pl.BlockSpec((Mp, BK), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((Mp, BK), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((BK, BN), lambda i, j: (j, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BN), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (Mp, BN), lambda i, j: (0, i), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
            scratch_shapes=[pltpu.VMEM((Mp, BN), jnp.float32)],
            interpret=interpret,
        )(x_lo, x_hi, qt.data, scale2d)

    return out[:M]


def _dispatch(x: jax.Array, qt: QuantTensor) -> jax.Array:
    from llm_inference_lab_tpu.ops.pallas import interpret_mode, use_pallas

    # Measured on v5e (1B-model decode forward, on-device dependent-chain
    # timing): bf16 3.74 ms; int8: XLA fused dequant 2.51 ms vs this kernel
    # 3.24 ms (XLA fuses int8->bf16 into the dot at near-roofline — it wins,
    # so int8 defaults to XLA); int4: XLA unpack 3.69 ms (materializes int8)
    # vs this kernel 2.82 ms — the kernel wins and is the int4 default.
    # Override with SPECDX_PALLAS_QUANT_MATMUL=1/0.
    import os

    K = qt.data.shape[0] * (2 if qt.bits == 4 else 1)
    N = qt.data.shape[-1]
    env = os.environ.get("SPECDX_PALLAS_QUANT_MATMUL")
    prefer_pallas = (qt.bits == 4) if env is None else env == "1"
    if (
        not prefer_pallas
        or x.shape[0] > 32  # decode kernel: prefill-sized M blows VMEM
        or K % 256 != 0
        or N % 128 != 0
        or not use_pallas()
    ):
        from llm_inference_lab_tpu.ops.quant import quant_matmul_xla

        return quant_matmul_xla(x, qt)
    return quant_matmul_pallas(x, qt, interpret=interpret_mode())


registry.register(
    "quant_matmul",
    _dispatch,
    backend="pallas",
    priority=PRIORITY_PALLAS,
    platforms=("tpu", "cpu"),
)
