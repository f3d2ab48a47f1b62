"""verify_prefix — Pallas TPU kernel.

Same contract as ops.verify.verify_prefix_xla (and the reference CUDA kernel
src/kernels/cuda/verify.cu:34-152). XLA already compiles the jnp reference to
a few fused VPU ops, so this kernel exists for registry/backendparity and as
the vocab-tiled variant: argmax is computed over V tiles with a running
(max, argmax) pair, so the [K, V] logits never need to fit VMEM at once.

Grid: (B, V tiles). Tie-break to the lowest index matches jnp.argmax and the
reference's CUB reduction (verify.cu:19-32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_inference_lab_tpu.ops.registry import PRIORITY_PALLAS, registry

NEG_INF = -1e30


def _kernel(d_ref, l_ref, mask_ref, m_ref, a_ref):
    t = pl.program_id(1)
    K, BV = l_ref.shape[1], l_ref.shape[2]

    @pl.when(t == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        a_ref[:] = jnp.zeros_like(a_ref)

    logits = l_ref[0].astype(jnp.float32)  # [K, BV]
    tile_max = jnp.max(logits, axis=-1, keepdims=True)  # [K, 1]
    col = jax.lax.broadcasted_iota(jnp.int32, (K, BV), 1)
    tile_arg = jnp.min(
        jnp.where(logits == tile_max, col, BV), axis=-1, keepdims=True
    ) + t * BV  # global id, lowest index on ties

    better = tile_max > m_ref[:]  # strict: earlier tiles win ties
    a_ref[:] = jnp.where(better, tile_arg, a_ref[:])
    m_ref[:] = jnp.maximum(m_ref[:], tile_max)

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        match = a_ref[:, 0] == d_ref[0]  # [K]
        prefix = jnp.cumprod(match.astype(jnp.int32))
        mask_ref[0] = prefix.astype(jnp.bool_)


@functools.partial(jax.jit, static_argnames=("interpret",))
def verify_prefix_pallas(draft_tokens, target_logits, interpret: bool = False):
    B, K, V = target_logits.shape
    BV = 2048 if V % 2048 == 0 else 1024 if V % 1024 == 0 else V
    mask = pl.pallas_call(
        _kernel,
        grid=(B, V // BV),
        in_specs=[
            pl.BlockSpec((1, K), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, BV), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K), lambda b, t: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K), jnp.bool_),
        scratch_shapes=[
            pltpu.VMEM((K, 1), jnp.float32),
            pltpu.VMEM((K, 1), jnp.int32),
        ],
        interpret=interpret,
    )(draft_tokens.astype(jnp.int32), target_logits)
    accept_len = jnp.sum(mask.astype(jnp.int32), axis=-1).astype(jnp.int32)
    return accept_len, mask


def _dispatch(draft_tokens, target_logits):
    from llm_inference_lab_tpu.ops.pallas import INTERPRET

    return verify_prefix_pallas(draft_tokens, target_logits, interpret=INTERPRET)


registry.register(
    "verify_prefix",
    _dispatch,
    backend="pallas",
    priority=PRIORITY_PALLAS,
    platforms=("tpu",) if jax.default_backend() == "tpu" else ("tpu", "cpu"),
)
