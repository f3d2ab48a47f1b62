"""verify_prefix — Pallas TPU kernel.

Same contract as ops.verify.verify_prefix_xla (and the reference CUDA kernel
src/kernels/cuda/verify.cu:34-152). Grid over the batch; each grid step loads
one sequence's [K, V] logits block into VMEM (K*V*4 <= ~4 MB for K<=8,
V<=128k — comfortably double-buffered), computes the argmax per draft
position with lowest-index tie-break (matching jnp.argmax and the reference's
CUB reduction, verify.cu:19-32), and writes that row of the accept mask.

Mosaic notes: cumprod doesn't lower, so the accepted prefix is derived from
the first-mismatch index; the mask is materialized as int32 and cast outside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_inference_lab_tpu.ops.registry import PRIORITY_PALLAS, registry


def _kernel(d_ref, l_ref, mask_ref):
    b = pl.program_id(0)
    K, V = l_ref.shape[1], l_ref.shape[2]
    logits = l_ref[0].astype(jnp.float32)  # [K, V]
    mx = jnp.max(logits, axis=-1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, (K, V), 1)
    # NaN semantics: an all-NaN row gives mx=NaN, `logits == mx` false
    # everywhere, arg=V -> never matches -> REJECT. jnp.argmax returns 0
    # for such a row, so the XLA reference would "match" a draft token 0.
    # NaN logits mean the forward itself is broken (e.g. out-of-vocab ids
    # before the engine's trust-boundary clamp); rejecting is the safe
    # divergence and the only one between the two implementations.
    arg = jnp.min(jnp.where(logits == mx, col, V), axis=-1)  # [K], ties -> lowest
    match = arg == d_ref[b, :]
    idx = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)[:, 0]
    first_bad = jnp.min(jnp.where(match, K, idx))
    mask_ref[b, :] = (idx < first_bad).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def verify_prefix_pallas(draft_tokens, target_logits, interpret: bool = False):
    B, K, V = target_logits.shape
    mask_i32 = pl.pallas_call(
        _kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((B, K), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, V), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, K), lambda b: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K), jnp.int32),
        interpret=interpret,
    )(draft_tokens.astype(jnp.int32), target_logits)
    mask = mask_i32.astype(jnp.bool_)
    accept_len = jnp.sum(mask_i32, axis=-1).astype(jnp.int32)
    return accept_len, mask


def _dispatch(draft_tokens, target_logits):
    from llm_inference_lab_tpu.ops.pallas import interpret_mode, use_pallas

    if not use_pallas():
        from llm_inference_lab_tpu.ops.verify import verify_prefix_xla

        return verify_prefix_xla(draft_tokens, target_logits)
    return verify_prefix_pallas(
        draft_tokens, target_logits, interpret=interpret_mode()
    )


registry.register(
    "verify_prefix",
    _dispatch,
    backend="pallas",
    priority=PRIORITY_PALLAS,
    platforms=("tpu", "cpu"),
)
