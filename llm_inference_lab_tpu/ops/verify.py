"""verify_prefix: batched argmax-and-match acceptance op.

Contract (identical to the reference's CUDA kernel,
src/kernels/cuda/verify.cu:34-152 and torch reference
src/kernels/reference.py:13-56):

    verify_prefix(draft_tokens, target_logits) -> (accept_len, accepted_mask)
      draft_tokens:  [B, K] int32
      target_logits: [B, K, V] — target distribution at each draft position
      accept_len:    [B] int32 — length of longest matching prefix
      accepted_mask: [B, K] bool — True for accepted positions

Argmax ties break to the lowest index (jnp.argmax semantics — same as the
reference kernel's CUB reduction tie-break, verify.cu:19-32).

The XLA implementation is a cumprod over the match mask — fully vectorized,
no sequential prefix loop (the reference's thread-0 loop, verify.cu:118-151).
A Pallas version exists for registry parity (ops/pallas/verify_pallas.py) but
XLA already fuses this to a handful of VPU ops.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from llm_inference_lab_tpu.ops.registry import PRIORITY_XLA, registry


def verify_prefix_xla(
    draft_tokens: jax.Array, target_logits: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    target_ids = jnp.argmax(target_logits, axis=-1).astype(draft_tokens.dtype)
    match = draft_tokens == target_ids
    prefix = jnp.cumprod(match.astype(jnp.int32), axis=-1)
    accept_len = jnp.sum(prefix, axis=-1).astype(jnp.int32)
    return accept_len, prefix.astype(jnp.bool_)


registry.register("verify_prefix", verify_prefix_xla, backend="xla", priority=PRIORITY_XLA)
