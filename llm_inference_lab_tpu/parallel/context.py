"""Context (sequence) parallelism: ring attention for long-context prefill.

The reference has no long-context machinery of any kind (SURVEY.md §5.7;
reference attention is whatever HF sdpa provides, hf_wrappers.py:98) — this
subsystem is green-field TPU work. The design is the standard ring-attention
recipe (Liu et al., blockwise parallel attention): shard the sequence axis of
Q/K/V across a mesh axis, keep Q resident, and rotate the K/V shards around
the ring with `jax.lax.ppermute` while accumulating an online softmax. Every
hop overlaps the collective with the block matmul (XLA's latency-hiding
scheduler pipelines the ppermute against the einsum), so the attention cost
stays compute-bound and the reachable context length scales linearly with the
number of chips.

Two layers:

  ring_attention_shard(q, k, v, axis_name)  — the per-device SPMD body; call
      it inside your own `shard_map` when composing with other sharded ops.
  ring_self_attention(q, k, v, mesh, axis)  — user-facing wrapper: takes
      globally-shaped [B, S, H, D] arrays, shards S over `axis`, runs the
      ring, returns the globally-shaped output.

Causal masking uses absolute positions (device_index * S_local + offset), so
the result is bit-comparable (up to fp reassociation) with single-device
attention; tests/test_ring_attention.py checks equivalence on a virtual
8-device mesh including GQA and ragged (length-masked) batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

_NEG = -1e30  # finite mask value: keeps online-softmax exp() NaN-free


def _block_update(q, k_blk, v_blk, q_pos, k_pos, m, l, acc, lengths):
    """One online-softmax accumulation step against a single K/V block.

    q:        [B, S, n_kv, g, D]   (GQA-grouped queries, f32)
    k/v_blk:  [B, T, n_kv, D]
    q_pos:    [S] absolute query positions;  k_pos: [T] absolute key positions
    m, l:     [B, n_kv, g, S] running max / normalizer
    acc:      [B, n_kv, g, S, D] running weighted-value sum (f32)
    lengths:  [B] valid sequence lengths (keys at pos >= length are dead)
    """
    D = q.shape[-1]
    scores = jnp.einsum(
        "bsngd,btnd->bngst", q, k_blk, preferred_element_type=jnp.float32
    ) * (1.0 / (D**0.5))
    mask = k_pos[None, :] <= q_pos[:, None]  # [S, T] causal
    mask = mask[None, :, :] & (k_pos[None, None, :] < lengths[:, None, None])
    scores = jnp.where(mask[:, None, None, :, :], scores, _NEG)

    m_new = jnp.maximum(m, scores.max(axis=-1))
    corr = jnp.exp(m - m_new)
    p = jnp.exp(scores - m_new[..., None])  # [B, n_kv, g, S, T]
    l_new = l * corr + p.sum(axis=-1)
    acc_new = acc * corr[..., None] + jnp.einsum(
        "bngst,btnd->bngsd", p, v_blk.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return m_new, l_new, acc_new


def ring_attention_shard(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    lengths: jax.Array = None,
) -> jax.Array:
    """Per-device ring attention body (call inside shard_map).

    q: [B, S_local, H, D], k/v: [B, S_local, n_kv, D] — this device's
    sequence shard. lengths: [B] global valid lengths (None = all valid).
    Returns [B, S_local, H, D] attention output for the local queries.

    Device i's queries occupy absolute positions [i*S, (i+1)*S). K/V blocks
    hop i -> i+1 each step, so at step t device i holds the block that
    originated on device (i - t) mod n; masking is by absolute position, and
    blocks that are entirely in the future contribute exp(_NEG - m) = 0.
    """
    n = lax.psum(1, axis_name)
    me = lax.axis_index(axis_name)
    B, S, H, D = q.shape
    n_kv = k.shape[2]
    g = H // n_kv

    qg = q.astype(jnp.float32).reshape(B, S, n_kv, g, D)
    q_pos = me * S + jnp.arange(S, dtype=jnp.int32)
    if lengths is None:
        lengths = jnp.full((B,), n * S, jnp.int32)

    # The accumulators are device-varying (each shard computes its own);
    # mark them so the fori_loop carry type matches (shard_map vma rule).
    def _vary(x):
        return lax.pcast(x, (axis_name,), to="varying")

    m0 = _vary(jnp.full((B, n_kv, g, S), _NEG, jnp.float32))
    l0 = _vary(jnp.zeros((B, n_kv, g, S), jnp.float32))
    a0 = _vary(jnp.zeros((B, n_kv, g, S, D), jnp.float32))
    perm = [(j, (j + 1) % n) for j in range(n)]

    def body(t, carry):
        m, l, acc, k_blk, v_blk = carry
        src = (me - t) % n
        k_pos = src * S + jnp.arange(S, dtype=jnp.int32)
        m, l, acc = _block_update(qg, k_blk, v_blk, q_pos, k_pos, m, l, acc, lengths)
        # Rotate for the next step; the final hop restores the original
        # placement (harmless) and keeps the loop body uniform.
        k_blk = lax.ppermute(k_blk, axis_name, perm)
        v_blk = lax.ppermute(v_blk, axis_name, perm)
        return m, l, acc, k_blk, v_blk

    m, l, acc, _, _ = lax.fori_loop(0, n, body, (m0, l0, a0, k, v))
    out = acc / jnp.maximum(l, 1e-30)[..., None]  # [B, n_kv, g, S, D]
    out = jnp.moveaxis(out, 3, 1)  # -> [B, S, n_kv, g, D]
    return out.reshape(B, S, H, D).astype(q.dtype)


def ring_self_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "seq",
    lengths: jax.Array = None,
) -> jax.Array:
    """Context-parallel causal self-attention over globally-shaped inputs.

    q: [B, S, H, D], k/v: [B, S, n_kv, D]; S must divide by mesh.shape[axis].
    Shards S over `axis`, runs the ring, returns [B, S, H, D] with the same
    sharding (sequence-sharded) — downstream per-token ops (MLP, norms) can
    stay sequence-sharded, which is exactly Megatron-style sequence
    parallelism for the prefill.
    """
    n = mesh.shape[axis]
    if q.shape[1] % n:
        raise ValueError(f"seq len {q.shape[1]} not divisible by {axis}={n}")
    spec = P(None, axis, None, None)
    fn = jax.shard_map(
        lambda q_, k_, v_, len_: ring_attention_shard(q_, k_, v_, axis, len_),
        mesh=mesh,
        in_specs=(spec, spec, spec, P(None)),
        out_specs=spec,
    )
    if lengths is None:
        lengths = jnp.full((q.shape[0],), q.shape[1], jnp.int32)
    return fn(q, k, v, lengths)
