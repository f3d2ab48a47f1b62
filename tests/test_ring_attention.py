"""Ring attention (context parallelism) vs single-device reference.

Runs on the virtual 8-CPU-device mesh from conftest. The reference is plain
full-materialization causal attention; the ring result must match to fp32
tolerance regardless of how the sequence is sharded.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from llm_inference_lab_tpu.parallel.context import ring_self_attention


def ref_attention(q, k, v, lengths):
    B, S, H, D = q.shape
    n_kv = k.shape[2]
    g = H // n_kv
    qg = q.astype(jnp.float32).reshape(B, S, n_kv, g, D)
    scores = jnp.einsum("bsngd,btnd->bngst", qg, k.astype(jnp.float32)) / (D**0.5)
    pos = jnp.arange(S)
    mask = (pos[None, :] <= pos[:, None])[None] & (pos[None, None, :] < lengths[:, None, None])
    scores = jnp.where(mask[:, None, None], scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bngst,btnd->bsngd", p, v.astype(jnp.float32))
    return out.reshape(B, S, H, D)


def _mk(B, S, H, n_kv, D, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, S, n_kv, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, S, n_kv, D), jnp.float32)
    return q, k, v


def _seq_mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("seq",))


@pytest.mark.parametrize("n_dev", [2, 8])
def test_ring_matches_reference_mha(n_dev):
    B, S, H, D = 2, 64, 4, 16
    q, k, v = _mk(B, S, H, H, D)
    lengths = jnp.full((B,), S, jnp.int32)
    got = ring_self_attention(q, k, v, _seq_mesh(n_dev), lengths=lengths)
    want = ref_attention(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_ring_matches_reference_gqa():
    B, S, H, n_kv, D = 2, 64, 8, 2, 16
    q, k, v = _mk(B, S, H, n_kv, D, seed=1)
    got = ring_self_attention(q, k, v, _seq_mesh(8))
    want = ref_attention(q, k, v, jnp.full((B,), S, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_ring_ragged_lengths():
    # Keys past each sequence's length must not contribute; query rows past
    # the length are garbage-in-garbage-out (caller masks them), but rows
    # inside the length must match the reference exactly.
    B, S, H, D = 3, 64, 4, 16
    q, k, v = _mk(B, S, H, H, D, seed=2)
    lengths = jnp.array([64, 17, 40], jnp.int32)
    got = np.asarray(ring_self_attention(q, k, v, _seq_mesh(8), lengths=lengths))
    want = np.asarray(ref_attention(q, k, v, lengths))
    for b, L in enumerate([64, 17, 40]):
        np.testing.assert_allclose(got[b, :L], want[b, :L], atol=2e-5, rtol=2e-5)


def test_ring_jits_and_rejects_bad_shard():
    B, S, H, D = 1, 32, 2, 8
    q, k, v = _mk(B, S, H, H, D, seed=3)
    mesh = _seq_mesh(8)
    f = jax.jit(lambda a, b, c: ring_self_attention(a, b, c, mesh))
    out = f(q, k, v)
    assert out.shape == (B, S, H, D)
    with pytest.raises(ValueError):
        ring_self_attention(q[:, :30], k[:, :30], v[:, :30], mesh)
