"""verify_prefix op tests (reference tests/test_kernels_verify.py:16-130:
planted argmax matches, accept_len/mask assertions, large vocab)."""

import jax.numpy as jnp
import numpy as np
import pytest

from llm_inference_lab_tpu.ops.verify import verify_prefix_xla


def make_logits(target_ids, vocab):
    """Logits whose argmax is exactly target_ids."""
    b, k = target_ids.shape
    logits = np.random.default_rng(0).normal(size=(b, k, vocab)).astype(np.float32)
    logits = np.clip(logits, -5, 5)
    for i in range(b):
        for j in range(k):
            logits[i, j, target_ids[i, j]] = 10.0
    return jnp.asarray(logits)


def test_full_match():
    draft = jnp.array([[1, 2, 3, 4]], dtype=jnp.int32)
    logits = make_logits(np.array([[1, 2, 3, 4]]), 32)
    n, mask = verify_prefix_xla(draft, logits)
    assert n.tolist() == [4]
    assert mask.tolist() == [[True, True, True, True]]


def test_partial_match():
    draft = jnp.array([[1, 2, 9, 4]], dtype=jnp.int32)
    logits = make_logits(np.array([[1, 2, 3, 4]]), 32)
    n, mask = verify_prefix_xla(draft, logits)
    assert n.tolist() == [2]
    assert mask.tolist() == [[True, True, False, False]]


def test_no_match():
    draft = jnp.array([[7, 2, 3]], dtype=jnp.int32)
    logits = make_logits(np.array([[1, 2, 3]]), 32)
    n, mask = verify_prefix_xla(draft, logits)
    assert n.tolist() == [0]
    assert not mask.any()


def test_match_after_mismatch_not_counted():
    # Positions after the first mismatch must not count even if they match.
    draft = jnp.array([[1, 9, 3, 4]], dtype=jnp.int32)
    logits = make_logits(np.array([[1, 2, 3, 4]]), 32)
    n, _ = verify_prefix_xla(draft, logits)
    assert n.tolist() == [1]


def test_batched_mixed():
    draft = jnp.array([[1, 2], [5, 5], [3, 9]], dtype=jnp.int32)
    logits = make_logits(np.array([[1, 2], [5, 0], [0, 9]]), 64)
    n, _ = verify_prefix_xla(draft, logits)
    assert n.tolist() == [2, 1, 0]


@pytest.mark.parametrize("vocab", [256, 32768])
def test_large_vocab_and_ties(vocab):
    # Tie-break to lowest index (reference verify.cu:19-32 CUB semantics).
    logits = np.zeros((1, 2, vocab), np.float32)  # all ties -> argmax = 0
    draft = jnp.array([[0, 1]], dtype=jnp.int32)
    n, _ = verify_prefix_xla(draft, jnp.asarray(logits))
    assert n.tolist() == [1]
