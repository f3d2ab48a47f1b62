"""Token validation: clamp out-of-vocab ids device-side.

Reference parity: src/specdec/utils/token_validation.py:15,81
(`validate_and_clamp_tokens`, `get_vocab_size`) — the reference calls this
~15 times per batch step because eager mutation can corrupt ids anywhere.
Here the jitted step is a pure function, so validation is needed only at the
trust boundary (user-supplied prompt ids) and as a cheap invariant check in
debug mode; the samplers already clamp their outputs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def validate_and_clamp_tokens(
    tokens: jax.Array, vocab_size: int
) -> Tuple[jax.Array, jax.Array]:
    """Returns (clamped tokens, count of invalid entries). Pure/jittable."""
    invalid = (tokens < 0) | (tokens >= vocab_size)
    return jnp.clip(tokens, 0, vocab_size - 1), jnp.sum(invalid.astype(jnp.int32))


def shared_vocab_size(target_vocab: int, draft_vocab: int) -> int:
    """Acceptance compares token ids, so proposals must lie in the shared
    vocab (reference pipeline.py:2116-2155 uses min(draft, base))."""
    return min(target_vocab, draft_vocab)
