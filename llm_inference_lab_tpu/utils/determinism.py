"""Determinism helpers.

Reference parity: src/specdec/utils/deterministic.py:16,51 — the reference
must seed python/numpy/torch/cuda globally and flip cudnn into deterministic
mode. In JAX, determinism is the default: all randomness flows through
explicit threaded PRNG keys (see DecodeState.rng) and XLA:TPU is
deterministic for a fixed program+seed. What remains useful:
- one place to derive the run key from config/env,
- opt-in `jax_default_matmul_precision` pinning so bf16 matmul rounding is
  stable across library versions,
- seeding python/numpy for host-side code paths (shuffles, test data).
"""

from __future__ import annotations

import os
import random

import jax
import numpy as np


def ensure_deterministic(seed: int = 0, pin_matmul_precision: bool = False) -> jax.Array:
    """Seed host-side RNGs and return the root device PRNG key."""
    random.seed(seed)
    np.random.seed(seed % (2**32))
    os.environ["PYTHONHASHSEED"] = str(seed)
    if pin_matmul_precision:
        jax.config.update("jax_default_matmul_precision", "highest")
    return jax.random.PRNGKey(seed)


def set_deterministic_mode(enabled: bool = True, seed: int = 0):
    """Env-gated entry point (reference SPECDEC_DETERMINISTIC)."""
    if enabled:
        return ensure_deterministic(seed)
    return jax.random.PRNGKey(seed)
