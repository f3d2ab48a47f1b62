"""llm_inference_lab_tpu — TPU-native speculative-decoding inference framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
`llm-inference-lab` (PyTorch/CUDA, single-GPU). The architecture is TPU-first:

- One jit-compiled, shape-static ``spec_step(state) -> state`` replaces the
  reference's eager draft/verify orchestration (reference:
  src/specdec/core/pipeline.py:893 ``generate``).
- Verification is a single K+1-position target forward, not an autoregressive
  ``.generate()`` call (reference inefficiency at
  src/scheduler/speculative_scheduler.py:192-198).
- KV caches are static arrays with explicit per-sequence lengths; acceptance
  and rejection only move the length pointer, so the reference's
  SafeKVCacheManager realignment/rollback machinery
  (src/specdec/cache/kv_cache_manager.py:353-479) is unnecessary by design.
- Draft/verify overlap comes from XLA async dispatch instead of CUDA streams
  (reference: src/scheduler/speculative_scheduler.py:74-97).
- Multi-chip scaling uses jax.sharding Mesh + NamedSharding over ICI
  (reference Phase 4C "Planned", README.md:393-395).
"""

__version__ = "0.1.0"

from llm_inference_lab_tpu.config import EngineConfig, load_config  # noqa: F401
