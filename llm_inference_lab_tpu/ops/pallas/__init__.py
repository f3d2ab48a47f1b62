"""Pallas TPU kernels (the native-kernel layer).

TPU equivalents of the reference's CUDA/Triton kernels (src/kernels/cuda/,
src/kernels/triton/) plus the Phase-4B kernels the reference only planned:
fused dequant+matmul (quant_matmul.py), flash decode attention
(flash_decode.py), verify-prefix (verify_pallas.py).

Importing this package registers the kernels at pallas priority; the jnp
reference implementations stay registered as fallbacks (same fallback-chain
model as the reference's CUDA -> Triton -> torch, kernels/build.py:136-187).
On non-TPU platforms the kernels run in interpreter mode only if
SPECDX_PALLAS_INTERPRET=1; otherwise the xla fallbacks win.
"""

import os

import jax

_ON_TPU = jax.default_backend() == "tpu"
INTERPRET = os.environ.get("SPECDX_PALLAS_INTERPRET") == "1"

if _ON_TPU or INTERPRET:
    from llm_inference_lab_tpu.ops.pallas import quant_matmul  # noqa: F401
    from llm_inference_lab_tpu.ops.pallas import verify_pallas  # noqa: F401
    from llm_inference_lab_tpu.ops.pallas import flash_decode  # noqa: F401
