"""Pallas TPU kernels (the native-kernel layer).

TPU equivalents of the reference's CUDA/Triton kernels (src/kernels/cuda/,
src/kernels/triton/) plus the Phase-4B kernels the reference only planned:
fused dequant+matmul (quant_matmul.py), flash decode attention
(flash_decode.py), verify-prefix (verify_pallas.py).

Importing this package registers the kernels at pallas priority; the jnp
reference implementations stay registered as fallbacks (same fallback-chain
model as the reference's CUDA -> Triton -> torch, kernels/build.py:136-187).
Each dispatcher decides at call time: compiled on TPU, interpreter mode on
other backends when SPECDX_PALLAS_INTERPRET=1, otherwise the xla reference
(so accidental CPU use never tries to Mosaic-compile).
"""

import os

import jax


def interpret_mode() -> bool:
    return os.environ.get("SPECDX_PALLAS_INTERPRET") == "1"


def use_pallas() -> bool:
    """True if the pallas path should run at all on this backend."""
    return jax.default_backend() == "tpu" or interpret_mode()


from llm_inference_lab_tpu.ops.pallas import quant_matmul  # noqa: F401,E402
from llm_inference_lab_tpu.ops.pallas import verify_pallas  # noqa: F401,E402
from llm_inference_lab_tpu.ops.pallas import flash_decode  # noqa: F401,E402
from llm_inference_lab_tpu.ops.pallas import paged_flash  # noqa: F401,E402

# Backwards-compat import-time flag (tests may read it).
INTERPRET = interpret_mode()
