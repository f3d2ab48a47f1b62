"""Compute ops: jnp reference implementations + Pallas TPU kernels.

Mirrors the reference's src/kernels/ package (CUDA + Triton + torch reference
with a priority registry, kernels/registry.py:11) — here the backends are
"pallas" (TPU kernels) and "xla" (pure jnp reference), selected through
llm_inference_lab_tpu.ops.registry with pallas preferred on TPU and xla as
the always-correct fallback.
"""

from llm_inference_lab_tpu.ops.registry import registry, get_op  # noqa: F401

# Import op modules for their registration side effects (xla reference
# implementations; pallas kernels self-register on TPU / in interpret mode).
from llm_inference_lab_tpu.ops import attention as _attention  # noqa: F401,E402
from llm_inference_lab_tpu.ops import moe as _moe  # noqa: F401,E402
from llm_inference_lab_tpu.ops import paged_attention as _paged  # noqa: F401,E402
from llm_inference_lab_tpu.ops import quant as _quant  # noqa: F401,E402
from llm_inference_lab_tpu.ops import verify as _verify  # noqa: F401,E402
from llm_inference_lab_tpu.ops import pallas as _pallas  # noqa: F401,E402
