"""Model zoo: pure-functional JAX decoder models behind one protocol.

Reference parity: src/specdec/utils/interfaces.py:14 (`LanguageModel` ABC),
src/specdec/models/hf_wrappers.py (HF backend), src/specdec/models/fake_lm.py
(deterministic test model). Here every model is (config, params, pure apply fn)
so the same jitted step function works for any architecture.
"""

from llm_inference_lab_tpu.models.base import (  # noqa: F401
    KVCache,
    Model,
    ModelConfig,
)
from llm_inference_lab_tpu.models.fake import make_fake_model  # noqa: F401
from llm_inference_lab_tpu.models.gpt2 import GPT2Model  # noqa: F401
from llm_inference_lab_tpu.models.llama import LlamaModel  # noqa: F401
from llm_inference_lab_tpu.models.mistral import MistralModel  # noqa: F401
from llm_inference_lab_tpu.models.opt import OPTModel  # noqa: F401
from llm_inference_lab_tpu.models.qwen2 import Qwen2Model  # noqa: F401
from llm_inference_lab_tpu.models.registry import get_model  # noqa: F401
