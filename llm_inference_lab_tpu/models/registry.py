"""Model factory: name -> Model (reference: pipeline._create_base_model,
src/specdec/core/pipeline.py:464-515)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def get_model(
    name: str,
    implementation: str = "hf",
    rng: Optional[jax.Array] = None,
    dtype=jnp.bfloat16,
    checkpoint_path: Optional[str] = None,
    quantized_init: Optional[str] = None,
    quantize_embed: bool = False,
    **fake_kwargs,
):
    """implementation="fake" returns the deterministic test model regardless of
    name (reference implementation="fake", pipeline.py:466-472)."""
    from llm_inference_lab_tpu.models.fake import make_fake_model
    from llm_inference_lab_tpu.models.gemma import GEMMA_CONFIGS, GemmaModel
    from llm_inference_lab_tpu.models.gpt2 import GPT2_CONFIGS, GPT2Model
    from llm_inference_lab_tpu.models.llama import LLAMA_CONFIGS, LlamaModel
    from llm_inference_lab_tpu.models.mistral import MISTRAL_CONFIGS, MistralModel
    from llm_inference_lab_tpu.models.mixtral import MIXTRAL_CONFIGS, MixtralModel
    from llm_inference_lab_tpu.models.opt import OPT_CONFIGS, OPTModel
    from llm_inference_lab_tpu.models.phi3 import PHI3_CONFIGS, Phi3Model
    from llm_inference_lab_tpu.models.qwen2 import QWEN2_CONFIGS, Qwen2Model

    if implementation == "fake" or name == "fake":
        return make_fake_model(name=name, **fake_kwargs)

    key = (
        name.lower()
        .replace("meta-llama/", "")
        .replace("openai-community/", "")
        .replace("facebook/", "")
        .replace("qwen/", "")
        .replace("mistralai/", "")
        .replace("google/", "")
        .replace("microsoft/", "")
    )
    kw = dict(rng=rng, dtype=dtype, checkpoint_path=checkpoint_path,
              quantized_init=quantized_init, quantize_embed=quantize_embed)
    families = (
        (GPT2_CONFIGS, GPT2Model),
        (LLAMA_CONFIGS, LlamaModel),
        (OPT_CONFIGS, OPTModel),
        (QWEN2_CONFIGS, Qwen2Model),
        (MISTRAL_CONFIGS, MistralModel),
        (MIXTRAL_CONFIGS, MixtralModel),
        (GEMMA_CONFIGS, GemmaModel),
        (PHI3_CONFIGS, Phi3Model),
    )
    for configs, family in families:
        if key in configs:
            return family.create(key, **kw)
    known = sorted(k for configs, _ in families for k in configs)
    raise ValueError(
        f"unknown model {name!r}; known: {known} or implementation='fake'"
    )
