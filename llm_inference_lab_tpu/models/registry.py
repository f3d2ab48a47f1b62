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
    from llm_inference_lab_tpu.models.gpt2 import GPT2_CONFIGS, GPT2Model
    from llm_inference_lab_tpu.models.llama import LLAMA_CONFIGS, LlamaModel

    if implementation == "fake" or name == "fake":
        return make_fake_model(name=name, **fake_kwargs)

    key = name.lower().replace("meta-llama/", "").replace("openai-community/", "")
    kw = dict(rng=rng, dtype=dtype, checkpoint_path=checkpoint_path,
              quantized_init=quantized_init, quantize_embed=quantize_embed)
    if key in GPT2_CONFIGS:
        return GPT2Model.create(key, **kw)
    if key in LLAMA_CONFIGS:
        return LlamaModel.create(key, **kw)
    raise ValueError(
        f"unknown model {name!r}; known: "
        f"{sorted(GPT2_CONFIGS) + sorted(LLAMA_CONFIGS)} or implementation='fake'"
    )
