"""Checkpoint save/load roundtrip (green-field vs reference, SURVEY §5.4)."""

import jax
import jax.numpy as jnp
import numpy as np

from llm_inference_lab_tpu.models.checkpoint import load_params, save_params
from llm_inference_lab_tpu.models.llama import LlamaModel
from llm_inference_lab_tpu.ops.quant import QuantTensor, quantize_params


def test_roundtrip_plain(tmp_path):
    m = LlamaModel.create("llama-tiny", rng=jax.random.PRNGKey(0), dtype=jnp.float32)
    p = str(tmp_path / "m.safetensors")
    save_params(m.params, p)
    loaded = load_params(p)
    flat1 = jax.tree_util.tree_leaves_with_path(m.params)
    flat2 = {jax.tree_util.keystr(k): v for k, v in
             jax.tree_util.tree_leaves_with_path(loaded)}
    for k, v in flat1:
        key = jax.tree_util.keystr(k)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(flat2[key]))


def test_roundtrip_quantized(tmp_path):
    m = LlamaModel.create("llama-tiny", rng=jax.random.PRNGKey(1), dtype=jnp.float32)
    qparams = quantize_params(m.params, "int8", min_size=1024)
    p = str(tmp_path / "q.safetensors")
    save_params(qparams, p)
    loaded = load_params(p)

    def check(a, b):
        if isinstance(a, QuantTensor):
            assert isinstance(b, QuantTensor)
            assert b.bits == a.bits
            np.testing.assert_array_equal(np.asarray(a.data), np.asarray(b.data))
            np.testing.assert_array_equal(np.asarray(a.scale), np.asarray(b.scale))
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    jax.tree_util.tree_map(
        check, qparams, loaded,
        is_leaf=lambda x: isinstance(x, QuantTensor),
    )


def test_loaded_params_generate_identically(tmp_path):
    from llm_inference_lab_tpu.config import EngineConfig
    from llm_inference_lab_tpu.core.engine import Engine
    from llm_inference_lab_tpu.models.llama import LlamaModel as LM

    m1 = LM.create("llama-tiny", rng=jax.random.PRNGKey(2), dtype=jnp.float32)
    p = str(tmp_path / "gen.safetensors")
    save_params(m1.params, p)

    m2 = LM.create("llama-tiny", rng=jax.random.PRNGKey(99), dtype=jnp.float32)
    m2.params = load_params(p)

    e1 = Engine(EngineConfig(implementation="hf", draft_model=None,
                             max_new_tokens=8, dtype="float32"),
                target_model=m1)
    e2 = Engine(EngineConfig(implementation="hf", draft_model=None,
                             max_new_tokens=8, dtype="float32"),
                target_model=m2)
    assert e1.generate("ckpt")["generated_ids"] == e2.generate("ckpt")["generated_ids"]
