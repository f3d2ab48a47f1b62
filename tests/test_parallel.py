"""Sharding/mesh tests on the 8-virtual-device CPU backend (the multi-chip
tier the reference has no analogue for, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_inference_lab_tpu.config import EngineConfig
from llm_inference_lab_tpu.core.engine import Engine
from llm_inference_lab_tpu.models.base import Model, ModelConfig
from llm_inference_lab_tpu.models import transformer
from llm_inference_lab_tpu.parallel.mesh import make_mesh
from llm_inference_lab_tpu.parallel.sharding import _spec_for, shard_params

from functools import partial


def tp_model(model_ax: int, layers: int = 2, rng_seed: int = 0):
    cfg = ModelConfig(
        name="tp-test", arch="llama", vocab_size=256, n_layers=layers,
        n_heads=2 * model_ax, n_kv_heads=model_ax, d_model=16 * model_ax,
        d_ff=32 * model_ax, dtype=jnp.float32, max_position_embeddings=256,
    )
    params = transformer.init_params(cfg, jax.random.PRNGKey(rng_seed))
    return Model(config=cfg, params=params,
                 apply_fn=partial(transformer.forward, cfg),
                 head_fn=partial(transformer.lm_head_logits, cfg))


def test_spec_rules():
    P = jax.sharding.PartitionSpec
    assert _spec_for("['layers']['w_qkv']", 3) == P(None, None, "model")
    assert _spec_for("['layers']['wo']", 3) == P(None, "model", None)
    assert _spec_for("['embed']", 2) == P("model", None)
    assert _spec_for("['layers']['attn_norm_scale']", 2) == P()


def test_sharding_actually_distributes():
    """Guard against silently-replicated params (rules must match keystr)."""
    mesh = make_mesh(data=1, model=4)
    m = tp_model(4)
    sharded = shard_params(m.params, mesh)
    wq = sharded["layers"]["w_qkv"]
    # w_qkv's last dim must be split over 'model', i.e. each shard smaller.
    shard_shape = wq.sharding.shard_shape(wq.shape)
    assert shard_shape[-1] == wq.shape[-1] // 4


def test_mesh_creation():
    mesh = make_mesh(data=2, model=4)
    assert mesh.shape == {"data": 2, "model": 4}
    with pytest.raises(ValueError):
        make_mesh(data=4, model=4)  # only 8 devices


def test_sharded_forward_matches_single_device():
    """TP forward == replicated forward (GSPMD collectives are exact)."""
    mesh = make_mesh(data=1, model=4)
    m = tp_model(4)
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, 255, (2, 6)),
                         jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(6, dtype=jnp.int32)[None], (2, 6))
    lens = jnp.zeros((2,), jnp.int32)

    ref_logits, _ = m.apply(m.params, tokens, pos, m.init_cache(2, 32), lens)

    sharded = shard_params(m.params, mesh)
    with jax.set_mesh(mesh):
        out_logits, _ = jax.jit(m.apply_fn)(
            sharded, tokens, pos, m.init_cache(2, 32), lens
        )
    np.testing.assert_allclose(
        np.asarray(out_logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4
    )


def test_engine_with_mesh_end_to_end():
    mesh = make_mesh(data=2, model=2)
    target = tp_model(2, layers=2, rng_seed=1)
    draft = tp_model(2, layers=1, rng_seed=2)
    eng = Engine(
        EngineConfig(implementation="hf", max_draft=2, max_new_tokens=8,
                     dtype="float32", shard_draft=True),
        target_model=target,
        draft_model=draft,
        mesh=mesh,
    )
    rs = eng.generate_batch(["mesh prompt one", "mesh prompt two"])
    assert all(r["generated_tokens"] > 0 for r in rs)

    # Same engine without a mesh must produce identical tokens (sharding
    # must not change numerics).
    target2 = tp_model(2, layers=2, rng_seed=1)
    draft2 = tp_model(2, layers=1, rng_seed=2)
    eng2 = Engine(
        EngineConfig(implementation="hf", max_draft=2, max_new_tokens=8,
                     dtype="float32"),
        target_model=target2,
        draft_model=draft2,
    )
    rs2 = eng2.generate_batch(["mesh prompt one", "mesh prompt two"])
    assert [r["generated_ids"] for r in rs] == [r["generated_ids"] for r in rs2]


def test_engine_seq_parallel_ring_prefill():
    """Engine with a seq axis routes single-shot prefill through ring
    attention (sequence sharded, KV rotating over ppermute); output must be
    identical to the unsharded engine — sharding never changes numerics."""
    prompts = ["ring prefill prompt " * 4, "a shorter one"]
    kw = dict(implementation="hf", max_draft=2, max_new_tokens=8,
              dtype="float32", shard_draft=True)

    mesh = make_mesh(data=1, seq=4, model=2)
    eng = Engine(EngineConfig(**kw), target_model=tp_model(2, layers=2, rng_seed=1),
                 draft_model=tp_model(2, layers=1, rng_seed=2), mesh=mesh)
    rs = eng.generate_batch(prompts)

    kw.pop("shard_draft")
    eng2 = Engine(EngineConfig(**kw), target_model=tp_model(2, layers=2, rng_seed=1),
                 draft_model=tp_model(2, layers=1, rng_seed=2))
    rs2 = eng2.generate_batch(prompts)
    assert [r["generated_ids"] for r in rs] == [r["generated_ids"] for r in rs2]


def test_seq_parallel_rejects_chunked_prefill():
    mesh = make_mesh(data=1, seq=4, model=2)
    with pytest.raises(ValueError):
        Engine(
            EngineConfig(implementation="hf", dtype="float32",
                         prefill_chunk=64),
            target_model=tp_model(2), draft_model=tp_model(2), mesh=mesh,
        )


def test_multihost_helpers_single_process():
    from llm_inference_lab_tpu.parallel.multihost import (
        initialize_multihost,
        make_multihost_mesh,
    )

    info = initialize_multihost()
    assert info["process_count"] == 1
    mesh = make_multihost_mesh(model_per_host=4)
    assert mesh.shape["model"] == 4
    assert mesh.shape["data"] == 2


def test_embed4_sharding_distributes_vocab():
    """EmbedQuant4's vocab axis must shard on 'model' in BOTH layouts
    (head [D/2, V] axis 1; row-lookup [V, D/2] axis 0) and the scale."""
    import numpy as np

    from llm_inference_lab_tpu.ops.quant import quantize_embed4

    mesh = make_mesh(data=1, model=4)
    e = jnp.asarray(
        np.random.default_rng(0).normal(size=(256, 16)).astype(np.float32)
    )
    sharded = shard_params({"embed": quantize_embed4(e)}, mesh)["embed"]
    assert sharded.qt.data.sharding.shard_shape(
        sharded.qt.data.shape
    ) == (8, 64)
    assert sharded.rq.sharding.shard_shape(sharded.rq.shape) == (64, 8)
    assert sharded.qt.scale.sharding.shard_shape((256,)) == (64,)
