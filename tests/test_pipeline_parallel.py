"""Pipeline parallelism (parallel/pipeline.py) on the 8-virtual-device CPU
backend. The reference has no PP (Phase 4C "Planned",
/root/reference/README.md:393-395) — these mirror the TP test strategy:
sharded forward == replicated forward, then the engine end-to-end."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_inference_lab_tpu.config import EngineConfig
from llm_inference_lab_tpu.core.engine import Engine
from llm_inference_lab_tpu.models import transformer
from llm_inference_lab_tpu.models.base import Model, ModelConfig
from llm_inference_lab_tpu.parallel.mesh import make_mesh
from llm_inference_lab_tpu.parallel.pipeline import forward_pp
from llm_inference_lab_tpu.parallel.sharding import shard_params


def pp_model(layers=4, quant=None):
    cfg = ModelConfig(
        name="pp-test", arch="llama", vocab_size=128, n_layers=layers,
        n_heads=4, n_kv_heads=2, d_model=32, d_ff=64,
        max_position_embeddings=128, dtype=jnp.float32,
    )
    rng = jax.random.PRNGKey(7)
    if quant:
        params = transformer.init_params_quantized(cfg, rng, mode=quant)
    else:
        params = transformer.init_params(cfg, rng)
    return Model(config=cfg, params=params,
                 apply_fn=partial(transformer.forward, cfg),
                 head_fn=partial(transformer.lm_head_logits, cfg))


def run_both(m, stage, B=4, S=8, pre=0, microbatches=None, data=1, model=1):
    """Forward the same chunk through transformer.forward and forward_pp."""
    mesh = make_mesh(data=data, stage=stage, model=model)
    rng = jax.random.PRNGKey(0)
    tokens = jax.random.randint(rng, (B, S), 0, m.config.vocab_size)
    positions = jnp.broadcast_to(
        pre + jnp.arange(S, dtype=jnp.int32)[None], (B, S)
    )
    cache_lens = jnp.full((B,), pre, jnp.int32)
    cache = m.init_cache(B, 64)
    if pre:  # warm the cache so decode-style chunks attend to a prefix
        warm = jax.random.randint(jax.random.PRNGKey(1), (B, pre), 0,
                                  m.config.vocab_size)
        wpos = jnp.broadcast_to(jnp.arange(pre, dtype=jnp.int32)[None],
                                (B, pre))
        _, cache = transformer.forward(
            m.config, m.params, warm, wpos, cache, jnp.zeros((B,), jnp.int32)
        )
    ref_logits, ref_cache = transformer.forward(
        m.config, m.params, tokens, positions, cache, cache_lens
    )
    sharded = shard_params(m.params, mesh)
    pp_logits, pp_cache = jax.jit(
        partial(forward_pp, m.config, mesh, microbatches=microbatches)
    )(sharded, tokens, positions, cache, cache_lens)
    return (ref_logits, ref_cache), (pp_logits, pp_cache)


@pytest.mark.parametrize("stage", [2, 4])
def test_pp_forward_matches_prefill(stage):
    m = pp_model()
    (rl, rc), (pl, pc) = run_both(m, stage)
    np.testing.assert_allclose(np.asarray(pl), np.asarray(rl),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pc.k), np.asarray(rc.k),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pc.v), np.asarray(rc.v),
                               rtol=2e-4, atol=2e-4)


def test_pp_forward_matches_decode_chunk():
    """Nonzero cache_lens: the K+1-position verify chunk of the spec step."""
    m = pp_model()
    (rl, rc), (pl, pc) = run_both(m, 2, B=2, S=3, pre=5)
    np.testing.assert_allclose(np.asarray(pl), np.asarray(rl),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pc.k), np.asarray(rc.k),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("microbatches", [1, 2, 4])
def test_pp_microbatch_schedules_agree(microbatches):
    m = pp_model()
    (rl, _), (pl, _) = run_both(m, 2, B=4, microbatches=microbatches)
    np.testing.assert_allclose(np.asarray(pl), np.asarray(rl),
                               rtol=2e-4, atol=2e-4)


def test_pp_quantized_weights():
    m = pp_model(quant="int8")
    (rl, _), (pl, _) = run_both(m, 2)
    np.testing.assert_allclose(np.asarray(pl), np.asarray(rl),
                               rtol=2e-4, atol=2e-4)


def test_pp_composes_with_data_parallel():
    m = pp_model()
    (rl, _), (pl, _) = run_both(m, 2, B=4, data=2)
    np.testing.assert_allclose(np.asarray(pl), np.asarray(rl),
                               rtol=2e-4, atol=2e-4)


def test_pp_composes_with_tensor_parallel():
    """stage x model mesh: the shard_map is manual over stage only, so the
    Megatron TP shardings (and XLA's TP collectives) apply inside each
    stage's layers."""
    m = pp_model()
    (rl, rc), (pl, pc) = run_both(m, 2, model=2)
    np.testing.assert_allclose(np.asarray(pl), np.asarray(rl),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pc.k), np.asarray(rc.k),
                               rtol=2e-4, atol=2e-4)


def test_pp_composes_with_dp_and_tp():
    """Full 3D mesh data=2 x stage=2 x model=2 on the 8 virtual devices."""
    m = pp_model()
    (rl, _), (pl, _) = run_both(m, 2, B=4, data=2, model=2)
    np.testing.assert_allclose(np.asarray(pl), np.asarray(rl),
                               rtol=2e-4, atol=2e-4)


def test_engine_pp_tp_end_to_end():
    """Engine over a stage x model mesh == unsharded engine output."""
    from llm_inference_lab_tpu.models.llama import LlamaModel

    def mk(mesh_shape):
        return Engine(
            EngineConfig(
                implementation="hf", draft_model=None, greedy=True,
                max_new_tokens=10, max_seq_len=128, mesh_shape=mesh_shape,
            ),
            target_model=LlamaModel.create(
                "llama-tiny", rng=jax.random.PRNGKey(5), dtype=jnp.float32
            ),
        )

    base = mk({})
    pptp = mk({"stage": 2, "model": 2})
    prompt = "pipeline plus tensor parallel engine check"
    assert pptp.generate(prompt)["generated_ids"] == base.generate(
        prompt
    )["generated_ids"]


def test_pp_shards_layer_memory():
    """Stage s holds layers [s*L/S, (s+1)*L/S): per-device layer-param bytes
    must be total/stages."""
    m = pp_model(layers=4)
    mesh = make_mesh(stage=4)
    sharded = shard_params(m.params, mesh)
    w = sharded["layers"]["w_qkv"]
    assert len(w.addressable_shards) == 4
    for s in w.addressable_shards:
        assert s.data.shape[0] == 1  # 1 of 4 layers per device


def test_engine_pp_end_to_end():
    """Engine(mesh with stage axis) output == unsharded engine output."""
    from llm_inference_lab_tpu.models.llama import LlamaModel

    def mk(mesh_shape):
        return Engine(
            EngineConfig(
                implementation="hf", draft_model=None, greedy=True,
                max_new_tokens=12, max_seq_len=128, mesh_shape=mesh_shape,
            ),
            target_model=LlamaModel.create(
                "llama-tiny", rng=jax.random.PRNGKey(5), dtype=jnp.float32
            ),
        )

    base = mk({})
    pp = mk({"stage": 2})
    prompt = "pipeline parallel engine check"
    rb = base.generate(prompt)
    rp = pp.generate(prompt)
    assert rp["generated_ids"] == rb["generated_ids"]
    # Deterministic repeat under PP.
    assert pp.generate(prompt)["generated_ids"] == rp["generated_ids"]


def test_engine_pp_speculative():
    """PP target + ngram drafting (no draft model): output still equals the
    unsharded greedy sequence."""
    from llm_inference_lab_tpu.models.llama import LlamaModel

    tgt = lambda: LlamaModel.create("llama-tiny", rng=jax.random.PRNGKey(5),
                                    dtype=jnp.float32)
    base = Engine(
        EngineConfig(implementation="hf", draft_model=None, greedy=True,
                     max_new_tokens=12, max_seq_len=128),
        target_model=tgt(),
    )
    pp = Engine(
        EngineConfig(implementation="hf", draft_mode="ngram", max_draft=4,
                     greedy=True, max_new_tokens=12, max_seq_len=128,
                     mesh_shape={"stage": 2}),
        target_model=tgt(),
    )
    prompt = "the cat sat. the cat sat. the"
    assert pp.generate(prompt)["generated_ids"] == base.generate(
        prompt
    )["generated_ids"]


def test_pp_rejects_unsupported():
    m = pp_model()
    mesh = make_mesh(stage=2)
    with pytest.raises(ValueError):
        make_mesh(stage=2, seq=2)
    with pytest.raises(ValueError):
        Engine(
            EngineConfig(implementation="hf", draft_model=None,
                         kv_layout="paged", mesh_shape={"stage": 2},
                         max_seq_len=128),
            target_model=pp_model(),
        )
