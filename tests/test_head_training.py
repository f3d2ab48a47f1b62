"""Medusa head training tests: distilled heads must beat identity-init
acceptance (the reference never trains its heads — pipeline.py:696-702)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_inference_lab_tpu.config import EngineConfig
from llm_inference_lab_tpu.core.engine import Engine
from llm_inference_lab_tpu.core.head_training import (
    collect_hidden_targets,
    self_distill_medusa,
    train_medusa_heads,
)
from llm_inference_lab_tpu.models.llama import LlamaModel


def tiny(seed=0):
    return LlamaModel.create("llama-tiny", rng=jax.random.PRNGKey(seed),
                             dtype=jnp.float32)


def test_collect_shapes():
    m = tiny()
    seqs = jnp.asarray(np.random.default_rng(0).integers(1, 255, (2, 20)),
                       jnp.int32)
    hid, tgt = collect_hidden_targets(m, seqs, num_heads=2)
    assert hid.shape == (2, 17, m.config.d_model)
    assert tgt.shape == (2, 17, 2)
    # Lookahead alignment: tgt[:, t, d] == seqs[:, t + 2 + d]
    assert int(tgt[0, 3, 1]) == int(seqs[0, 6])


def test_training_reduces_loss():
    m = tiny()
    rng = np.random.default_rng(1)
    seqs = jnp.asarray(rng.integers(1, 255, (4, 24)), jnp.int32)
    _, hist = train_medusa_heads(m, seqs, num_heads=2, steps=60, lr=5e-3)
    assert hist[-1] < hist[0], hist


def test_self_distillation_improves_acceptance():
    cfg = EngineConfig(implementation="hf", draft_model=None,
                       draft_mode="medusa", max_draft=2, max_new_tokens=32,
                       dtype="float32")
    eng = Engine(cfg, target_model=tiny())
    prompts = ["seed prompt one", "another seed", "third training prompt"]
    before = eng.generate("held out prompt")["acceptance_rate"]

    proj, hist = self_distill_medusa(eng, prompts, steps=120, lr=5e-3,
                                     tokens_per_prompt=48)
    assert proj.shape[0] == 2

    after = eng.generate("held out prompt")["acceptance_rate"]
    # Tiny random models emit near-periodic text — trained heads should
    # capture it clearly better than identity-init heads.
    assert after >= before, (before, after)
    assert after > 0.3, (before, after)

    # And the output must STILL equal the target's greedy continuation.
    base = Engine(EngineConfig(implementation="hf", draft_model=None,
                               max_new_tokens=32, dtype="float32"),
                  target_model=tiny())
    assert (
        eng.generate("held out prompt")["generated_ids"]
        == base.generate("held out prompt")["generated_ids"]
    )
