"""Runtime KV-alignment debug mode (reference
src/specdec/core/kv_cache_verification.py:63-189, SPECDEC_DEBUG_KV_VERIFY)."""

import jax.numpy as jnp
import pytest

from llm_inference_lab_tpu.config import EngineConfig, EnvFlags
from llm_inference_lab_tpu.core.engine import Engine
from llm_inference_lab_tpu.core.kv_verify import (
    compute_kv_checksum,
    kv_alignment_report,
)


def _engine(**kw):
    flags = EnvFlags(debug_kv_verify=True)
    cfg = EngineConfig(
        base_model="llama-tiny", draft_model="llama-tiny", implementation="hf",
        max_draft=2, max_new_tokens=8, dtype="float32", **kw,
    )
    return Engine(cfg, flags=flags)


def test_spec_decode_kv_is_aligned():
    eng = _engine()
    r = eng.generate("kv alignment check prompt")
    assert "kv_verify" in r
    assert r["kv_verify"]["aligned"], r["kv_verify"]
    assert r["kv_verify"]["committed_rows"] > 0
    # Checksums of live and recomputed caches agree to rounding.
    live, fresh = r["kv_verify"]["checksum_live"], r["kv_verify"]["checksum_fresh"]
    assert abs(live - fresh) / max(fresh, 1.0) < 1e-2


def test_misalignment_is_detected():
    """Corrupting committed cache rows must flip the report to misaligned."""
    from llm_inference_lab_tpu.core.state import init_state

    eng = _engine()
    r = eng.generate("detect corruption")
    # Rebuild a state at the generated tokens but with a corrupted cache.
    import jax

    state = init_state(eng.target, eng.draft, 1, 64, max_new_tokens=8)
    ids = eng.tokenizer.encode("detect corruption") + r["generated_ids"]
    tokens = jnp.zeros((1, 64), jnp.int32).at[0, : len(ids)].set(jnp.asarray(ids))
    state = state.replace(
        tokens=tokens,
        lengths=jnp.full((1,), len(ids), jnp.int32),
        target_cache=state.target_cache.__class__(
            k=state.target_cache.k + 7.0,  # garbage rows
            v=state.target_cache.v,
            k_scale=state.target_cache.k_scale,
            v_scale=state.target_cache.v_scale,
        ),
    )
    rep = kv_alignment_report(eng.target, eng.target.params, state)
    assert not rep["aligned"]


def test_checksum_masks_uncommitted_rows():
    from llm_inference_lab_tpu.models.base import KVCache, ModelConfig

    cfg = ModelConfig(n_layers=1, n_heads=2, n_kv_heads=2, d_model=8)
    cache = KVCache.create(cfg, batch_size=1, max_seq_len=16)
    cache = KVCache(
        k=cache.k.at[:, :, :, 10:].set(99.0),  # beyond any committed length
        v=cache.v, k_scale=cache.k_scale, v_scale=cache.v_scale,
    )
    assert compute_kv_checksum(cache, jnp.array([5])) == 0.0
