"""Pallas-kernel vs jnp-reference equivalence (reference:
tests/test_kernels_verify.py:67 kernel-vs-reference tests; run in interpreter
mode on CPU, compiled on real TPU)."""

import os

os.environ["SPECDX_PALLAS_INTERPRET"] = "1"

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_inference_lab_tpu.ops.attention import attend_xla
from llm_inference_lab_tpu.ops.quant import (
    dequantize,
    quantize_int4,
    quantize_int8,
    quant_matmul_xla,
)
from llm_inference_lab_tpu.ops.verify import verify_prefix_xla

from llm_inference_lab_tpu.ops.pallas.flash_decode import flash_decode_attention
from llm_inference_lab_tpu.ops.pallas.quant_matmul import quant_matmul_pallas
from llm_inference_lab_tpu.ops.pallas.verify_pallas import verify_prefix_pallas


@pytest.mark.parametrize("bits", [8, 4])
def test_quant_roundtrip_error_bounded(bits):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32))
    qt = quantize_int8(w) if bits == 8 else quantize_int4(w)
    deq = dequantize(qt, jnp.float32)
    max_q = 127 if bits == 8 else 7
    # Error bounded by half a quantization step per channel.
    step = np.asarray(qt.scale)
    err = np.abs(np.asarray(deq) - np.asarray(w))
    assert (err <= step[None, :] * 0.51 + 1e-6).all()
    assert np.abs(np.asarray(qt.data)).max() <= max_q if bits == 8 else True


@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize(
    # N=512/1024 exercise the wider BN tile-selection branches (ADVICE r2).
    "M,K,N", [(4, 256, 128), (16, 512, 256), (4, 256, 512), (4, 256, 1024)]
)
def test_quant_matmul_pallas_matches_xla(bits, M, K, N):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
    qt = quantize_int8(w) if bits == 8 else quantize_int4(w)
    ref = quant_matmul_xla(x, qt)
    out = quant_matmul_pallas(x, qt, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_quant_matmul_accuracy_vs_fp():
    """int8 matmul must be close to the fp matmul (per-channel scales)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(8, 256)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32))
    qt = quantize_int8(w)
    exact = x @ w
    q = quant_matmul_pallas(x, qt, interpret=True)
    rel = np.linalg.norm(np.asarray(q) - np.asarray(exact)) / np.linalg.norm(
        np.asarray(exact)
    )
    assert rel < 0.01, rel


@pytest.mark.parametrize("V", [1024, 2048])
def test_verify_prefix_pallas_matches_xla(V):
    rng = np.random.default_rng(3)
    B, K = 3, 4
    logits = jnp.asarray(rng.normal(size=(B, K, V)).astype(np.float32))
    draft = jnp.asarray(rng.integers(0, V, (B, K)).astype(np.int32))
    # Mix in planted matches so accept_len > 0 sometimes.
    draft = draft.at[0].set(jnp.argmax(logits[0], axis=-1).astype(jnp.int32))
    n_ref, m_ref = verify_prefix_xla(draft, logits)
    n_pl, m_pl = verify_prefix_pallas(draft, logits, interpret=True)
    assert n_ref.tolist() == n_pl.tolist()
    assert m_ref.tolist() == m_pl.tolist()


def test_verify_prefix_pallas_tie_break():
    B, K, V = 1, 2, 2048
    logits = jnp.zeros((B, K, V), jnp.float32)  # all equal -> argmax 0
    draft = jnp.array([[0, 5]], jnp.int32)
    n, _ = verify_prefix_pallas(draft, logits, interpret=True)
    assert n.tolist() == [1]


@pytest.mark.parametrize("S,group", [(1, 1), (5, 2)])
def test_flash_decode_matches_xla(S, group):
    rng = np.random.default_rng(4)
    B, KVH, D, T = 2, 2, 128, 256
    H = KVH * group
    q = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, KVH, T, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, KVH, T, D)).astype(np.float32))
    positions = jnp.asarray(
        np.stack([np.arange(10, 10 + S), np.arange(100, 100 + S)]).astype(np.int32)
    )
    ref = attend_xla(q, k, v, positions)
    out = flash_decode_attention(q, k, v, positions, interpret=True, block_t=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize("group", [1, 2])
def test_flash_prefill_matches_xla(quantized, group):
    """Prefill flash kernel (query-block sweep) vs the XLA score-matrix
    path, fp and int8 caches, GQA, and a nonzero chunk base (chunked
    prefill resumes mid-sequence)."""
    from llm_inference_lab_tpu.ops.pallas.flash_prefill import (
        flash_prefill_attention,
    )

    rng = np.random.default_rng(5)
    B, KVH, D, S, T = 2, 2, 128, 256, 512
    H = KVH * group
    q = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    if quantized:
        k = jnp.asarray(rng.integers(-127, 128, size=(B, KVH, T, D)), jnp.int8)
        v = jnp.asarray(rng.integers(-127, 128, size=(B, KVH, T, D)), jnp.int8)
        ks = jnp.asarray(rng.uniform(0.01, 0.02, size=(B, KVH, T)), jnp.float32)
        vs = jnp.asarray(rng.uniform(0.01, 0.02, size=(B, KVH, T)), jnp.float32)
    else:
        k = jnp.asarray(rng.normal(size=(B, KVH, T, D)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, KVH, T, D)).astype(np.float32))
        ks = vs = None
    # Row 0 prefills from 0; row 1 is a chunk resuming at base position 128.
    positions = jnp.stack(
        [jnp.arange(S), 128 + jnp.arange(S)]
    ).astype(jnp.int32)
    ref = attend_xla(q, k, v, positions, ks, vs)
    out = flash_prefill_attention(
        q, k, v, positions, ks, vs, interpret=True, block_s=128, block_t=128
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3,
                               atol=2e-3)


def test_decode_attention_dispatch_long_s_uses_prefill_kernel(monkeypatch):
    """The registry op must route S>32 to the prefill kernel when shapes
    allow (the old behavior silently fell back to the O(S*T) XLA path)."""
    import llm_inference_lab_tpu.ops.pallas.flash_prefill as fp
    from llm_inference_lab_tpu.ops.pallas.flash_decode import _kernel_wrapper

    calls = []
    orig = fp.flash_prefill_attention

    def spy(*a, **kw):
        calls.append(kw.get("block_s"))
        return orig(*a, **kw)

    monkeypatch.setattr(fp, "flash_prefill_attention", spy)
    rng = np.random.default_rng(6)
    B, S, H, D, T = 1, 128, 2, 128, 256
    q = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, 2, T, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, 2, T, D)).astype(np.float32))
    positions = jnp.arange(S, dtype=jnp.int32)[None]
    out = _kernel_wrapper(q, k, v, positions)
    assert calls == [128]
    ref = attend_xla(q, k, v, positions)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3,
                               atol=2e-3)


@pytest.mark.parametrize("quantized", [False, True])
def test_paged_flash_matches_xla_reference(quantized):
    """Paged flash kernel (page-table indirection) vs the gather+attend XLA
    reference, fp and int8 pools."""
    from llm_inference_lab_tpu.ops.paged_attention import paged_attend_xla
    from llm_inference_lab_tpu.ops.pallas.paged_flash import paged_flash_attention

    rng = np.random.default_rng(3)
    B, S, KVH, group, D, P, M, N = 2, 4, 2, 2, 128, 32, 3, 8
    H = KVH * group
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    if quantized:
        k_pool = jnp.asarray(rng.integers(-127, 128, size=(N, KVH, P, D)), jnp.int8)
        v_pool = jnp.asarray(rng.integers(-127, 128, size=(N, KVH, P, D)), jnp.int8)
        ks = jnp.asarray(rng.uniform(0.01, 0.02, size=(N, KVH, P)), jnp.float32)
        vs = jnp.asarray(rng.uniform(0.01, 0.02, size=(N, KVH, P)), jnp.float32)
    else:
        k_pool = jnp.asarray(rng.normal(size=(N, KVH, P, D)), jnp.float32)
        v_pool = jnp.asarray(rng.normal(size=(N, KVH, P, D)), jnp.float32)
        ks = vs = None
    table = jnp.asarray(rng.permutation(N - 1)[: B * M].reshape(B, M) + 1, jnp.int32) % N
    # positions mid-sequence: queries at rows [40, 44) of each sequence
    positions = 40 + jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))

    want = paged_attend_xla(q, k_pool, v_pool, positions, ks, vs, table)
    got = paged_flash_attention(
        q, k_pool, v_pool, positions, ks, vs, table, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-4)


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize(
    "kw",
    [
        dict(window=64),
        dict(softcap=30.0),
        dict(scale=0.0884),
        dict(window=64, softcap=20.0, scale=0.0884),  # gemma2 local layer
    ],
)
def test_flash_decode_window_softcap_scale_matches_xla(quantized, kw):
    """Sliding-window / softcap / custom-scale flash variants (Mistral,
    gemma2) vs attend_xla — previously these fell back to the XLA path."""
    rng = np.random.default_rng(7)
    B, S, KVH, group, D, T = 2, 3, 2, 2, 128, 256
    H = KVH * group
    q = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    if quantized:
        k = jnp.asarray(rng.integers(-127, 128, size=(B, KVH, T, D)), jnp.int8)
        v = jnp.asarray(rng.integers(-127, 128, size=(B, KVH, T, D)), jnp.int8)
        ks = jnp.asarray(rng.uniform(0.01, 0.02, size=(B, KVH, T)), jnp.float32)
        vs = jnp.asarray(rng.uniform(0.01, 0.02, size=(B, KVH, T)), jnp.float32)
    else:
        k = jnp.asarray(rng.normal(size=(B, KVH, T, D)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(B, KVH, T, D)).astype(np.float32))
        ks = vs = None
    # Row 0 deep enough that window=64 binds (p=200 > 64); row 1 shallow.
    positions = jnp.asarray(
        np.stack([200 + np.arange(S), 30 + np.arange(S)]).astype(np.int32)
    )
    ref = attend_xla(q, k, v, positions, ks, vs, **kw)
    out = flash_decode_attention(
        q, k, v, positions, ks, vs, interpret=True, block_t=128, **kw
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3,
                               atol=2e-3)


@pytest.mark.parametrize("kw", [dict(window=100), dict(softcap=30.0)])
def test_flash_prefill_window_softcap_matches_xla(kw):
    """Prefill kernel with window/softcap (incl. the window tile skip) vs
    attend_xla at S=T=512, window binding for most queries."""
    from llm_inference_lab_tpu.ops.pallas.flash_prefill import (
        flash_prefill_attention,
    )

    rng = np.random.default_rng(8)
    B, KVH, group, D, S, T = 1, 2, 2, 128, 512, 512
    H = KVH * group
    q = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, KVH, T, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, KVH, T, D)).astype(np.float32))
    positions = jnp.arange(S, dtype=jnp.int32)[None]
    ref = attend_xla(q, k, v, positions, **kw)
    out = flash_prefill_attention(
        q, k, v, positions, interpret=True, block_s=128, block_t=128, **kw
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3,
                               atol=2e-3)


def test_decode_attention_dispatch_window_on_traced():
    """The registry op must stay on the flash path for gemma2's TRACED
    per-layer window gate: lax.cond selects the windowed or global kernel
    under jit, matching attend_xla for both gate values."""
    from llm_inference_lab_tpu.ops.pallas.flash_decode import _kernel_wrapper

    rng = np.random.default_rng(9)
    B, S, KVH, group, D, T = 1, 2, 2, 1, 128, 256
    H = KVH * group
    q = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, KVH, T, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, KVH, T, D)).astype(np.float32))
    positions = jnp.asarray([[180, 181]], jnp.int32)

    fn = jax.jit(
        lambda won: _kernel_wrapper(
            q, k, v, positions, window=64, window_on=won, softcap=25.0
        )
    )
    for gate in (True, False):
        ref = attend_xla(
            q, k, v, positions, window=64,
            window_on=jnp.asarray(gate), softcap=25.0,
        )
        np.testing.assert_allclose(
            np.asarray(fn(jnp.asarray(gate))), np.asarray(ref),
            rtol=2e-3, atol=2e-3,
        )


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize(
    "kw", [dict(window=48), dict(softcap=25.0, scale=0.1), dict()]
)
def test_paged_flash_window_softcap_matches_xla(quantized, kw):
    """Paged flash with the gemma2/Mistral variants + the live-page clamp
    (start/last scalar-prefetch aux) vs the gather+attend XLA reference.
    Sequences sit at very different depths so the clamp actually varies."""
    from llm_inference_lab_tpu.ops.paged_attention import paged_attend_xla
    from llm_inference_lab_tpu.ops.pallas.paged_flash import paged_flash_attention

    rng = np.random.default_rng(11)
    B, S, KVH, group, D, P, M, N = 2, 3, 2, 2, 128, 32, 6, 16
    H = KVH * group
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    if quantized:
        k_pool = jnp.asarray(rng.integers(-127, 128, size=(N, KVH, P, D)), jnp.int8)
        v_pool = jnp.asarray(rng.integers(-127, 128, size=(N, KVH, P, D)), jnp.int8)
        ks = jnp.asarray(rng.uniform(0.01, 0.02, size=(N, KVH, P)), jnp.float32)
        vs = jnp.asarray(rng.uniform(0.01, 0.02, size=(N, KVH, P)), jnp.float32)
    else:
        k_pool = jnp.asarray(rng.normal(size=(N, KVH, P, D)), jnp.float32)
        v_pool = jnp.asarray(rng.normal(size=(N, KVH, P, D)), jnp.float32)
        ks = vs = None
    table = jnp.asarray(
        rng.permutation(N - 1)[: B * M].reshape(B, M) + 1, jnp.int32
    ) % N
    # Row 0 deep (page 5 of 6: window=48 binds, pages 0-3 are dead for it);
    # row 1 shallow (page 0: pages 1-5 dead above it).
    positions = jnp.asarray(
        np.stack([170 + np.arange(S), 5 + np.arange(S)]).astype(np.int32)
    )
    want = paged_attend_xla(q, k_pool, v_pool, positions, ks, vs, table, **kw)
    got = paged_flash_attention(
        q, k_pool, v_pool, positions, ks, vs, table, interpret=True, **kw
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4,
                               rtol=2e-3)


def test_paged_dispatch_window_on_traced():
    """Traced gemma2 gate on the paged op: lax.cond between windowed and
    global paged kernels under jit, both matching the XLA reference."""
    from llm_inference_lab_tpu.ops.paged_attention import paged_attend_xla
    from llm_inference_lab_tpu.ops.pallas.paged_flash import _wrapper

    rng = np.random.default_rng(12)
    B, S, KVH, group, D, P, M, N = 1, 2, 2, 1, 128, 32, 4, 8
    H = KVH * group
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    k_pool = jnp.asarray(rng.normal(size=(N, KVH, P, D)), jnp.float32)
    v_pool = jnp.asarray(rng.normal(size=(N, KVH, P, D)), jnp.float32)
    table = jnp.asarray([[2, 5, 1, 7]], jnp.int32)
    positions = jnp.asarray([[100, 101]], jnp.int32)
    fn = jax.jit(
        lambda won: _wrapper(
            q, k_pool, v_pool, positions, None, None, table,
            window=40, window_on=won, softcap=25.0,
        )
    )
    for gate in (True, False):
        ref = paged_attend_xla(
            q, k_pool, v_pool, positions, None, None, table,
            window=40, window_on=jnp.asarray(gate), softcap=25.0,
        )
        np.testing.assert_allclose(
            np.asarray(fn(jnp.asarray(gate))), np.asarray(ref),
            rtol=2e-3, atol=2e-4,
        )
