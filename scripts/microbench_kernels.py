"""Kernel microbenchmarks: Pallas vs XLA-reference implementations.

Reference parity: scripts/microbench_verify.py:20 (verify_prefix kernel vs
torch-ref over a (B, K, V) grid, warmup + timing). Extended to the quant
matmul and flash-decode attention kernels — the numbers that justify the
Pallas layer.

Run on TPU:  python scripts/microbench_kernels.py
On CPU it times the XLA references only (Pallas needs hardware or
SPECDX_PALLAS_INTERPRET=1, which is not a perf mode).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def bench_verify():
    from llm_inference_lab_tpu.ops.verify import verify_prefix_xla

    rows = []
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from llm_inference_lab_tpu.ops.pallas.verify_pallas import verify_prefix_pallas
    rng = np.random.default_rng(0)
    for B, K, V in [(1, 4, 32768), (8, 4, 32768), (8, 8, 131072)]:
        logits = jnp.asarray(rng.normal(size=(B, K, V)).astype(np.float32))
        draft = jnp.asarray(rng.integers(0, V, (B, K)).astype(np.int32))
        xla_f = jax.jit(verify_prefix_xla)
        row = {"op": "verify_prefix", "B": B, "K": K, "V": V,
               "xla_ms": timeit(xla_f, draft, logits)}
        if on_tpu:
            row["pallas_ms"] = timeit(
                lambda d, l: verify_prefix_pallas(d, l), draft, logits
            )
        rows.append(row)
    return rows


def bench_quant_matmul():
    from llm_inference_lab_tpu.ops.quant import quantize, quant_matmul_xla

    rows = []
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from llm_inference_lab_tpu.ops.pallas.quant_matmul import quant_matmul_pallas
    rng = np.random.default_rng(1)
    for M, K, N, bits in [(8, 3072, 3072, 8), (8, 3072, 8192, 8),
                          (8, 4096, 14336, 8), (8, 3072, 3072, 4),
                          (8, 4096, 14336, 4)]:
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
        qt = quantize(w, f"int{bits}")
        wb = w.astype(jnp.bfloat16)
        bf16_f = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32))
        xla_f = jax.jit(quant_matmul_xla)
        row = {
            "op": f"quant_matmul_int{bits}", "M": M, "K": K, "N": N,
            "bf16_ms": timeit(bf16_f, x, wb),
            "xla_dequant_ms": timeit(xla_f, x, qt),
        }
        if on_tpu:
            row["pallas_ms"] = timeit(lambda a, q: quant_matmul_pallas(a, q), x, qt)
        rows.append(row)
    return rows


def bench_attention():
    from llm_inference_lab_tpu.ops.attention import attend_xla

    rows = []
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from llm_inference_lab_tpu.ops.pallas.flash_decode import flash_decode_attention
    rng = np.random.default_rng(2)
    for B, S, H, KVH, D, T in [(1, 5, 24, 8, 128, 2048), (8, 5, 24, 8, 128, 2048),
                               (1, 1, 32, 8, 128, 8192)]:
        q = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32)).astype(jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, KVH, T, D)).astype(np.float32)).astype(jnp.bfloat16)
        v = k
        pos = jnp.broadcast_to(jnp.arange(T - S, T, dtype=jnp.int32)[None], (B, S))
        xla_f = jax.jit(attend_xla)
        row = {"op": "decode_attention", "B": B, "S": S, "H": H, "T": T,
               "xla_ms": timeit(xla_f, q, k, v, pos)}
        if on_tpu:
            row["pallas_ms"] = timeit(
                lambda *a: flash_decode_attention(*a), q, k, v, pos
            )
        rows.append(row)
    return rows


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    for name, fn in [("verify_prefix", bench_verify),
                     ("quant_matmul", bench_quant_matmul),
                     ("decode_attention", bench_attention)]:
        try:
            for row in fn():
                print(json.dumps(row), flush=True)
        except Exception as e:
            print(json.dumps({"op": name, "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
