"""Prefill flash-attention microbench: Pallas flash_prefill vs XLA reference.

The long-context axis's single-chip criterion (VERDICT round 1, item 2): the
Pallas prefill kernel should beat `attend_xla`'s O(S*T) score materialization
at S >= 2k. Shapes mirror the llama-3.2-3b flagship (24 q heads / 8 KV heads,
head_dim 128 — the kernel requires D % 128 == 0, so the 1B's 64-dim heads
take the XLA path by design).

Run on TPU:  python scripts/microbench_prefill.py
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


def timeit(fn, *args, iters=10, warmup=3):
    # Scalar fetch, not block_until_ready: the tunneled TPU runtime acks
    # block_until_ready early, which under-reports by >100x at these sizes.
    for _ in range(warmup):
        np.asarray(fn(*args).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out.ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    from llm_inference_lab_tpu.ops.attention import attend_xla
    from llm_inference_lab_tpu.ops.pallas.flash_prefill import (
        flash_prefill_attention,
        pick_block_s,
    )
    from llm_inference_lab_tpu.models.base import _quantize_rows

    on_tpu = jax.default_backend() == "tpu"
    H, KV, D = 24, 8, 128  # llama-3.2-3b attention geometry
    group = H // KV
    rng = np.random.default_rng(0)
    rows = []
    for S in (1024, 2048, 4096, 8192):
        T = S  # prefill: cache sized to the prompt
        B = 1
        q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, KV, T, D)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, KV, T, D)), jnp.bfloat16)
        pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))

        xla_f = jax.jit(attend_xla)
        row = {"op": "prefill_attention", "B": B, "S": S, "T": T,
               "H": H, "KV": KV, "D": D,
               "xla_ms": timeit(xla_f, q, k, v, pos)}
        if on_tpu:
            bs = pick_block_s(S, group)
            bt = 512 if T % 512 == 0 else 256
            row["block_s"], row["block_t"] = bs, bt
            row["pallas_ms"] = timeit(
                lambda *a: flash_prefill_attention(*a, block_s=bs, block_t=bt),
                q, k, v, pos,
            )
            # correctness spot-check at this shape
            out_p = flash_prefill_attention(q, k, v, pos, block_s=bs, block_t=bt)
            out_x = xla_f(q, k, v, pos)
            err = float(jnp.max(jnp.abs(out_p.astype(jnp.float32)
                                        - out_x.astype(jnp.float32))))
            row["max_abs_err"] = err
            # int8 KV variant
            qk, ks = _quantize_rows(k)
            qv, vs = _quantize_rows(v)
            row["pallas_int8_ms"] = timeit(
                lambda *a: flash_prefill_attention(*a, block_s=bs, block_t=bt),
                q, qk, qv, pos, ks, vs,
            )
        rows.append(row)
        print(json.dumps(row))
    return rows


if __name__ == "__main__":
    main()
