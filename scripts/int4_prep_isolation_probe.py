"""Isolate the int4 kernel's per-call fixed overhead: is x-prep the gap?

int4_bk_split_r5.json killed the ramp hypothesis: tile shape does not move
the small-shape efficiency (heuristic 56.9% vs best split 57.4% on
(3072,3072)), so the ~3-6 us per-call gap vs speed-of-light is a FIXED
cost. One candidate: the xd/xh/corr activation prep (quant_matmul.py
:243-249) is an XLA fusion serialized between the previous kernel's output
and the next pallas_call — a scheduling bubble plus an HBM round trip of
the prepped activations.

A/B (stacked path, L=4, same slope-timed chain as the sweep):
  in_loop      — the chain feeds back y -> x, so every iteration re-runs
                 the halve/prescale/subtract/rowsum prep (what the model's
                 layer scan does) before the kernel.
  prep_fusion  — a chain whose per-iter work is ONLY the prep fusion
                 (no kernel): its slope is the prep's standalone cost.

If prep_fusion is a material fraction of in_loop, folding the prep into
the kernel (tile-wise t/b split + corr accumulation in scratch) is worth
the kernel surgery; if it is noise-sized, the fixed cost is Mosaic
invocation itself and no kernel change can recover it.

Run: python scripts/int4_prep_isolation_probe.py
Artifact: docs/results/serving/int4_prep_isolation_r5.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

L = 4
OUT = "docs/results/serving/int4_prep_isolation_r5.json"
SHAPES = [(3072, 3072), (3072, 5120), (3072, 16384)]


def slope(fn_make, lo=200, hi=2200):
    import jax

    c_lo, c_hi = fn_make(lo), fn_make(hi)

    def run(c):
        t0 = time.perf_counter()
        jax.device_get(c().ravel()[:1])
        return (time.perf_counter() - t0) * 1e3

    run(c_lo), run(c_hi)
    t_lo = sorted(run(c_lo) for _ in range(5))[2]
    t_hi = sorted(run(c_hi) for _ in range(5))[2]
    return (t_hi - t_lo) / (hi - lo)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from llm_inference_lab_tpu.ops.pallas.quant_matmul import (
        quant_matmul_pallas,
    )
    from llm_inference_lab_tpu.ops.quant import QuantTensor, quantize_int4

    os.environ["SPECDX_INT4_TILE_TABLE"] = "0"

    rng = np.random.default_rng(0)
    results = []
    for K, N in SHAPES:
        q4 = quantize_int4(jnp.asarray(
            rng.normal(size=(K, N)).astype(np.float32)
        ))
        q4s = QuantTensor(
            jnp.broadcast_to(q4.data, (L, *q4.data.shape)).copy(),
            jnp.broadcast_to(q4.scale, (L, *q4.scale.shape)).copy(),
            bits=4,
        )
        sol = K * N / 2 / 819e9 * 1e3
        x0 = jnp.ones((16, K), jnp.bfloat16)

        def make_in_loop(iters):
            @jax.jit
            def chain():
                def body(c, li):
                    y = quant_matmul_pallas(c, q4s, layer_idx=li)
                    pad = max(0, K - y.shape[1])
                    fb = jnp.pad(y, ((0, 0), (0, pad)))[:, :K]
                    return c + fb.astype(c.dtype) * 1e-9, None

                lis = jnp.arange(iters, dtype=jnp.int32) % L
                return jax.lax.scan(body, x0, lis)[0]

            return chain

        t_in = slope(make_in_loop)

        # Measure the prep's cost directly: a chain whose per-iter work is
        # ONLY the prep fusion (no kernel). t_prep bounds what in-kernel
        # prep fusion could save per call (plus any custom-call scheduling
        # bubble, which this cannot see).
        def make_prep_only(iters):
            half = K // 2

            @jax.jit
            def chain():
                def body(c, _):
                    x_lo = c[:, :half]
                    x_hi = c[:, half:] * jnp.asarray(0.0625, c.dtype)
                    x_d = x_lo - x_hi
                    corr = -8.0 * jnp.sum(
                        x_lo.astype(jnp.float32), axis=-1, keepdims=True)
                    y = jnp.concatenate([x_d, x_hi], axis=1)
                    return c + (y * corr.astype(y.dtype)) * jnp.asarray(
                        1e-9, c.dtype), None

                return jax.lax.scan(body, x0, None, length=iters)[0]

            return chain

        t_prep = slope(make_prep_only)
        results.append({
            "K": K, "N": N, "stacked_L": L, "SoL_ms": round(sol, 4),
            "in_loop_ms": round(t_in, 4),
            "prep_fusion_ms": round(t_prep, 4),
            "prep_pct_of_call": round(100 * t_prep / t_in, 1),
            "pct_SoL": round(100 * sol / t_in, 1),
        })
        print(json.dumps(results[-1]), flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
