"""int4 Pallas dequant-matmul (BN, BK) tile sweep — STACKED-path retune.

Round 4 adopted `_INT4_TILES` from a sweep (scripts/int4_tile_sweep.py)
that benched the FLAT `quant_matmul_pallas(x, qt)` form — but the model's
layer scan reads layer-STACKED weights via a scalar-prefetched index map
(QuantStackRef), whose DMA pattern strides across a [L, Kp, N] buffer.
The flat winners regressed the shipped headline 180.3 -> 154.6 tok/s
(BENCH_r03 vs BENCH_r04); bypassing the table recovered 192.0 tok/s
(round-5 A/B, docs/results/serving/int4_ab_r5.json).

This sweep benches the path the model actually runs: stacked weights
(L=4), layer index cycling 0..L-1 inside the timing scan (like a real
decode step's layer scan), at M in {2, 16} — M=2 is the BS=1 K=1 verify
row count (the headline), M=16 the serving decode batch. NOTE
quant_matmul_pallas pads M up to the 16-row sublane tile, so M only
changes padding, not the grid; both are swept to confirm that.

Candidates: the heuristic default (BN=1024 + whole-half-K when it fits
2 MB VMEM) plus the (BN, BK) product space. Winners are adopted into
`_INT4_TILES` ONLY where they beat the heuristic by >3% in this artifact.

Run: python scripts/int4_tile_sweep_r5.py
Artifact: docs/results/serving/int4_tiles_r5.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

L = 4  # stacked layers — enough to exercise the strided stacked DMA path


def slope_ms(fn, x, qt_stack, lo=200, hi=1200):
    """Slope-timed ms/call over a dependent chain; the layer index cycles
    through the stack every iteration like the model's layer scan."""
    import jax
    import jax.numpy as jnp

    def make(iters):
        @jax.jit
        def chain(x):
            def body(c, li):
                y = fn(c, qt_stack, li)
                K = c.shape[1]
                pad = max(0, K - y.shape[1])
                fb = jnp.pad(y, ((0, 0), (0, pad)))[:, :K]
                return c + fb.astype(c.dtype) * 1e-9, None

            lis = jnp.arange(iters, dtype=jnp.int32) % L
            return jax.lax.scan(body, x, lis)[0]

        return chain

    c_lo, c_hi = make(lo), make(hi)

    def run(c):
        t0 = time.perf_counter()
        jax.device_get(c(x).ravel()[:1])
        return (time.perf_counter() - t0) * 1e3

    run(c_lo), run(c_hi)
    t_lo = sorted(run(c_lo) for _ in range(3))[1]
    t_hi = sorted(run(c_hi) for _ in range(3))[1]
    return (t_hi - t_lo) / (hi - lo)


# The ACTUAL quantized matmul shapes of the decode step (loader fuses
# q/k/v -> w_qkv, gate+up -> w_gate_up): llama-3.2-3B and llama-3.1-8B.
SHAPES = [
    (3072, 5120),    # 3B w_qkv
    (3072, 3072),    # 3B wo
    (3072, 16384),   # 3B w_gate_up
    (8192, 3072),    # 3B w_down
    (4096, 6144),    # 8B w_qkv
    (4096, 4096),    # 8B wo
    (4096, 28672),   # 8B w_gate_up
    (14336, 4096),   # 8B w_down
]


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from llm_inference_lab_tpu.ops.pallas.quant_matmul import (
        quant_matmul_pallas,
    )
    from llm_inference_lab_tpu.ops.quant import QuantTensor, quantize_int4

    os.environ["SPECDX_INT4_TILE_TABLE"] = "0"  # sweep from a clean slate

    rng = np.random.default_rng(0)
    budget = 2 << 20
    results = []
    for K, N in SHAPES:
        q4 = quantize_int4(jnp.asarray(
            rng.normal(size=(K, N)).astype(np.float32)
        ))
        # Stack L copies -> [L, K//2, N] data, [L, N] scales (the loader's
        # layer-stacked form; contents per layer identical, DMA cost isn't
        # affected by values).
        q4s = QuantTensor(
            jnp.broadcast_to(q4.data, (L, *q4.data.shape)).copy(),
            jnp.broadcast_to(q4.scale, (L, *q4.scale.shape)).copy(),
            bits=4,
        )
        half = K // 2
        sol = K * N / 2 / 819e9 * 1e3
        shape_out = {"K": K, "N": N, "SoL_ms": round(sol, 4), "by_M": {}}
        for M in (2, 16):
            x = jnp.ones((M, K), jnp.bfloat16)
            rows = []

            def bench(bn, bk, label):
                try:
                    t = slope_ms(
                        lambda c, q, li, bn=bn, bk=bk: quant_matmul_pallas(
                            c, q, layer_idx=li, bn=bn, bk=bk
                        ),
                        x, q4s,
                    )
                except Exception as e:
                    print(f"  ({K},{N}) M={M} {label}: {e}")
                    return
                rows.append({
                    "label": label, "BN": bn, "BK": bk,
                    "ms": round(t, 4), "pct_SoL": round(100 * sol / t, 1),
                })
                print(f"({K},{N}) M={M} {label} BN={bn} BK={bk}: "
                      f"{t:.4f} ms ({rows[-1]['pct_SoL']}% SoL)")

            bench(0, 0, "heuristic")  # the shipped default path
            for BN in (2048, 1024, 512, 256):
                if N % BN:
                    continue
                for BK in dict.fromkeys((half, 2048, 1024, 512, 256)):
                    if half % BK or BK * BN > budget:
                        continue
                    bench(BN, BK, f"tile({BN},{BK})")
            heur = next(r for r in rows if r["label"] == "heuristic")
            best = min(rows, key=lambda r: r["ms"])
            shape_out["by_M"][str(M)] = {
                "heuristic": heur, "best": best,
                "best_vs_heuristic_pct": round(
                    100 * (heur["ms"] - best["ms"]) / heur["ms"], 1),
                "rows": sorted(rows, key=lambda r: r["ms"]),
            }
        results.append(shape_out)

    out = "docs/results/serving/int4_tiles_r5.json"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("\nsummary (best vs heuristic):")
    for r in results:
        for m, d in r["by_M"].items():
            print(f"  ({r['K']},{r['N']}) M={m}: heuristic "
                  f"{d['heuristic']['ms']} ms ({d['heuristic']['pct_SoL']}%)"
                  f" | best {d['best']['label']} {d['best']['ms']} ms "
                  f"({d['best']['pct_SoL']}%), +{d['best_vs_heuristic_pct']}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
