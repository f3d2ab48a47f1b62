"""Ramp-hypothesis probe: does splitting BK lift small-grid int4 matmuls?

batch_scaling_r5_int4.json shows the 3B int4 decode body (2.54 ms) is the
four projection matmuls at their measured 64-83% of HBM speed-of-light
(int4_bench_r4.json) — the body sums to the per-shape kernel times almost
exactly. The efficiency PATTERN tracks grid size: (3072,16384) at 16 grid
steps runs 82.5% SoL while (3072,3072) at 3 steps runs 64%. A double-
buffered pipeline of G equal tile-DMAs has a hard ramp bound of G/(G+1)
(the first DMA overlaps nothing): grid (3,1) caps at 75% before any other
loss. The whole-half-K heuristic MINIMIZES G, which minimizes per-step
overhead but maximizes ramp fraction on small shapes.

This probe A/Bs the heuristic against finer BK splits (more grid steps,
same BN, same N-major order) on the STACKED scalar-prefetch path (L=4,
layer index cycling — the exact methodology of int4_tiles_r5.json, which
only ever re-tested round-4's coarse candidates and never a BK split).

Run: python scripts/int4_bk_split_probe.py
Artifact: docs/results/serving/int4_bk_split_r5.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

L = 4
OUT = "docs/results/serving/int4_bk_split_r5.json"

# (K, N) -> BK candidates at BN=1024 (0 = heuristic whole-half-K / budget).
# Grid steps G = (N/1024) * (half/BK); ramp bound G/(G+1).
SHAPES = {
    (3072, 3072): [0, 768, 512, 256],     # heuristic grid (3,1): 75% cap
    (3072, 5120): [0, 768, 512, 256],     # heuristic grid (5,1): 83% cap
    (8192, 3072): [0, 1024, 512],         # heuristic grid (3,2): 86% cap
    (3072, 16384): [0, 768, 512],         # heuristic grid (16,1): 94% cap
}


def slope_ms(fn, x, qt_stack, lo=200, hi=2200):
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
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    for (K, N), bks in SHAPES.items():
        q4 = quantize_int4(jnp.asarray(
            rng.normal(size=(K, N)).astype(np.float32)
        ))
        q4s = QuantTensor(
            jnp.broadcast_to(q4.data, (L, *q4.data.shape)).copy(),
            jnp.broadcast_to(q4.scale, (L, *q4.scale.shape)).copy(),
            bits=4,
        )
        half = K // 2
        sol = K * N / 2 / 819e9 * 1e3
        x = jnp.ones((16, K), jnp.bfloat16)
        rows = []
        for bk in bks:
            bn = 0 if bk == 0 else 1024
            g = (N // 1024) * (half // bk) if bk else None
            label = "heuristic" if bk == 0 else f"BK={bk} (G={g})"
            try:
                t = slope_ms(
                    lambda c, q, li, bn=bn, bk=bk: quant_matmul_pallas(
                        c, q, layer_idx=li, bn=bn, bk=bk
                    ),
                    x, q4s,
                )
            except Exception as e:
                print(f"  ({K},{N}) {label}: {e}", flush=True)
                continue
            rows.append({
                "label": label, "BK": bk, "grid_steps": g,
                "ms": round(t, 4), "pct_SoL": round(100 * sol / t, 1),
            })
            print(f"({K},{N}) {label}: {t:.4f} ms "
                  f"({rows[-1]['pct_SoL']}% SoL)", flush=True)
        heur = next((r for r in rows if r["label"] == "heuristic"), None)
        best = min(rows, key=lambda r: r["ms"]) if rows else None
        results.append({
            "K": K, "N": N, "M": 16, "stacked_L": L,
            "SoL_ms": round(sol, 4), "heuristic": heur, "best": best,
            "best_vs_heuristic_pct": (
                round(100 * (heur["ms"] - best["ms"]) / heur["ms"], 1)
                if heur and best else None
            ),
            "rows": sorted(rows, key=lambda r: r["ms"]),
        })
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print("\nsummary:")
    for r in results:
        h, b = r["heuristic"], r["best"]
        if h and b:
            print(f"  ({r['K']},{r['N']}): heuristic {h['ms']} "
                  f"({h['pct_SoL']}%) | best {b['label']} {b['ms']} "
                  f"({b['pct_SoL']}%), +{r['best_vs_heuristic_pct']}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
