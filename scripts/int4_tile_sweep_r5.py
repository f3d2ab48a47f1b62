"""int4 dequant-matmul tile check — STACKED-path A/B (round 5).

Round 4 adopted `_INT4_TILES` from a sweep (scripts/int4_tile_sweep.py)
that benched the FLAT `quant_matmul_pallas(x, qt)` form — but the model's
layer scan reads layer-STACKED weights via a scalar-prefetched index map
(QuantStackRef), whose DMA pattern strides across a [L, Kp, N] buffer.
The flat winners regressed the shipped headline 180.3 -> 154.6 tok/s
(BENCH_r03 vs BENCH_r04); bypassing the table recovered 192.0 tok/s.

This A/B benches the path the model actually runs: stacked weights (L=4),
layer index cycling 0..L-1 inside the timing scan like a real decode
step's layer scan. Per shape it times the HEURISTIC default (BN=1024 +
whole-half-K when it fits 2 MB VMEM) against the r4-adopted tile and the
r4 sweep's best measured alternative. M is benched at 16 only:
quant_matmul_pallas pads every decode M up to the 16-row sublane tile, so
M in 1..16 compiles to the same kernel. Tile-table entries are kept ONLY
where this artifact shows a >3% stacked-path win over the heuristic.

A full (BN, BK) product sweep at this compile cost (~30 s/combo through
the remote-compile relay) exceeds the round budget — combos are capped
and results stream to the artifact incrementally.

Run: python scripts/int4_tile_sweep_r5.py
Artifact: docs/results/serving/int4_tiles_r5.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

L = 4  # stacked layers — exercises the strided stacked DMA path
OUT = "docs/results/serving/int4_tiles_r5.json"


def slope_ms(fn, x, qt_stack, lo=200, hi=2200):
    """Slope-timed ms/call; layer index cycles through the stack like the
    model's layer scan. The chain-length gap must dwarf the relay RTT's
    run-to-run variance (several ms): at ~0.01 ms/call a 2000-iteration
    gap is ~20-30 ms of real compute. Median of 5 per length."""
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


# (K, N) -> [candidate (BN, BK) tiles]: the r4-adopted tile + the best
# measured alternative from the r4 flat sweep (int4_tiles_r4.json).
SHAPES = {
    (3072, 5120): [(1024, 1536), (512, 1536)],
    (3072, 3072): [(3072, 768), (1024, 1536)],
    (3072, 16384): [(1024, 1536), (2048, 512)],
    (8192, 3072): [(512, 2048), (1024, 2048)],
    (4096, 6144): [(1024, 2048), (2048, 1024)],
    (4096, 4096): [(2048, 1024), (1024, 2048)],
    (4096, 28672): [(1024, 2048), (2048, 1024)],
    (14336, 4096): [(2048, 1024), (1024, 2048)],
}


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from llm_inference_lab_tpu.ops.pallas.quant_matmul import (
        quant_matmul_pallas,
    )
    from llm_inference_lab_tpu.ops.quant import QuantTensor, quantize_int4

    os.environ["SPECDX_INT4_TILE_TABLE"] = "0"  # bench from a clean slate

    rng = np.random.default_rng(0)
    results = []
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    for (K, N), cands in SHAPES.items():
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

        def bench(bn, bk, label):
            try:
                t = slope_ms(
                    lambda c, q, li, bn=bn, bk=bk: quant_matmul_pallas(
                        c, q, layer_idx=li, bn=bn, bk=bk
                    ),
                    x, q4s,
                )
            except Exception as e:
                print(f"  ({K},{N}) {label}: {e}", flush=True)
                return
            rows.append({
                "label": label, "BN": bn, "BK": bk,
                "ms": round(t, 4), "pct_SoL": round(100 * sol / t, 1),
            })
            print(f"({K},{N}) {label} BN={bn} BK={bk}: {t:.4f} ms "
                  f"({rows[-1]['pct_SoL']}% SoL)", flush=True)

        bench(0, 0, "heuristic")
        for bn, bk in cands:
            if N % bn == 0 and half % bk == 0 and bn * bk <= (2 << 20):
                bench(bn, bk, f"tile({bn},{bk})")
            else:
                print(f"  ({K},{N}) tile({bn},{bk}): invalid for shape "
                      f"(divisibility/VMEM) — the r4 table shipped it "
                      f"anyway" if (bn, bk) == cands[0] else "", flush=True)
        heur = next((r for r in rows if r["label"] == "heuristic"), None)
        best = min(rows, key=lambda r: r["ms"]) if rows else None
        results.append({
            "K": K, "N": N, "M": 16, "stacked_L": L,
            "SoL_ms": round(sol, 4),
            "heuristic": heur, "best": best,
            "best_vs_heuristic_pct": (
                round(100 * (heur["ms"] - best["ms"]) / heur["ms"], 1)
                if heur and best else None
            ),
            "rows": sorted(rows, key=lambda r: r["ms"]),
        })
        with open(OUT, "w") as f:  # incremental: survive timeouts
            json.dump(results, f, indent=1)
    print("\nsummary (best vs heuristic):")
    for r in results:
        h, b = r["heuristic"], r["best"]
        if h and b:
            print(f"  ({r['K']},{r['N']}): heuristic {h['ms']} ms "
                  f"({h['pct_SoL']}%) | best {b['label']} {b['ms']} ms "
                  f"({b['pct_SoL']}%), +{r['best_vs_heuristic_pct']}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
