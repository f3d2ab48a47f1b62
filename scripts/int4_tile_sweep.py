"""int4 Pallas dequant-matmul (BN, BK) tile sweep — square-shape retune.

Round-3 left K=N=4096 (the 8B attention projections) at 50.6% of HBM
speed-of-light vs 75-82% on the rectangular FFN shapes
(docs/results/serving/int4_bench_r3.json). Hypothesis: BN=1024 + whole-K
blocks give grid (4, 1) — too few grid steps for Pallas' cross-step DMA
double-buffering to hide the 2 MB weight-tile fetches. This sweeps the
(BN, BK) product space on every llama-3B/8B matmul shape (M=16, the
serving decode row count) and records the winners; the defaults in
ops/pallas/quant_matmul.py are then set from the artifact.

Run: python scripts/int4_tile_sweep.py
Artifact: docs/results/serving/int4_tiles_r4.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope_ms(fn, args, lo=200, hi=1200):
    import jax
    import jax.numpy as jnp

    def make(iters):
        @jax.jit
        def chain(x, *rest):
            def body(c, _):
                y = fn(c, *rest)
                K = c.shape[1]
                pad = max(0, K - y.shape[1])
                fb = jnp.pad(y, ((0, 0), (0, pad)))[:, :K]
                return c + fb.astype(c.dtype) * 1e-9, None

            return jax.lax.scan(body, x, None, length=iters)[0]

        return chain

    c_lo, c_hi = make(lo), make(hi)

    def run(c):
        t0 = time.perf_counter()
        jax.device_get(c(*args).ravel()[:1])
        return (time.perf_counter() - t0) * 1e3

    run(c_lo), run(c_hi)
    t_lo = sorted(run(c_lo) for _ in range(3))[1]
    t_hi = sorted(run(c_hi) for _ in range(3))[1]
    return (t_hi - t_lo) / (hi - lo)


# The ACTUAL quantized matmul shapes the decode step runs (the loader
# fuses q/k/v into w_qkv and gate+up into w_gate_up — transformer._qkv,
# _mlp_block): llama-3.2-3B (D=3072, FF=8192, fused qkv 5120) and
# llama-3.1-8B (D=4096, FF=14336, fused qkv 6144), M=16.
SHAPES = [
    (3072, 5120),    # 3B w_qkv
    (3072, 3072),    # 3B wo
    (3072, 16384),   # 3B w_gate_up (fused)
    (8192, 3072),    # 3B w_down
    (4096, 6144),    # 8B w_qkv
    (4096, 4096),    # 8B wo (the round-3 weak spot)
    (4096, 28672),   # 8B w_gate_up (fused)
    (14336, 4096),   # 8B w_down
]


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from llm_inference_lab_tpu.ops.pallas.quant_matmul import (
        quant_matmul_pallas,
    )
    from llm_inference_lab_tpu.ops.quant import quantize_int4

    rng = np.random.default_rng(0)
    budget = 2 << 20  # int4 VMEM tile budget (see quant_matmul_pallas)
    results = []
    for K, N in SHAPES:
        x = jnp.ones((16, K), jnp.bfloat16)
        q4 = quantize_int4(jnp.asarray(
            rng.normal(size=(K, N)).astype(np.float32)
        ))
        half = K // 2
        sol = K * N / 2 / 819e9 * 1e3
        rows = []
        for BN in (2048, 1024, 512, 256):
            if N % BN:
                continue
            for BK in dict.fromkeys((half, 2048, 1024, 512, 256)):
                if half % BK or BK * BN > budget:
                    continue
                grid = (N // BN, half // BK)
                try:
                    t = slope_ms(
                        lambda c, q, bn=BN, bk=BK: quant_matmul_pallas(
                            c, q, bn=bn, bk=bk
                        ),
                        (x, q4),
                    )
                except Exception as e:  # tile combo rejected by Mosaic
                    print(f"  ({K},{N}) BN={BN} BK={BK}: {e}")
                    continue
                rows.append({
                    "BN": BN, "BK": BK, "grid": list(grid),
                    "ms": round(t, 4), "pct_SoL": round(100 * sol / t, 1),
                })
                print(f"({K},{N}) BN={BN} BK={BK} grid={grid}: "
                      f"{t:.4f} ms ({rows[-1]['pct_SoL']}% SoL)")
        rows.sort(key=lambda r: r["ms"])
        results.append({
            "K": K, "N": N, "SoL_ms": round(sol, 4),
            "best": rows[0] if rows else None,
            "rows": rows,
        })
    out = "docs/results/serving/int4_tiles_r4.json"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("\nbest per shape:")
    for r in results:
        print(f"  ({r['K']},{r['N']}): {r['best']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
