"""int8 dequant-matmul cost vs M (decode batch) on TPU.

The batch-scaling probe shows the 3B decode body growing ~0.3 ms per batch
lane even under XLA attention — weight-bandwidth-bound matmuls should be
M-independent at these sizes. This isolates each llama-3.2-3b projection
shape at M in {1, 8, 16, 32} through the production `dense()` entry point
(XLA int8 path) and, for comparison, bf16 weights.

Run: python scripts/matmul_m_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from llm_inference_lab_tpu.ops.quant import dense, quantize_int8

    # llama-3.2-3b projections: qkv, wo, gate_up, down
    SHAPES = [(3072, 5120), (3072, 3072), (3072, 16384), (8192, 3072)]
    rng = jax.random.PRNGKey(0)

    def chain_ms(params, x0, lo=200, hi=1200):
        """SLOPE timing: (t(hi) - t(lo)) / (hi - lo) cancels the fixed
        ~27 ms relay RTT that would otherwise swamp sub-0.1 ms ops."""

        def make(iters):
            @jax.jit
            def chain(w, x):
                def body(c, _):
                    y = dense(c, w)
                    K_ = c.shape[1]
                    fb = jnp.pad(y, ((0, 0), (0, max(0, K_ - y.shape[1]))))
                    return c + fb[:, :K_] * 1e-9, None

                return jax.lax.scan(body, x, None, length=iters)[0]

            return chain

        c_lo, c_hi = make(lo), make(hi)

        def run(c):
            t0 = time.perf_counter()
            jax.device_get(c(params, x0).ravel()[:1])
            return (time.perf_counter() - t0) * 1e3

        run(c_lo), run(c_hi)  # compile
        t_lo = sorted(run(c_lo) for _ in range(3))[1]
        t_hi = sorted(run(c_hi) for _ in range(3))[1]
        return (t_hi - t_lo) / (hi - lo)

    rows = []
    for K, N in SHAPES:
        w = jax.random.normal(rng, (K, N), jnp.float32)
        qt = quantize_int8(w)
        wb = w.astype(jnp.bfloat16)
        for M in (1, 8, 16, 32):
            x = jnp.ones((M, K), jnp.bfloat16)
            t_q = chain_ms(qt, x)
            t_b = chain_ms(wb, x)
            sol = K * N / 819e9 * 1e3  # int8 bytes at v5e HBM BW
            rows.append({
                "K": K, "N": N, "M": M,
                "int8_ms": round(t_q, 4), "bf16_ms": round(t_b, 4),
                "int8_SoL_ms": round(sol, 4),
                "pct_SoL": round(100 * sol / t_q, 1),
            })
            print(json.dumps(rows[-1]))
    out = "docs/results/serving/matmul_m_probe.json"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
