"""Decode attention + KV-write cost vs batch on TPU (slope-timed).

The 3B decode body grows ~0.32-0.42 ms per batch lane while the int8
matmuls are M-independent at 75-92% SoL (matmul_m_probe) — so the scaling
lives in the attention/KV path. This isolates, at llama-3.2-3b geometry
(24 q / 8 KV heads, d=128, T=256):

  attend_xla[B]         — the XLA reference decode attention
  flash[B]              — the Pallas flash-decode kernel
  kv_write[B]           — update_cache_layer (one layer)
  scan28[B]             — 28-layer scan of (kv_write + attend) with the
                          cache stack as scan carry, mimicking the real
                          forward's data flow (scan double-buffering of
                          the carried cache is a copy-cost suspect)

Run: python scripts/attn_b_probe.py [--seq 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope_ms(make_chain, params, init, lo=50, hi=250):
    import jax

    c_lo, c_hi = make_chain(lo), make_chain(hi)

    def run(c):
        t0 = time.perf_counter()
        out = c(params, init)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        return (time.perf_counter() - t0) * 1e3

    run(c_lo), run(c_hi)
    t_lo = sorted(run(c_lo) for _ in range(3))[1]
    t_hi = sorted(run(c_hi) for _ in range(3))[1]
    return (t_hi - t_lo) / (hi - lo)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--batches", default="1,8,16")
    ap.add_argument("--out", default="docs/results/serving/attn_b_probe.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from llm_inference_lab_tpu.models.base import update_cache_layer
    from llm_inference_lab_tpu.ops.attention import attend_xla
    from llm_inference_lab_tpu.ops.pallas.flash_decode import (
        flash_decode_attention,
    )

    H, KV, D, L = 24, 8, 128, 28
    T = args.seq
    rng = jax.random.PRNGKey(0)
    rows = []
    for B in (int(x) for x in args.batches.split(",")):
        q = jax.random.normal(rng, (B, 1, H, D), jnp.bfloat16)
        kc = jax.random.normal(rng, (B, KV, T, D), jnp.bfloat16)
        pos = jnp.full((B, 1), T - 2, jnp.int32)
        kn = jax.random.normal(rng, (B, 1, KV, D), jnp.bfloat16)
        start = jnp.full((B,), T - 2, jnp.int32)

        def mk_attend(iters, fn):
            @jax.jit
            def chain(kc, q):
                def body(c, _):
                    o = fn(c, q)
                    return c + o.reshape(B, 1, H, D)[:, :, :KV].transpose(
                        0, 2, 1, 3
                    ) * 1e-9, None

                return jax.lax.scan(body, kc, None, length=iters)[0]

            return chain

        att = slope_ms(
            lambda it: mk_attend(it, lambda c, q: attend_xla(q, c, c, pos)),
            kc, q,
        )
        fla = slope_ms(
            lambda it: mk_attend(
                it, lambda c, q: flash_decode_attention(q, c, c, pos)
            ),
            kc, q,
        )

        def mk_write(iters):
            @jax.jit
            def chain(kc, kn):
                ks = jnp.ones((B, KV, T), jnp.float32)

                def body(c, _):
                    k2, v2, _, _ = update_cache_layer(
                        c, c, ks, ks, kn, kn, start
                    )
                    return k2 + v2 * 1e-9, None

                return jax.lax.scan(body, kc, None, length=iters)[0]

            return chain

        wr = slope_ms(mk_write, kc, kn)

        # 28-layer scan with the stacked cache as carry (forward mimic).
        kstack = jax.random.normal(rng, (L, B, KV, T, D), jnp.bfloat16)

        def mk_scan28(iters):
            @jax.jit
            def chain(kstack, q):
                ks = jnp.ones((B, KV, T), jnp.float32)

                def step(carry, _):
                    def layer(x, kv_l):
                        k2, v2, _, _ = update_cache_layer(
                            kv_l, kv_l, ks, ks, kn, kn, start
                        )
                        o = attend_xla(q + x.sum() * 1e-20, k2, v2, pos)
                        return x + o[:, 0, :1, 0] * 1e-9, k2

                    x, knew = jax.lax.scan(
                        layer, carry[0], carry[1]
                    )
                    return (x, knew), None

                x0 = jnp.zeros((B, 1), jnp.bfloat16)
                (x, kk), _ = jax.lax.scan(
                    step, (x0, kstack), None, length=iters
                )
                return x

            return chain

        sc = slope_ms(mk_scan28, kstack, q, lo=10, hi=60)

        rows.append({
            "B": B, "T": T,
            "attend_xla_ms": round(att, 4),
            "flash_ms": round(fla, 4),
            "kv_write_ms": round(wr, 4),
            "scan28_ms": round(sc, 4),
        })
        print(json.dumps(rows[-1]))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
