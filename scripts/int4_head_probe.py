"""EmbedQuant4 (int4 tied head) vs EmbedQuant (int8) on the 3B head shape.

The head is 0.543 ms of the 3.06 ms 3B int4 decode step at ~90% of its
int8 weight-read roofline (batch_scaling_r5_int4.json) — the only way to
cut it is fewer bytes. EmbedQuant4 stores the table in the int4 kernel's
packed head layout (197 MB vs 394 MB for llama's 128k vocab; SoL 0.24 ms).

Measures (slope-timed dependent chains, M=1 padded to 16):
  head8_ms — EmbedQuant.head_logits (the int8 default)
  head4_ms — EmbedQuant4.head_logits (the opt-in)
plus an end-to-end nonspec 3B int4 generate() with embed_bits=4.

Run: python scripts/int4_head_probe.py
Artifact: docs/results/serving/int4_head_r5.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPECDX_DETERMINISTIC", "1")

OUT = "docs/results/serving/int4_head_r5.json"
D, V = 3072, 128256


def slope(fn, table, x, lo=50, hi=450):
    """fn(table, x) -> logits; the table is a jit ARGUMENT — closing over
    it would embed the multi-hundred-MB buffer as a constant and overflow
    the remote-compile relay (HTTP 413; same trap batch_scaling_probe's
    chain_ms documents)."""
    import jax

    def make(iters):
        @jax.jit
        def chain(table, x):
            def body(c, _):
                y = fn(table, c)
                return c + y[:, :1].astype(c.dtype) * 1e-9, None

            return jax.lax.scan(body, x, None, length=iters)[0]

        return chain

    c_lo, c_hi = make(lo), make(hi)

    def run(c):
        t0 = time.perf_counter()
        jax.device_get(c(table, x).ravel()[:1])
        return (time.perf_counter() - t0) * 1e3

    run(c_lo), run(c_hi)
    t_lo = sorted(run(c_lo) for _ in range(5))[2]
    t_hi = sorted(run(c_hi) for _ in range(5))[2]
    return (t_hi - t_lo) / (hi - lo)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from llm_inference_lab_tpu.ops.quant import (
        EmbedQuant,
        EmbedQuant4,
        QuantTensor,
    )

    # Random quantized tables at the llama-3.2 head shape (bytes are what
    # matter; values are irrelevant to bandwidth).
    key = jax.random.PRNGKey(0)
    q8 = EmbedQuant(
        jax.lax.convert_element_type(
            jax.random.bits(key, (V, D), dtype=jnp.uint8), jnp.int8
        ),
        jnp.full((V,), 0.02 / 127, jnp.float32),
    )
    from llm_inference_lab_tpu.ops.quant import repack_int4_rows

    e4 = jax.lax.convert_element_type(
        jax.random.bits(key, (D // 2, V), dtype=jnp.uint8), jnp.int8
    )
    q4 = EmbedQuant4(
        QuantTensor(e4, jnp.full((V,), 0.02 / 7, jnp.float32), bits=4),
        repack_int4_rows(e4),
    )
    x = jnp.ones((1, D), jnp.bfloat16)
    head8 = slope(lambda t, c: t.head_logits(c).astype(jnp.bfloat16), q8, x)
    head4 = slope(lambda t, c: t.head_logits(c).astype(jnp.bfloat16), q4, x)
    sol8 = V * D / 819e9 * 1e3
    sol4 = V * D / 2 / 819e9 * 1e3
    out = {
        "shape": [D, V],
        "head8_ms": round(head8, 4), "head8_SoL_ms": round(sol8, 4),
        "head8_pct_SoL": round(100 * sol8 / head8, 1),
        "head4_ms": round(head4, 4), "head4_SoL_ms": round(sol4, 4),
        "head4_pct_SoL": round(100 * sol4 / head4, 1),
        "head4_vs_head8": round(head8 / head4, 2),
    }
    print(json.dumps(out), flush=True)

    # End-to-end: nonspec 3B int4 with the int4 head, 64 tokens.
    from llm_inference_lab_tpu.config import EngineConfig
    from llm_inference_lab_tpu.core.engine import Engine

    eng = Engine(EngineConfig(
        base_model="llama-3.2-3b", draft_model=None, implementation="hf",
        max_new_tokens=64, greedy=True, quantization="int4",
        quantize_embed=True, embed_bits=4, quantized_init=True,
        max_seq_len=512,
    ))
    prompt = "The quick brown fox jumps over the lazy dog. " * 3
    eng.generate(prompt, max_new_tokens=64)
    runs = [eng.generate(prompt, max_new_tokens=64)["tokens_per_sec"]
            for _ in range(5)]
    out["e2e_nonspec_3b_embed4"] = {
        "tok_s": round(sorted(runs)[2], 1),
        "runs": [round(r, 1) for r in runs],
        "vs_embed8_artifact": "e2e_gap_r5.json median 265.2",
    }
    print(json.dumps(out["e2e_nonspec_3b_embed4"]), flush=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
