"""Decompose decode-step cost vs batch size on TPU — byte-true accounting.

Round-3 closed most of the B=16 vs B=1 gap (carry-stacks + EmbedQuant fix);
round-4 requires a per-component byte+time table that SUMS to the measured
step at B in {1, 8, 16} (VERDICT task 1), plus the int4 BS=1 decomposition
feeding the lm_head attack (task 6).

Measured components (all slope-timed over dependent chains — the axon relay
distorts single-shot timing):

  forward_full[B]   — logits forward (embed + body + lm_head)
  forward_body[B]   — same with the lm_head dead-code-eliminated
  head_ms[B]        — lm_head projection alone ([B,1,D] @ [D,V])
  step_ms[B]        — the engine's full baseline step (sampling, commits)
  kv_ms[B]          — KV-traffic term: slope of step time vs cache length
                      (T=256 vs T=1024 at fixed weights), scaled to T=256

Bytes model (HBM roofline at ~819 GB/s on v5e):
  weight_bytes      — quantized body + head + scales (B-independent)
  kv_bytes[B]       — B * L * KVH * T * D * 2(kv) * dtype read per step
  logit_bytes[B]    — B * V * 4 written + re-read by sampling

Run: python scripts/batch_scaling_probe.py [--small] [--quant int8|int4]
Artifact: docs/results/serving/batch_scaling_r4_<quant>.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBS = 819e9  # v5e HBM bandwidth


def chain_ms(fn, params, init, lo=10, hi=40):
    """SLOPE-timed dependent chain of fn(params, carry) -> carry:
    (t(hi) - t(lo)) / (hi - lo) cancels the fixed ~27 ms relay RTT of the
    completion fetch. Params are a jit ARGUMENT — closing over them would
    embed multi-GB constants and make compilation through the axon relay
    pathological (see perf_probe.forward_ms)."""
    import jax

    def make(iters):
        @jax.jit
        def chain(params, carry):
            return jax.lax.scan(
                lambda c, _: (fn(params, c), None), carry, None,
                length=iters,
            )[0]

        return chain

    def force(out):
        # Scalar fetch: block_until_ready can ack early through tunneled
        # runtimes (docs/RESULTS.md "measurement trap"); a data-dependent
        # device_get cannot.
        leaf = jax.tree_util.tree_leaves(out)[0]
        return jax.device_get(leaf.ravel()[:1])

    c_lo, c_hi = make(lo), make(hi)

    def run(c):
        t0 = time.perf_counter()
        force(c(params, init))
        return (time.perf_counter() - t0) * 1e3

    run(c_lo), run(c_hi)  # compile
    t_lo = sorted(run(c_lo) for _ in range(3))[1]
    t_hi = sorted(run(c_hi) for _ in range(3))[1]
    return (t_hi - t_lo) / (hi - lo)


def param_bytes(tree) -> int:
    import jax

    return sum(
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree)
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--batches", default="1,8,16")
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--quant", default="int8", choices=["int8", "int4"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from llm_inference_lab_tpu.config import EngineConfig
    from llm_inference_lab_tpu.core.engine import Engine
    from llm_inference_lab_tpu.core.state import init_state

    small = args.small or jax.default_backend() == "cpu"
    cfg = EngineConfig(
        base_model="llama-tiny" if small else "llama-3.2-3b",
        draft_model=None,
        implementation="hf",
        max_new_tokens=32,
        quantization=None if small else args.quant,
        quantize_embed=not small,
        max_seq_len=args.seq,
    )
    eng = Engine(cfg)
    tgt = eng.target
    mcfg = tgt.config
    T = args.seq
    w_bytes = param_bytes(tgt.params)
    rows = []
    raw_step = eng._build_step(1, jit=False)
    for B in (int(x) for x in args.batches.split(",")):

        def fwd_full(params, carry):
            tok, cache = carry
            logits, cache = tgt.apply_fn(
                params, tok, jnp.full((B, 1), 8, jnp.int32), cache,
                jnp.full((B,), 7, jnp.int32),
            )
            nxt = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
            return nxt, cache

        def fwd_body(params, carry):
            # Consume only hidden; XLA dead-code-eliminates the lm_head.
            tok, cache = carry
            _, cache, hidden = tgt.apply_fn(
                params, tok, jnp.full((B, 1), 8, jnp.int32), cache,
                jnp.full((B,), 7, jnp.int32), return_hidden=True,
            )
            nxt = (hidden[:, -1:, 0] > 0).astype(jnp.int32)
            return nxt, cache

        def head_only(params, h):
            logits = tgt.head_fn(params, h)
            # Feed a scalar back so the chain is dependent.
            return h + logits[..., :1].astype(h.dtype) * 1e-9

        tok0 = jnp.ones((B, 1), jnp.int32)
        full = chain_ms(fwd_full, tgt.params, (tok0, tgt.init_cache(B, T)))
        body = chain_ms(fwd_body, tgt.params, (tok0, tgt.init_cache(B, T)))
        h0 = jnp.zeros((B, 1, mcfg.d_model), mcfg.dtype)
        head = chain_ms(head_only, tgt.params, h0)

        # KV-traffic slope: same forward at 4x the cache length; the extra
        # time is pure KV read bandwidth (attention math on 1 query row is
        # bandwidth-bound), scaled back to the T in use.
        T4 = 4 * T
        full_t4 = chain_ms(
            fwd_full, tgt.params, (tok0, tgt.init_cache(B, T4))
        )
        kv_ms = max(full_t4 - full, 0.0) / 3.0  # per T's worth of KV

        # Full engine baseline step on a DecodeState of this batch size.
        state = init_state(
            tgt, None, B, T, max_new_tokens=10_000,
            temperature=0.0,
        )
        state = state.replace(
            lengths=jnp.full((B,), 8, jnp.int32),
            prompt_lens=jnp.full((B,), 8, jnp.int32),
            active=jnp.ones((B,), bool),
            tokens=state.tokens.at[:, :8].set(1),
        )
        step_ms = chain_ms(raw_step, tgt.params, state)

        # --- bytes model ---------------------------------------------
        kv_dtype = 2  # bf16 cache
        kv_bytes = (
            B * mcfg.n_layers * mcfg.n_kv_heads * T * mcfg.head_dim
            * 2 * kv_dtype
        )
        logit_bytes = B * mcfg.vocab_size * 4
        roofline_ms = w_bytes / HBM_GBS * 1e3
        rows.append({
            "B": B,
            "forward_full_ms": round(full, 3),
            "forward_body_ms": round(body, 3),
            "head_ms": round(head, 3),
            "kv_ms": round(kv_ms, 3),
            "step_ms": round(step_ms, 3),
            "sample_commit_ms": round(step_ms - full, 3),
            "weight_bytes_mb": round(w_bytes / 1e6, 1),
            "kv_bytes_mb": round(kv_bytes / 1e6, 2),
            "logit_bytes_mb": round(logit_bytes / 1e6, 2),
            "weights_roofline_ms": round(roofline_ms, 3),
            "kv_roofline_ms": round(kv_bytes / HBM_GBS * 1e3, 3),
            "sum_check_ms": round(body + head + (step_ms - full), 3),
            "tok_s_bs": round(B * 1e3 / step_ms, 1),
        })
        print(json.dumps(rows[-1]))

    out_path = args.out or (
        f"docs/results/serving/batch_scaling_r4_{args.quant}.json"
    )
    out = {"config": {"base": cfg.base_model, "seq": T, "quant": args.quant,
                      "backend": jax.default_backend()},
           "rows": rows}
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
