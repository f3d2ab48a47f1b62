"""Decompose the headline spec-decode step cost on TPU.

Measures, with dependent-chain timing (axon relay distorts single-shot
timings — docs/RESULTS.md "measurement trap"):
  1. target-only baseline decode (3B int8), tok/s
  2. draft-only decode (1B int8), tok/s
  3. spec K=1 full engine, tok/s (the bench.py headline)
  4. raw forward costs: 1-pos and 2-pos target forward, 1-pos draft forward

Usage: python scripts/perf_probe.py [--small]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def engine_toks(cfg_kwargs, prompt, max_new=64, runs=3):
    import jax

    from llm_inference_lab_tpu.config import EngineConfig
    from llm_inference_lab_tpu.core.engine import Engine

    eng = Engine(EngineConfig(**cfg_kwargs))
    eng.generate(prompt, max_new_tokens=max_new)  # compile
    vals = []
    for _ in range(runs):
        r = eng.generate(prompt, max_new_tokens=max_new)
        vals.append(r["tokens_per_sec"])
    return sorted(vals)[len(vals) // 2], eng


def forward_ms(model, S, T=512, iters=50):
    """Dependent-chain decode-forward timing: each step's token feeds the
    next (defeats relay pipelining), cache threaded through. Params are a
    jit ARGUMENT (capturing them as constants forces a multi-GB constant
    upload through the axon relay — pathological compile)."""
    import jax
    import jax.numpy as jnp

    cache = model.init_cache(1, T)
    apply_fn = model.apply_fn

    @jax.jit
    def chain(params, tok, cache):
        def step(carry, _):
            tok, cache = carry
            logits, cache = apply_fn(
                params, tok, jnp.full((1, S), 8, jnp.int32), cache,
                jnp.zeros((1,), jnp.int32),
            )
            nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            nxt = jnp.broadcast_to(nxt, (1, S))
            return (nxt, cache), None

        (tok, cache), _ = jax.lax.scan(step, (tok, cache), None, length=iters)
        return tok

    tok = jnp.ones((1, S), jnp.int32)
    out = chain(model.params, tok, cache)  # compile
    _ = int(jax.device_get(out)[0, 0])
    t0 = time.perf_counter()
    out = chain(model.params, tok, cache)
    _ = int(jax.device_get(out)[0, 0])
    return (time.perf_counter() - t0) * 1e3 / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    import jax

    small = args.small or jax.default_backend() == "cpu"
    base = "llama-tiny" if small else "llama-3.2-3b"
    draft = "llama-tiny" if small else "llama-3.2-1b"
    quant = None if small else "int8"
    common = dict(implementation="hf", greedy=True, max_new_tokens=64,
                  max_seq_len=512, quantization=quant,
                  quantize_embed=bool(quant))
    prompt = "The quick brown fox jumps over the lazy dog. " * 3

    import gc

    out = {"backend": jax.default_backend()}
    t, eng_b = engine_toks(
        dict(base_model=base, draft_model=None, **common), prompt,
        runs=args.runs,
    )
    out["baseline_tok_s"] = round(t, 1)
    del eng_b
    gc.collect()
    print("baseline done", flush=True)
    t, eng_d = engine_toks(
        dict(base_model=draft, draft_model=None, **common), prompt,
        runs=args.runs,
    )
    out["draft_only_tok_s"] = round(t, 1)
    del eng_d
    gc.collect()
    print("draft done", flush=True)
    t, eng_s = engine_toks(
        dict(base_model=base, draft_model=draft, max_draft=1, **common),
        prompt, runs=args.runs,
    )
    out["spec_k1_tok_s"] = round(t, 1)
    print("spec done", json.dumps(out), flush=True)

    out["target_fwd_1pos_ms"] = round(forward_ms(eng_s.target, 1), 2)
    print("t1 done", json.dumps(out), flush=True)
    out["target_fwd_2pos_ms"] = round(forward_ms(eng_s.target, 2), 2)
    print("t2 done", json.dumps(out), flush=True)
    out["draft_fwd_1pos_ms"] = round(forward_ms(eng_s.draft, 1), 2)
    out["spec_k1_step_ms_implied"] = round(1000.0 / out["spec_k1_tok_s"], 2)
    out["fwd_sum_ms"] = round(
        out["target_fwd_2pos_ms"] + out["draft_fwd_1pos_ms"], 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
