"""Serving occupancy probe: attribute the gap to the n_slots x single-lane bound.

Round-2 measured 720.9 tok/s aggregate at 16 slots vs a ~2,850 tok/s bound
and attributed the loss to admission prefill without measuring it. Round 3
added BatcherStats occupancy accounting and a poll-by-poll trace; it found
the retire/admit convoy (committed=0 chunks after every retirement wave).

Round-4 fixes measured here:
  - chunk/step at full occupancy is SLOPE-timed (t(hi chunks) - t(lo)) /
    (hi - lo): the round-3 single-shot number (8.412 ms/step) included the
    ~27 ms axon relay RTT per sync and disagreed 47% with the slope-timed
    batch-scaling probe (5.72 ms, batch_scaling_r3_carry_xla.json). The
    bound must be computed from the RTT-free number.
  - batched wave admission (make_admit_many): one [G, P] prefill per
    retirement wave instead of G sequential [1, P] dispatches.
  - --workload mixed: per-request max_tokens drawn from a spread + Poisson
    arrivals, the serving-realistic case where retirements stagger.

Run: python scripts/occupancy_probe.py [--small] [--requests 96] [--slots 16]
     [--workload uniform|mixed]
Artifact: docs/results/serving/occupancy_r4.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--requests", type=int, default=96)
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--max-tokens", type=int, default=64)
    ap.add_argument("--poll-every", type=int, default=8)
    ap.add_argument("--draft", action="store_true", help="speculative (3B+1B)")
    ap.add_argument("--k", type=int, default=2)
    ap.add_argument("--workload", choices=["uniform", "mixed"],
                    default="uniform")
    ap.add_argument("--arrival-rate", type=float, default=0.0,
                    help="mixed: mean Poisson arrivals/sec (0 = all at t=0)")
    ap.add_argument("--sched", choices=["auto", "fixed"], default="auto",
                    help="chunk scheduling: auto = cost-rate retirement "
                    "alignment (_next_chunk_len), fixed = always poll_every")
    ap.add_argument("--out", default="docs/results/serving/occupancy_r4.json")
    args = ap.parse_args()

    import jax
    import numpy as np

    from llm_inference_lab_tpu.config import EngineConfig
    from llm_inference_lab_tpu.core.batching import ContinuousBatcher
    from llm_inference_lab_tpu.core.engine import Engine

    small = args.small or jax.default_backend() == "cpu"
    cfg = EngineConfig(
        base_model="llama-tiny" if small else "llama-3.2-3b",
        draft_model=(
            ("llama-tiny" if small else "llama-3.2-1b") if args.draft else None
        ),
        implementation="hf",
        max_draft=args.k,
        max_new_tokens=args.max_tokens,
        quantization=None if small else "int8",
        quantize_embed=not small,
        max_seq_len=256,
    )
    eng = Engine(cfg)
    b = ContinuousBatcher(eng, n_slots=args.slots, poll_every=args.poll_every)
    if args.sched == "fixed":
        b._next_chunk_len = lambda: args.poll_every

    prompt = "Probe request: the quick brown fox jumps over the lazy dog"

    # --- phase microbenchmarks -----------------------------------------
    def sync():
        jax.block_until_ready(b.state.lengths)
        np.asarray(b.state.steps)

    # One admission, device-synced (includes one relay RTT — reported as-is,
    # admission happens once per request, not once per step).
    rid = b.submit(prompt, max_new_tokens=args.max_tokens)
    b._admit_pending()
    sync()
    t0 = time.perf_counter()
    rid = b.submit(prompt, max_new_tokens=args.max_tokens)
    b._admit_pending()
    sync()
    admit_one_ms = (time.perf_counter() - t0) * 1e3

    # Batched wave admission (G=8 in one make_admit_many dispatch).
    for _ in range(8):
        b.submit(prompt, max_new_tokens=args.max_tokens)
    b._admit_pending()  # compile the (8, P) admit
    sync()
    for s in range(b.n_slots):
        if b._slots[s] is not None:
            b.cancel(b._slots[s].req_id)
    b._retire_finished()
    for _ in range(8):
        b.submit(prompt, max_new_tokens=args.max_tokens)
    t0 = time.perf_counter()
    b._admit_pending()
    sync()
    admit_wave8_ms = (time.perf_counter() - t0) * 1e3

    # SLOPE-time the decode chunk at full occupancy. Budgets are bounded by
    # max_seq_len, so each timed run starts from a FRESH full batch (the
    # fill happens outside the timed window); slope (hi - lo) cancels the
    # relay RTT and any fixed per-measurement overhead.
    budget = b.max_seq_len - 48  # lanes stay active through every rep
    n_occ = 0

    def drain_all():
        for s in range(b.n_slots):
            if b._slots[s] is not None:
                b.cancel(b._slots[s].req_id)
        b.run()

    def chunks_ms(n):
        nonlocal n_occ
        drain_all()
        for _ in range(args.slots):
            b.submit(prompt, max_new_tokens=budget)
        b._admit_pending()
        b.step_chunk(args.poll_every)  # warm
        sync()
        n_occ = sum(
            r is not None and not r.prefilling for r in b._slots
        )
        assert all(np.asarray(b.state.active)[: b.n_slots]), "lanes died"
        t0 = time.perf_counter()
        for _ in range(n):
            b.step_chunk(args.poll_every)
        sync()
        return (time.perf_counter() - t0) * 1e3

    chunks_ms(2)  # compile every shape
    lo = sorted(chunks_ms(2) for _ in range(3))[1]
    hi = sorted(chunks_ms(10) for _ in range(3))[1]
    chunk_full_ms = (hi - lo) / 8  # slope: RTT + fixed overhead cancel
    drain_all()

    # Precompile the wave-admission shapes the drain will hit (power-of-two
    # group sizes; staggered mixed-workload retirements produce every
    # bucket), so the timed drain measures steady-state serving, not
    # one-time jit compiles — a long-running server pays these once.
    g = args.slots
    while g >= 1:
        for i in range(g):
            b.submit(f"{prompt} #{i}", max_new_tokens=8)
        b._admit_pending()
        b.run()
        g //= 2

    # --- the drain run with trace --------------------------------------
    rng = np.random.default_rng(0)
    if args.workload == "mixed":
        # Length spread (16..128, mean ~ max_tokens) + optional Poisson
        # arrivals: the regime where retirements stagger.
        budgets = rng.integers(16, 2 * args.max_tokens, args.requests)
        budgets = np.minimum(budgets, 128)
    else:
        budgets = np.full(args.requests, args.max_tokens)
    b.stats.__init__()  # reset counters
    b.start_trace()
    if args.workload == "mixed" and args.arrival_rate > 0:
        gaps = rng.exponential(1.0 / args.arrival_rate, args.requests)
        arrivals = np.cumsum(gaps)
        arrivals[: 2 * args.slots] = 0.0  # warm start: fill the slots
        t0 = time.perf_counter()
        nxt = 0
        while nxt < args.requests or any(
            s is not None for s in b._slots
        ) or b.scheduler.pending():
            now = time.perf_counter() - t0
            while nxt < args.requests and arrivals[nxt] <= now:
                b.submit(f"{prompt} #{nxt}",
                         max_new_tokens=int(budgets[nxt]))
                nxt += 1
            flags = b.poll_flags_async()
            b.step_chunk()  # pending admissions ride this dispatch (fused)
            b._admit_overlapped()
            fresh = b._prefetch_retire(flags)
            b._retire_finished(fresh if fresh is not None else flags)
            b._admit_post_poll()
        b._retire_finished()
        wall = time.perf_counter() - t0
    else:
        for i in range(args.requests):
            b.submit(f"{prompt} #{i}", max_new_tokens=int(budgets[i]))
        t0 = time.perf_counter()
        b.run()
        wall = time.perf_counter() - t0
    rep = b.stats.report(args.slots)
    toks = rep["committed_tokens"]

    step_ms_full = chunk_full_ms / args.poll_every
    lane_tok_s = 1e3 / step_ms_full  # per-slot decode rate at full occupancy
    bound = lane_tok_s * args.slots
    # Trace rows now include the retirement-tail top-up (the lagged
    # snapshot's final chunk lands at the retirement poll), so a
    # committed=0 row is a genuinely token-free poll — not the poll-lag
    # reporting artifact that made round-4's `zero_commit_chunks: 6`
    # misleading (VERDICT r4 weak #6).
    zero_polls = sum(
        1 for row in b.trace if row["committed"] == 0 and row["occupied"] > 0
    )
    # Arrival-aware oracle: the full-occupancy bound assumes 16 busy lanes
    # for the whole wall, but a Poisson arrival schedule with a spread of
    # small budgets is ARRIVAL-limited at the front and tail-limited at the
    # end (the last request alone needs budget/lane_tok_s seconds after it
    # lands). This greedy M/G/slots simulation — zero admission cost, zero
    # poll lag, every lane at full-occupancy speed — is the best ANY
    # scheduler could do on this workload; pct_of_oracle is the honest
    # efficiency number for mixed workloads (pct_of_bound stays for
    # cross-round comparability).
    import heapq

    if args.workload == "mixed" and args.arrival_rate > 0:
        arr = list(arrivals)
    else:
        arr = [0.0] * args.requests
    free_at = [0.0] * args.slots
    heapq.heapify(free_at)
    oracle_wall = 0.0
    for t_a, bud in zip(arr, budgets):
        t_start = max(heapq.heappop(free_at), t_a)
        t_end = t_start + float(bud) / lane_tok_s
        heapq.heappush(free_at, t_end)
        oracle_wall = max(oracle_wall, t_end)
    out = {
        "config": {
            "base": cfg.base_model, "draft": cfg.draft_model,
            "slots": args.slots, "poll_every": args.poll_every,
            "requests": args.requests, "max_tokens": args.max_tokens,
            "workload": args.workload, "arrival_rate": args.arrival_rate,
            "sched": args.sched,
            "backend": jax.default_backend(),
        },
        "micro": {
            "admit_one_ms": round(admit_one_ms, 2),
            "admit_wave8_ms": round(admit_wave8_ms, 2),
            "chunk_ms_full": round(chunk_full_ms, 2),
            "step_ms_full": round(step_ms_full, 3),
            "lane_tok_s_full": round(lane_tok_s, 1),
            "bound_tok_s": round(bound, 1),
            "occupancy_at_measure": n_occ,
        },
        "drain": {
            "wall_s": round(wall, 3),
            "tokens": toks,
            "aggregate_tok_s": round(toks / wall, 1),
            "pct_of_bound": round(100 * toks / wall / bound, 1),
            "oracle_wall_s": round(oracle_wall, 3),
            "oracle_tok_s": round(toks / oracle_wall, 1) if oracle_wall else None,
            "pct_of_oracle": (
                round(100 * oracle_wall / wall, 1) if oracle_wall else None
            ),
            "zero_commit_polls": zero_polls,
            **rep,
        },
        "trace": b.trace,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "trace"}, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
