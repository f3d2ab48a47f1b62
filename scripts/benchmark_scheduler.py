"""Scheduler benchmark: length-aware admission vs naive FCFS padding waste.

Reference parity: src/benchmarks/benchmark_sequence_pool.py (sequence-pool
vs pad-to-max on synthetic normal/exponential length distributions :30-60).
Here the metric is padding waste (padded tokens / real tokens) of admitted
groups plus raw native-scheduler throughput (submissions/admissions per
second through the C++ core).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import json
import time

import numpy as np

from llm_inference_lab_tpu.native import NativeScheduler


def padding_waste(admission_rounds, lengths):
    real = padded = 0
    for group in admission_rounds:
        if not group:
            continue
        mx = max(lengths[i] for i in group)
        for i in group:
            real += lengths[i]
            padded += mx
    return padded / real if real else 1.0


def simulate(dist: str, n: int = 2048, slots: int = 8, length_bucket: int = 32):
    rng = np.random.default_rng(0)
    if dist == "normal":
        lens = np.clip(rng.normal(256, 64, n), 16, 1024).astype(int)
    else:
        lens = np.clip(rng.exponential(200, n) + 16, 16, 1024).astype(int)

    # Naive FCFS
    fcfs_rounds = [list(range(i, min(i + slots, n))) for i in range(0, n, slots)]

    # Length-aware native scheduler
    sched = NativeScheduler(length_bucket=length_bucket, max_wait=8 * slots)
    for i, ln in enumerate(lens):
        sched.submit(i, int(ln), 64)
    aware_rounds = []
    while sched.pending():
        aware_rounds.append(sched.admit(slots))

    return {
        "distribution": dist,
        "n": n,
        "backend": sched.backend,
        "fcfs_padding_waste": round(padding_waste(fcfs_rounds, lens), 4),
        "length_aware_padding_waste": round(padding_waste(aware_rounds, lens), 4),
    }


def throughput(n: int = 100_000):
    sched = NativeScheduler()
    t0 = time.perf_counter()
    for i in range(n):
        sched.submit(i, 100 + (i % 400), 64)
    t1 = time.perf_counter()
    total = 0
    while sched.pending():
        total += len(sched.admit(8))
    t2 = time.perf_counter()
    return {
        "backend": sched.backend,
        "submits_per_sec": round(n / (t1 - t0)),
        "admits_per_sec": round(total / (t2 - t1)),
    }


if __name__ == "__main__":
    out = {
        "normal": simulate("normal"),
        "exponential": simulate("exponential"),
        "throughput": throughput(),
    }
    print(json.dumps(out, indent=2))
