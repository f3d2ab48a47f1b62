"""Multi-host continuous batching: two real `jax.distributed` CPU processes
drain a shared queue; results must be identical to the single-process run
(SURVEY.md §4 multiprocess simulation; round-1 VERDICT item 3 — the
reference has no distributed code at all, Phase 4C planned only,
/root/reference/README.md:393-395)."""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "scripts", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_fleet(nprocs: int, out: str, extra=(), timeout=600):
    """Launch nprocs worker processes; rank 0 writes results to `out`."""
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    procs = []
    for rank in range(nprocs):
        cmd = [sys.executable, WORKER, "--rank", str(rank),
               "--nprocs", str(nprocs), "--port", str(port), *extra]
        if rank == 0:
            cmd += ["--out", out]
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=ROOT,
        ))
    logs = []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=timeout)
            logs.append(stdout)
            assert p.returncode == 0, f"worker failed:\n{stdout}"
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return logs


def _single_process(out: str, extra=()):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, WORKER, "--nprocs", "1", "--out", out, *extra],
        env=env, capture_output=True, text=True, cwd=ROOT, timeout=600,
    )
    assert r.returncode == 0, f"single-process worker failed:\n{r.stdout}\n{r.stderr}"


def test_two_process_drain_matches_single_process(tmp_path):
    multi = tmp_path / "multi.json"
    single = tmp_path / "single.json"
    _run_fleet(2, str(multi))
    _single_process(str(single))
    got = json.loads(multi.read_text())
    want = json.loads(single.read_text())
    assert len(got) == 6
    assert got == want


@pytest.mark.slow
def test_two_process_paged(tmp_path):
    multi = tmp_path / "multi_paged.json"
    single = tmp_path / "single_paged.json"
    _run_fleet(2, str(multi), extra=("--paged",))
    _single_process(str(single), extra=("--paged",))
    assert json.loads(multi.read_text()) == json.loads(single.read_text())


@pytest.mark.slow
def test_two_process_lazy_preemption(tmp_path):
    """Round-4 (VERDICT task 9): lazy paged allocation with POOL-EXHAUSTION
    PREEMPTION under two real jax.distributed processes. The coordinator
    plans growth/preemption; the op list is broadcast; all hosts apply the
    same device effects. The worker asserts growth AND preemption actually
    fired (tiny 12-page pool); results must equal the single-process run,
    preemption/resume included."""
    multi = tmp_path / "multi_lazy.json"
    single = tmp_path / "single_lazy.json"
    _run_fleet(2, str(multi), extra=("--lazy",))
    _single_process(str(single), extra=("--lazy",))
    assert json.loads(multi.read_text()) == json.loads(single.read_text())


@pytest.mark.slow
def test_two_process_adaptive_device_k(tmp_path):
    """Per-slot device-side adaptive K across two processes: K adapts in
    the sharded DecodeState (a collective), so fleets can never diverge on
    the compiled program; results must equal single-process."""
    multi = tmp_path / "multi_adk.json"
    single = tmp_path / "single_adk.json"
    _run_fleet(2, str(multi), extra=("--adaptive-device",))
    _single_process(str(single), extra=("--adaptive-device",))
    assert json.loads(multi.read_text()) == json.loads(single.read_text())
