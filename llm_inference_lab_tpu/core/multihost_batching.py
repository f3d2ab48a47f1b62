"""Multi-host continuous batching: coordinator-planned, collectively executed.

Round-1 VERDICT item 3 / reference Phase 4C (planned only,
/root/reference/README.md:393-395 — the reference has no distributed code;
SURVEY.md §2.9). TPU-native design, NOT an RPC work-queue port:

JAX multi-controller execution means every process runs the SAME program over
globally-sharded arrays — a jitted step is a collective, so all hosts must
issue identical device calls in identical order. Continuous batching has
exactly three host-side decision points that could diverge:

  1. admission (which request -> which slot, which pages),
  2. the speculation depth K for the next chunk,
  3. loop termination (queue empty + slots drained).

All three are decided ONLY by the coordinator (process 0, which owns the
request queue, the native scheduler, and the page allocator) and distributed
with ONE `broadcast_one_to_all` of fixed-shape int32 buffers per poll — DCN
traffic is a few KB per admission poll, never per decode step. Decode steps
themselves involve no host coordination at all: `step_chunk` runs the same
bounded device loop everywhere, and retirement derives from allgathered
active flags, which are host-uniform by construction.

Slot state stays device-resident and sharded: the batch ("data") axis of the
decode state spans hosts, so each host's devices hold B/n_hosts slots of KV
cache; admission prefill and splice run as collectives exactly like decode.

Usage (every host runs the same script):

    initialize_multihost()
    mesh = make_multihost_mesh(model_per_host=...)
    eng = Engine(cfg, mesh=mesh)
    batcher = MultiHostBatcher(eng, n_slots=8)
    if batcher.is_coordinator:
        for p in prompts:
            batcher.submit(p)
    results = batcher.run()   # collective; authoritative on the coordinator

Tested with two `jax.distributed` CPU processes (tests/test_multihost.py),
the SURVEY §4 multiprocess-simulation strategy.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import numpy as np

from llm_inference_lab_tpu.core.batching import ContinuousBatcher, _Request


def _allgather(tree):
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree, tiled=True)


class MultiHostBatcher(ContinuousBatcher):
    """ContinuousBatcher whose host-side decisions are coordinator-only and
    broadcast; all device work stays collective. Single-process mode (no
    jax.distributed) degenerates to the base class exactly."""

    # Interleaved admission would need its chunk calls replayed
    # host-uniformly from the synced plan; long admissions stay one-shot
    # here (see ContinuousBatcher._supports_incremental_admit).
    _supports_incremental_admit = False
    # Page growth/preemption are per-poll host decisions that would need
    # their own broadcast; multi-host serving keeps worst-case reservation.
    _supports_lazy_pages = False

    def __init__(self, engine, n_slots: int = 8, **kw):
        super().__init__(engine, n_slots=n_slots, **kw)
        self.rank = jax.process_index()
        self.n_procs = jax.process_count()
        self.is_coordinator = self.rank == 0
        # Fixed-shape broadcast buffers: header rows are
        # (slot, plen, max_new, req_id); prompt ids pad to max_seq_len.
        self._row_buf = self.max_seq_len
        self._tab_buf = self._pages_per_seq if self.paged else 1
        self._k_sync = int(super()._current_k())

    # -- host-decision overrides ---------------------------------------
    def submit(self, prompt: str, max_new_tokens: Optional[int] = None,
               **sampling) -> int:
        if not self.is_coordinator:
            raise RuntimeError(
                "submit() is coordinator-only (process 0 owns the queue); "
                "other hosts just call run()"
            )
        return super().submit(prompt, max_new_tokens, **sampling)

    def _fetch_flags(self):
        if self.n_procs == 1:
            return super()._fetch_flags()
        vals = _allgather(
            (self.state.active, self.state.proposed, self.state.accepted,
             self.state.lengths)
        )
        return tuple(np.asarray(v) for v in vals)

    def _fetch_tokens(self):
        if self.n_procs == 1:
            return super()._fetch_tokens()
        vals = _allgather(
            (self.state.tokens, self.state.lengths, self.state.token_logprobs)
        )
        return np.asarray(vals[0]), np.asarray(vals[1]), np.asarray(vals[2])

    def _fetch_tops(self):
        if self.n_procs == 1:
            return super()._fetch_tops()
        vals = _allgather((self.state.top_ids, self.state.top_lps))
        return np.asarray(vals[0]), np.asarray(vals[1])

    def _current_k(self) -> int:
        # K is a compile-cache key: it must be identical on every host or
        # they'd dispatch different programs. The coordinator's scheduler
        # decides at each _sync_poll; EVERY host (coordinator included)
        # steps with the broadcast value so scheduler-state drift between
        # poll and step can't desynchronize the fleet.
        if getattr(self, "n_procs", 1) == 1:
            return super()._current_k()
        return self._k_sync

    # -- the one broadcast per poll ------------------------------------
    def _sync_poll(self) -> dict:
        """Coordinator plans admissions + K + queue status; everyone gets
        the same fixed-shape payload and executes the same admissions."""
        from jax.experimental import multihost_utils

        B = self.n_slots
        # header rows: (slot, plen, max_new, req_id, top_k, reuse_len,
        # seed, rf, lora) — seed is RESOLVED on the coordinator (explicit
        # request seed or the deterministic engine-seed/req-id derivation)
        # so all hosts admit the identical per-slot sampling key; rf
        # encodes response_format (0 none, 1 json, 2 json_object,
        # 3 json_schema); lora is the resolved adapter index (-1 base).
        header = np.zeros((B, 9), np.int32)
        rows = np.zeros((B, self._row_buf), np.int32)
        tables = np.zeros((B, self._tab_buf), np.int32)
        # Per-request sampling (resolved to engine defaults when unset) must
        # ride the broadcast too: admission writes these into device state,
        # and hosts executing different values would desync sampling.
        # (temperature, top_p, min_p, repetition/presence/frequency penalty)
        samp = np.zeros((B, 6), np.float32)
        nb = self.state.bias_ids.shape[1]
        bias_ids = np.full((B, nb), -1, np.int32)
        bias_vals = np.zeros((B, nb), np.float32)
        meta = np.zeros((3,), np.int32)  # (n_admit, pending, k)

        dt, dk, dp, dmp = self._default_sampling
        cfgp = self.engine.config
        plans: List[_Request] = []
        if self.is_coordinator:
            plans = self._plan_admissions()
            for i, req in enumerate(plans):
                from llm_inference_lab_tpu.core.batching import (
                    derive_request_seed,
                )

                req.seed = derive_request_seed(
                    cfgp.seed, req.req_id, req.seed
                )
                header[i] = (
                    req.slot, len(req.ids), req.max_new_tokens, req.req_id,
                    dk if req.top_k is None else req.top_k, req.reuse_len,
                    req.seed,
                    {None: 0, "json": 1, "json_object": 2,
                     "json_schema": 3}[
                        req.response_format
                    ],
                    (self.engine.lora_names[req.lora]
                     if req.lora is not None else -1),
                )
                samp[i] = (
                    dt if req.temperature is None else req.temperature,
                    dp if req.top_p is None else req.top_p,
                    dmp if req.min_p is None else req.min_p,
                    cfgp.repetition_penalty
                    if req.repetition_penalty is None
                    else req.repetition_penalty,
                    cfgp.presence_penalty
                    if req.presence_penalty is None
                    else req.presence_penalty,
                    cfgp.frequency_penalty
                    if req.frequency_penalty is None
                    else req.frequency_penalty,
                )
                rows[i, : len(req.ids)] = req.ids
                if req.logit_bias:
                    for j, (tid, bv) in enumerate(
                        list(req.logit_bias.items())[:nb]
                    ):
                        bias_ids[i, j] = int(tid)
                        bias_vals[i, j] = float(bv)
                if self.paged:
                    tables[i, : len(req.pages)] = req.pages
            meta[:] = (len(plans), self.scheduler.pending(),
                       super()._current_k())

        if self.n_procs > 1:
            header, rows, tables, samp, bias_ids, bias_vals, meta = (
                multihost_utils.broadcast_one_to_all(
                    (header, rows, tables, samp, bias_ids, bias_vals, meta)
                )
            )
        n_admit, pending, self._k_sync = int(meta[0]), int(meta[1]), int(meta[2])

        for i in range(n_admit):
            (slot, plen, max_new, rid, top_k, reuse_len, seed, rf,
             lora_id) = (int(x) for x in header[i])
            if self.is_coordinator:
                req = plans[i]
            else:
                # Placeholder request: enough state to drive the identical
                # collective admission + retirement bookkeeping.
                req = _Request(rid, "", [int(t) for t in rows[i, :plen]],
                               max_new, temperature=float(samp[i, 0]),
                               top_k=top_k, top_p=float(samp[i, 1]),
                               min_p=float(samp[i, 2]),
                               repetition_penalty=float(samp[i, 3]),
                               presence_penalty=float(samp[i, 4]),
                               frequency_penalty=float(samp[i, 5]),
                               logit_bias={
                                   int(t): float(v)
                                   for t, v in zip(bias_ids[i], bias_vals[i])
                                   if t >= 0
                               } or None,
                               seed=seed,
                               response_format={0: None, 1: "json",
                                                2: "json_object",
                                                3: "json_schema"}[rf],
                               lora=(
                                   {v: k for k, v
                                    in self.engine.lora_names.items()}
                                   .get(lora_id)
                                   if lora_id >= 0 else None
                               ))
                req.slot = slot
                req.reuse_len = reuse_len
                if self.paged:
                    req.pages = [int(t) for t in tables[i]]
            self._admit_one(slot, req)
        return {"pending": pending}

    # -- collective drain ----------------------------------------------
    def run(self, max_steps: Optional[int] = None) -> List[dict]:
        """Drain the queue + all slots on every host in lockstep. Results
        are authoritative on the coordinator (other hosts lack the prompt
        text; they return placeholder results with identical token ids)."""
        if self.n_procs == 1:
            return super().run(max_steps)
        info = self._sync_poll()
        steps, limit = 0, max_steps or 10_000_000
        while steps < limit:
            occupied = any(s is not None for s in self._slots)
            if not occupied and info["pending"] == 0:
                break
            self.step_chunk(self.poll_every)
            steps += self.poll_every
            self._retire_finished()
            info = self._sync_poll()
        self._retire_finished()
        self._flush_stale_tables()
        return [self._done[rid].result for rid in sorted(self._done)]
