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
    _supports_overlap_admit = False
    _supports_fused_admit = False
    # Round-4: lazy page growth/preemption IS supported — the coordinator
    # plans (_plan_growth: allocator + slot bookkeeping) and the fixed-shape
    # op list is broadcast; every host applies the same device effects in
    # the same order (_apply_growth's table writes are collectives).
    _supports_lazy_pages = True

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
             self.state.lengths, self.state.steps)
        )
        return tuple(np.asarray(v) for v in vals)

    def _fetch_tokens(self, flags=None):
        if self.n_procs == 1:
            return super()._fetch_tokens(flags)
        vals = _allgather(
            (self.state.tokens, self.state.lengths, self.state.token_logprobs)
        )
        return np.asarray(vals[0]), np.asarray(vals[1]), np.asarray(vals[2])

    def _fetch_tops(self):
        if self.n_procs == 1:
            return super()._fetch_tops()
        vals = _allgather((self.state.top_ids, self.state.top_lps))
        return np.asarray(vals[0]), np.asarray(vals[1])

    def _grow_pages(self, lengths_now, proposed=None, accepted=None) -> None:
        """Round-4: lazy growth/preemption under multi-controller execution.
        The coordinator plans (its allocator is the only source of truth);
        the ordered op list rides ONE fixed-shape broadcast; every host
        applies the same device effects in the same order (_apply_growth's
        jitted table/flag writes are collectives on the sharded state).
        Costs one extra DCN broadcast per poll — same cadence as
        _sync_poll, never per decode step."""
        if self.n_procs == 1:
            return super()._grow_pages(lengths_now, proposed, accepted)
        if not self.lazy_pages:
            return
        from jax.experimental import multihost_utils

        B, M = self.n_slots, self._pages_per_seq
        # Rows: (kind, slot, prop, acc, table_row[M]); kind 0 ends the
        # list. Bound: one grow per slot + one preempt per occupied slot.
        buf = np.zeros((2 * B, 4 + M), np.int32)
        ops: List[tuple] = []
        if self.is_coordinator:
            ops = self._plan_growth(lengths_now, proposed, accepted)
            for i, op in enumerate(ops):
                kind = {"grow": 1, "truncate": 2, "preempt": 3}[op[0]]
                buf[i, 0], buf[i, 1] = kind, op[1]
                if kind == 1:
                    buf[i, 4:] = op[2]
                elif kind == 3:
                    buf[i, 2], buf[i, 3] = op[3], op[4]
        buf = multihost_utils.broadcast_one_to_all(buf)
        if not self.is_coordinator:
            # Reconstruct the plan against the local placeholders, applying
            # the same host bookkeeping _plan_growth did on the coordinator.
            for row in buf:
                kind = int(row[0])
                if kind == 0:
                    break
                slot = int(row[1])
                if kind == 1:
                    ops.append(("grow", slot, np.array(row[4:], np.int32)))
                elif kind == 2:
                    ops.append(("truncate", slot))
                else:
                    req = self._slots[slot]
                    self._slots[slot] = None
                    self._counted[slot] = 0
                    if req is not None and req.pages:
                        self.allocator.free(req.pages)
                    ops.append(
                        ("preempt", slot, req, int(row[2]), int(row[3]))
                    )
        self._apply_growth(ops)

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
                # admit_ids / remaining_new (not ids / max_new_tokens):
                # a preempted request resumes by recomputing its full
                # prompt+generated context with its shrunken budget.
                header[i] = (
                    req.slot, len(req.admit_ids), req.remaining_new,
                    req.req_id,
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
                rows[i, : len(req.admit_ids)] = req.admit_ids
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
