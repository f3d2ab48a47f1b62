"""Multi-host execution helpers (DCN across hosts, ICI within a host).

Green-field vs the reference (no distributed code at all, SURVEY.md §2.9).
Usage on an N-host TPU slice:

    # on every host, before any jax call:
    initialize_multihost()          # env-driven (TPU pods auto-configure)
    mesh = make_multihost_mesh(model_per_host=4)
    eng = Engine(cfg, mesh=mesh)

Design: the `model` (TP) axis must stay inside one host's ICI domain — its
collectives (all-gather/reduce-scatter around every projection) are
latency-critical. The `data` axis spans hosts over DCN; it only moves
per-sequence state at admission/retirement, so DCN latency hides behind
decode steps. Per-host batch slots stay host-local in the continuous
batcher; cross-host admission is coordinated by rank-0 broadcasting the
slot assignment (jax.experimental.multihost_utils).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """jax.distributed.initialize with env/TPU-pod auto-detection. Safe to
    call in single-process mode (no-op). Returns topology info."""
    try:
        if num_processes is not None or coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        elif jax.process_count() == 1:
            pass  # single process; nothing to initialize
    except RuntimeError:
        pass  # already initialized
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def make_multihost_mesh(model_per_host: Optional[int] = None) -> Mesh:
    """(data, model) mesh where `model` never crosses a host boundary:
    data = hosts * (local_devices // model_per_host)."""
    local = jax.local_device_count()
    model = model_per_host or local
    assert local % model == 0, f"model_per_host={model} must divide {local}"
    devices = np.array(jax.devices())
    # jax.devices() orders by process, so reshaping (hosts*local//model, model)
    # keeps each model group within one process's devices.
    mesh_arr = devices.reshape(-1, model)
    return Mesh(mesh_arr, ("data", "model"))


def broadcast_from_rank0(x):
    """Host-level scalar/array agreement (admission decisions, stop flags)."""
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(x)
