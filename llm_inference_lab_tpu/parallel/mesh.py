"""Device mesh construction.

Axes:
  data  — batch (DP): sequences are independent; continuous-batching slots
          shard across this axis.
  model — tensor parallel (TP): attention heads / MLP hidden sharded over
          ICI; collectives ride the fast intra-slice links.

Multi-host: jax.distributed + the same named mesh spans hosts; DCN carries
only the data axis (keep `model` within a host's ICI domain by putting it
last / minor in the device order).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    data: int = 1,
    model: int = 1,
    seq: int = 1,
    stage: int = 1,
    expert: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Device mesh with ("data", "model") axes, plus optional axes:

    - "seq" (between data and model): context parallelism — ring-attention
      prefill (parallel/context.py).
    - "stage" (after data): pipeline parallelism — layer-axis sharding +
      GPipe microbatch schedule (parallel/pipeline.py). Coarser than model
      on purpose: stage hops are one activation ppermute per microbatch
      tick, far less bandwidth-hungry than TP's per-matmul collectives.
    - "expert" (after stage): expert parallelism — MoE expert stacks shard
      on it and the dispatch/combine einsums all-to-all over it
      (ops/moe.py moe_dense).
    """
    devices = list(devices if devices is not None else jax.devices())
    need = data * stage * expert * seq * model
    if need > len(devices):
        raise ValueError(
            f"mesh {data}x{stage}x{expert}x{seq}x{model} needs {need} "
            f"devices, have {len(devices)}"
        )
    if stage > 1 and seq > 1:
        raise ValueError("stage (pipeline) and seq (ring-attention) axes "
                         "are mutually exclusive")
    dims = [("data", data), ("stage", stage), ("expert", expert),
            ("seq", seq), ("model", model)]
    dims = [(n, s) for n, s in dims if s > 1 or n in ("data", "model")]
    arr = np.array(devices[:need]).reshape([s for _, s in dims])
    return Mesh(arr, tuple(n for n, _ in dims))


def auto_mesh(n_devices: Optional[int] = None) -> Mesh:
    """Default: all devices on the model (TP) axis — the right default for
    single-host low-latency inference of one large model."""
    n = n_devices or len(jax.devices())
    return make_mesh(data=1, model=n)
