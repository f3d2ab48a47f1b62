"""Distributed execution over TPU meshes (ICI/DCN).

Green-field relative to the reference: multi-device parallelism is Phase 4C
"Planned" there (README.md:84, :393-395). Here: a (data, model) Mesh,
NamedSharding rules for every param/state leaf, and GSPMD-partitioned step
functions — XLA inserts and overlaps the all-gather/reduce-scatter
collectives with compute (latency-hiding scheduler), replacing hand-written
NCCL calls the reference never had.
"""

from llm_inference_lab_tpu.parallel.context import (  # noqa: F401
    ring_attention_shard,
    ring_self_attention,
)
from llm_inference_lab_tpu.parallel.mesh import make_mesh  # noqa: F401
from llm_inference_lab_tpu.parallel.sharding import (  # noqa: F401
    shard_params,
    shard_state,
)
