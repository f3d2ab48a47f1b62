"""Multi-host continuous-batching worker: one process of an N-process fleet.

Run one copy per "host" (SURVEY.md §4's multiprocess CPU simulation of a
multi-host TPU slice; on a real pod each host runs this unmodified with the
env-driven auto-init instead of explicit --rank):

    python scripts/multihost_worker.py --rank 0 --nprocs 2 --port 9876 \
        --out /tmp/r0.json
    python scripts/multihost_worker.py --rank 1 --nprocs 2 --port 9876

Process 0 submits the prompt set and writes results JSON; other ranks just
participate in the collectives. With --nprocs 1 it runs the same workload
single-process (the equivalence oracle for tests/test_multihost.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=0)
    ap.add_argument("--nprocs", type=int, default=1)
    ap.add_argument("--port", type=int, default=9876)
    ap.add_argument("--out", default=None)
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--n-slots", type=int, default=4)
    ap.add_argument("--paged", action="store_true")
    ap.add_argument("--lazy", action="store_true",
                    help="paged + tiny page pool: forces lazy growth AND "
                    "pool-exhaustion preemption/resume (round-4: the "
                    "growth plan is coordinator-decided and broadcast)")
    ap.add_argument("--adaptive-device", action="store_true",
                    help="per-slot device-side adaptive K controller")
    args = ap.parse_args(argv)

    import jax

    # CPU simulation of an N-host slice. config.update (not env vars): the
    # axon sitecustomize pre-imports jax, so env vars are too late here.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.local_devices)
    if args.nprocs > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.nprocs,
            process_id=args.rank,
        )

    from llm_inference_lab_tpu.config import EngineConfig
    from llm_inference_lab_tpu.core.engine import Engine
    from llm_inference_lab_tpu.core.multihost_batching import MultiHostBatcher
    from llm_inference_lab_tpu.models.base import Model, ModelConfig
    from llm_inference_lab_tpu.models import transformer
    from llm_inference_lab_tpu.parallel.multihost import make_multihost_mesh
    from functools import partial
    import jax.numpy as jnp

    def tiny(seed, layers):
        cfg = ModelConfig(
            name=f"mh-{seed}", arch="llama", vocab_size=256, n_layers=layers,
            n_heads=4, n_kv_heads=2, d_model=32, d_ff=64,
            max_position_embeddings=512, dtype=jnp.float32,
        )
        params = transformer.init_params(cfg, jax.random.PRNGKey(seed))
        return Model(config=cfg, params=params,
                     apply_fn=partial(transformer.forward, cfg),
                     head_fn=partial(transformer.lm_head_logits, cfg))

    # model axis within one host's devices; data axis spans hosts.
    mesh = make_multihost_mesh(model_per_host=args.local_devices)
    overrides = {}
    if args.paged or args.lazy:
        overrides.update(kv_layout="paged", kv_page_size=32)
    if args.lazy:
        # 10 pages for 4 slots x up to ~5 pages each: admission is
        # memory-aware, decode growth must allocate on demand, and the
        # pool exhausts -> youngest-slot preemption + resume-by-recompute
        # (verified: 10 pages -> exactly 1 grow + 1 preemption on this
        # workload; 12 never exhausts, 9 never even needs the victim).
        overrides.update(kv_pages=10, max_new_tokens=48)
    if args.adaptive_device:
        overrides.update(controller="adaptive-device")
    cfg = EngineConfig(
        implementation="hf", max_draft=3,
        max_new_tokens=overrides.pop("max_new_tokens", 16),
        dtype="float32", max_seq_len=256, shard_draft=True, **overrides,
    )
    eng = Engine(cfg, target_model=tiny(1, 2), draft_model=tiny(2, 1),
                 mesh=mesh)
    batcher = MultiHostBatcher(eng, n_slots=args.n_slots)

    prompts = [
        "multi host prompt alpha " * 3,
        "beta",
        "the third multi host prompt is a bit longer " * 2,
        "gamma delta",
        "epsilon " * 5,
        "zeta",
    ]
    if batcher.is_coordinator:
        for i, p in enumerate(prompts):
            batcher.submit(
                p,
                max_new_tokens=(
                    cfg.max_new_tokens - 8 * (i % 2) if args.lazy
                    else 8 + 4 * (i % 3)
                ),
            )
    results = batcher.run()
    if args.lazy and batcher.is_coordinator:
        # The point of the mode: the tiny pool must actually have forced
        # growth and preemption (otherwise the test proves nothing).
        assert batcher.stats.page_grows > 0, "no lazy growth happened"
        assert batcher.stats.preemptions > 0, "no preemption happened"

    if batcher.is_coordinator and args.out:
        payload = [
            {k: r[k] for k in
             ("req_id", "generated_ids", "generated_tokens", "text")}
            for r in results
        ]
        with open(args.out, "w") as f:
            json.dump(payload, f)
        print(f"wrote {len(payload)} results to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
