"""Serving throughput demo: OpenAI-compatible server + concurrent clients.

Boots the InferenceServer on the flagship engine, fires concurrent
completion requests, and reports aggregate throughput + latency percentiles.
Run: python scripts/serving_demo.py [--small] [--requests 20] [--slots 8]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import concurrent.futures
import json
import subprocess
import time
import urllib.request


def client_main(url: str, requests_n: int, slots: int, max_tokens: int) -> None:
    """Subprocess client driver: fire the warm wave + the timed run against
    `url` and print one JSON result line. Runs in its OWN process so the
    clients' JSON/HTTP work doesn't share the GIL with the serving loop —
    in-process client threads were measured costing ~20 ms per poll cycle
    of server-side stall (http_r5: 1,636 tok/s in-process)."""

    def one(i):
        body = json.dumps({
            "prompt": "Probe request: the quick brown fox jumps over the "
                      f"lazy dog #{i}",
            "max_tokens": max_tokens,
        }).encode()
        req = urllib.request.Request(
            url, data=body,
            headers={"Content-Type": "application/json"},
        )
        t0 = time.perf_counter()
        with urllib.request.urlopen(req, timeout=600) as resp:
            out = json.loads(resp.read())
        return time.perf_counter() - t0, out["usage"]["completion_tokens"]

    workers = min(requests_n, 2 * slots)
    one(0)
    with concurrent.futures.ThreadPoolExecutor(max_workers=workers) as ex:
        list(ex.map(one, range(slots)))
    t0 = time.perf_counter()
    with concurrent.futures.ThreadPoolExecutor(max_workers=workers) as ex:
        results = list(ex.map(one, range(requests_n)))
    wall = time.perf_counter() - t0
    lats = sorted(r[0] for r in results)
    print(json.dumps({
        "wall_s": round(wall, 2),
        "tokens": sum(r[1] for r in results),
        "client_concurrency": workers,
        "latency_p50_s": round(lats[len(lats) // 2], 2),
        "latency_p95_s": round(lats[int(len(lats) * 0.95)], 2),
    }))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--requests", type=int, default=20)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--max-tokens", type=int, default=32)
    ap.add_argument("--quant", default="int8")
    ap.add_argument("--k", type=int, default=2, help="max_draft (spec depth)")
    ap.add_argument("--no-draft", action="store_true",
                    help="non-speculative serving (throughput-optimal at "
                    "worst-case acceptance)")
    ap.add_argument("--mode", default="vanilla",
                    help="draft mode (vanilla|ngram|medusa|eagle); ngram "
                    "needs no draft model")
    ap.add_argument("--base", default=None, help="override base model")
    ap.add_argument("--poll-every", type=int, default=8,
                    help="decode steps per device dispatch between host polls")
    ap.add_argument("--out", default=None,
                    help="write the result JSON to this path")
    ap.add_argument("--inproc-client", action="store_true",
                    help="drive clients from this process (GIL-shared with "
                    "the serving loop; default spawns a client subprocess)")
    ap.add_argument("--client", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.client:
        client_main(args.client, args.requests, args.slots, args.max_tokens)
        return 0

    import jax

    from llm_inference_lab_tpu.config import EngineConfig
    from llm_inference_lab_tpu.core.engine import Engine
    from llm_inference_lab_tpu.server import InferenceServer

    small = args.small or jax.default_backend() == "cpu"
    no_draft = args.no_draft or args.mode in ("ngram", "medusa", "eagle")
    cfg = EngineConfig(
        base_model=args.base or ("llama-tiny" if small else "llama-3.2-3b"),
        draft_model=None if no_draft
        else ("llama-tiny" if small else "llama-3.2-1b"),
        implementation="hf",
        draft_mode=args.mode,
        max_draft=args.k,
        max_new_tokens=args.max_tokens,
        quantization=None if small else args.quant,
        quantize_embed=not small,
        max_seq_len=256,
    )
    server = InferenceServer(Engine(cfg), n_slots=args.slots, port=0,
                             poll_every=args.poll_every)
    server.start()
    url = f"http://127.0.0.1:{server.port}/v1/completions"

    # Same prompt family as scripts/occupancy_probe.py so the HTTP number
    # is directly comparable to the direct-drive drain artifact.
    # Warm/compile + timed run. Client concurrency 2x slots: with exactly
    # `slots` in flight the closed loop starves the server at every
    # retirement wave (the freed slots idle while responses travel to the
    # client and new requests travel back), measuring the CLIENT's
    # turnaround instead of the server's capacity; 2x keeps the admission
    # queue non-empty — the same saturation semantics as the occupancy
    # probe's pre-filled queue. The clients run in a SUBPROCESS by default
    # (client_main): in this process they share the GIL with the serving
    # loop and depress the measurement.
    if args.inproc_client:
        client_main(url, args.requests, args.slots, args.max_tokens)
        cres = None  # client_main printed its own line; not captured
        raise SystemExit(0)
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--client", url,
         "--requests", str(args.requests), "--slots", str(args.slots),
         "--max-tokens", str(args.max_tokens)],
        capture_output=True, text=True, timeout=1800,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},  # client needs no TPU
    )
    if r.returncode != 0:
        print(r.stdout + r.stderr)
        server.stop()
        return 1
    cres = json.loads(r.stdout.strip().splitlines()[-1])
    out = {
        "requests": args.requests,
        "client_concurrency": cres["client_concurrency"],
        "client_isolation": "subprocess",
        "slots": args.slots,
        "max_tokens": args.max_tokens,
        "poll_every": args.poll_every,
        "base": cfg.base_model,
        "quant": cfg.quantization,
        "mode": "baseline" if no_draft else f"{args.mode}_k{args.k}",
        "wall_s": cres["wall_s"],
        "tokens": cres["tokens"],
        "aggregate_tok_s": round(cres["tokens"] / cres["wall_s"], 1),
        "latency_p50_s": cres["latency_p50_s"],
        "latency_p95_s": cres["latency_p95_s"],
    }
    # Loop-section attribution (cumulative since server start, warm waves
    # included — proportions are what matter): where the serving loop's
    # host wall goes vs the direct-drive occupancy probe.
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/stats", timeout=30
        ) as resp:
            out["server_stats_cumulative"] = json.loads(resp.read())
    except Exception:
        pass
    print(json.dumps(out))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    server.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
