"""CLI: `specdx run` and `specdx bench` (+ `python -m llm_inference_lab_tpu.cli`).

Reference parity: src/specdec/run_specdec.py:40-283 (full-surface argparse:
prompt, models, K / adaptive-K, policy + tau/k/p params, draft mode, impl
fake|hf, profiling; one-line JSON to stdout) and src/specdec_cli/main.py
(`specdec run` / `specdec bench` subcommands).
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Optional


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--base-model", default="gpt2")
    p.add_argument("--draft-model", default="distilgpt2")
    p.add_argument("--no-draft", action="store_true", help="non-speculative baseline")
    p.add_argument("--impl", choices=["fake", "hf"], default="fake")
    p.add_argument("--max-draft", "-k", type=int, default=4)
    p.add_argument(
        "--policy",
        default="longest_prefix",
        choices=["longest_prefix", "conf_threshold", "topk_agree", "typical", "rejection"],
    )
    p.add_argument("--tau", type=float, default=None, help="conf_threshold tau")
    p.add_argument("--topk-k", type=int, default=None, help="topk_agree k")
    p.add_argument("--typical-p", type=float, default=None, help="typical p")
    p.add_argument("--controller", choices=["fixed", "adaptive"], default="fixed")
    p.add_argument("--target-acceptance", type=float, default=0.5)
    p.add_argument("--draft-mode",
                   choices=["vanilla", "medusa", "eagle", "tree", "ngram"],
                   default="vanilla")
    p.add_argument("--max-tokens", type=int, default=64)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--min-p", type=float, default=0.0)
    p.add_argument("--repetition-penalty", type=float, default=1.0)
    p.add_argument("--presence-penalty", type=float, default=0.0)
    p.add_argument("--frequency-penalty", type=float, default=0.0)
    p.add_argument("--sample", action="store_true", help="sample instead of greedy")
    p.add_argument("--quantization", choices=["int8", "int4"], default=None)
    p.add_argument("--quantize-embed", action="store_true",
                   help="per-row quantized embedding + tied lm_head")
    p.add_argument("--embed-bits", type=int, choices=[8, 4], default=8,
                   help="embed/tied-head width with --quantize-embed "
                   "(4 = EmbedQuant4: half the head weight read)")
    p.add_argument("--dtype", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--constrain",
                   choices=["json", "json_object", "regex"],
                   default=None,
                   help="grammar-constrained decoding (OpenAI "
                        "response_format / guided regex; serving: "
                        "per-request opt-in)")
    p.add_argument("--constrain-regex", default=None, metavar="PATTERN",
                   help="the pattern for --constrain regex (anchored "
                        "full match)")
    p.add_argument("--tools", default=None, metavar="TOOLS_JSON",
                   help="path to a JSON file with an OpenAI `tools` list; "
                        "compiles the tool-call grammar (serving: "
                        "tool_choice 'required' / named functions)")
    p.add_argument("--lora", action="append", default=None,
                   metavar="PEFT_DIR",
                   help="HF PEFT adapter directory (repeatable); serving "
                        "routes the OpenAI `model` field to adapters")
    p.add_argument("--admit-chunk", type=int, default=None,
                   help="interleaved admission: prompts longer than this "
                        "prefill in chunks between decode chunks (serving; "
                        "multiple of the KV bucket)")
    p.add_argument("--per-request-sampling", action="store_true",
                   help="per-request temperature/top_k/top_p/penalties/"
                        "seed (serving)")
    p.add_argument("--profile", action="store_true")
    p.add_argument("--config", default=None, help="YAML config path")


def _build_engine(args):
    from llm_inference_lab_tpu.config import load_config
    from llm_inference_lab_tpu.core.engine import Engine

    policy_params = {}
    if args.tau is not None:
        policy_params["tau"] = args.tau
    if args.topk_k is not None:
        policy_params["k"] = args.topk_k
    if args.typical_p is not None:
        policy_params["p"] = args.typical_p
    controller_params = (
        {"target_acceptance": args.target_acceptance}
        if args.controller == "adaptive"
        else {}
    )
    cfg = load_config(
        args.config,
        base_model=args.base_model,
        draft_model=args.draft_model,
        implementation=args.impl,
        max_draft=args.max_draft,
        policy=args.policy,
        policy_params=policy_params,
        controller=args.controller,
        controller_params=controller_params,
        draft_mode=args.draft_mode,
        max_new_tokens=args.max_tokens,
        temperature=args.temperature,
        top_p=args.top_p,
        top_k=args.top_k,
        min_p=args.min_p,
        repetition_penalty=args.repetition_penalty,
        presence_penalty=args.presence_penalty,
        frequency_penalty=args.frequency_penalty,
        greedy=not args.sample,
        quantization=args.quantization,
        quantize_embed=args.quantize_embed,
        embed_bits=args.embed_bits,
        seed=args.seed,
        profile=args.profile,
        constrain=args.constrain,
        constrain_regex=args.constrain_regex,
        tools=(
            json.load(open(args.tools)) if args.tools else None
        ),
        lora_paths=args.lora,
        per_request_sampling=args.per_request_sampling,
        admit_chunk=args.admit_chunk,
    )
    if args.dtype:
        cfg = cfg.override(dtype=args.dtype)
    if args.no_draft:
        # override() drops None values by design, so baseline mode is set
        # explicitly (reference: draft None => baseline, pipeline.py:484-515).
        import dataclasses

        cfg = dataclasses.replace(cfg, draft_model=None)
    return Engine(cfg)


def cmd_run(args) -> int:
    eng = _build_engine(args)
    result = eng.generate(args.prompt)
    result.pop("generated_ids", None)
    print(json.dumps(result))  # one-line JSON (reference run_specdec.py:256-272)
    if args.profile:
        print(json.dumps(eng.profiler.summary()), file=sys.stderr)
    return 0


def cmd_bench(args) -> int:
    from llm_inference_lab_tpu.bench.k_sweep import run_k_sweep

    summary = run_k_sweep(
        base_model=args.base_model,
        draft_model=None if args.no_draft else args.draft_model,
        implementation=args.impl,
        max_k=args.max_k,
        max_new_tokens=args.max_tokens,
        iterations=args.iterations,
        batch_size=args.batch_size,
        policy=args.policy,
        quantization=args.quantization,
        output_dir=args.output_dir,
        seed=args.seed,
    )
    print(json.dumps(summary))
    return 0


def cmd_serve(args) -> int:
    from llm_inference_lab_tpu.server import InferenceServer

    eng = _build_engine(args)
    server = InferenceServer(eng, n_slots=args.slots, host=args.host, port=args.port)
    server.start(block=False)
    print(json.dumps({"serving": f"http://{server.host}:{server.port}",
                      "model": eng.config.base_model, "slots": args.slots}))
    try:
        server._http_thread.join()
    except KeyboardInterrupt:
        server.stop()
    return 0


def main(argv: Optional[list] = None) -> int:
    parser = argparse.ArgumentParser(prog="specdx", description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    runp = sub.add_parser("run", help="generate for one prompt")
    runp.add_argument("prompt")
    _add_common(runp)
    runp.set_defaults(fn=cmd_run)

    benchp = sub.add_parser("bench", help="K-sweep benchmark")
    _add_common(benchp)
    benchp.add_argument("--max-k", type=int, default=4)
    benchp.add_argument("--iterations", type=int, default=3)
    benchp.add_argument("--batch-size", type=int, default=0, help="0 = whole suite")
    benchp.add_argument("--output-dir", default=None)
    benchp.set_defaults(fn=cmd_bench)

    servep = sub.add_parser("serve", help="OpenAI-compatible HTTP server")
    _add_common(servep)
    servep.add_argument("--port", type=int, default=8000)
    servep.add_argument("--host", default="127.0.0.1")
    servep.add_argument("--slots", type=int, default=8)
    servep.set_defaults(fn=cmd_serve)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
