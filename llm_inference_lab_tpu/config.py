"""Centralized configuration: dataclasses + YAML + environment flags.

Reference parity: the reference merges hardcoded defaults <- YAML <- CLI args
(src/specdec/core/pipeline.py:398-438) and reads ~20 `SPECDEC_*` env flags
inline at use-sites (SURVEY.md §2.10). Here the whole flag surface is read in
ONE place (`EnvFlags.from_env`) and threaded explicitly — no use-site
`os.environ` reads in hot paths.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, Optional

try:
    import yaml

    _HAVE_YAML = True
except ImportError:  # pragma: no cover - yaml is in the base image
    _HAVE_YAML = False


def _env_bool(name: str, default: bool = False) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.strip().lower() not in ("0", "false", "no", "off", "")


def _env_str(name: str, default: Optional[str] = None) -> Optional[str]:
    return os.environ.get(name, default)


def _env_int(name: str, default: int) -> int:
    v = os.environ.get(name)
    return int(v) if v is not None else default


@dataclass(frozen=True)
class EnvFlags:
    """The complete runtime flag surface, mirrored from the reference's
    SPECDEC_* flags (reference README.md:283-298) under the SPECDX_ prefix.
    Read once; never consulted inline in jitted code."""

    deterministic: bool = True  # SPECDEC_DETERMINISTIC
    profile: bool = False  # SPECDEC_PROFILE
    detailed_metrics: bool = False  # SPECDEC_DETAILED_METRICS
    force_reference_kernels: bool = False  # SPECDEC_FORCE_PY / FORCE_PYTORCH_BACKEND
    dtype: Optional[str] = None  # SPECDEC_DTYPE
    debug: bool = False  # SPECDEC_DEBUG
    debug_kv_verify: bool = False  # SPECDEC_DEBUG_KV_VERIFY
    dry_run: bool = False  # SPECDEC_DRY_RUN
    sync_steps: bool = False  # SPECDEC_SYNC_KERNELS analogue: block after each step
    seed: int = 0
    batch_size: int = 0  # SPECDEC_BATCH_SIZE (0 = auto)

    @classmethod
    def from_env(cls) -> "EnvFlags":
        return cls(
            deterministic=_env_bool("SPECDX_DETERMINISTIC", True),
            profile=_env_bool("SPECDX_PROFILE", False),
            detailed_metrics=_env_bool("SPECDX_DETAILED_METRICS", False),
            force_reference_kernels=_env_bool("SPECDX_FORCE_REFERENCE_KERNELS", False),
            dtype=_env_str("SPECDX_DTYPE"),
            debug=_env_bool("SPECDX_DEBUG", False),
            debug_kv_verify=_env_bool("SPECDX_DEBUG_KV_VERIFY", False),
            dry_run=_env_bool("SPECDX_DRY_RUN", False),
            sync_steps=_env_bool("SPECDX_SYNC_STEPS", False),
            seed=_env_int("SPECDX_SEED", 0),
            batch_size=_env_int("SPECDX_BATCH_SIZE", 0),
        )


@dataclass
class EngineConfig:
    """Engine-level configuration (reference: pipeline defaults at
    src/specdec/core/pipeline.py:400-426 + configs/*.yaml)."""

    # Models
    base_model: str = "gpt2"
    draft_model: Optional[str] = "distilgpt2"
    implementation: str = "fake"  # "fake" | "hf" (reference pipeline.py:466-472)
    draft_mode: str = "vanilla"  # | "medusa" | "eagle" | "tree" | "ngram"

    # Speculation
    max_draft: int = 4  # K
    policy: str = "longest_prefix"  # | conf_threshold | topk_agree | typical | rejection
    policy_params: dict = field(default_factory=dict)
    controller: str = "fixed"  # | adaptive
    controller_params: dict = field(default_factory=dict)

    # Sampling
    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 1.0
    # vLLM-style min-p: drop tokens with prob < min_p * max_prob (0 = off).
    min_p: float = 0.0
    greedy: bool = True
    # Reference subtlety required for acceptance parity: draft samples at
    # temperature/1.5 while verification is greedy argmax at temp 1.0
    # (reference pipeline.py:2324-2328, speculative_scheduler.py:192-198).
    draft_temperature_scale: float = 1.5
    # Penalties (disabled at the defaults): HF repetition penalty (seen
    # tokens' logits divided/multiplied by r) and OpenAI presence/frequency
    # penalties, over the whole committed text (prompt + generation). In
    # spec decode the verify distributions are penalized with incremental
    # in-window counts, so greedy output matches a penalized baseline
    # exactly. Per-request values come via serving when per_request_sampling.
    repetition_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    # Per-REQUEST sampling: temperature/top_k/top_p live in DecodeState [B]
    # arrays (serving: each OpenAI request carries its own; temperature <= 0
    # means greedy). Off = the scalars above are compiled into the step
    # (slightly faster). Not compatible with policy="rejection" or tree mode.
    per_request_sampling: bool = False
    # Grammar-constrained decoding (constrain/): None disables; "json"
    # (any top-level value), "json_object" (OpenAI response_format),
    # "json_schema" (structured outputs — requires constrain_schema), or
    # "regex" (guided regex — requires constrain_regex)
    # compiles the grammar's token tables at engine init and masks every
    # sampling site device-side. Serving: requests opt in per-request via
    # OpenAI response_format; the engine-level value is the default for
    # Engine.generate and fixes WHICH grammar the deployment serves.
    constrain: Optional[str] = None
    # The schema served when constrain == "json_schema" (see
    # constrain/schema.py for the supported subset).
    constrain_schema: Optional[dict] = None
    # The pattern served when constrain == "regex" (guided-regex
    # decoding; anchored full match — see constrain/regex.py for the
    # supported syntax).
    constrain_regex: Optional[str] = None
    # Tool calling (constrain/tools.py): OpenAI `tools` list compiled at
    # engine init into a tool-call grammar ({"name":...,"arguments":...}
    # constrained to each tool's parameters schema). Requests opt in via
    # OpenAI tool_choice ("required" / a named function); "auto" is
    # unconstrained with host-side parsing. Mutually exclusive with
    # `constrain` (one grammar table per deployment).
    tools: Optional[list] = None
    # Multi-LoRA serving (models/lora.py): HF PEFT adapter directories to
    # stack at engine init; requests select one by name (the directory
    # basename) via batcher.submit(lora=...) / the OpenAI `model` field.
    lora_paths: Optional[list] = None

    # Shapes / limits
    max_seq_len: int = 1024
    max_batch_size: int = 8
    max_new_tokens: int = 64

    # Chunked prefill: cap prompt-forward activation memory by prefilling in
    # fixed-size chunks (None = single-shot). Long prompts (>= chunk) scan
    # chunk-sized forwards; each chunk attends to the cache prefix written by
    # the previous ones. Chunk sizes that are multiples of 128 route through
    # the Pallas flash-prefill kernel (ops/pallas/flash_prefill.py).
    prefill_chunk: Optional[int] = None
    # Interleaved (chunked) admission for serving (vLLM "chunked
    # prefill"): prompts longer than this prefill into a detached scratch
    # this many tokens per decode chunk, so long admissions never stall
    # decoding slots; the final splice is the only state touch. Must be a
    # multiple of the KV bucket (page size / 32). None = one-shot
    # admission. Not applied under prefix caching or multi-host.
    admit_chunk: Optional[int] = None

    # KV cache layout: "contiguous" (one [max_seq] lane per slot) or "paged"
    # (page-pool + per-sequence page tables, models/paged.py — serving
    # memory proportional to live tokens; north-star SURVEY §7 item 4b).
    kv_layout: str = "contiguous"
    kv_page_size: int = 64
    kv_pages: Optional[int] = None  # pool size; None = slots*max_seq/page
    # Automatic prefix caching (paged layout only): requests sharing a
    # prompt prefix reuse its KV pages — prefill computes the suffix only.
    prefix_caching: bool = False
    # Rolling-buffer KV for sliding-window models (Mistral): the contiguous
    # cache becomes a RING of window + chunk + K + slack slots (slot =
    # position mod ring) — per-layer KV memory and the decode sweep are
    # O(window) instead of O(max_seq_len). Requires prefill_chunk (and
    # admit_chunk for serving): a single-shot prefill longer than the ring
    # would overwrite rows its own queries still need. Uniform-window
    # models only; contiguous layout only; no tree / seq-parallel.
    kv_ring: bool = False
    # Lazy paged allocation (vLLM-grade): admission reserves pages for the
    # prompt + a small growth margin only; decode growth allocates pages
    # on demand at each poll, and pool exhaustion preempts the youngest
    # slot (pages freed, request requeued and resumed by recompute). Off =
    # worst-case reservation (prompt + max_new + K + 2) held up front.
    # Multi-host serving forces eager reservation (growth is a host-side
    # decision that would need its own broadcast round).
    kv_lazy_pages: bool = True

    # Numerics
    dtype: str = "bfloat16"  # compute/weights dtype on TPU
    quantization: Optional[str] = None  # None | "int8" | "int4"
    kv_quantization: Optional[str] = None  # None | "int8"
    quantize_embed: bool = False  # per-row quantized embed + tied lm_head
    # Embed/tied-head bit width when quantize_embed: 8 (default, EmbedQuant)
    # or 4 (opt-in EmbedQuant4 — halves the head's weight read; gate on the
    # perplexity harness before adopting for real checkpoints).
    embed_bits: int = 8
    # Random-init directly in quantized form (benchmarking models whose bf16
    # params would not fit HBM during init, e.g. 8B int4 on one 16GB chip).
    quantized_init: bool = False

    # Parallelism (green-field vs reference Phase 4C "Planned")
    # mesh_shape axes: data (DP) / model (TP) / seq (ring-attention CP) /
    # stage (pipeline parallelism, parallel/pipeline.py)
    mesh_shape: dict = field(default_factory=dict)  # e.g. {"data": 1, "model": 4}
    shard_draft: bool = False
    # Pipeline parallelism: microbatches per step (None = local batch size,
    # i.e. microbatch size 1 — smallest fill/drain bubble).
    pp_microbatches: Optional[int] = None

    # Medusa / EAGLE (reference configs/specdec_hf.yaml:12-21)
    medusa: dict = field(
        default_factory=lambda: {
            "num_heads": 2,
            "head_init": "tie",
            "temperature": 0.7,
            "top_p": 0.9,
        }
    )
    eagle: dict = field(default_factory=lambda: {"alpha": 0.7, "max_draft": 2})
    # n-gram (prompt-lookup) speculation: match length for the buffer search.
    ngram: dict = field(default_factory=lambda: {"n": 2})
    # Tree speculation (reference Phase 4D "Planned"): per-depth branching.
    tree: dict = field(default_factory=lambda: {"branching": [3, 2]})

    # Top-N alternative logprobs per generated token (OpenAI `logprobs: N`).
    # 0 = off (no capture buffers, no per-step top_k).
    logprobs_topk: int = 0

    # Runtime
    seed: int = 0
    eos_token_id: Optional[int] = None
    profile: bool = False

    def override(self, **kwargs: Any) -> "EngineConfig":
        """Return a copy with non-None overrides applied (CLI layer)."""
        updates = {k: v for k, v in kwargs.items() if v is not None}
        return dataclasses.replace(self, **updates)


def load_config(path: Optional[str] = None, **overrides: Any) -> EngineConfig:
    """defaults <- YAML file <- explicit overrides (reference precedence,
    pipeline.py:398-438)."""
    cfg = EngineConfig()
    if path:
        if not _HAVE_YAML:
            raise RuntimeError("pyyaml unavailable; cannot load YAML config")
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        known = {f.name for f in dataclasses.fields(EngineConfig)}
        cfg = dataclasses.replace(cfg, **{k: v for k, v in data.items() if k in known})
    if overrides:
        cfg = cfg.override(**overrides)
    return cfg
