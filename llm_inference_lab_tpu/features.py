"""Feature-compatibility matrix — the single source of truth.

Round-3 VERDICT weak #7: feature-exclusion raises were accumulating across
core/engine.py, core/batching.py, and core/specstep.py with nothing
enumerating the supported product space. This module centralizes the rules;
tests/test_feature_matrix.py asserts every cell either works (tiny smoke)
or raises the documented error, and scripts/gen_feature_matrix.py renders
the support table in docs/FEATURES.md so the code, the tests, and the docs
cannot drift apart.

The matrix covers the serving-facing config dimensions. Parallelism
composition (TP/PP/DP/SP/EP) is validated separately by
__graft_entry__.dryrun_multichip on a virtual mesh.
"""

from __future__ import annotations

from typing import Optional

# Draft modes: baseline = no speculation, vanilla = draft-model chain,
# ngram = prompt-lookup, medusa/eagle = head-drafted chains, tree =
# head-drafted tree with ancestry-masked verify.
MODES = ("baseline", "vanilla", "ngram", "medusa", "eagle", "tree")
LAYOUTS = ("contiguous", "paged")
# Per-cell feature under test (one at a time, on top of mode x layout):
#   plain          — nothing extra
#   per_request    — per-request sampling params in DecodeState
#   lora           — multi-LoRA adapter pack
#   constrain      — grammar-constrained decoding (json)
#   prefix_caching — cross-request prompt page reuse
#   kv_ring        — rolling-buffer KV for sliding-window models
FEATURES = ("plain", "per_request", "lora", "constrain", "prefix_caching",
            "kv_ring")


def expected_error(mode: str, layout: str, feature: str,
                   policy: str = "longest_prefix") -> Optional[str]:
    """The documented incompatibility for this cell: a message fragment the
    constructor raise must contain, or None when the cell is supported.
    Every rule cites the raise site it mirrors."""
    if feature == "prefix_caching" and layout != "paged":
        # core/batching.py ContinuousBatcher.__init__
        return "prefix_caching requires kv_layout='paged'"
    if feature == "kv_ring":
        if layout == "paged":
            # core/engine.py _enable_kv_ring
            return "kv_ring requires kv_layout='contiguous'"
        if mode == "tree":
            # core/engine.py _enable_kv_ring
            return "kv_ring is not supported in tree mode"
    if mode == "tree":
        if feature == "constrain":
            # core/engine.py constrain-table setup
            return "constrained decoding is not supported in tree mode"
        if feature == "lora":
            # core/engine.py LoRA pack setup
            return "LoRA is not supported in tree mode"
    if policy == "rejection" and feature == "per_request":
        # core/specstep.py make_spec_step
        return "not supported with the rejection policy"
    return None


def cells():
    """Every (mode, layout, feature) cell of the matrix."""
    for mode in MODES:
        for layout in LAYOUTS:
            for feature in FEATURES:
                yield mode, layout, feature
