"""Grammar-constrained decoding (OpenAI `response_format` JSON mode).

TPU-native design: constraints run INSIDE the compiled step as table
gathers — no host round-trips, no Python callbacks per token (the usual
GPU-framework pattern; e.g. llama.cpp walks its grammar on the host every
token). JSON is not a regular language, so instead of an Outlines-style
token DFA we keep the pushdown: a ~37-state char-level lexer plus an
explicit per-slot nesting stack that lives in DecodeState. A one-time
host compilation walks every vocab token through the char automaton from
every lexer state and records its *stack effect* (pops below the token's
start depth with required symbols, net pushes, final lexer state). At
decode time a token's validity is two gathers and a few compares; the
chosen token's transition is a tiny masked stack update.

Reference parity: none — the reference (GogoRit/llm-inference-lab) has no
constrained decoding; this is a north-star serving feature.
"""

from llm_inference_lab_tpu.constrain.jsonfsm import (  # noqa: F401
    CharAutomaton,
    TokenTables,
    compile_token_tables,
    json_char_automaton,
    token_bytes_of,
)
from llm_inference_lab_tpu.constrain.tools import (  # noqa: F401
    build_tools_automaton,
    normalize_tools,
)
