"""Verify drive: paged vs contiguous KV on the real TPU chip.

Runs the same prompt through Engine with kv_layout='contiguous' and
'paged' and asserts identical greedy output, then checks determinism.
"""
import json

from llm_inference_lab_tpu.config import EngineConfig
from llm_inference_lab_tpu.core.engine import Engine


def run(layout):
    cfg = EngineConfig(
        base_model="llama-tiny", draft_model="llama-tiny",
        implementation="hf", max_draft=4, max_new_tokens=32,
        kv_layout=layout, seed=0,
    )
    eng = Engine(cfg)
    r = eng.generate("hello tpu")
    r2 = eng.generate("hello tpu")
    assert r["generated_ids"] == r2["generated_ids"], f"nondeterministic ({layout})"
    return r


cont = run("contiguous")
paged = run("paged")
assert cont["generated_ids"] == paged["generated_ids"], (
    "paged != contiguous:\n%s\n%s" % (cont["generated_ids"], paged["generated_ids"]))
assert cont["acceptance_rate"] == 1.0, cont["acceptance_rate"]
print(json.dumps({
    "ok": True,
    "device": cont["device"],
    "contig_tok_s": cont["tokens_per_sec"],
    "paged_tok_s": paged["tokens_per_sec"],
    "acceptance": cont["acceptance_rate"],
}))
