"""TPU smoke: device/dtype detection + one spec-decode generation.

Reference parity: scripts/dev/smoke_cuda.py:29 (device detection + 1
pipeline generation). Run: python scripts/smoke_tpu.py [--small]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import json
import sys
import time

import jax


def main() -> int:
    dev = jax.devices()[0]
    info = {
        "backend": jax.default_backend(),
        "device": str(dev),
        "device_kind": getattr(dev, "device_kind", "?"),
        "device_count": jax.device_count(),
        "jax": jax.__version__,
    }
    print(json.dumps(info))

    from llm_inference_lab_tpu.config import EngineConfig
    from llm_inference_lab_tpu.core.engine import Engine

    small = "--small" in sys.argv or jax.default_backend() == "cpu"
    base, draft = ("llama-tiny", "llama-tiny") if small else ("gpt2", "distilgpt2")
    eng = Engine(
        EngineConfig(base_model=base, draft_model=draft, implementation="hf",
                     max_draft=4, max_new_tokens=16)
    )
    t0 = time.time()
    r = eng.generate("smoke test prompt")
    print(json.dumps({
        "ok": r["generated_tokens"] > 0,
        "first_call_s": round(time.time() - t0, 1),
        "generated_tokens": r["generated_tokens"],
        "acceptance_rate": r["acceptance_rate"],
        "tokens_per_sec": round(r["tokens_per_sec"], 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
