"""Serving layer: OpenAI-compatible HTTP server over the continuous batcher.

The reference only has a *client* for external servers
(src/server/ping_vllm.py) and a local baseline runner
(src/server/local_baseline.py). Here the framework itself serves:
server/serving.py exposes /v1/completions and /v1/chat/completions backed by
the slot-based ContinuousBatcher, which is what "production deployment"
means for an inference runtime.
"""

from llm_inference_lab_tpu.server.serving import InferenceServer  # noqa: F401
