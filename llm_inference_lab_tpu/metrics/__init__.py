"""Observability: structured per-step profiling, memory stats, trace capture."""

from llm_inference_lab_tpu.metrics.profiler import (  # noqa: F401
    MemoryStats,
    StructuredProfiler,
    device_memory_stats,
)
