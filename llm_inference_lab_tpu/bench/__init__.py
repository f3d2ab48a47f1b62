"""Benchmark harnesses: K-sweep, baseline comparison, quality eval."""
