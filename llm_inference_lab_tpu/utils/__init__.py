"""Cross-cutting utilities: tokenization, determinism, validation, timing."""
