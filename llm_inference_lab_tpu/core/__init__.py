"""Core speculative-decoding engine: state, policies, controllers, step, engine."""
