"""Perplexity-based quality evaluation.

Reference parity: src/benchmarks/quality_eval.py:18 (`PerplexityEvaluator`:
exp(LM loss) of generated text under an eval model :57-102, multi-text
comparison :104-150). Used to check the BASELINE.json quality gate:
quantized perplexity within 0.1 of the bf16 model at the same bit-width.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from llm_inference_lab_tpu.models.base import Model


class PerplexityEvaluator:
    def __init__(self, eval_model: Model, max_seq_len: int = 512):
        self.model = eval_model
        self.max_seq_len = max_seq_len
        self._nll = jax.jit(self._nll_fn)

    def _nll_fn(self, params, tokens, length):
        """Mean next-token NLL over positions [1, length)."""
        B, S = tokens.shape
        positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
        cache = self.model.init_cache(B, S)
        logits, _ = self.model.apply(
            params, tokens, positions, cache, jnp.zeros((B,), jnp.int32)
        )
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        tgt = tokens[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        mask = (jnp.arange(1, S)[None, :] < length[:, None]).astype(jnp.float32)
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    def perplexity_ids(self, token_ids: List[int]) -> float:
        ids = token_ids[: self.max_seq_len]
        if len(ids) < 2:
            return float("nan")
        tokens = jnp.asarray([ids], jnp.int32)
        length = jnp.asarray([len(ids)], jnp.int32)
        return float(jnp.exp(self._nll(self.model.params, tokens, length)))

    def perplexity(self, text: str, tokenizer) -> float:
        return self.perplexity_ids(tokenizer.encode(text))

    def compare(self, texts: List[str], tokenizer) -> Dict[str, Any]:
        """Per-text + aggregate perplexities (reference :104-150)."""
        ppls = [self.perplexity(t, tokenizer) for t in texts]
        valid = [p for p in ppls if p == p]
        return {
            "perplexities": ppls,
            "mean": sum(valid) / len(valid) if valid else float("nan"),
            "n": len(valid),
        }


def perplexity_delta(
    model_a: Model,
    model_b: Model,
    token_ids: List[List[int]],
    max_seq_len: int = 512,
) -> Dict[str, float]:
    """Quality gate between two variants of the same model (e.g. bf16 vs
    int8): mean perplexity of each and the delta."""
    ev_a = PerplexityEvaluator(model_a, max_seq_len)
    ev_b = PerplexityEvaluator(model_b, max_seq_len)
    pa = [ev_a.perplexity_ids(ids) for ids in token_ids]
    pb = [ev_b.perplexity_ids(ids) for ids in token_ids]
    ma = sum(pa) / len(pa)
    mb = sum(pb) / len(pb)
    return {"ppl_a": ma, "ppl_b": mb, "delta": mb - ma}
