"""Tokenizers: HF-backed when available, byte-level fallback otherwise.

Reference parity: the reference leans on HF AutoTokenizer with an
optimization cache (src/optimization/tokenizer_optimization.py:17) and a
draft/target tokenizer compatibility check (pipeline.py:563-597). Here:
- `HFTokenizer` wraps transformers (works when the hub cache is present),
  with the same encode-result LRU cache.
- `ByteTokenizer` is the dependency-free fallback (and the natural match for
  the 256-vocab fake model) so the whole stack runs with zero downloads.
- `check_tokenizer_compat` mirrors the reference's vocab check.
"""

from __future__ import annotations

from typing import List, Optional, Protocol


class Tokenizer(Protocol):
    vocab_size: int
    eos_token_id: Optional[int]

    def encode(self, text: str) -> List[int]: ...

    def decode(self, ids: List[int]) -> str: ...


class ByteTokenizer:
    """UTF-8 bytes as tokens; id 0 reserved as EOS/pad."""

    def __init__(self, vocab_size: int = 256):
        self.vocab_size = vocab_size
        self.eos_token_id = 0

    def encode(self, text: str) -> List[int]:
        ids = [1 + (b % (self.vocab_size - 1)) for b in text.encode("utf-8")]
        return ids or [1]

    def decode(self, ids: List[int]) -> str:
        return bytes((max(i - 1, 0)) % 256 for i in ids if i != 0).decode(
            "utf-8", errors="replace"
        )


class HFTokenizer:
    """transformers-backed tokenizer with an encode cache (reference
    OptimizedTokenizer, tokenizer_optimization.py:65-96)."""

    def __init__(self, name: str, cache_size: int = 4096, local_only: bool = True):
        from transformers import AutoTokenizer

        # Offline-first: a cache miss fails in milliseconds instead of
        # minutes of hub retry/backoff. Set SPECDX_ALLOW_DOWNLOAD=1 to
        # permit network fetches.
        import os

        if os.environ.get("SPECDX_ALLOW_DOWNLOAD") == "1":
            local_only = False
        self._tok = AutoTokenizer.from_pretrained(name, local_files_only=local_only)
        self.vocab_size = len(self._tok)
        self.eos_token_id = self._tok.eos_token_id
        self._cache: dict = {}
        self._cache_size = cache_size

    def encode(self, text: str, add_special_tokens: bool = True) -> List[int]:
        # add_special_tokens=False: the text already carries its special
        # tokens (chat-template output renders BOS into the string —
        # re-adding would double it, the HF tokenize=False pitfall).
        key = (text, add_special_tokens)
        hit = self._cache.get(key)
        if hit is not None:
            return list(hit)
        ids = self._tok.encode(text, add_special_tokens=add_special_tokens)
        if len(self._cache) >= self._cache_size:  # FIFO evict
            self._cache.pop(next(iter(self._cache)))
        self._cache[key] = tuple(ids)
        return ids

    def decode(self, ids: List[int]) -> str:
        return self._tok.decode(ids, skip_special_tokens=True)

    @property
    def chat_template(self):
        """The checkpoint's own chat template, if it ships one (served
        /v1/chat/completions prefers this over the plain-transcript
        fallback)."""
        return getattr(self._tok, "chat_template", None)

    def apply_chat_template(self, messages, **kw):
        return self._tok.apply_chat_template(messages, **kw)


def get_tokenizer(name: str, implementation: str = "hf") -> Tokenizer:
    if implementation == "fake" or name == "fake":
        return ByteTokenizer()
    # Framework model keys (e.g. "opt-125m", "llama-3.2-3b") map to hub repo
    # ids via the loader's candidate table; plain names are tried as-is.
    from llm_inference_lab_tpu.models.loader import HF_REPO_IDS

    for repo in HF_REPO_IDS.get(name.lower(), []) + [name]:
        try:
            return HFTokenizer(repo)
        except Exception:
            continue
    # Offline / no hub cache: degrade to bytes so everything still runs.
    return ByteTokenizer()


def check_tokenizer_compat(target: Tokenizer, draft: Tokenizer) -> bool:
    """Draft and target must share a vocabulary for token-level acceptance
    (reference pipeline.py:563-597)."""
    return target.vocab_size == draft.vocab_size
