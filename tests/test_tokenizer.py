"""Tokenizer unit tests: encode cache keying and the add_special_tokens
passthrough (the chat-template double-BOS fix — apply_chat_template
renders BOS into the string, so the server re-encodes with
add_special_tokens=False; reference relies on HF tokenizer semantics,
src/optimization/tokenizer_optimization.py:65-96)."""

from llm_inference_lab_tpu.utils.tokenizer import ByteTokenizer, HFTokenizer


class _StubHF:
    """Minimal stand-in for a transformers tokenizer: BOS id 7."""

    eos_token_id = 0

    def __init__(self):
        self.calls = 0

    def __len__(self):
        return 256

    def encode(self, text, add_special_tokens=True):
        self.calls += 1
        ids = [ord(c) % 256 for c in text]
        return ([7] + ids) if add_special_tokens else ids


def _wrap(stub):
    tok = HFTokenizer.__new__(HFTokenizer)  # skip hub loading
    tok._tok = stub
    tok.vocab_size = len(stub)
    tok.eos_token_id = stub.eos_token_id
    tok._cache = {}
    tok._cache_size = 8
    return tok


def test_add_special_tokens_passthrough():
    tok = _wrap(_StubHF())
    assert tok.encode("ab")[0] == 7
    assert tok.encode("ab", add_special_tokens=False)[0] != 7


def test_cache_keys_include_special_token_flag():
    """The two encodings of the same text must not collide in the cache."""
    stub = _StubHF()
    tok = _wrap(stub)
    with_bos = tok.encode("same text")
    without = tok.encode("same text", add_special_tokens=False)
    assert with_bos == [7] + without
    # Cached now: repeat calls hit the cache, still distinct results.
    calls = stub.calls
    assert tok.encode("same text") == with_bos
    assert tok.encode("same text", add_special_tokens=False) == without
    assert stub.calls == calls


def test_byte_tokenizer_has_no_special_tokens():
    """Submitters fall back to plain encode() for tokenizers without the
    kwarg (ByteTokenizer / fakes) — verify the TypeError contract holds."""
    bt = ByteTokenizer()
    try:
        bt.encode("x", add_special_tokens=False)
        raised = False
    except TypeError:
        raised = True
    assert raised
