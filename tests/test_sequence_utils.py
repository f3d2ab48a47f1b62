"""Sequence utils property tests (reference
tests/specdec/test_sequence_utils.py: pad->unpad lossless, mask excludes
padding, position-id monotonicity, empty/single edges)."""

import numpy as np

from llm_inference_lab_tpu.utils.sequence import (
    attention_mask,
    pad_sequences,
    position_ids,
    unpad_sequences,
)


def test_pad_unpad_lossless():
    seqs = [[1, 2, 3], [4], [5, 6, 7, 8, 9]]
    tokens, lens = pad_sequences(seqs)
    assert unpad_sequences(tokens, lens) == seqs


def test_pad_multiple_rounding():
    tokens, _ = pad_sequences([[1, 2, 3]], multiple=32)
    assert tokens.shape[1] == 32


def test_mask_excludes_padding():
    _, lens = pad_sequences([[1, 2], [3, 4, 5]])
    m = attention_mask(lens, 5)
    assert m.tolist() == [[1, 1, 0, 0, 0], [1, 1, 1, 0, 0]]


def test_position_ids_monotone_and_clamped():
    _, lens = pad_sequences([[1, 2, 3]])
    p = position_ids(lens, 6)
    assert p[0, :3].tolist() == [0, 1, 2]
    assert (p[0, 3:] == 2).all()  # pads clamped in-range


def test_single_and_empty_edges():
    tokens, lens = pad_sequences([[7]])
    assert tokens[0, 0] == 7 and lens[0] == 1
    tokens, lens = pad_sequences([[]])
    assert lens[0] == 0
