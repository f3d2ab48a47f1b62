"""K-controller tests (reference tests/specdec/test_controllers.py:55-128:
adaptive increase/decrease/bounds/window)."""

import pytest

from llm_inference_lab_tpu.core.controllers import (
    AdaptiveKController,
    FixedKController,
    create_controller,
)


def test_fixed():
    c = FixedKController(k=3)
    assert c.get_k() == 3
    c.update(10, 10)
    assert c.get_k() == 3


def test_adaptive_increases_on_high_acceptance():
    c = AdaptiveKController(k=2, target_acceptance=0.5, max_k=8)
    for _ in range(5):
        c.update(4, 4)  # 100% acceptance
    assert c.get_k() > 2


def test_adaptive_decreases_on_low_acceptance():
    c = AdaptiveKController(k=4, target_acceptance=0.5, min_k=1)
    for _ in range(5):
        c.update(4, 0)
    assert c.get_k() < 4


def test_adaptive_bounds():
    c = AdaptiveKController(k=8, min_k=1, max_k=8, target_acceptance=0.5)
    for _ in range(50):
        c.update(4, 4)
    assert c.get_k() <= 8
    for _ in range(50):
        c.update(4, 0)
    assert c.get_k() >= 1


def test_adaptive_window_bounded():
    c = AdaptiveKController(k=4, window=8)
    for _ in range(100):
        c.update(4, 2)
    assert len(c._hist) <= 8


def test_adaptive_stable_near_target():
    c = AdaptiveKController(k=4, target_acceptance=0.5)
    for _ in range(20):
        c.update(4, 2)  # exactly on target -> inside hysteresis band
    assert c.get_k() == 4


def test_zero_proposed_ignored():
    c = AdaptiveKController(k=4)
    c.update(0, 0)
    assert c.get_k() == 4


def test_factory():
    assert isinstance(create_controller("fixed", k=2), FixedKController)
    assert isinstance(create_controller("adaptive", k=2), AdaptiveKController)
    with pytest.raises(ValueError):
        create_controller("nope")
