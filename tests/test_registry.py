"""Kernel registry tests (reference tests/test_kernel_registry.py:14-115:
mock kernels, priority ordering, device filtering, status)."""

import pytest

from llm_inference_lab_tpu.ops.registry import KernelRegistry


def make():
    r = KernelRegistry()
    r.register("op", lambda: "xla", backend="xla", priority=10, name="ref")
    r.register("op", lambda: "pallas", backend="pallas", priority=100,
               platforms=("tpu",), name="fast")
    return r


def test_priority_ordering():
    r = make()
    assert r.get_best("op", "tpu")() == "pallas"


def test_platform_filtering():
    r = make()
    assert r.get_best("op", "cpu")() == "xla"  # pallas is tpu-only here


def test_force_reference():
    r = make()
    r.force_reference = True
    assert r.get_best("op", "tpu")() == "xla"


def test_unknown_op_raises():
    r = make()
    with pytest.raises(KeyError):
        r.get_best("nope", "tpu")


def test_info_audit():
    r = make()
    info = r.info()
    assert [e["name"] for e in info["op"]] == ["fast", "ref"]  # priority desc
    assert info["op"][0]["backend"] == "pallas"


def test_global_registry_has_all_ops():
    from llm_inference_lab_tpu.ops.registry import registry

    info = registry.info()
    for op in ("verify_prefix", "decode_attention", "quant_matmul"):
        assert op in info, op
        backends = {e["backend"] for e in info[op]}
        assert "xla" in backends  # reference fallback always present
        assert "pallas" in backends  # TPU kernel registered


def test_force_reference_env(monkeypatch):
    """SPECDX_FORCE_REFERENCE_KERNELS pins the jnp reference path
    (reference SPECDEC_FORCE_PYTORCH_BACKEND, kernels/__init__.py:18)."""
    from llm_inference_lab_tpu.config import EnvFlags

    monkeypatch.setenv("SPECDX_FORCE_REFERENCE_KERNELS", "1")
    assert EnvFlags.from_env().force_reference_kernels
