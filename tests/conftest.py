"""Test env: CPU backend with 8 virtual devices so sharding/mesh tests run
anywhere (SURVEY.md §4: the reference's "not gpu" CPU tier; multi-chip tests
use the virtual CPU device count, which the reference has no analogue for).

Note: some environments (axon TPU tunnels) import jax from sitecustomize at
interpreter boot, so env vars are too late — use jax.config.update, which
takes effect any time before backend initialization.
"""

import os

_platform = os.environ.get("SPECDX_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform  # for any subprocesses

import jax  # noqa: E402

if _platform == "cpu":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

# Persistent XLA compilation cache: the suite's dominant cost is whole-engine
# jit compiles at many config combinations; cached executables cut re-runs
# (and CI, which restores the directory via actions/cache) dramatically.
_cache_dir = os.path.expanduser(
    os.environ.get("SPECDX_COMPILATION_CACHE", "~/.cache/jax_comp_cache")
)
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
