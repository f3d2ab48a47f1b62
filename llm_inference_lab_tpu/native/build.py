"""JIT build of the native C++ runtime pieces.

Reference parity: src/kernels/build.py:41-133 — the reference JIT-compiles
its CUDA extension with a SHA256-keyed cache under kernels/.cache and a
graceful fallback chain. Same model here with g++ -O3 -shared and ctypes
(pybind11 is not available in this image); `SPECDX_FORCE_PY` skips native
compilation entirely (reference SPECDEC_FORCE_PY, build.py:16,43-45).
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
from typing import Optional

logger = logging.getLogger(__name__)

_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".cache")


def build_and_load(source_name: str) -> Optional[ctypes.CDLL]:
    """Compile native/<source_name>.cc to a cached .so and dlopen it.
    Returns None (caller falls back to Python) on any failure."""
    if os.environ.get("SPECDX_FORCE_PY") == "1":
        return None
    src = os.path.join(os.path.dirname(__file__), source_name + ".cc")
    try:
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        os.makedirs(_CACHE_DIR, exist_ok=True)
        so_path = os.path.join(_CACHE_DIR, f"{source_name}-{digest}.so")
        if not os.path.exists(so_path):
            # pid-unique tmp + atomic rename: concurrent processes (e.g.
            # multi-host ranks on one box) never clobber each other's build.
            tmp = f"{so_path}.{os.getpid()}.tmp"
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", src, "-o", tmp],
                check=True,
                capture_output=True,
                timeout=120,
            )
            os.replace(tmp, so_path)
        return ctypes.CDLL(so_path)
    except Exception as e:  # missing toolchain, compile error, etc.
        logger.info("native %s unavailable (%s); using Python fallback",
                    source_name, e)
        return None
