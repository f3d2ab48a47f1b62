"""Kernel registry: op name -> prioritized backend implementations.

Reference parity: src/kernels/registry.py:11-123 (`KernelRegistry`,
`get_best`), priorities CUDA=100 > Triton=50 > torch=10
(src/kernels/__init__.py:36-76). TPU mapping: pallas=100 > xla(jnp)=10.
`SPECDX_FORCE_REFERENCE_KERNELS` pins everything to the jnp reference
implementations (reference SPECDEC_FORCE_PY / SPECDEC_FORCE_PYTORCH_BACKEND).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import jax

logger = logging.getLogger(__name__)

PRIORITY_PALLAS = 100
PRIORITY_XLA = 10


@dataclass(order=True)
class _Entry:
    priority: int
    name: str = field(compare=False)
    fn: Callable = field(compare=False)
    backend: str = field(compare=False)  # "pallas" | "xla"
    platforms: tuple = field(compare=False, default=("tpu", "cpu", "gpu"))


class KernelRegistry:
    def __init__(self) -> None:
        self._ops: Dict[str, List[_Entry]] = {}
        self.force_reference: bool = False

    def register(
        self,
        op: str,
        fn: Callable,
        *,
        backend: str,
        priority: int,
        platforms: tuple = ("tpu", "cpu", "gpu"),
        name: Optional[str] = None,
    ) -> Callable:
        entry = _Entry(priority, name or fn.__name__, fn, backend, platforms)
        self._ops.setdefault(op, []).append(entry)
        self._ops[op].sort(reverse=True)
        return fn

    def get_best(self, op: str, platform: Optional[str] = None) -> Callable:
        """Highest-priority implementation available for `platform`
        (reference registry.get_best, src/kernels/registry.py:46-87)."""
        platform = platform or jax.default_backend()
        entries = self._ops.get(op, [])
        for e in entries:
            if self.force_reference and e.backend != "xla":
                continue
            if platform in e.platforms:
                return e.fn
        raise KeyError(f"no implementation for op={op!r} on platform={platform!r}")

    def info(self) -> Dict[str, List[dict]]:
        """Backend audit (reference get_kernel_info, kernels/__init__.py:116)."""
        return {
            op: [
                {
                    "name": e.name,
                    "backend": e.backend,
                    "priority": e.priority,
                    "platforms": list(e.platforms),
                }
                for e in entries
            ]
            for op, entries in self._ops.items()
        }


registry = KernelRegistry()


def get_op(op: str, platform: Optional[str] = None) -> Callable:
    return registry.get_best(op, platform)
