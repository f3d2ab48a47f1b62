"""Native checkpoint save/load (safetensors-based, quantization-aware).

The reference has NO checkpoint subsystem (SURVEY.md §5.4 — models always
reload from the HF hub). Here: serialize the framework's own param trees —
including QuantTensor leaves — so a model can be quantized once and served
many times without re-quantizing, and so serving hosts can cold-start from
local disk.

Format: one .safetensors file; nested-dict paths joined with '/'.
QuantTensor leaves become two tensors ('<path>/__qdata__', '<path>/__qscale__')
with the bit width recorded in the file metadata.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from llm_inference_lab_tpu.ops.quant import (
    EmbedQuant,
    EmbedQuant4,
    QuantTensor,
    repack_int4_rows,
)

_QDATA = "/__qdata__"
_QSCALE = "/__qscale__"
_EDATA = "/__edata__"
_ESCALE = "/__escale__"
_E4DATA = "/__e4data__"
_E4SCALE = "/__e4scale__"


def _to_np(x: jax.Array) -> np.ndarray:
    arr = np.asarray(jax.device_get(x))
    if arr.dtype == jnp.bfloat16:
        # safetensors numpy handles ml_dtypes bfloat16 natively.
        pass
    return arr


def save_params(params: Any, path: str) -> None:
    from safetensors.numpy import save_file

    tensors: Dict[str, np.ndarray] = {}
    quant_meta: Dict[str, int] = {}

    def walk(node: Any, prefix: str) -> None:
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        elif isinstance(node, QuantTensor):
            tensors[prefix + _QDATA] = _to_np(node.data)
            tensors[prefix + _QSCALE] = _to_np(node.scale)
            quant_meta[prefix] = node.bits
        elif isinstance(node, EmbedQuant):
            tensors[prefix + _EDATA] = _to_np(node.q)
            tensors[prefix + _ESCALE] = _to_np(node.scale)
        elif isinstance(node, EmbedQuant4):
            # The row layout (rq) is derived — repacked on load, not saved.
            tensors[prefix + _E4DATA] = _to_np(node.qt.data)
            tensors[prefix + _E4SCALE] = _to_np(node.qt.scale)
            quant_meta[prefix] = 4  # nibble layout covered by int4_fmt=v2
        else:
            tensors[prefix] = _to_np(node)

    walk(params, "")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    # int4_fmt=v2: low nibble biased +8, high nibble two's-complement
    # (ops.quant.quantize_int4). v1 files (no marker) migrate on load.
    save_file(
        tensors, path,
        metadata={"quant": json.dumps(quant_meta), "int4_fmt": "v2"},
    )


def load_params(path: str, dtype=None) -> Any:
    """Rebuild the nested param tree; QuantTensor leaves are restored with
    their recorded bit width. `dtype` optionally casts fp leaves."""
    from safetensors import safe_open

    out: Dict[str, Any] = {}
    with safe_open(path, framework="numpy") as f:
        meta = f.metadata() or {}
        quant_meta = json.loads(meta.get("quant", "{}"))
        int4_v1 = meta.get("int4_fmt") != "v2"
        names = list(f.keys())
        loaded = {n: f.get_tensor(n) for n in names}
    if int4_v1:
        # v1 -> v2 nibble migration: the low nibble changes from signed
        # two's-complement to biased (+8), which is a single XOR of bit 3.
        for name in names:
            if name.endswith(_QDATA):
                base = name.rsplit("/__", 1)[0]
                if int(quant_meta.get(base, 8)) == 4:
                    loaded[name] = loaded[name] ^ np.int8(0x08)

    def put(tree: dict, keys, value):
        for k in keys[:-1]:
            tree = tree.setdefault(k, {})
        tree[keys[-1]] = value

    done_quant = set()
    for name, arr in loaded.items():
        if name.endswith(_EDATA) or name.endswith(_ESCALE):
            base = name.rsplit("/__", 1)[0]
            if base in done_quant:
                continue
            done_quant.add(base)
            put(out, base.split("/"),
                EmbedQuant(jnp.asarray(loaded[base + _EDATA]),
                           jnp.asarray(loaded[base + _ESCALE])))
        elif name.endswith(_E4DATA) or name.endswith(_E4SCALE):
            base = name.rsplit("/__", 1)[0]
            if base in done_quant:
                continue
            done_quant.add(base)
            e4 = jnp.asarray(loaded[base + _E4DATA])
            put(out, base.split("/"), EmbedQuant4(
                QuantTensor(
                    e4, jnp.asarray(loaded[base + _E4SCALE]), bits=4
                ),
                repack_int4_rows(e4),
            ))
        elif name.endswith(_QDATA) or name.endswith(_QSCALE):
            base = name.rsplit("/__", 1)[0]
            if base in done_quant:
                continue
            done_quant.add(base)
            qt = QuantTensor(
                jnp.asarray(loaded[base + _QDATA]),
                jnp.asarray(loaded[base + _QSCALE]),
                bits=int(quant_meta.get(base, 8)),
            )
            put(out, base.split("/"), qt)
        else:
            x = jnp.asarray(arr)
            if dtype is not None and jnp.issubdtype(x.dtype, jnp.floating):
                x = x.astype(dtype)
            put(out, name.split("/"), x)
    return out
