"""Save/load pre-quantized models as safetensors.

Capability parity with the reference's save/load pipeline
(/root/reference/src/sdnq/loader.py:48-196): one safetensors file holding
each QTensor's components under the reference's key scheme
(``<layer>.weight/.scale/.zero_point/.svd_up/.svd_down``, sdnq_keys at
common.py:10) plus a ``quantization_config.json`` sidecar, and a
``sdnq_tpu_meta.json`` sidecar recording each layer's static QuantMeta (the
reference reconstructs this from module wrappers; we are functional, so the
metadata is explicit data).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from safetensors import safe_open
from safetensors.numpy import save_file

from ..apply import _flatten_with_paths
from ..config import QuantConfig
from ..tensor import QTensor, QuantMeta

__all__ = ["save_quantized", "load_quantized"]

_COMPONENTS = ("qdata", "scale", "zero_point", "svd_up", "svd_down")
# reference component names (common.py:10) for checkpoint-key parity
_REF_NAMES = {"qdata": "weight", "scale": "scale",
              "zero_point": "zero_point", "svd_up": "svd_up",
              "svd_down": "svd_down"}

_SPECIAL_DTYPES = {jnp.bfloat16: np.uint16, jnp.float8_e4m3fn: np.uint8,
                   jnp.float8_e5m2: np.uint8}


def _to_np(a: jax.Array) -> tuple[np.ndarray, str]:
    # ascontiguousarray is load-bearing: device readbacks can arrive with
    # non-C-contiguous strides (observed on the axon TPU backend), and
    # safetensors' save_file serializes the raw buffer assuming C order —
    # silently writing permuted garbage for strided inputs.
    dt = a.dtype
    if dt == jnp.bfloat16:
        return np.ascontiguousarray(
            np.asarray(a.view(jnp.uint16) if hasattr(a, "view")
                       else a).view(np.uint16)), "bfloat16"
    if dt in (jnp.float8_e4m3fn, jnp.float8_e5m2):
        return np.ascontiguousarray(
            jax.lax.bitcast_convert_type(a, jnp.uint8)), str(dt)
    return np.ascontiguousarray(a), str(dt)


def _from_np(a: np.ndarray, dtype_name: str) -> jax.Array:
    if dtype_name == "bfloat16":
        return jax.lax.bitcast_convert_type(jnp.asarray(a), jnp.bfloat16)
    if dtype_name.startswith("float8"):
        return jax.lax.bitcast_convert_type(
            jnp.asarray(a), jnp.dtype(dtype_name))
    return jnp.asarray(a)


def save_quantized(params, path: str, config: QuantConfig | None = None):
    """Write params (mixed QTensor / array pytree) to `path`/model.safetensors
    with config + meta sidecars."""
    os.makedirs(path, exist_ok=True)
    flat, _ = _flatten_with_paths(params)
    tensors: dict[str, np.ndarray] = {}
    dtypes: dict[str, str] = {}
    metas: dict[str, Any] = {}
    for p, leaf in flat:
        if isinstance(leaf, QTensor):
            base = p[: -len(".weight")] if p.endswith(".weight") else p
            metas[base] = dataclasses.asdict(leaf.meta)
            for comp in _COMPONENTS:
                arr = getattr(leaf, comp)
                if arr is None:
                    continue
                key = f"{base}.{_REF_NAMES[comp]}"
                tensors[key], dtypes[key] = _to_np(arr)
        elif hasattr(leaf, "ndim"):
            tensors[p], dtypes[p] = _to_np(leaf)
    save_file(tensors, os.path.join(path, "model.safetensors"),
              metadata={"format": "sdnq_tpu"})
    with open(os.path.join(path, "sdnq_tpu_meta.json"), "w") as f:
        json.dump({"metas": metas, "dtypes": dtypes}, f, indent=1)
    if config is not None:
        with open(os.path.join(path, "quantization_config.json"), "w") as f:
            f.write(config.to_json())


def load_quantized(path: str):
    """Reconstruct the (nested-dict) param pytree.  Returns
    (params, config or None)."""
    with open(os.path.join(path, "sdnq_tpu_meta.json")) as f:
        side = json.load(f)
    metas = side["metas"]
    dtypes = side["dtypes"]

    raw: dict[str, jax.Array] = {}
    with safe_open(os.path.join(path, "model.safetensors"), framework="np") \
            as f:
        for key in f.keys():
            raw[key] = _from_np(f.get_tensor(key), dtypes.get(key, ""))

    params: dict = {}

    def insert(tree, dotted, value):
        parts = dotted.split(".")
        for part in parts[:-1]:
            tree = tree.setdefault(part, {})
        tree[parts[-1]] = value

    consumed = set()
    for base, meta_dict in metas.items():
        meta_dict = dict(meta_dict)
        for tkey in ("original_shape", "quantized_shape"):
            meta_dict[tkey] = tuple(meta_dict[tkey])
        meta = QuantMeta(**meta_dict)
        comps = {}
        for comp in _COMPONENTS:
            key = f"{base}.{_REF_NAMES[comp]}"
            comps[comp] = raw.get(key)
            consumed.add(key)
        qt = QTensor(qdata=comps["qdata"], scale=comps["scale"],
                     zero_point=comps["zero_point"],
                     svd_up=comps["svd_up"], svd_down=comps["svd_down"],
                     meta=meta)
        insert(params, base + ".weight", qt)
    for key, val in raw.items():
        if key not in consumed:
            insert(params, key, val)

    cfg = None
    cfg_path = os.path.join(path, "quantization_config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = QuantConfig.from_json(f.read())
    return _listify(params), cfg


def _listify(tree):
    """Convert dicts whose keys are all consecutive integers back to lists
    (our models store block lists)."""
    if not isinstance(tree, dict):
        return tree
    out = {k: _listify(v) for k, v in tree.items()}
    keys = list(out)
    if keys and all(k.isdigit() for k in keys):
        order = sorted(keys, key=int)
        if [int(k) for k in order] == list(range(len(order))):
            return [out[k] for k in order]
    return out
