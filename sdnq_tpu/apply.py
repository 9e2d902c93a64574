"""Model-level quantization transform.

The TPU re-design of the reference's module-tree orchestrator
(/root/reference/src/sdnq/quantizer.py:401-565): instead of recursively
replacing nn.Module children with wrapper classes, we transform a **param
pytree** — every eligible weight leaf becomes a QTensor pytree node; the
functional model forwards (layers.qlinear/qconv/qembedding) dispatch on the
node type at trace time.

Layer kinds are inferred from path names + leaf shapes, overridable with an
explicit ``kinds`` mapping (path suffix -> kind).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from .config import QuantConfig
from .policy import (
    add_model_skip_keys,
    check_param_name_in,
    layer_quant_kwargs,
    quant_allowed,
    quantized_matmul_allowed,
)
from .tensor import QTensor, quantize_tensor
from .dynamic import quantize_tensor_dynamic

__all__ = ["quantize_model", "dequantize_model", "infer_layer_kind",
           "model_memory_footprint"]


def infer_layer_kind(path: str, leaf) -> str | None:
    """Heuristic layer-kind inference from path name + shape.

    Our model zoo (sdnq_tpu.models) names params torch-style:
    ``...attn.to_q.weight`` (linear, 2D), ``...conv_in.weight`` (conv, 4D),
    ``...token_embedding.weight`` (embedding)."""
    if not hasattr(leaf, "ndim"):
        return None
    name = path.lower()
    if leaf.ndim >= 3:
        if "transpose" in name or "conv_t" in name:
            return "conv_transpose"
        return "conv"
    if leaf.ndim == 2:
        parts = name.split(".")
        owner = parts[-2] if len(parts) >= 2 else name
        if ("embedding" in owner or owner in ("wte", "embed_tokens", "tok_emb")
                or owner.endswith("_emb")):
            return "embedding"
        return "linear"
    return None


def _flatten_with_paths(tree) -> list[tuple[str, Any]]:
    flat, treedef = jax.tree_util.tree_flatten_with_path(
        tree, is_leaf=lambda x: isinstance(x, QTensor))
    out = []
    for keypath, leaf in flat:
        parts = []
        for k in keypath:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
            else:
                parts.append(str(k))
        out.append((".".join(parts), leaf))
    return out, treedef


def quantize_model(
    params,
    config: QuantConfig | dict | None = None,
    *,
    arch: str | None = None,
    kinds: dict[str, str] | None = None,
    rng: jax.Array | None = None,
    verbose: bool = False,
) -> tuple[Any, QuantConfig]:
    """Quantize every eligible weight leaf of `params` into a QTensor.

    Returns (new_params, updated_config) — the config accumulates the
    dynamic-quantization decisions (modules_dtype_dict / skip lists) like
    the reference's streaming quantizer does."""
    if config is None:
        config = QuantConfig()
    elif isinstance(config, dict):
        config = QuantConfig.from_dict(config)
    config = add_model_skip_keys(config, arch)

    flat, treedef = _flatten_with_paths(params)
    new_leaves = []
    for i, (path, leaf) in enumerate(flat):
        new_leaves.append(
            _maybe_quantize_leaf(path, leaf, config, kinds, rng, verbose))
    return jax.tree_util.tree_unflatten(treedef, new_leaves), config


def _maybe_quantize_leaf(path, leaf, config, kinds, rng, verbose):
    if isinstance(leaf, QTensor) or not isinstance(leaf, (jax.Array,)):
        return leaf
    if not path.endswith(("weight", "kernel")):
        return leaf
    if leaf.dtype not in (jnp.float32, jnp.bfloat16, jnp.float16):
        return leaf
    kind = None
    if kinds:
        match = check_param_name_in(path, list(kinds))
        if match is not None:
            kind = kinds[match]
    if kind is None:
        kind = infer_layer_kind(path, leaf)
    if kind is None:
        return leaf
    if check_param_name_in(path, config.modules_to_not_convert) is not None:
        return leaf
    if not quant_allowed(kind, tuple(leaf.shape), config):
        return leaf

    kw = layer_quant_kwargs(config, path, kind)
    from .envconfig import env_bool
    force_mm = env_bool("SDNQ_TPU_USE_QUANTIZED_MATMUL")
    if force_mm is not None:
        kw["use_quantized_matmul"] = force_mm
    if kind == "linear":
        o, c = leaf.shape[-2], leaf.shape[-1]
        kw["use_quantized_matmul"] = quantized_matmul_allowed(
            kw["use_quantized_matmul"], o, c)
    elif kind == "conv":
        kw["use_quantized_matmul"] = quantized_matmul_allowed(
            kw["use_quantized_matmul"], leaf.shape[0], leaf.shape[1])
    else:
        kw["use_quantized_matmul"] = False

    if config.use_dynamic_quantization:
        qt = quantize_tensor_dynamic(
            leaf, layer_kind=kind, config=config, param_name=path,
            rng=rng, **kw)
        if qt is None:
            config.modules_to_not_convert.append(path)
            return leaf
        config.modules_dtype_dict.setdefault(qt.meta.fmt, []).append(path)
        return qt
    return quantize_tensor(leaf, layer_kind=kind, rng=rng, **kw)


def dequantize_model(params, dtype=None):
    """Restore a full-precision param pytree (reference:
    dequantizer.py:182-215)."""
    def leaf_fn(leaf):
        if isinstance(leaf, QTensor):
            return leaf.dequantize(dtype=dtype)
        return leaf
    return jax.tree_util.tree_map(
        leaf_fn, params, is_leaf=lambda x: isinstance(x, QTensor))


def model_memory_footprint(params) -> int:
    total = 0
    for leaf in jax.tree_util.tree_leaves(
            params, is_leaf=lambda x: isinstance(x, QTensor)):
        if isinstance(leaf, QTensor):
            total += leaf.nbytes()
        elif hasattr(leaf, "nbytes"):
            total += leaf.nbytes
    return total
