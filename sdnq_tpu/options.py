"""Re-target quantization options on an already-quantized model.

Capability parity with the reference's ``apply_sdnq_options_to_model``
(/root/reference/src/sdnq/loader.py:221-315): change the dequant compute
dtype, toggle quantized matmul, or re-quantize to a different storage
format without reloading from the original checkpoint.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .tensor import QTensor, dequantize, quantize_tensor

__all__ = ["apply_options_to_model", "requantize_model"]


def apply_options_to_model(params, *, use_quantized_matmul: bool | None = None,
                           dequant_dtype: str | None = None):
    """Cheap re-targeting: flips static metadata only (no data movement)."""
    def leaf_fn(leaf):
        if not isinstance(leaf, QTensor):
            return leaf
        meta = leaf.meta
        changes = {}
        if use_quantized_matmul is not None:
            changes["use_quantized_matmul"] = bool(use_quantized_matmul)
        if dequant_dtype is not None:
            changes["dequant_dtype"] = dequant_dtype
        if not changes:
            return leaf
        return QTensor(qdata=leaf.qdata, scale=leaf.scale,
                       zero_point=leaf.zero_point, svd_up=leaf.svd_up,
                       svd_down=leaf.svd_down,
                       meta=dataclasses.replace(meta, **changes))
    return jax.tree_util.tree_map(
        leaf_fn, params, is_leaf=lambda x: isinstance(x, QTensor))


def requantize_model(params, weights_dtype: str, *, rng=None, **overrides):
    """Dequantize -> re-quantize every QTensor to a new storage format
    (lossy relative to the original fp checkpoint, like the reference's
    dtype re-targeting)."""
    def leaf_fn(leaf):
        if not isinstance(leaf, QTensor):
            return leaf
        meta = leaf.meta
        w = dequantize(leaf, jnp.float32)
        kw = dict(
            matmul_fmt=None,
            group_size=0,
            hadamard_group_size=meta.hadamard_group_size,
            use_svd=meta.svd_rank > 0,
            svd_rank=meta.svd_rank or 32,
            use_hadamard=meta.use_hadamard,
            use_quantized_matmul=meta.use_quantized_matmul,
            dequant_dtype=meta.dequant_dtype,
        )
        kw.update(overrides)
        return quantize_tensor(w, weights_dtype, meta.layer_kind, rng=rng,
                               **kw)
    return jax.tree_util.tree_map(
        leaf_fn, params, is_leaf=lambda x: isinstance(x, QTensor))
