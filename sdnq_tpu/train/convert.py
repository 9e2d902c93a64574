"""Inference <-> training model conversion.

Capability parity with the reference's conversion APIs
(/root/reference/src/sdnq/training/__init__.py:68-439):
  * ``convert_model_to_training``: re-quantize for training — SVD factors
    are baked back into the quantized weight (the per-step requantization in
    apply_weight_updates must keep the pytree structure stable, and
    re-running the randomized SVD every optimizer step would dominate step
    time), Hadamard is kept (cheap input-side rotation), conv/embedding
    QTensors are dequantized to plain arrays (the reference trains only
    Linear layers quantized: training/__init__.py:290-406).
  * ``convert_training_model_to_inference``: strip TrainQTensor wrappers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..tensor import QTensor, dequantize, quantize_tensor
from .matmul import TrainQTensor, make_train_params

__all__ = ["convert_model_to_training", "convert_training_model_to_inference"]


def convert_model_to_training(params, rng=None):
    def conv(leaf):
        if not isinstance(leaf, QTensor):
            return leaf
        meta = leaf.meta
        if meta.layer_kind != "linear":
            return dequantize(leaf)
        if meta.svd_rank > 0:
            w = dequantize(leaf, jnp.float32)
            leaf = quantize_tensor(
                w, meta.fmt, meta.layer_kind, matmul_fmt=meta.matmul_fmt,
                group_size=meta.group_size,
                hadamard_group_size=meta.hadamard_group_size,
                use_svd=False, use_hadamard=meta.use_hadamard,
                use_quantized_matmul=meta.use_quantized_matmul,
                dequant_dtype=meta.dequant_dtype, rng=rng)
        return leaf
    stripped = jax.tree_util.tree_map(
        conv, params, is_leaf=lambda x: isinstance(x, QTensor))
    return make_train_params(stripped)


def convert_training_model_to_inference(params):
    def conv(leaf):
        if isinstance(leaf, TrainQTensor):
            return leaf.qt
        return leaf
    return jax.tree_util.tree_map(
        conv, params, is_leaf=lambda x: isinstance(x, TrainQTensor))
