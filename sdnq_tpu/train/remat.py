"""Gradient-checkpointing policies for quantized training.

Maps the reference's ``use_grad_ckpt`` duality (SURVEY §7 hard part 5;
training/forward.py:6-89 naming inversion):

  * ``use_grad_ckpt=True``  (reference "plain" variant): wrap block
    forwards in jax.checkpoint — activations recompute in the backward,
    re-quantizing on the fly.  Use `checkpoint_block`.
  * ``use_grad_ckpt=False`` (reference "_ckpt" variant): quantized
    activations are saved in the forward for the backward's grad-weight
    GEMM.  Use ``train_qlinear(..., save_quantized_activations=True)`` —
    the residuals are int8, so saving them costs 4x less HBM than bf16
    activations.

`dots_saveable_policy` is a middle ground: matmul outputs are saved,
elementwise chains recompute.
"""

from __future__ import annotations

import jax

__all__ = ["checkpoint_block", "dots_saveable_policy"]


def checkpoint_block(fn, policy=None):
    """jax.checkpoint with static_argnums-free signature for block
    forwards taking (params, *activations)."""
    return jax.checkpoint(fn, policy=policy)


def dots_saveable_policy():
    return jax.checkpoint_policies.dots_saveable
