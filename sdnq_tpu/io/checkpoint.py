"""Orbax sharded checkpointing of quantized pytrees.

The TPU-native replacement for the reference's pickle-based training
checkpoints (SURVEY §5 checkpoint/resume: the reference cannot serialize
training state to safetensors and tells users to torch.save + convert,
quantizer.py:769-770).  QTensor/TrainQTensor/BufferQ are registered pytrees,
so the whole (params, opt_state, step) tuple round-trips through Orbax with
per-shard Tensorstore files — multi-host safe, resumable after pod restart.
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "restore_checkpoint"]


def save_checkpoint(path: str, state: Any, *, force: bool = True):
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=force)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore into the structure of `template` (an abstract or concrete
    pytree with the same treedef, e.g. the freshly-initialized state)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)
