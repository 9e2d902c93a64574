"""Device mesh construction.

The multi-chip execution layer the reference lacks entirely (SURVEY §2.2):
standard JAX mesh axes — data (DP), fsdp (ZeRO-3-style parameter sharding),
tensor (TP), sequence (SP/context parallel).  GSPMD inserts the collectives;
shardings ride ICI within a slice and DCN across slices.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401 (re-exported)

__all__ = ["create_mesh", "Mesh", "NamedSharding", "P"]

AXES = ("data", "fsdp", "tensor", "sequence")


def create_mesh(data: int = 1, fsdp: int = 1, tensor: int = 1,
                sequence: int = 1, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = data * fsdp * tensor * sequence
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(data, fsdp, tensor, sequence)
    return Mesh(dev, AXES)
