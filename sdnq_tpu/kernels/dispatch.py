"""Backend dispatch for compute kernels.

The TPU analogue of the reference's capability-flag + fallback registry
(/root/reference/src/sdnq/kernel_wrappers.py:11-105): each hot op has a
Pallas TPU kernel and an XLA fallback; selection is static (trace-time) by
platform, with an env override for debugging.

  SDNQ_TPU_KERNEL_BACKEND = "pallas" | "xla" | "interpret"
  (default: pallas on TPU, xla elsewhere; "interpret" runs the Pallas
  kernels through the interpreter — the CPU test path for kernel logic,
  mirroring the reference's strategy of Triton-less fallbacks.)
"""

from __future__ import annotations

import os

import jax

__all__ = ["use_pallas", "kernel_backend", "pallas_interpret"]


def kernel_backend() -> str:
    override = os.environ.get("SDNQ_TPU_KERNEL_BACKEND")
    if override in ("pallas", "xla", "interpret"):
        return override
    try:
        platform = jax.default_backend()
    except Exception:  # pragma: no cover
        platform = "cpu"
    # the axon tunnel registers as its own platform name but is a TPU
    if platform in ("tpu", "axon"):
        return "pallas"
    return "xla"


def use_pallas() -> bool:
    return kernel_backend() in ("pallas", "interpret")


def pallas_interpret() -> bool:
    return kernel_backend() == "interpret"
