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

__all__ = ["use_pallas", "kernel_backend", "pallas_interpret",
           "route_fp8_to_int8"]


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


_fp8_route_logged = False


def route_fp8_to_int8() -> bool:
    """True when fp8 matmul *execution* should run on the int8 MXU.

    No TPU generation through v6e has a native fp8 MXU: an fp8 dot lowers
    to the bf16 pipeline and delivers ~1.0x bf16 (measured,
    benchmarks/tpu_v5e_r2.txt float8 row).  The reference handles exactly
    this class of capability gap with probe flags + fallback dispatch
    (kernel_wrappers.py:11-105, is_fp8_mm_supported); the TPU analogue is
    to keep fp8 *storage* but route the matmul to int8 execution, which
    does have a 2x-rate MXU path.  Override: SDNQ_TPU_FP8_MXU=1 forces
    native fp8 dots (future hardware), =0 forces routing everywhere.
    """
    global _fp8_route_logged
    from ..envconfig import env_bool
    ov = env_bool("SDNQ_TPU_FP8_MXU")
    if ov is not None:
        return not ov
    try:
        platform = jax.default_backend()
    except Exception:  # pragma: no cover
        platform = "cpu"
    if platform not in ("tpu", "axon"):
        return False  # XLA:CPU etc.: leave fp8 requests alone
    if not _fp8_route_logged:
        _fp8_route_logged = True
        import logging
        logging.getLogger("sdnq_tpu").info(
            "fp8 matmul requested on a TPU without an fp8 MXU: executing "
            "on the int8 MXU (storage stays fp8; set SDNQ_TPU_FP8_MXU=1 "
            "to force native fp8 dots)")
    return True
