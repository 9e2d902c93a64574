"""Environment-variable configuration surface.

The TPU analogue of the reference's ~20 ``SDNQ_*`` env knobs
(/root/reference/src/sdnq/kernel_wrappers.py:11-105, kernels/triton_mm.py:9-18,
sdnext.py:24-39, README.md:241-277): backend forcing, kernel tuning
overrides, numerics defaults.  All knobs are read lazily at call time so
tests can monkeypatch them.

| Variable | Meaning | Default |
|---|---|---|
| SDNQ_TPU_KERNEL_BACKEND      | pallas / xla / interpret            | auto |
| SDNQ_TPU_MM_BLOCKS           | "bm,bn,bk" for the scaled-mm kernel | auto |
| SDNQ_TPU_FUSED_MM_BLOCKS     | "bm,bn" for the fused-act kernel    | auto |
| SDNQ_TPU_DEQUANT_BLOCKS      | "bm,bn" for the dequant-mm kernel   | auto |
| SDNQ_TPU_DEQUANT_MATERIALIZE_ROWS | M >= this: weight-only matmuls materialize via XLA (0=never) | 4096 |
| SDNQ_TPU_ATTN_BLOCKS         | "bm,bk" for the attention kernel    | auto |
| SDNQ_TPU_DISABLE_FUSED_ACT   | 1 = use the two-pass quantize path  | 0 |
| SDNQ_TPU_VMEM_LIMIT_MB       | Mosaic scoped-vmem limit (MB)       | 100 |
| SDNQ_TPU_DEQUANT_DTYPE       | default dequantize dtype            | bfloat16 |
| SDNQ_TPU_USE_QUANTIZED_MATMUL| force 1/0 (overrides configs)       | unset |
| SDNQ_TPU_SVD_RANK            | default SVDQuant rank               | 32 |
| SDNQ_TPU_SVD_STEPS           | default SVD power iterations        | 8 |
| SDNQ_TPU_HADAMARD_GROUP_SIZE | default Hadamard group size         | 256 |
| SDNQ_TPU_GROUP_SIZE          | default quant group size (0=auto)   | 0 |
| SDNQ_TPU_DYNAMIC_THRESHOLD   | dynamic-ladder loss threshold       | per-bits |
| SDNQ_TPU_STOCHASTIC_ROUNDING | 1/0 default for weight quant        | 0 |
| SDNQ_TPU_COMPILE_CACHE       | jax compilation-cache dir           | unset |
| SDNQ_TPU_MIN_MATMUL_ROWS     | small-batch bail-out threshold      | 32 |
| SDNQ_TPU_ATTN_MATMUL_DTYPE   | default attention QK dtype          | int8 |
| SDNQ_TPU_RING_QUANTIZE_PV    | 1/0 int8 V on the ring              | 1 |
| SDNQ_TPU_LOG_LEVEL           | python logging level for sdnq_tpu   | WARNING |
"""

from __future__ import annotations

import os

__all__ = [
    "env_str", "env_int", "env_float", "env_bool", "env_blocks",
    "vmem_limit_bytes", "maybe_enable_compile_cache",
]


def env_str(name: str, default: str | None = None) -> str | None:
    v = os.environ.get(name)
    return v if v not in (None, "") else default


def env_int(name: str, default: int) -> int:
    v = os.environ.get(name)
    if v in (None, ""):
        return default
    try:
        return int(v)
    except ValueError:
        return default


def env_float(name: str, default: float | None = None) -> float | None:
    v = os.environ.get(name)
    if v in (None, ""):
        return default
    try:
        return float(v)
    except ValueError:
        return default


def env_bool(name: str, default: bool | None = None) -> bool | None:
    v = os.environ.get(name)
    if v in (None, ""):
        return default
    return v.lower() in ("1", "true", "yes", "on")


def env_blocks(name: str, n: int) -> tuple[int, ...] | None:
    """Parse "bm,bn[,bk]" kernel-block overrides; None if unset/invalid."""
    v = os.environ.get(name)
    if not v:
        return None
    try:
        parts = tuple(int(p) for p in v.replace("x", ",").split(","))
    except ValueError:
        return None
    if len(parts) != n or any(p <= 0 for p in parts):
        return None
    return parts


def vmem_limit_bytes() -> int:
    return env_int("SDNQ_TPU_VMEM_LIMIT_MB", 100) * 1024 * 1024


def maybe_enable_compile_cache() -> None:
    """Point jax at a persistent compilation cache if configured."""
    d = env_str("SDNQ_TPU_COMPILE_CACHE")
    if d:
        import jax
        jax.config.update("jax_compilation_cache_dir", d)
