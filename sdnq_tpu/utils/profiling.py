"""Profiling + roofline accounting.

The reference has no tracing/profiling subsystem (SURVEY §5: "benchmarks
use wall-clock + synchronize").  TPU-native replacements: jax.profiler
trace capture (xprof-compatible) and a per-kernel roofline model so every
hot op can be reported as a % of speed-of-light — the BASELINE requires
"every dequant+matmul kernel at speed-of-light per chip" to be measurable.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax

__all__ = ["trace", "Timer", "ChipSpec", "CHIPS", "roofline",
           "matmul_roofline"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/sdnq_tpu_trace"):
    """Capture an xprof trace of the enclosed block (view with
    tensorboard-plugin-profile / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer with device sync, like the reference benchmarks
    (scripts/benchmark_sdnq_inference.py:34-57) but block_until_ready-based."""

    def __init__(self, fn):
        self.fn = fn

    def __call__(self, *args, steps: int = 20, warmup: int = 1):
        out = None
        for _ in range(warmup):
            out = self.fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = self.fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / steps, out


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str
    bf16_tflops: float
    int8_tops: float
    hbm_gbps: float
    vmem_mb: int = 16


CHIPS = {
    "v5e": ChipSpec("v5e", 197.0, 394.0, 819.0),
    "v5p": ChipSpec("v5p", 459.0, 918.0, 2765.0),
    "v4": ChipSpec("v4", 275.0, 275.0, 1228.0),
    "v6e": ChipSpec("v6e", 918.0, 1836.0, 1640.0),
}


def detect_chip() -> ChipSpec:
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:  # pragma: no cover
        kind = ""
    for key, spec in CHIPS.items():
        if key in kind.replace(" ", "").replace("tpu", "").replace("lite",
                                                                   "e"):
            return spec
    if "v5" in kind and "lite" in kind:
        return CHIPS["v5e"]
    return CHIPS["v5e"]


def roofline(flops: float, bytes_moved: float, *, int8: bool = False,
             chip: ChipSpec | None = None) -> dict:
    """Speed-of-light estimate: max(compute-bound, memory-bound) time."""
    chip = chip or detect_chip()
    peak = (chip.int8_tops if int8 else chip.bf16_tflops) * 1e12
    t_compute = flops / peak
    t_memory = bytes_moved / (chip.hbm_gbps * 1e9)
    t_sol = max(t_compute, t_memory)
    return {"chip": chip.name, "t_compute_s": t_compute,
            "t_memory_s": t_memory, "t_sol_s": t_sol,
            "bound": "compute" if t_compute >= t_memory else "memory"}


def matmul_roofline(m: int, n: int, k: int, *, a_bytes=1, b_bytes=1,
                    out_bytes=2, int8=True, chip=None) -> dict:
    flops = 2.0 * m * n * k
    bytes_moved = m * k * a_bytes + n * k * b_bytes + m * n * out_bytes
    return roofline(flops, bytes_moved, int8=int8, chip=chip)


def report_fraction(measured_s: float, sol: dict) -> float:
    """Fraction of speed-of-light achieved (1.0 = at roofline)."""
    return sol["t_sol_s"] / max(measured_s, 1e-12)
