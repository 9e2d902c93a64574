"""Shared benchmark harness (reference: scripts/benchmark_sdnq_inference.py:34-60
— wall-clock TFLOPS with per-path failure capture)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")


def _sync(out):
    """Force completion via a one-element host readback.

    Through the axon tunnel, jax.block_until_ready returns early for
    programs whose output pytrees contain float0 (grad) leaves — a host
    transfer of one element is the reliable barrier."""
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "dtype") and leaf.dtype != jax.dtypes.float0 \
                and hasattr(leaf, "addressable_shards"):
            import numpy as np
            np.asarray(leaf.ravel()[0])
            return
    jax.block_until_ready(out)


def timeit(fn, *args, steps=20, warmup=1):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / steps


def timeit_chained(fn, x, steps=10, inner=32, calibrate=False):
    """Per-op time for sub-millisecond ops: run `inner` data-dependent
    iterations of fn inside ONE jitted scan, so the axon tunnel's
    per-dispatch floor amortizes away.  The carry is nudged by
    a runtime-scalar function of the output, which XLA cannot fold, so
    iterations serialize and the weight is re-read from HBM each step.

    The dispatch floor is NOT fixed: it drifts between ~0.8 ms and ~5 ms
    across the day, so at inner=32-64 it pollutes sub-100 us ops by
    10-150 us/iter (measured: a trivial (8,128) multiply reports 156
    us/iter at inner=32 vs 3.5 at inner=1024).  Callers timing sub-100 us
    ops must raise `inner` (>=512) and/or pass calibrate=True, which times
    an empty chain of the same length and subtracts the per-iteration
    harness floor (the same treatment applies to baseline and quantized
    rows, so ratios stay fair)."""
    def chain(f, inner):
        def body(c, _):
            y = f(c)
            # couple via a NONLINEAR reduction: sum(y) commutes through a
            # final linear layer (XLA rewrites sum(W@x) to colsum(W)@x and
            # elides the matmul — measured 265 "TF" on an int8 MLP whose
            # ceiling is 190); sum(y*y) cannot be simplified away.
            yf = y.astype(jnp.float32)
            c = c * (1 + 1e-30 * jnp.sum(yf * yf)).astype(c.dtype)
            return c, ()
        return jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=inner)[0])

    t = timeit(chain(fn, inner), x, steps=steps) / inner
    if calibrate:
        t0 = timeit(chain(lambda c: c, inner), x, steps=steps) / inner
        t = max(t - t0, 1e-9)
    return t


def run_path(name: str, fn, *args, flops: float, steps=20):
    """Time one path; a failing path reports 0 like the reference."""
    try:
        t = timeit(fn, *args, steps=steps)
        tflops = flops / t / 1e12
        print(f"{name:42s} {tflops:9.2f} TFLOPS  ({t*1e3:8.2f} ms)",
              flush=True)
        return tflops
    except Exception as e:  # noqa: BLE001
        print(f"{name:42s} test failed: {str(e)[:80]}", flush=True)
        return 0.0


def make_linear_inputs(m=16384, n=8192, k=4096, seed=0):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.normal(size=(n, k)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32) * 0.3) \
        .astype(jnp.bfloat16)
    return x, w, b, 2.0 * m * n * k
