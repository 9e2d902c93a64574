#!/usr/bin/env python
"""Time every in-tree int4 weight-only route at the bench.py shape.

VERDICT r4 #4: bench.py int4wo sits at 0.67x bf16 while round 1 recorded
0.83x — the router (dequant_mm.dequant_matmul) picks the expanded-scale
groupdot kernel at M=16384/g=128, and that branch was never timed at this
shape.  This experiment times each candidate side by side so the router
can be pointed at the measured winner (reference path being beaten:
dequantizer.py:89-111 materialize + F.linear):

  1. bf16 dot (baseline)
  2. router default (whatever dequant_matmul picks)
  3. expanded-scale groupdot kernel at several (bm, bn) blocks
  4. group-dot mode forced (per-group partial dots)
  5. halfsplit XLA materialize (unpack -> scale -> dot)
  6. bit-plane fused _dequant_mm_pallas (round-1 storage layout)
  7. bit-plane XLA materialize

Usage: python scripts/exp_int4_routes.py [--steps 5] [--inner 8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.bench_common import timeit_chained
from sdnq_tpu.formats import get_format
from sdnq_tpu.kernels import dequant_mm as dm
from sdnq_tpu.packing import (
    pack_codes, unpack_codes_halfsplit, unpack_codes)
from sdnq_tpu.tensor import quantize_tensor

M, N, K, G = 16384, 8192, 4096, 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--inner", type=int, default=8)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32) * 0.3) \
        .astype(jnp.bfloat16)
    flops = 2.0 * M * N * K
    fmt = get_format("int4")

    qt = quantize_tensor(w, "int4", group_size=G)
    assert qt.meta.pack_layout == "halfsplit", qt.meta.pack_layout
    wq_hs = qt.qdata                             # (N, K/2) u8
    scale = qt.scale.reshape(N, -1)              # (N, G)
    codes = unpack_codes_halfsplit(wq_hs, 4, K)  # (N, K) raw codes
    wq_bp = pack_codes(codes.reshape(N, -1), 4)  # bit-plane layout

    def report(name, fn, ref=None):
        try:
            y = jax.jit(fn)(x)
            jax.block_until_ready(y)
            if ref is not None:
                err = float(jnp.max(jnp.abs(
                    y.astype(jnp.float32) - ref.astype(jnp.float32))))
                rel = err / float(jnp.max(jnp.abs(ref)) + 1e-9)
                assert rel < 0.05, f"{name}: rel err {rel}"
            t = timeit_chained(jax.jit(fn), x, steps=args.steps,
                               inner=args.inner, calibrate=True)
            tf = flops / t / 1e12
            print(f"{name:44s} {tf:8.1f} TF  {t*1e3:7.2f} ms", flush=True)
            return t
        except Exception as e:  # noqa: BLE001
            print(f"{name:44s} FAILED: {str(e)[:90]}", flush=True)
            return None

    def xla_hs(x):
        vals = unpack_codes_halfsplit(wq_hs, 4, K).astype(jnp.float32) - 8.0
        wd = (vals.reshape(N, K // G, G) * scale[..., None]) \
            .reshape(N, K).astype(x.dtype)
        return jax.lax.dot_general(
            x, wd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    ref = jax.jit(xla_hs)(x)
    jax.block_until_ready(ref)

    wb = w.astype(jnp.bfloat16)
    t_bf16 = report("bf16 dot", lambda x: (x @ wb.T).astype(jnp.bfloat16))

    report("router default (dequant_matmul)",
           lambda x: dm.dequant_matmul(x, wq_hs, scale, None, None, fmt, G,
                                       pack_layout="halfsplit"), ref)

    for bm, bn in [(512, 512), (512, 1024), (256, 1024), (512, 2048),
                   (1024, 1024)]:
        report(f"expanded groupdot kernel bm={bm} bn={bn}",
               lambda x, bm=bm, bn=bn: dm._groupdot_mm_pallas(
                   x, wq_hs, scale, None, None, fmt_name="int4",
                   code_bits=4, code_min=-8, is_float=False, group_size=G,
                   out_dtype=jnp.bfloat16, bm=bm, bn=bn))

    os.environ["SDNQ_TPU_GROUPDOT_MAX_MG"] = str(1 << 40)
    report("group-dot mode forced (bm=256 bn=256)",
           lambda x: dm._groupdot_mm_pallas(
               x, wq_hs, scale, None, None, fmt_name="int4", code_bits=4,
               code_min=-8, is_float=False, group_size=G,
               out_dtype=jnp.bfloat16, bm=256, bn=256))
    del os.environ["SDNQ_TPU_GROUPDOT_MAX_MG"]

    def xla_hs(x):
        vals = unpack_codes_halfsplit(wq_hs, 4, K).astype(jnp.float32) - 8.0
        wd = (vals.reshape(N, K // G, G) * scale[..., None]) \
            .reshape(N, K).astype(x.dtype)
        return jax.lax.dot_general(
            x, wd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    report("halfsplit XLA materialize", xla_hs)

    report("bit-plane fused kernel",
           lambda x: dm._dequant_mm_pallas(
               x, wq_bp, scale, None, None, fmt_name="int4", code_bits=4,
               code_min=-8, is_float_fmt=False, packed=True, group_size=G,
               out_dtype=jnp.bfloat16))

    def xla_bp(x):
        vals = unpack_codes(wq_bp, 4, K).astype(jnp.float32) - 8.0
        wd = (vals.reshape(N, K // G, G) * scale[..., None]) \
            .reshape(N, K).astype(x.dtype)
        return jax.lax.dot_general(
            x, wd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    report("bit-plane XLA materialize", xla_bp)

    if t_bf16:
        print(f"\nbf16 reference: {flops / t_bf16 / 1e12:.1f} TF "
              f"({t_bf16*1e3:.2f} ms) — target >=0.85x = "
              f"<= {t_bf16/0.85*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
