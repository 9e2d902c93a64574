#!/usr/bin/env python
"""Inference microbenchmark: quantized-matmul and weight-only paths per
format (reference: scripts/benchmark_sdnq_inference.py).

Usage: python scripts/benchmark_inference.py [--m 16384 --n 8192 --k 4096]
       [--hadamard] [--svd]
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import jax

from scripts.bench_common import make_linear_inputs, run_path, timeit
from sdnq_tpu import quantize_tensor, qlinear


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=16384)
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--hadamard", action="store_true")
    ap.add_argument("--svd", action="store_true")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--mm-fmts", type=str,
                    default="int8,uint8,float8_e4m3fn,fp16")
    ap.add_argument("--wo-fmts", type=str, default="int8,int4,uint4,fp6,int2")
    args = ap.parse_args()

    x, w, b, flops = make_linear_inputs(args.m, args.n, args.k)
    suffix = ("+hadamard" if args.hadamard else "") + \
        ("+svd" if args.svd else "")

    base = jax.jit(lambda x: x @ w.astype(jnp.bfloat16).T
                   + b.astype(jnp.bfloat16))
    bf16 = run_path("bf16 baseline", base, x, flops=flops, steps=args.steps)

    # quantized matmul paths (reference table rows 15-18)
    for fmt in [f for f in args.mm_fmts.split(",") if f]:
        qt = quantize_tensor(
            w, fmt, use_quantized_matmul=True, group_size=-1,
            use_hadamard=args.hadamard, use_svd=args.svd)
        f = jax.jit(lambda x, qt=qt: qlinear(x, qt, b,
                                             out_dtype=jnp.bfloat16))
        run_path(f"{fmt} quantized matmul{suffix}", f, x, flops=flops,
                 steps=args.steps)

    # weight-only (fused dequant) paths
    for fmt in [f for f in args.wo_fmts.split(",") if f]:
        qt = quantize_tensor(w, fmt, use_hadamard=args.hadamard,
                             use_svd=args.svd)
        f = jax.jit(lambda x, qt=qt: qlinear(x, qt, b,
                                             out_dtype=jnp.bfloat16))
        run_path(f"{fmt} weight-only{suffix}", f, x, flops=flops,
                 steps=args.steps)


if __name__ == "__main__":
    main()
