#!/usr/bin/env python
"""Full dtype sweep: weight-only TFLOPS for every 1-16 bit format, with and
without Hadamard (reference: scripts/benchmark_sdnq_inference_full.py —
~100 configs)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from scripts.bench_common import make_linear_inputs, run_path
from sdnq_tpu import quantize_tensor, qlinear
from sdnq_tpu.formats import WEIGHTS_DTYPE_ORDER


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=4096)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--hadamard", action="store_true")
    ap.add_argument("--only-bits", type=int, default=0,
                    help="restrict to formats of this bit width")
    args = ap.parse_args()

    x, w, b, flops = make_linear_inputs(args.m, args.n, args.k)
    base = jax.jit(lambda x: x @ w.astype(jnp.bfloat16).T
                   + b.astype(jnp.bfloat16))
    run_path("bf16 baseline", base, x, flops=flops, steps=args.steps)

    from sdnq_tpu.formats import get_format
    for name in WEIGHTS_DTYPE_ORDER:
        if args.only_bits and get_format(name).num_bits != args.only_bits:
            continue
        try:
            qt = quantize_tensor(w, name, use_hadamard=args.hadamard)
        except Exception as e:  # noqa: BLE001
            print(f"{name:42s} quantize failed: {str(e)[:60]}")
            continue
        f = jax.jit(lambda x, qt=qt: qlinear(x, qt, b,
                                             out_dtype=jnp.bfloat16))
        run_path(f"{name}{'+h' if args.hadamard else ''}", f, x,
                 flops=flops, steps=args.steps)


if __name__ == "__main__":
    main()
