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
    ap.add_argument("--max-bits", type=int, default=0,
                    help="restrict to formats of at most this width")
    ap.add_argument("--wide-sample", action="store_true",
                    help="with --max-bits: also run ONE representative "
                         "format per excluded wider width")
    args = ap.parse_args()

    x, w, b, flops = make_linear_inputs(args.m, args.n, args.k)
    base = jax.jit(lambda x: x @ w.astype(jnp.bfloat16).T
                   + b.astype(jnp.bfloat16))
    run_path("bf16 baseline", base, x, flops=flops, steps=args.steps)

    from sdnq_tpu.formats import get_format
    seen_wide = set()
    for name in WEIGHTS_DTYPE_ORDER:
        bits = get_format(name).num_bits
        if args.only_bits and bits != args.only_bits:
            continue
        if args.max_bits and bits > args.max_bits:
            if not args.wide_sample or bits in seen_wide:
                continue
            seen_wide.add(bits)
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
