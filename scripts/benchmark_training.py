#!/usr/bin/env python
"""Training microbenchmark: fwd+bwd through the trainable quantized matmul
variants (reference: scripts/benchmark_sdnq_training.py:89-326)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from scripts.bench_common import make_linear_inputs, run_path
from sdnq_tpu import quantize_tensor
from sdnq_tpu.train import TrainQTensor, train_qlinear, value_and_grad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=8192)
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    x, w, b, flops = make_linear_inputs(args.m, args.n, args.k)
    flops_total = 3 * flops  # fwd + 2 bwd GEMMs

    # bf16 baseline fwd+bwd
    wb = w.astype(jnp.bfloat16)

    def base_loss(x, wb):
        return jnp.sum((x @ wb.T).astype(jnp.float32) ** 2)

    gbase = jax.jit(jax.grad(base_loss, argnums=(0, 1)))
    run_path("bf16 fwd+bwd", gbase, x, wb, flops=flops_total,
             steps=args.steps)

    for fmt, mm in [("int8", True), ("uint8", True), ("float8_e4m3fn", True),
                    ("int8", False)]:
        for save_q in (False, True):
            qt = quantize_tensor(w, fmt, use_quantized_matmul=mm,
                                 group_size=-1 if mm else 0)
            tp = TrainQTensor(qt=qt, delta=jnp.zeros(w.shape, jnp.float32))

            def loss(x, tp, save_q=save_q):
                y = train_qlinear(x, tp,
                                  save_quantized_activations=save_q)
                return jnp.sum(y.astype(jnp.float32) ** 2)

            g = jax.jit(value_and_grad(loss, argnums=(0, 1)))
            label = (f"{fmt} {'static-mm' if mm else 'weight-only'}"
                     f"{' ckpt' if save_q else ''} fwd+bwd")
            run_path(label, g, x, tp, flops=flops_total, steps=args.steps)


if __name__ == "__main__":
    main()
