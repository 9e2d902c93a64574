#!/usr/bin/env python
"""Quantized flash-attention microbenchmark (reference kernel:
/root/reference/src/sdnq/kernels/triton_atten.py; its benchmark harness is
the shape-sweep in the README).  FLOPs = 4*B*H*N^2*D (QK^T + PV)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.bench_common import run_path
from sdnq_tpu.kernels.attention import quantized_attention


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--h", type=int, default=16)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--causal", action="store_true")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    shp = (args.b, args.h, args.n, args.d)
    q = jnp.asarray(rng.normal(size=shp).astype(np.float32) * 0.5) \
        .astype(jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=shp).astype(np.float32) * 0.5) \
        .astype(jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=shp).astype(np.float32) * 0.5) \
        .astype(jnp.bfloat16)
    flops = 4.0 * args.b * args.h * args.n * args.n * args.d

    def xla_ref(q, k, v):
        s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * (args.d ** -0.5)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhnm,bhmd->bhnd", p, v.astype(jnp.float32))

    run_path("xla f32-softmax attention", jax.jit(xla_ref), q, k, v,
             flops=flops, steps=args.steps)

    for name, kw in [
        ("pallas int8 qk flash attention", dict(matmul_dtype="int8")),
        ("pallas int8 qk + int8 pv", dict(matmul_dtype="int8",
                                          pv_matmul_dtype="int8")),
        ("pallas int8 qk + smooth-k", dict(matmul_dtype="int8",
                                           smooth_k=True)),
        ("pallas fp8 qk", dict(matmul_dtype="fp8")),
        ("pallas unquantized flash", dict(matmul_dtype=None)),
    ]:
        run_path(name,
                 jax.jit(lambda q, k, v, kw=kw: quantized_attention(
                     q, k, v, is_causal=args.causal, **kw)),
                 q, k, v, flops=flops, steps=args.steps)


if __name__ == "__main__":
    main()
