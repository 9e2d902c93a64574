#!/usr/bin/env python
"""Memory-bound (small-M) weight-only benchmark — the regime weight-only
quantization exists for: at inference batch sizes the weight read dominates
and k-bit weights cut HBM traffic by 16/k vs bf16.

Sweeps M in {1, 16, 128, 512} x formats {bf16 baseline, int8, int4, uint4,
float6_e3m2fn} on an (O=8192, K=4096) layer and reports effective tokens/s
(rows/s) and the speedup vs the bf16 dense linear.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.bench_common import timeit_chained
from sdnq_tpu import quantize_tensor, qlinear


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--o", type=int, default=8192)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--fmts", type=str,
                    default="int8,int4,uint4,float6_e3m2fn")
    ap.add_argument("--ms", type=str, default="1,16,128,512")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(args.o, args.k)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(args.o,)).astype(np.float32))
    wb = w.astype(jnp.bfloat16)
    bb = b.astype(jnp.bfloat16)

    fmts = args.fmts.split(",")
    ms = [int(m) for m in args.ms.split(",")]

    def make(spec):
        # "fmt", "fmt:groupsize", or "fmt:groupsize:q" (q = quantized
        # matmul: dynamic-int8 x against the raw packed codes on the int8
        # MXU — kernels/dequant_mm.packed_int8_matmul)
        kw = {}
        if spec.endswith(":q"):
            spec = spec[:-2]
            kw["use_quantized_matmul"] = True
        if ":" in spec:
            f, g = spec.split(":")
            return quantize_tensor(w, f, group_size=int(g), **kw)
        return quantize_tensor(w, spec, **kw)

    qts = {f: make(f) for f in fmts}

    print(f"weight ({args.o}, {args.k});  tokens/s = M/step-time")
    header = f"{'M':>6} {'bf16':>12}" + "".join(f"{f:>18}" for f in fmts)
    print(header, flush=True)
    for m in ms:
        x = jnp.asarray(rng.normal(size=(m, args.k)).astype(np.float32)) \
            .astype(jnp.bfloat16)

        # sub-ms ops through the axon tunnel hit a drifting 0.8-5 ms
        # dispatch floor; chain `inner` data-dependent calls inside one
        # jit AND subtract the measured empty-chain floor (calibrate) so
        # the per-op time reflects the kernel, not the tunnel.  At
        # inner=64 the floor polluted every sub-100us row by 12-80 us —
        # the round-2b table understated small-M speedups by ~15-40%.
        inner = max(8, min(512, (1 << 25) // (m * args.k)))
        steps = max(5, min(args.steps, 2000 // inner))
        t0 = timeit_chained(lambda x: x @ wb.T + bb, x,
                            steps=steps, inner=inner, calibrate=True)
        row = f"{m:>6} {m/t0:>12.3e}"
        for f in fmts:
            qt = qts[f]
            try:
                t = timeit_chained(lambda x, qt=qt: qlinear(x, qt, bb), x,
                                   steps=steps, inner=inner, calibrate=True)
                row += f"{m/t:>12.3e} {t0/t:>4.2f}x"
            except Exception as e:  # noqa: BLE001
                row += f"{'FAIL':>18}"
                print(f"  {f} M={m}: {str(e)[:80]}")
        print(row, flush=True)


if __name__ == "__main__":
    main()
