#!/usr/bin/env python
"""Model-level benchmark: DiT denoise steps/sec, bf16 vs quantized
(the images/sec/chip proxy from BASELINE.json)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.bench_common import timeit
from sdnq_tpu import QuantConfig, quantize_model
from sdnq_tpu.models import DiTConfig, dit_forward, init_dit, \
    make_rope_freqs, stack_dit_blocks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=1536)
    ap.add_argument("--double", type=int, default=6)
    ap.add_argument("--single", type=int, default=12)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--tokens", type=int, default=1024)
    ap.add_argument("--txt", type=int, default=256)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--fmt", type=str, default="int8")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--staged", action="store_true",
                    help="four separately-jitted stages (Flux-scale configs "
                         "whose single jit exceeds remote-compile limits)")
    ap.add_argument("--skip-bf16", action="store_true")
    ap.add_argument("--dtype", type=str, default="float32",
                    help="param init dtype (bfloat16 halves init HBM — "
                         "needed at Flux-scale dims on a 16GB chip)")
    ap.add_argument("--only", choices=["both", "bf16", "quant"],
                    default="both",
                    help="run one variant per process at Flux-scale "
                         "(peak HBM = one param copy + one stacked copy)")
    ap.add_argument("--no-stack", action="store_true",
                    help="keep the QUANT variant's blocks as an unrolled "
                         "list instead of scan-stacking: stacked QTensor "
                         "slices can't alias into the Pallas matmuls, so "
                         "scan copies every weight every layer (~1.1 ms/"
                         "block at Flux width); unrolling trades compile "
                         "time for that copy")
    ap.add_argument("--attn", choices=["none", "int8", "int8pv"],
                    default="none",
                    help="attention mode for the QUANT variant: 'none' = "
                         "unquantized bf16 flash (fastest at d=128 — int8 "
                         "QK gains nothing when the MXU contraction is only "
                         "128 wide), 'int8' = int8 QK, 'int8pv' = int8 QK + "
                         "const-scale int8 PV")
    args = ap.parse_args()

    hd = args.hidden // args.heads
    a1 = max(2, hd // 8 // 2 * 2)
    rest = (hd - a1) // 2 // 2 * 2
    a1 = hd - 2 * rest  # rope axis dims must be even and sum to head_dim
    cfg = DiTConfig(in_channels=64, hidden_size=args.hidden,
                    num_heads=args.heads, depth_double=args.double,
                    depth_single=args.single, txt_dim=2048, vec_dim=768,
                    axes_dims=(a1, rest, rest))
    params = init_dit(jax.random.key(0), cfg, dtype=jnp.dtype(args.dtype))

    rng = np.random.default_rng(0)
    side = int(args.tokens ** 0.5)
    img = jnp.asarray(rng.normal(size=(args.batch, side * side,
                                       cfg.in_channels))
                      .astype(np.float32)).astype(jnp.bfloat16)
    txt = jnp.asarray(rng.normal(size=(args.batch, args.txt, cfg.txt_dim))
                      .astype(np.float32)).astype(jnp.bfloat16)
    t = jnp.full((args.batch,), 0.5, jnp.float32)
    pooled = jnp.ones((args.batch, cfg.vec_dim), jnp.bfloat16)
    freqs = make_rope_freqs(cfg, args.txt, (side, side))

    if args.staged:
        from sdnq_tpu.models import make_staged_dit_forward

        def run(p, attn):
            fwd = make_staged_dit_forward(cfg, attn)
            return lambda img: fwd(p, img, txt, t, pooled, guidance=t,
                                   freqs=freqs)
    else:
        def run(p, attn):
            return jax.jit(lambda img: dit_forward(
                p, img, txt, t, pooled, cfg, guidance=t, freqs=freqs,
                attn_config=attn))

    # Flux-scale configs hold GBs of params: keep at most one extra copy
    # alive at a time (quantize, free the fp original, THEN stack), and
    # offer --only so bf16 and quantized runs can use separate processes
    # on the 16GB chip.
    def free(tree, keep=None):
        # stacked/quantized trees share non-block leaves (embedders, head
        # norms) with the source tree by reference — only delete buffers
        # not reachable from `keep`
        keep_ids = {id(leaf) for leaf in jax.tree_util.tree_leaves(keep)} \
            if keep is not None else set()
        for leaf in jax.tree_util.tree_leaves(tree):
            if hasattr(leaf, "delete") and id(leaf) not in keep_ids:
                leaf.delete()

    t_bf16 = None
    if args.only in ("both", "bf16") and not args.skip_bf16:
        params_s = stack_dit_blocks(params)
        if args.only == "bf16":
            free(params, keep=params_s)
        t_bf16 = timeit(run(params_s, None), img, steps=args.steps)
        print(f"bf16:    {t_bf16*1e3:8.2f} ms/step "
              f"({1/t_bf16:.2f} steps/s)", flush=True)
        free(params_s, keep=params if args.only == "both" else None)

    if args.only in ("both", "quant"):
        qp, _ = quantize_model(
            params, QuantConfig(weights_dtype=args.fmt,
                                use_quantized_matmul=True),
            arch="FluxTransformer2DModel")
        free(params, keep=qp)
        if not args.no_stack:
            qp = stack_dit_blocks(qp)
        attn_cfg = {
            "none": None,
            "int8": {"matmul_dtype": "int8"},
            "int8pv": {"matmul_dtype": "int8", "pv_matmul_dtype": "int8"},
        }[args.attn]
        t_q = timeit(run(qp, attn_cfg), img, steps=args.steps)
        vs = f"  {t_bf16/t_q:.2f}x bf16" if t_bf16 else ""
        print(f"{args.fmt}: {t_q*1e3:8.2f} ms/step ({1/t_q:.2f} steps/s)"
              f"{vs}", flush=True)


if __name__ == "__main__":
    main()
