#!/usr/bin/env python
"""SDXL/SD1.5 UNet model-level benchmark: bf16 vs quantized denoise step.

BASELINE.md target row: "images/sec/chip (SDXL INT8 ...) >= 1.5x BF16".
Times one UNet forward (the denoise step's dominant cost) at the real
latent resolution; --only {both,bf16,quant} splits variants across
processes when HBM is tight.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.bench_common import timeit
from sdnq_tpu import QuantConfig, quantize_model
from sdnq_tpu.models import (
    SD15_CONFIG, SDXL_CONFIG, init_unet, make_staged_unet_forward,
    unet_forward,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["sdxl", "sd15"], default="sdxl")
    ap.add_argument("--latent", type=int, default=128,
                    help="latent side (128 = 1024px SDXL, 64 = 512px SD1.5)")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--ctx", type=int, default=77)
    ap.add_argument("--fmt", type=str, default="int8")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--only", choices=["both", "bf16", "quant"],
                    default="both")
    ap.add_argument("--staged", action="store_true",
                    help="per-level jits (SDXL-scale single jits exceed "
                         "remote-compile session limits)")
    ap.add_argument("--sync", action="store_true",
                    help="block+log after every stage (device-fault "
                         "attribution; implies --staged timing overhead)")
    ap.add_argument("--warm-only", action="store_true",
                    help="AOT-compile every stage into the persistent "
                         "compile cache (ShapeDtypeStruct params, zero "
                         "transfer) and exit — run this first in its own "
                         "process so the timed run is all cache hits")
    args = ap.parse_args()

    import time as _time
    _t0 = _time.perf_counter()

    def _mark(msg):
        print(f"[{_time.perf_counter()-_t0:7.1f}s] {msg}",
              file=sys.stderr, flush=True)

    cfg = SDXL_CONFIG if args.model == "sdxl" else SD15_CONFIG
    arch = ("StableDiffusionXLPipeline" if args.model == "sdxl"
            else "StableDiffusionPipeline")
    # init (and for --only quant, also quantize) on the host CPU backend:
    # TPU-side init is 12 min of tunneled dispatches at SDXL scale, and
    # shipping the int8 tree instead of bf16 halves the one transfer.
    # Keeping each process lean matters doubly here — heavy sessions die
    # ~10-15 min after first device contact (STATUS.md round-4 notes).
    dev = jax.devices()[0]
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_unet(jax.random.key(0), cfg, dtype=jnp.bfloat16)
        jax.block_until_ready(jax.tree_util.tree_leaves(params)[:1])
        if args.only == "quant":
            _mark("quantizing on cpu")
            params, _ = quantize_model(
                params,
                QuantConfig(weights_dtype=args.fmt,
                            use_quantized_matmul=True),
                arch=arch)
    if args.warm_only:
        _mark("AOT-warming stage compile cache (no transfer)")
        attn = ({"matmul_dtype": "int8"} if args.only == "quant" else None)
        fwd = make_staged_unet_forward(cfg, attn_config=attn)
        x_a = jax.ShapeDtypeStruct(
            (args.batch, args.latent, args.latent, cfg.in_channels),
            jnp.bfloat16)
        t_a = jax.ShapeDtypeStruct((args.batch,), jnp.float32)
        ctx_a = jax.ShapeDtypeStruct(
            (args.batch, args.ctx, cfg.cross_attention_dim), jnp.bfloat16)
        added_a = (jax.ShapeDtypeStruct(
            (args.batch, cfg.addition_embed_dim), jnp.bfloat16)
            if cfg.addition_embed_dim else None)
        fwd.warm(params, x_a, t_a, ctx_a, added_cond=added_a)
        _mark("stage cache warm — exiting")
        return

    _mark("transferring to device (packed single-buffer)")
    # ONE bulk transfer instead of 2,400 per-leaf puts: per-leaf tunnel
    # overhead moved the int8 tree at ~25 MB/s (~3 min), spending the
    # session death window on the transfer alone (STATUS.md round-5).
    from sdnq_tpu.utils.transfer import device_put_packed
    params = device_put_packed(params, dev)
    # Drain the transfer with a one-element host READBACK before any
    # compile is issued: through the tunnel, block_until_ready returns
    # early (bench_common._sync note), so compiles would otherwise overlap
    # the in-flight transfer — which reproducibly crashes the TPU worker.
    last = [l for l in jax.tree_util.tree_leaves(params)
            if hasattr(l, "ravel")][-1]
    np.asarray(last.ravel()[0])
    _mark("params on device (transfer drained)")
    # pre-warm the timing sync's slice/readback program for the output
    # shape NOW: any cold compile issued late in the session hangs when
    # the tunnel's compile service dies (STATUS.md round-4 notes)
    np.asarray(jnp.zeros((args.batch, args.latent, args.latent,
                          cfg.out_channels), jnp.bfloat16).ravel()[0])

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(args.batch, args.latent, args.latent,
                                     cfg.in_channels))
                    .astype(np.float32)).astype(jnp.bfloat16)
    t = jnp.full((args.batch,), 500.0, jnp.float32)
    ctx = jnp.asarray(rng.normal(
        size=(args.batch, args.ctx, cfg.cross_attention_dim))
        .astype(np.float32)).astype(jnp.bfloat16)
    added = (jnp.ones((args.batch, cfg.addition_embed_dim), jnp.bfloat16)
             if cfg.addition_embed_dim else None)

    def run(p, attn):
        if args.staged or args.sync:
            fwd = make_staged_unet_forward(cfg, attn_config=attn,
                                           sync=args.sync)
            return lambda x: fwd(p, x, t, ctx, added_cond=added)
        return jax.jit(lambda x: unet_forward(
            p, x, t, ctx, cfg, added_cond=added, attn_config=attn))

    t_bf16 = None
    if args.only in ("both", "bf16"):
        _mark("bf16: compiling + timing")
        t_bf16 = timeit(run(params, None), x, steps=args.steps)
        print(f"bf16:    {t_bf16*1e3:8.2f} ms/step "
              f"({args.batch/t_bf16:.2f} img/s)", flush=True)

    if args.only == "both":
        _mark("quantizing model on device")
        qp, _ = quantize_model(
            params,
            QuantConfig(weights_dtype=args.fmt, use_quantized_matmul=True),
            arch=arch)
        jax.block_until_ready(
            [l for l in jax.tree_util.tree_leaves(qp)
             if hasattr(l, "dtype")][:1])
        _mark("quantized")
        # SDXL bf16 params are ~5 GB: freeing the fp originals (quantized
        # trees share skipped leaves by reference) keeps the quant run
        # inside the 16 GB chip alongside full-res activations — leaving
        # them resident crashed the TPU worker mid-forward
        keep = {id(leaf) for leaf in jax.tree_util.tree_leaves(qp)}
        for leaf in jax.tree_util.tree_leaves(params):
            if hasattr(leaf, "delete") and id(leaf) not in keep:
                leaf.delete()
    elif args.only == "quant":
        qp = params  # quantized on cpu above
    if args.only in ("both", "quant"):
        _mark("quant: compiling + timing")
        t_q = timeit(run(qp, {"matmul_dtype": "int8"}), x, steps=args.steps)
        vs = f"  {t_bf16/t_q:.2f}x bf16" if t_bf16 else ""
        print(f"{args.fmt}: {t_q*1e3:8.2f} ms/step "
              f"({args.batch/t_q:.2f} img/s){vs}", flush=True)


if __name__ == "__main__":
    main()
