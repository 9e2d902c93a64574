#!/usr/bin/env python
"""Bisect the SDXL int8 staged-forward TPU device fault (VERDICT r3 #1).

Caches the quantized param tree in /tmp so repeated runs skip the
init+quantize setup; runs the staged forward with sync=True to attribute
the fault to a stage, then (if --stage is given) re-runs just that stage
with per-layer sync to attribute to a layer/kernel.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import logging

import jax
import jax.numpy as jnp
import numpy as np

logging.basicConfig(level=logging.INFO)

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

_t0 = time.perf_counter()


def mark(msg):
    print(f"[{time.perf_counter()-_t0:7.1f}s] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--latent", type=int, default=128)
    ap.add_argument("--cache", default="/tmp/sdxl_int8_cache.safetensors")
    ap.add_argument("--fmt", default="int8")
    ap.add_argument("--stage", default=None,
                    help="run only this stage (embed/down0/down1/down2/mid/"
                         "up0/up1/up2/head) with fine-grained sync")
    ap.add_argument("--attn", default="int8", choices=["int8", "none"])
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    from sdnq_tpu import QuantConfig, quantize_model
    from sdnq_tpu.io.safetensors_io import load_quantized, save_quantized
    from sdnq_tpu.models import SDXL_CONFIG, init_unet, make_staged_unet_forward

    cfg = SDXL_CONFIG
    if args.cache == "none":
        # init on the host CPU backend (90s vs 12min of tunneled TPU
        # dispatches), ship in one transfer
        mark("initializing SDXL params (bf16) on cpu, no cache")
        with jax.default_device(jax.devices("cpu")[0]):
            params = init_unet(jax.random.key(0), cfg, dtype=jnp.bfloat16)
            jax.block_until_ready(jax.tree_util.tree_leaves(params)[:1])
        mark("transferring to device")
        params = jax.device_put(params, jax.devices()[0])
        jax.block_until_ready(jax.tree_util.tree_leaves(params)[-1])
        mark("quantizing")
        qp, _ = quantize_model(
            params,
            QuantConfig(weights_dtype=args.fmt, use_quantized_matmul=True),
            arch="StableDiffusionXLPipeline")
        keep = {id(leaf) for leaf in jax.tree_util.tree_leaves(qp)}
        for leaf in jax.tree_util.tree_leaves(params):
            if hasattr(leaf, "delete") and id(leaf) not in keep:
                leaf.delete()
        mark("quantized")
    elif os.path.exists(args.cache):
        mark(f"loading cached quantized tree from {args.cache}")
        qp, _ = load_quantized(args.cache)
        mark("loaded")
    else:
        mark("initializing SDXL params (bf16)")
        params = init_unet(jax.random.key(0), cfg, dtype=jnp.bfloat16)
        jax.block_until_ready(jax.tree_util.tree_leaves(params)[0])
        mark("quantizing")
        qp, _ = quantize_model(
            params,
            QuantConfig(weights_dtype=args.fmt, use_quantized_matmul=True),
            arch="StableDiffusionXLPipeline")
        keep = {id(leaf) for leaf in jax.tree_util.tree_leaves(qp)}
        for leaf in jax.tree_util.tree_leaves(params):
            if hasattr(leaf, "delete") and id(leaf) not in keep:
                leaf.delete()
        mark(f"quantized; saving cache to {args.cache}")
        save_quantized(qp, args.cache)
        mark("saved")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, args.latent, args.latent,
                                     cfg.in_channels))
                    .astype(np.float32)).astype(jnp.bfloat16)
    t = jnp.full((1,), 500.0, jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(1, 77, cfg.cross_attention_dim))
                      .astype(np.float32)).astype(jnp.bfloat16)
    added = jnp.ones((1, cfg.addition_embed_dim), jnp.bfloat16)

    attn = {"matmul_dtype": "int8"} if args.attn == "int8" else None
    fwd = make_staged_unet_forward(cfg, attn_config=attn, sync=True)
    for i in range(args.steps):
        mark(f"=== step {i} ===")
        out = fwd(qp, x, t, ctx, added_cond=added)
        jax.block_until_ready(out)
        mark(f"step {i} done: out mean={float(jnp.mean(out.astype(jnp.float32))):.5f}")


if __name__ == "__main__":
    main()
