#!/usr/bin/env python
"""Standalone SDXL down1 fault repro: initializes ONLY down_blocks[1]
(resnet 320->640, resnet 640->640, 2x depth-2 spatial transformers at
ch=640, downsampler) — seconds instead of the 12-minute full-model init —
quantizes it, and runs each sub-component then the whole level with sync.

Usage: python -u scripts/repro_down1.py --parts level
       python -u scripts/repro_down1.py --parts resnet0,xformer0,downsample
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

_t0 = time.perf_counter()


def mark(msg):
    print(f"[{time.perf_counter()-_t0:7.1f}s] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", default="resnet0,xformer0,resnet1,xformer1,"
                                       "downsample,level")
    ap.add_argument("--attn", default="int8", choices=["int8", "none"])
    ap.add_argument("--fmt", default="int8")
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    from sdnq_tpu import QuantConfig, quantize_model
    from sdnq_tpu.models import SDXL_CONFIG
    from sdnq_tpu.models.unet import (
        _resnet, _resnet_init, _spatial_transformer,
        _spatial_transformer_init)
    from sdnq_tpu.layers import qconv
    from sdnq_tpu.models.common import conv_init

    cfg = SDXL_CONFIG
    ch, cin = 640, 320
    temb_dim = cfg.time_embed_dim
    depth = cfg.transformer_layers[1]

    mark("init down1 params")
    ks = iter(jax.random.split(jax.random.key(0), 8))
    blk = {
        "resnets": [
            _resnet_init(next(ks), cin, ch, temb_dim, jnp.bfloat16),
            _resnet_init(next(ks), ch, ch, temb_dim, jnp.bfloat16)],
        "attentions": [
            _spatial_transformer_init(next(ks), ch, ch // 64, depth,
                                      cfg.cross_attention_dim, jnp.bfloat16),
            _spatial_transformer_init(next(ks), ch, ch // 64, depth,
                                      cfg.cross_attention_dim, jnp.bfloat16)],
        "downsamplers": [{
            "conv": conv_init(next(ks), ch, ch, 3, dtype=jnp.bfloat16)}],
    }
    jax.block_until_ready(jax.tree_util.tree_leaves(blk)[0])
    mark("quantizing")
    qblk, _ = quantize_model(
        blk, QuantConfig(weights_dtype=args.fmt, use_quantized_matmul=True),
        arch="StableDiffusionXLPipeline")
    mark("quantized")

    groups = cfg.norm_groups
    acfg = {"matmul_dtype": "int8"} if args.attn == "int8" else None
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(1, 64, 64, cin)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    h640 = jnp.asarray(rng.normal(size=(1, 64, 64, ch)).astype(np.float32)
                       ).astype(jnp.bfloat16)
    temb = jnp.asarray(rng.normal(size=(1, temb_dim)).astype(np.float32)
                       ).astype(jnp.bfloat16)
    ctx = jnp.asarray(rng.normal(size=(1, 77, cfg.cross_attention_dim))
                      .astype(np.float32)).astype(jnp.bfloat16)

    parts = args.parts.split(",")

    def run(name, fn, *xs):
        if name not in parts:
            return
        for i in range(args.steps):
            mark(f"{name} step {i}: compile+run")
            out = jax.jit(fn)(*xs)
            try:
                jax.block_until_ready(out)
            except Exception as e:  # noqa: BLE001
                mark(f"{name}: FAULT {str(e)[:160]}")
                raise SystemExit(1)
            mark(f"{name}: OK mean="
                 f"{float(jnp.mean(jnp.asarray(out, jnp.float32))):.5f}")

    run("resnet0", lambda x: _resnet(qblk["resnets"][0], x, temb, groups), h)
    run("xformer0", lambda x: _spatial_transformer(
        qblk["attentions"][0], x, ctx, groups, acfg), h640)
    run("resnet1", lambda x: _resnet(qblk["resnets"][1], x, temb, groups),
        h640)
    run("xformer1", lambda x: _spatial_transformer(
        qblk["attentions"][1], x, ctx, groups, acfg), h640)
    run("downsample", lambda x: qconv(
        x, qblk["downsamplers"][0]["conv"]["weight"],
        qblk["downsamplers"][0]["conv"].get("bias"),
        stride=2, padding=((1, 1), (1, 1))), h640)

    def level(x):
        hh = x
        for ri, res_p in enumerate(qblk["resnets"]):
            hh = _resnet(res_p, hh, temb, groups)
            hh = _spatial_transformer(qblk["attentions"][ri], hh, ctx,
                                      groups, acfg)
        return qconv(hh, qblk["downsamplers"][0]["conv"]["weight"],
                     qblk["downsamplers"][0]["conv"].get("bias"),
                     stride=2, padding=((1, 1), (1, 1)))

    run("level", level, h)
    mark("all requested parts done")


if __name__ == "__main__":
    main()
