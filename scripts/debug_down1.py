#!/usr/bin/env python
"""Fine bisect of the SDXL down1 TPU device fault: run each sub-component
of down_blocks[1] separately on the cached quantized tree."""

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
    ap.add_argument("--cache", default="/tmp/sdxl_int8_cache.safetensors")
    ap.add_argument("--parts", default="resnet0,proj,selfattn,crossattn,ff,"
                                       "xformer,resnet1,downsample,level")
    ap.add_argument("--attn", default="int8", choices=["int8", "none"])
    args = ap.parse_args()

    from sdnq_tpu.io.safetensors_io import load_quantized
    from sdnq_tpu.models import SDXL_CONFIG
    from sdnq_tpu.models.unet import _resnet, _spatial_transformer, _basic_transformer
    from sdnq_tpu.models.common import attention, layer_norm, split_heads
    from sdnq_tpu.layers import qlinear

    cfg = SDXL_CONFIG
    mark("loading cache")
    qp, _ = load_quantized(args.cache)
    mark("loaded")
    blk = qp["down_blocks"][1]
    groups = cfg.norm_groups
    acfg = {"matmul_dtype": "int8"} if args.attn == "int8" else None

    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(1, 64, 64, 320)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    h640 = jnp.asarray(rng.normal(size=(1, 64, 64, 640)).astype(np.float32)
                       ).astype(jnp.bfloat16)
    temb = jnp.asarray(rng.normal(size=(1, 1280)).astype(np.float32)
                       ).astype(jnp.bfloat16)
    ctx = jnp.asarray(rng.normal(size=(1, 77, cfg.cross_attention_dim))
                      .astype(np.float32)).astype(jnp.bfloat16)
    tseq = jnp.asarray(rng.normal(size=(1, 4096, 640)).astype(np.float32)
                       ).astype(jnp.bfloat16)

    parts = args.parts.split(",")

    def run(name, fn, *xs):
        if name not in parts:
            return
        mark(f"{name}: compile+run")
        try:
            out = jax.jit(fn)(*xs)
            jax.block_until_ready(out)
            mark(f"{name}: OK mean={float(jnp.mean(jnp.asarray(out, jnp.float32))):.5f}")
        except Exception as e:  # noqa: BLE001
            mark(f"{name}: FAILED {str(e)[:200]}")
            raise SystemExit(1)

    xp = blk["attentions"][0]["transformer_blocks"][0]
    heads = 10

    def selfattn(t):
        ap_ = xp["attn1"]
        tn = layer_norm(t, xp["norm1"]["weight"], xp["norm1"]["bias"])
        q = split_heads(qlinear(tn, ap_["to_q"]["weight"]), heads)
        k = split_heads(qlinear(tn, ap_["to_k"]["weight"]), heads)
        v = split_heads(qlinear(tn, ap_["to_v"]["weight"]), heads)
        out = attention(q, k, v, acfg)
        return qlinear(out, ap_["to_out"]["weight"], ap_["to_out"].get("bias"))

    def crossattn(t):
        ap_ = xp["attn2"]
        tn = layer_norm(t, xp["norm2"]["weight"], xp["norm2"]["bias"])
        q = split_heads(qlinear(tn, ap_["to_q"]["weight"]), heads)
        k = split_heads(qlinear(ctx, ap_["to_k"]["weight"]), heads)
        v = split_heads(qlinear(ctx, ap_["to_v"]["weight"]), heads)
        out = attention(q, k, v, acfg)
        return qlinear(out, ap_["to_out"]["weight"], ap_["to_out"].get("bias"))

    def ff(t):
        tn = layer_norm(t, xp["norm3"]["weight"], xp["norm3"]["bias"])
        hh = qlinear(tn, xp["ff"]["proj_in"]["weight"],
                     xp["ff"]["proj_in"].get("bias"))
        a, b = jnp.split(hh, 2, axis=-1)
        hh = a * jax.nn.gelu(b, approximate=True)
        return t + qlinear(hh, xp["ff"]["proj_out"]["weight"],
                           xp["ff"]["proj_out"].get("bias"))

    sp = blk["attentions"][0]
    run("resnet0", lambda x: _resnet(blk["resnets"][0], x, temb, groups), h)
    run("proj", lambda t: qlinear(t, sp["proj_in"]["weight"],
                                  sp["proj_in"].get("bias")), tseq)
    run("selfattn", selfattn, tseq)
    run("crossattn", crossattn, tseq)
    run("ff", ff, tseq)
    run("xformer", lambda x: _spatial_transformer(sp, x, ctx, groups, acfg),
        h640)
    run("resnet1", lambda x: _resnet(blk["resnets"][1], x, temb, groups),
        h640)
    if "downsample" in parts and "downsamplers" in blk:
        from sdnq_tpu.layers import qconv
        run("downsample", lambda x: qconv(
            x, blk["downsamplers"][0]["conv"]["weight"],
            blk["downsamplers"][0]["conv"].get("bias"),
            stride=2, padding=((1, 1), (1, 1))), h640)

    if "level" in parts:
        from sdnq_tpu.models.unet import make_staged_unet_forward  # noqa
        # full level via the same down_level program shape as the staged fwd
        def level(x):
            hh = x
            attn_i = 0
            for res_p in blk["resnets"]:
                hh = _resnet(res_p, hh, temb, groups)
                hh = _spatial_transformer(blk["attentions"][attn_i], hh, ctx,
                                          groups, acfg)
                attn_i += 1
            from sdnq_tpu.layers import qconv
            hh = qconv(hh, blk["downsamplers"][0]["conv"]["weight"],
                       blk["downsamplers"][0]["conv"].get("bias"),
                       stride=2, padding=((1, 1), (1, 1)))
            return hh
        run("level", level, h)
    mark("all requested parts done")


if __name__ == "__main__":
    main()
