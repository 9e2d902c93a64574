#!/usr/bin/env python
"""Record the bf16-vs-quantized image-quality table (BASELINE accuracy row).

Runs the full in-repo SD pipeline (CLIP -> UNet -> DDIM -> VAE) on fixed
seeds at SD1.5 width, bf16 vs each quantization config, and prints
per-config: worst per-layer normalized MSE (the reference's 10^(-bits/2)
acceptance rule, quantizer.py:287-288), one-step latent NMSE, and decoded
image PSNR / SSIM / NMSE vs the bf16 pipeline.

Weights are seeded-random (no checkpoints exist in this environment);
quantization-noise propagation through depth/resolution is what the table
measures.  The CPU-gated version of this lives in
tests/test_image_quality.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Accuracy is device-independent: run on the host CPU backend so this
# artifact never costs (or contends for) tunnel chip time.  The container
# pre-registers the axon TPU platform from sitecustomize, so the env var
# alone is too late — config.update after import is the reliable switch
# (same pattern as tests/conftest.py).
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from sdnq_tpu import QuantConfig, quantize_model
from sdnq_tpu.models import (
    CLIP_TINY_CONFIG, init_clip, init_unet, init_vae,
    SD15_CONFIG, VAE_TINY_CONFIG,
)
from sdnq_tpu.models.text_encoder import clip_encode
from sdnq_tpu.models.unet import unet_forward
from sdnq_tpu.pipeline import sd_generate
from sdnq_tpu.tensor import QTensor, dequantize
from sdnq_tpu.utils.metrics import normalized_mse, psnr, ssim

CONFIGS = [
    ("int8_matmul", dict(weights_dtype="int8", use_quantized_matmul=True), 8),
    ("uint8_matmul", dict(weights_dtype="uint8", use_quantized_matmul=True),
     8),
    ("fp8_matmul(int8-exec)", dict(weights_dtype="float8_e4m3fn",
                                   use_quantized_matmul=True), 8),
    ("int8_weight_only", dict(weights_dtype="int8"), 8),
    ("uint4_h_svd", dict(weights_dtype="uint4", group_size=64,
                         use_hadamard=True, use_svd=True), 4),
    ("int4_h_svd", dict(weights_dtype="int4", group_size=64,
                        use_hadamard=True, use_svd=True), 4),
    # dynamic ladder: each layer walks up from int4 until its per-layer
    # nmse clears 10^(-bits/2) for the CHOSEN dtype (quantizer.py:264-398)
    ("dynamic_from_int4", dict(weights_dtype="int4", group_size=64,
                               use_dynamic_quantization=True,
                               use_quantized_matmul=True), None),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--unet", choices=["sd15", "tiny"], default="sd15")
    args = ap.parse_args()

    ucfg = SD15_CONFIG
    if args.unet == "tiny":
        from sdnq_tpu.models import UNET_TINY_CONFIG
        ucfg = UNET_TINY_CONFIG
    vcfg, ccfg = VAE_TINY_CONFIG, CLIP_TINY_CONFIG
    up = init_unet(jax.random.key(0), ucfg, dtype=jnp.bfloat16)
    vp = init_vae(jax.random.key(1), vcfg)
    cp = init_clip(jax.random.key(2), ccfg)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, ccfg.vocab_size, (1, 16)))
    emb = clip_encode(cp, ids, ccfg)
    if isinstance(emb, tuple):
        emb = emb[0]
    # project CLIP width to the UNet's cross-attention width
    if emb.shape[-1] != ucfg.cross_attention_dim:
        proj = jnp.asarray(np.random.default_rng(9).normal(
            size=(emb.shape[-1], ucfg.cross_attention_dim))
            .astype(np.float32) / np.sqrt(emb.shape[-1]))
        emb = emb @ proj

    def gen(p):
        return sd_generate(p, vp, emb, jnp.zeros_like(emb), unet_cfg=ucfg,
                           vae_cfg=vcfg, steps=args.steps,
                           height=args.height, width=args.width)

    img_ref = np.asarray(gen(up).astype(jnp.float32))
    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(1, args.height // 8, args.width // 8, ucfg.in_channels))
        .astype(np.float32)).astype(jnp.bfloat16)
    t = jnp.full((1,), 500.0, jnp.float32)
    eps_r = unet_forward(up, x, t, emb, ucfg)

    print(f"image-quality table: unet={args.unet} {args.height}px "
          f"steps={args.steps} (bf16 reference pipeline, fixed seeds)")
    print(f"{'config':>22} {'worst layer nmse':>17} {'thresh':>9} "
          f"{'latent nmse':>12} {'img nmse':>10} {'psnr dB':>8} {'ssim':>7}")
    for label, kw, bits in CONFIGS:
        qp, _ = quantize_model(up, QuantConfig(**kw),
                               arch="StableDiffusionPipeline")
        # per-leaf acceptance: nmse <= 10^(-bits/2) for that LEAF's chosen
        # format (uniform configs all share `bits`; the dynamic ladder
        # picks per-layer dtypes, so the threshold follows the choice)
        worst, thr = 0.0, 1.0
        worst_ratio = 0.0
        flat_o = {jax.tree_util.keystr(p): l for p, l in
                  jax.tree_util.tree_flatten_with_path(up)[0]}
        for p, leaf in jax.tree_util.tree_flatten_with_path(
                qp, is_leaf=lambda l: isinstance(l, QTensor))[0]:
            if isinstance(leaf, QTensor):
                wd = dequantize(leaf, jnp.float32)
                nm = float(normalized_mse(
                    wd, flat_o[jax.tree_util.keystr(p)]))
                b = bits if bits is not None else leaf.meta.format.num_bits
                thr_l = 10.0 ** (-b / 2)
                if nm / thr_l > worst_ratio:
                    worst_ratio, worst, thr = nm / thr_l, nm, thr_l
        eps_q = unet_forward(qp, x, t, emb, ucfg)
        lat = float(normalized_mse(eps_q, eps_r))
        img_q = np.asarray(gen(qp).astype(jnp.float32))
        m_nmse = float(normalized_mse(jnp.asarray(img_q),
                                      jnp.asarray(img_ref)))
        m_psnr = float(psnr(jnp.asarray(img_q), jnp.asarray(img_ref)))
        m_ssim = float(ssim(jnp.asarray(img_q), jnp.asarray(img_ref)))
        flag = "" if worst_ratio <= 1.0 else "  <-- over threshold"
        print(f"{label:>22} {worst:17.3e} {thr:9.0e} {lat:12.3e} "
              f"{m_nmse:10.3e} {m_psnr:8.2f} {m_ssim:7.4f}{flag}",
              flush=True)


if __name__ == "__main__":
    main()
