"""End-to-end image-quality gate: quantized pipeline output vs BF16.

BASELINE.md accuracy row: generated output must match BF16 within the
reference's dynamic-quantization loss family at equal bit-width.  The
reference's only built-in accuracy criterion is the per-layer rule
``mse/var <= 10^(-bits/2)`` (/root/reference/src/sdnq/quantizer.py:287-288,
367-380); this test lifts it through the whole CLIP -> UNet -> DDIM ->
VAE pipeline (all in-repo) on fixed seeds and gates:

  * per-layer normalized MSE (the reference rule, verbatim),
  * per-step latent normalized MSE (one UNet eval at a fixed timestep),
  * decoded-image PSNR / SSIM / normalized MSE vs the BF16 pipeline.

Thresholds were calibrated on this exact setup (CPU, tiny zoo configs)
and carry ~3x margin over the measured values
(int8 matmul: latent 3.0e-5, image PSNR 56.3 dB, SSIM 0.9997;
uint4+Hadamard+SVD g=64: latent 2.3e-3, PSNR 39.3 dB, SSIM 0.984).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdnq_tpu import QuantConfig, quantize_model
from sdnq_tpu.models import (
    CLIP_TINY_CONFIG, UNET_TINY_CONFIG, VAE_TINY_CONFIG,
    init_clip, init_unet, init_vae,
)
from sdnq_tpu.models.text_encoder import clip_encode
from sdnq_tpu.models.unet import unet_forward
from sdnq_tpu.pipeline import sd_generate
from sdnq_tpu.tensor import QTensor, dequantize
from sdnq_tpu.utils.metrics import (
    dynamic_loss_threshold, normalized_mse, psnr, ssim,
)


@pytest.fixture(scope="module")
def sd_pipe():
    ucfg, vcfg, ccfg = UNET_TINY_CONFIG, VAE_TINY_CONFIG, CLIP_TINY_CONFIG
    up = init_unet(jax.random.key(0), ucfg)
    vp = init_vae(jax.random.key(1), vcfg)
    cp = init_clip(jax.random.key(2), ccfg)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, ccfg.vocab_size, (1, 8)))
    emb = clip_encode(cp, ids, ccfg)
    if isinstance(emb, tuple):
        emb = emb[0]
    img_ref = sd_generate(up, vp, emb, jnp.zeros_like(emb), unet_cfg=ucfg,
                          vae_cfg=vcfg, steps=8, height=64, width=64)
    return ucfg, vcfg, up, vp, emb, img_ref


def _per_layer_worst(orig, qp, bits):
    """Worst per-layer normalized MSE across quantized leaves, asserted
    against the reference's 10^(-bits/2) acceptance rule.  ``bits=None``
    uses each leaf's own chosen format width (the dynamic-ladder case,
    where per-layer dtypes differ: quantizer.py:264-398)."""
    flat_o = {jax.tree_util.keystr(p): l
              for p, l in jax.tree_util.tree_flatten_with_path(orig)[0]}
    worst, worst_ratio = 0.0, 0.0
    for p, leaf in jax.tree_util.tree_flatten_with_path(
            qp, is_leaf=lambda l: isinstance(l, QTensor))[0]:
        if not isinstance(leaf, QTensor):
            continue
        w0 = flat_o[jax.tree_util.keystr(p)]
        wd = dequantize(leaf, jnp.float32)
        nm = float(normalized_mse(wd, w0))
        b = bits if bits is not None else leaf.meta.format.num_bits
        worst = max(worst, nm)
        worst_ratio = max(worst_ratio, nm / dynamic_loss_threshold(b))
    assert worst > 0  # something actually quantized
    assert worst_ratio <= 1.0, (worst, worst_ratio)
    return worst


@pytest.mark.parametrize("label,cfgq,bits,gates", [
    ("int8_matmul",
     dict(weights_dtype="int8", use_quantized_matmul=True), 8,
     dict(latent=1e-4, img_nmse=1e-3, psnr=45.0, ssim=0.995)),
    ("uint4_hadamard_svd",
     dict(weights_dtype="uint4", group_size=64, use_hadamard=True,
          use_svd=True), 4,
     dict(latent=1e-2, img_nmse=2e-2, psnr=30.0, ssim=0.93)),
    # dynamic ladder (VERDICT r4 #7): every layer walks up from int4 until
    # its nmse clears the CHOSEN dtype's 10^(-bits/2) rule — the image
    # gates then hold regardless of which mix of dtypes got picked
    # (gates calibrated on this setup: measured img nmse 0.021 — dynamic
    # accepts plain int4 per-layer where uint4_hadamard_svd carries
    # rotation+rank correction, so the image-level noise is ~3x higher
    # while every layer still clears its chosen dtype's rule)
    ("dynamic_from_int4",
     dict(weights_dtype="int4", group_size=64,
          use_dynamic_quantization=True, use_quantized_matmul=True), None,
     dict(latent=2e-2, img_nmse=6e-2, psnr=25.0, ssim=0.88)),
])
def test_image_quality_gate(sd_pipe, label, cfgq, bits, gates):
    ucfg, vcfg, up, vp, emb, img_ref = sd_pipe
    qp, _ = quantize_model(up, QuantConfig(**cfgq),
                           arch="StableDiffusionPipeline")

    # 1. the reference's per-layer acceptance rule at this bit-width
    _per_layer_worst(up, qp, bits)

    # 2. per-step latent error: one UNet eval at a fixed mid-schedule t
    x = jnp.asarray(np.random.default_rng(3)
                    .normal(size=(1, 8, 8, ucfg.in_channels))
                    .astype(np.float32))
    t = jnp.full((1,), 500.0, jnp.float32)
    eps_r = unet_forward(up, x, t, emb, ucfg)
    eps_q = unet_forward(qp, x, t, emb, ucfg)
    lat = float(normalized_mse(eps_q, eps_r))
    assert lat <= gates["latent"], (label, lat)

    # 3. decoded-image metrics through the full fixed-seed pipeline
    img_q = sd_generate(qp, vp, emb, jnp.zeros_like(emb), unet_cfg=ucfg,
                        vae_cfg=vcfg, steps=8, height=64, width=64)
    m_nmse = float(normalized_mse(img_q, img_ref))
    m_psnr = float(psnr(img_q, img_ref))
    m_ssim = float(ssim(img_q, img_ref))
    assert m_nmse <= gates["img_nmse"], (label, m_nmse)
    assert m_psnr >= gates["psnr"], (label, m_psnr)
    assert m_ssim >= gates["ssim"], (label, m_ssim)


def test_metrics_identity():
    """Sanity: identical images are a fixed point of every metric."""
    img = jnp.asarray(np.random.default_rng(0)
                      .normal(size=(1, 16, 16, 3)).astype(np.float32))
    assert float(normalized_mse(img, img)) == 0.0
    assert float(psnr(img, img)) > 100.0
    assert float(ssim(img, img)) > 0.999
