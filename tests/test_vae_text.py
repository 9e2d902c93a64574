"""VAE and text-encoder tests."""

import numpy as np
import jax
import jax.numpy as jnp

from sdnq_tpu import QuantConfig, quantize_model
from sdnq_tpu.models import (
    VAE_TINY_CONFIG, init_vae, vae_decode, vae_encode,
    CLIP_TINY_CONFIG, init_clip, clip_encode,
    T5_TINY_CONFIG, init_t5, t5_encode,
)


def test_vae_roundtrip_shapes():
    cfg = VAE_TINY_CONFIG
    params = init_vae(jax.random.key(0), cfg)
    img = jnp.asarray(np.random.default_rng(0)
                      .normal(size=(1, 32, 32, 3)).astype(np.float32))
    z = vae_encode(params, img, cfg)
    assert z.shape == (1, 16, 16, cfg.latent_channels)
    out = vae_decode(params, z, cfg)
    assert out.shape == (1, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())


def test_clip_encode():
    cfg = CLIP_TINY_CONFIG
    params = init_clip(jax.random.key(0), cfg)
    ids = jnp.asarray(np.random.default_rng(0)
                      .integers(0, cfg.vocab_size, (2, 16)))
    h, pooled = clip_encode(params, ids, cfg)
    assert h.shape == (2, 16, cfg.hidden_size)
    assert pooled.shape == (2, cfg.hidden_size)
    assert bool(jnp.isfinite(h).all())


def test_t5_encode_and_quantized():
    cfg = T5_TINY_CONFIG
    params = init_t5(jax.random.key(0), cfg)
    ids = jnp.asarray(np.random.default_rng(1)
                      .integers(0, cfg.vocab_size, (2, 24)))
    h = t5_encode(params, ids, cfg)
    assert h.shape == (2, 24, cfg.hidden_size)
    qp, _ = quantize_model(
        params, QuantConfig(weights_dtype="int8",
                            minimum_allowed_numel=4096,
                            minimum_allowed_channel_size=16,
                            dequant_dtype="float32"))
    hq = t5_encode(qp, ids, cfg)
    rel = float(jnp.abs(hq - h).max() / jnp.maximum(jnp.abs(h).max(), 1e-6))
    assert rel < 0.2, rel
