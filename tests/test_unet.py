"""UNet model tests."""

import numpy as np
import jax
import jax.numpy as jnp

from sdnq_tpu import QuantConfig, quantize_model, QTensor
from sdnq_tpu.models import UNET_TINY_CONFIG, init_unet, unet_forward


def _inputs(cfg, b=1, hw=16, ctx_len=8, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, hw, hw, cfg.in_channels))
                    .astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 1000, (b,)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(b, ctx_len, cfg.cross_attention_dim))
                      .astype(np.float32))
    return x, t, ctx


def test_unet_forward_shape():
    cfg = UNET_TINY_CONFIG
    params = init_unet(jax.random.key(0), cfg)
    x, t, ctx = _inputs(cfg)
    out = unet_forward(params, x, t, ctx, cfg)
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())


def test_unet_quantized_close():
    cfg = UNET_TINY_CONFIG
    params = init_unet(jax.random.key(0), cfg)
    x, t, ctx = _inputs(cfg)
    ref = unet_forward(params, x, t, ctx, cfg)
    qp, _ = quantize_model(
        params,
        QuantConfig(weights_dtype="int8", quant_conv=True,
                    dequant_dtype="float32", minimum_allowed_numel=4096,
                    minimum_allowed_channel_size=16),
        arch="SD15UNet")
    n_q = sum(isinstance(l, QTensor) for l in jax.tree_util.tree_leaves(
        qp, is_leaf=lambda x: isinstance(x, QTensor)))
    assert n_q > 5, n_q
    out = unet_forward(qp, x, t, ctx, cfg)
    rel = float(jnp.abs(out - ref).max() / jnp.maximum(jnp.abs(ref).max(),
                                                       1e-6))
    assert rel < 0.15, rel


def test_unet_jit():
    cfg = UNET_TINY_CONFIG
    params = init_unet(jax.random.key(1), cfg)
    x, t, ctx = _inputs(cfg, seed=1)
    out = jax.jit(lambda p, x: unet_forward(p, x, t, ctx, cfg))(params, x)
    assert bool(jnp.isfinite(out).all())


def test_staged_unet_forward_matches_monolithic():
    """make_staged_unet_forward (per-level jits for remote-compile limits)
    must equal the single-jit unet_forward."""
    import numpy as np
    from sdnq_tpu.models import make_staged_unet_forward
    cfg = UNET_TINY_CONFIG
    params = init_unet(jax.random.key(2), cfg)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, cfg.in_channels))
                    .astype(np.float32))
    t = jnp.full((1,), 400.0, jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(1, 8, cfg.cross_attention_dim))
                      .astype(np.float32))
    ref = unet_forward(params, x, t, ctx, cfg)
    staged = make_staged_unet_forward(cfg)(params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(staged), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
