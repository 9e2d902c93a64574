"""DiT model tests: forward shapes, quantized-vs-fp32 closeness, jit."""

import numpy as np
import jax
import jax.numpy as jnp

from sdnq_tpu import QuantConfig, quantize_model, QTensor
from sdnq_tpu.models import (
    FLUX_TINY_CONFIG, dit_forward, init_dit, make_rope_freqs,
)


def _inputs(cfg, b=2, img_hw=(8, 8), txt_len=16, seed=0):
    rng = np.random.default_rng(seed)
    n_img = img_hw[0] * img_hw[1]
    img = jnp.asarray(rng.normal(size=(b, n_img, cfg.in_channels))
                      .astype(np.float32))
    txt = jnp.asarray(rng.normal(size=(b, txt_len, cfg.txt_dim))
                      .astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 1, (b,)).astype(np.float32))
    pooled = jnp.asarray(rng.normal(size=(b, cfg.vec_dim)).astype(np.float32))
    g = jnp.full((b,), 3.5, jnp.float32)
    freqs = make_rope_freqs(cfg, txt_len, img_hw)
    return img, txt, t, pooled, g, freqs


def test_dit_forward_shape():
    cfg = FLUX_TINY_CONFIG
    params = init_dit(jax.random.key(0), cfg)
    img, txt, t, pooled, g, freqs = _inputs(cfg)
    out = dit_forward(params, img, txt, t, pooled, cfg, guidance=g,
                      freqs=freqs)
    assert out.shape == (2, 64, cfg.in_channels)
    assert bool(jnp.isfinite(out).all())


def test_dit_quantized_close_to_fp32():
    cfg = FLUX_TINY_CONFIG
    params = init_dit(jax.random.key(0), cfg)
    img, txt, t, pooled, g, freqs = _inputs(cfg)
    ref = dit_forward(params, img, txt, t, pooled, cfg, guidance=g,
                      freqs=freqs)

    qparams, _ = quantize_model(
        params, QuantConfig(weights_dtype="int8", dequant_dtype="float32"),
        arch="FluxTransformer2DModel")
    n_q = sum(isinstance(l, QTensor) for l in jax.tree_util.tree_leaves(
        qparams, is_leaf=lambda x: isinstance(x, QTensor)))
    assert n_q > 10  # most big linears quantized
    out = dit_forward(qparams, img, txt, t, pooled, cfg, guidance=g,
                      freqs=freqs)
    rel = float(jnp.abs(out - ref).max()
                / jnp.maximum(jnp.abs(ref).max(), 1e-6))
    assert rel < 0.1, rel


def test_dit_skip_keys_respected():
    cfg = FLUX_TINY_CONFIG
    params = init_dit(jax.random.key(1), cfg)
    qparams, qc = quantize_model(
        params, QuantConfig(weights_dtype="int8"),
        arch="FluxTransformer2DModel")
    # x_embedder / proj_out / norm_out must stay unquantized (skip registry)
    assert not isinstance(qparams["x_embedder"]["weight"], QTensor)
    assert not isinstance(qparams["proj_out"]["weight"], QTensor)
    assert not isinstance(qparams["norm_out"]["linear"]["weight"], QTensor)
    # big attention/mlp weights ARE quantized
    assert isinstance(
        qparams["transformer_blocks"][0]["img_attn"]["qkv"]["weight"],
        QTensor)


def test_dit_jit_and_quant_attention():
    cfg = FLUX_TINY_CONFIG
    params = init_dit(jax.random.key(0), cfg)
    img, txt, t, pooled, g, freqs = _inputs(cfg)

    fwd = jax.jit(lambda p, i: dit_forward(
        p, i, txt, t, pooled, cfg, guidance=g, freqs=freqs,
        attn_config={"matmul_dtype": "int8"}))
    out = fwd(params, img)
    assert bool(jnp.isfinite(out).all())


def test_stacked_blocks_match_list():
    from sdnq_tpu.models import stack_dit_blocks
    cfg = FLUX_TINY_CONFIG
    params = init_dit(jax.random.key(0), cfg)
    img, txt, t, pooled, g, freqs = _inputs(cfg)
    ref = dit_forward(params, img, txt, t, pooled, cfg, guidance=g,
                      freqs=freqs)
    stacked = stack_dit_blocks(params)
    out = dit_forward(stacked, img, txt, t, pooled, cfg, guidance=g,
                      freqs=freqs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)


def test_stacked_quantized_blocks():
    from sdnq_tpu.models import stack_dit_blocks
    cfg = FLUX_TINY_CONFIG
    params = init_dit(jax.random.key(0), cfg)
    qp, _ = quantize_model(params, QuantConfig(weights_dtype="int8",
                                               dequant_dtype="float32"),
                           arch="FluxTransformer2DModel")
    img, txt, t, pooled, g, freqs = _inputs(cfg)
    ref = dit_forward(qp, img, txt, t, pooled, cfg, guidance=g, freqs=freqs)
    stacked = stack_dit_blocks(qp)
    out = jax.jit(lambda p, i: dit_forward(p, i, txt, t, pooled, cfg,
                                           guidance=g, freqs=freqs))(
        stacked, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3,
                               rtol=1e-3)


def test_staged_forward_matches_single_jit():
    """make_staged_dit_forward (the tunnel-safe Flux-scale execution mode)
    is numerically identical to the one-jit forward."""
    from sdnq_tpu.models import make_staged_dit_forward, stack_dit_blocks
    cfg = FLUX_TINY_CONFIG
    p = stack_dit_blocks(init_dit(jax.random.key(0), cfg))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, 64, cfg.in_channels))
                      .astype(np.float32))
    txt = jnp.asarray(rng.normal(size=(1, 16, cfg.txt_dim))
                      .astype(np.float32))
    t = jnp.full((1,), 0.5)
    pooled = jnp.ones((1, cfg.vec_dim))
    freqs = make_rope_freqs(cfg, 16, (8, 8))
    ref = dit_forward(p, img, txt, t, pooled, cfg, guidance=t, freqs=freqs)
    staged = make_staged_dit_forward(cfg)(p, img, txt, t, pooled,
                                          guidance=t, freqs=freqs)
    assert float(jnp.abs(ref - staged).max()) < 1e-4


def test_dynamic_quantization_model_level():
    """Dynamic MSE-ladder selection across a whole model records per-layer
    format decisions in the config (reference quantizer.py:382-391)."""
    cfg = FLUX_TINY_CONFIG
    params = init_dit(jax.random.key(2), cfg)
    qcfg = QuantConfig(weights_dtype="int4", use_dynamic_quantization=True,
                       dynamic_loss_threshold=1e-2)
    qp, out_cfg = quantize_model(params, qcfg,
                                 arch="FluxTransformer2DModel")
    n_q = sum(isinstance(l, QTensor) for l in jax.tree_util.tree_leaves(
        qp, is_leaf=lambda x: isinstance(x, QTensor)))
    assert n_q > 5
    # decisions recorded per chosen format
    assert out_cfg.modules_dtype_dict
    recorded = [p for ps in out_cfg.modules_dtype_dict.values() for p in ps]
    assert len(recorded) == n_q
    # every quantized leaf meets the loss threshold
    from sdnq_tpu import quantization_loss, dequantize_model
    img, txt, t, pooled, g, freqs = _inputs(cfg, seed=2)
    out = dit_forward(qp, img, txt, t, pooled, cfg, guidance=g, freqs=freqs)
    assert bool(jnp.isfinite(out).all())


def test_stacked_view_kernel_path_matches_list(monkeypatch):
    """Stacked QTensor VIEWS (layer=i scalar-prefetch indexing into the
    stacked int8 buffer — no per-scan-step weight copy) match the
    unstacked list bit-for-bit under interpret mode."""
    monkeypatch.setenv("SDNQ_TPU_KERNEL_BACKEND", "interpret")
    from sdnq_tpu.models import stack_dit_blocks
    cfg = FLUX_TINY_CONFIG
    params = init_dit(jax.random.key(0), cfg)
    qp, _ = quantize_model(
        params, QuantConfig(weights_dtype="int8",
                            use_quantized_matmul=True,
                            dequant_dtype="float32"),
        arch="FluxTransformer2DModel")
    img, txt, t, pooled, g, freqs = _inputs(cfg)
    # jit BOTH sides: eager-vs-jit f32 op ordering shifts values near int8
    # rounding boundaries of the in-kernel activation quantize, which is
    # amplification noise unrelated to the stacked view under test
    ref = jax.jit(lambda p, i: dit_forward(p, i, txt, t, pooled, cfg,
                                           guidance=g, freqs=freqs))(
        qp, img)
    stacked = stack_dit_blocks(qp)
    out = jax.jit(lambda p, i: dit_forward(p, i, txt, t, pooled, cfg,
                                           guidance=g, freqs=freqs))(
        stacked, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3,
                               rtol=2e-3)
