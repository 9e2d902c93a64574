"""Image/latent quality metrics for the end-to-end accuracy gate.

The reference's only accuracy criterion is the per-layer normalized-MSE
acceptance rule of dynamic quantization
(/root/reference/src/sdnq/quantizer.py:287-288, 367-380:
``mse(dequant, orig)/var(orig) <= 10^(-bits/2)``).  BASELINE.md lifts that
to the model level: generated output must match BF16 within the same
family of thresholds at equal bit-width.  These metrics feed
tests/test_image_quality.py (the gate) and
scripts/benchmark_image_quality.py (the recorded bf16-vs-quant table).

Pure jnp, jit-friendly, NHWC images in any float dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["normalized_mse", "psnr", "ssim", "dynamic_loss_threshold"]


def dynamic_loss_threshold(num_bits: int) -> float:
    """The reference's per-bitwidth acceptance threshold: 10^(-bits/2)
    (quantizer.py:287-288)."""
    return 10.0 ** (-num_bits / 2)


def normalized_mse(a: jax.Array, b: jax.Array) -> jax.Array:
    """mse(a, b) / var(b) — the reference's quantization-loss measure
    (quantizer.py:367-380) applied between two model outputs."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    return jnp.mean((a - b) ** 2) / jnp.maximum(jnp.var(b), 1e-12)


def psnr(a: jax.Array, b: jax.Array, data_range: float | None = None
         ) -> jax.Array:
    """Peak signal-to-noise ratio in dB.  data_range defaults to the
    dynamic range of the reference image b."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if data_range is None:
        data_range = jnp.max(b) - jnp.min(b)
    mse = jnp.mean((a - b) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-20))


def _window_mean(x: jax.Array, win: int) -> jax.Array:
    """Uniform win x win mean filter over the two spatial dims of NHWC."""
    n = float(win * win)
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, win, win, 1), (1, 1, 1, 1), "VALID")
    return s / n


def ssim(a: jax.Array, b: jax.Array, data_range: float | None = None,
         win: int = 7) -> jax.Array:
    """Mean structural similarity (Wang et al. 2004) with a uniform
    window, NHWC inputs, averaged over windows and channels."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if data_range is None:
        data_range = jnp.max(b) - jnp.min(b)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_a = _window_mean(a, win)
    mu_b = _window_mean(b, win)
    var_a = _window_mean(a * a, win) - mu_a ** 2
    var_b = _window_mean(b * b, win) - mu_b ** 2
    cov = _window_mean(a * b, win) - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2)
    return jnp.mean(num / den)
