"""Diffusion noise schedulers (pure functions).

The reference has no sampling layer (it quantizes models for diffusers to
drive); serving at pod scale needs one natively (BASELINE north star:
"diffusion denoising batches continuously scheduled across hosts").  Three
schedulers cover the model zoo: DDIM + Euler-ancestral-free (SD1.5/SDXL
epsilon-prediction) and FlowMatch-Euler (Flux/SD3 rectified flow).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["DDIMScheduler", "EulerScheduler", "FlowMatchScheduler"]


def _sd_alphas(num_train_timesteps=1000, beta_start=0.00085,
               beta_end=0.012):
    betas = jnp.linspace(beta_start ** 0.5, beta_end ** 0.5,
                         num_train_timesteps) ** 2
    return jnp.cumprod(1.0 - betas)


@dataclasses.dataclass(frozen=True)
class DDIMScheduler:
    num_train_timesteps: int = 1000

    def timesteps(self, steps: int) -> jax.Array:
        step = self.num_train_timesteps // steps
        return jnp.arange(self.num_train_timesteps - 1, -1, -step)[:steps]

    def step(self, eps, t, t_prev, latents):
        alphas = _sd_alphas(self.num_train_timesteps)
        a_t = alphas[t][..., None, None, None]
        a_prev = jnp.where(t_prev >= 0, alphas[jnp.maximum(t_prev, 0)], 1.0)
        a_prev = a_prev[..., None, None, None]
        x0 = (latents - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev) * eps

    def add_noise(self, x0, noise, t):
        alphas = _sd_alphas(self.num_train_timesteps)
        a = alphas[t][..., None, None, None]
        return jnp.sqrt(a) * x0 + jnp.sqrt(1 - a) * noise


@dataclasses.dataclass(frozen=True)
class EulerScheduler:
    """Karras-style Euler for epsilon-prediction models."""
    num_train_timesteps: int = 1000

    def sigmas(self, steps: int) -> jax.Array:
        alphas = _sd_alphas(self.num_train_timesteps)
        all_sig = jnp.sqrt((1 - alphas) / alphas)
        idx = jnp.linspace(self.num_train_timesteps - 1, 0, steps) \
            .astype(jnp.int32)
        return jnp.concatenate([all_sig[idx], jnp.zeros((1,))])

    def timesteps(self, steps: int) -> jax.Array:
        return jnp.linspace(self.num_train_timesteps - 1, 0, steps) \
            .astype(jnp.int32)

    def scale_input(self, latents, sigma):
        return latents / jnp.sqrt(sigma ** 2 + 1)

    def step(self, eps, sigma, sigma_next, latents):
        d = eps  # derivative in sigma-space for eps-prediction
        return latents + (sigma_next - sigma)[..., None, None, None] * d


@dataclasses.dataclass(frozen=True)
class FlowMatchScheduler:
    """Rectified-flow Euler (Flux/SD3): x_t = (1-t) x0 + t noise; the model
    predicts the velocity v = noise - x0."""
    shift: float = 1.0

    def timesteps(self, steps: int) -> jax.Array:
        t = jnp.linspace(1.0, 1.0 / steps, steps)
        if self.shift != 1.0:
            t = self.shift * t / (1 + (self.shift - 1) * t)
        return t

    def step(self, v, t, t_prev, latents):
        dt = (t_prev - t)
        return latents + dt[..., None, None] * v \
            if latents.ndim == 3 else latents + dt[..., None, None, None] * v

    def add_noise(self, x0, noise, t):
        tb = t.reshape(t.shape + (1,) * (x0.ndim - t.ndim))
        return (1 - tb) * x0 + tb * noise
