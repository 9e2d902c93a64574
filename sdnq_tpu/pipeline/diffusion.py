"""End-to-end text-to-image pipelines over the quantized model zoo.

Covers BASELINE.json config 5 (full pipeline: text encoders + UNet/DiT +
VAE under quantization).  The denoise loop is one jitted lax.fori_loop —
the whole sampler is a single XLA program per (shape, steps) pair.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .schedulers import DDIMScheduler, FlowMatchScheduler
from ..models.unet import UNetConfig, unet_forward
from ..models.dit import DiTConfig, dit_forward, make_rope_freqs
from ..models.vae import VAEConfig, vae_decode

__all__ = ["sd_generate", "flux_generate"]


@partial(jax.jit, static_argnames=("unet_cfg", "vae_cfg", "steps",
                                   "height", "width", "guidance_scale"))
def sd_generate(unet_params, vae_params, text_emb, uncond_emb,
                *, unet_cfg: UNetConfig, vae_cfg: VAEConfig,
                steps: int = 20, height: int = 64, width: int = 64,
                guidance_scale: float = 7.5, seed: int = 0,
                added_cond=None):
    """SD1.5/SDXL sampler: DDIM + classifier-free guidance -> decoded image.

    text_emb/uncond_emb: (B, L, D) encoder states. Latent spatial dims are
    height/8 x width/8."""
    sched = DDIMScheduler()
    b = text_emb.shape[0]
    lat_shape = (b, height // 8, width // 8, unet_cfg.in_channels)
    latents = jax.random.normal(jax.random.key(seed), lat_shape, jnp.float32)
    ts = sched.timesteps(steps)

    def body(i, latents):
        t = jnp.full((b,), ts[i], jnp.int32)
        eps_c = unet_forward(unet_params, latents, t.astype(jnp.float32),
                             text_emb, unet_cfg, added_cond=added_cond)
        eps_u = unet_forward(unet_params, latents, t.astype(jnp.float32),
                             uncond_emb, unet_cfg, added_cond=added_cond)
        eps = eps_u + guidance_scale * (eps_c - eps_u)
        t_prev = jnp.where(i + 1 < steps, ts[jnp.minimum(i + 1, steps - 1)],
                           -1)
        return sched.step(eps.astype(jnp.float32), t,
                          jnp.full((b,), t_prev, jnp.int32), latents)

    latents = jax.lax.fori_loop(0, steps, body, latents)
    return vae_decode(vae_params, latents, vae_cfg)


@partial(jax.jit, static_argnames=("dit_cfg", "vae_cfg", "steps",
                                   "height", "width"))
def flux_generate(dit_params, vae_params, txt, pooled,
                  *, dit_cfg: DiTConfig, vae_cfg: VAEConfig,
                  steps: int = 20, height: int = 64, width: int = 64,
                  guidance: float = 3.5, seed: int = 0):
    """Flux sampler: rectified-flow Euler over packed 2x2 latent patches.

    txt: (B, L, txt_dim) T5 states; pooled: (B, vec_dim) CLIP pooled."""
    sched = FlowMatchScheduler(shift=3.0)
    b = txt.shape[0]
    lh, lw = height // 16, width // 16    # 8x VAE + 2x2 patchify
    n_img = lh * lw
    latents = jax.random.normal(jax.random.key(seed),
                                (b, n_img, dit_cfg.in_channels), jnp.float32)
    ts = sched.timesteps(steps)
    freqs = make_rope_freqs(dit_cfg, txt.shape[1], (lh, lw))
    g = jnp.full((b,), guidance, jnp.float32)

    def body(i, latents):
        t = jnp.full((b,), ts[i], jnp.float32)
        v = dit_forward(dit_params, latents, txt, t, pooled, dit_cfg,
                        guidance=g, freqs=freqs)
        t_prev = jnp.where(i + 1 < steps, ts[jnp.minimum(i + 1, steps - 1)],
                           0.0)
        # flow matching integrates from t=1 (noise) toward t=0 (data)
        return latents + (t_prev - ts[i]) * v.astype(jnp.float32)

    latents = jax.lax.fori_loop(0, steps, body, latents)
    # unpack 2x2 patches -> (B, 2*lh, 2*lw, C/4) latent image
    c = dit_cfg.in_channels // 4
    lat = latents.reshape(b, lh, lw, 2, 2, c)
    lat = lat.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * lh, 2 * lw, c)
    return vae_decode(vae_params, lat, vae_cfg)
