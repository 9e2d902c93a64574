"""SD/SDXL VAE (AutoencoderKL) decoder + encoder, NHWC.

Completes the full-pipeline config (BASELINE.json config 5: text encoders +
UNet + VAE).  Param names follow diffusers' AutoencoderKL.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..layers import qconv, qlinear
from .common import Params, conv_init, group_norm, silu

__all__ = ["VAEConfig", "VAE_TINY_CONFIG", "SD_VAE_CONFIG", "init_vae",
           "vae_decode", "vae_encode"]


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    latent_channels: int = 4
    base_channels: int = 128
    channel_mults: tuple = (1, 2, 4, 4)
    layers_per_block: int = 2
    out_channels: int = 3
    norm_groups: int = 32
    scaling_factor: float = 0.18215


SD_VAE_CONFIG = VAEConfig()
VAE_TINY_CONFIG = VAEConfig(base_channels=32, channel_mults=(1, 2),
                            layers_per_block=1, norm_groups=8)


def _norm_p(ch, dtype):
    return {"weight": jnp.ones((ch,), dtype), "bias": jnp.zeros((ch,), dtype)}


def _resnet_init(key, cin, cout, dtype):
    ks = jax.random.split(key, 3)
    p = {"norm1": _norm_p(cin, dtype),
         "conv1": conv_init(ks[0], cin, cout, 3, dtype=dtype),
         "norm2": _norm_p(cout, dtype),
         "conv2": conv_init(ks[1], cout, cout, 3, dtype=dtype)}
    if cin != cout:
        p["conv_shortcut"] = conv_init(ks[2], cin, cout, 1, dtype=dtype)
    return p


def _attn_init(key, ch, dtype):
    ks = jax.random.split(key, 4)
    from .common import linear_init
    return {"group_norm": _norm_p(ch, dtype),
            "to_q": linear_init(ks[0], ch, ch, dtype=dtype),
            "to_k": linear_init(ks[1], ch, ch, dtype=dtype),
            "to_v": linear_init(ks[2], ch, ch, dtype=dtype),
            "to_out": linear_init(ks[3], ch, ch, dtype=dtype)}


def init_vae(key, cfg: VAEConfig = VAE_TINY_CONFIG, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 128))
    chs = [cfg.base_channels * m for m in cfg.channel_mults]
    mid_ch = chs[-1]
    dec: Params = {
        "conv_in": conv_init(next(ks), cfg.latent_channels, mid_ch, 3,
                             dtype=dtype),
        "mid_block": {
            "resnets": [_resnet_init(next(ks), mid_ch, mid_ch, dtype),
                        _resnet_init(next(ks), mid_ch, mid_ch, dtype)],
            "attentions": [_attn_init(next(ks), mid_ch, dtype)]},
        "up_blocks": [],
        "conv_norm_out": _norm_p(chs[0], dtype),
        "conv_out": conv_init(next(ks), chs[0], cfg.out_channels, 3,
                              dtype=dtype),
    }
    cin = mid_ch
    for ch in reversed(chs):
        blk = {"resnets": []}
        for _ in range(cfg.layers_per_block + 1):
            blk["resnets"].append(_resnet_init(next(ks), cin, ch, dtype))
            cin = ch
        if ch != chs[0]:
            blk["upsamplers"] = [{
                "conv": conv_init(next(ks), ch, ch, 3, dtype=dtype)}]
        dec["up_blocks"].append(blk)

    enc: Params = {
        "conv_in": conv_init(next(ks), cfg.out_channels, chs[0], 3,
                             dtype=dtype),
        "down_blocks": [],
        "mid_block": {
            "resnets": [_resnet_init(next(ks), mid_ch, mid_ch, dtype),
                        _resnet_init(next(ks), mid_ch, mid_ch, dtype)],
            "attentions": [_attn_init(next(ks), mid_ch, dtype)]},
        "conv_norm_out": _norm_p(mid_ch, dtype),
        "conv_out": conv_init(next(ks), mid_ch, 2 * cfg.latent_channels, 3,
                              dtype=dtype),
    }
    cin = chs[0]
    for i, ch in enumerate(chs):
        blk = {"resnets": []}
        for _ in range(cfg.layers_per_block):
            blk["resnets"].append(_resnet_init(next(ks), cin, ch, dtype))
            cin = ch
        if i < len(chs) - 1:
            blk["downsamplers"] = [{
                "conv": conv_init(next(ks), ch, ch, 3, dtype=dtype)}]
        enc["down_blocks"].append(blk)
    return {"decoder": dec, "encoder": enc}


def _resnet(p, x, groups):
    h = group_norm(x, p["norm1"]["weight"], p["norm1"]["bias"], groups)
    h = qconv(silu(h), p["conv1"]["weight"], p["conv1"].get("bias"),
              padding="SAME")
    h = group_norm(h, p["norm2"]["weight"], p["norm2"]["bias"], groups)
    h = qconv(silu(h), p["conv2"]["weight"], p["conv2"].get("bias"),
              padding="SAME")
    if "conv_shortcut" in p:
        x = qconv(x, p["conv_shortcut"]["weight"],
                  p["conv_shortcut"].get("bias"), padding="SAME")
    return x + h


def _mid_attn(p, x, groups):
    n, h, w, c = x.shape
    xn = group_norm(x, p["group_norm"]["weight"], p["group_norm"]["bias"],
                    groups)
    flat = xn.reshape(n, h * w, c)
    q = qlinear(flat, p["to_q"]["weight"], p["to_q"].get("bias"))
    k = qlinear(flat, p["to_k"]["weight"], p["to_k"].get("bias"))
    v = qlinear(flat, p["to_v"]["weight"], p["to_v"].get("bias"))
    s = jnp.einsum("bnc,bkc->bnk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * (c ** -0.5)
    out = jnp.einsum("bnk,bkc->bnc", jax.nn.softmax(s, -1),
                     v.astype(jnp.float32)).astype(x.dtype)
    out = qlinear(out, p["to_out"]["weight"], p["to_out"].get("bias"))
    return x + out.reshape(n, h, w, c)


def vae_decode(params, z, cfg: VAEConfig):
    """z: (N, h, w, latent_channels) -> image (N, 8h, 8w, 3) in [-1, 1].

    ``post_quant_conv`` (the diffusers AutoencoderKL 1x1 latent conv) is
    applied when present — real SD checkpoints carry it (io/keymaps.py
    load_vae); randomly-initialized trees omit it."""
    p = params["decoder"]
    groups = cfg.norm_groups
    z = z / cfg.scaling_factor
    if "post_quant_conv" in params:
        pq = params["post_quant_conv"]
        z = qconv(z, pq["weight"], pq.get("bias"), padding="SAME")
    h = qconv(z, p["conv_in"]["weight"], p["conv_in"].get("bias"),
              padding="SAME")
    h = _resnet(p["mid_block"]["resnets"][0], h, groups)
    h = _mid_attn(p["mid_block"]["attentions"][0], h, groups)
    h = _resnet(p["mid_block"]["resnets"][1], h, groups)
    for blk in p["up_blocks"]:
        for r in blk["resnets"]:
            h = _resnet(r, h, groups)
        if "upsamplers" in blk:
            n, hh, ww, c = h.shape
            h = jax.image.resize(h, (n, hh * 2, ww * 2, c), "nearest")
            h = qconv(h, blk["upsamplers"][0]["conv"]["weight"],
                      blk["upsamplers"][0]["conv"].get("bias"),
                      padding="SAME")
    h = group_norm(h, p["conv_norm_out"]["weight"], p["conv_norm_out"]["bias"],
                   groups)
    return qconv(silu(h), p["conv_out"]["weight"], p["conv_out"].get("bias"),
                 padding="SAME")


def vae_encode(params, x, cfg: VAEConfig, rng=None):
    """image (N, H, W, 3) -> latent sample (N, H/2^L, W/2^L, C)."""
    p = params["encoder"]
    groups = cfg.norm_groups
    h = qconv(x, p["conv_in"]["weight"], p["conv_in"].get("bias"),
              padding="SAME")
    for blk in p["down_blocks"]:
        for r in blk["resnets"]:
            h = _resnet(r, h, groups)
        if "downsamplers" in blk:
            h = qconv(h, blk["downsamplers"][0]["conv"]["weight"],
                      blk["downsamplers"][0]["conv"].get("bias"),
                      stride=2, padding=((1, 1), (1, 1)))
    h = _resnet(p["mid_block"]["resnets"][0], h, groups)
    h = _mid_attn(p["mid_block"]["attentions"][0], h, groups)
    h = _resnet(p["mid_block"]["resnets"][1], h, groups)
    h = group_norm(h, p["conv_norm_out"]["weight"],
                   p["conv_norm_out"]["bias"], groups)
    moments = qconv(silu(h), p["conv_out"]["weight"],
                    p["conv_out"].get("bias"), padding="SAME")
    if "quant_conv" in params:
        qq = params["quant_conv"]
        moments = qconv(moments, qq["weight"], qq.get("bias"),
                        padding="SAME")
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if rng is not None:
        mean = mean + jnp.exp(0.5 * jnp.clip(logvar, -30, 20)) \
            * jax.random.normal(rng, mean.shape, mean.dtype)
    return mean * cfg.scaling_factor
