"""SD1.5 / SDXL UNet, TPU-native (NHWC activations, OIHW stored weights).

BASELINE.json configs 1-2: "SD 1.5 UNet, INT8 weight-only" and "SDXL UNet,
INT8 weights + INT8 quantized matmul".  Functional param-pytree design like
the DiT; parameter names follow diffusers' UNet2DConditionModel so the
skip-key policy and HF mapping apply.

Structure (diffusers UNet2DCondition): conv_in -> down blocks (resnets +
optional transformer blocks, downsample) -> mid (resnet, transformer,
resnet) -> up blocks (skip concat) -> norm/conv_out.  SDXL differs from
SD1.5 by channel widths, transformer depth per level, and the
text-time embedding (add_embedding for pooled text + size conds).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..layers import qconv, qlinear
from .common import (
    Params, attention, conv_init, group_norm, layer_norm, linear_init, silu,
    split_heads, timestep_embedding,
)

__all__ = ["UNetConfig", "SD15_CONFIG", "SDXL_CONFIG", "UNET_TINY_CONFIG",
           "make_staged_unet_forward",
           "init_unet", "unet_forward"]


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: tuple = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # transformer blocks per level (0 = plain resnet level)
    transformer_layers: tuple = (1, 1, 1, 0)
    attention_head_dim: int = 8      # heads = channels // (head_dim*...)? diffusers: heads = ch // head_dim
    cross_attention_dim: int = 768
    addition_embed_dim: int = 0      # SDXL: 2816 (pooled 1280 + size embeds)
    norm_groups: int = 32

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


SD15_CONFIG = UNetConfig()
SDXL_CONFIG = UNetConfig(
    block_out_channels=(320, 640, 1280),
    transformer_layers=(0, 2, 10),
    cross_attention_dim=2048,
    addition_embed_dim=2816,
)
UNET_TINY_CONFIG = UNetConfig(
    block_out_channels=(32, 64), layers_per_block=1,
    transformer_layers=(0, 1), cross_attention_dim=64, norm_groups=8)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _norm_p(ch, dtype):
    return {"weight": jnp.ones((ch,), dtype), "bias": jnp.zeros((ch,), dtype)}


def _resnet_init(key, cin, cout, temb, dtype):
    ks = jax.random.split(key, 4)
    p = {
        "norm1": _norm_p(cin, dtype),
        "conv1": conv_init(ks[0], cin, cout, 3, dtype=dtype),
        "time_emb_proj": linear_init(ks[1], temb, cout, dtype=dtype),
        "norm2": _norm_p(cout, dtype),
        "conv2": conv_init(ks[2], cout, cout, 3, dtype=dtype),
    }
    if cin != cout:
        p["conv_shortcut"] = conv_init(ks[3], cin, cout, 1, dtype=dtype)
    return p


def _xformer_init(key, ch, heads, ctx_dim, dtype):
    ks = iter(jax.random.split(key, 16))
    d = ch
    return {
        "norm1": _norm_p(d, dtype),
        "attn1": {"to_q": linear_init(next(ks), d, d, bias=False, dtype=dtype),
                  "to_k": linear_init(next(ks), d, d, bias=False, dtype=dtype),
                  "to_v": linear_init(next(ks), d, d, bias=False, dtype=dtype),
                  "to_out": linear_init(next(ks), d, d, dtype=dtype)},
        "norm2": _norm_p(d, dtype),
        "attn2": {"to_q": linear_init(next(ks), d, d, bias=False, dtype=dtype),
                  "to_k": linear_init(next(ks), ctx_dim, d, bias=False,
                                      dtype=dtype),
                  "to_v": linear_init(next(ks), ctx_dim, d, bias=False,
                                      dtype=dtype),
                  "to_out": linear_init(next(ks), d, d, dtype=dtype)},
        "norm3": _norm_p(d, dtype),
        "ff": {"proj_in": linear_init(next(ks), d, 8 * d, dtype=dtype),
               "proj_out": linear_init(next(ks), 4 * d, d, dtype=dtype)},
    }


def _spatial_transformer_init(key, ch, heads, depth, ctx_dim, dtype):
    ks = iter(jax.random.split(key, depth + 4))
    return {
        "norm": _norm_p(ch, dtype),
        "proj_in": linear_init(next(ks), ch, ch, dtype=dtype),
        "transformer_blocks": [
            _xformer_init(next(ks), ch, heads, ctx_dim, dtype)
            for _ in range(depth)],
        "proj_out": linear_init(next(ks), ch, ch, dtype=dtype),
    }


def init_unet(key, cfg: UNetConfig = UNET_TINY_CONFIG,
              dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 256))
    chs = cfg.block_out_channels
    temb = cfg.time_embed_dim
    p: Params = {
        "conv_in": conv_init(next(ks), cfg.in_channels, chs[0], 3,
                             dtype=dtype),
        "time_embedding": {
            "linear_1": linear_init(next(ks), chs[0], temb, dtype=dtype),
            "linear_2": linear_init(next(ks), temb, temb, dtype=dtype)},
        "down_blocks": [], "up_blocks": [],
        "conv_norm_out": _norm_p(chs[0], dtype),
        "conv_out": conv_init(next(ks), chs[0], cfg.out_channels, 3,
                              dtype=dtype),
    }
    if cfg.addition_embed_dim:
        p["add_embedding"] = {
            "linear_1": linear_init(next(ks), cfg.addition_embed_dim, temb,
                                    dtype=dtype),
            "linear_2": linear_init(next(ks), temb, temb, dtype=dtype)}

    # down path
    cin = chs[0]
    for lvl, ch in enumerate(chs):
        blk = {"resnets": [], "attentions": []}
        for i in range(cfg.layers_per_block):
            blk["resnets"].append(_resnet_init(next(ks), cin, ch, temb,
                                               dtype))
            cin = ch
            if cfg.transformer_layers[lvl]:
                heads = max(1, ch // 64)
                blk["attentions"].append(_spatial_transformer_init(
                    next(ks), ch, heads, cfg.transformer_layers[lvl],
                    cfg.cross_attention_dim, dtype))
        if lvl < len(chs) - 1:
            blk["downsamplers"] = [{
                "conv": conv_init(next(ks), ch, ch, 3, dtype=dtype)}]
        p["down_blocks"].append(blk)

    # mid
    ch = chs[-1]
    heads = max(1, ch // 64)
    p["mid_block"] = {
        "resnets": [_resnet_init(next(ks), ch, ch, temb, dtype),
                    _resnet_init(next(ks), ch, ch, temb, dtype)],
        "attentions": [_spatial_transformer_init(
            next(ks), ch, heads, max(1, cfg.transformer_layers[-1] or 1),
            cfg.cross_attention_dim, dtype)],
    }

    # up path (reverse, with skip concat) — simulate the down-path skip
    # stack to get the concat widths exactly right
    skip_stack = [chs[0]]                     # conv_in output
    for lvl, ch in enumerate(chs):
        for _ in range(cfg.layers_per_block):
            skip_stack.append(ch)
        if lvl < len(chs) - 1:
            skip_stack.append(ch)             # downsampler output
    up_blocks = []
    cin_up = chs[-1]
    for lvl, ch in reversed(list(enumerate(chs))):
        blk = {"resnets": [], "attentions": []}
        for _ in range(cfg.layers_per_block + 1):
            skip_ch = skip_stack.pop()
            blk["resnets"].append(_resnet_init(
                next(ks), cin_up + skip_ch, ch, temb, dtype))
            cin_up = ch
            if cfg.transformer_layers[lvl]:
                heads = max(1, ch // 64)
                blk["attentions"].append(_spatial_transformer_init(
                    next(ks), ch, heads, cfg.transformer_layers[lvl],
                    cfg.cross_attention_dim, dtype))
        if lvl > 0:
            blk["upsamplers"] = [{
                "conv": conv_init(next(ks), ch, ch, 3, dtype=dtype)}]
        up_blocks.append(blk)
    p["up_blocks"] = up_blocks
    return p


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _resnet(p, x, temb, groups):
    h = group_norm(x, p["norm1"]["weight"], p["norm1"]["bias"], groups)
    h = qconv(silu(h), p["conv1"]["weight"], p["conv1"].get("bias"),
              padding="SAME")
    t = qlinear(silu(temb), p["time_emb_proj"]["weight"],
                p["time_emb_proj"].get("bias"))
    h = h + t[:, None, None, :]
    h = group_norm(h, p["norm2"]["weight"], p["norm2"]["bias"], groups)
    h = qconv(silu(h), p["conv2"]["weight"], p["conv2"].get("bias"),
              padding="SAME")
    if "conv_shortcut" in p:
        x = qconv(x, p["conv_shortcut"]["weight"],
                  p["conv_shortcut"].get("bias"), padding="SAME")
    return x + h


def _basic_transformer(p, x, ctx, heads, attn_cfg):
    def attn(ap, xq, kv):
        q = split_heads(qlinear(xq, ap["to_q"]["weight"]), heads)
        k = split_heads(qlinear(kv, ap["to_k"]["weight"]), heads)
        v = split_heads(qlinear(kv, ap["to_v"]["weight"]), heads)
        out = attention(q, k, v, attn_cfg)
        return qlinear(out, ap["to_out"]["weight"], ap["to_out"].get("bias"))

    x = x + attn(p["attn1"], layer_norm(x, p["norm1"]["weight"],
                                        p["norm1"]["bias"]),
                 layer_norm(x, p["norm1"]["weight"], p["norm1"]["bias"]))
    xn = layer_norm(x, p["norm2"]["weight"], p["norm2"]["bias"])
    x = x + attn(p["attn2"], xn, ctx)
    xn = layer_norm(x, p["norm3"]["weight"], p["norm3"]["bias"])
    # geglu
    h = qlinear(xn, p["ff"]["proj_in"]["weight"], p["ff"]["proj_in"].get("bias"))
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.gelu(b, approximate=True)
    return x + qlinear(h, p["ff"]["proj_out"]["weight"],
                       p["ff"]["proj_out"].get("bias"))


def _spatial_transformer(p, x, ctx, groups, attn_cfg):
    n, h, w, c = x.shape
    heads = max(1, c // 64)
    res = x
    xn = group_norm(x, p["norm"]["weight"], p["norm"]["bias"], groups)
    t = qlinear(xn.reshape(n, h * w, c), p["proj_in"]["weight"],
                p["proj_in"].get("bias"))
    for blk in p["transformer_blocks"]:
        t = _basic_transformer(blk, t, ctx, heads, attn_cfg)
    t = qlinear(t, p["proj_out"]["weight"], p["proj_out"].get("bias"))
    return res + t.reshape(n, h, w, c)


def unet_forward(params: Params, x: jax.Array, timesteps: jax.Array,
                 encoder_hidden_states: jax.Array,
                 cfg: UNetConfig,
                 added_cond: jax.Array | None = None,
                 attn_config: dict | None = None) -> jax.Array:
    """x: (N, H, W, C_in) NHWC latents; encoder_hidden_states: (N, L, D)."""
    groups = cfg.norm_groups
    temb = timestep_embedding(timesteps, cfg.block_out_channels[0])
    temb = qlinear(temb, params["time_embedding"]["linear_1"]["weight"],
                   params["time_embedding"]["linear_1"].get("bias"))
    temb = qlinear(silu(temb),
                   params["time_embedding"]["linear_2"]["weight"],
                   params["time_embedding"]["linear_2"].get("bias"))
    if cfg.addition_embed_dim and added_cond is not None:
        a = qlinear(added_cond, params["add_embedding"]["linear_1"]["weight"],
                    params["add_embedding"]["linear_1"].get("bias"))
        a = qlinear(silu(a), params["add_embedding"]["linear_2"]["weight"],
                    params["add_embedding"]["linear_2"].get("bias"))
        temb = temb + a

    ctx = encoder_hidden_states
    h = qconv(x, params["conv_in"]["weight"], params["conv_in"].get("bias"),
              padding="SAME")
    skips = [h]
    for lvl, blk in enumerate(params["down_blocks"]):
        attn_i = 0
        for res_p in blk["resnets"]:
            h = _resnet(res_p, h, temb, groups)
            if blk["attentions"]:
                h = _spatial_transformer(blk["attentions"][attn_i], h, ctx,
                                         groups, attn_config)
                attn_i += 1
            skips.append(h)
        if "downsamplers" in blk:
            h = qconv(h, blk["downsamplers"][0]["conv"]["weight"],
                      blk["downsamplers"][0]["conv"].get("bias"),
                      stride=2, padding=((1, 1), (1, 1)))
            skips.append(h)

    mid = params["mid_block"]
    h = _resnet(mid["resnets"][0], h, temb, groups)
    h = _spatial_transformer(mid["attentions"][0], h, ctx, groups,
                             attn_config)
    h = _resnet(mid["resnets"][1], h, temb, groups)

    for blk in params["up_blocks"]:
        attn_i = 0
        for res_p in blk["resnets"]:
            skip = skips.pop()
            h = jnp.concatenate([h, skip], axis=-1)
            h = _resnet(res_p, h, temb, groups)
            if blk["attentions"]:
                h = _spatial_transformer(blk["attentions"][attn_i], h, ctx,
                                         groups, attn_config)
                attn_i += 1
        if "upsamplers" in blk:
            n, hh, ww, c = h.shape
            h = jax.image.resize(h, (n, hh * 2, ww * 2, c), "nearest")
            h = qconv(h, blk["upsamplers"][0]["conv"]["weight"],
                      blk["upsamplers"][0]["conv"].get("bias"),
                      padding="SAME")

    h = group_norm(h, params["conv_norm_out"]["weight"],
                   params["conv_norm_out"]["bias"], groups)
    return qconv(silu(h), params["conv_out"]["weight"],
                 params["conv_out"].get("bias"), padding="SAME")


def make_staged_unet_forward(cfg: UNetConfig,
                             attn_config: dict | None = None,
                             sync: bool = False):
    """UNet forward as separately-jitted stages (embed, one per down
    level, mid, one per up level, head) instead of one whole-model jit.

    SDXL-scale single jits exceed remote-compile session limits on
    tunneled TPU setups (same constraint as models/dit.py
    make_staged_dit_forward); per-level programs compile independently at
    the cost of ~9 dispatches per step.  Skip activations cross stage
    boundaries as an explicit tuple.

    sync=True blocks + logs after every stage — the async-dispatch
    debugging aid for attributing device faults to the right stage."""
    groups = cfg.norm_groups
    acfg = attn_config

    import os
    # cap async queue depth: the tunneled TPU worker crashes when all 9
    # stage programs of an SDXL step are enqueued back-to-back (STATUS.md
    # round-4 notes); a light block every N stages keeps at most N big
    # programs in flight at ~1-3 ms/block tunnel cost each
    sync_every = int(os.environ.get("SDNQ_TPU_STAGE_SYNC_EVERY", "0") or 0)
    stage_idx = [0]

    def _sync(v, name):
        if sync:
            jax.block_until_ready(v)
            import time
            from ..utils import log
            log.info("staged-unet stage ok: %s (t=%.1fs)", name,
                     time.perf_counter())
        elif sync_every:
            stage_idx[0] += 1
            if stage_idx[0] % sync_every == 0:
                jax.block_until_ready(v)
        return v

    @jax.jit
    def embed(p, x, timesteps, added_cond):
        temb = timestep_embedding(timesteps, cfg.block_out_channels[0])
        temb = qlinear(temb, p["time_embedding"]["linear_1"]["weight"],
                       p["time_embedding"]["linear_1"].get("bias"))
        temb = qlinear(silu(temb),
                       p["time_embedding"]["linear_2"]["weight"],
                       p["time_embedding"]["linear_2"].get("bias"))
        if cfg.addition_embed_dim and added_cond is not None:
            a = qlinear(added_cond, p["add_embedding"]["linear_1"]["weight"],
                        p["add_embedding"]["linear_1"].get("bias"))
            a = qlinear(silu(a), p["add_embedding"]["linear_2"]["weight"],
                        p["add_embedding"]["linear_2"].get("bias"))
            temb = temb + a
        h = qconv(x, p["conv_in"]["weight"], p["conv_in"].get("bias"),
                  padding="SAME")
        return h, temb

    @jax.jit
    def down_level(blk, h, temb, ctx):
        new_skips = []
        attn_i = 0
        for res_p in blk["resnets"]:
            h = _resnet(res_p, h, temb, groups)
            if blk["attentions"]:
                h = _spatial_transformer(blk["attentions"][attn_i], h, ctx,
                                         groups, acfg)
                attn_i += 1
            new_skips.append(h)
        if "downsamplers" in blk:
            h = qconv(h, blk["downsamplers"][0]["conv"]["weight"],
                      blk["downsamplers"][0]["conv"].get("bias"),
                      stride=2, padding=((1, 1), (1, 1)))
            new_skips.append(h)
        return h, tuple(new_skips)

    @jax.jit
    def mid(p, h, temb, ctx):
        h = _resnet(p["resnets"][0], h, temb, groups)
        h = _spatial_transformer(p["attentions"][0], h, ctx, groups, acfg)
        return _resnet(p["resnets"][1], h, temb, groups)

    @jax.jit
    def up_level(blk, h, temb, ctx, lvl_skips):
        skips = list(lvl_skips)
        attn_i = 0
        for res_p in blk["resnets"]:
            h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = _resnet(res_p, h, temb, groups)
            if blk["attentions"]:
                h = _spatial_transformer(blk["attentions"][attn_i], h, ctx,
                                         groups, acfg)
                attn_i += 1
        if "upsamplers" in blk:
            n, hh, ww, c = h.shape
            h = jax.image.resize(h, (n, hh * 2, ww * 2, c), "nearest")
            h = qconv(h, blk["upsamplers"][0]["conv"]["weight"],
                      blk["upsamplers"][0]["conv"].get("bias"),
                      padding="SAME")
        return h

    @jax.jit
    def head(p, h):
        h = group_norm(h, p["conv_norm_out"]["weight"],
                       p["conv_norm_out"]["bias"], groups)
        return qconv(silu(h), p["conv_out"]["weight"],
                     p["conv_out"].get("bias"), padding="SAME")

    def forward(params, x, timesteps, encoder_hidden_states,
                added_cond=None):
        ctx = encoder_hidden_states
        p_embed = {"time_embedding": params["time_embedding"],
                   "conv_in": params["conv_in"]}
        if "add_embedding" in params:
            p_embed["add_embedding"] = params["add_embedding"]
        h, temb = embed(p_embed, x, timesteps, added_cond)
        _sync(h, "embed")
        skips = [h]
        for i, blk in enumerate(params["down_blocks"]):
            h, new = down_level(blk, h, temb, ctx)
            _sync(h, f"down{i}")
            skips.extend(new)
        h = mid(params["mid_block"], h, temb, ctx)
        _sync(h, "mid")
        for i, blk in enumerate(params["up_blocks"]):
            n = len(blk["resnets"])
            lvl_skips, skips = tuple(skips[-n:]), skips[:-n]
            h = up_level(blk, h, temb, ctx, lvl_skips)
            _sync(h, f"up{i}")
        import os
        if os.environ.get("SDNQ_TPU_CLEAR_CACHES_BEFORE_HEAD"):
            # diagnostic: drop references to every staged executable so the
            # worker can free program memory before compiling head
            from ..utils import log
            log.warning("SDNQ_TPU_CLEAR_CACHES_BEFORE_HEAD active: "
                        "clearing jit caches before the head stage")
            import gc
            jax.clear_caches()
            gc.collect()
        if os.environ.get("SDNQ_TPU_SKIP_HEAD"):
            # diagnostic: isolate the head stage (see STATUS.md).  The
            # returned tensor has the PRE-head channel count/values — loud
            # warning so a leaked env var cannot silently corrupt a run.
            from ..utils import log
            log.warning("SDNQ_TPU_SKIP_HEAD active: returning pre-head "
                        "activations (wrong channels) — diagnostic only")
            return h
        p_head = {"conv_norm_out": params["conv_norm_out"],
                  "conv_out": params["conv_out"]}
        return head(p_head, h)

    def warm(params, x, timesteps, encoder_hidden_states, added_cond=None):
        """AOT-compile every stage into the persistent compile cache from
        ShapeDtypeStruct params — ZERO bytes transferred to the device.

        The tunnel session budget is consumed by transfer + compile time
        after first device contact (STATUS.md round-4/5 notes: a 3-minute
        2.9 GB int8-tree transfer followed by the cold down-level compile
        reproducibly kills the worker).  Splitting the work lets a warm-up
        process do all the cold compiles with no transfer, and the timed
        process start from cache hits (cross-process reuse measured
        76.5 s -> 14.8 s in round 4)."""
        abstract = jax.tree_util.tree_map(
            lambda l: (l if isinstance(l, jax.ShapeDtypeStruct)
                       else jax.ShapeDtypeStruct(
                           jnp.shape(l), jnp.result_type(l))),
            (params, x, timesteps, encoder_hidden_states, added_cond))
        params, x, timesteps, ctx, added_cond = abstract
        p_embed = {"time_embedding": params["time_embedding"],
                   "conv_in": params["conv_in"]}
        if "add_embedding" in params:
            p_embed["add_embedding"] = params["add_embedding"]
        embed.lower(p_embed, x, timesteps, added_cond).compile()
        h, temb = jax.eval_shape(embed, p_embed, x, timesteps, added_cond)
        skips = [h]
        for blk in params["down_blocks"]:
            down_level.lower(blk, h, temb, ctx).compile()
            h, new = jax.eval_shape(down_level, blk, h, temb, ctx)
            skips.extend(new)
        mid.lower(params["mid_block"], h, temb, ctx).compile()
        h = jax.eval_shape(mid, params["mid_block"], h, temb, ctx)
        for blk in params["up_blocks"]:
            n = len(blk["resnets"])
            lvl_skips, skips = tuple(skips[-n:]), skips[:-n]
            up_level.lower(blk, h, temb, ctx, lvl_skips).compile()
            h = jax.eval_shape(up_level, blk, h, temb, ctx, lvl_skips)
        p_head = {"conv_norm_out": params["conv_norm_out"],
                  "conv_out": params["conv_out"]}
        head.lower(p_head, h).compile()
        return jax.eval_shape(head, p_head, h)

    forward.warm = warm
    return forward
