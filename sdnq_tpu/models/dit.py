"""Flux-style multimodal diffusion transformer (MMDiT), TPU-native.

The flagship model family for the quantized engine (BASELINE.json configs
3-4: PixArt/SD3 DiT, Flux.1).  Architecture follows the public Flux design:
double-stream blocks with separate image/text QKV + joint attention, then
single-stream blocks on the fused sequence, AdaLN-Zero modulation from
(timestep ⊕ guidance ⊕ pooled-text), RoPE over (id, h, w) axes.

The reference never ships model code (it quantizes HF models in place);
here models are pure functions over param pytrees so the same forward
serves fp32/bf16 and any QTensor mix, under jit/pjit.  Param names follow
diffusers' FluxTransformer2DModel so policy.MODEL_SKIP_KEYS
["FluxTransformer2DModel"] applies and HF checkpoints can be mapped.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..layers import qlinear
from .common import (
    Params, apply_rope, attention, layer_norm, linear_init, rms_norm, rope,
    silu, split_heads, timestep_embedding,
)

__all__ = ["DiTConfig", "init_dit", "dit_forward",
           "make_staged_dit_forward", "FLUX_DEV_CONFIG",
           "FLUX_TINY_CONFIG"]


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    in_channels: int = 64          # packed 2x2 latent patches
    hidden_size: int = 3072
    num_heads: int = 24
    depth_double: int = 19
    depth_single: int = 38
    txt_dim: int = 4096            # T5 features
    vec_dim: int = 768             # CLIP pooled
    mlp_ratio: float = 4.0
    guidance_embed: bool = True
    axes_dims: tuple = (16, 56, 56)  # rope dims per (id, h, w) axis
    theta: float = 10000.0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


FLUX_DEV_CONFIG = DiTConfig()
FLUX_TINY_CONFIG = DiTConfig(
    in_channels=16, hidden_size=256, num_heads=4, depth_double=2,
    depth_single=4, txt_dim=64, vec_dim=32, axes_dims=(16, 24, 24))


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _mlp_init(key, dim, hidden, dtype):
    k1, k2 = jax.random.split(key)
    return {"fc1": linear_init(k1, dim, hidden, dtype=dtype),
            "fc2": linear_init(k2, hidden, dim, dtype=dtype)}


def init_dit(key, cfg: DiTConfig = FLUX_TINY_CONFIG,
             dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 64 + 8 * (cfg.depth_double
                                                + cfg.depth_single)))
    d = cfg.hidden_size
    mlp_hidden = int(d * cfg.mlp_ratio)
    p: Params = {
        "x_embedder": linear_init(next(keys), cfg.in_channels, d, dtype=dtype),
        "context_embedder": linear_init(next(keys), cfg.txt_dim, d,
                                        dtype=dtype),
        "time_in": _mlp_init(next(keys), 256, d, dtype) | {},
        "vector_in": _mlp_init(next(keys), cfg.vec_dim, d, dtype),
        "norm_out": {
            "linear": linear_init(next(keys), d, 2 * d, dtype=dtype)},
        "proj_out": linear_init(next(keys), d, cfg.in_channels, dtype=dtype),
        "transformer_blocks": [],
        "single_transformer_blocks": [],
    }
    # time_in maps 256-dim sincos -> d via 2-layer mlp: fix fc1 in_dim
    p["time_in"] = {"fc1": linear_init(next(keys), 256, d, dtype=dtype),
                    "fc2": linear_init(next(keys), d, d, dtype=dtype)}
    p["vector_in"] = {"fc1": linear_init(next(keys), cfg.vec_dim, d,
                                         dtype=dtype),
                      "fc2": linear_init(next(keys), d, d, dtype=dtype)}
    if cfg.guidance_embed:
        p["guidance_in"] = {
            "fc1": linear_init(next(keys), 256, d, dtype=dtype),
            "fc2": linear_init(next(keys), d, d, dtype=dtype)}

    for _ in range(cfg.depth_double):
        blk = {
            "img_mod": {"linear": linear_init(next(keys), d, 6 * d,
                                              dtype=dtype)},
            "txt_mod": {"linear": linear_init(next(keys), d, 6 * d,
                                              dtype=dtype)},
            "img_attn": {
                "qkv": linear_init(next(keys), d, 3 * d, dtype=dtype),
                "norm_q": {"weight": jnp.ones((cfg.head_dim,), dtype)},
                "norm_k": {"weight": jnp.ones((cfg.head_dim,), dtype)},
                "proj": linear_init(next(keys), d, d, dtype=dtype)},
            "txt_attn": {
                "qkv": linear_init(next(keys), d, 3 * d, dtype=dtype),
                "norm_q": {"weight": jnp.ones((cfg.head_dim,), dtype)},
                "norm_k": {"weight": jnp.ones((cfg.head_dim,), dtype)},
                "proj": linear_init(next(keys), d, d, dtype=dtype)},
            "img_mlp": _mlp_init(next(keys), d, mlp_hidden, dtype),
            "txt_mlp": _mlp_init(next(keys), d, mlp_hidden, dtype),
        }
        p["transformer_blocks"].append(blk)

    for _ in range(cfg.depth_single):
        blk = {
            "norm": {"linear": linear_init(next(keys), d, 3 * d,
                                           dtype=dtype)},
            # fused qkv + mlp-in projection
            "linear1": linear_init(next(keys), d, 3 * d + mlp_hidden,
                                   dtype=dtype),
            "linear2": linear_init(next(keys), d + mlp_hidden, d,
                                   dtype=dtype),
            "norm_q": {"weight": jnp.ones((cfg.head_dim,), dtype)},
            "norm_k": {"weight": jnp.ones((cfg.head_dim,), dtype)},
        }
        p["single_transformer_blocks"].append(blk)
    return p


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _index_stacked(tree, i):
    """Per-layer view of a stack_dit_blocks()-stacked block tree.

    QTensor leaves become stacked VIEWS (layer=i): the int8 matmul kernel
    reads layer i's tiles straight out of the stacked HBM buffer via
    scalar-prefetch indexing, so the scan never copies weight bytes (XLA
    materializes any dynamic-slice feeding a custom call — ~1.1 ms/block
    at Flux width).  Small plain leaves (biases, norm weights, modulation
    tables) slice normally."""
    from ..tensor import QTensor
    return jax.tree_util.tree_map(
        lambda leaf: (dataclasses.replace(leaf, layer=i)
                      if isinstance(leaf, QTensor) else leaf[i]),
        tree, is_leaf=lambda l: isinstance(l, QTensor))


def _stack_len(tree) -> int:
    return jax.tree_util.tree_leaves(tree)[0].shape[0]


def _modulation(params, vec, n_chunks):
    out = qlinear(silu(vec), params["linear"]["weight"],
                  params["linear"].get("bias"))
    return jnp.split(out[:, None, :], n_chunks, axis=-1)


def _qk_norm(q, k, nq, nk):
    return rms_norm(q, nq["weight"]), rms_norm(k, nk["weight"])


def _double_block(blk, img, txt, vec, freqs, cfg, attn_cfg):
    h = cfg.num_heads
    i_shift1, i_scale1, i_gate1, i_shift2, i_scale2, i_gate2 = \
        _modulation(blk["img_mod"], vec, 6)
    t_shift1, t_scale1, t_gate1, t_shift2, t_scale2, t_gate2 = \
        _modulation(blk["txt_mod"], vec, 6)

    img_n = layer_norm(img) * (1 + i_scale1) + i_shift1
    txt_n = layer_norm(txt) * (1 + t_scale1) + t_shift1

    img_qkv = qlinear(img_n, blk["img_attn"]["qkv"]["weight"],
                      blk["img_attn"]["qkv"].get("bias"))
    txt_qkv = qlinear(txt_n, blk["txt_attn"]["qkv"]["weight"],
                      blk["txt_attn"]["qkv"].get("bias"))
    iq, ik, iv = (split_heads(t, h) for t in jnp.split(img_qkv, 3, -1))
    tq, tk, tv = (split_heads(t, h) for t in jnp.split(txt_qkv, 3, -1))
    iq, ik = _qk_norm(iq, ik, blk["img_attn"]["norm_q"],
                      blk["img_attn"]["norm_k"])
    tq, tk = _qk_norm(tq, tk, blk["txt_attn"]["norm_q"],
                      blk["txt_attn"]["norm_k"])

    # joint attention over [txt ; img]
    q = jnp.concatenate([tq, iq], axis=2)
    k = jnp.concatenate([tk, ik], axis=2)
    v = jnp.concatenate([tv, iv], axis=2)
    q = apply_rope(q, freqs)
    k = apply_rope(k, freqs)
    out = attention(q, k, v, attn_cfg)
    txt_len = txt.shape[1]
    txt_attn, img_attn = out[:, :txt_len], out[:, txt_len:]

    img = img + i_gate1 * qlinear(img_attn, blk["img_attn"]["proj"]["weight"],
                                  blk["img_attn"]["proj"].get("bias"))
    txt = txt + t_gate1 * qlinear(txt_attn, blk["txt_attn"]["proj"]["weight"],
                                  blk["txt_attn"]["proj"].get("bias"))

    img_n2 = layer_norm(img) * (1 + i_scale2) + i_shift2
    img = img + i_gate2 * _gelu_mlp(blk["img_mlp"], img_n2)
    txt_n2 = layer_norm(txt) * (1 + t_scale2) + t_shift2
    txt = txt + t_gate2 * _gelu_mlp(blk["txt_mlp"], txt_n2)
    return img, txt


def _gelu_mlp(mlp, x):
    hdn = qlinear(x, mlp["fc1"]["weight"], mlp["fc1"].get("bias"))
    hdn = jax.nn.gelu(hdn, approximate=True)
    return qlinear(hdn, mlp["fc2"]["weight"], mlp["fc2"].get("bias"))


def _single_block(blk, x, vec, freqs, cfg, attn_cfg):
    h = cfg.num_heads
    d = cfg.hidden_size
    mlp_hidden = int(d * cfg.mlp_ratio)
    shift, scale, gate = _modulation(blk["norm"], vec, 3)
    xn = layer_norm(x) * (1 + scale) + shift
    proj = qlinear(xn, blk["linear1"]["weight"], blk["linear1"].get("bias"))
    qkv, mlp_h = proj[..., :3 * d], proj[..., 3 * d:]
    q, k, v = (split_heads(t, h) for t in jnp.split(qkv, 3, -1))
    q, k = _qk_norm(q, k, blk["norm_q"], blk["norm_k"])
    q = apply_rope(q, freqs)
    k = apply_rope(k, freqs)
    attn_out = attention(q, k, v, attn_cfg)
    act = jax.nn.gelu(mlp_h, approximate=True)
    out = qlinear(jnp.concatenate([attn_out, act], -1),
                  blk["linear2"]["weight"], blk["linear2"].get("bias"))
    return x + gate * out


def make_rope_freqs(cfg: DiTConfig, txt_len: int, img_hw: tuple[int, int],
                    batch: int = 1):
    """Position ids: txt tokens at (0,0,0..L); img tokens at (0, y, x)."""
    h, w = img_hw
    txt_ids = jnp.zeros((txt_len, 3), jnp.int32)
    txt_ids = txt_ids.at[:, 0].set(jnp.arange(txt_len))
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    img_ids = jnp.stack(
        [jnp.zeros_like(ys), ys, xs], axis=-1).reshape(-1, 3)
    ids = jnp.concatenate([txt_ids, img_ids], axis=0)  # (L+HW, 3)
    tables = [rope(ids[:, i], cfg.axes_dims[i], cfg.theta)
              for i in range(3)]
    freqs = jnp.concatenate(tables, axis=-3)  # (N, D/2, 2, 2)
    return freqs[None, None]  # (1, 1, N, D/2, 2, 2)


def dit_forward(params: Params, img: jax.Array, txt: jax.Array,
                timesteps: jax.Array, pooled: jax.Array,
                cfg: DiTConfig, guidance: jax.Array | None = None,
                freqs: jax.Array | None = None,
                attn_config: dict | None = None) -> jax.Array:
    """img: (B, N_img, in_channels) packed latent patches; txt: (B, L,
    txt_dim); timesteps: (B,) in [0,1]; pooled: (B, vec_dim)."""
    img = qlinear(img, params["x_embedder"]["weight"],
                  params["x_embedder"].get("bias"))
    txt = qlinear(txt, params["context_embedder"]["weight"],
                  params["context_embedder"].get("bias"))

    vec = _vec_mlp(params["time_in"], timestep_embedding(timesteps * 1000.0,
                                                         256))
    if cfg.guidance_embed and guidance is not None:
        vec = vec + _vec_mlp(params["guidance_in"],
                             timestep_embedding(guidance * 1000.0, 256))
    vec = vec + _vec_mlp(params["vector_in"], pooled)

    vec = vec.astype(img.dtype)  # keep block dtype stable (scan carry)

    if freqs is None:
        n_img = img.shape[1]
        side = int(round(n_img ** 0.5))
        freqs = make_rope_freqs(cfg, txt.shape[1], (side, n_img // side))

    tb = params["transformer_blocks"]
    if isinstance(tb, list):
        for blk in tb:
            img, txt = _double_block(blk, img, txt, vec, freqs, cfg,
                                     attn_config)
    else:  # stacked (stack_dit_blocks): scan over LAYER INDEX -> one
        # traced block; weights stay in the closed-over stacked buffers
        # (QTensor stacked views alias into the matmul kernels; see
        # _index_stacked)
        if isinstance(tb, dict) and "first" in tb:
            img, txt = _double_block(tb["first"], img, txt, vec, freqs,
                                     cfg, attn_config)
            tb = tb["rest"]

        def dbody(carry, i):
            img, txt = carry
            return _double_block(_index_stacked(tb, i), img, txt, vec,
                                 freqs, cfg, attn_config), None

        (img, txt), _ = jax.lax.scan(dbody, (img, txt),
                                     jnp.arange(_stack_len(tb)))

    x = jnp.concatenate([txt, img], axis=1)

    sb = params["single_transformer_blocks"]
    if isinstance(sb, list):
        for blk in sb:
            x = _single_block(blk, x, vec, freqs, cfg, attn_config)
    else:
        if isinstance(sb, dict) and "first" in sb:
            x = _single_block(sb["first"], x, vec, freqs, cfg, attn_config)
            sb = sb["rest"]

        def sbody(x, i):
            return _single_block(_index_stacked(sb, i), x, vec, freqs,
                                 cfg, attn_config), None

        x, _ = jax.lax.scan(sbody, x, jnp.arange(_stack_len(sb)))
    img = x[:, txt.shape[1]:]

    shift, scale = _modulation(params["norm_out"], vec, 2)
    img = layer_norm(img) * (1 + scale) + shift
    return qlinear(img, params["proj_out"]["weight"],
                   params["proj_out"].get("bias"))


def _vec_mlp(p, x):
    h = qlinear(x, p["fc1"]["weight"], p["fc1"].get("bias"))
    return qlinear(silu(h), p["fc2"]["weight"], p["fc2"].get("bias"))


def make_staged_dit_forward(cfg: DiTConfig, attn_config: dict | None = None):
    """Flux-scale forward as FOUR separately-jitted stages (embed, double
    scan, single scan, head) instead of one whole-model jit.

    Whole-model jits of Flux-sized configs exceed remote-compile session
    limits on tunneled TPU setups; four smaller programs compile
    independently (and cache independently), at the cost of ~4 dispatches
    per step — negligible against a Flux-sized step time.  Params must be
    stack_dit_blocks()-stacked so each scan stage traces one block."""
    acfg = attn_config

    @jax.jit
    def embed(p_embed, img, txt, timesteps, pooled, guidance):
        img = qlinear(img, p_embed["x_embedder"]["weight"],
                      p_embed["x_embedder"].get("bias"))
        txt = qlinear(txt, p_embed["context_embedder"]["weight"],
                      p_embed["context_embedder"].get("bias"))
        vec = _vec_mlp(p_embed["time_in"],
                       timestep_embedding(timesteps * 1000.0, 256))
        if cfg.guidance_embed and guidance is not None:
            vec = vec + _vec_mlp(p_embed["guidance_in"],
                                 timestep_embedding(guidance * 1000.0, 256))
        vec = vec + _vec_mlp(p_embed["vector_in"], pooled)
        return img, txt, vec.astype(img.dtype)

    @jax.jit
    def run_double(tb, img, txt, vec, freqs):
        # UNSTACKED list -> unrolled python loop.  For QUANTIZED stacked
        # params the scan's per-iteration dynamic-slice of int8 code
        # arrays cannot alias into the Pallas matmul custom-calls, so XLA
        # materializes a copy of every weight every layer (~1.1 ms/block
        # at Flux width — measured 40.4 ms scanned vs 34.9 ms unrolled for
        # 5 double blocks; bf16 params alias fine: 47.0 vs 48.1 ms).
        if isinstance(tb, (list, tuple)):
            for blk in tb:
                img, txt = _double_block(blk, img, txt, vec, freqs, cfg,
                                         acfg)
            return img, txt
        if isinstance(tb, dict) and "first" in tb:
            img, txt = _double_block(tb["first"], img, txt, vec, freqs,
                                     cfg, acfg)
            tb = tb["rest"]

        def dbody(carry, i):
            im, t = carry
            return _double_block(_index_stacked(tb, i), im, t, vec, freqs,
                                 cfg, acfg), None

        (img, txt), _ = jax.lax.scan(dbody, (img, txt),
                                     jnp.arange(_stack_len(tb)))
        return img, txt

    @jax.jit
    def run_single(sb, x, vec, freqs):
        if isinstance(sb, (list, tuple)):
            for blk in sb:
                x = _single_block(blk, x, vec, freqs, cfg, acfg)
            return x
        if isinstance(sb, dict) and "first" in sb:
            x = _single_block(sb["first"], x, vec, freqs, cfg, acfg)
            sb = sb["rest"]

        def sbody(h, i):
            return _single_block(_index_stacked(sb, i), h, vec, freqs,
                                 cfg, acfg), None

        x, _ = jax.lax.scan(sbody, x, jnp.arange(_stack_len(sb)))
        return x

    @jax.jit
    def head(p_head, x, txt, vec):
        img = x[:, txt.shape[1]:]
        shift, scale = _modulation(p_head["norm_out"], vec, 2)
        img = layer_norm(img) * (1 + scale) + shift
        return qlinear(img, p_head["proj_out"]["weight"],
                       p_head["proj_out"].get("bias"))

    def forward(params, img, txt, timesteps, pooled, guidance=None,
                freqs=None):
        if freqs is None:
            n_img = img.shape[1]
            side = int(round(n_img ** 0.5))
            freqs = make_rope_freqs(cfg, txt.shape[1],
                                    (side, n_img // side))
        p_embed = {k: params[k] for k in
                   ("x_embedder", "context_embedder", "time_in",
                    "vector_in", "guidance_in") if k in params}
        img, txt, vec = embed(p_embed, img, txt, timesteps, pooled,
                              guidance)
        img, txt = run_double(params["transformer_blocks"], img, txt, vec,
                              freqs)
        x = jnp.concatenate([txt, img], axis=1)
        x = run_single(params["single_transformer_blocks"], x, vec, freqs)
        p_head = {"norm_out": params["norm_out"],
                  "proj_out": params["proj_out"]}
        return head(p_head, x, txt, vec)

    return forward


def stack_dit_blocks(params: Params) -> Params:
    """Stack the homogeneous block lists along a leading layer axis so
    dit_forward scans them: the block body (and every Pallas kernel in it)
    traces ONCE instead of once per layer — compile time and the XLA
    program size drop by ~depth.  Requires uniform quantization metadata
    across blocks (not compatible with per-layer dynamic formats — keep
    those as lists).  QTensor leaves stack component-wise; the shared
    static meta keeps per-layer shapes, which scan slices back out."""
    def try_stack(blocks):
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)

    out = dict(params)
    for key in ("transformer_blocks", "single_transformer_blocks"):
        blocks = params.get(key)
        if not isinstance(blocks, list) or not blocks:
            continue
        if len(blocks) == 1:
            out[key] = jax.tree_util.tree_map(lambda x: x[None], blocks[0])
            continue
        defs = [jax.tree_util.tree_structure(b) for b in blocks]
        if all(d == defs[0] for d in defs[1:]):
            out[key] = try_stack(blocks)
        elif len(blocks) > 2 and all(d == defs[1] for d in defs[2:]):
            # Flux skip registry leaves block 0's modulation unquantized
            # (policy.MODEL_SKIP_KEYS '...blocks.0.norm...'): keep the
            # heterogeneous head as-is, scan the uniform tail
            out[key] = {"first": blocks[0], "rest": try_stack(blocks[1:])}
        # else: leave the list (per-layer dynamic formats etc.)
    return out
