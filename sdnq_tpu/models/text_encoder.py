"""Text encoders: CLIP (SD/SDXL) and T5 (Flux/SD3/PixArt), functional.

Param names follow transformers' CLIPTextModel / T5EncoderModel so HF
checkpoints map directly and the embedding/lm_head skip policy applies.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..layers import qembedding, qlinear
from .common import Params, attention, layer_norm, linear_init, rms_norm, \
    split_heads

__all__ = ["CLIPConfig", "T5Config", "CLIP_TINY_CONFIG", "T5_TINY_CONFIG",
           "init_clip", "clip_encode", "init_t5", "t5_encode"]


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 77
    intermediate: int = 3072


CLIP_TINY_CONFIG = CLIPConfig(vocab_size=1000, hidden_size=64, num_layers=2,
                              num_heads=4, intermediate=128)


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    hidden_size: int = 4096
    num_layers: int = 24
    num_heads: int = 64
    head_dim: int = 64
    ff_dim: int = 10240
    rel_buckets: int = 32
    rel_max_distance: int = 128


T5_TINY_CONFIG = T5Config(vocab_size=1000, hidden_size=64, num_layers=2,
                          num_heads=4, head_dim=16, ff_dim=128)


# ---------------------------------------------------------------------------
# CLIP text encoder
# ---------------------------------------------------------------------------

def init_clip(key, cfg: CLIPConfig = CLIP_TINY_CONFIG, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 16 + 8 * cfg.num_layers))
    d = cfg.hidden_size

    def norm():
        return {"weight": jnp.ones((d,), dtype),
                "bias": jnp.zeros((d,), dtype)}

    p: Params = {
        "embeddings": {
            "token_embedding": {
                "weight": jax.random.normal(next(ks), (cfg.vocab_size, d),
                                            dtype) * 0.02},
            "position_embedding": {
                "weight": jax.random.normal(next(ks), (cfg.max_positions, d),
                                            dtype) * 0.02}},
        "layers": [],
        "final_layer_norm": norm(),
    }
    for _ in range(cfg.num_layers):
        p["layers"].append({
            "layer_norm1": norm(),
            "self_attn": {
                "q_proj": linear_init(next(ks), d, d, dtype=dtype),
                "k_proj": linear_init(next(ks), d, d, dtype=dtype),
                "v_proj": linear_init(next(ks), d, d, dtype=dtype),
                "out_proj": linear_init(next(ks), d, d, dtype=dtype)},
            "layer_norm2": norm(),
            "mlp": {"fc1": linear_init(next(ks), d, cfg.intermediate,
                                       dtype=dtype),
                    "fc2": linear_init(next(ks), cfg.intermediate, d,
                                       dtype=dtype)},
        })
    return p


def clip_encode(params, input_ids, cfg: CLIPConfig,
                attn_config=None):
    """Returns (last_hidden_state, pooled)."""
    b, n = input_ids.shape
    h = qembedding(input_ids, params["embeddings"]["token_embedding"]
                   ["weight"])
    pos = qembedding(jnp.arange(n)[None, :],
                     params["embeddings"]["position_embedding"]["weight"])
    h = h + pos
    cfg_attn = dict(attn_config or {})
    cfg_attn["is_causal"] = True  # CLIP text uses causal masking
    for lyr in params["layers"]:
        hn = layer_norm(h, lyr["layer_norm1"]["weight"],
                        lyr["layer_norm1"]["bias"], eps=1e-5)
        a = lyr["self_attn"]
        q = split_heads(qlinear(hn, a["q_proj"]["weight"],
                                a["q_proj"].get("bias")), cfg.num_heads)
        k = split_heads(qlinear(hn, a["k_proj"]["weight"],
                                a["k_proj"].get("bias")), cfg.num_heads)
        v = split_heads(qlinear(hn, a["v_proj"]["weight"],
                                a["v_proj"].get("bias")), cfg.num_heads)
        o = attention(q, k, v, cfg_attn)
        h = h + qlinear(o, a["out_proj"]["weight"], a["out_proj"].get("bias"))
        hn = layer_norm(h, lyr["layer_norm2"]["weight"],
                        lyr["layer_norm2"]["bias"], eps=1e-5)
        m = qlinear(hn, lyr["mlp"]["fc1"]["weight"],
                    lyr["mlp"]["fc1"].get("bias"))
        m = m * jax.nn.sigmoid(1.702 * m)  # quick_gelu
        h = h + qlinear(m, lyr["mlp"]["fc2"]["weight"],
                        lyr["mlp"]["fc2"].get("bias"))
    h = layer_norm(h, params["final_layer_norm"]["weight"],
                   params["final_layer_norm"]["bias"], eps=1e-5)
    # pooled = eos token (argmax of ids as a stand-in for eos position)
    eos_idx = jnp.argmax(input_ids, axis=-1)
    pooled = h[jnp.arange(b), eos_idx]
    return h, pooled


# ---------------------------------------------------------------------------
# T5 encoder
# ---------------------------------------------------------------------------

def _rel_bucket(rel, buckets, max_dist):
    # bidirectional relative position buckets (T5)
    n = buckets // 2
    ret = jnp.where(rel > 0, n, 0)
    rel = jnp.abs(rel)
    max_exact = n // 2
    large = max_exact + (
        jnp.log(rel.astype(jnp.float32) / max_exact + 1e-6)
        / jnp.log(max_dist / max_exact) * (n - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, n - 1)
    return ret + jnp.where(rel < max_exact, rel, large)


def init_t5(key, cfg: T5Config = T5_TINY_CONFIG, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 16 + 8 * cfg.num_layers))
    d = cfg.hidden_size
    inner = cfg.num_heads * cfg.head_dim
    p: Params = {
        "shared": {"weight": jax.random.normal(
            next(ks), (cfg.vocab_size, d), dtype)},
        "relative_attention_bias": {"weight": jax.random.normal(
            next(ks), (cfg.rel_buckets, cfg.num_heads), dtype) * 0.02},
        "block": [],
        "final_layer_norm": {"weight": jnp.ones((d,), dtype)},
    }
    for _ in range(cfg.num_layers):
        p["block"].append({
            "layer_norm0": {"weight": jnp.ones((d,), dtype)},
            "SelfAttention": {
                "q": linear_init(next(ks), d, inner, bias=False, dtype=dtype),
                "k": linear_init(next(ks), d, inner, bias=False, dtype=dtype),
                "v": linear_init(next(ks), d, inner, bias=False, dtype=dtype),
                "o": linear_init(next(ks), inner, d, bias=False,
                                 dtype=dtype)},
            "layer_norm1": {"weight": jnp.ones((d,), dtype)},
            "DenseReluDense": {
                "wi_0": linear_init(next(ks), d, cfg.ff_dim, bias=False,
                                    dtype=dtype),
                "wi_1": linear_init(next(ks), d, cfg.ff_dim, bias=False,
                                    dtype=dtype),
                "wo": linear_init(next(ks), cfg.ff_dim, d, bias=False,
                                  dtype=dtype)},
        })
    return p


def t5_encode(params, input_ids, cfg: T5Config, attn_config=None):
    b, n = input_ids.shape
    h = qembedding(input_ids, params["shared"]["weight"])
    pos = jnp.arange(n)
    rel = pos[None, :] - pos[:, None]
    buckets = _rel_bucket(rel, cfg.rel_buckets, cfg.rel_max_distance)
    bias_table = params["relative_attention_bias"]["weight"]
    bias = bias_table[buckets]                     # (n, n, H)
    bias = jnp.transpose(bias, (2, 0, 1))[None]    # (1, H, n, n)
    for lyr in params["block"]:
        hn = rms_norm(h, lyr["layer_norm0"]["weight"])
        a = lyr["SelfAttention"]
        q = split_heads(qlinear(hn, a["q"]["weight"]), cfg.num_heads)
        k = split_heads(qlinear(hn, a["k"]["weight"]), cfg.num_heads)
        v = split_heads(qlinear(hn, a["v"]["weight"]), cfg.num_heads)
        o = _t5_attention(q, k, v, bias, dict(attn_config or {}))
        h = h + qlinear(o, a["o"]["weight"])
        hn = rms_norm(h, lyr["layer_norm1"]["weight"])
        ff = lyr["DenseReluDense"]
        g0 = jax.nn.gelu(qlinear(hn, ff["wi_0"]["weight"]), approximate=True)
        m = g0 * qlinear(hn, ff["wi_1"]["weight"])
        h = h + qlinear(m, ff["wo"]["weight"])
    return rms_norm(h, params["final_layer_norm"]["weight"])


def _t5_attention(q, k, v, bias, attn_cfg):
    from ..kernels.attention import quantized_attention
    out = quantized_attention(
        q, k, v, attn_mask=bias, scale=1.0,  # T5: no 1/sqrt(d) scaling
        matmul_dtype=attn_cfg.get("matmul_dtype", "auto"),
        pv_matmul_dtype=attn_cfg.get("pv_matmul_dtype"),
        out_dtype=q.dtype)
    b, h, n, d = out.shape
    return out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
