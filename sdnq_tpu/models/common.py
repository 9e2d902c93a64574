"""Shared functional building blocks for the model zoo.

All models are pure functions over nested-dict param pytrees whose weight
leaves may be jax.Arrays or QTensors — the quantized layer forwards
(sdnq_tpu.layers) dispatch at trace time.  Param naming follows the
torch/HF convention (``...weight``/``...bias``, (O, C) linear orientation)
so HF checkpoints map 1:1 and the reference's skip-key policy
(policy.MODEL_SKIP_KEYS) applies unchanged.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp

from ..layers import qlinear
from ..kernels.attention import quantized_attention

Params = dict


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def linear_init(key, in_dim: int, out_dim: int, bias: bool = True,
                dtype=jnp.float32) -> Params:
    k1, _ = jax.random.split(key)
    std = 1.0 / math.sqrt(in_dim)
    p = {"weight": jax.random.normal(k1, (out_dim, in_dim), dtype) * std}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def conv_init(key, in_ch: int, out_ch: int, kernel: int = 3,
              bias: bool = True, dtype=jnp.float32) -> Params:
    k1, _ = jax.random.split(key)
    fan_in = in_ch * kernel * kernel
    std = 1.0 / math.sqrt(fan_in)
    p = {"weight": jax.random.normal(
        k1, (out_ch, in_ch, kernel, kernel), dtype) * std}
    if bias:
        p["bias"] = jnp.zeros((out_ch,), dtype)
    return p


# ---------------------------------------------------------------------------
# Normalization (always computed in fp32)
# ---------------------------------------------------------------------------

def layer_norm(x, weight=None, bias=None, eps=1e-6):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def rms_norm(x, weight=None, eps=1e-6):
    xf = x.astype(jnp.float32)
    out = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), -1, keepdims=True) + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    return out.astype(x.dtype)


def group_norm(x, weight, bias, groups=32, eps=1e-6):
    """x: NHWC."""
    n, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(n, h, w, groups, c // groups)
    mean = xf.mean((1, 2, 4), keepdims=True)
    var = xf.var((1, 2, 4), keepdims=True)
    out = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(n, h, w, c)
    return (out * weight.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Embeddings
# ---------------------------------------------------------------------------

def timestep_embedding(t, dim: int, max_period: float = 10000.0):
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def rope(pos, dim: int, theta: float = 10000.0):
    """Rotary embedding table: pos (..., n) -> (..., n, dim/2, 2, 2)."""
    scale = jnp.arange(0, dim, 2, dtype=jnp.float32) / dim
    omega = 1.0 / (theta ** scale)
    out = pos.astype(jnp.float32)[..., None] * omega
    cos, sin = jnp.cos(out), jnp.sin(out)
    return jnp.stack(
        [jnp.stack([cos, -sin], -1), jnp.stack([sin, cos], -1)], -2)


def apply_rope(x, freqs):
    """x: (B, H, N, D); freqs: (B or 1, 1, N, D/2, 2, 2) — explicit 2x2
    rotation per coordinate pair."""
    x2 = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
    rotated = jnp.stack(
        [freqs[..., 0, 0] * x2[..., 0] + freqs[..., 0, 1] * x2[..., 1],
         freqs[..., 1, 0] * x2[..., 0] + freqs[..., 1, 1] * x2[..., 1]],
        axis=-1)
    return rotated.reshape(x.shape).astype(x.dtype)


# ---------------------------------------------------------------------------
# Attention / MLP
# ---------------------------------------------------------------------------

def attention(q, k, v, attn_config: dict | None = None):
    """q/k/v: (B, H, N, D) -> (B, N, H*D).  attn_config selects the
    quantized attention path (matmul_dtype etc.; "auto" routes through
    the measured crossover policy in kernels/attention.py)."""
    cfg = attn_config or {}
    # unconfigured models ride the measured crossover policy ("auto"):
    # bf16 flash below the int8-QK win regime, int8 QK above it.  An
    # explicit {"matmul_dtype": None} still forces bf16.
    out = quantized_attention(
        q, k, v,
        matmul_dtype=cfg.get("matmul_dtype", "auto"),
        pv_matmul_dtype=cfg.get("pv_matmul_dtype"),
        smooth_k=cfg.get("smooth_k", False),
        use_hadamard=cfg.get("use_hadamard", False),
        is_causal=cfg.get("is_causal", False),
        out_dtype=q.dtype if q.dtype != jnp.int8 else jnp.bfloat16,
    )
    b, h, n, d = out.shape
    return out.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def split_heads(x, heads: int):
    b, n, hd = x.shape
    return x.reshape(b, n, heads, hd // heads).transpose(0, 2, 1, 3)


def gelu(x):
    return jax.nn.gelu(x, approximate=True)


def silu(x):
    return jax.nn.silu(x)


def mlp_forward(params: Params, x, act=gelu, out_dtype=None):
    h = qlinear(x, params["fc1"]["weight"], params["fc1"].get("bias"))
    h = act(h)
    return qlinear(h, params["fc2"]["weight"], params["fc2"].get("bias"),
                   out_dtype=out_dtype)
