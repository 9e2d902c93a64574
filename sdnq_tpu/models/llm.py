"""Llama/Gemma-style decoder LM with quantized weights and KV cache.

The reference quantizes LLM checkpoints (Gemma, Emu3, Moondream... —
common.py skip registry) but has no generation stack; serving needs one
(BASELINE: "report tokens/s").  Functional decoder with GQA + RoPE +
SwiGLU, rms norms, a static-shape KV cache, and a jitted greedy decode
loop.  Param names follow transformers' LlamaForCausalLM.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..layers import qembedding, qlinear
from .common import Params, linear_init, rms_norm, split_heads

__all__ = ["LLMConfig", "LLM_TINY_CONFIG", "init_llm", "llm_forward",
           "generate", "stack_llm_blocks"]


@dataclasses.dataclass(frozen=True)
class LLMConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    ff_dim: int = 11008
    rope_theta: float = 10000.0
    tie_embeddings: bool = False
    # "bfloat16" or "int8": int8 stores per-token-quantized K/V rows +
    # scales (2x smaller cache; the flash kernel consumes them directly —
    # a serving capability the reference lacks entirely)
    kv_cache_dtype: str = "bfloat16"


LLM_TINY_CONFIG = LLMConfig(vocab_size=1000, hidden_size=128, num_layers=2,
                            num_heads=4, num_kv_heads=2, head_dim=32,
                            ff_dim=256)


def init_llm(key, cfg: LLMConfig = LLM_TINY_CONFIG, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 8 + 8 * cfg.num_layers))
    d = cfg.hidden_size
    inner = cfg.num_heads * cfg.head_dim
    kv_inner = cfg.num_kv_heads * cfg.head_dim
    p: Params = {
        "embed_tokens": {"weight": jax.random.normal(
            next(ks), (cfg.vocab_size, d), dtype) * 0.02},
        "layers": [],
        "norm": {"weight": jnp.ones((d,), dtype)},
    }
    if not cfg.tie_embeddings:
        p["lm_head"] = linear_init(next(ks), d, cfg.vocab_size, bias=False,
                                   dtype=dtype)
    for _ in range(cfg.num_layers):
        p["layers"].append({
            "input_layernorm": {"weight": jnp.ones((d,), dtype)},
            "self_attn": {
                "q_proj": linear_init(next(ks), d, inner, bias=False,
                                      dtype=dtype),
                "k_proj": linear_init(next(ks), d, kv_inner, bias=False,
                                      dtype=dtype),
                "v_proj": linear_init(next(ks), d, kv_inner, bias=False,
                                      dtype=dtype),
                "o_proj": linear_init(next(ks), inner, d, bias=False,
                                      dtype=dtype)},
            "post_attention_layernorm": {"weight": jnp.ones((d,), dtype)},
            "mlp": {
                "gate_proj": linear_init(next(ks), d, cfg.ff_dim, bias=False,
                                         dtype=dtype),
                "up_proj": linear_init(next(ks), d, cfg.ff_dim, bias=False,
                                       dtype=dtype),
                "down_proj": linear_init(next(ks), cfg.ff_dim, d, bias=False,
                                         dtype=dtype)},
        })
    return p


def _rope_tables(positions, head_dim, theta):
    scale = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    inv = 1.0 / (theta ** scale)
    ang = positions.astype(jnp.float32)[..., None] * inv   # (..., n, hd/2)
    return jnp.cos(ang), jnp.sin(ang)


def _apply_rope(x, cos, sin):
    """rotate_half convention (transformers LlamaRotaryEmbedding): the head
    dim splits into two halves — real HF Llama checkpoints then load with
    no q/k row permutation.  x (B, H, N, D); cos/sin (B or 1, N, D/2)."""
    xf = x.astype(jnp.float32)
    d2 = xf.shape[-1] // 2
    x1, x2 = xf[..., :d2], xf[..., d2:]
    c = cos[:, None, :, :]
    s = sin[:, None, :, :]
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(x.dtype)


def _attn_with_cache(a, x, cfg, positions, cache, layer_idx, attn_cfg):
    b, n, _ = x.shape
    h, kvh, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    q = split_heads(qlinear(x, a["q_proj"]["weight"]), h)
    k = split_heads(qlinear(x, a["k_proj"]["weight"]), kvh)
    v = split_heads(qlinear(x, a["v_proj"]["weight"]), kvh)
    cos, sin = _rope_tables(positions, hd, cfg.rope_theta)
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)

    kv_scales = None
    if cache is not None:
        upd = lambda c, new: jax.lax.dynamic_update_slice_in_dim(  # noqa: E731
            c, new.astype(c.dtype), cache_len, axis=2)
        if len(cache) == 5:
            # quantized KV cache: int8 rows + per-token scales, quantized
            # once at insert time (quantize_kv) — decode steps re-read
            # half the bytes and skip the per-call K/V quantize pass
            from ..kernels.attention import quantize_kv
            ck, cks, cv, cvs, cache_len = cache
            k_q, k_s, v_q, v_s = quantize_kv(k, v)
            ck, cv = upd(ck, k_q), upd(cv, v_q)
            cks = upd(cks[..., None], k_s[..., None])[..., 0]
            cvs = upd(cvs[..., None], v_s[..., None])[..., 0]
            k_full, v_full = ck, cv
            kv_scales = (cks, cvs)
            new_cache = (ck, cks, cv, cvs, cache_len + n)
        else:
            ck, cv, cache_len = cache
            ck, cv = upd(ck, k), upd(cv, v)
            k_full, v_full = ck, cv
            new_cache = (ck, cv, cache_len + n)
        kn = ck.shape[2]
        key_pos = jnp.arange(kn)[None, :]
        q_pos = positions
        mask = (key_pos[:, None, :] <= q_pos[..., None]) \
            [:, None]                                     # (B,1,N,KN)
    else:
        k_full, v_full = k, v
        mask = None
        new_cache = None

    reps = h // kvh
    if reps > 1:
        k_full = jnp.repeat(k_full, reps, axis=1)
        v_full = jnp.repeat(v_full, reps, axis=1)
        if kv_scales is not None:
            kv_scales = tuple(jnp.repeat(s, reps, axis=1)
                              for s in kv_scales)

    from ..kernels.attention import quantized_attention
    acfg = attn_cfg or {}
    out = quantized_attention(
        q, k_full, v_full,
        attn_mask=mask if mask is not None else None,
        is_causal=(cache is None),
        matmul_dtype=acfg.get("matmul_dtype", "auto"),
        pv_matmul_dtype=acfg.get("pv_matmul_dtype"),
        out_dtype=x.dtype,
        kv_scales=kv_scales)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, h * hd)
    return qlinear(out, a["o_proj"]["weight"]), new_cache


def _block(blk, x, cfg, positions, cache, i, attn_cfg):
    xa = rms_norm(x, blk["input_layernorm"]["weight"])
    attn_out, cache = _attn_with_cache(blk["self_attn"], xa, cfg, positions,
                                       cache, i, attn_cfg)
    x = x + attn_out
    xm = rms_norm(x, blk["post_attention_layernorm"]["weight"])
    m = blk["mlp"]
    g = jax.nn.silu(qlinear(xm, m["gate_proj"]["weight"]))
    u = qlinear(xm, m["up_proj"]["weight"])
    x = x + qlinear(g * u, m["down_proj"]["weight"])
    return x, cache


def llm_forward(params: Params, input_ids, cfg: LLMConfig, *,
                positions=None, caches=None, attn_config=None):
    """Returns (logits, new_caches).  caches: list per layer of
    (k (B,KVH,MAX,D), v, length) or None for plain causal forward."""
    b, n = input_ids.shape
    if positions is None:
        positions = jnp.arange(n)[None, :].repeat(b, 0)
    x = qembedding(input_ids, params["embed_tokens"]["weight"])
    new_caches = []
    for i, blk in enumerate(params["layers"]):
        cache = caches[i] if caches is not None else None
        x, cache = _block(blk, x, cfg, positions, cache, i, attn_config)
        new_caches.append(cache)
    x = rms_norm(x, params["norm"]["weight"])
    if "lm_head" in params:
        logits = qlinear(x, params["lm_head"]["weight"])
    else:
        logits = qlinear(x, params["embed_tokens"]["weight"])
    return logits, (new_caches if caches is not None else None)


def init_cache(cfg: LLMConfig, batch: int, max_len: int, dtype=None):
    """Static KV cache.  dtype None follows cfg.kv_cache_dtype; "int8"
    caches are 5-tuples (k_q, k_scale, v_q, v_scale, len) with int8 rows +
    per-token f32 scales (2x smaller than bf16 + negligible scale bytes)."""
    if dtype is None:
        dtype = cfg.kv_cache_dtype
    shape = (batch, cfg.num_kv_heads, max_len, cfg.head_dim)
    sshape = (batch, cfg.num_kv_heads, max_len)
    if jnp.dtype(dtype) == jnp.dtype(jnp.int8):
        return [(jnp.zeros(shape, jnp.int8), jnp.zeros(sshape, jnp.float32),
                 jnp.zeros(shape, jnp.int8), jnp.zeros(sshape, jnp.float32),
                 0)
                for _ in range(cfg.num_layers)]
    return [(jnp.zeros(shape, jnp.dtype(dtype)),
             jnp.zeros(shape, jnp.dtype(dtype)), 0)
            for _ in range(cfg.num_layers)]


def generate(params, prompt_ids, cfg: LLMConfig, *, max_new_tokens: int = 16,
             attn_config=None):
    """Greedy decode with a static KV cache: one jitted prefill + one jitted
    single-token step reused for every position (cache offsets are traced
    scalars, so nothing retraces per token)."""
    b, n0 = prompt_ids.shape
    max_len = n0 + max_new_tokens
    caches = init_cache(cfg, b, max_len)
    caches = [c[:-1] + (jnp.asarray(c[-1], jnp.int32),) for c in caches]

    prefill = jax.jit(lambda ids, caches: llm_forward(
        params, ids, cfg, caches=caches, attn_config=attn_config))
    logits, caches = prefill(prompt_ids, caches)
    next_tok = jnp.argmax(logits[:, -1], axis=-1)

    @jax.jit
    def step(tok, caches, pos):
        logits, caches = llm_forward(
            params, tok[:, None], cfg,
            positions=jnp.broadcast_to(pos[None, None], (b, 1)),
            caches=caches, attn_config=attn_config)
        return jnp.argmax(logits[:, -1], axis=-1), caches

    toks = [next_tok]
    pos = jnp.asarray(n0, jnp.int32)
    for _ in range(max_new_tokens - 1):
        next_tok, caches = step(next_tok, caches, pos)
        toks.append(next_tok)
        pos = pos + 1
    return jnp.stack(toks, axis=1)


def stack_llm_blocks(params: Params) -> Params:
    """Stack homogeneous decoder layers for lax.scan (same rationale as
    models.dit.stack_dit_blocks)."""
    out = dict(params)
    layers = params.get("layers")
    if isinstance(layers, list) and layers:
        defs = [jax.tree_util.tree_structure(b) for b in layers]
        if all(d == defs[0] for d in defs[1:]):
            out["layers"] = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *layers)
    return out
