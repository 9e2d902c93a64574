"""Mixture-of-Experts FFN with quantized experts + expert parallelism.

Absent from the reference (SURVEY §2.2: EP "absent") — a first-class
component here.  TPU-native design (Switch-Transformer-style static
shapes, public recipe from the scaling book / flax examples):

  * top-k routing with a fixed per-expert capacity C — every shape is
    static under jit; overflowing tokens drop (standard capacity trick);
  * dispatch/combine are one-hot einsums on the MXU, which GSPMD turns
    into all-to-alls when tokens ride the `data` axis and experts ride the
    `expert` axis;
  * expert weights are ONE stacked QTensor per projection, shape
    (E, out, in) — quantization groups along `in`, scales (E, out, G) —
    so the whole expert bank shards over the `expert` axis as a single
    pytree leaf and the expert GEMMs run as one batched low-precision
    ``dot_general`` over E (same pattern as the grouped-conv kernel,
    layers._grouped_quantized_matmul).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..quant.core import quantize_int_mm
from ..tensor import QTensor, dequantize, quantize_tensor
from .common import Params, linear_init

__all__ = ["MoEConfig", "MOE_TINY_CONFIG", "init_moe", "moe_ffn",
           "quantize_moe", "qlinear_batched", "shard_moe"]


@dataclasses.dataclass(frozen=True)
class MoEConfig:
    hidden_size: int = 4096
    ff_dim: int = 14336
    num_experts: int = 8
    top_k: int = 2
    capacity_factor: float = 1.25


MOE_TINY_CONFIG = MoEConfig(hidden_size=64, ff_dim=128, num_experts=4,
                            top_k=2, capacity_factor=2.0)


def init_moe(key, cfg: MoEConfig = MOE_TINY_CONFIG,
             dtype=jnp.float32) -> Params:
    kr, kg, ku, kd = jax.random.split(key, 4)
    d, f, e = cfg.hidden_size, cfg.ff_dim, cfg.num_experts

    def bank(k, o, c):
        return jax.random.normal(k, (e, o, c), dtype) * (c ** -0.5)

    return {
        "router": linear_init(kr, d, e, bias=False, dtype=dtype),
        "gate_proj": {"weight": bank(kg, f, d)},
        "up_proj": {"weight": bank(ku, f, d)},
        "down_proj": {"weight": bank(kd, d, f)},
    }


def quantize_moe(params: Params, fmt: str = "int8", *,
                 use_quantized_matmul: bool = False, **kw) -> Params:
    """Quantize the stacked expert banks (router stays full precision,
    like the reference's modulation/router skip policy)."""
    out = dict(params)
    for name in ("gate_proj", "up_proj", "down_proj"):
        w = params[name]["weight"]
        out[name] = {"weight": quantize_tensor(
            w, fmt, "linear", use_quantized_matmul=use_quantized_matmul,
            **kw)}
    return out


def qlinear_batched(x: jax.Array, w, out_dtype=None) -> jax.Array:
    """Batched linear over a stacked expert bank: x (E, C, D) × w (E, O, D)
    -> (E, C, O).  QTensor banks run int8×int8 on the MXU when
    use_quantized_matmul is set; otherwise dequantize feeds a bf16 batched
    dot (XLA fuses the dequant into the operand pipeline)."""
    batched = (((2,), (2,)), ((0,), (0,)))
    if not isinstance(w, QTensor):
        out_dtype = out_dtype or x.dtype
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), batched,
            preferred_element_type=jnp.float32).astype(out_dtype)
    meta = w.meta
    out_dtype = out_dtype or jnp.dtype(meta.dequant_dtype)
    if meta.use_quantized_matmul and not meta.re_quantize_for_matmul \
            and meta.matmul_format.is_integer and w.qdata.dtype == jnp.int8:
        x_q, x_s = quantize_int_mm(x, axis=-1)             # (E, C, D)
        acc = jax.lax.dot_general(x_q, w.qdata, batched,
                                  preferred_element_type=jnp.int32)
        ws = jnp.transpose(w.scale.reshape(*w.qdata.shape[:2], 1),
                           (0, 2, 1))                      # (E, 1, O)
        return (acc.astype(jnp.float32) * x_s * ws).astype(out_dtype)
    wd = dequantize(w, jnp.bfloat16)
    return jax.lax.dot_general(
        x.astype(jnp.bfloat16), wd, batched,
        preferred_element_type=jnp.float32).astype(out_dtype)


def moe_ffn(params: Params, x: jax.Array, cfg: MoEConfig,
            out_dtype=None):
    """x (..., D) -> (..., D) plus the router aux loss.

    Returns (y, aux) where aux is the load-balancing loss
    (mean_e fraction_tokens_e * mean_router_prob_e * E)."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    t = 1
    for s in lead:
        t *= s
    xf = x.reshape(t, d)
    out_dtype = out_dtype or x.dtype
    e, k = cfg.num_experts, cfg.top_k
    cap = max(1, int(cfg.capacity_factor * k * t / e))

    logits = xf.astype(jnp.float32) @ params["router"]["weight"].T \
        .astype(jnp.float32)                               # (T, E)
    probs = jax.nn.softmax(logits, axis=-1)
    gate_vals, gate_idx = jax.lax.top_k(probs, k)          # (T, k)
    gate_vals = gate_vals / jnp.maximum(
        gate_vals.sum(-1, keepdims=True), 1e-9)

    # position of each (token, choice) within its expert's capacity
    onehot = jax.nn.one_hot(gate_idx, e, dtype=jnp.int32)  # (T, k, E)
    flat = onehot.reshape(t * k, e)
    pos = jnp.cumsum(flat, axis=0) - flat                  # arrival order
    pos = jnp.sum(pos.reshape(t, k, e) * onehot, axis=-1)  # (T, k)
    keep = pos < cap

    # dispatch (T, k, E, C) one-hot -> expert inputs (E, C, D)
    disp = (onehot * keep[..., None]).astype(xf.dtype)     # (T, k, E)
    pos_oh = jax.nn.one_hot(jnp.where(keep, pos, cap), cap + 1,
                            dtype=xf.dtype)[..., :cap]     # (T, k, C)
    dispatch = jnp.einsum("tke,tkc->tec", disp, pos_oh)    # (T, E, C)
    expert_in = jnp.einsum("tec,td->ecd", dispatch, xf)

    g = qlinear_batched(expert_in, params["gate_proj"]["weight"],
                        jnp.float32)
    u = qlinear_batched(expert_in, params["up_proj"]["weight"], jnp.float32)
    h = jax.nn.silu(g) * u
    expert_out = qlinear_batched(h.astype(x.dtype),
                                 params["down_proj"]["weight"], jnp.float32)

    combine = jnp.einsum("tec,tke,tk->tec", dispatch,
                         onehot.astype(xf.dtype),
                         gate_vals.astype(xf.dtype))
    y = jnp.einsum("tec,ecd->td", combine, expert_out)

    # load-balance aux (Switch eq. 4)
    frac = jnp.sum(jax.nn.one_hot(gate_idx[:, 0], e), axis=0) / t
    me = jnp.mean(probs, axis=0)
    aux = jnp.sum(frac * me) * e
    return y.reshape(*lead, d).astype(out_dtype), aux


def shard_moe(params: Params, mesh, axis: str = "tensor") -> Params:
    """Expert parallelism: shard every stacked-bank leaf on its leading
    (expert) dim over `axis`; the router stays replicated.  With tokens on
    the `data` axis, GSPMD lowers the dispatch/combine einsums to
    all-to-alls over ICI — the GShard/Switch comm pattern without a single
    hand-written collective."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape[axis]
    rep = NamedSharding(mesh, P())

    def put0(a):
        if a.ndim >= 1 and a.shape[0] % n == 0:
            return jax.device_put(
                a, NamedSharding(mesh, P(axis, *[None] * (a.ndim - 1))))
        return jax.device_put(a, rep)

    out = {"router": jax.tree.map(lambda a: jax.device_put(a, rep),
                                  params["router"])}
    for name in ("gate_proj", "up_proj", "down_proj"):
        out[name] = jax.tree.map(put0, params[name])
    return out
