"""Quantized-state optimizers: AdamW, Lion, Adafactor, CAME.

Shared engine (reference optim/optimizer.py:82-137 ``step`` skeleton):
scrub grad -> optimizer-specific raw update -> cautious mask -> final-norm
mode -> lr & decoupled weight decay -> Kahan-compensated, stochastically
rounded parameter write (for QTensor params the write *is* a fresh
quantization, reference training/tensor.py:309-336).

Moment buffers are SDNQ-quantized int8/uint8 group-wise when large enough
(reference quantizes them through SDNQTensor); Adafactor/CAME factored
second moments stay fp32 (reference `_keep_in_fp32_keys`,
optim/adafactor.py:12-110).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..tensor import QTensor, dequantize, quantize_tensor
from .base import (
    OptConfig, QOptimizer, apply_norm_to_update, cautious_mask,
    dequantize_buffer, param_value, quantize_buffer, scrub_grad,
    update_buffer_lerp,
)

__all__ = ["adamw", "lion", "adafactor", "came", "make_optimizer"]


def _is_param(x):
    from ..train.matmul import TrainQTensor
    return isinstance(x, (QTensor, TrainQTensor)) or (
        hasattr(x, "ndim") and hasattr(x, "dtype")
        and jnp.issubdtype(x.dtype, jnp.floating))


def _flatten(tree):
    """Flatten with QTensor/TrainQTensor treated as leaves.  Param trees and
    grad trees share container structure (grad leaves at quantized-param
    positions are plain arrays from extract_weight_grads), so positional
    alignment of the flat lists is exact."""
    from ..train.matmul import TrainQTensor
    return jax.tree_util.tree_flatten(
        tree, is_leaf=lambda x: isinstance(x, (QTensor, TrainQTensor)))


def make_optimizer(init_param: Callable, update_param: Callable,
                   cfg: OptConfig) -> QOptimizer:
    from ..train.matmul import TrainQTensor

    def init(params):
        flat, _ = _flatten(params)
        states = []
        for p in flat:
            if not _is_param(p):
                states.append(None)
                continue
            v = param_value(p)
            st = init_param(v, cfg)
            if cfg.use_kahan and isinstance(p, (QTensor, TrainQTensor)):
                st["kahan"] = jnp.zeros(v.shape, jnp.bfloat16)
            states.append(st)
        return {"step": jnp.zeros((), jnp.int32), "per_param": states}

    def update(grads, state, params, rng=None, grad_scale=None):
        step = state["step"] + 1
        rng_box = [rng]

        def next_key():
            if rng_box[0] is None:
                return None
            rng_box[0], k = jax.random.split(rng_box[0])
            return k

        flat_p, treedef = _flatten(params)
        flat_g, _ = _flatten(grads)
        states = state["per_param"]
        new_params, new_states = [], []
        for p, g, st in zip(flat_p, flat_g, states):
            if isinstance(g, TrainQTensor):  # raw cotangent: delta carries dW
                g = g.delta
            if st is None or g is None or not hasattr(g, "ndim"):
                new_params.append(p)
                new_states.append(st)
                continue
            g = scrub_grad(g, cfg.grad_clip, grad_scale)
            v = param_value(p)
            raw, st = update_param(g, dict(st), v, cfg, step, next_key())
            if cfg.use_cautious:
                raw = cautious_mask(raw, g)
            pn = jnp.sqrt(jnp.mean(jnp.square(v)) + 1e-12)
            raw = apply_norm_to_update(raw, pn, cfg.final_norm_mode)
            delta = -cfg.lr * raw
            if cfg.weight_decay:
                delta = delta - cfg.lr * cfg.weight_decay * v
            if isinstance(p, (QTensor, TrainQTensor)):
                qt = p.qt if isinstance(p, TrainQTensor) else p
                comp = st.get("kahan")
                target = v + delta
                if comp is not None:
                    target = target + comp.astype(jnp.float32)
                meta = qt.meta
                new_qt = quantize_tensor(
                    target, meta.fmt, meta.layer_kind,
                    matmul_fmt=meta.matmul_fmt, group_size=meta.group_size,
                    hadamard_group_size=meta.hadamard_group_size,
                    use_svd=False, use_hadamard=meta.use_hadamard,
                    use_quantized_matmul=meta.use_quantized_matmul,
                    use_stochastic_rounding=cfg.stochastic_rounding,
                    dequant_dtype=meta.dequant_dtype,
                    rng=next_key() if cfg.stochastic_rounding else None)
                if comp is not None:
                    st["kahan"] = (target
                                   - dequantize(new_qt, jnp.float32)) \
                        .astype(jnp.bfloat16)
                if isinstance(p, TrainQTensor):
                    new_p = TrainQTensor(qt=new_qt,
                                         delta=jnp.zeros_like(p.delta))
                else:
                    new_p = new_qt
            else:
                new_p = (v + delta).astype(p.dtype)
            new_params.append(new_p)
            new_states.append(st)
        return (jax.tree_util.tree_unflatten(treedef, new_params),
                {"step": step, "per_param": new_states})

    return QOptimizer(init=init, update=update)


# ---------------------------------------------------------------------------
# AdamW (reference optim/adamw.py:12-75)
# ---------------------------------------------------------------------------

def adamw(lr=1e-4, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0, **kw):
    cfg = OptConfig(lr=lr, eps=eps, weight_decay=weight_decay, **kw)

    def init_param(v, cfg):
        m = jnp.zeros(v.shape, jnp.float32)
        s = jnp.zeros(v.shape, jnp.float32)
        if cfg.quantize_state:
            m = quantize_buffer(m)
            s = quantize_buffer(s, unsigned=True)
        return {"m": m, "v": s}

    def update_param(g, st, v, cfg, step, rng):
        st["m"], m = update_buffer_lerp(st["m"], g, b1, rng)
        st["v"], vv = update_buffer_lerp(st["v"], jnp.square(g), b2, rng)
        t = step.astype(jnp.float32)
        m_hat = m / (1 - b1 ** t)
        v_hat = vv / (1 - b2 ** t)
        return m_hat / (jnp.sqrt(v_hat) + cfg.eps), st

    return make_optimizer(init_param, update_param, cfg)


# ---------------------------------------------------------------------------
# Lion (reference optim/lion.py:12-61)
# ---------------------------------------------------------------------------

def lion(lr=1e-4, b1=0.9, b2=0.99, weight_decay=0.0, **kw):
    cfg = OptConfig(lr=lr, weight_decay=weight_decay, **kw)

    def init_param(v, cfg):
        m = jnp.zeros(v.shape, jnp.float32)
        if cfg.quantize_state:
            m = quantize_buffer(m)
        return {"m": m}

    def update_param(g, st, v, cfg, step, rng):
        m = dequantize_buffer(st["m"])
        upd = jnp.sign(b1 * m + (1 - b1) * g)
        st["m"], _ = update_buffer_lerp(st["m"], g, b2, rng)
        return upd, st

    return make_optimizer(init_param, update_param, cfg)


# ---------------------------------------------------------------------------
# Adafactor (reference optim/adafactor.py:12-110)
# ---------------------------------------------------------------------------

def _factored_dims(shape):
    if len(shape) < 2:
        return None
    return len(shape) - 1, len(shape) - 2


def adafactor(lr=1e-4, decay_rate=0.8, eps=1e-30, clip_threshold=1.0,
              weight_decay=0.0, **kw):
    kw.setdefault("final_norm_mode", "none")
    cfg = OptConfig(lr=lr, eps=eps, weight_decay=weight_decay, **kw)

    def init_param(v, cfg):
        dims = _factored_dims(v.shape)
        if dims is not None:
            c, r = dims
            row_shape = list(v.shape)
            row_shape[c] = 1
            col_shape = list(v.shape)
            col_shape[r] = 1
            return {"vr": jnp.zeros(tuple(row_shape), jnp.float32),
                    "vc": jnp.zeros(tuple(col_shape), jnp.float32)}
        s = jnp.zeros(v.shape, jnp.float32)
        if cfg.quantize_state:
            s = quantize_buffer(s, unsigned=True)
        return {"v": s}

    def update_param(g, st, v, cfg, step, rng):
        t = step.astype(jnp.float32)
        beta2t = 1.0 - t ** -decay_rate
        g2 = jnp.square(g) + eps
        dims = _factored_dims(g.shape)
        if dims is not None:
            c, r = dims
            st["vr"] = beta2t * st["vr"] + (1 - beta2t) * g2.mean(
                axis=c, keepdims=True)
            st["vc"] = beta2t * st["vc"] + (1 - beta2t) * g2.mean(
                axis=r, keepdims=True)
            # approx_sq_grad (reference adafactor.py:103-110)
            r_factor = st["vr"] / jnp.maximum(
                st["vr"].mean(axis=r, keepdims=True), 1e-30)
            upd = g * jax.lax.rsqrt(r_factor * st["vc"] + 1e-30)
        else:
            st["v"], vv = update_buffer_lerp(st["v"], g2, beta2t, rng)
            upd = g * jax.lax.rsqrt(vv + 1e-30)
        rms = jnp.sqrt(jnp.mean(jnp.square(upd)) + 1e-12)
        upd = upd / jnp.maximum(1.0, rms / clip_threshold)
        return upd, st

    return make_optimizer(init_param, update_param, cfg)


# ---------------------------------------------------------------------------
# CAME (reference optim/came.py:13-114)
# ---------------------------------------------------------------------------

def came(lr=1e-4, b1=0.9, b2=0.999, b3=0.9999, eps1=1e-30, eps2=1e-16,
         clip_threshold=1.0, weight_decay=0.0, **kw):
    cfg = OptConfig(lr=lr, weight_decay=weight_decay, **kw)

    def init_param(v, cfg):
        st = {}
        m = jnp.zeros(v.shape, jnp.float32)
        if cfg.quantize_state:
            m = quantize_buffer(m)
        st["m"] = m
        dims = _factored_dims(v.shape)
        if dims is not None:
            c, r = dims
            row_shape = list(v.shape)
            row_shape[c] = 1
            col_shape = list(v.shape)
            col_shape[r] = 1
            st["vr"] = jnp.zeros(tuple(row_shape), jnp.float32)
            st["vc"] = jnp.zeros(tuple(col_shape), jnp.float32)
            st["ur"] = jnp.zeros(tuple(row_shape), jnp.float32)
            st["uc"] = jnp.zeros(tuple(col_shape), jnp.float32)
        else:
            s = jnp.zeros(v.shape, jnp.float32)
            if cfg.quantize_state:
                s = quantize_buffer(s, unsigned=True)
            st["v"] = s
        return st

    def update_param(g, st, v, cfg, step, rng):
        g2 = jnp.square(g) + eps1
        dims = _factored_dims(g.shape)
        if dims is not None:
            c, r = dims
            st["vr"] = b2 * st["vr"] + (1 - b2) * g2.mean(axis=c,
                                                          keepdims=True)
            st["vc"] = b2 * st["vc"] + (1 - b2) * g2.mean(axis=r,
                                                          keepdims=True)
            r_factor = st["vr"] / jnp.maximum(
                st["vr"].mean(axis=r, keepdims=True), 1e-30)
            u = g * jax.lax.rsqrt(r_factor * st["vc"] + 1e-30)
        else:
            st["v"], vv = update_buffer_lerp(st["v"], g2, b2, rng)
            u = g * jax.lax.rsqrt(vv + 1e-30)
        rms = jnp.sqrt(jnp.mean(jnp.square(u)) + 1e-12)
        u = u / jnp.maximum(1.0, rms / clip_threshold)
        st["m"], m = update_buffer_lerp(st["m"], u, b1, rng)
        if dims is not None:
            # confidence-residual factorization
            res = jnp.square(u - m) + eps2
            st["ur"] = b3 * st["ur"] + (1 - b3) * res.mean(axis=c,
                                                           keepdims=True)
            st["uc"] = b3 * st["uc"] + (1 - b3) * res.mean(axis=r,
                                                           keepdims=True)
            r_f = st["ur"] / jnp.maximum(
                st["ur"].mean(axis=r, keepdims=True), 1e-30)
            upd = m * jax.lax.rsqrt(r_f * st["uc"] + 1e-30)
        else:
            upd = m
        return upd, st

    return make_optimizer(init_param, update_param, cfg)
