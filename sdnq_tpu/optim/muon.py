"""Muon optimizer with Newton-Schulz orthogonalization.

Re-design of the reference's Muon (/root/reference/src/sdnq/optim/muon.py:37-365):
  * momentum + NS5 orthogonalization of 2D updates (bf16 iterations on the
    MXU), nesterov option;
  * automatic param split: ndim <= 1 (or tiny) params fall back to an
    AdamW-style update (reference :48-72);
  * optional **quantized-matmul NS iterations** — the three GEMMs inside
    each NS step run as dynamic-int8 scaled matmuls (reference
    zeropower_via_newtonschulz5_quantized_matmul :308-365);
  * rms-scaled update normalization (muon norm mode: *0.2*sqrt(max(dims))).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import OptConfig, quantize_buffer, update_buffer_lerp
from .optimizers import make_optimizer

__all__ = ["muon", "zeropower_via_newtonschulz5"]

_NS_COEFFS = (3.4445, -4.7750, 2.0315)


def _ns_matmuls_quantized(x):
    from ..quant.core import quantize_int_mm
    from ..kernels.scaled_mm import scaled_mm

    def mm(a, b_t):
        a_q, a_s = quantize_int_mm(a, axis=-1)
        b_q, b_s = quantize_int_mm(b_t, axis=-1)
        return scaled_mm(a_q, b_q, a_s, b_s, None, out_dtype=jnp.float32)

    a_c, b_c, c_c = _NS_COEFFS
    gram = mm(x, x)                       # X Xᵀ
    gram2 = mm(gram, gram.T)              # (X Xᵀ)²
    b_mat = b_c * gram + c_c * gram2
    return a_c * x + mm(b_mat, x.T)


def _ns_matmuls(x):
    a_c, b_c, c_c = _NS_COEFFS
    gram = x @ x.T
    b_mat = b_c * gram + c_c * (gram @ gram)
    return a_c * x + b_mat @ x


def zeropower_via_newtonschulz5(g: jax.Array, steps: int = 5,
                                use_quantized_matmul: bool = False,
                                dtype=jnp.bfloat16) -> jax.Array:
    """Approximate orthogonalization: returns U Vᵀ of the SVD of g
    (reference muon.py:251-305)."""
    x = g.astype(jnp.float32)
    transposed = x.shape[0] > x.shape[1]
    if transposed:
        x = x.T
    x = x / jnp.maximum(jnp.linalg.norm(x), 1e-7)
    x = x.astype(dtype)
    step_fn = _ns_matmuls_quantized if use_quantized_matmul else _ns_matmuls
    for _ in range(steps):
        x = step_fn(x.astype(dtype)).astype(dtype)
    x = x.astype(jnp.float32)
    if transposed:
        x = x.T
    return x


def muon(lr=2e-2, momentum=0.95, nesterov=True, ns_steps=5,
         adamw_lr=3e-4, b1=0.9, b2=0.95, eps=1e-8, weight_decay=0.0,
         use_quantized_matmul_ns=False, **kw):
    kw.setdefault("use_kahan", True)
    cfg = OptConfig(lr=lr, weight_decay=weight_decay, eps=eps, **kw)

    def is_muon_param(v):
        return v.ndim >= 2 and min(v.shape[-2:]) >= 16

    def init_param(v, cfg):
        if is_muon_param(v):
            m = jnp.zeros(v.shape, jnp.float32)
            if cfg.quantize_state:
                m = quantize_buffer(m)
            return {"m": m, "muon": True}
        m = jnp.zeros(v.shape, jnp.float32)
        s = jnp.zeros(v.shape, jnp.float32)
        return {"m": m, "v": s, "muon": False}

    def update_param(g, st, v, cfg, step, rng):
        if st["muon"]:
            st["m"], m = update_buffer_lerp(st["m"], g, momentum, rng)
            u = g + momentum * m if nesterov else m
            shape = u.shape
            u2 = u.reshape(shape[0], -1) if u.ndim > 2 else u
            o = zeropower_via_newtonschulz5(
                u2, ns_steps, use_quantized_matmul=use_quantized_matmul_ns)
            # muon scaling: 0.2 * sqrt(max(n, m)) (keller jordan variant)
            o = o * (0.2 * (max(u2.shape) ** 0.5))
            return o.reshape(shape), st
        # AdamW fallback branch, scaled to the adamw_lr ratio
        st["m"] = momentum_m = b1 * st["m"] + (1 - b1) * g
        st["v"] = vv = b2 * st["v"] + (1 - b2) * jnp.square(g)
        t = step.astype(jnp.float32)
        m_hat = momentum_m / (1 - b1 ** t)
        v_hat = vv / (1 - b2 ** t)
        return (adamw_lr / lr) * m_hat / (jnp.sqrt(v_hat) + eps), st

    return make_optimizer(init_param, update_param, cfg)
