"""Muon optimizer with Newton-Schulz orthogonalization.

Re-design of the reference's Muon (/root/reference/src/sdnq/optim/muon.py:37-365):
  * momentum + NS orthogonalization of 2D updates (bf16 iterations on the
    MXU), nesterov option, per-iteration coefficient schedules;
  * **Gram-NS variant** (reference :270-298; coefficients are public data
    from Dao-AILab/gram-newton-schulz): iterates polynomials of the n x n
    Gram matrix R = X Xᵀ instead of the full (n, m) X, with reset steps
    that re-materialize X to stop error accumulation — cheaper whenever
    the update is far from square;
  * **adaptive mode** (reference :123-127, :240-247): sign the momentum
    before NS and rescale by an rsqrt second-moment (v) buffer after;
  * automatic param split: ndim <= 1 (or tiny) params fall back to an
    AdamW-style update (reference :48-72);
  * optional **quantized-matmul NS iterations** — the GEMMs inside each NS
    step run as dynamic-int8 scaled matmuls (reference
    zeropower_via_newtonschulz5_quantized_matmul :308-365);
  * rms-scaled update normalization (muon norm mode: *0.2*sqrt(max(dims))).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import OptConfig, quantize_buffer, update_buffer_lerp
from .optimizers import make_optimizer

__all__ = ["muon", "zeropower_via_newtonschulz5"]

# Classic 5-step NS schedule (same triple each step).
NS_COEFFICIENTS = ((3.4445, -4.7750, 2.0315),) * 5

# Tuned Gram-NS schedule + reset steps — numerical constants from the public
# Dao-AILab/gram-newton-schulz repo (carried as data, like the reference).
GRAM_NS_RESETS = (2,)
GRAM_NS_COEFFICIENTS = (
    (7.892582874424408, -20.38301394587957, 13.555306149406924),
    (3.911484868135431, -2.5464635929060884, 0.4268988319673074),
    (3.760657955697423, -2.512819018216563, 0.4323647349070073),
    (3.160399673686287, -2.149649518898498, 0.3996366907664389),
    (2.1910971618617303, -1.441662010214663, 0.328146487623155),
)


def _make_mm(use_quantized: bool, dtype):
    """Returns mm(a, b) -> a @ b in the NS working dtype.

    Quantized variant: both operands dynamically int8-quantized per row /
    per column, product on the int8 MXU via the fused scaled-mm kernel."""
    if not use_quantized:
        def mm(a, b):
            return jnp.dot(a.astype(dtype), b.astype(dtype),
                           preferred_element_type=jnp.float32).astype(dtype)
        return mm

    from ..kernels.scaled_mm import scaled_mm
    from ..quant.core import quantize_int_mm

    def mm(a, b):
        a_q, a_s = quantize_int_mm(a, axis=-1)
        b_q, b_s = quantize_int_mm(b.T, axis=-1)
        return scaled_mm(a_q, b_q, a_s, b_s, None,
                         out_dtype=jnp.float32).astype(dtype)
    return mm


def zeropower_via_newtonschulz5(
    g: jax.Array,
    steps: int | None = None,
    *,
    ns_coefficients=NS_COEFFICIENTS,
    clip: float = 1.0,
    use_gram_ns: bool = False,
    gram_ns_resets=GRAM_NS_RESETS,
    gram_ns_coefficients=GRAM_NS_COEFFICIENTS,
    use_quantized_matmul: bool = False,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """Approximate orthogonalization: returns ~U Vᵀ of the SVD of g
    (reference muon.py:251-305)."""
    if steps is not None and len(ns_coefficients) != steps:
        ns_coefficients = (tuple(ns_coefficients)
                           * -(-steps // len(ns_coefficients)))[:steps]
    x = g.astype(jnp.float32)
    transposed = x.shape[0] > x.shape[1]
    if transposed:
        x = x.T
    x = x / jnp.maximum(jnp.linalg.norm(x), 1e-7)
    x = jnp.clip(jnp.nan_to_num(x), -clip, clip).astype(dtype)
    mm = _make_mm(use_quantized_matmul, dtype)

    if use_gram_ns and x.shape[0] != x.shape[1]:
        # Polynomial accumulation on the n x n Gram matrix: maintain
        # Q = p(R) with R tracking the Gram of the transformed X; the
        # final X = Q X applies all steps at once.  Reset steps
        # re-materialize X (and restart Q) to bound error growth.
        r = mm(x, x.T)
        eye = jnp.eye(r.shape[0], dtype=dtype)
        q = None
        n_steps = len(gram_ns_coefficients)
        for i, (a, b, c) in enumerate(gram_ns_coefficients):
            if q is not None and i in gram_ns_resets:
                x = mm(q, x)
                r = mm(x, x.T)
                q = None
            z = (b * r + c * mm(r, r)).astype(dtype)
            if q is None:
                q = (z + a * eye).astype(dtype)
            else:
                q = (a * q + mm(q, z)).astype(dtype)
            if i < n_steps - 1 and (i + 1) not in gram_ns_resets:
                rz = (a * r + mm(r, z)).astype(dtype)
                r = (a * rz + mm(z, rz)).astype(dtype)
        x = mm(q, x)
    else:
        for a, b, c in ns_coefficients:
            gram = mm(x, x.T)
            b_mat = (b * gram + c * mm(gram, gram)).astype(dtype)
            x = (a * x + mm(b_mat, x)).astype(dtype)

    x = x.astype(jnp.float32)
    if transposed:
        x = x.T
    return x


def muon(lr=2e-2, momentum=0.95, nesterov=True, ns_steps=5,
         adamw_lr=3e-4, b1=0.9, b2=0.95, eps=1e-8, weight_decay=0.0,
         adaptive=False, clip=1.0,
         ns_coefficients=NS_COEFFICIENTS,
         use_gram_ns=False, gram_ns_resets=GRAM_NS_RESETS,
         gram_ns_coefficients=GRAM_NS_COEFFICIENTS,
         use_quantized_matmul_ns=False, **kw):
    kw.setdefault("use_kahan", True)
    cfg = OptConfig(lr=lr, weight_decay=weight_decay, eps=eps, **kw)

    def is_muon_param(v):
        return v.ndim >= 2 and min(v.shape[-2:]) >= 16

    def init_param(v, cfg):
        if is_muon_param(v):
            m = jnp.zeros(v.shape, jnp.float32)
            st = {"muon": True}
            if cfg.quantize_state:
                st["m"] = quantize_buffer(m)
                if adaptive:
                    st["v"] = quantize_buffer(
                        jnp.zeros(v.shape, jnp.float32), unsigned=True)
            else:
                st["m"] = m
                if adaptive:
                    st["v"] = jnp.zeros(v.shape, jnp.float32)
            return st
        m = jnp.zeros(v.shape, jnp.float32)
        s = jnp.zeros(v.shape, jnp.float32)
        return {"m": m, "v": s, "muon": False}

    def update_param(g, st, v, cfg, step, rng):
        if st["muon"]:
            st["m"], m = update_buffer_lerp(st["m"], g, momentum, rng)
            u = g + momentum * m if nesterov else m
            if adaptive:
                # sign before NS; second-moment rescale after
                # (reference muon.py:199-201, :240-247)
                u = jnp.sign(u)
            shape = u.shape
            u2 = u.reshape(shape[0], -1) if u.ndim > 2 else u
            o = zeropower_via_newtonschulz5(
                u2, ns_steps,
                ns_coefficients=ns_coefficients,
                clip=clip,
                use_gram_ns=use_gram_ns,
                gram_ns_resets=gram_ns_resets,
                gram_ns_coefficients=gram_ns_coefficients,
                use_quantized_matmul=use_quantized_matmul_ns)
            o = o.reshape(shape)
            if adaptive:
                st["v"], vv = update_buffer_lerp(st["v"], jnp.square(o),
                                                 b2, rng)
                v_hat = vv / (1 - b2 ** step.astype(jnp.float32))
                o = o * jax.lax.rsqrt(v_hat + eps)
                o = jnp.clip(jnp.nan_to_num(o), -clip, clip)
            # muon scaling: 0.2 * sqrt(max(n, m)) (keller jordan variant)
            o = o * (0.2 * (max(u2.shape) ** 0.5))
            return o, st
        # AdamW fallback branch, scaled to the adamw_lr ratio
        st["m"] = momentum_m = b1 * st["m"] + (1 - b1) * g
        st["v"] = vv = b2 * st["v"] + (1 - b2) * jnp.square(g)
        t = step.astype(jnp.float32)
        m_hat = momentum_m / (1 - b1 ** t)
        v_hat = vv / (1 - b2 ** t)
        return (adamw_lr / lr) * m_hat / (jnp.sqrt(v_hat) + eps), st

    return make_optimizer(init_param, update_param, cfg)
