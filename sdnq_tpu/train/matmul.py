"""Trainable quantized matmuls (custom_vjp).

The TPU re-design of the reference's 18 autograd forward/backward variants
(/root/reference/src/sdnq/training/layers/linear/*): 4 matmul dtypes ×
{static, dynamic} × {save-quantized-activations, recompute} + 2 plain.  In
JAX the variant choice is trace-time (flags on the QTensor meta / call),
and gradient flow works without master weights via a **delta carrier**:

    TrainQTensor = (QTensor, delta)   with delta = zeros_like(W)

The custom_vjp primal computes from the *stored quantized* weight (static
int8/fp8 MXU matmul, reference linear_int8.py:89-123) and ignores delta;
the backward returns dL/dW into delta's cotangent (grad_weight = gᵀ·x,
grad_input = g·Wᵀ, both as dynamic-int8 GEMMs like
linear_int8_dynamic.py:82-150).  The optimizer applies the update as
``requantize(dequant(qt) + update)`` with stochastic rounding — exactly the
reference's SDNQTensor.copy_ semantics (training/tensor.py:309-336).

"ckpt" variants: with ``save_quantized_activations=True`` the forward saves
int8 activations (pre-quantized along the grad-weight contraction) for the
backward (reference linear_int8_ckpt.py); otherwise raw activations are
saved and jax.checkpoint/remat policies decide their fate.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..formats import get_format
from ..kernels.scaled_mm import scaled_mm, scaled_mm_fused_act, \
    bf16_scaled_mm, dynamic_mm_tn
from ..quant.core import quantize_fp_mm, quantize_int_mm, quantize_uint_mm
from ..tensor import QTensor, dequantize
from ..layers import _quantized_matmul_2d, _weight_only_linear_2d

__all__ = ["TrainQTensor", "make_train_params", "train_qlinear",
           "extract_weight_grads", "apply_weight_updates",
           "value_and_grad", "grad", "DynamicTensor", "dynamic_qlinear"]


def value_and_grad(fn, argnums=0, **kwargs):
    """jax.value_and_grad that tolerates quantized (integer-storage) leaves
    in the differentiated pytree — int leaves receive float0 cotangents and
    the weight gradients arrive in each TrainQTensor's ``delta``."""
    return jax.value_and_grad(fn, argnums=argnums, allow_int=True, **kwargs)


def grad(fn, argnums=0, **kwargs):
    return jax.grad(fn, argnums=argnums, allow_int=True, **kwargs)


@partial(jax.tree_util.register_dataclass, data_fields=["qt", "delta"],
         meta_fields=[])
@dataclasses.dataclass
class TrainQTensor:
    """Quantized parameter + gradient-carrier delta (always zeros)."""
    qt: QTensor
    delta: jax.Array

    @property
    def shape(self):
        return self.qt.meta.original_shape


def make_train_params(params):
    """Wrap every QTensor leaf in a TrainQTensor with a zero delta."""
    def wrap(leaf):
        if isinstance(leaf, QTensor):
            return TrainQTensor(
                qt=leaf,
                delta=jnp.zeros(leaf.meta.original_shape, jnp.float32))
        return leaf
    return jax.tree_util.tree_map(
        wrap, params, is_leaf=lambda x: isinstance(x, QTensor))


def extract_weight_grads(grad_tree):
    """Pull the delta cotangents out of a grad pytree (QTensor leaves carry
    zero/float0 cotangents)."""
    def unwrap(leaf):
        if isinstance(leaf, TrainQTensor):
            return leaf.delta
        return leaf
    return jax.tree_util.tree_map(
        unwrap, grad_tree, is_leaf=lambda x: isinstance(x, TrainQTensor))


def apply_weight_updates(params, updates, rng=None):
    """new_W = dequant(qt) + update, re-quantized in place (stochastic
    rounding when rng given)."""
    from ..tensor import quantize_tensor

    flat_p, treedef = jax.tree_util.tree_flatten(
        params, is_leaf=lambda x: isinstance(x, (QTensor, TrainQTensor)))
    flat_u, _ = jax.tree_util.tree_flatten(
        updates, is_leaf=lambda x: x is None)
    out = []
    i = 0
    for p in flat_p:
        u = flat_u[i] if i < len(flat_u) else None
        i += 1
        if isinstance(p, TrainQTensor):
            p = p.qt
        if isinstance(p, QTensor) and u is not None:
            meta = p.meta
            w_new = dequantize(p, jnp.float32) + u.astype(jnp.float32)
            out.append(quantize_tensor(
                w_new, meta.fmt, meta.layer_kind,
                matmul_fmt=meta.matmul_fmt,
                group_size=meta.group_size,
                hadamard_group_size=meta.hadamard_group_size,
                svd_rank=meta.svd_rank or 32,
                use_svd=meta.svd_rank > 0,
                use_hadamard=meta.use_hadamard,
                use_quantized_matmul=meta.use_quantized_matmul,
                use_stochastic_rounding=rng is not None,
                dequant_dtype=meta.dequant_dtype,
                rng=rng))
        elif u is not None and hasattr(p, "dtype"):
            out.append((p.astype(jnp.float32)
                        + u.astype(jnp.float32)).astype(p.dtype))
        else:
            out.append(p)
    return jax.tree_util.tree_unflatten(treedef, out)


# ---------------------------------------------------------------------------
# The trainable linear op
# ---------------------------------------------------------------------------

def _uint8_zp_rows(b_q, b_s, b_zp, kdim):
    """Weight-side zero-point rank-1 rows for the asymmetric GEMM
    (the double-zero-point algebra, reference linear_uint8_dynamic.py)."""
    colsum = jnp.sum(b_q.astype(jnp.int32), axis=-1)[None, :] \
        .astype(jnp.float32)
    s = b_s.reshape(1, -1)
    z = b_zp.reshape(1, -1)
    return z, colsum * s + float(kdim) * z


def _exec_fmt(mm_fmt: str) -> str:
    """Execution matmul family for ``mm_fmt`` on this chip: fp8 requests
    route to int8 execution on TPUs without an fp8 MXU (storage and API
    stay fp8; see kernels/dispatch.route_fp8_to_int8).  Forward emit,
    saved-activation quantize, and backward GEMMs all use this so the
    residual codes and the kernels that consume them agree."""
    f = get_format(mm_fmt)
    if not f.is_integer and f.num_bits == 8:
        from ..kernels.dispatch import route_fp8_to_int8
        if route_fp8_to_int8():
            return "int8"
    return mm_fmt


def _dynamic_mm(a: jax.Array, b_t: jax.Array, mm_fmt: str = "int8",
                out_dtype=jnp.float32) -> jax.Array:
    """a (M, K) fp × b_t (N, K) fp -> (M, N): both operands quantized
    per-call in the family of `mm_fmt` — backward GEMMs run in the layer's
    own matmul dtype, like the reference's per-family dynamic matmuls
    (linear_int8_dynamic.py:82, linear_uint8_dynamic.py,
    linear_fp8_dynamic.py:105-140, linear_fp16_dynamic.py; on TPU the fp16
    family maps to bf16 multiplies with fp32 accumulation, which needs no
    overflow-guard scaling).  The a-side quantize runs in the fused kernel
    prologue."""
    f = get_format(mm_fmt)
    b_t = b_t.astype(jnp.float32)
    if f.is_integer and not f.is_unsigned:
        b_q, b_s = quantize_int_mm(b_t, axis=-1)
        return scaled_mm_fused_act(a, b_q, b_s, None, x_fmt="int8",
                                   out_dtype=out_dtype)
    if f.is_integer:
        b_q, b_s, b_zp = quantize_uint_mm(b_t, axis=-1)
        z0, z1 = _uint8_zp_rows(b_q, b_s, b_zp, a.shape[-1])
        return scaled_mm_fused_act(a, b_q, b_s, None, x_fmt="uint8",
                                   out_dtype=out_dtype, v_zp0=z0, v_zp1=z1)
    if f.num_bits == 8:
        b_q, b_s = quantize_fp_mm(b_t, axis=-1, fmt=f)
        return scaled_mm_fused_act(a, b_q, b_s, None, x_fmt=f.name,
                                   out_dtype=out_dtype)
    return bf16_scaled_mm(a, b_t, None, None, None, out_dtype=out_dtype)


def _dynamic_int8_mm(a, b_t, out_dtype=jnp.float32):
    return _dynamic_mm(a, b_t, "int8", out_dtype)


def _dynamic_mm_nn(a: jax.Array, b: jax.Array, mm_fmt: str = "int8",
                   out_dtype=jnp.float32) -> jax.Array:
    """a (M, C) fp × b (C, N) fp -> (M, N) contracting b's *leading* axis:
    the grad-input GEMM in natural layouts.  b is quantized columnwise (per
    out-col n, one fused XLA reduce — no (C, N) transpose materialized); a
    quantizes per-row in the fused kernel prologue."""
    f = get_format(mm_fmt)
    bf = b.astype(jnp.float32)
    if f.is_integer and not f.is_unsigned:
        b_q, b_s = quantize_int_mm(bf, axis=0)
        return scaled_mm_fused_act(a, b_q, b_s.reshape(-1), None,
                                   x_fmt="int8", out_dtype=out_dtype,
                                   b_layout="nn")
    if f.is_integer:
        # asymmetric b (per col n): b = b_q·s + zp ⇒ out += rowsum(a) ⊗ zp
        b_q, b_s, b_zp = quantize_uint_mm(bf, axis=0)
        u = jnp.sum(a.astype(jnp.float32), axis=1, keepdims=True)
        v = b_zp.reshape(1, -1).astype(jnp.float32)
        return scaled_mm_fused_act(a, b_q, b_s.reshape(-1), None,
                                   x_fmt="int8", out_dtype=out_dtype,
                                   b_layout="nn", lowrank_u=u, lowrank_v=v)
    if f.num_bits == 8:
        b_q, b_s = quantize_fp_mm(bf, axis=0, fmt=f)
        return scaled_mm_fused_act(a, b_q, b_s.reshape(-1), None,
                                   x_fmt=f.name, out_dtype=out_dtype,
                                   b_layout="nn")
    acc = jax.lax.dot_general(a.astype(jnp.bfloat16),
                              bf.astype(jnp.bfloat16),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return acc.astype(out_dtype)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _train_linear(x2d, delta, qt, bias, save_q_acts, use_quantized_matmul):
    return _fwd_value(x2d, qt, bias, use_quantized_matmul)


def _fwd_value(x2d, qt, bias, use_quantized_matmul, emit_quantized=False):
    if use_quantized_matmul and qt.meta.use_quantized_matmul \
            and x2d.shape[0] >= 32:
        return _quantized_matmul_2d(x2d, qt, bias, jnp.bfloat16,
                                    emit_quantized=emit_quantized)
    assert not emit_quantized
    return _weight_only_linear_2d(x2d, qt, bias, jnp.bfloat16)


def _fused_emit_eligible(qt, m_rows, use_quantized_matmul) -> bool:
    """True when the forward takes the fused static matmul path, whose
    kernel can emit its rowwise-quantized input as the ckpt residual
    (scaled_mm_fused_act emit_quantized) — trace-time decidable, so
    forward and backward agree by construction.  Covers symmetric
    int8/fp8 (residual = (x_q, s)) and the asymmetric uint8 family
    (residual = (x_q, s, zp): signed codes + per-row affine; the
    grad-weight adds one rank-1 (gᵀ·zp) ⊗ 1_K term)."""
    meta = qt.meta
    if not (use_quantized_matmul and meta.use_quantized_matmul
            and m_rows >= 32 and not meta.re_quantize_for_matmul):
        return False
    mfmt = meta.matmul_format
    if mfmt.is_integer:
        # packed sub-byte storage rides a uint8 *container*, not a uint8
        # matmul operand — it must never claim the fused static path
        return (not meta.is_packed
                and qt.qdata.dtype in (jnp.int8, jnp.uint8))
    return mfmt.num_bits == 8


def _train_linear_fwd(x2d, delta, qt, bias, save_q_acts,
                      use_quantized_matmul):
    # structural markers: dtype rides in a zero-size token array; bias-ness
    # in None-vs-token structure (strings/dtypes are not pytree leaves)
    dtype_token = jnp.zeros((0,), x2d.dtype)
    b_marker = None if bias is None else jnp.zeros((0,), jnp.float32)
    if save_q_acts and _fused_emit_eligible(qt, x2d.shape[0],
                                            use_quantized_matmul):
        # the forward kernel emits its own rowwise-quantized input (one
        # extra int8 store; zero extra quantize passes).  The backward
        # folds the row scales into the cotangent before its columnwise
        # quantize: gw[n,k] = sum_m g[m,n]*s_x[m] * xq[m,k].  The asym
        # (uint8) family emits a third zp row (x = xq*s + zp).
        y, *res = _fwd_value(x2d, qt, bias, use_quantized_matmul,
                             emit_quantized=True)
        return y, (tuple(res), qt, b_marker, dtype_token)
    y = _fwd_value(x2d, qt, bias, use_quantized_matmul)
    if save_q_acts:
        # pre-quantize along the grad-weight contraction — columnwise (per
        # feature k, over the token axis M) in *natural* (M, K) layout: the
        # TN grad-weight kernel contracts leading axes, so no transpose is
        # ever materialized.  Saved in the layer's own matmul-dtype family
        # (reference saves int8 in the int8 _ckpt variant, fp8 in the fp8
        # one, …: linear_*_ckpt.py)
        f = get_format(_exec_fmt(qt.meta.matmul_fmt))
        xf = x2d.astype(jnp.float32)
        if f.is_integer and not f.is_unsigned:
            saved = quantize_int_mm(xf, axis=0)
        elif f.is_integer:
            saved = quantize_uint_mm(xf, axis=0)
        elif f.num_bits == 8:
            saved = quantize_fp_mm(xf, axis=0, fmt=f)
        else:
            saved = (xf.astype(jnp.bfloat16),)
    else:
        saved = (x2d,)
    return y, (saved, qt, b_marker, dtype_token)


def _train_linear_bwd(save_q_acts, use_quantized_matmul, res, g):
    saved, qt, b_marker, dtype_token = res
    # keep the cotangent in its native (bf16) dtype: the kernels upcast
    # per-chunk in VMEM — an eager astype(f32) would materialize a 2x
    # larger copy in HBM and double the g read traffic of every bwd GEMM
    g2d = g.reshape(-1, g.shape[-1])
    mm_fmt = _exec_fmt(qt.meta.matmul_fmt)

    # grad_input = g @ W  (reference linear_int8.py:125-163).  When the
    # stored weight already IS a row-wise int8/uint8 matmul operand, reuse
    # it directly instead of dequantize+requantize: the per-row scale rides
    # the contraction axis, so it folds into the gradient —
    #   g @ (W_q·s + zp·1ᵀ) = (g·sᵀ) @ W_q + (g @ zp) · 1ᵀ
    # and the zero-point / SVD corrections become rank-1/rank-R epilogue
    # terms of the fused kernel.  The backward then reads the weight at
    # 1 byte/value with no f32 round-trip through HBM.
    meta = qt.meta
    mfmt = meta.matmul_format
    q2d = qt.qdata
    if q2d.ndim > 2:
        q2d = q2d.reshape(q2d.shape[0], -1)
    fast = (meta.use_quantized_matmul and not meta.re_quantize_for_matmul
            and mfmt.is_integer and not meta.is_packed
            and q2d.dtype in (jnp.int8, jnp.uint8)
            and qt.scale.size == q2d.shape[0])
    if fast:
        from ..layers import _weight_as_int8
        from ..quant.hadamard import rotate_hadamard
        w_q, w_s, w_zp = _weight_as_int8(qt)
        u_cols, v_rows = [], []
        if w_zp is not None:
            u_cols.append(g2d @ w_zp.reshape(-1, 1))
            v_rows.append(jnp.ones((1, w_q.shape[1]), jnp.float32))
        if qt.svd_up is not None:
            u_cols.append(g2d @ qt.svd_up.astype(jnp.float32))
            v_rows.append(qt.svd_down.astype(jnp.float32))
        u = jnp.concatenate(u_cols, axis=-1) if u_cols else None
        v = jnp.concatenate(v_rows, axis=0) if v_rows else None
        # the g·w_s prescale rides the kernel's quantize prologue
        # (x_colscale) — no scaled copy of the cotangent hits HBM; the
        # output is written directly in the caller's dtype (a f32 write +
        # recast would cost two extra (M, K) HBM passes)
        gx = scaled_mm_fused_act(g2d, w_q, None, None, x_fmt="int8",
                                 out_dtype=dtype_token.dtype,
                                 b_layout="nn",
                                 lowrank_u=u, lowrank_v=v,
                                 x_colscale=w_s.reshape(-1))
        if meta.use_hadamard:
            # fwd rotated x; W lives in rotated space, so rotate the
            # cotangent back (normalized Hadamard is its own inverse)
            gx = rotate_hadamard(gx, meta.hadamard_group_size,
                                 precision=jax.lax.Precision.DEFAULT)
    else:
        w_deq = dequantize(qt, jnp.float32)
        if w_deq.ndim > 2:
            w_deq = w_deq.reshape(w_deq.shape[0], -1)
        gx = _dynamic_mm_nn(g2d, w_deq, mm_fmt,
                            out_dtype=dtype_token.dtype)

    # grad_weight = gᵀ @ x: TN kernel contracting the token axis of both
    # operands in natural layout; g quantizes columnwise per out-row n.
    f = get_format(mm_fmt)
    if save_q_acts and _fused_emit_eligible(qt, g2d.shape[0],
                                            use_quantized_matmul):
        # residual = the forward kernel's own rowwise-quantized input
        # (x = xq·s_x[m], post-Hadamard).  Fold the row scales into the
        # cotangent so both TN operands are pure int8/fp8:
        #   gw[n,k] = Σ_m (g[m,n]·s_x[m]) · xq[m,k]
        from ..kernels.scaled_mm import scaled_mm_tn
        from ..quant.hadamard import rotate_hadamard
        xzp = None
        if len(saved) == 3:
            xq, xs, xzp = saved       # asym: x = xq*s + zp (signed codes)
        else:
            xq, xs = saved
        gf = g2d * xs.astype(jnp.float32)
        if f.is_integer:
            gq, gs = quantize_int_mm(gf, axis=0)
        else:
            gq, gs = quantize_fp_mm(gf, axis=0, fmt=f)
        u = v = None
        if xzp is not None:
            # gw += (Σ_m g[m,n]·zp[m]) ⊗ 1_K — one skinny (N,1) GEMM as a
            # rank-1 epilogue of the TN kernel, no (M,K) dequant
            u = jax.lax.dot_general(
                g2d.astype(jnp.float32), xzp.astype(jnp.float32),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (N, 1)
            v = jnp.ones((1, xq.shape[1]), jnp.float32)
        gw = scaled_mm_tn(gq, xq, gs.reshape(-1), None,
                          out_dtype=jnp.float32, lowrank_u=u, lowrank_v=v)
        if meta.use_hadamard:
            # xq lives in rotated input space; rotate the grad back
            # (normalized Hadamard is symmetric and its own inverse)
            gw = rotate_hadamard(gw, meta.hadamard_group_size,
                                 precision=jax.lax.Precision.DEFAULT)
    elif save_q_acts and not (f.is_integer or f.num_bits == 8):
        gw = dynamic_mm_tn(g2d, saved[0], mm_fmt)
    elif save_q_acts:
        gw = dynamic_mm_tn(g2d, None, mm_fmt, saved_b=saved)
    else:
        gw = dynamic_mm_tn(g2d, saved[0].astype(jnp.float32), mm_fmt)
    gw = gw.reshape(qt.meta.original_shape)

    gb = (jnp.sum(g2d.astype(jnp.float32), axis=0)
          if b_marker is not None else None)

    # zero cotangents for the QTensor leaves (non-differentiable storage)
    def zero_ct(leaf):
        if leaf is None or not hasattr(leaf, "dtype"):
            return None
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return jnp.zeros_like(leaf)
        import numpy as np
        return np.zeros(leaf.shape, jax.dtypes.float0)
    qt_ct = QTensor(
        qdata=zero_ct(qt.qdata), scale=zero_ct(qt.scale),
        zero_point=zero_ct(qt.zero_point), svd_up=zero_ct(qt.svd_up),
        svd_down=zero_ct(qt.svd_down), meta=qt.meta)

    return gx.astype(dtype_token.dtype), gw, qt_ct, gb


_train_linear.defvjp(_train_linear_fwd, _train_linear_bwd)


def train_qlinear(x: jax.Array, w: TrainQTensor, bias=None, *,
                  save_quantized_activations: bool = False) -> jax.Array:
    """Trainable quantized linear: y = x @ W_qᵀ + b with straight-through
    gradients into w.delta."""
    lead = x.shape[:-1]
    x2d = x.reshape(-1, x.shape[-1])
    y = _train_linear(x2d, w.delta, w.qt, bias,
                      save_quantized_activations,
                      w.qt.meta.use_quantized_matmul)
    return y.reshape(*lead, y.shape[-1])


# ---------------------------------------------------------------------------
# Dynamic-only training matmul (use_static_quantization=False):
# weights stay full precision; both operands quantize per call
# (reference linear_int8_dynamic.py:82-150 + use_static_quantization docs,
# quantizer.py:864-867).  round() has zero gradient, so a straight-through
# custom_vjp supplies the dense grads via dynamic-int8 GEMMs.
# ---------------------------------------------------------------------------

@partial(jax.tree_util.register_dataclass, data_fields=["w"],
         meta_fields=["fmt"])
@dataclasses.dataclass
class DynamicTensor:
    """Full-precision weight that runs its matmuls dynamically quantized
    (the use_static_quantization=False training mode); `fmt` picks the
    matmul-dtype family (int8/uint8/fp8/fp16→bf16)."""
    w: jax.Array
    fmt: str = "int8"

    @property
    def shape(self):
        return self.w.shape


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def dynamic_qlinear_2d(x2d, w, bias, fmt="int8"):
    y = _dynamic_mm(x2d.astype(jnp.float32), w.astype(jnp.float32),
                    fmt, out_dtype=jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(jnp.bfloat16)


def _dyn_fwd(x2d, w, bias, fmt):
    return dynamic_qlinear_2d(x2d, w, bias, fmt), (x2d, w, bias is not None)


def _dyn_bwd(fmt, res, g):
    x2d, w, has_bias = res
    g2d = g.astype(jnp.float32)
    gx = _dynamic_mm_nn(g2d, w.astype(jnp.float32), fmt)
    gw = dynamic_mm_tn(g2d, x2d.astype(jnp.float32), fmt)
    gb = jnp.sum(g2d, axis=0) if has_bias else None
    return gx.astype(x2d.dtype), gw.astype(w.dtype), gb


dynamic_qlinear_2d.defvjp(_dyn_fwd, _dyn_bwd)


def dynamic_qlinear(x, w, bias=None):
    lead = x.shape[:-1]
    fmt = w.fmt if isinstance(w, DynamicTensor) else "int8"
    y = dynamic_qlinear_2d(x.reshape(-1, x.shape[-1]),
                           w.w if isinstance(w, DynamicTensor) else w, bias,
                           fmt)
    return y.reshape(*lead, y.shape[-1])
