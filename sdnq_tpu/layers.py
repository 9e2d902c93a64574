"""Functional quantized layer forwards.

The TPU re-design of the reference's wrapper-class forwards
(/root/reference/src/sdnq/layers/linear/*.py, conv/*.py,
embedding/forward.py): instead of swapping bound methods on nn.Module
clones, these are pure functions dispatching **at trace time** on the
QTensor's static metadata — every runtime `if` in the reference becomes a
Python-level branch baked into one XLA program.

Paths per layer:
  * plain (weight-only quant): fused unpack+dequant+matmul Pallas kernel
    (kernels/dequant_mm.py) — never materializes the bf16 weight in HBM,
    which the reference's dequantize-then-F.linear path does.
  * quantized matmul: per-token activation quantization feeding the int8 /
    fp8 MXU via the fused scaled-matmul kernel, with the reference's
    zero-point fold algebra (linear_uint8.py:62-68) and SVD-as-bias fold
    (linear_int8.py:54-59).
  * small-batch bail-out (rows < 32): trace-time static, since shapes are
    static under jit (reference does this check at runtime: linear_int8.py:97).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .kernels.dequant_mm import dequant_matmul
from .kernels.scaled_mm import scaled_mm, scaled_mm_fused_act, bf16_scaled_mm
from .quant.core import quantize_int_mm, quantize_uint_mm, quantize_fp_mm
from .quant.hadamard import rotate_hadamard
from .tensor import QTensor, dequantize

__all__ = ["qlinear", "qconv", "qembedding"]

def _min_matmul_rows() -> int:
    # reference: layers/linear/linear_int8.py:97; SDNQ_TPU_MIN_MATMUL_ROWS
    from .envconfig import env_int
    return env_int("SDNQ_TPU_MIN_MATMUL_ROWS", 32)


# ---------------------------------------------------------------------------
# Helpers
# ---------------------------------------------------------------------------

def _flatten_batch(x):
    lead = x.shape[:-1]
    rows = 1
    for d in lead:
        rows *= d
    return x.reshape(rows, x.shape[-1]), lead


def _svd_bias(x2d, qt: QTensor, bias, out_dtype):
    """bias' = bias + (x @ down.T) @ up.T  (SVD correction folded into the
    bias operand of the quantized matmul)."""
    if qt.svd_up is None:
        return bias
    dt = qt.svd_down.dtype
    corr = (x2d.astype(dt) @ qt.svd_down.T) @ qt.svd_up.T
    if bias is not None:
        corr = corr + bias.astype(corr.dtype)
    return corr


def _weight_as_int8(qt: QTensor):
    """Stored row-wise int8/uint8 weight -> (w_i8, w_scale(O,1), w_zp or None).

    uint8 storage feeds the signed MXU via the xor-128 shift with the
    zero-point absorbed (reference linear_uint8.py:43-48)."""
    q = qt.qdata
    if q.ndim > 2:  # conv weights flatten to (O, C*prod(k)) for the GEMM
        q = q.reshape(q.shape[0], -1)
    scale = qt.scale.reshape(qt.scale.shape[0], -1)  # (O, 1) row-wise
    if q.dtype == jnp.uint8:
        w_i8 = (q ^ jnp.uint8(128)).astype(jnp.int8)
        zp = qt.zero_point.reshape(scale.shape) if qt.zero_point is not None \
            else jnp.zeros_like(scale)
        zp = zp + scale * 128.0
        return w_i8, scale, zp
    return q, scale, qt.zero_point.reshape(scale.shape) if qt.zero_point is not None else None


def _requantize_rowwise(qt: QTensor, mfmt=None):
    """Group-wise / packed storage -> row-wise matmul operands on the fly
    (reference: dequantizer.py:115-179).  Dequantizes without SVD and
    without undoing the Hadamard rotation (both are handled at the input
    side of the matmul).  ``mfmt`` overrides the target matmul format
    (fp8-to-int8 execution routing on chips without an fp8 MXU)."""
    wd = dequantize(qt, dtype=jnp.float32, with_svd=False, with_hadamard=False)
    if wd.ndim > 2:
        wd = wd.reshape(wd.shape[0], -1)
    if mfmt is None:
        mfmt = qt.meta.matmul_format
    if mfmt.is_integer:
        if mfmt.is_unsigned:
            w_q, s, zp = quantize_uint_mm(wd, axis=-1)
            return w_q, s, zp
        w_q, s = quantize_int_mm(wd, axis=-1)
        return w_q, s, None
    if mfmt.num_bits == 8:
        w_q, s = quantize_fp_mm(wd, axis=-1, fmt=mfmt)
        return w_q, s, None
    # 16-bit: bf16 scaled path
    s = jnp.max(jnp.abs(wd), axis=-1, keepdims=True)
    s = jnp.maximum(s, 2.0 ** -126)
    return (wd / s).astype(jnp.bfloat16), s, None


def _quantized_matmul_2d(x2d, qt: QTensor, bias, out_dtype,
                         emit_quantized=False):
    """Core quantized GEMM on (M, C) input with all folds applied.

    The SVD correction and the uint8 zero-point algebra become rank-R
    epilogue terms of the fused kernel (scaled_mm lowrank_u/v) — one kernel
    launch, no (M, O) bias materialization.

    emit_quantized: return the kernel's rowwise-quantized input as the
    activation residual for ckpt training — ``(y, x_q, x_scale)`` for the
    symmetric int8 / fp8 families, ``(y, x_q, x_scale, x_zp)`` for the
    asymmetric uint8 family (signed codes + per-row affine
    ``x = x_q*scale + zp``).  NOTE: with use_hadamard the
    emitted x_q is the *rotated* input; the grad-weight built from it lives
    in rotated space and must be rotated back (train/matmul does this)."""
    meta = qt.meta
    mfmt = meta.matmul_format

    # Stacked-layer view (scan-over-layers models): the symmetric rowwise
    # int8 path feeds the stacked (L, O, K) buffer straight into the fused
    # kernel with a scalar-prefetch layer index — no per-iteration weight
    # copy.  Every other path slices explicitly (the old scan cost).
    if qt.layer is not None:
        from .kernels.dispatch import use_pallas
        kdim = x2d.shape[-1]
        stacked_fast = (
            not meta.re_quantize_for_matmul and not emit_quantized
            and qt.svd_up is None and qt.zero_point is None
            and mfmt.is_integer and not mfmt.is_unsigned
            and qt.qdata.ndim == 3 and qt.qdata.dtype == jnp.int8
            and kdim % 128 == 0 and 256 <= kdim <= 16384
            and x2d.shape[0] >= 16 and use_pallas())
        if not stacked_fast:
            from .tensor import slice_stacked_layer
            qt = slice_stacked_layer(qt)

    # fp8-on-TPU execution routing: chips without an fp8 MXU run fp8 dots
    # at the bf16 rate (~1.0x measured); execute on the int8 MXU instead,
    # storage untouched (reference capability-flag pattern:
    # kernel_wrappers.py:11-105).
    from .kernels.dispatch import route_fp8_to_int8
    routed_fp8 = (not mfmt.is_integer and mfmt.num_bits == 8
                  and route_fp8_to_int8())
    if routed_fp8:
        from .formats import get_format
        mfmt = get_format("int8")

    if meta.use_hadamard:
        x2d = rotate_hadamard(x2d, meta.hadamard_group_size,
                              precision=jax.lax.Precision.DEFAULT)

    # SVD as a low-rank epilogue: y += (x @ down.T) @ up.T
    # (reference folds it into the bias operand: linear_int8.py:54-59)
    u_cols, v_cols = [], []
    if qt.svd_up is not None:
        u_cols.append((x2d.astype(jnp.float32)
                       @ qt.svd_down.T.astype(jnp.float32)))
        v_cols.append(qt.svd_up.T.astype(jnp.float32))

    if meta.re_quantize_for_matmul:
        from .envconfig import env_int
        packed_mm_max = env_int("SDNQ_TPU_PACKED_MM_MAX_ROWS", 8192)
        if meta.is_packed and mfmt.is_integer \
                and not emit_quantized and x2d.shape[0] < packed_mm_max:
            # packed int weights: fused kernel runs the int8 MXU dots on
            # the raw sub-byte codes with GROUP-wise scales intact — no
            # materialized re-quantized operand, strictly more accurate
            # than the reference's rowwise re_quantize_matmul route.
            # Unsigned storage (uint4 etc., mfmt uint8) routes here too:
            # the kernel's zero-point rank-G dot carries the asymmetric
            # offset exactly; only the ACTIVATION quantization differs
            # (symmetric int8 instead of asymmetric uint8 — an execution-
            # format routing like fp8-to-int8, r4: uint4:128:q measured
            # 0.85x via the requantize route vs the packed kernel's path)
            from .kernels.dequant_mm import packed_int8_matmul
            scale = qt.scale.reshape(qt.scale.shape[0], -1)
            zp = (qt.zero_point.reshape(scale.shape)
                  if qt.zero_point is not None else None)
            out = packed_int8_matmul(
                x2d, qt.qdata, scale, zp, bias, meta.format,
                x2d.shape[-1] // scale.shape[-1], out_dtype=out_dtype,
                pack_layout=meta.pack_layout)
            if out is not None:
                if u_cols:
                    u = jnp.concatenate(
                        [c.reshape(x2d.shape[0], -1) for c in u_cols],
                        axis=-1)
                    v = jnp.concatenate(
                        [c.reshape(-1, out.shape[-1]) for c in v_cols],
                        axis=0)
                    out = (out.astype(jnp.float32)
                           + u.astype(jnp.float32) @ v.astype(jnp.float32)
                           ).astype(out_dtype)
                return out
        w_q, w_scale, w_zp = _requantize_rowwise(qt, mfmt)
    elif routed_fp8:
        # storage could feed a native fp8 MXU directly but there is none:
        # dequantize + rowwise-requantize to int8 on the fly
        w_q, w_scale, w_zp = _requantize_rowwise(qt, mfmt)
    else:
        if qt.layer is not None:
            # stacked fast path (gated at entry): symmetric int8 rowwise,
            # scale (L, O, 1) rides to the kernel in its stored order
            return scaled_mm_fused_act(
                x2d, qt.qdata, qt.scale, bias, x_fmt="int8",
                out_dtype=out_dtype, layer=qt.layer)
        if mfmt.is_integer:
            w_q, w_scale, w_zp = _weight_as_int8(qt)
        else:
            w_q = qt.qdata
            if w_q.ndim > 2:
                w_q = w_q.reshape(w_q.shape[0], -1)
            w_scale = qt.scale.reshape(qt.scale.shape[0], -1)
            w_zp = None

    def finish_uv(m):
        if not u_cols:
            return None, None
        u = jnp.concatenate([c.reshape(m, -1) for c in u_cols], axis=-1)
        v = jnp.concatenate([c.reshape(-1, w_q.shape[0]) for c in v_cols],
                            axis=0)
        return u, v

    kdim = x2d.shape[-1]
    m = x2d.shape[0]
    u, v = finish_uv(m)
    if mfmt.is_integer:
        if w_zp is not None or mfmt.is_unsigned:
            # asymmetric x asymmetric zero-point algebra as TWO rank-1
            # epilogue terms (reference computes a dense (M, O) zero_bias:
            # linear_uint8.py:62-68):
            #   y += [rowsum(x_q)*x_s] (x) w_zp
            #      + x_zp (x) [colsum(w_q)*w_s + K*w_zp]
            # The x-side factors are built inside the fused kernel's
            # quantize prologue; only the weight-side rows are precomputed.
            w_colsum = jnp.sum(w_q.astype(jnp.int32), axis=-1)[None, :] \
                .astype(jnp.float32)
            wz = (jnp.zeros((1, w_q.shape[0]), jnp.float32)
                  if w_zp is None else w_zp.reshape(1, -1))
            return scaled_mm_fused_act(
                x2d, w_q, w_scale, bias, x_fmt="uint8",
                out_dtype=out_dtype, lowrank_u=u, lowrank_v=v,
                v_zp0=wz,
                v_zp1=w_colsum * w_scale.reshape(1, -1) + float(kdim) * wz,
                emit_quantized=emit_quantized)
        return scaled_mm_fused_act(x2d, w_q, w_scale, bias, x_fmt="int8",
                                   out_dtype=out_dtype, lowrank_u=u,
                                   lowrank_v=v,
                                   emit_quantized=emit_quantized)
    if mfmt.num_bits == 8:
        return scaled_mm_fused_act(
            x2d, w_q.astype(jnp.float8_e4m3fn), w_scale, bias,
            x_fmt=mfmt.name, out_dtype=out_dtype, lowrank_u=u, lowrank_v=v,
            emit_quantized=emit_quantized)
    # 16-bit path: bf16 multiplies, fp32 accumulate; input unquantized
    assert not emit_quantized
    u, v = finish_uv(m)
    return bf16_scaled_mm(x2d, w_q, None, w_scale, bias,
                          out_dtype=out_dtype, lowrank_u=u, lowrank_v=v)


def _grouped_quantized_matmul(x2d, qt: QTensor, bias, out_dtype, groups: int):
    """Grouped quantized GEMM: (M, G·CgK) × (O, CgK) -> (M, O), O = G·Og.

    TPU-native replacement for the reference's per-group ``int_mm`` loop
    (conv/conv_int8.py:16-120): one batched low-precision ``dot_general``
    over the group dim keeps every group on the MXU in a single XLA op.
    The zero-point algebra and the SVD correction become per-group
    broadcastable terms instead of dense (M, O) bias materializations.
    """
    if qt.layer is not None:
        from .tensor import slice_stacked_layer
        qt = slice_stacked_layer(qt)
    meta = qt.meta
    mfmt = meta.matmul_format
    m = x2d.shape[0]
    o = meta.original_shape[0]
    og = o // groups
    cgk = x2d.shape[-1] // groups

    if meta.use_hadamard:
        x2d = rotate_hadamard(
            x2d.reshape(m * groups, cgk), meta.hadamard_group_size,
            precision=jax.lax.Precision.DEFAULT).reshape(m, groups * cgk)

    xg = jnp.transpose(x2d.reshape(m, groups, cgk), (1, 0, 2))  # (G, M, CgK)

    if meta.re_quantize_for_matmul:
        w_q, w_scale, w_zp = _requantize_rowwise(qt)
    elif mfmt.is_integer:
        w_q, w_scale, w_zp = _weight_as_int8(qt)
    else:
        w_q = qt.qdata.reshape(qt.qdata.shape[0], -1)
        w_scale = qt.scale.reshape(qt.scale.shape[0], -1)
        w_zp = None
    wg = w_q.reshape(groups, og, cgk)
    ws = jnp.transpose(w_scale.reshape(groups, og, 1), (0, 2, 1))  # (G, 1, Og)
    wz = (None if w_zp is None
          else jnp.transpose(w_zp.reshape(groups, og, 1), (0, 2, 1)))

    batched = (((2,), (2,)), ((0,), (0,)))  # contract CgK, batch G

    if mfmt.is_integer:
        if wz is not None or mfmt.is_unsigned:
            # x = x_i8·s_x + zp_x, w = w_i8·s_w + zp_w (per group):
            #   y = dot(x_i8, w_i8)·s_x·s_w + rowsum(x_i8)·s_x ⊗ zp_w
            #     + zp_x·(colsum(w_i8)·s_w + K·zp_w)
            x_q, x_scale, x_zp = quantize_uint_mm(xg, axis=-1)
            if wz is None:
                wz = jnp.zeros((groups, 1, og), jnp.float32)
            acc = jax.lax.dot_general(
                x_q, wg, batched, preferred_element_type=jnp.int32)
            out = acc.astype(jnp.float32) * x_scale * ws
            x_rowsum = jnp.sum(x_q.astype(jnp.int32), axis=-1,
                               keepdims=True).astype(jnp.float32)
            w_colsum = jnp.sum(wg.astype(jnp.int32), axis=-1) \
                .astype(jnp.float32).reshape(groups, 1, og)
            out = out + x_rowsum * x_scale * wz
            out = out + x_zp * (w_colsum * ws + float(cgk) * wz)
        else:
            x_q, x_scale = quantize_int_mm(xg, axis=-1)
            acc = jax.lax.dot_general(
                x_q, wg, batched, preferred_element_type=jnp.int32)
            out = acc.astype(jnp.float32) * x_scale * ws
    elif mfmt.num_bits == 8:
        x_q, x_scale = quantize_fp_mm(xg, axis=-1, fmt=mfmt)
        acc = jax.lax.dot_general(
            x_q, wg.astype(jnp.float8_e4m3fn), batched,
            preferred_element_type=jnp.float32)
        out = acc * x_scale * ws
    else:
        acc = jax.lax.dot_general(
            xg.astype(jnp.bfloat16), wg.astype(jnp.bfloat16), batched,
            preferred_element_type=jnp.float32)
        out = acc * ws

    if qt.svd_up is not None:
        # SVD factors live on the (O, CgK)-flattened weight: each output row
        # only sees its own group's input slice.
        t = jax.lax.dot_general(
            xg.astype(jnp.float32), qt.svd_down.astype(jnp.float32),
            (((2,), (1,)), ((), ())))                       # (G, M, R)
        upg = jnp.transpose(
            qt.svd_up.astype(jnp.float32).reshape(groups, og, -1),
            (0, 2, 1))                                      # (G, R, Og)
        out = out + jax.lax.dot_general(t, upg, (((2,), (1,)), ((0,), (0,))))
    if bias is not None:
        out = out + bias.astype(jnp.float32).reshape(groups, 1, og)
    return jnp.transpose(out, (1, 0, 2)).reshape(m, o).astype(out_dtype)


def _weight_only_linear_2d(x2d, qt: QTensor, bias, out_dtype):
    """Fused unpack/dequant matmul (never materializes the weight).

    Identity used for Hadamard: W_full = W_stored·(I⊗H) rotated back at
    dequant; x @ W_fullᵀ == (x·(I⊗H)) @ W_storedᵀ since H is symmetric
    orthonormal."""
    if qt.layer is not None:
        from .tensor import slice_stacked_layer
        qt = slice_stacked_layer(qt)
    meta = qt.meta
    if meta.use_hadamard:
        x2d = rotate_hadamard(x2d, meta.hadamard_group_size,
                              precision=jax.lax.Precision.DEFAULT)
    bias_eff = _svd_bias(x2d, qt, bias, out_dtype)
    bias_flat = None
    extra = None
    if bias_eff is not None and bias_eff.ndim > 1:
        extra = bias_eff  # (M, O) svd fold — added after the kernel
    else:
        bias_flat = bias_eff
    scale = qt.scale.reshape(qt.scale.shape[0], -1)      # (O, G)
    zp = (qt.zero_point.reshape(scale.shape)
          if qt.zero_point is not None else None)
    # effective flattened group span: for convs a "group" covers
    # g * prod(kernel) consecutive elements of the (C, *k)-flattened axis
    g_eff = x2d.shape[-1] // scale.shape[-1]
    qd = qt.qdata
    if not meta.is_packed and qd.ndim > 2:
        qd = qd.reshape(qd.shape[0], -1)
    out = dequant_matmul(x2d, qd, scale, zp, bias_flat,
                         meta.format, g_eff, out_dtype=out_dtype,
                         pack_layout=meta.pack_layout)
    if extra is not None:
        out = (out.astype(jnp.float32) + extra.astype(jnp.float32)) \
            .astype(out_dtype)
    return out


# ---------------------------------------------------------------------------
# Public forwards
# ---------------------------------------------------------------------------

def qlinear(x: jax.Array, w, bias: jax.Array | None = None,
            out_dtype=None) -> jax.Array:
    """y = x @ w.T + bias with quantized w (QTensor), trainable w
    (TrainQTensor), or plain array."""
    if type(w).__name__ == "TrainQTensor":  # avoid circular import
        from .train.matmul import train_qlinear
        return train_qlinear(x, w, bias)
    if type(w).__name__ == "DynamicTensor":
        from .train.matmul import dynamic_qlinear
        return dynamic_qlinear(x, w, bias)
    if not isinstance(w, QTensor):
        out_dtype = out_dtype or x.dtype
        out = jnp.einsum("...c,oc->...o", x, w.astype(x.dtype),
                         preferred_element_type=jnp.float32)
        if bias is not None:
            out = out + bias.astype(jnp.float32)
        return out.astype(out_dtype)

    meta = w.meta
    out_dtype = out_dtype or jnp.dtype(meta.dequant_dtype)
    x2d, lead = _flatten_batch(x)
    o = meta.original_shape[0]

    use_mm = meta.use_quantized_matmul and x2d.shape[0] >= _min_matmul_rows()
    if use_mm:
        out = _quantized_matmul_2d(x2d, w, bias, out_dtype)
    else:
        out = _weight_only_linear_2d(x2d, w, bias, out_dtype)
    return out.reshape(*lead, o)


def qconv(x: jax.Array, w, bias: jax.Array | None = None, *,
          stride=1, padding="SAME", dilation=1, feature_group_count=1,
          transpose: bool = False, out_dtype=None) -> jax.Array:
    """Conv with quantized weights.  x is NHWC (TPU-native); stored weights
    are OIHW (checkpoint order, reference layout) and transposed at trace
    time.

    Weight-only path dequantizes through the fused-dequant weight (XLA fuses
    dequant into the conv input pipeline); the quantized-matmul conv path
    (im2col -> int8 GEMM, reference conv_int8.py:16-120) applies when
    enabled and the patch matrix is large enough."""
    nd = x.ndim - 2  # spatial dims
    if isinstance(stride, int):
        stride = (stride,) * nd
    if isinstance(dilation, int):
        dilation = (dilation,) * nd

    if isinstance(w, QTensor):
        meta = w.meta
        out_dtype = out_dtype or jnp.dtype(meta.dequant_dtype)
        use_mm = meta.use_quantized_matmul and not transpose
        if use_mm:
            return _qconv_im2col(x, w, bias, stride, padding, dilation,
                                 out_dtype, feature_group_count)
        wd = dequantize(w, dtype=x.dtype)
    else:
        wd = w.astype(x.dtype)
        out_dtype = out_dtype or x.dtype

    if transpose:
        # stored (C_in, C_out, *k); transpose_kernel=True expects the
        # corresponding *forward* conv kernel (spatial, I=C_out, O=C_in)
        out = jax.lax.conv_transpose(
            x, jnp.moveaxis(wd, (0, 1), (-1, -2)),
            strides=stride, padding=padding,
            rhs_dilation=dilation,
            dimension_numbers=_dim_numbers(nd),
            transpose_kernel=True)
    else:
        # stored (C_out, C_in, *k) -> HWIO
        kernel = jnp.moveaxis(wd, (0, 1), (-1, -2))
        out = jax.lax.conv_general_dilated(
            x, kernel, window_strides=stride, padding=padding,
            rhs_dilation=dilation,
            dimension_numbers=_dim_numbers(nd),
            feature_group_count=feature_group_count)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out.astype(out_dtype)


def _dim_numbers(nd: int):
    spatial = "DHW"[-nd:]
    return (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C")


def _qconv_im2col(x, qt: QTensor, bias, stride, padding, dilation, out_dtype,
                  feature_group_count: int = 1):
    """im2col -> quantized linear (reference conv/forward.py:26-75)."""
    nd = x.ndim - 2
    kshape = qt.meta.original_shape[2:]
    # patches feature dim ordered C*prod(k) channel-major, matching the
    # OIHW flatten order of the stored weight; for grouped convs each
    # group's Cg*prod(k) feature slice is therefore contiguous
    patches = jax.lax.conv_general_dilated_patches(
        x, filter_shape=kshape, window_strides=stride, padding=padding,
        rhs_dilation=dilation,
        dimension_numbers=_dim_numbers(nd))
    m2d, lead = _flatten_batch(patches)
    if feature_group_count > 1:
        if qt.meta.use_quantized_matmul and m2d.shape[0] >= _min_matmul_rows():
            out = _grouped_quantized_matmul(m2d, qt, bias, out_dtype,
                                            feature_group_count)
        else:
            wd = dequantize(qt, dtype=jnp.float32)
            wd = wd.reshape(feature_group_count, -1, m2d.shape[-1]
                            // feature_group_count)
            xg = jnp.transpose(
                m2d.astype(jnp.float32).reshape(
                    m2d.shape[0], feature_group_count, -1), (1, 0, 2))
            og = jax.lax.dot_general(
                xg, wd, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            out = jnp.transpose(og, (1, 0, 2)).reshape(m2d.shape[0], -1)
            if bias is not None:
                out = out + bias.astype(jnp.float32)
            out = out.astype(out_dtype)
    elif qt.meta.use_quantized_matmul and m2d.shape[0] >= _min_matmul_rows():
        out = _quantized_matmul_2d(m2d, qt, bias, out_dtype)
    else:
        out = _weight_only_linear_2d(m2d, qt, bias, out_dtype)
    return out.reshape(*lead, qt.meta.original_shape[0])


def qembedding(ids: jax.Array, w, scale_multiplier: float | None = None,
               out_dtype=None) -> jax.Array:
    """Row-gather + dequantize-only-gathered-rows
    (reference embedding/forward.py:12-61)."""
    if not isinstance(w, QTensor):
        out = w[ids]
        if scale_multiplier is not None:
            out = out * scale_multiplier
        return out
    meta = w.meta
    out_dtype = out_dtype or jnp.dtype(meta.dequant_dtype)
    flat_ids = ids.reshape(-1)
    # gather packed rows / scales, then dequantize only those rows
    sub = QTensor(
        qdata=w.qdata[flat_ids],
        scale=w.scale[flat_ids],
        zero_point=None if w.zero_point is None else w.zero_point[flat_ids],
        svd_up=None if w.svd_up is None else w.svd_up[flat_ids],
        svd_down=w.svd_down,
        meta=_row_meta(meta, flat_ids.shape[0]),
    )
    out = dequantize(sub, dtype=out_dtype)
    if scale_multiplier is not None:
        out = out * scale_multiplier
    return out.reshape(*ids.shape, out.shape[-1])


def _row_meta(meta, rows: int):
    import dataclasses
    return dataclasses.replace(
        meta,
        original_shape=(rows,) + meta.original_shape[1:],
        quantized_shape=(rows,) + meta.quantized_shape[1:],
    )
