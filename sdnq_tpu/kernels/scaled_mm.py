"""Fused scaled matmul kernels: the TPU re-design of the reference's Triton
scaled-MM (/root/reference/src/sdnq/kernels/triton_scaled_mm.py:23-108) and
plain low-precision MM (triton_mm.py:23-100).

Semantics: ``out = (x_q · w_qᵀ) * x_scale * w_scaleᵀ (+ bias)`` where x_q is
(M, K) and w_q is (O, K) in *natural* orientation (no transposed storage —
the MXU contracts either orientation).  int8×int8 accumulates in int32 on
the MXU; fp8×fp8 accumulates in fp32 (TPU v5e+); the "fp16" family maps to
bf16 multiplies with fp32 accumulation (TPU has no fp16 ALU advantage and
bf16 carries fp32 exponent range, so the reference's sqrt(scale·K)
overflow-guard trick for fp16 GEMMs is unnecessary — see
kernel_wrappers.py:117-125 for what this replaces).

Two implementations per op:
  * Pallas (TPU): tiled MXU kernel with the dequant epilogue fused — the
    int32/fp32 accumulator never round-trips through HBM.
  * XLA fallback (CPU/interpret): dot_general + elementwise epilogue.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import use_pallas, pallas_interpret
from ..envconfig import env_blocks, env_bool, vmem_limit_bytes

__all__ = ["scaled_mm", "scaled_mm_fused_act", "scaled_mm_tn",
           "dynamic_mm_tn", "int8_mm", "fp8_mm", "bf16_scaled_mm"]


# ---------------------------------------------------------------------------
# XLA fallback
# ---------------------------------------------------------------------------

def _scaled_mm_xla(x_q, w_q, x_scale, w_scale, bias, out_dtype, acc_dtype):
    acc = jax.lax.dot_general(
        x_q, w_q, (((1,), (1,)), ((), ())), preferred_element_type=acc_dtype)
    out = acc.astype(jnp.float32)
    if x_scale is not None:
        out = out * x_scale.astype(jnp.float32)
    if w_scale is not None:
        out = out * w_scale.astype(jnp.float32).reshape(1, -1)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

def _mm_kernel(x_ref, w_ref, xs_ref, ws_ref, bias_ref, u_ref, v_ref,
               out_ref, acc_ref, *, acc_dtype, n_k, has_xs, has_ws,
               has_bias, has_uv):
    k = pl.program_id(2)

    def epilogue(acc):
        out = acc.astype(jnp.float32)
        if has_xs:
            out = out * xs_ref[:].astype(jnp.float32)          # (BM, 1)
        if has_ws:
            out = out * ws_ref[:].astype(jnp.float32)          # (1, BN)
        if has_bias:
            out = out + bias_ref[:].astype(jnp.float32)        # (1, BN)
        if has_uv:
            # fused low-rank epilogue: zero-point folds are rank-2 and the
            # SVD correction rank-r terms of u (BM, R) @ v (R, BN).
            # HIGHEST precision: u carries rowsum-scale products of ~1e3
            # magnitude with heavy cancellation against the main acc, and
            # the TPU's default bf16 multiplies lose ~8% there.
            out = out + jax.lax.dot_general(
                u_ref[:].astype(jnp.float32),
                v_ref[:].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
        out_ref[:] = out.astype(out_ref.dtype)

    if n_k == 1:
        # single K step: no accumulator scratch round-trip (its zero-init
        # + read-modify-write passes cost ~25% of the per-step time at the
        # deep-K default blocks)
        epilogue(jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=acc_dtype))
        return

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=acc_dtype)

    @pl.when(k == n_k - 1)
    def _():
        epilogue(acc_ref[:])


def _pick_block(dim: int, preferred: int, align: int) -> int:
    if dim >= preferred:
        return preferred
    b = align
    while b * 2 <= dim:
        b *= 2
    return b


def _pick_k_block(kdim: int, preferred: int) -> int:
    """K blocks must tile K exactly: a partial block would accumulate
    out-of-bounds garbage into the running sum (M/O partial blocks are safe —
    their garbage lands in discarded output rows/cols).  Returns the largest
    multiple of 128 that divides kdim and is <= preferred, or 0 if K needs
    zero-padding first."""
    if kdim % 128 != 0:
        return 0
    for b in range(min(preferred, kdim), 0, -128):
        if kdim % b == 0:
            return b
    return 0


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "acc_dtype", "bm", "bn", "bk"),
)
def _scaled_mm_pallas(x_q, w_q, x_scale, w_scale, bias, u=None, v=None,
                      out_dtype=jnp.bfloat16, acc_dtype=jnp.int32,
                      bm=0, bn=0, bk=0):
    m, kdim = x_q.shape
    o, _ = w_q.shape
    sublane = 32 if x_q.dtype.itemsize == 1 else 8
    # Deep-K blocks win on v5e (on-chip sweep: 512x512x4096 = 291 TF vs
    # 1024^3 = 255 TF at the reference shape): fewer accumulator
    # read-modify-writes, bigger MXU dots.  Default policy: take K as deep
    # as VMEM allows, then size bm/bn to keep (x+w)*2buf + acc under ~12MB.
    if bk == 0:
        bk = 4096
    bk_ = _pick_k_block(kdim, bk)
    if bk_ == 0:  # zero-pad K (zeros contribute nothing to the dot)
        kpad = (kdim + 127) // 128 * 128
        x_q = jnp.pad(x_q, ((0, 0), (0, kpad - kdim)))
        w_q = jnp.pad(w_q, ((0, 0), (0, kpad - kdim)))
        kdim = kpad
        bk_ = _pick_k_block(kdim, bk)
    if bm == 0 or bn == 0:
        default = 512 if bk_ >= 2048 else 1024
        bm = bm or default
        bn = bn or default
        itemsize = x_q.dtype.itemsize
        while (bm + bn) * bk_ * itemsize * 2 + bm * bn * 4 > 48 * 2 ** 20 \
                and bm > 128:
            bm //= 2
            bn = max(bn // 2, 128)
    bm_ = _pick_block(m, bm, sublane)
    bn_ = _pick_block(o, bn, 128)
    n_i, n_j, n_k = pl.cdiv(m, bm_), pl.cdiv(o, bn_), pl.cdiv(kdim, bk_)

    has_xs, has_ws, has_bias = (x_scale is not None, w_scale is not None,
                                bias is not None)
    has_uv = u is not None
    xs = x_scale if has_xs else jnp.zeros((m, 1), jnp.float32)
    ws = (w_scale.reshape(1, -1) if has_ws
          else jnp.zeros((1, o), jnp.float32))
    b = bias.reshape(1, -1) if has_bias else jnp.zeros((1, o), jnp.float32)
    r = u.shape[-1] if has_uv else 8
    u_in = u if has_uv else jnp.zeros((m, r), jnp.float32)
    v_in = v if has_uv else jnp.zeros((r, o), jnp.float32)

    kernel = functools.partial(
        _mm_kernel, acc_dtype=acc_dtype, n_k=n_k,
        has_xs=has_xs, has_ws=has_ws, has_bias=has_bias, has_uv=has_uv)

    flops = 2 * m * o * kdim
    bytes_accessed = (m * kdim * x_q.dtype.itemsize
                      + o * kdim * w_q.dtype.itemsize
                      + m * o * jnp.dtype(out_dtype).itemsize)
    return pl.pallas_call(
        kernel,
        grid=(n_i, n_j, n_k),
        in_specs=[
            pl.BlockSpec((bm_, bk_), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn_, bk_), lambda i, j, k: (j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm_, 1), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn_), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn_), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm_, r), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, bn_), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm_, bn_), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, o), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm_, bn_), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem_limit_bytes(),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=pallas_interpret(),
    )(x_q, w_q, xs, ws, b, u_in, v_in)


# ---------------------------------------------------------------------------
# Fused activation-quantize scaled matmul.
#
# The reference quantizes activations in a torch.compile region feeding the
# Triton kernel (linear_int8.py:71-120) — one fused producer graph.  The
# TPU equivalent fuses the per-row absmax quantize into the Pallas kernel
# itself: with bk == K the x block (i, 0) stays VMEM-resident across the
# whole j sweep, so the prologue quantizes it ONCE per i (at j == 0) into an
# int8/fp8 scratch and every weight tile reuses that scratch.  Per-row
# scales are exact (the full K row is in the tile) and the separate XLA
# quantize pass — an extra full read+write of x — disappears.
# ---------------------------------------------------------------------------

def _fused_act_mm_kernel(x_ref, w_ref, ws_ref, bias_ref, u_ref, v_ref,
                         vz0_ref, vz1_ref, cs_ref, out_ref,
                         xq_ref, xs_ref, zp_ref, rs_ref, *, qmax, acc_dtype,
                         has_ws, has_bias, has_uv, asym, fuse_fp8,
                         b_dim0, has_cs):
    j = pl.program_id(1)
    bm, kdim = x_ref.shape
    # quantize in row chunks: (rc, K) f32 temporaries must fit scoped vmem.
    # rc is a power of two so it tiles any power-of-two bm exactly.
    rc = 128
    while rc * 2 <= bm and rc * 2 * kdim * 16 <= 24 * 2 ** 20:
        rc *= 2
    rc = min(rc, bm)

    @pl.when(j == 0)
    def _():
        for r0 in range(0, bm, rc):
            x = x_ref[r0:r0 + rc, :].astype(jnp.float32)
            if has_cs:
                # columnwise prescale fused into the quantize prologue
                # (grad-input path: the cotangent is scaled by the
                # weight's per-row scales before quantization — saves a
                # full HBM round-trip of the scaled cotangent)
                x = x * cs_ref[:].astype(jnp.float32)
            if asym:
                # asymmetric per-row against the signed range: the int8 MXU
                # sees x_i8 with x = x_i8*scale + zp  (quant/core.py
                # quantize_uint_mm); the zero-point folds become two rank-1
                # epilogue terms built from in-kernel row stats.
                xmin = jnp.min(x, axis=1, keepdims=True)
                xmax = jnp.max(x, axis=1, keepdims=True)
                scale = jnp.maximum((xmax - xmin) / (2.0 * qmax + 1.0),
                                    2.0 ** -126)
                zp = xmin + scale * (qmax + 1.0)
                q = jnp.clip(jnp.round((x - zp) / scale), -qmax - 1.0, qmax)
                xq_ref[r0:r0 + rc, :] = q.astype(xq_ref.dtype)
                xs_ref[r0:r0 + rc, :] = scale
                rs_ref[r0:r0 + rc, :] = \
                    jnp.sum(q, axis=1, keepdims=True) * scale
                zp_ref[r0:r0 + rc, :] = zp
            else:
                amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
                scale = jnp.maximum(amax / qmax, 2.0 ** -126)
                if fuse_fp8:
                    xq_ref[r0:r0 + rc, :] = \
                        jnp.clip(x / scale, -qmax, qmax).astype(xq_ref.dtype)
                else:
                    xq_ref[r0:r0 + rc, :] = \
                        jnp.clip(jnp.round(x / scale), -qmax - 1.0, qmax) \
                        .astype(xq_ref.dtype)
                xs_ref[r0:r0 + rc, :] = scale

    acc = jax.lax.dot_general(
        xq_ref[:], w_ref[:], (((1,), (0 if b_dim0 else 1,)), ((), ())),
        preferred_element_type=acc_dtype)
    out = acc.astype(jnp.float32) * xs_ref[:]
    if has_ws:
        out = out * ws_ref[:].astype(jnp.float32)
    if has_bias:
        out = out + bias_ref[:].astype(jnp.float32)
    if asym:
        # y += rowsum(x_q)*x_scale (x) w_zp + x_zp (x) (colsum(w)*ws + K*wzp)
        out = out + rs_ref[:] * vz0_ref[:].astype(jnp.float32)
        out = out + zp_ref[:] * vz1_ref[:].astype(jnp.float32)
    if has_uv:
        out = out + jax.lax.dot_general(
            u_ref[:].astype(jnp.float32), v_ref[:].astype(jnp.float32),
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("x_fmt", "out_dtype", "bm", "bn", "b_dim0", "emit_q"),
)
def _fused_act_mm_pallas(x, w_q, w_scale, bias, u=None, v=None,
                         v_zp0=None, v_zp1=None, colscale=None, layer=None,
                         x_fmt="int8", out_dtype=jnp.bfloat16,
                         bm=0, bn=0, b_dim0=False, emit_q=False):
    """x (M, K) float; w_q (O, K) int8/fp8 — or (K, O) with ``b_dim0=True``
    (contract w's leading axis: the grad-input "NN" orientation, which reads
    the stored weight in its natural layout instead of materializing an
    int8 transpose in HBM).  Quantizes x per-row in the kernel prologue
    (j == 0 of each i-row; the x block stays VMEM-resident across the j
    sweep).  u/v carry the SVD epilogue; v_zp0/v_zp1 are the weight-side
    zero-point rank-1 rows for the asymmetric path.

    ``layer``: traced (1,) int32 — STACKED mode for scan-over-layers
    models: w_q is (L, O, K), w_scale/bias (L, 1, O), and the kernel DMAs
    tiles of layer ``layer[0]`` straight out of the stacked HBM buffer via
    scalar-prefetch BlockSpec index maps.  This is the aliasing XLA cannot
    do for a dynamic-slice feeding a custom call (it materializes a copy of
    every weight every scan step — ~1.1 ms/block at Flux width)."""
    m, kdim = x.shape
    stacked = layer is not None
    if stacked:
        assert not b_dim0 and not emit_q, "stacked mode is inference NT"
        o = w_q.shape[1]  # (L, O, K)
    else:
        o = w_q.shape[1] if b_dim0 else w_q.shape[0]
    asym = v_zp0 is not None
    fuse_fp8 = x_fmt.startswith("float8")
    if fuse_fp8:
        from ..formats import get_format
        f = get_format(x_fmt)
        qdt, qmax, acc_dtype = f.jnp_storage, float(f.max), jnp.float32
    else:
        qdt, qmax, acc_dtype = jnp.int8, 127.0, jnp.int32

    # Block policy: full-K x tile resident per i; sweep w tiles over j.
    # VMEM: x bf16 (bm,K)*2buf + xq (bm,K) + w (bn,K)*2buf + out (bm,bn)*2,
    # plus ~3 (bm,K) f32 quantize temporaries in scoped vmem; v5e has
    # 128MB total.  (512,512) measured fastest in the canonical harness
    # (240 vs 215 TF for (1024,1024) at the reference shape, solo chip).
    if bm == 0 or bn == 0:
        bn = bn or 512
        if bm == 0:
            # NN orientation streams (kdim, bn) w-slabs whose lane dim is
            # only bn wide; a taller x block amortizes the slab loads
            # (measured 122 vs 98 TF at the 8192^2x4096 training shape)
            bm = 1024 if b_dim0 else 512
            while bm > 64 and (bm * kdim * (2 * x.dtype.itemsize + 13)
                               + 2 * bn * kdim * w_q.dtype.itemsize
                               + 2 * bm * bn * 4) > 100 * 2 ** 20:
                bm //= 2
    bm_ = _pick_block(m, bm, 32)
    bn_ = _pick_block(o, bn, 128)
    n_i, n_j = pl.cdiv(m, bm_), pl.cdiv(o, bn_)

    has_ws, has_bias = w_scale is not None, bias is not None
    has_uv = u is not None
    r = u.shape[-1] if has_uv else 8
    if stacked:
        assert not (asym or has_uv or colscale is not None), \
            "stacked mode supports the symmetric rowwise path only"
        lyr = w_q.shape[0]
        # (L, O, 1) scale and (L, O) bias reshape to (L, 1, O) — identical
        # linear data order, so these are metadata-only inside the scan.
        # A PER-LAYER (already sliced, size-O) scale/bias is also accepted
        # and rides a constant index map.
        ws = (w_scale.reshape(-1, 1, o) if has_ws
              else jnp.zeros((1, 1, o), jnp.float32))
        b = (bias.reshape(-1, 1, o) if has_bias
             else jnp.zeros((1, 1, o), jnp.float32))
        ws_stacked = ws.shape[0] == lyr and lyr > 1
        b_stacked = b.shape[0] == lyr and lyr > 1
    else:
        ws = (w_scale.reshape(1, -1) if has_ws
              else jnp.zeros((1, o), jnp.float32))
        b = (bias.reshape(1, -1) if has_bias
             else jnp.zeros((1, o), jnp.float32))
    u_in = u if has_uv else jnp.zeros((m, r), jnp.float32)
    v_in = v if has_uv else jnp.zeros((r, o), jnp.float32)
    z0 = (v_zp0.reshape(1, -1) if asym else jnp.zeros((1, o), jnp.float32))
    z1 = (v_zp1.reshape(1, -1) if asym else jnp.zeros((1, o), jnp.float32))
    has_cs = colscale is not None
    cs = (colscale.reshape(1, -1) if has_cs
          else jnp.zeros((1, kdim), jnp.float32))

    kernel = functools.partial(
        _fused_act_mm_kernel, qmax=qmax, acc_dtype=acc_dtype,
        has_ws=has_ws, has_bias=has_bias, has_uv=has_uv, asym=asym,
        fuse_fp8=fuse_fp8, b_dim0=b_dim0, has_cs=has_cs)
    if stacked:
        inner = kernel

        def kernel(l_ref, x_ref, w_ref, ws_ref, bias_ref, u_ref, v_ref,
                   vz0_ref, vz1_ref, cs_ref, out_ref, *scratch):
            # stacked refs arrive as (1, ...) blocks of the prefetched
            # layer; .at[0] views them back to the unstacked shapes
            inner(x_ref, w_ref.at[0], ws_ref.at[0], bias_ref.at[0],
                  u_ref, v_ref, vz0_ref, vz1_ref, cs_ref, out_ref,
                  *scratch)

    flops = 2 * m * o * kdim
    bytes_accessed = (m * kdim * x.dtype.itemsize + o * kdim
                      + m * o * jnp.dtype(out_dtype).itemsize)
    if stacked:
        # index maps receive the prefetched layer scalar ref after the
        # grid indices; stacked operands pick their layer plane there, so
        # the DMA reads the stacked HBM buffer directly
        lsel = lambda i, j, l: (l[0], 0, j)       # noqa: E731
        lrow = lambda i, j, l: (0, 0, j)          # noqa: E731
        in_specs_list = [
            pl.BlockSpec((bm_, kdim), lambda i, j, l: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn_, kdim), lambda i, j, l: (l[0], j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn_), lsel if ws_stacked else lrow,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn_), lsel if b_stacked else lrow,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm_, r), lambda i, j, l: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, bn_), lambda i, j, l: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn_), lambda i, j, l: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn_), lambda i, j, l: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kdim), lambda i, j, l: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        row = lambda i, j: (0, j)  # noqa: E731
        in_specs_list = [
            pl.BlockSpec((bm_, kdim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            (pl.BlockSpec((kdim, bn_), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM) if b_dim0 else
             pl.BlockSpec((bn_, kdim), lambda i, j: (j, 0),
                          memory_space=pltpu.VMEM)),
            pl.BlockSpec((1, bn_), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn_), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((bm_, r), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, bn_), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn_), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn_), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kdim), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    # With emit_q the in-kernel rowwise-quantized x (and its scales) is
    # written back to HBM as two extra outputs — the ckpt-training residual
    # comes out of the forward kernel for free (one (M, K) int8 store)
    # instead of a separate full quantize pass over x.
    out_specs = (pl.BlockSpec((bm_, bn_), lambda i, j, l: (i, j),
                              memory_space=pltpu.VMEM) if stacked else
                 pl.BlockSpec((bm_, bn_), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM))
    out_shape = jax.ShapeDtypeStruct((m, o), out_dtype)
    xq_spec = pl.BlockSpec((bm_, kdim), lambda i, j: (i, 0),
                           memory_space=pltpu.VMEM)
    xs_spec = pl.BlockSpec((bm_, 1), lambda i, j: (i, 0),
                           memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((bm_, kdim), qdt),        # quantized x
        pltpu.VMEM((bm_, 1), jnp.float32),   # row scales
        pltpu.VMEM((bm_, 1), jnp.float32),   # row zero points (asym)
        pltpu.VMEM((bm_, 1), jnp.float32),   # rowsum * scale (asym)
    ]
    if emit_q:
        # the asymmetric prologue stores SIGNED codes with a per-row affine
        # (x = x_q*scale + zp), so the ckpt residual just adds the zp rows
        out_specs = [out_specs, xq_spec, xs_spec]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((m, kdim), qdt),
                     jax.ShapeDtypeStruct((m, 1), jnp.float32)]
        if asym:
            out_specs.append(xs_spec)
            out_shape.append(jax.ShapeDtypeStruct((m, 1), jnp.float32))
            scratch = scratch[3:]
        else:
            scratch = scratch[2:]
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"),
        # the quantize prologue keeps (bm, K) f32 temporaries live;
        # v5e VMEM is 128MB — the 16MB default scoped limit is the
        # v4-era conservative setting
        vmem_limit_bytes=vmem_limit_bytes(),
    )
    cost = pl.CostEstimate(
        flops=flops, bytes_accessed=bytes_accessed, transcendentals=0)
    if stacked:
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_i, n_j),
                in_specs=in_specs_list,
                out_specs=out_specs,
                scratch_shapes=scratch,
            ),
            out_shape=out_shape,
            compiler_params=compiler_params,
            cost_estimate=cost,
            interpret=pallas_interpret(),
        )(layer.reshape(1).astype(jnp.int32), x, w_q, ws, b, u_in, v_in,
          z0, z1, cs)
    return pl.pallas_call(
        kernel,
        grid=(n_i, n_j),
        in_specs=in_specs_list,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=compiler_params,
        cost_estimate=cost,
        interpret=pallas_interpret(),
    )(x, w_q, ws, b, u_in, v_in, z0, z1, cs)


# ---------------------------------------------------------------------------
# TN scaled matmul: out (N, K) = aᵀ @ b with a (M, N), b (M, K), contracting
# the *leading* axis of both operands.  This is the grad-weight orientation
# (gw = gᵀ @ x): both operands are consumed in their natural storage layout
# and quantized **columnwise** (per out-row n over M for a, per out-col k
# over M for b) by the caller — one fused XLA reduce+cast each, with no
# (M, N)→(N, M) transpose ever materialized in HBM.  The reference instead
# materializes g.t() before its Triton kernel (linear_int8.py:137-141).
# ---------------------------------------------------------------------------

def _tn_mm_kernel(a_ref, b_ref, as_ref, bs_ref, u_ref, v_ref, out_ref,
                  acc_ref, *, acc_dtype, n_k, has_as, has_bs, has_uv):
    k = pl.program_id(2)

    def epilogue(acc):
        out = acc.astype(jnp.float32)
        if has_as:
            out = out * as_ref[:].astype(jnp.float32)          # (BN, 1)
        if has_bs:
            out = out * bs_ref[:].astype(jnp.float32)          # (1, BK)
        if has_uv:
            out = out + jax.lax.dot_general(
                u_ref[:].astype(jnp.float32),
                v_ref[:].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
        out_ref[:] = out.astype(out_ref.dtype)

    dot = lambda: jax.lax.dot_general(  # noqa: E731
        a_ref[:], b_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=acc_dtype)

    if n_k == 1:
        epilogue(dot())
        return

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += dot()

    @pl.when(k == n_k - 1)
    def _():
        epilogue(acc_ref[:])


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "acc_dtype", "bn", "bk", "bmc"),
)
def _scaled_mm_tn_pallas(a_q, b_q, a_scale, b_scale, u=None, v=None,
                         out_dtype=jnp.float32, acc_dtype=jnp.int32,
                         bn=0, bk=0, bmc=0):
    m, n = a_q.shape
    _, kd = b_q.shape
    # contraction (M) tiles must divide M exactly: pad with zero rows
    # (zeros contribute nothing to the accumulation)
    if bmc == 0:
        bmc = 2048
    sub = 32 if a_q.dtype.itemsize == 1 else 8
    bmc_ = _pick_k_block(m, bmc) or 0
    if bmc_ == 0:
        mpad = (m + sub - 1) // sub * sub
        for cand in range(min(bmc, mpad), 0, -sub):
            if mpad % cand == 0:
                bmc_ = cand
                break
        pad = mpad - m
        if pad:
            a_q = jnp.pad(a_q, ((0, pad), (0, 0)))
            b_q = jnp.pad(b_q, ((0, pad), (0, 0)))
        m = mpad
    if bn == 0 or bk == 0:
        bn = bn or 512
        bk = bk or 512
        itemsize = a_q.dtype.itemsize
        while (bn + bk) * bmc_ * itemsize * 2 + bn * bk * 4 > 48 * 2 ** 20 \
                and bn > 128:
            bn //= 2
            bk = max(bk // 2, 128)
    bn_ = _pick_block(n, bn, 128)
    bk_ = _pick_block(kd, bk, 128)
    n_i, n_j, n_k = pl.cdiv(n, bn_), pl.cdiv(kd, bk_), pl.cdiv(m, bmc_)

    has_as, has_bs = a_scale is not None, b_scale is not None
    has_uv = u is not None
    asv = (a_scale.reshape(-1, 1) if has_as else jnp.zeros((n, 1),
                                                           jnp.float32))
    bsv = (b_scale.reshape(1, -1) if has_bs else jnp.zeros((1, kd),
                                                           jnp.float32))
    r = u.shape[-1] if has_uv else 8
    u_in = u if has_uv else jnp.zeros((n, r), jnp.float32)
    v_in = v if has_uv else jnp.zeros((r, kd), jnp.float32)

    kernel = functools.partial(
        _tn_mm_kernel, acc_dtype=acc_dtype, n_k=n_k,
        has_as=has_as, has_bs=has_bs, has_uv=has_uv)

    flops = 2 * m * n * kd
    bytes_accessed = (m * n * a_q.dtype.itemsize
                      + m * kd * b_q.dtype.itemsize
                      + n * kd * jnp.dtype(out_dtype).itemsize)
    return pl.pallas_call(
        kernel,
        grid=(n_i, n_j, n_k),
        in_specs=[
            pl.BlockSpec((bmc_, bn_), lambda i, j, k: (k, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bmc_, bk_), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn_, 1), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk_), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn_, r), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, bk_), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn_, bk_), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, kd), out_dtype),
        scratch_shapes=[pltpu.VMEM((bn_, bk_), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem_limit_bytes()),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0),
        interpret=pallas_interpret(),
    )(a_q, b_q, asv, bsv, u_in, v_in)


def scaled_mm_tn(a_q: jax.Array, b_q: jax.Array,
                 a_scale: jax.Array | None = None,
                 b_scale: jax.Array | None = None,
                 out_dtype=jnp.float32,
                 lowrank_u: jax.Array | None = None,
                 lowrank_v: jax.Array | None = None) -> jax.Array:
    """``out = (a_qᵀ @ b_q) * a_scale[:, None] * b_scale[None, :] [+ u @ v]``
    contracting the leading (M) axis of both operands.

    a_q (M, N) and b_q (M, K) int8/fp8/bf16 in natural storage; a_scale (N,)
    / b_scale (K,) columnwise scales.  lowrank_u (N, R) / lowrank_v (R, K)
    carry the asymmetric zero-point cross terms as a fused epilogue.

    Routing: XLA's leading-axis int8 dot measures *faster* than the Pallas
    TN kernel on v5e (123 vs 106 TF at the 8192^2x4096 training shape —
    Mosaic transposes the int8 tiles on the VPU, XLA does it during the
    HBM->VMEM relayout), and XLA fuses the columnwise-scale epilogue
    anyway; the Pallas kernel is kept behind SDNQ_TPU_TN_MM_BLOCKS for
    shapes where explicit tiling wins."""
    acc_dtype = jnp.int32 if a_q.dtype == jnp.int8 else jnp.float32
    ov = env_blocks("SDNQ_TPU_TN_MM_BLOCKS", 3)
    if use_pallas() and ov:
        return _scaled_mm_tn_pallas(
            a_q, b_q, a_scale, b_scale, lowrank_u, lowrank_v,
            out_dtype=jnp.dtype(out_dtype), acc_dtype=acc_dtype,
            bn=ov[0], bk=ov[1], bmc=ov[2])
    acc = jax.lax.dot_general(a_q, b_q, (((0,), (0,)), ((), ())),
                              preferred_element_type=acc_dtype)
    out = acc.astype(jnp.float32)
    if a_scale is not None:
        out = out * a_scale.astype(jnp.float32).reshape(-1, 1)
    if b_scale is not None:
        out = out * b_scale.astype(jnp.float32).reshape(1, -1)
    if lowrank_u is not None:
        out = out + (lowrank_u.astype(jnp.float32)
                     @ lowrank_v.astype(jnp.float32))
    return out.astype(out_dtype)


def dynamic_mm_tn(a: jax.Array, b: jax.Array, mm_fmt: str = "int8",
                  out_dtype=jnp.float32,
                  saved_b: tuple | None = None) -> jax.Array:
    """aᵀ @ b with both operands dynamically quantized **columnwise** in the
    `mm_fmt` family (per out-row n over M for a, per out-col k over M for b)
    — the grad-weight GEMM with zero transposes.  ``saved_b`` short-circuits
    the b-side quantize with a pre-quantized (q, scale[, zp]) tuple (the
    save_quantized_activations path)."""
    from ..formats import get_format as _gf
    from ..quant.core import quantize_fp_mm, quantize_int_mm, \
        quantize_uint_mm
    f = _gf(mm_fmt)
    mdim = a.shape[0]
    a = a.astype(jnp.float32)
    if f.is_integer and not f.is_unsigned:
        a_q, a_s = quantize_int_mm(a, axis=0)
        if saved_b is None:
            b_q, b_s = quantize_int_mm(b.astype(jnp.float32), axis=0)
        else:
            b_q, b_s = saved_b
        return scaled_mm_tn(a_q, b_q, a_s.reshape(-1), b_s.reshape(-1),
                            out_dtype=out_dtype)
    if f.is_integer:
        a_q, a_s, a_zp = quantize_uint_mm(a, axis=0)
        if saved_b is None:
            b_q, b_s, b_zp = quantize_uint_mm(b.astype(jnp.float32), axis=0)
        else:
            b_q, b_s, b_zp = saved_b
        # aᵀb = (a_q s_a + z_a)ᵀ(b_q s_b + z_b): the three cross terms are
        # rank-1 in (n, k) — colsum(a_q)·s_a ⊗ z_b, z_a ⊗ colsum(b_q)·s_b,
        # and M·z_a ⊗ z_b — fused as a rank-2 u/v epilogue.
        a_s1, a_zp1 = a_s.reshape(-1), a_zp.reshape(-1)
        b_s1, b_zp1 = b_s.reshape(-1), b_zp.reshape(-1)
        csa = jnp.sum(a_q.astype(jnp.int32), axis=0).astype(jnp.float32)
        csb = jnp.sum(b_q.astype(jnp.int32), axis=0).astype(jnp.float32)
        u = jnp.stack([csa * a_s1, a_zp1], axis=-1)            # (N, 2)
        v = jnp.stack([b_zp1,
                       csb * b_s1 + float(mdim) * b_zp1], axis=0)  # (2, K)
        return scaled_mm_tn(a_q, b_q, a_s1, b_s1, out_dtype=out_dtype,
                            lowrank_u=u, lowrank_v=v)
    if f.num_bits == 8:
        a_q, a_s = quantize_fp_mm(a, axis=0, fmt=f)
        if saved_b is None:
            b_q, b_s = quantize_fp_mm(b.astype(jnp.float32), axis=0, fmt=f)
        else:
            b_q, b_s = saved_b
        return scaled_mm_tn(a_q, b_q, a_s.reshape(-1), b_s.reshape(-1),
                            out_dtype=out_dtype)
    # 16-bit family: bf16 multiplies, fp32 accumulate, no quantize pass
    acc = jax.lax.dot_general(a.astype(jnp.bfloat16),
                              b.astype(jnp.bfloat16),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return acc.astype(out_dtype)


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------

def scaled_mm(x_q: jax.Array, w_q: jax.Array,
              x_scale: jax.Array | None = None,
              w_scale: jax.Array | None = None,
              bias: jax.Array | None = None,
              out_dtype=jnp.bfloat16,
              lowrank_u: jax.Array | None = None,
              lowrank_v: jax.Array | None = None) -> jax.Array:
    """Fused ``(x_q @ w_q.T) * x_scale * w_scale + bias [+ u @ v]``.

    x_q (M, K); w_q (O, K); x_scale (M, 1) or None; w_scale (O,)/(O,1)/(1,O)
    or None; bias (O,) or (M, O) broadcastable or None.  lowrank_u (M, R) /
    lowrank_v (R, O) fuse rank-R epilogue terms — the uint8 zero-point
    algebra (R=2) and the SVDQuant correction (R=svd_rank) — into the same
    kernel instead of materializing an (M, O) bias.
    """
    if x_q.dtype == jnp.int8:
        acc_dtype = jnp.int32
    else:
        acc_dtype = jnp.float32
    if w_scale is not None:
        w_scale = w_scale.reshape(-1)
    if use_pallas() and (bias is None or bias.ndim <= 1):
        ov = env_blocks("SDNQ_TPU_MM_BLOCKS", 3) or (0, 0, 0)
        return _scaled_mm_pallas(
            x_q, w_q, x_scale, w_scale, bias, lowrank_u, lowrank_v,
            out_dtype=jnp.dtype(out_dtype), acc_dtype=acc_dtype,
            bm=ov[0], bn=ov[1], bk=ov[2])
    if w_scale is not None:
        w_scale = w_scale.reshape(1, -1)
    out = _scaled_mm_xla(x_q, w_q, x_scale, w_scale, bias, out_dtype,
                         acc_dtype)
    if lowrank_u is not None:
        out = (out.astype(jnp.float32)
               + lowrank_u.astype(jnp.float32)
               @ lowrank_v.astype(jnp.float32)).astype(out_dtype)
    return out


def scaled_mm_fused_act(x, w_q,
                        w_scale: jax.Array | None = None,
                        bias: jax.Array | None = None, *,
                        x_fmt: str = "int8",
                        out_dtype=jnp.bfloat16,
                        lowrank_u: jax.Array | None = None,
                        lowrank_v: jax.Array | None = None,
                        v_zp0: jax.Array | None = None,
                        v_zp1: jax.Array | None = None,
                        bm: int = 0, bn: int = 0,
                        b_layout: str = "nt",
                        emit_quantized: bool = False,
                        x_colscale: jax.Array | None = None,
                        layer: jax.Array | None = None):
    """``scaled_mm`` with the per-row activation quantization fused into the
    kernel prologue — x arrives in bf16/f32 and never round-trips through
    HBM as a separate quantized array (the reference fuses this via
    torch.compile feeding Triton: linear_int8.py:71-120).

    x_fmt: "int8" (symmetric), "uint8" (asymmetric; requires v_zp0/v_zp1 =
    the weight-side zero-point rank-1 rows), or a float8 name.
    b_layout: "nt" — w_q (O, K), out = x @ w_qᵀ (the forward orientation);
    "nn" — w_q (K, O), out = x @ w_q, contracting w's leading axis.  "nn"
    is the grad-input orientation: the stored (O, K) weight is consumed
    as-is when the cotangent plays the x role, with no int8 transpose
    materialized in HBM (reference linear_int8.py:125-163 calls a separate
    transposed-weight Triton kernel for this).
    emit_quantized ("nt" only): also return the in-kernel rowwise-quantized
    x as ``(y, x_q (M, K), x_scale (M, 1))`` — the
    save-quantized-activations training residual produced by the forward
    kernel itself (one extra int8 store, no separate quantize pass; the
    backward folds the row scales into the cotangent's columnwise quantize
    — see train/matmul._train_linear_bwd).  With x_fmt="uint8" the
    prologue's codes are SIGNED with a per-row affine (x = x_q*s + zp), so
    the return grows a zp row: ``(y, x_q, x_scale, x_zp (M, 1))`` and the
    grad-weight picks up one rank-1 term (gᵀ·zp) ⊗ 1_K.
    Falls back to quantize-then-scaled_mm off-TPU or for shapes the fused
    kernel does not support.
    """
    m, kdim = x.shape
    asym = x_fmt == "uint8"
    b_dim0 = b_layout == "nn"
    if emit_quantized:
        assert not b_dim0
    pad = (-kdim) % 128
    eligible = (use_pallas() and m >= 16 and kdim >= 256
                and kdim + pad <= 16384
                and not (asym and pad)  # zero-pad would skew min/max
                and not env_bool("SDNQ_TPU_DISABLE_FUSED_ACT", False))
    if layer is not None:
        # stacked mode: padding would copy the whole (L, O, K) stack per
        # scan step — callers (layers._quantized_matmul_2d) slice instead
        assert eligible and pad == 0 and not (asym or b_dim0
                                              or emit_quantized), \
            "stacked scaled_mm requires the aligned symmetric NT path"
    if eligible:
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad)))
            w_q = (jnp.pad(w_q, ((0, pad), (0, 0))) if b_dim0
                   else jnp.pad(w_q, ((0, 0), (0, pad))))
            if x_colscale is not None:
                x_colscale = jnp.pad(x_colscale.reshape(-1), (0, pad))
        if bm == 0 and bn == 0:
            bm, bn = env_blocks("SDNQ_TPU_FUSED_MM_BLOCKS", 2) or (0, 0)
        out = _fused_act_mm_pallas(
            x, w_q, w_scale, bias, lowrank_u, lowrank_v, v_zp0, v_zp1,
            x_colscale, layer,
            x_fmt=x_fmt, out_dtype=jnp.dtype(out_dtype), bm=bm, bn=bn,
            b_dim0=b_dim0, emit_q=emit_quantized)
        if emit_quantized and asym:
            y, xq, xs, xzp = out
            return y, xq, xs, xzp  # asym is never padded (gate above)
        if emit_quantized:
            y, xq, xs = out
            return y, (xq[:, :kdim] if pad else xq), xs
        return out

    from ..quant.core import quantize_fp_mm, quantize_int_mm, quantize_uint_mm
    if x_colscale is not None:
        x = x.astype(jnp.float32) * x_colscale.reshape(1, -1)
    u, v = lowrank_u, lowrank_v
    if asym:
        x_q, x_scale, x_zp = quantize_uint_mm(x, axis=-1)
        rs = jnp.sum(x_q.astype(jnp.int32), axis=-1,
                     keepdims=True).astype(jnp.float32) * x_scale
        u_cols = [rs, x_zp.astype(jnp.float32)]
        v_rows = [v_zp0.reshape(1, -1), v_zp1.reshape(1, -1)]
        if u is not None:
            u_cols.append(u)
            v_rows.append(v)
        u = jnp.concatenate(u_cols, axis=-1)
        v = jnp.concatenate(v_rows, axis=0)
    elif x_fmt.startswith("float8"):
        x_q, x_scale = quantize_fp_mm(x, axis=-1, fmt=x_fmt)
        w_q = w_q.astype(x_q.dtype)
    else:
        x_q, x_scale = quantize_int_mm(x, axis=-1)
    if b_dim0:
        acc_dtype = jnp.int32 if x_q.dtype == jnp.int8 else jnp.float32
        acc = jax.lax.dot_general(x_q, w_q, (((1,), (0,)), ((), ())),
                                  preferred_element_type=acc_dtype)
        out = acc.astype(jnp.float32) * x_scale.astype(jnp.float32)
        if w_scale is not None:
            out = out * w_scale.astype(jnp.float32).reshape(1, -1)
        if bias is not None:
            out = out + bias.astype(jnp.float32)
        if u is not None:
            out = out + u.astype(jnp.float32) @ v.astype(jnp.float32)
        return out.astype(out_dtype)
    out = scaled_mm(x_q, w_q, x_scale, w_scale, bias, out_dtype=out_dtype,
                    lowrank_u=u, lowrank_v=v)
    if emit_quantized and asym:
        # quantize_uint_mm already uses the signed-code + per-row affine
        # convention (x = x_q*s + zp) — same residual as the fused kernel
        return out, x_q, x_scale.reshape(-1, 1), x_zp.reshape(-1, 1)
    if emit_quantized:
        return out, x_q, x_scale.reshape(-1, 1)
    return out


def int8_mm(x_q, w_q, out_dtype=jnp.int32):
    """Plain int8 GEMM with int32 accumulate (reference: triton_mm.py)."""
    return jax.lax.dot_general(
        x_q, w_q, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32).astype(out_dtype)


def fp8_mm(x_q, w_q, out_dtype=jnp.float32):
    return jax.lax.dot_general(
        x_q, w_q, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_dtype)


def bf16_scaled_mm(x, w, x_scale=None, w_scale=None, bias=None,
                   out_dtype=jnp.bfloat16, lowrank_u=None, lowrank_v=None):
    """16-bit scaled GEMM: bf16 multiplies, fp32 accumulate.  Replaces the
    reference's fp16 path (no overflow guard needed on TPU)."""
    return scaled_mm(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                     x_scale, w_scale, bias, out_dtype=out_dtype,
                     lowrank_u=lowrank_u, lowrank_v=lowrank_v)
