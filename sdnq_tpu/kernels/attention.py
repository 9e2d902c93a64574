"""Quantized flash attention for TPU.

Re-design of the reference's Triton attention kernel
(/root/reference/src/sdnq/kernels/triton_atten.py:37-192) and host wrapper
(:195-353) as a Pallas TPU kernel:

  * online-softmax flash attention where Q·Kᵀ runs on the int8 (or fp8) MXU
    with per-token scales folded into the softmax and the softmax scale
    pre-multiplied into q_scale;
  * optional quantized P·V with per-row-block dynamic requantization of P
    (reference :169-185).  The per-token V scale folds into P *before*
    requantization: Σₜ p[m,t]·vs[t]·v_q[t,d] = (p∘vs)_q @ v_q · p_scale;
  * smooth-k (K mean-centering), optional Hadamard rotation of Q/K, GQA via
    head-index arithmetic in the BlockSpec index maps, causal masking,
    bool/float attention masks;
  * head_dim padded to the 128-lane width (the reference pads to pow2).

Layout: (B, H, N, D) like the reference's torch SDPA signature.  The kernel
grids over (B·H, N/BM) with the full KV extent resident in VMEM per head
(fine to ~16K tokens of int8 KV; ring/sequence-parallel attention splits KV
across chips before this limit — see parallel/).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import use_pallas, pallas_interpret
from ..quant.core import quantize_int_mm
from ..quant.hadamard import (
    get_hadamard_group_size, next_power_of_2, rotate_hadamard,
)

__all__ = ["quantized_attention", "flash_attention_block", "quantize_kv",
           "attn_auto_matmul_dtype"]


def quantize_kv(k: "jax.Array", v: "jax.Array | None" = None):
    """Per-token int8 quantization of K/V rows for the quantized KV cache.

    k/v: (B, KH, N, D).  Returns (k_q int8, k_scale (B, KH, N)[, v_q,
    v_scale]) — the representation ``quantized_attention(kv_scales=...)``
    consumes directly, so cached tokens are quantized once at insert time
    instead of every decode step (the reference re-quantizes K/V per call:
    triton_atten.py:195-238).
    """
    from ..quant.core import quantize_int_mm
    k_q, k_s = quantize_int_mm(k.astype(jnp.float32), axis=-1)
    if v is None:
        return k_q, k_s[..., 0]
    v_q, v_s = quantize_int_mm(v.astype(jnp.float32), axis=-1)
    return k_q, k_s[..., 0], v_q, v_s[..., 0]

_NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _attn_kernel(q_ref, k_ref, v_ref, qs_ref, ks_ref, vs_ref, mask_ref,
                 out_ref, m_ref=None, l_ref=None, *, bm: int, bk: int,
                 n_k: int, d: int, causal: bool, has_mask: bool,
                 mask_is_bool: bool, quantized: bool, quantized_pv: bool,
                 sm_scale: float, kn_valid: int, partial_out: bool = False,
                 use_exp2: bool = False, pv_const: bool = False):
    i = pl.program_id(1)
    row0 = i * bm

    q = q_ref[0]                                   # (BM, D)
    acc_t = jnp.int32 if q.dtype == jnp.int8 else jnp.float32
    if quantized:
        qs = qs_ref[0]                             # (BM, 1)
    m_i = jnp.full((bm, 1), _NEG_INF, jnp.float32)
    l_i = jnp.zeros((bm, 1), jnp.float32)
    acc = jnp.zeros((bm, d), jnp.float32)

    # exp2 path: logits arrive pre-multiplied by log2(e) (folded into
    # q_scale / sm_scale by the wrapper — the reference folds the same
    # constant into q_scale for its Triton exp2: triton_atten.py:231);
    # exp2 skips the VPU's internal x*log2e step of exp.
    expf = jnp.exp2 if use_exp2 else jnp.exp
    mask_coef = math.log2(math.e) if use_exp2 else 1.0
    _LOG2_127 = math.log2(127.0) if use_exp2 else math.log(127.0)

    row_ids = row0 + jax.lax.broadcasted_iota(jnp.int32, (bm, bk), 0)

    def block(kt, m_i, l_i, acc):
        k0 = kt * bk
        k_blk = k_ref[0, k0:k0 + bk, :]            # (BK, D)
        if quantized:
            s = jax.lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=acc_t).astype(jnp.float32)
            s = s * qs * ks_ref[0, :, k0:k0 + bk]  # (1, BK)
        else:
            # scale (and log2e for the exp2 path) is pre-folded into q by
            # the wrapper, so the bf16 QK dot needs no epilogue multiply
            # (f32 QK runs at half the bf16 MXU rate on v5e — measured
            # 81 -> 91 TF from this change alone, scripts/exp_attention_v2)
            s = jax.lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if sm_scale != 1.0:
                s = s * sm_scale

        col_ids = k0 + jax.lax.broadcasted_iota(jnp.int32, (bm, bk), 1)
        if kn_valid < n_k * bk:
            s = jnp.where(col_ids < kn_valid, s, _NEG_INF)
        if causal:
            s = jnp.where(row_ids >= col_ids, s, _NEG_INF)
        if has_mask:
            mblk = mask_ref[0, :, k0:k0 + bk]
            if mask_is_bool:
                s = jnp.where(mblk != 0, s, _NEG_INF)
            else:
                s = s + mblk.astype(jnp.float32) * mask_coef

        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        v_blk = v_ref[0, k0:k0 + bk, :]
        if quantized_pv and pv_const:
            # CONSTANT p scale: p = exp2(s - m) <= 1, so p*127 is int8-
            # representable with no per-block max/requant; the 127 cancels
            # against l in the final normalize.  V carries a per-head scale
            # applied by the wrapper after the kernel.  (The reference
            # requantizes P per row-block with per-token V scales folded in
            # — triton_atten.py:169-185 — which costs ~4 extra VPU ops per
            # logit; this path trades per-token V granularity for them.)
            p127 = expf(s - (m_new - _LOG2_127))
            alpha = expf(m_i - m_new)
            l_i = l_i * alpha + jnp.sum(p127, axis=-1, keepdims=True)
            p_q = jnp.round(p127).astype(jnp.int8)
            pv = jax.lax.dot_general(
                p_q, v_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            acc = acc * alpha + pv
            return m_new, l_i, acc
        p = expf(s - m_new)
        alpha = expf(m_i - m_new)
        l_i = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)

        if quantized_pv:
            vs = vs_ref[0, :, k0:k0 + bk]          # (1, BK)
            p_eff = p * vs
            p_scale = jnp.maximum(jnp.max(p_eff, axis=-1, keepdims=True),
                                  1e-20) / 127.0
            p_q = jnp.round(p_eff / p_scale).astype(jnp.int8)
            pv = jax.lax.dot_general(
                p_q, v_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
            acc = acc * alpha + pv * p_scale
        else:
            pv = jax.lax.dot_general(
                p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = acc * alpha + pv
        return m_new, l_i, acc

    for kt in range(n_k):
        if causal:
            # rows of this i-block end at row0+bm-1; KV blocks entirely
            # to the right are fully masked — skip their dots at runtime
            # (row0 is dynamic, so the guard is a lax.cond per block)
            m_i, l_i, acc = jax.lax.cond(
                kt * bk <= row0 + bm - 1,
                lambda ml: block(kt, *ml),
                lambda ml: ml,
                (m_i, l_i, acc))
        else:
            m_i, l_i, acc = block(kt, m_i, l_i, acc)

    if partial_out:
        # flash-decoding style partial results: unnormalized acc + (m, l)
        # running stats, merged across KV partitions by the caller
        # (parallel/ring_attention.py)
        out_ref[0] = acc.astype(out_ref.dtype)
        m_ref[0] = m_i
        l_ref[0] = l_i
    else:
        out_ref[0] = (acc / jnp.maximum(l_i, 1e-30)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "causal", "quantized", "quantized_pv", "sm_scale", "q_per_kv",
    "mask_is_bool", "out_dtype", "bm", "bk", "kn_valid", "pv_const"))
def _attn_pallas(q, k, v, q_scale, k_scale, v_scale, mask, *, causal,
                 quantized, quantized_pv, sm_scale, q_per_kv, mask_is_bool,
                 out_dtype, bm, bk, kn_valid, pv_const=False):
    bh, n, d = q.shape
    bh_kv, kn, _ = k.shape
    n_k = kn // bk
    has_mask = mask is not None

    # exp2 softmax: fold log2(e) into the q-side scale (quantized) or
    # directly into q itself (unquantized — the wrapper pre-multiplies q,
    # signalled by sm_scale == 0.0, so the bf16 QK dot has no epilogue)
    log2e = math.log2(math.e)
    prefolded = sm_scale == 0.0
    # Mosaic-legal layouts: q_scale (BH, N, 1); k/v scales (BH, 1, KN)
    qs_in = (q_scale[..., None] * log2e if quantized
             else jnp.zeros((bh, n, 1), jnp.float32))
    ks_in = (k_scale[:, None, :] if quantized
             else jnp.zeros((bh_kv, 1, kn), jnp.float32))
    vs_in = (v_scale[:, None, :] if quantized_pv and v_scale is not None
             else jnp.zeros((bh_kv, 1, kn), jnp.float32))
    mask_in = mask if has_mask else jnp.zeros((1, 1, 8), jnp.int8)
    mask_bh = mask_in.shape[0]

    kernel = functools.partial(
        _attn_kernel, bm=bm, bk=bk, n_k=n_k, d=d, causal=causal,
        has_mask=has_mask, mask_is_bool=mask_is_bool, quantized=quantized,
        quantized_pv=quantized_pv,
        sm_scale=1.0 if prefolded else sm_scale * log2e,
        kn_valid=kn_valid, use_exp2=True, pv_const=pv_const)

    flops = 4 * n * kn * d * bh
    return pl.pallas_call(
        kernel,
        grid=(bh, pl.cdiv(n, bm)),
        in_specs=[
            pl.BlockSpec((1, bm, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kn, d), lambda b, i: (b // q_per_kv, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kn, d), lambda b, i: (b // q_per_kv, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kn), lambda b, i: (b // q_per_kv, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kn), lambda b, i: (b // q_per_kv, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, bm, mask_in.shape[-1]),
                (lambda b, i: (b % mask_bh, i, 0)) if has_mask
                else (lambda b, i: (0, 0, 0)),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bm, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=q.size + k.size + v.size,
            transcendentals=n * kn * bh),
        interpret=pallas_interpret(),
    )(q, k, v, qs_in, ks_in, vs_in, mask_in)


@functools.partial(jax.jit, static_argnames=(
    "quantized", "quantized_pv", "sm_scale", "mask_is_bool", "bm", "bk"))
def _attn_block_pallas(q, k, v, q_scale, k_scale, v_scale, mask, *,
                       quantized, quantized_pv, sm_scale, mask_is_bool,
                       bm, bk):
    """Partial flash attention over one KV block: returns (acc, m, l) with
    acc UNNORMALIZED — the ring/sequence-parallel merge primitive."""
    bh, n, d = q.shape
    _, kn, _ = k.shape
    n_k = kn // bk
    has_mask = mask is not None

    qs_in = (q_scale[..., None] if quantized
             else jnp.zeros((bh, n, 1), jnp.float32))
    ks_in = (k_scale[:, None, :] if quantized
             else jnp.zeros((bh, 1, kn), jnp.float32))
    vs_in = (v_scale[:, None, :] if quantized_pv
             else jnp.zeros((bh, 1, kn), jnp.float32))
    mask_in = mask if has_mask else jnp.zeros((1, 1, 8), jnp.int8)
    mask_bh = mask_in.shape[0]

    kernel = functools.partial(
        _attn_kernel, bm=bm, bk=bk, n_k=n_k, d=d, causal=False,
        has_mask=has_mask, mask_is_bool=mask_is_bool, quantized=quantized,
        quantized_pv=quantized_pv, sm_scale=sm_scale, kn_valid=kn,
        partial_out=True)

    flops = 4 * n * kn * d * bh
    return pl.pallas_call(
        kernel,
        grid=(bh, pl.cdiv(n, bm)),
        in_specs=[
            pl.BlockSpec((1, bm, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kn, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kn, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kn), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kn), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, bm, mask_in.shape[-1]),
                (lambda b, i: (b % mask_bh, i, 0)) if has_mask
                else (lambda b, i: (0, 0, 0)),
                memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bm, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, n, 1), jnp.float32),
            jax.ShapeDtypeStruct((bh, n, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=q.size + k.size + v.size,
            transcendentals=n * kn * bh),
        interpret=pallas_interpret(),
    )(q, k, v, qs_in, ks_in, vs_in, mask_in)


def _attn_block_xla(q, k, v, q_scale, k_scale, v_scale, mask, *,
                    quantized, quantized_pv, sm_scale, mask_is_bool):
    if quantized:
        acc_t = jnp.int32 if q.dtype == jnp.int8 else jnp.float32
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=acc_t).astype(jnp.float32)
        s = s * q_scale[..., None] * k_scale[:, None, :]
    else:
        s = jnp.einsum("bnd,bkd->bnk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * sm_scale
    if mask is not None:
        if mask_is_bool:
            s = jnp.where(mask != 0, s, _NEG_INF)
        else:
            s = s + mask.astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if quantized_pv:
        p_eff = p * v_scale[:, None, :]
        p_scale = jnp.maximum(p_eff.max(-1, keepdims=True), 1e-20) / 127.0
        p_q = jnp.round(p_eff / p_scale)
        acc = jnp.einsum("bnk,bkd->bnd", p_q,
                         v.astype(jnp.float32)) * p_scale
    else:
        acc = jnp.einsum("bnk,bkd->bnd", p, v.astype(jnp.float32))
    return acc, m, l


def flash_attention_block(q, k, v, q_scale=None, k_scale=None, v_scale=None,
                          mask=None, *, quantized=True, quantized_pv=False,
                          sm_scale=1.0, mask_is_bool=True):
    """Partial flash attention over one KV block.

    q (BH, N, D) int8/fp8/float; k/v (BH, KN, D); scales per token; mask
    (1 or BH, N, KN).  Returns UNNORMALIZED (acc, m, l) for online-softmax
    merging across KV partitions — the seam between the attention kernel
    and ring attention (parallel/ring_attention.py)."""
    bh, n, d = q.shape
    kn = k.shape[1]
    use_kernel = (use_pallas() and n % 8 == 0 and kn % 128 == 0
                  and d % 128 == 0)
    if use_kernel:
        bm = min(512, n)
        while n % bm != 0:
            bm //= 2
        bk = min(512, kn)
        while kn % bk != 0:
            bk //= 2
        return _attn_block_pallas(
            q, k, v, q_scale, k_scale, v_scale, mask,
            quantized=quantized, quantized_pv=quantized_pv,
            sm_scale=float(sm_scale), mask_is_bool=mask_is_bool,
            bm=bm, bk=bk)
    return _attn_block_xla(
        q, k, v, q_scale, k_scale, v_scale, mask, quantized=quantized,
        quantized_pv=quantized_pv, sm_scale=float(sm_scale),
        mask_is_bool=mask_is_bool)


# ---------------------------------------------------------------------------
# XLA fallback (also the numerics reference for kernel tests)
# ---------------------------------------------------------------------------

def _attn_xla(q, k, v, q_scale, k_scale, v_scale, mask, *, causal,
              quantized, quantized_pv, sm_scale, mask_is_bool, out_dtype):
    if quantized:
        acc_t = jnp.int32 if q.dtype == jnp.int8 else jnp.float32
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=acc_t).astype(jnp.float32)
        s = s * q_scale[..., None] * k_scale[:, None, :]
    else:
        s = jnp.einsum("bnd,bkd->bnk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * sm_scale
    n, kn = s.shape[-2], s.shape[-1]
    if causal:
        ii = jnp.arange(n)[:, None]
        jj = jnp.arange(kn)[None, :]
        s = jnp.where(ii >= jj, s, _NEG_INF)
    if mask is not None:
        if mask_is_bool:
            s = jnp.where(mask != 0, s, _NEG_INF)
        else:
            s = s + mask.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    if quantized_pv:
        p_eff = p * v_scale[:, None, :]
        p_scale = jnp.maximum(p_eff.max(-1, keepdims=True), 1e-20) / 127.0
        p_q = jnp.round(p_eff / p_scale)
        out = jnp.einsum("bnk,bkd->bnd", p_q, v.astype(jnp.float32))
        out = out * p_scale
    else:
        out = jnp.einsum("bnk,bkd->bnd", p, v.astype(jnp.float32))
    return out.astype(out_dtype)


# ---------------------------------------------------------------------------
# Host wrapper (reference: triton_atten.py:195-353)
# ---------------------------------------------------------------------------

def _pad_last(x, to):
    d = x.shape[-1]
    if d == to:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, to - d)])


def attn_auto_matmul_dtype(n: int, kn: int, d: int) -> str | None:
    """Measured QK-dtype crossover policy for ``matmul_dtype="auto"``.

    The int8 MXU runs at 2x the bf16 rate only when the contraction is
    wide enough; a d=128 QK dot leaves it at the bf16 rate, so int8 QK
    pays its quantize pass for nothing at short n (measured 95.1 vs
    100.9 TF at n=4096 d=128 — the round-3 finding that the reference
    kernel's regime, triton_atten.py:37-192, needs mapping).  Crossovers
    from benchmarks/tpu_v5e_attention_sweep.txt (v5e):

      * d <= 64: int8 QK wins from n >= 4096 (the n^2 QK term dominates
        and the narrow-d dots are quantize-bound below that);
      * d >= 128: bf16 flash wins at every swept n (to 64K) — the int8
        rate advantage never materializes at this contraction width.

    Returns "int8" or None (= bf16 flash)."""
    if d <= 64 and min(n, kn) >= 4096:
        return "int8"
    return None


def quantized_attention(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    attn_mask: jax.Array | None = None,
    is_causal: bool = False,
    scale: float | None = None,
    *,
    smooth_k: bool = False,
    use_hadamard: bool = False,
    hadamard_group_size: int = 256,
    matmul_dtype: str | None = "default",
    pv_matmul_dtype: str | None = None,
    pv_scale_mode: str = "head",
    out_dtype=None,
    kv_scales: tuple | None = None,
) -> jax.Array:
    """Drop-in quantized scaled-dot-product attention.

    query/key/value: (B, H, N, D) — torch SDPA layout (reference parity).
    ``matmul_dtype`` in {"int8", "auto", None/"none"/"disabled"};
    ``pv_matmul_dtype`` optionally "int8" to run P·V quantized too.
    "auto" applies the measured crossover policy
    (:func:`attn_auto_matmul_dtype`): bf16 flash below the regime where
    int8 QK wins, int8 above it.

    ``pv_scale_mode`` ("head" | "token") picks the int8 P·V flavor: "head"
    quantizes V with one scale per (batch, kv-head) so the kernel can use a
    CONSTANT p-scale (p <= 1 after online softmax — no per-block requant,
    ~4 fewer VPU ops/logit); "token" is the reference's per-token V scale
    with per-row-block P requantization (triton_atten.py:169-185).

    ``kv_scales=(k_scale, v_scale)`` marks key/value as PRE-quantized int8
    with per-token scales of shape (B, KH, KN) — the quantized-KV-cache
    path (see models/llm.py): the cache stores int8 rows + scales and the
    kernel consumes them directly, so nothing re-quantizes per decode step.
    ``v_scale`` may be None (bf16 V, int8 K).  smooth_k / Hadamard are
    skipped for pre-quantized KV (they would have to be baked in at cache
    insert time).
    """
    b, h, n, d = query.shape
    _, kh, kn, _ = key.shape
    vd = value.shape[-1]
    if out_dtype is None:
        out_dtype = query.dtype
    if scale is None:
        scale = d ** -0.5
    kv_prequant = kv_scales is not None
    if matmul_dtype == "default":
        from ..envconfig import env_str
        matmul_dtype = env_str("SDNQ_TPU_ATTN_MATMUL_DTYPE", "int8")
    if matmul_dtype == "auto":
        matmul_dtype = attn_auto_matmul_dtype(n, kn, d)
    if matmul_dtype in ("enabled", "uint8"):
        matmul_dtype = "int8"  # reference: triton_atten.py:204-207
    if kv_prequant:
        matmul_dtype = "int8"
        smooth_k = False
        use_hadamard = False
    use_fp8 = matmul_dtype in ("fp8", "float8_e4m3fn")
    do_quant = matmul_dtype not in (None, "none", "no", "disabled")
    do_quant_pv = (kv_prequant and kv_scales[1] is not None) or \
        pv_matmul_dtype not in (None, "auto", "none", "no", "disabled")
    q_per_kv = h // kh

    qf = query.astype(jnp.float32)
    kf = key if kv_prequant else key.astype(jnp.float32)
    vf = value if kv_prequant and do_quant_pv else value.astype(jnp.float32)
    if smooth_k:
        # K mean-centering: softmax is invariant to per-row constant shifts
        # of the logits (reference :210-215)
        kf = kf - kf.mean(axis=2, keepdims=True)

    if use_hadamard and do_quant:
        hsize = next_power_of_2(min(d, hadamard_group_size))
        use_h, hsize = get_hadamard_group_size(next_power_of_2(d), hsize)
        if use_h and d % hsize == 0:
            qf = rotate_hadamard(qf, hsize)
            kf = rotate_hadamard(kf, hsize)

    # flatten heads
    qf = qf.reshape(b * h, n, d)
    kf = kf.reshape(b * kh, kn, d)
    vf = vf.reshape(b * kh, kn, vd)

    mask = None
    mask_is_bool = False
    if attn_mask is not None:
        mask_is_bool = attn_mask.dtype == jnp.bool_
        mask = jnp.broadcast_to(attn_mask, (b, h, n, kn)) \
            .reshape(b * h, n, kn)
        if mask_is_bool:
            mask = mask.astype(jnp.int8)

    if kv_prequant:
        q_q, q_s = quantize_int_mm(qf, axis=-1)
        q_scale = q_s.reshape(b * h, n) * scale
        k_q = kf
        k_scale = kv_scales[0].reshape(b * kh, kn)
        v_q = vf
        v_scale = (kv_scales[1].reshape(b * kh, kn)
                   if do_quant_pv else None)
    elif do_quant:
        if use_fp8:
            from ..quant.core import quantize_fp_mm
            q_q, q_s = quantize_fp_mm(qf, axis=-1)
            k_q, k_s = quantize_fp_mm(kf, axis=-1)
        else:
            q_q, q_s = quantize_int_mm(qf, axis=-1)
            k_q, k_s = quantize_int_mm(kf, axis=-1)
        q_scale = q_s.reshape(b * h, n) * scale
        k_scale = k_s.reshape(b * kh, kn)
    else:
        q_q, k_q = qf, kf
        q_scale = k_scale = None
    pv_const = False
    vs_head = None
    if kv_prequant:
        pass
    elif do_quant_pv and pv_scale_mode == "head":
        # per-(batch, kv-head) V scale -> constant-p-scale kernel path
        pv_const = True
        vs_head = jnp.maximum(jnp.abs(vf).max(axis=(1, 2), keepdims=True),
                              1e-20) / 127.0          # (B*KH, 1, 1)
        v_q = jnp.round(vf / vs_head).astype(jnp.int8)
        v_scale = None
    elif do_quant_pv:
        v_q, v_s = quantize_int_mm(vf, axis=-1)
        v_scale = v_s.reshape(b * kh, kn)
    else:
        v_q = vf
        v_scale = None

    dpad = max(128, next_power_of_2(d))
    from ..envconfig import env_bool
    use_kernel = (use_pallas() and n % 8 == 0 and d <= 256
                  and kn % 128 == 0
                  and not env_bool("SDNQ_TPU_ATTN_FORCE_XLA", False))
    if use_kernel:
        sm_for_kernel = float(scale)
        if not do_quant:
            # fold softmax scale + log2(e) into q and run the QK dot in
            # bf16 (f32 MXU is half rate on v5e); sm_scale=0.0 tells the
            # kernel the scale is pre-folded
            log2e = math.log2(math.e)
            q_q = (q_q * (scale * log2e)).astype(jnp.bfloat16)
            k_q = k_q.astype(jnp.bfloat16)
            sm_for_kernel = 0.0
        q_in = _pad_last(q_q, dpad)
        k_in = _pad_last(k_q, dpad)
        if not do_quant_pv:
            v_q = v_q.astype(jnp.bfloat16)  # MXU-friendly P·V in-kernel
        v_in = _pad_last(v_q, dpad)
        from ..envconfig import env_blocks
        ov = env_blocks("SDNQ_TPU_ATTN_BLOCKS", 2)
        bm = ov[0] if ov else min(512, max(8, n // max(1, n // 512)))
        bm = min(bm, n)
        while n % bm != 0:
            bm //= 2
        bk = ov[1] if ov else min(512, kn)
        bk = min(bk, kn)
        while kn % bk != 0:
            bk //= 2
        out = _attn_pallas(
            q_in, k_in, v_in, q_scale, k_scale, v_scale, mask,
            causal=is_causal, quantized=do_quant, quantized_pv=do_quant_pv,
            sm_scale=sm_for_kernel, q_per_kv=q_per_kv,
            mask_is_bool=mask_is_bool, out_dtype=jnp.dtype(out_dtype),
            bm=bm, bk=bk, kn_valid=kn, pv_const=pv_const)
        if pv_const:
            vs_rep = jnp.repeat(vs_head, q_per_kv, axis=0)
            out = (out * vs_rep).astype(jnp.dtype(out_dtype))
        out = out[..., :vd]
    else:
        if pv_const:
            # XLA fallback approximates the const-p-scale kernel with the
            # generic per-token path over uniform V scales (p_scale then
            # resolves to ~1/127 — numerically equivalent)
            v_scale = jnp.ones((b * kh, kn), jnp.float32)
        if q_per_kv > 1:
            k_q = jnp.repeat(k_q, q_per_kv, axis=0)
            v_q = jnp.repeat(v_q, q_per_kv, axis=0)
            if k_scale is not None:
                k_scale = jnp.repeat(k_scale, q_per_kv, axis=0)
            if v_scale is not None:
                v_scale = jnp.repeat(v_scale, q_per_kv, axis=0)
        out = _attn_xla(q_q, k_q, v_q, q_scale, k_scale, v_scale, mask,
                        causal=is_causal, quantized=do_quant,
                        quantized_pv=do_quant_pv, sm_scale=float(scale),
                        mask_is_bool=mask_is_bool,
                        out_dtype=jnp.dtype(out_dtype))
        if pv_const:
            vs_rep = jnp.repeat(vs_head, q_per_kv, axis=0)
            out = (out * vs_rep).astype(jnp.dtype(out_dtype))
    return out.reshape(b, h, n, vd)


