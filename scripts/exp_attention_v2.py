#!/usr/bin/env python
"""Attention kernel v2 experiments (round 3).

Hypotheses from the round-2 roofline analysis (benchmarks/tpu_v5e_r2.txt):
  * the "unquantized" flash kernel runs QK in f32 (half the bf16 MXU rate)
    because the host wrapper casts to f32 — fold the softmax scale into q
    and cast QK to bf16;
  * softmax VPU work (~8-9 ops/logit) is serialized with the MXU dots; a
    1-deep manual software pipeline (issue block t+1's QK dot before block
    t's softmax) should let the in-order VLIW core overlap MXU and VPU;
  * int8 QK adds 3 VPU ops/logit (i32->f32 cast + qs + ks multiplies); a
    per-head K scale folds ks into qs outside the kernel (1 op saved).

Each variant is a standalone pallas_call so the experiment isolates one
change at a time.  FLOPs = 4*B*H*N^2*D.
"""

import argparse
import functools
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scripts.bench_common import run_path

_NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Variant A/B: full-KV-resident kernel (round-2 structure), bf16 QK,
# optional 1-deep manual pipeline of the QK dot.
# ---------------------------------------------------------------------------

def _kern_fullkv(q_ref, k_ref, v_ref, qs_ref, ks_ref, out_ref, *, bm, bk,
                 n_k, d, pipeline, quantized, fold_ks, ablate="none",
                 exp_bf16=False, k_transposed=False):
    q = q_ref[0]
    acc_t = jnp.int32 if q.dtype == jnp.int8 else jnp.float32
    m_i = jnp.full((bm, 1), _NEG_INF, jnp.float32)
    l_i = jnp.zeros((bm, 1), jnp.float32)
    acc = jnp.zeros((bm, d), jnp.float32)
    if quantized:
        qs = qs_ref[0]

    def qk(kt):
        if k_transposed:
            k_blk = k_ref[0, :, kt * bk:(kt + 1) * bk]      # (D, BK)
            s = jax.lax.dot_general(q, k_blk, (((1,), (0,)), ((), ())),
                                    preferred_element_type=acc_t)
        else:
            k_blk = k_ref[0, kt * bk:(kt + 1) * bk, :]      # (BK, D)
            s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                    preferred_element_type=acc_t)
        return s

    def soft(kt, s, m_i, l_i, acc):
        if quantized:
            s = s.astype(jnp.float32) * qs
            if not fold_ks:
                s = s * ks_ref[0, :, kt * bk:(kt + 1) * bk]
        v_blk = v_ref[0, kt * bk:(kt + 1) * bk, :]
        if ablate == "dots":          # MXU-only floor: skip softmax entirely
            pv = jax.lax.dot_general(s.astype(v_blk.dtype), v_blk,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            return m_i, l_i, acc + pv
        if ablate == "noexp":         # softmax minus the transcendental
            m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
            p = s - m_new
            alpha = m_i - m_new
            l_i = l_i + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(p.astype(v_blk.dtype), v_blk,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            return m_new, l_i, acc * alpha + pv
        if ablate == "nomax":         # exp2 but no running-max bookkeeping
            p = jnp.exp2(s - 8.0)
            l_i = l_i + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(p.astype(v_blk.dtype), v_blk,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            return m_i, l_i, acc + pv
        if ablate == "pvconst":
            # int8 PV with CONSTANT p scale: p=exp2(s-m)<=1 so p*127 is
            # int8-representable; the 127 cancels against l in the final
            # normalize (out = acc/l * vs_head).  No per-block requant.
            m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
            p127 = jnp.exp2(s - (m_new - 6.9886))     # p * 127
            alpha = jnp.exp2(m_i - m_new)
            l_i = l_i * alpha + jnp.sum(p127, axis=-1, keepdims=True)
            p_q = jnp.round(p127).astype(jnp.int8)
            pv = jax.lax.dot_general(p_q, v_blk, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
            acc = acc * alpha + pv.astype(jnp.float32)
            return m_new, l_i, acc
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        if exp_bf16:
            p = jnp.exp2((s - m_new).astype(jnp.bfloat16))
            l_i = (l_i * jnp.exp2(m_i - m_new)
                   + jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True))
            alpha = jnp.exp2(m_i - m_new)
        else:
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m_i - m_new)
            l_i = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(p.astype(v_blk.dtype), v_blk,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc = acc * alpha + pv
        return m_new, l_i, acc

    if pipeline:
        s_next = qk(0)
        for kt in range(n_k):
            s_cur = s_next
            if kt + 1 < n_k:
                s_next = qk(kt + 1)
            m_i, l_i, acc = soft(kt, s_cur, m_i, l_i, acc)
    else:
        for kt in range(n_k):
            m_i, l_i, acc = soft(kt, qk(kt), m_i, l_i, acc)

    out_ref[0] = (acc / jnp.maximum(l_i, 1e-30)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bk", "pipeline",
                                             "quantized", "fold_ks",
                                             "ablate", "exp_bf16",
                                             "k_transposed"))
def attn_fullkv(q, k, v, qs, ks, *, bm, bk, pipeline, quantized, fold_ks,
                ablate="none", exp_bf16=False, k_transposed=False):
    bh, n, d = q.shape
    kn = v.shape[1]
    n_k = kn // bk
    kernel = functools.partial(_kern_fullkv, bm=bm, bk=bk, n_k=n_k, d=d,
                               pipeline=pipeline, quantized=quantized,
                               fold_ks=fold_ks, ablate=ablate,
                               exp_bf16=exp_bf16, k_transposed=k_transposed)
    k_spec = (pl.BlockSpec((1, d, kn), lambda b, i: (b, 0, 0))
              if k_transposed
              else pl.BlockSpec((1, kn, d), lambda b, i: (b, 0, 0)))
    return pl.pallas_call(
        kernel,
        grid=(bh, n // bm),
        in_specs=[
            pl.BlockSpec((1, bm, d), lambda b, i: (b, i, 0)),
            k_spec,
            pl.BlockSpec((1, kn, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, bm, 1), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, kn), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bm, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * kn * d * bh, bytes_accessed=q.size + k.size + v.size,
            transcendentals=n * kn * bh),
    )(q, k, v, qs, ks)


# ---------------------------------------------------------------------------
# Variant M: monolithic single-pass softmax — KV fits in VMEM, so skip the
# online-softmax bookkeeping entirely: one QK dot over the full KV width,
# exact row softmax, one PV dot with contraction=KN (full int8 MXU rate).
# ---------------------------------------------------------------------------

def _kern_mono(q_ref, k_ref, v_ref, qs_ref, ks_ref, out_ref, *, bm, d,
               kn, quantized, fold_ks, pv_int8):
    q = q_ref[0]
    acc_t = jnp.int32 if q.dtype == jnp.int8 else jnp.float32
    k_all = k_ref[0]                                   # (D, KN) transposed
    s = jax.lax.dot_general(q, k_all, (((1,), (0,)), ((), ())),
                            preferred_element_type=acc_t)
    if quantized:
        s = s.astype(jnp.float32) * qs_ref[0]
        if not fold_ks:
            s = s * ks_ref[0]
    m = jnp.max(s, axis=-1, keepdims=True)
    v_all = v_ref[0]                                   # (KN, D)
    if pv_int8:
        p127 = jnp.exp2(s - (m - 6.9886))
        l = jnp.sum(p127, axis=-1, keepdims=True)
        p_q = jnp.round(p127).astype(jnp.int8)
        pv = jax.lax.dot_general(p_q, v_all, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        out_ref[0] = (pv.astype(jnp.float32) / l).astype(out_ref.dtype)
    else:
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(p.astype(v_all.dtype), v_all,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        out_ref[0] = (pv / l).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "quantized", "fold_ks",
                                             "pv_int8"))
def attn_mono(q, kT, v, qs, ks, *, bm, quantized, fold_ks, pv_int8):
    bh, n, d = q.shape
    kn = v.shape[1]
    kernel = functools.partial(_kern_mono, bm=bm, d=d, kn=kn,
                               quantized=quantized, fold_ks=fold_ks,
                               pv_int8=pv_int8)
    return pl.pallas_call(
        kernel,
        grid=(bh, n // bm),
        in_specs=[
            pl.BlockSpec((1, bm, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, d, kn), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, kn, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, bm, 1), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, 1, kn), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bm, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * kn * d * bh, bytes_accessed=q.size + kT.size + v.size,
            transcendentals=n * kn * bh),
    )(q, kT, v, qs, ks)


# ---------------------------------------------------------------------------
# Variant C: grid over KV blocks, scratch accumulators.
# ---------------------------------------------------------------------------

def _kern_gridkv(q_ref, k_ref, v_ref, qs_ref, ks_ref, out_ref,
                 acc_ref, m_ref, l_ref, *, bm, bk, d, n_k, quantized,
                 fold_ks):
    kv = pl.program_id(2)

    @pl.when(kv == 0)
    def _init():
        m_ref[...] = jnp.full((bm, 1), _NEG_INF, jnp.float32)
        l_ref[...] = jnp.zeros((bm, 1), jnp.float32)
        acc_ref[...] = jnp.zeros((bm, d), jnp.float32)

    q = q_ref[0]
    acc_t = jnp.int32 if q.dtype == jnp.int8 else jnp.float32
    k_blk = k_ref[0]
    s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                            preferred_element_type=acc_t)
    if quantized:
        s = s.astype(jnp.float32) * qs_ref[0]
        if not fold_ks:
            s = s * ks_ref[0]
    m_i = m_ref[...]
    m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp2(s - m_new)
    alpha = jnp.exp2(m_i - m_new)
    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    v_blk = v_ref[0]
    pv = jax.lax.dot_general(p.astype(v_blk.dtype), v_blk,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha + pv
    m_ref[...] = m_new

    @pl.when(kv == n_k - 1)
    def _done():
        out_ref[0] = (acc_ref[...] /
                      jnp.maximum(l_ref[...], 1e-30)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bk", "quantized",
                                             "fold_ks"))
def attn_gridkv(q, k, v, qs, ks, *, bm, bk, quantized, fold_ks):
    bh, n, d = q.shape
    kn = k.shape[1]
    n_k = kn // bk
    kernel = functools.partial(_kern_gridkv, bm=bm, bk=bk, d=d, n_k=n_k,
                               quantized=quantized, fold_ks=fold_ks)
    return pl.pallas_call(
        kernel,
        grid=(bh, n // bm, n_k),
        in_specs=[
            pl.BlockSpec((1, bm, d), lambda b, i, kv: (b, i, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, kv: (b, kv, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, kv: (b, kv, 0)),
            pl.BlockSpec((1, bm, 1), lambda b, i, kv: (b, i, 0)),
            pl.BlockSpec((1, 1, bk), lambda b, i, kv: (b, 0, kv)),
        ],
        out_specs=pl.BlockSpec((1, bm, d), lambda b, i, kv: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((bm, d), jnp.float32),
            pltpu.VMEM((bm, 1), jnp.float32),
            pltpu.VMEM((bm, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * kn * d * bh, bytes_accessed=q.size + k.size + v.size,
            transcendentals=n * kn * bh),
    )(q, k, v, qs, ks)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--h", type=int, default=16)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--quant", action="store_true", help="int8 QK variants")
    ap.add_argument("--bms", type=str, default="512")
    ap.add_argument("--bks", type=str, default="512")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    bh = args.b * args.h
    n, d = args.n, args.d
    scale = d ** -0.5
    log2e = math.log2(math.e)
    qf = rng.normal(size=(bh, n, d)).astype(np.float32) * 0.5
    kf = rng.normal(size=(bh, n, d)).astype(np.float32) * 0.5
    vf = rng.normal(size=(bh, n, d)).astype(np.float32) * 0.5
    flops = 4.0 * bh * n * n * d

    if args.quant:
        # per-token int8
        qs_t = np.abs(qf).max(-1, keepdims=True) / 127.0 + 1e-12
        ks_t = np.abs(kf).max(-1, keepdims=True) / 127.0 + 1e-12
        q8 = jnp.asarray(np.round(qf / qs_t).astype(np.int8))
        k8 = jnp.asarray(np.round(kf / ks_t).astype(np.int8))
        qs = jnp.asarray((qs_t * scale * log2e).astype(np.float32))
        ks = jnp.asarray(ks_t[..., 0][:, None, :].astype(np.float32))
        # per-head K scale folded into qs (fold_ks variants)
        ks_h = np.abs(kf).max(axis=(1, 2), keepdims=True) / 127.0 + 1e-12
        k8h = jnp.asarray(np.round(kf / ks_h).astype(np.int8))
        qs_f = jnp.asarray((qs_t * ks_h * scale * log2e).astype(np.float32))
        v16 = jnp.asarray(vf).astype(jnp.bfloat16)
        dummy_ks = jnp.ones((bh, 1, n), jnp.float32)

        k8T = jnp.swapaxes(k8, 1, 2)
        k8hT = jnp.swapaxes(k8h, 1, 2)
        vs_hv = np.abs(vf).max(axis=(1, 2), keepdims=True) / 127.0 + 1e-12
        v8h = jnp.asarray(np.round(vf / vs_hv).astype(np.int8))
        for bm in map(int, args.bms.split(",")):
            for bk in map(int, args.bks.split(",")):
                for tag, kin, qsin, ksin, kw in [
                    ("fullkv", k8, qs, ks, dict()),
                    ("fullkv ablate=dots", k8, qs, ks, dict(ablate="dots")),
                    ("fullkv kT", k8T, qs, ks, dict(k_transposed=True)),
                    ("fullkv kT ablate=dots", k8T, qs, ks,
                     dict(k_transposed=True, ablate="dots")),
                    ("fullkv kT+foldks", k8hT, qs_f, dummy_ks,
                     dict(k_transposed=True, fold_ks=True)),
                    ("fullkv kT+foldks+pipe", k8hT, qs_f, dummy_ks,
                     dict(k_transposed=True, fold_ks=True, pipeline=True)),
                    ("fullkv pvconst", k8, qs, ks, dict(ablate="pvconst")),
                    ("mono pv_int8", None, qs, ks, dict(mono=True)),
                    ("mono pv_bf16", None, qs, ks,
                     dict(mono=True, pv_int8=False)),
                    ("fullkv kT pvconst", k8T, qs, ks,
                     dict(k_transposed=True, ablate="pvconst")),
                    ("fullkv kT pvconst+pipe", k8T, qs, ks,
                     dict(k_transposed=True, ablate="pvconst",
                          pipeline=True)),
                ]:
                    kw.setdefault("pipeline", False)
                    kw.setdefault("fold_ks", False)
                    if kw.pop("mono", False):
                        pv8 = kw.pop("pv_int8", True)
                        run_path(f"int8 {tag} bm={bm}",
                                 functools.partial(attn_mono, bm=bm,
                                                   quantized=True,
                                                   fold_ks=False,
                                                   pv_int8=pv8),
                                 q8, k8T, v8h if pv8 else v16, qsin, ksin,
                                 flops=flops, steps=args.steps)
                        continue
                    vin = v8h if kw.get("ablate") == "pvconst" else v16
                    run_path(f"int8 {tag} bm={bm} bk={bk}",
                             functools.partial(attn_fullkv, bm=bm, bk=bk,
                                               quantized=True, **kw),
                             q8, kin, vin, qsin, ksin, flops=flops,
                             steps=args.steps)
    else:
        # bf16 QK with scale*log2e folded into q
        qb = jnp.asarray(qf * scale * log2e).astype(jnp.bfloat16)
        kb = jnp.asarray(kf).astype(jnp.bfloat16)
        vb = jnp.asarray(vf).astype(jnp.bfloat16)
        dqs = jnp.zeros((bh, n, 1), jnp.float32)
        dks = jnp.zeros((bh, 1, n), jnp.float32)
        kbT = jnp.swapaxes(kb, 1, 2)   # (BH, D, KN)
        for bm in map(int, args.bms.split(",")):
            for bk in map(int, args.bks.split(",")):
                for tag, kw in [
                    ("fullkv", dict(pipeline=False)),
                    ("fullkv ablate=dots", dict(pipeline=False,
                                                ablate="dots")),
                    ("fullkv kT", dict(pipeline=False, k_transposed=True)),
                    ("fullkv kT ablate=dots", dict(pipeline=False,
                                                   k_transposed=True,
                                                   ablate="dots")),
                    ("fullkv kT+pipe", dict(pipeline=True,
                                            k_transposed=True)),
                ]:
                    kin = kbT if kw.get("k_transposed") else kb
                    run_path(f"bf16 {tag} bm={bm} bk={bk}",
                             functools.partial(attn_fullkv, bm=bm, bk=bk,
                                               quantized=False,
                                               fold_ks=False, **kw),
                             qb, kin, vb, dqs, dks, flops=flops,
                             steps=args.steps)


if __name__ == "__main__":
    main()
