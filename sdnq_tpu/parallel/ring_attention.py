"""Ring attention: sequence/context-parallel flash attention over the mesh.

Absent from the reference (SURVEY §5: "no ring attention, no Ulysses, no
context parallel") — a first-class component here.  Q/K/V are sharded along
the sequence axis; KV blocks rotate around the ring via ppermute while each
device folds incoming blocks into its flash-attention running state
(m, l, acc) with the online-softmax merge.  Per-block math runs the Pallas
flash kernel through ``flash_attention_block`` (kernels/attention.py), which
returns unnormalized partial results for the merge.

ICI traffic accounting (int8 ring): K and V travel as int8 plus one f32
scale per token — (2·N·D + 8·N) bytes per hop vs 4·N·D for bf16 KV, i.e.
**~2x less ICI traffic** (1.94x at D=128).  Per-block compute is int8 QK
(and optionally int8 PV) on the MXU.

Causal load balancing ("zigzag"): with contiguous sharding the last device
does P× the work of the first.  Here each device owns chunk pair
(i, 2P-1-i) of the sequence, which equalizes causal work at 2P+1
chunk-pairs per device; fully-masked chunk pairs are skipped with lax.cond,
and the only masked (triangular) pairs occur at ring step 0 with a static
mask.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..kernels.attention import flash_attention_block
from ..quant.core import quantize_int_mm

__all__ = ["ring_attention"]

_NEG_INF = -1e30


def _merge(state, part):
    """Online-softmax merge of a partial block result into the running
    state.  state/part: (acc, m, l) with acc unnormalized."""
    acc, m, l = state
    acc_i, m_i, l_i = part
    m_new = jnp.maximum(m, m_i)
    a0 = jnp.exp(m - m_new)
    a1 = jnp.exp(m_i - m_new)
    return acc * a0 + acc_i * a1, m_new, l * a0 + l_i * a1


def _causal_mask(nq: int, kn: int) -> jax.Array:
    ii = jnp.arange(nq)[:, None]
    jj = jnp.arange(kn)[None, :]
    return (ii >= jj).astype(jnp.int8)[None]


def ring_attention(query, key, value, mesh: Mesh, *, axis: str = "sequence",
                   scale: float | None = None, causal: bool = False,
                   matmul_dtype: str | None = "int8",
                   quantize_pv: bool | None = None,
                   out_dtype=None):
    """query/key/value: (B, H, N, D) GLOBAL arrays (or already sharded on N).

    Returns (B, H, N, D) attention output, computed with N sharded over
    `axis` and quantized KV rotating around the ring.  Causal attention uses
    the zigzag chunk layout for load balance when N % (2·P) == 0."""
    b, h, n, d = query.shape
    if scale is None:
        scale = d ** -0.5
    if out_dtype is None:
        out_dtype = query.dtype
    p_size = mesh.shape[axis]
    quantized = matmul_dtype == "int8"
    if quantize_pv is None:
        from ..envconfig import env_bool
        quantize_pv = env_bool("SDNQ_TPU_RING_QUANTIZE_PV", True) \
            and quantized
    quantize_pv = bool(quantize_pv and quantized)
    balance = causal and p_size > 1 and n % (2 * p_size) == 0

    qf = query.astype(jnp.float32)
    kf = key.astype(jnp.float32)
    vf = value.astype(jnp.float32)

    if balance:
        c = n // (2 * p_size)
        perm = np.concatenate([
            np.r_[i * c:(i + 1) * c,
                  (2 * p_size - 1 - i) * c:(2 * p_size - i) * c]
            for i in range(p_size)])
        inv_perm = np.argsort(perm)
        qf, kf, vf = qf[:, :, perm], kf[:, :, perm], vf[:, :, perm]

    if quantized:
        q_q, q_s = quantize_int_mm(qf, axis=-1)
        k_q, k_s = quantize_int_mm(kf, axis=-1)
        q_s = q_s[..., 0] * scale
        k_s = k_s[..., 0]
    else:
        q_q, k_q = qf.astype(jnp.bfloat16), kf.astype(jnp.bfloat16)
        q_s = jnp.zeros((b, h, n), jnp.float32)
        k_s = jnp.zeros((b, h, n), jnp.float32)
    if quantize_pv:
        v_q, v_s = quantize_int_mm(vf, axis=-1)
        v_s = v_s[..., 0]
    else:
        v_q = vf.astype(jnp.bfloat16)
        v_s = jnp.zeros((b, h, n), jnp.float32)

    spec = P(None, None, axis, None)
    sspec = P(None, None, axis)
    nq = n // p_size

    def _flash(q, k, v, qs, ks, vs, mask):
        return flash_attention_block(
            q, k, v, qs, ks, vs, mask, quantized=quantized,
            quantized_pv=quantize_pv, sm_scale=scale, mask_is_bool=True)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec, spec, sspec, sspec, sspec),
        out_specs=spec)
    def _ring(q, k, v, qs, ks, vs):
        idx = jax.lax.axis_index(axis)
        bh = b * h
        q_l = q.reshape(bh, nq, d)
        qs_l = qs.reshape(bh, nq)
        perm_pairs = [(i, (i + 1) % p_size) for i in range(p_size)]

        def init_state(rows):
            return (jnp.zeros((bh, rows, d), jnp.float32),
                    jnp.full((bh, rows, 1), _NEG_INF, jnp.float32),
                    jnp.zeros((bh, rows, 1), jnp.float32))

        def vary(t):
            return jax.tree_util.tree_map(
                lambda a: jax.lax.pcast(a, axis, to="varying"), t)

        if balance:
            c_l = nq // 2
            q_lo, q_hi = q_l[:, :c_l], q_l[:, c_l:]
            qs_lo, qs_hi = qs_l[:, :c_l], qs_l[:, c_l:]
            tri = _causal_mask(c_l, c_l)
            st_lo = vary(init_state(c_l))
            st_hi = vary(init_state(c_l))

            def step(carry, i):
                k_c, v_c, ks_c, vs_c, st_lo, st_hi = carry
                src = (idx - i) % p_size
                kr = k_c.reshape(bh, nq, d)
                vr = v_c.reshape(bh, nq, d)
                ksr = ks_c.reshape(bh, nq)
                vsr = vs_c.reshape(bh, nq)
                k_lo, k_hi = kr[:, :c_l], kr[:, c_l:]
                v_lo, v_hi = vr[:, :c_l], vr[:, c_l:]
                ks_lo, ks_hi = ksr[:, :c_l], ksr[:, c_l:]
                vs_lo, vs_hi = vsr[:, :c_l], vsr[:, c_l:]
                first = i == 0  # src == idx: the only masked (diagonal) step

                # pair A: lo rows x lo cols — needed iff src <= idx,
                # triangular at src == idx
                def do_a(st):
                    m = jnp.where(first, tri, jnp.ones_like(tri))
                    return _merge(st, _flash(q_lo, k_lo, v_lo, qs_lo,
                                             ks_lo, vs_lo, m))
                st_lo = jax.lax.cond(src <= idx, do_a, lambda st: st, st_lo)

                # pair B: hi rows x lo cols — always full attend
                st_hi = _merge(st_hi, _flash(q_hi, k_lo, v_lo, qs_hi,
                                             ks_lo, vs_lo, None))

                # pair C: hi rows x hi cols — needed iff src >= idx,
                # triangular at src == idx
                def do_c(st):
                    m = jnp.where(first, tri, jnp.ones_like(tri))
                    return _merge(st, _flash(q_hi, k_hi, v_hi, qs_hi,
                                             ks_hi, vs_hi, m))
                st_hi = jax.lax.cond(src >= idx, do_c, lambda st: st, st_hi)

                k_n = jax.lax.ppermute(k_c, axis, perm_pairs)
                v_n = jax.lax.ppermute(v_c, axis, perm_pairs)
                ks_n = jax.lax.ppermute(ks_c, axis, perm_pairs)
                vs_n = jax.lax.ppermute(vs_c, axis, perm_pairs)
                return (k_n, v_n, ks_n, vs_n, st_lo, st_hi), None

            (k, v, ks, vs, st_lo, st_hi), _ = jax.lax.scan(
                step, (k, v, ks, vs, st_lo, st_hi), jnp.arange(p_size))
            acc = jnp.concatenate([st_lo[0], st_hi[0]], axis=1)
            l = jnp.concatenate([st_lo[2], st_hi[2]], axis=1)
        else:
            st = vary(init_state(nq))

            def step(carry, i):
                k_c, v_c, ks_c, vs_c, st = carry
                src = (idx - i) % p_size
                kr = k_c.reshape(bh, nq, d)
                vr = v_c.reshape(bh, nq, d)
                ksr = ks_c.reshape(bh, nq)
                vsr = vs_c.reshape(bh, nq)
                mask = None
                if causal:
                    rows = idx * nq + jax.lax.broadcasted_iota(
                        jnp.int32, (nq, nq), 0)
                    cols = src * nq + jax.lax.broadcasted_iota(
                        jnp.int32, (nq, nq), 1)
                    mask = (rows >= cols).astype(jnp.int8)[None]
                if causal:
                    # fully-masked blocks (src strictly in the future)
                    # contribute nothing; cond skips their compute
                    st = jax.lax.cond(
                        src <= idx,
                        lambda s: _merge(s, _flash(q_l, kr, vr, qs_l,
                                                   ksr, vsr, mask)),
                        lambda s: s, st)
                else:
                    st = _merge(st, _flash(q_l, kr, vr, qs_l, ksr, vsr,
                                           mask))
                k_n = jax.lax.ppermute(k_c, axis, perm_pairs)
                v_n = jax.lax.ppermute(v_c, axis, perm_pairs)
                ks_n = jax.lax.ppermute(ks_c, axis, perm_pairs)
                vs_n = jax.lax.ppermute(vs_c, axis, perm_pairs)
                return (k_n, v_n, ks_n, vs_n, st), None

            (k, v, ks, vs, st), _ = jax.lax.scan(
                step, (k, v, ks, vs, st), jnp.arange(p_size))
            acc, _, l = st

        out = (acc / jnp.maximum(l, 1e-30)).astype(out_dtype)
        return out.reshape(b, h, nq, d)

    with jax.set_mesh(mesh):
        out = _ring(q_q, k_q, v_q, q_s, k_s, v_s)
    if balance:
        out = out[:, :, inv_perm]
    return out
