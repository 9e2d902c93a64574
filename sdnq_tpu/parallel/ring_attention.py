"""Ring attention: sequence/context-parallel flash attention over the mesh.

Absent from the reference (SURVEY §5: "no ring attention, no Ulysses, no
context parallel") — a first-class component here.  Q/K/V are sharded along
the sequence axis; KV blocks rotate around the ring via ppermute while each
device folds incoming blocks into its flash-attention running state
(m, l, acc) with the usual online-softmax merge.  With int8 quantization
the *quantized* KV bytes and their per-token scales travel the ring — 4x
less ICI traffic than bf16 ring attention.

Collectives ride the `sequence` mesh axis (ICI); compute overlaps the next
block's permute because XLA schedules the ppermute asynchronously.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..quant.core import quantize_int_mm

__all__ = ["ring_attention"]

_NEG_INF = -1e30


def _block_attn(q, k, v, q_scale, k_scale, bias_term, m, l, acc, *,
                quantized: bool, sm_scale: float):
    """Fold one KV block into the running flash state.  q (B,H,Nq,D);
    k/v (B,H,Nk,D)."""
    if quantized:
        s = jnp.einsum("bhnd,bhkd->bhnk", q.astype(jnp.int32),
                       k.astype(jnp.int32)).astype(jnp.float32)
        s = s * q_scale[..., None] * k_scale[..., None, :]
    else:
        s = jnp.einsum("bhnd,bhkd->bhnk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * sm_scale
    if bias_term is not None:
        s = s + bias_term
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m - m_new)
    l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pv = jnp.einsum("bhnk,bhkd->bhnd", p, v.astype(jnp.float32))
    acc_new = acc * alpha + pv
    return m_new, l_new, acc_new


def ring_attention(query, key, value, mesh: Mesh, *, axis: str = "sequence",
                   scale: float | None = None, causal: bool = False,
                   matmul_dtype: str | None = "int8",
                   out_dtype=None):
    """query/key/value: (B, H, N, D) GLOBAL arrays (or already sharded on N).

    Returns (B, H, N, D) attention output, computed with N sharded over
    `axis` and KV rotating around the ring.  Causal masking uses global
    block offsets."""
    b, h, n, d = query.shape
    if scale is None:
        scale = d ** -0.5
    if out_dtype is None:
        out_dtype = query.dtype
    p_size = mesh.shape[axis]
    quantized = matmul_dtype == "int8"

    qf = query.astype(jnp.float32)
    kf = key.astype(jnp.float32)
    vf = value.astype(jnp.float32)
    if quantized:
        q_q, q_s = quantize_int_mm(qf, axis=-1)
        k_q, k_s = quantize_int_mm(kf, axis=-1)
        q_s = q_s[..., 0] * scale
        k_s = k_s[..., 0]
    else:
        q_q, k_q = qf, kf
        q_s = jnp.zeros((b, h, n), jnp.float32)
        k_s = jnp.zeros((b, h, n), jnp.float32)
    v_b = vf.astype(jnp.bfloat16)

    spec = P(None, None, axis, None)
    sspec = P(None, None, axis)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec, spec, sspec, sspec),
        out_specs=spec)
    def _ring(q, k, v, qs, ks):
        idx = jax.lax.axis_index(axis)
        nq = q.shape[2]
        # pvary marks the carry as device-varying over the ring axis so the
        # scan carry types match (new shard_map tracks varying manual axes)
        m = jax.lax.pcast(jnp.full((b, h, nq, 1), _NEG_INF, jnp.float32),
                          axis, to="varying")
        l = jax.lax.pcast(jnp.zeros((b, h, nq, 1), jnp.float32), axis,
                          to="varying")
        acc = jax.lax.pcast(jnp.zeros((b, h, nq, d), jnp.float32), axis,
                            to="varying")
        perm = [(i, (i + 1) % p_size) for i in range(p_size)]

        def step(carry, i):
            k_cur, v_cur, ks_cur, m, l, acc = carry
            src_idx = (idx - i) % p_size  # global shard the block came from
            bias_term = None
            if causal:
                row0 = idx * nq
                col0 = src_idx * k_cur.shape[2]
                rows = row0 + jax.lax.broadcasted_iota(
                    jnp.int32, (nq, k_cur.shape[2]), 0)
                cols = col0 + jax.lax.broadcasted_iota(
                    jnp.int32, (nq, k_cur.shape[2]), 1)
                bias_term = jnp.where(rows >= cols, 0.0, _NEG_INF)[
                    None, None]
            m, l, acc = _block_attn(
                q, k_cur, v_cur, qs, ks_cur, bias_term, m, l, acc,
                quantized=quantized, sm_scale=scale)
            k_nxt = jax.lax.ppermute(k_cur, axis, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis, perm)
            ks_nxt = jax.lax.ppermute(ks_cur, axis, perm)
            return (k_nxt, v_nxt, ks_nxt, m, l, acc), None

        (k, v, ks, m, l, acc), _ = jax.lax.scan(
            step, (k, v, ks, m, l, acc), jnp.arange(p_size))
        return (acc / jnp.maximum(l, 1e-30)).astype(out_dtype)

    with jax.set_mesh(mesh):
        return _ring(q_q, k_q, v_b, q_s, k_s)
