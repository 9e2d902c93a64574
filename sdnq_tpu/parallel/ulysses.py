"""Ulysses-style sequence parallelism: all-to-all heads<->sequence.

The second SP strategy (absent from the reference, SURVEY §5): instead of
rotating KV around a ring, one all-to-all re-shards (B, H, N/P, D) into
(B, H/P, N, D) so each device runs *full-sequence* attention for its head
slice — which lets the single-device quantized flash kernel
(kernels/attention.py) do the math — then a second all-to-all restores the
sequence sharding.  Preferable to ring attention when H >= P and the
sequence fits one device's VMEM budget; ring wins for extreme lengths.
"""

from __future__ import annotations

import functools

import jax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..kernels.attention import quantized_attention

__all__ = ["ulysses_attention"]


def ulysses_attention(query, key, value, mesh: Mesh, *,
                      axis: str = "sequence", is_causal: bool = False,
                      scale: float | None = None,
                      matmul_dtype: str | None = "int8",
                      pv_matmul_dtype: str | None = None,
                      out_dtype=None):
    """query/key/value: (B, H, N, D) global.  H must be divisible by the
    `axis` mesh extent."""
    b, h, n, d = query.shape
    p_size = mesh.shape[axis]
    if h % p_size != 0:
        raise ValueError(f"heads {h} not divisible by axis size {p_size}")
    if out_dtype is None:
        out_dtype = query.dtype

    spec = P(None, None, axis, None)

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec)
    def _ulysses(q, k, v):
        # (B, H, N/P, D) -> all_to_all over heads -> (B, H/P, N, D)
        def scatter_heads(x):
            return jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=2,
                                      tiled=True)

        def gather_heads(x):
            return jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1,
                                      tiled=True)

        qh = scatter_heads(q)
        kh = scatter_heads(k)
        vh = scatter_heads(v)
        out = quantized_attention(
            qh, kh, vh, is_causal=is_causal, scale=scale,
            matmul_dtype=matmul_dtype, pv_matmul_dtype=pv_matmul_dtype,
            out_dtype=out_dtype)
        return gather_heads(out)

    with jax.set_mesh(mesh):
        return _ulysses(query, key, value)
