"""Batched host->device tree transfer.

Through the tunneled TPU runtime every ``device_put`` pays a per-array
round-trip: a quantized SDXL tree (2,421 leaves, 2.9 GB) moves at
~25 MB/s (~3 min) while a half-as-many-leaves bf16 tree moves at
~108 MB/s — the per-leaf overhead, not the bytes, dominates.  Those
minutes count against the session's death window (STATUS.md round-4/5
notes), so the transfer itself was killing the SDXL benchmark.

``device_put_packed`` groups leaves by element WIDTH, flattens each group
into one 1-D host buffer viewed at that width (uint8/uint16/uint32/
uint64), ships the few buffers as single transfers at full bandwidth, and
re-slices every leaf on-device inside one jitted program (element-offset
slice -> same-width bitcast -> reshape).  Same-width bitcasts are
elementwise, so no (N, itemsize) byte reshape exists to get lane-padded
by the TPU (8,128) tiling (a naive byte-wise unpack allocated 64x the
tree: u8[1.46e9, 2] padded to 186 GB).  The unpack program is shape-only
and lands in the persistent compile cache.

This plays the role of the reference's pinned-memory batched loader
(file_loader.py: multi-threaded reads into one pinned buffer) for the
tunnel-TPU topology.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["device_put_packed"]

_CARRIER = {1: np.uint8, 2: np.uint16, 4: np.uint32, 8: np.uint64}


def device_put_packed(tree, device):
    """jax.device_put(tree, device) semantics via one bulk transfer per
    element width (at most 4)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrs = [np.ascontiguousarray(np.asarray(l)) for l in leaves]

    # group leaf indices by element width
    groups: dict[int, list[int]] = {}
    for idx, a in enumerate(arrs):
        groups.setdefault(a.dtype.itemsize, []).append(idx)

    bufs = {}
    offsets = {}
    for size, idxs in groups.items():
        carrier = _CARRIER[size]
        total = sum(arrs[i].size for i in idxs)
        flat = np.empty((total,), carrier)
        off = 0
        for i in idxs:
            n = arrs[i].size
            flat[off:off + n] = arrs[i].reshape(-1).view(carrier)
            offsets[i] = off
            off += n
        bufs[size] = jax.device_put(flat, device)

    metas = [(a.shape, a.dtype) for a in arrs]
    sizes_order = sorted(bufs)  # stable positional args for the jit

    def unpack(*buf_list):
        by_size = dict(zip(sizes_order, buf_list))
        outs = []
        for i, (shape, dtype) in enumerate(metas):
            count = math.prod(shape)
            chunk = jax.lax.dynamic_slice(
                by_size[dtype.itemsize], (offsets[i],), (count,))
            if chunk.dtype != dtype:
                chunk = jax.lax.bitcast_convert_type(chunk, jnp.dtype(dtype))
            outs.append(chunk.reshape(shape))
        return tuple(outs)

    out_leaves = jax.jit(unpack)(*[bufs[s] for s in sizes_order])
    return jax.tree_util.tree_unflatten(treedef, out_leaves)
