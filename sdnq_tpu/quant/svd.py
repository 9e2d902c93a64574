"""SVDQuant low-rank correction.

Capability parity with the reference (/root/reference/src/sdnq/quant_utils.py:58-75):
split W = svd_up @ svd_down + residual with a rank-`rank` randomized SVD and
quantize only the residual.  Implemented as randomized subspace iteration in
pure JAX (the TPU analogue of ``torch.svd_lowrank``): QR power iterations run
as MXU matmuls; determinism comes from an explicit PRNG key instead of
torch's global RNG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["svd_lowrank", "apply_svdquant"]


def svd_lowrank(a: jax.Array, rank: int = 32, niter: int = 8,
                key: jax.Array | None = None):
    """Randomized low-rank SVD: returns (U, S, Vt) with U (m,r), S (r,), Vt (r,n)."""
    if key is None:
        key = jax.random.key(0)
    m, n = a.shape
    r = min(rank, m, n)
    a = a.astype(jnp.float32)
    g = jax.random.normal(key, (n, r), jnp.float32)
    y = a @ g
    q, _ = jnp.linalg.qr(y)
    for _ in range(niter):
        z = a.T @ q
        q, _ = jnp.linalg.qr(a @ z)
    b = q.T @ a  # (r, n)
    ub, s, vt = jnp.linalg.svd(b, full_matrices=False)
    u = q @ ub
    return u, s, vt


def apply_svdquant(w: jax.Array, rank: int = 32, niter: int = 8,
                   key: jax.Array | None = None, dtype=None):
    """Returns (residual, svd_up, svd_down) with svd_up = U*S (O,r),
    svd_down = Vt (r,C).  Conv weights are flattened (O, -1) first
    (reference: quant_utils.py:59-63)."""
    shape = w.shape
    flat = w.reshape(shape[0], -1) if w.ndim > 2 else w
    u, s, vt = svd_lowrank(flat.astype(jnp.float32), rank=rank, niter=niter,
                           key=key)
    svd_up = u * s[None, :]
    svd_down = vt
    if dtype is not None:
        svd_up = svd_up.astype(dtype)
        svd_down = svd_down.astype(dtype)
    residual = flat - (svd_up.astype(jnp.float32)
                       @ svd_down.astype(jnp.float32))
    return residual.reshape(shape), svd_up, svd_down
