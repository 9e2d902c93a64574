"""Hadamard rotation engine.

Capability parity with the reference's Hadamard engine
(/root/reference/src/sdnq/quant_utils.py:79-170): Kronecker powers of the N2
(and symmetric N4) seeds, 1/sqrt(n) normalization, group-size negotiation
(next power of two, halved until it divides the channel, minimum 4), grouped
rotation by a block-diagonal I ⊗ H.

TPU-first differences: H is built once on host in numpy and embedded as a
jit-time constant (XLA folds it into the program); the grouped rotation is a
reshaped matmul that XLA maps straight onto the MXU.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "hadamard_matrix",
    "rotate_hadamard",
    "get_hadamard_group_size",
    "apply_hadamard",
]

_N2 = np.array([[1, 1], [1, -1]], dtype=np.float64)
# Symmetric order-4 seed (reference: quant_utils.py:93) — H == H.T, HH = nI.
_N4 = np.array(
    [[1, 1, 1, -1], [1, 1, -1, 1], [1, -1, 1, 1], [-1, 1, 1, 1]],
    dtype=np.float64,
)


def is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


def is_pow4(n: int) -> bool:
    return is_pow2(n) and (n.bit_length() & 1) == 1


def next_power_of_2(n: int) -> int:
    return n if is_pow2(n) else 1 << n.bit_length()


@lru_cache(maxsize=None)
def _hadamard_np(n: int) -> np.ndarray:
    if not is_pow2(n):
        raise ValueError(f"Hadamard group size must be a power of 2, got {n}")
    if n == 1:
        h = np.ones((1, 1), dtype=np.float64)
    elif is_pow4(n):
        h = _N4
        while h.shape[0] < n:
            h = np.kron(h, _N4)
    else:
        h = _N2
        while h.shape[0] < n:
            h = np.kron(h, _N2)
    return (h / np.sqrt(n)).astype(np.float32)


def hadamard_matrix(n: int, dtype=jnp.float32) -> jax.Array:
    return jnp.asarray(_hadamard_np(n), dtype=dtype)


def rotate_hadamard(x: jax.Array, group_size: int = 256,
                    hadamard: jax.Array | None = None,
                    precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Right-multiply the last axis by I ⊗ H (grouped rotation).

    H is symmetric and orthonormal, so applying the same rotation twice is
    the identity — dequantize re-applies it to invert (reference:
    dequantizer.py:48-49).  Defaults to HIGHEST matmul precision so the
    rotation stays orthogonal on the TPU MXU (whose default is bf16
    multiplies); runtime activation rotation may pass a faster precision.
    """
    if hadamard is None:
        hadamard = hadamard_matrix(group_size, dtype=x.dtype)
    else:
        group_size = hadamard.shape[-1]
        hadamard = hadamard.astype(x.dtype)
    c = x.shape[-1]
    grouped = x.reshape(*x.shape[:-1], c // group_size, group_size)
    out = jnp.einsum("...gi,ij->...gj", grouped, hadamard,
                     precision=precision, preferred_element_type=x.dtype)
    return out.reshape(*x.shape[:-1], c)


def get_hadamard_group_size(channel_size: int, group_size: int):
    """Negotiate a usable group size (reference: quant_utils.py:146-152)."""
    group_size = next_power_of_2(min(channel_size, group_size))
    while channel_size % group_size != 0:
        group_size //= 2
    return group_size >= 4, group_size


def apply_hadamard(w: jax.Array, group_size: int = 256, is_conv: bool = False):
    """Rotate a weight along its reduction axis.

    Conv weights (O, I, *k) are flattened to (O, I*prod(k)) and rotated over
    the flattened axis with the group size negotiated from the input-channel
    count, exactly like the reference (quant_utils.py:156-170) — the im2col
    patch layout in the conv forward uses the same flattening order so the
    rotation cancels.  Returns (rotated, used, group_size)."""
    if is_conv:
        channel = w.shape[1]
    else:
        channel = w.shape[-1]
    use, group_size = get_hadamard_group_size(channel, group_size)
    if not use:
        return w, False, group_size
    if is_conv:
        shape = w.shape
        w = rotate_hadamard(w.reshape(shape[0], -1), group_size).reshape(shape)
    else:
        w = rotate_hadamard(w, group_size)
    return w, True, group_size
