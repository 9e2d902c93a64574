"""Ring attention vs single-device reference on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from sdnq_tpu.parallel import create_mesh, ring_attention


def _ref(q, k, v, causal=False, scale=None):
    q, k, v = (np.asarray(t, np.float64) for t in (q, k, v))
    d = q.shape[-1]
    scale = scale or d ** -0.5
    s = np.einsum("bhnd,bhkd->bhnk", q, k) * scale
    if causal:
        n, kn = s.shape[-2:]
        ii, jj = np.arange(n)[:, None], np.arange(kn)[None, :]
        s = np.where(ii >= jj, s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhnk,bhkd->bhnd", p, v)


def _qkv(n=256, d=64, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(2, 4, n, d)).astype(np.float32))
    return mk(), mk(), mk()


def test_ring_attention_matches_reference():
    mesh = create_mesh(sequence=4)
    q, k, v = _qkv()
    out = ring_attention(q, k, v, mesh, matmul_dtype=None,
                         out_dtype=jnp.float32)
    ref = _ref(q, k, v)
    assert np.abs(np.asarray(out) - ref).max() < 5e-3


def test_ring_attention_int8():
    mesh = create_mesh(sequence=4)
    q, k, v = _qkv(seed=1)
    out = ring_attention(q, k, v, mesh, matmul_dtype="int8",
                         out_dtype=jnp.float32)
    ref = _ref(q, k, v)
    assert np.abs(np.asarray(out) - ref).max() < 0.05


def test_ring_attention_causal():
    mesh = create_mesh(sequence=8)
    q, k, v = _qkv(seed=2)
    out = ring_attention(q, k, v, mesh, matmul_dtype="int8", causal=True,
                         out_dtype=jnp.float32)
    ref = _ref(q, k, v, causal=True)
    assert np.abs(np.asarray(out) - ref).max() < 0.05


def test_ring_attention_causal_unbalanced_fallback():
    """n % 2P != 0 uses the contiguous layout with cond-skip."""
    mesh = create_mesh(sequence=4)
    n = 132  # 33 per device: not zigzag-divisible
    q, k, v = _qkv(n=n, seed=5)
    out = ring_attention(q, k, v, mesh, matmul_dtype="int8", causal=True,
                         out_dtype=jnp.float32)
    ref = _ref(q, k, v, causal=True)
    assert np.abs(np.asarray(out) - ref).max() < 0.05


def test_ring_attention_int8_pv_off():
    mesh = create_mesh(sequence=4)
    q, k, v = _qkv(seed=6)
    out = ring_attention(q, k, v, mesh, matmul_dtype="int8",
                         quantize_pv=False, out_dtype=jnp.float32)
    ref = _ref(q, k, v)
    assert np.abs(np.asarray(out) - ref).max() < 0.05


def test_ring_attention_causal_zigzag_128d():
    """d=128 drives the Pallas block kernel path on TPU; on the CPU mesh it
    checks the same code through the XLA block path."""
    mesh = create_mesh(sequence=8)
    q, k, v = _qkv(n=128, d=128, seed=7)
    out = ring_attention(q, k, v, mesh, matmul_dtype="int8", causal=True,
                         out_dtype=jnp.float32)
    ref = _ref(q, k, v, causal=True)
    assert np.abs(np.asarray(out) - ref).max() < 0.05


def test_ulysses_matches_reference():
    from sdnq_tpu.parallel import ulysses_attention
    mesh = create_mesh(sequence=4)
    q, k, v = _qkv(seed=3)
    out = ulysses_attention(q, k, v, mesh, matmul_dtype=None,
                            out_dtype=jnp.float32)
    ref = _ref(q, k, v)
    assert np.abs(np.asarray(out) - ref).max() < 5e-3


def test_ulysses_int8_causal():
    from sdnq_tpu.parallel import ulysses_attention
    mesh = create_mesh(sequence=4)
    q, k, v = _qkv(seed=4)
    out = ulysses_attention(q, k, v, mesh, matmul_dtype="int8",
                            is_causal=True, out_dtype=jnp.float32)
    ref = _ref(q, k, v, causal=True)
    assert np.abs(np.asarray(out) - ref).max() < 0.05
