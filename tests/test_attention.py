"""Quantized flash attention tests: XLA fallback vs plain softmax, Pallas
interpret vs XLA fallback."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sdnq_tpu.kernels.attention import quantized_attention


def _ref_attention(q, k, v, mask=None, causal=False, scale=None):
    q, k, v = (np.asarray(t, dtype=np.float64) for t in (q, k, v))
    b, h, n, d = q.shape
    kh = k.shape[1]
    if kh != h:
        reps = h // kh
        k = np.repeat(k, reps, axis=1)
        v = np.repeat(v, reps, axis=1)
    if scale is None:
        scale = d ** -0.5
    s = np.einsum("bhnd,bhkd->bhnk", q, k) * scale
    if causal:
        kn = s.shape[-1]
        ii, jj = np.arange(n)[:, None], np.arange(kn)[None, :]
        s = np.where(ii >= jj, s, -1e30)
    if mask is not None:
        m = np.asarray(mask)
        if m.dtype == bool:
            s = np.where(np.broadcast_to(m, s.shape), s, -1e30)
        else:
            s = s + np.broadcast_to(m, s.shape)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhnk,bhkd->bhnd", p, v)


def _qkv(b=2, h=4, n=64, kn=64, d=64, kh=None, seed=0):
    rng = np.random.default_rng(seed)
    kh = kh or h
    q = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, kh, kn, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, kh, kn, d)).astype(np.float32))
    return q, k, v


def test_unquantized_matches_reference():
    q, k, v = _qkv()
    out = quantized_attention(q, k, v, matmul_dtype=None,
                              out_dtype=jnp.float32)
    ref = _ref_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3)


def test_int8_qk_close_to_reference():
    q, k, v = _qkv()
    out = quantized_attention(q, k, v, matmul_dtype="int8",
                              out_dtype=jnp.float32)
    ref = _ref_attention(q, k, v)
    err = np.abs(np.asarray(out) - ref).max()
    assert err < 0.05, err


def test_int8_qk_pv_quantized():
    q, k, v = _qkv(seed=1)
    out = quantized_attention(q, k, v, matmul_dtype="int8",
                              pv_matmul_dtype="int8", out_dtype=jnp.float32)
    ref = _ref_attention(q, k, v)
    err = np.abs(np.asarray(out) - ref).max()
    assert err < 0.08, err


def test_causal():
    q, k, v = _qkv(seed=2)
    out = quantized_attention(q, k, v, is_causal=True, matmul_dtype="int8",
                              out_dtype=jnp.float32)
    ref = _ref_attention(q, k, v, causal=True)
    assert np.abs(np.asarray(out) - ref).max() < 0.05


def test_bool_mask():
    q, k, v = _qkv(seed=3)
    rng = np.random.default_rng(3)
    mask = jnp.asarray(rng.random((2, 1, 64, 64)) > 0.3)
    out = quantized_attention(q, k, v, attn_mask=mask, matmul_dtype="int8",
                              out_dtype=jnp.float32)
    ref = _ref_attention(q, k, v, mask=np.asarray(mask))
    assert np.abs(np.asarray(out) - ref).max() < 0.05


def test_gqa():
    q, k, v = _qkv(h=8, kh=2, seed=4)
    out = quantized_attention(q, k, v, matmul_dtype="int8",
                              out_dtype=jnp.float32)
    ref = _ref_attention(q, k, v)
    assert np.abs(np.asarray(out) - ref).max() < 0.05


def test_smooth_k_and_hadamard():
    q, k, v = _qkv(seed=5)
    out = quantized_attention(q, k, v, matmul_dtype="int8", smooth_k=True,
                              use_hadamard=True, out_dtype=jnp.float32)
    ref = _ref_attention(q, k, v)
    assert np.abs(np.asarray(out) - ref).max() < 0.05


def test_pallas_interpret_matches_xla(monkeypatch):
    q, k, v = _qkv(n=128, kn=128, seed=6)
    monkeypatch.setenv("SDNQ_TPU_KERNEL_BACKEND", "xla")
    out_xla = quantized_attention(q, k, v, matmul_dtype="int8",
                                  is_causal=True, out_dtype=jnp.float32)
    monkeypatch.setenv("SDNQ_TPU_KERNEL_BACKEND", "interpret")
    out_pl = quantized_attention(q, k, v, matmul_dtype="int8",
                                 is_causal=True, out_dtype=jnp.float32)
    # kernel runs P.V in bf16 (MXU-native); ~1e-2 abs tolerance
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla),
                               atol=2e-2)


def test_pallas_interpret_gqa_mask_pv(monkeypatch):
    q, k, v = _qkv(h=4, kh=2, n=128, kn=128, seed=7)
    rng = np.random.default_rng(7)
    mask = jnp.asarray(
        rng.normal(size=(2, 4, 128, 128)).astype(np.float32) * 0.1)
    monkeypatch.setenv("SDNQ_TPU_KERNEL_BACKEND", "xla")
    out_xla = quantized_attention(q, k, v, attn_mask=mask,
                                  matmul_dtype="int8",
                                  pv_matmul_dtype="int8",
                                  out_dtype=jnp.float32)
    monkeypatch.setenv("SDNQ_TPU_KERNEL_BACKEND", "interpret")
    out_pl = quantized_attention(q, k, v, attn_mask=mask,
                                 matmul_dtype="int8", pv_matmul_dtype="int8",
                                 out_dtype=jnp.float32)
    # kernel runs P.V in bf16 (MXU-native); ~1e-2 abs tolerance
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla),
                               atol=2e-2)


def test_odd_head_dim_padding(monkeypatch):
    monkeypatch.setenv("SDNQ_TPU_KERNEL_BACKEND", "interpret")
    q, k, v = _qkv(d=80, n=128, kn=128, seed=8)
    out = quantized_attention(q, k, v, matmul_dtype="int8",
                              out_dtype=jnp.float32)
    ref = _ref_attention(q, k, v)
    assert out.shape == (2, 4, 128, 80)
    assert np.abs(np.asarray(out) - ref).max() < 0.06


def test_fp8_qk():
    q, k, v = _qkv(seed=9)
    out = quantized_attention(q, k, v, matmul_dtype="fp8",
                              out_dtype=jnp.float32)
    ref = _ref_attention(q, k, v)
    # e4m3 QK (3 mantissa bits) is noisier than int8 — reference finds the
    # same (fp8 attention trails int8 accuracy)
    assert np.abs(np.asarray(out) - ref).max() < 0.12


def test_fp8_qk_pallas_interpret(monkeypatch):
    monkeypatch.setenv("SDNQ_TPU_KERNEL_BACKEND", "interpret")
    q, k, v = _qkv(n=128, kn=128, seed=10)
    out = quantized_attention(q, k, v, matmul_dtype="fp8",
                              out_dtype=jnp.float32)
    ref = _ref_attention(q, k, v)
    assert np.abs(np.asarray(out) - ref).max() < 0.12


def test_auto_policy_points():
    # representative (n, kn, d) points of the measured crossover policy —
    # a threshold edit that flips any of these should fail loudly
    from sdnq_tpu.kernels.attention import attn_auto_matmul_dtype
    assert attn_auto_matmul_dtype(4096, 4096, 64) == "int8"
    assert attn_auto_matmul_dtype(16384, 16384, 64) == "int8"
    assert attn_auto_matmul_dtype(1024, 1024, 64) is None   # short n
    assert attn_auto_matmul_dtype(4096, 1024, 64) is None   # short kv
    assert attn_auto_matmul_dtype(4096, 4096, 128) is None  # wide head
    assert attn_auto_matmul_dtype(65536, 65536, 128) is None


@pytest.mark.parametrize("n,d,expect", [(64, 32, None)])
def test_auto_equals_selected_path(n, d, expect):
    # "auto" must produce bit-identical output to the dtype the policy
    # itself selects (it resolves before dispatch, not a separate path)
    from sdnq_tpu.kernels.attention import attn_auto_matmul_dtype
    q, k, v = _qkv(n=n, kn=n, d=d, seed=11)
    sel = attn_auto_matmul_dtype(n, n, d)
    assert sel == expect
    out_auto = quantized_attention(q, k, v, matmul_dtype="auto",
                                   out_dtype=jnp.float32)
    out_sel = quantized_attention(q, k, v, matmul_dtype=sel,
                                  out_dtype=jnp.float32)
    assert np.array_equal(np.asarray(out_auto), np.asarray(out_sel))
