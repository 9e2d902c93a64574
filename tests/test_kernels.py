"""Pallas kernel logic tests (interpret mode on CPU) + XLA fallback tests."""

import numpy as np
import pytest
import jax.numpy as jnp

from sdnq_tpu.formats import get_format
from sdnq_tpu.kernels.scaled_mm import scaled_mm
from sdnq_tpu.kernels.dequant_mm import dequant_matmul
from sdnq_tpu.packing import pack


@pytest.fixture
def interpret(monkeypatch):
    monkeypatch.setenv("SDNQ_TPU_KERNEL_BACKEND", "interpret")


@pytest.fixture
def xla(monkeypatch):
    monkeypatch.setenv("SDNQ_TPU_KERNEL_BACKEND", "xla")


def _int8_case(m=64, k=256, o=128, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.integers(-127, 128, (m, k)).astype(np.int8)
    w = rng.integers(-127, 128, (o, k)).astype(np.int8)
    xs = rng.uniform(0.01, 0.02, (m, 1)).astype(np.float32)
    ws = rng.uniform(0.01, 0.02, (o,)).astype(np.float32)
    b = rng.normal(size=(o,)).astype(np.float32)
    ref = (x.astype(np.int64) @ w.T.astype(np.int64)) * xs * ws[None] + b[None]
    return map(jnp.asarray, (x, w, xs, ws, b)), ref


def test_scaled_mm_xla(xla):
    (x, w, xs, ws, b), ref = _int8_case()
    out = scaled_mm(x, w, xs, ws, b, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-4)


def test_scaled_mm_pallas_interpret(interpret):
    (x, w, xs, ws, b), ref = _int8_case()
    out = scaled_mm(x, w, xs, ws, b, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-4)


def test_scaled_mm_pallas_odd_shapes(interpret):
    # non-multiple M/O and K requiring zero-pad path
    (x, w, xs, ws, b), ref = _int8_case(m=100, k=200, o=72)
    out = scaled_mm(x, w, xs, ws, b, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("backend_fixture", ["xla", "interpret"])
@pytest.mark.parametrize("fmt_name,g", [("int8", -1), ("int8", 64),
                                        ("int4", 64), ("uint4", 64),
                                        ("float6_e3m2fn", 64)])
def test_dequant_matmul(request, backend_fixture, fmt_name, g):
    request.getfixturevalue(backend_fixture)
    fmt = get_format(fmt_name)
    rng = np.random.default_rng(1)
    m, k, o = 16, 256, 128
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    geff = g if g > 0 else k
    ngroups = k // geff
    if fmt.is_integer:
        q = rng.integers(int(fmt.min), int(fmt.max) + 1, (o, k))
        qvals = jnp.asarray(q, jnp.int32)
    else:
        from sdnq_tpu.packing import encode_float, decode_float
        raw = rng.uniform(fmt.min, fmt.max, (o, k)).astype(np.float32)
        qvals = decode_float(encode_float(jnp.asarray(raw), fmt), fmt)
        q = np.asarray(qvals)
    scale = rng.uniform(0.01, 0.02, (o, ngroups)).astype(np.float32)
    zp = (rng.uniform(-0.5, 0.5, (o, ngroups)).astype(np.float32)
          if fmt.is_unsigned else None)
    bias = rng.normal(size=(o,)).astype(np.float32)

    if fmt.is_packed:
        wq = pack(qvals, fmt)
    else:
        wq = qvals.astype(jnp.int8)
    out = dequant_matmul(x, wq, jnp.asarray(scale),
                         None if zp is None else jnp.asarray(zp),
                         jnp.asarray(bias), fmt, geff,
                         out_dtype=jnp.float32)
    wd = (q.reshape(o, ngroups, geff) * scale[..., None])
    if zp is not None:
        wd = wd + zp[..., None]
    ref = np.asarray(x) @ wd.reshape(o, k).T + bias[None]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)
