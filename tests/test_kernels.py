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


def _fused_case(m=64, k=256, o=128, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(m, k)).astype(np.float32)
    w = rng.integers(-127, 128, (o, k)).astype(np.int8)
    ws = rng.uniform(0.01, 0.02, (o,)).astype(np.float32)
    b = rng.normal(size=(o,)).astype(np.float32)
    return x, w, ws, b


@pytest.mark.parametrize("backend_fixture", ["xla", "interpret"])
def test_scaled_mm_fused_act_int8(request, backend_fixture):
    """Fused-prologue kernel == separate quantize + scaled_mm."""
    request.getfixturevalue(backend_fixture)
    from sdnq_tpu.kernels.scaled_mm import scaled_mm_fused_act
    from sdnq_tpu.quant.core import quantize_int_mm
    x, w, ws, b = _fused_case()
    out = scaled_mm_fused_act(jnp.asarray(x), jnp.asarray(w),
                              jnp.asarray(ws), jnp.asarray(b),
                              x_fmt="int8", out_dtype=jnp.float32)
    x_q, x_s = quantize_int_mm(jnp.asarray(x), axis=-1)
    ref = (np.asarray(x_q).astype(np.int64) @ w.T.astype(np.int64)
           * np.asarray(x_s) * ws[None] + b[None])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("backend_fixture", ["xla", "interpret"])
def test_scaled_mm_fused_act_uint8_zero_points(request, backend_fixture):
    request.getfixturevalue(backend_fixture)
    from sdnq_tpu.kernels.scaled_mm import scaled_mm_fused_act
    from sdnq_tpu.quant.core import quantize_uint_mm
    rng = np.random.default_rng(3)
    m, k, o = 64, 256, 128
    x = rng.normal(size=(m, k)).astype(np.float32) + 0.7  # asymmetric data
    w = rng.integers(-127, 128, (o, k)).astype(np.int8)
    ws = rng.uniform(0.01, 0.02, (o,)).astype(np.float32)
    wz = rng.uniform(0.1, 0.2, (o,)).astype(np.float32)
    colsum = w.astype(np.int64).sum(axis=1).astype(np.float32)[None]
    vz0 = wz[None]
    vz1 = colsum * ws[None] + float(k) * wz[None]
    out = scaled_mm_fused_act(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(ws), None,
        x_fmt="uint8", out_dtype=jnp.float32,
        v_zp0=jnp.asarray(vz0), v_zp1=jnp.asarray(vz1))
    x_q, x_s, x_zp = quantize_uint_mm(jnp.asarray(x), axis=-1)
    x_qn, x_sn, x_zn = map(np.asarray, (x_q, x_s, x_zp))
    # dense reference: (x_q*s+zp) @ (w*ws+wz).T
    xd = x_qn.astype(np.float32) * x_sn + x_zn
    wd = w.astype(np.float32) * ws[:, None] + wz[:, None]
    ref = xd @ wd.T
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-2)


@pytest.mark.parametrize("backend_fixture", ["xla", "interpret"])
def test_scaled_mm_fused_act_fp8_and_svd(request, backend_fixture):
    request.getfixturevalue(backend_fixture)
    from sdnq_tpu.kernels.scaled_mm import scaled_mm_fused_act
    from sdnq_tpu.quant.core import quantize_fp_mm
    rng = np.random.default_rng(4)
    m, k, o, r = 64, 256, 128, 8
    x = rng.normal(size=(m, k)).astype(np.float32)
    w8 = rng.normal(size=(o, k)).astype(np.float32)
    w = jnp.asarray(w8).astype(jnp.float8_e4m3fn)
    ws = rng.uniform(0.01, 0.02, (o,)).astype(np.float32)
    u = rng.normal(size=(m, r)).astype(np.float32)
    v = rng.normal(size=(r, o)).astype(np.float32)
    out = scaled_mm_fused_act(
        jnp.asarray(x), w, jnp.asarray(ws), None,
        x_fmt="float8_e4m3fn", out_dtype=jnp.float32,
        lowrank_u=jnp.asarray(u), lowrank_v=jnp.asarray(v))
    x_q, x_s = quantize_fp_mm(jnp.asarray(x), axis=-1)
    ref = (np.asarray(x_q, np.float32) @ np.asarray(w, np.float32).T
           * np.asarray(x_s) * ws[None]) + u @ v
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-3, atol=5e-2)


@pytest.mark.parametrize("fmt_name,g", [
    ("int4", 64),            # sg=2 per segment
    ("int4", 16),            # fine groups: sg=8 select chain
    ("uint4", 128),          # zero-point path, group == segment
    ("float6_e3m2fn", 128),  # packed float decode in-kernel
    ("float4_e2m1fn", 256),
])
def test_dequant_matmul_packed_pallas_lane_aligned(interpret, fmt_name, g):
    """K%1024==0 exercises the in-kernel packed path (fori-loop unpack) —
    float formats and fine groups no longer route to XLA."""
    fmt = get_format(fmt_name)
    rng = np.random.default_rng(2)
    m, k, o = 16, 1024, 128
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    ngroups = k // g
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
    wq = pack(qvals, fmt)
    out = dequant_matmul(x, wq, jnp.asarray(scale),
                         None if zp is None else jnp.asarray(zp),
                         None, fmt, g, out_dtype=jnp.float32)
    wd = q.reshape(o, ngroups, g) * scale[..., None]
    if zp is not None:
        wd = wd + zp[..., None]
    ref = np.asarray(x) @ wd.reshape(o, k).T
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_scaled_mm_fused_act_kpad(interpret):
    """K not a lane multiple takes the zero-pad path (symmetric only)."""
    from sdnq_tpu.kernels.scaled_mm import scaled_mm_fused_act
    from sdnq_tpu.quant.core import quantize_int_mm
    x, w, ws, b = _fused_case(m=48, k=300, o=72, seed=5)
    out = scaled_mm_fused_act(jnp.asarray(x), jnp.asarray(w),
                              jnp.asarray(ws), jnp.asarray(b),
                              x_fmt="int8", out_dtype=jnp.float32)
    x_q, x_s = quantize_int_mm(jnp.asarray(x), axis=-1)
    ref = (np.asarray(x_q).astype(np.int64) @ w.T.astype(np.int64)
           * np.asarray(x_s) * ws[None] + b[None])
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


@pytest.mark.parametrize("fmt_name,g,mode", [
    ("int4", 128, "groupdot"),    # lane-aligned groups: group-dot mode
    ("int4", 64, "ematrix"),      # g%128!=0: expanded-scale (E-matrix) mode
    ("uint4", 128, "groupdot"),   # zero-point dot path
    ("uint2", 64, "ematrix"),     # 2-bit + zp
    ("int2", 128, "groupdot"),
])
def test_groupdot_dequant_matmul(interpret, fmt_name, g, mode):
    """Half-split 2/4-bit weights route through the group-dot Pallas kernel
    (pack_layout='halfsplit'); parity vs the dense dequantized matmul."""
    from sdnq_tpu.kernels.dequant_mm import _groupdot_mm_pallas
    fmt = get_format(fmt_name)
    rng = np.random.default_rng(7)
    m, k, o = 16, 512, 128
    ngroups = k // g
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    q = rng.integers(int(fmt.min), int(fmt.max) + 1, (o, k))
    scale = rng.uniform(0.01, 0.02, (o, ngroups)).astype(np.float32)
    zp = (rng.uniform(-0.5, 0.5, (o, ngroups)).astype(np.float32)
          if fmt.is_unsigned else None)
    bias = rng.normal(size=(o,)).astype(np.float32)
    wq = pack(jnp.asarray(q, jnp.int32), fmt, layout="halfsplit")
    out = _groupdot_mm_pallas(
        x, wq, jnp.asarray(scale), None if zp is None else jnp.asarray(zp),
        jnp.asarray(bias), fmt_name=fmt.name, code_bits=fmt.code_bits,
        code_min=int(fmt.min), is_float=not fmt.is_integer,
        group_size=g, out_dtype=jnp.dtype(jnp.float32))
    wd = q.reshape(o, ngroups, g) * scale[..., None]
    if zp is not None:
        wd = wd + zp[..., None]
    ref = np.asarray(x) @ wd.reshape(o, k).T + bias[None]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_dequant_matmul_halfsplit_dispatch(interpret):
    """dequant_matmul(pack_layout='halfsplit') agrees with the bit-plane
    route, both through the kernel and the XLA materialize fallback."""
    import os
    fmt = get_format("int4")
    rng = np.random.default_rng(9)
    m, k, o, g = 8, 512, 128, 128
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    q = jnp.asarray(rng.integers(-8, 8, (o, k)), jnp.int32)
    scale = jnp.asarray(rng.uniform(0.01, 0.02, (o, k // g)), jnp.float32)
    wq_bp = pack(q, fmt)
    wq_hs = pack(q, fmt, layout="halfsplit")
    ref = dequant_matmul(x, wq_bp, scale, None, None, fmt, g,
                         out_dtype=jnp.float32)
    out = dequant_matmul(x, wq_hs, scale, None, None, fmt, g,
                         out_dtype=jnp.float32, pack_layout="halfsplit")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # materialize fallback (route everything >= 1 row to XLA)
    os.environ["SDNQ_TPU_DEQUANT_MATERIALIZE_ROWS"] = "1"
    try:
        out2 = dequant_matmul(x, wq_hs, scale, None, None, fmt, g,
                              out_dtype=jnp.float32, pack_layout="halfsplit")
    finally:
        del os.environ["SDNQ_TPU_DEQUANT_MATERIALIZE_ROWS"]
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("backend_fixture", ["xla", "interpret"])
def test_scaled_mm_tn(request, backend_fixture):
    """TN kernel (leading-axis contraction, the grad-weight orientation)
    matches a dense int64 reference with columnwise scales."""
    request.getfixturevalue(backend_fixture)
    from sdnq_tpu.kernels.scaled_mm import scaled_mm_tn
    rng = np.random.default_rng(11)
    m, n, k = 192, 128, 256  # M not a multiple of the tile: pad path
    a = rng.integers(-127, 128, (m, n)).astype(np.int8)
    b = rng.integers(-127, 128, (m, k)).astype(np.int8)
    a_s = rng.uniform(0.01, 0.02, (n,)).astype(np.float32)
    b_s = rng.uniform(0.01, 0.02, (k,)).astype(np.float32)
    u = rng.normal(size=(n, 2)).astype(np.float32)
    v = rng.normal(size=(2, k)).astype(np.float32)
    out = scaled_mm_tn(jnp.asarray(a), jnp.asarray(b), jnp.asarray(a_s),
                       jnp.asarray(b_s), out_dtype=jnp.float32,
                       lowrank_u=jnp.asarray(u), lowrank_v=jnp.asarray(v))
    ref = (a.astype(np.int64).T @ b.astype(np.int64)
           * a_s[:, None] * b_s[None, :] + u @ v)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("fmt", ["int8", "uint8", "float8_e4m3fn", "bf16"])
@pytest.mark.parametrize("backend_fixture", ["xla", "interpret"])
def test_dynamic_mm_tn_families(request, backend_fixture, fmt):
    """dynamic_mm_tn ≈ dense aᵀ @ b for every matmul-dtype family (the
    dtype-faithful grad-weight GEMM)."""
    request.getfixturevalue(backend_fixture)
    from sdnq_tpu.kernels.scaled_mm import dynamic_mm_tn
    rng = np.random.default_rng(12)
    m, n, k = 160, 128, 256
    a = rng.normal(size=(m, n)).astype(np.float32)
    b = rng.normal(size=(m, k)).astype(np.float32) + 0.3
    out = dynamic_mm_tn(jnp.asarray(a), jnp.asarray(b), fmt,
                        out_dtype=jnp.float32)
    ref = a.T @ b
    scale = np.abs(ref).max()
    # fp8 e4m3 carries 3 mantissa bits (~6% element resolution); the int
    # families quantize to 1/255 of the column range
    tol = 6e-2 if fmt.startswith("float8") else 2.5e-2
    assert np.abs(np.asarray(out) - ref).max() / scale < tol


@pytest.mark.parametrize("backend_fixture", ["xla", "interpret"])
def test_scaled_mm_fused_act_nn(request, backend_fixture):
    """NN orientation (contract b's leading axis — the grad-input GEMM on
    the natural (O, K) stored weight) == NT on the transposed operand."""
    request.getfixturevalue(backend_fixture)
    from sdnq_tpu.kernels.scaled_mm import scaled_mm_fused_act
    rng = np.random.default_rng(13)
    m, c, n = 64, 256, 128
    x = rng.normal(size=(m, c)).astype(np.float32)
    w = rng.integers(-127, 128, (c, n)).astype(np.int8)
    ws = rng.uniform(0.01, 0.02, (n,)).astype(np.float32)
    out = scaled_mm_fused_act(jnp.asarray(x), jnp.asarray(w),
                              jnp.asarray(ws), None, x_fmt="int8",
                              out_dtype=jnp.float32, b_layout="nn")
    ref = scaled_mm_fused_act(jnp.asarray(x), jnp.asarray(w.T.copy()),
                              jnp.asarray(ws), None, x_fmt="int8",
                              out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("x_fmt", ["int8", "float8_e4m3fn", "uint8"])
@pytest.mark.parametrize("backend_fixture", ["xla", "interpret"])
def test_scaled_mm_fused_act_emit_quantized(request, backend_fixture, x_fmt):
    """emit_quantized returns the kernel's rowwise-quantized input: y must
    equal the plain call, and dequant(xq)*xs (+zp for the asym family) must
    reconstruct x to the format's rounding error."""
    request.getfixturevalue(backend_fixture)
    from sdnq_tpu.kernels.scaled_mm import scaled_mm_fused_act
    rng = np.random.default_rng(17)
    m, k, o = 64, 256, 128
    x = rng.normal(size=(m, k)).astype(np.float32)
    w = rng.integers(-127, 128, (o, k)).astype(np.int8)
    ws = rng.uniform(0.01, 0.02, (o,)).astype(np.float32)
    wq = jnp.asarray(w, jnp.float8_e4m3fn if x_fmt.startswith("float8")
                     else jnp.int8)
    kw = {}
    if x_fmt == "uint8":
        wz = rng.uniform(-0.3, 0.3, (o,)).astype(np.float32)
        colsum = w.astype(np.int64).sum(axis=1).astype(np.float32)
        kw = dict(v_zp0=jnp.asarray(wz),
                  v_zp1=jnp.asarray(colsum * ws + float(k) * wz))
    y0 = scaled_mm_fused_act(jnp.asarray(x), wq, jnp.asarray(ws), None,
                             x_fmt=x_fmt, out_dtype=jnp.float32, **kw)
    out = scaled_mm_fused_act(jnp.asarray(x), wq, jnp.asarray(ws),
                              None, x_fmt=x_fmt,
                              out_dtype=jnp.float32,
                              emit_quantized=True, **kw)
    if x_fmt == "uint8":
        y1, xq, xs, xzp = out
        assert xzp.shape == (m, 1)
        recon = (np.asarray(xq.astype(jnp.float32)) * np.asarray(xs)
                 + np.asarray(xzp))
    else:
        y1, xq, xs = out
        recon = np.asarray(xq.astype(jnp.float32)) * np.asarray(xs)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-4)
    assert xq.shape == (m, k) and xs.shape == (m, 1)
    tol = 0.08 if x_fmt.startswith("float8") else 0.02
    assert np.abs(recon - x).max() <= tol * np.abs(x).max()


@pytest.mark.parametrize("fmt,use_hadamard", [("int8", False),
                                              ("int8", True),
                                              ("uint8", False),
                                              ("uint8", True)])
def test_train_ckpt_emit_grad_parity(interpret, fmt, use_hadamard):
    """The fused-emit ckpt backward (fold row scales into the cotangent's
    columnwise quantize; asym family adds the (gᵀ·zp) ⊗ 1 rank-1 term)
    matches dense grads to int8 noise."""
    import jax
    from sdnq_tpu import quantize_tensor
    from sdnq_tpu.tensor import dequantize
    from sdnq_tpu.train import TrainQTensor, train_qlinear, grad
    from sdnq_tpu.train.matmul import _fused_emit_eligible
    rng = np.random.default_rng(19)
    m, k, o = 64, 256, 128
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(o, k)).astype(np.float32))
    qt = quantize_tensor(w, fmt, use_quantized_matmul=True,
                         group_size=-1, use_hadamard=use_hadamard)
    assert _fused_emit_eligible(qt, m, True)
    tp = TrainQTensor(qt=qt, delta=jnp.zeros(w.shape, jnp.float32))

    def loss(x, tp):
        y = train_qlinear(x, tp, save_quantized_activations=True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    gx, gtp = grad(loss, argnums=(0, 1))(x, tp)
    wd = dequantize(qt, jnp.float32)
    gx_r, gw_r = jax.grad(
        lambda x, wd: jnp.sum((x @ wd.T) ** 2), argnums=(0, 1))(x, wd)
    s = float(jnp.abs(gw_r).max())
    assert float(jnp.abs(gtp.delta - gw_r).max()) / s < 0.04
    assert float(jnp.abs(gx - gx_r).max()) / float(jnp.abs(gx_r).max()) < 0.04


@pytest.mark.parametrize("fmt_name,g", [("int4", 128), ("uint4", 128),
                                        ("int2", 128), ("int3", 128),
                                        # fine groups: only the block-
                                        # diagonal small-M variant covers
                                        # g % 128 != 0 (reference auto rule
                                        # 2^(2+bits)=64 for int4)
                                        ("int4", 64), ("uint4", 32)])
def test_packed_int8_matmul(interpret, fmt_name, g):
    """Fused packed-weight int8 quantized matmul (group scales on int8 MXU
    partial dots) ≈ int8-quantized x against the dense dequantized weight."""
    from sdnq_tpu.kernels.dequant_mm import packed_int8_matmul
    from sdnq_tpu.quant.core import quantize_int_mm
    fmt = get_format(fmt_name)
    rng = np.random.default_rng(23)
    k, o = 1024, 128  # int3's 1-bit plane needs k/8 lane-aligned
    # fine groups route through the block-diagonal variant only; keep
    # m * n_groups inside its gate
    m = 64 if g >= 128 else 1024 // (k // g)
    ngroups = k // g
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    q = rng.integers(int(fmt.min), int(fmt.max) + 1, (o, k))
    scale = rng.uniform(0.01, 0.02, (o, ngroups)).astype(np.float32)
    zp = (rng.uniform(-0.5, 0.5, (o, ngroups)).astype(np.float32)
          if fmt.is_unsigned else None)
    bias = rng.normal(size=(o,)).astype(np.float32)
    wq = pack(jnp.asarray(q, jnp.int32), fmt, layout="halfsplit")
    out = packed_int8_matmul(x, wq, jnp.asarray(scale),
                             None if zp is None else jnp.asarray(zp),
                             jnp.asarray(bias), fmt, g,
                             out_dtype=jnp.float32,
                             pack_layout="halfsplit")
    assert out is not None
    xq, xs = quantize_int_mm(x, axis=-1)
    wd = q.reshape(o, ngroups, g) * scale[..., None]
    if zp is not None:
        wd = wd + zp[..., None]
    ref = (np.asarray(xq).astype(np.float64) @ wd.reshape(o, k).T
           * np.asarray(xs)) + bias[None]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-3)


def test_packed_int8_matmul_groupdot_path(interpret, monkeypatch):
    """The per-group dot loop (large m * n_groups) matches the
    block-diagonal variant on the same operands."""
    from sdnq_tpu.kernels.dequant_mm import packed_int8_matmul
    fmt = get_format("int4")
    rng = np.random.default_rng(5)
    m, k, o, g = 16, 1024, 128, 128
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    q = rng.integers(int(fmt.min), int(fmt.max) + 1, (o, k))
    scale = jnp.asarray(
        rng.uniform(0.01, 0.02, (o, k // g)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(o,)).astype(np.float32))
    wq = pack(jnp.asarray(q, jnp.int32), fmt, layout="halfsplit")
    out_bd = packed_int8_matmul(x, wq, scale, None, bias, fmt, g,
                                out_dtype=jnp.float32,
                                pack_layout="halfsplit")
    monkeypatch.setenv("SDNQ_TPU_BLOCKDIAG_MAX_MG", "1")
    out_gd = packed_int8_matmul(x, wq, scale, None, bias, fmt, g,
                                out_dtype=jnp.float32,
                                pack_layout="halfsplit")
    assert out_bd is not None and out_gd is not None
    np.testing.assert_allclose(np.asarray(out_bd), np.asarray(out_gd),
                               rtol=1e-5, atol=1e-5)
