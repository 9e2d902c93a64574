"""Numerical parity against the reference implementation and torch.

The reference package (pure Python/torch, CPU-safe for these paths) is
mounted read-only at /root/reference; these tests cross-check closed-form
numerics — the microfloat codec grid, quantization scales, Hadamard
matrices — against it directly.  Skipped gracefully if the import fails.
"""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sdnq_tpu.formats import get_format
from sdnq_tpu.packing import decode_float, encode_float
from sdnq_tpu.quant import quantize_weight, hadamard_matrix

REF = "/root/reference/src"


def _import_ref():
    """Import reference submodules without executing the package __init__
    (which needs diffusers/transformers plugins we don't want here)."""
    import importlib
    import types

    try:
        if "sdnq" not in sys.modules or not hasattr(
                sys.modules["sdnq"], "__path__"):
            pkg = types.ModuleType("sdnq")
            pkg.__path__ = [REF + "/sdnq"]
            sys.modules["sdnq"] = pkg
        quant_utils = importlib.import_module("sdnq.quant_utils")
        packed_float = importlib.import_module("sdnq.packed_float")
        return quant_utils, packed_float
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")


@pytest.mark.parametrize("name", ["float6_e3m2fn", "float4_e2m1fn",
                                  "float8_e4m3fn_sdnq", "float5_e2m2fn",
                                  "float7_e3m3fn"])
def test_microfloat_grid_matches_reference(name):
    """The representable value set must match the reference's codec
    exactly: reference-encoded values round-trip IDENTICALLY through our
    codec.  Rounding of off-grid inputs may differ by at most one grid
    step on near-ties: the reference inspects only the top 4 truncated
    mantissa bits with a round-half-down rule (packed_float.py:40-47),
    while we do true round-to-nearest-even."""
    _, packed_float = _import_ref()
    import torch

    fmt = get_format(name)
    rng = np.random.default_rng(0)
    x = rng.uniform(fmt.min, fmt.max, size=4096).astype(np.float32)

    t = torch.from_numpy(x.copy()).reshape(1, -1)
    packed = packed_float.pack_float(t.clone(), name)
    theirs = packed_float.unpack_float(packed, name, t.shape) \
        .numpy().reshape(-1).astype(np.float32)

    # grid parity: their decoded values are fixed points of our codec
    ours_of_theirs = np.asarray(decode_float(
        encode_float(jnp.asarray(theirs), fmt), fmt))
    np.testing.assert_array_equal(ours_of_theirs, theirs)

    # rounding parity: at most one grid step apart, on a small fraction
    ours = np.asarray(decode_float(encode_float(jnp.asarray(x), fmt), fmt))
    differs = ours != theirs
    assert differs.mean() < 0.10, differs.mean()
    # where they differ, ours is at least as close to the input
    d_ours = np.abs(ours[differs] - x[differs])
    d_theirs = np.abs(theirs[differs] - x[differs])
    assert (d_ours <= d_theirs + 1e-7).all()


def test_symmetric_scale_matches_reference():
    quant_utils, _ = _import_ref()
    import torch

    rng = np.random.default_rng(1)
    w = rng.normal(size=(64, 128)).astype(np.float32)
    ours_q, ours_s, _ = quantize_weight(jnp.asarray(w), "int8", axis=-1)
    theirs_q, theirs_s, theirs_zp = quant_utils.quantize_weight(
        torch.from_numpy(w.copy()), -1, "int8")
    np.testing.assert_allclose(np.asarray(ours_s)[:, 0],
                               theirs_s.numpy()[:, 0], rtol=1e-6)
    assert theirs_zp is None
    # identical integer codes (both round-half-even in fp32)
    mismatch = (np.asarray(ours_q) != theirs_q.numpy()).mean()
    assert mismatch < 0.01, mismatch  # ties may differ on rounding mode


def test_asymmetric_scale_matches_reference():
    quant_utils, _ = _import_ref()
    import torch

    rng = np.random.default_rng(2)
    w = (rng.normal(size=(32, 64)) + 1.0).astype(np.float32)
    _, ours_s, ours_zp = quantize_weight(jnp.asarray(w), "uint8", axis=-1)
    theirs_s, theirs_zp = quant_utils.get_scale_asymmetric(
        torch.from_numpy(w.copy()), -1, "uint8")
    np.testing.assert_allclose(np.asarray(ours_s), theirs_s.numpy(),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ours_zp), theirs_zp.numpy(),
                               rtol=1e-5, atol=1e-7)


def test_hadamard_matches_reference():
    quant_utils, _ = _import_ref()

    for n in (16, 64, 256):
        import torch
        theirs = quant_utils.build_hadamard(n, dtype=torch.float32).numpy()
        ours = np.asarray(hadamard_matrix(n))
        np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_linear_matches_torch():
    """qlinear on plain weights == torch F.linear."""
    import torch

    from sdnq_tpu import qlinear
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 7, 64)).astype(np.float32)
    w = rng.normal(size=(32, 64)).astype(np.float32)
    b = rng.normal(size=(32,)).astype(np.float32)
    ours = np.asarray(qlinear(jnp.asarray(x), jnp.asarray(w),
                              jnp.asarray(b), out_dtype=jnp.float32))
    theirs = torch.nn.functional.linear(
        torch.from_numpy(x), torch.from_numpy(w),
        torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_conv_matches_torch():
    """qconv NHWC on OIHW weights == torch conv2d (NCHW)."""
    import torch

    from sdnq_tpu import qconv
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 4, 16, 16)).astype(np.float32)   # NCHW
    w = rng.normal(size=(8, 4, 3, 3)).astype(np.float32)
    b = rng.normal(size=(8,)).astype(np.float32)
    theirs = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=2, padding=1).numpy()
    ours = np.asarray(qconv(
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(w),
        jnp.asarray(b), stride=2, padding=((1, 1), (1, 1)),
        out_dtype=jnp.float32)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_grouped_conv_quantized_matmul_matches_torch():
    """Grouped-conv quantized GEMM vs torch grouped conv on the dequantized
    weight (reference per-group loop: conv/conv_int8.py:16-120)."""
    import torch

    from sdnq_tpu import qconv, quantize_tensor, dequantize
    rng = np.random.default_rng(6)
    groups = 4
    x = rng.normal(size=(2, 32, 12, 12)).astype(np.float32)   # NCHW, C=32
    w = rng.normal(size=(64, 8, 3, 3)).astype(np.float32)     # O=64, Cg=8
    b = rng.normal(size=(64,)).astype(np.float32)
    qt = quantize_tensor(jnp.asarray(w), "int8", layer_kind="conv",
                         use_quantized_matmul=True, group_size=-1)
    wd = np.asarray(dequantize(qt, jnp.float32))
    theirs = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(wd), torch.from_numpy(b),
        stride=1, padding=1, groups=groups).numpy()
    ours = np.asarray(qconv(
        jnp.asarray(x.transpose(0, 2, 3, 1)), qt, jnp.asarray(b),
        stride=1, padding=((1, 1), (1, 1)), feature_group_count=groups,
        out_dtype=jnp.float32)).transpose(0, 3, 1, 2)
    rel = np.abs(ours - theirs).max() / np.abs(theirs).max()
    assert rel < 0.05, rel


def test_conv_transpose_matches_torch():
    import torch

    from sdnq_tpu import qconv
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, 4, 8, 8)).astype(np.float32)
    w = rng.normal(size=(4, 8, 2, 2)).astype(np.float32)  # (Cin, Cout, k)
    theirs = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), stride=2).numpy()
    ours = np.asarray(qconv(
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(w), None,
        stride=2, padding="VALID", transpose=True,
        out_dtype=jnp.float32)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)
