"""QTensor round-trip, layer forwards, and model-transform tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sdnq_tpu import (
    QTensor, QuantConfig, quantize_tensor, dequantize,
    quantize_model, dequantize_model, qlinear, qconv, qembedding,
    quantization_loss, quantize_tensor_dynamic,
)


def _w(shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)


def test_qtensor_is_pytree():
    qt = quantize_tensor(_w((64, 256)), "int8")
    leaves = jax.tree_util.tree_leaves(qt)
    assert len(leaves) >= 2  # qdata + scale
    qt2 = jax.tree_util.tree_map(lambda x: x, qt)
    assert isinstance(qt2, QTensor)
    assert qt2.meta == qt.meta


@pytest.mark.parametrize("fmt,tol", [
    ("int8", 1e-4), ("uint8", 1e-4), ("int4", 2e-2), ("uint4", 2e-2),
    ("float8_e4m3fn", 3e-3), ("fp6", 3e-2), ("int6", 2e-3),
])
def test_roundtrip_normalized_mse(fmt, tol):
    w = _w((128, 512))
    qt = quantize_tensor(w, fmt, group_size=-1)
    assert quantization_loss(w, qt) < tol


def test_grouped_roundtrip():
    w = _w((128, 512))
    qt = quantize_tensor(w, "int4", group_size=64)
    assert qt.meta.group_size == 64
    assert qt.meta.quantized_shape == (128, 8, 64)
    loss = quantization_loss(w, qt)
    assert loss < 1.2e-2  # int4 gaussian noise floor ~1.0e-2


def test_hadamard_svd_roundtrip():
    w = _w((128, 256))
    qt = quantize_tensor(w, "int4", use_hadamard=True, use_svd=True,
                         svd_rank=16)
    assert qt.meta.use_hadamard
    assert qt.svd_up is not None and qt.svd_up.shape == (128, 16)
    loss = quantization_loss(w, qt)
    assert loss < 1.5e-2


def test_conv_quantization():
    w = _w((64, 32, 3, 3))
    qt = quantize_tensor(w, "int8", layer_kind="conv", group_size=16)
    deq = dequantize(qt, dtype=jnp.float32)
    assert deq.shape == w.shape
    assert float(jnp.mean((deq - w) ** 2) / jnp.var(w)) < 1e-4


def test_qlinear_weight_only_matches_dequant():
    w = _w((256, 512))
    b = _w((256,), seed=1)
    x = _w((8, 512), seed=2, scale=0.5)
    qt = quantize_tensor(w, "int8")
    y = qlinear(x, qt, b, out_dtype=jnp.float32)
    ref = x @ dequantize(qt, jnp.float32).T + b
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_qlinear_packed_int4():
    w = _w((256, 512))
    x = _w((4, 512), seed=2, scale=0.5)
    qt = quantize_tensor(w, "int4", group_size=64)
    assert qt.qdata.dtype == jnp.uint8
    y = qlinear(x, qt, None, out_dtype=jnp.float32)
    ref = x @ dequantize(qt, jnp.float32).T
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_qlinear_int8_matmul_path():
    w = _w((256, 512))
    b = _w((256,), seed=1)
    x = _w((64, 512), seed=2, scale=0.5)  # rows >= 32 -> matmul path
    qt = quantize_tensor(w, "int8", use_quantized_matmul=True, group_size=-1)
    assert qt.meta.use_quantized_matmul
    assert not qt.meta.re_quantize_for_matmul
    y = qlinear(x, qt, b, out_dtype=jnp.float32)
    ref = x @ w.T + b
    rel = float(jnp.abs(y - ref).max() / jnp.abs(ref).max())
    assert rel < 0.05, rel


def test_qlinear_uint8_matmul_zero_point_fold():
    w = _w((256, 512)) + 1.5  # asymmetric distribution
    x = _w((64, 512), seed=2, scale=0.5) + 0.7
    qt = quantize_tensor(w, "uint8", use_quantized_matmul=True, group_size=-1)
    y = qlinear(x, qt, None, out_dtype=jnp.float32)
    ref = x @ w.T
    rel = float(jnp.abs(y - ref).max() / jnp.abs(ref).max())
    assert rel < 0.05, rel


def test_qlinear_matmul_with_hadamard_svd():
    w = _w((256, 512))
    x = _w((64, 512), seed=3, scale=0.3)
    qt = quantize_tensor(w, "int8", use_quantized_matmul=True, group_size=-1,
                         use_hadamard=True, use_svd=True, svd_rank=16)
    y = qlinear(x, qt, None, out_dtype=jnp.float32)
    ref = x @ w.T
    rel = float(jnp.abs(y - ref).max() / jnp.abs(ref).max())
    assert rel < 0.06, rel


def test_qlinear_small_batch_bailout():
    w = _w((256, 512))
    x = _w((4, 512), seed=2)  # rows < 32 -> weight-only path
    qt = quantize_tensor(w, "int8", use_quantized_matmul=True, group_size=-1)
    y = qlinear(x, qt, None, out_dtype=jnp.float32)
    ref = x @ dequantize(qt, jnp.float32).T
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-2,
                               atol=2e-2)


def test_qconv_plain():
    w = _w((64, 32, 3, 3))
    x = _w((2, 16, 16, 32), seed=4, scale=0.5)  # NHWC
    qt = quantize_tensor(w, "int8", layer_kind="conv")
    y = qconv(x, qt, stride=1, padding="SAME", out_dtype=jnp.float32)
    wd = dequantize(qt, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, jnp.moveaxis(wd, (0, 1), (-1, -2)), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_qconv_im2col_matmul():
    w = _w((64, 32, 3, 3))
    x = _w((2, 16, 16, 32), seed=4, scale=0.5)
    qt = quantize_tensor(w, "int8", layer_kind="conv",
                         use_quantized_matmul=True, group_size=-1)
    y = qconv(x, qt, stride=1, padding="SAME", out_dtype=jnp.float32)
    wd = dequantize(qt, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, jnp.moveaxis(wd, (0, 1), (-1, -2)), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    rel = float(jnp.abs(y - ref).max() / jnp.abs(ref).max())
    assert rel < 0.06, rel


def _grouped_conv_ref(x, wd, groups, stride=(1, 1), padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, jnp.moveaxis(wd, (0, 1), (-1, -2)), stride, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


def test_qconv_grouped_quantized_matmul():
    """Grouped conv runs the batched quantized GEMM, not a silent bf16
    fallback (reference: conv/conv_int8.py:16-120 per-group int_mm loop)."""
    groups = 4
    w = _w((64, 8, 3, 3))  # O=64, Cg=8, C=32
    x = _w((2, 16, 16, 32), seed=4, scale=0.5)
    for fmt, mm in [("int8", None), ("uint8", None),
                    ("float8_e4m3fn", None), ("int8", "float16")]:
        qt = quantize_tensor(w, fmt, layer_kind="conv",
                             matmul_fmt=mm,
                             use_quantized_matmul=True, group_size=-1)
        y = qconv(x, qt, stride=1, padding="SAME",
                  feature_group_count=groups, out_dtype=jnp.float32)
        ref = _grouped_conv_ref(x, dequantize(qt, jnp.float32), groups)
        rel = float(jnp.abs(y - ref).max() / jnp.abs(ref).max())
        assert rel < 0.08, (fmt, mm, rel)


def test_qconv_grouped_svd_and_hadamard():
    groups = 2
    w = _w((32, 16, 3, 3))
    x = _w((1, 8, 8, 32), seed=9, scale=0.5)
    b = _w((32,), seed=11)
    qt = quantize_tensor(w, "int8", layer_kind="conv",
                         use_quantized_matmul=True, group_size=-1,
                         use_svd=True, svd_rank=4, use_hadamard=True,
                         hadamard_group_size=16)
    y = qconv(x, qt, b, stride=1, padding="SAME",
              feature_group_count=groups, out_dtype=jnp.float32)
    ref = _grouped_conv_ref(x, dequantize(qt, jnp.float32), groups) \
        + b.astype(jnp.float32)
    rel = float(jnp.abs(y - ref).max() / jnp.abs(ref).max())
    assert rel < 0.08, rel


def test_qconv_grouped_weight_only_small_batch():
    groups = 4
    w = _w((64, 8, 3, 3))
    x = _w((1, 2, 2, 32), seed=4, scale=0.5)  # 4 rows < _MIN_MATMUL_ROWS
    qt = quantize_tensor(w, "int8", layer_kind="conv",
                         use_quantized_matmul=True, group_size=-1)
    y = qconv(x, qt, stride=1, padding="SAME",
              feature_group_count=groups, out_dtype=jnp.float32)
    ref = _grouped_conv_ref(x, dequantize(qt, jnp.float32), groups)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-3,
                               atol=1e-3)


def test_qembedding():
    w = _w((1000, 128))
    qt = quantize_tensor(w, "int8", layer_kind="embedding")
    ids = jnp.asarray([[1, 5, 999], [0, 42, 7]])
    y = qembedding(ids, qt, out_dtype=jnp.float32)
    ref = dequantize(qt, jnp.float32)[ids.reshape(-1)].reshape(2, 3, 128)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)


def test_quantize_model_pytree():
    params = {
        "blocks": [
            {"attn": {"to_q": {"weight": _w((256, 256)), "bias": _w((256,))}}},
            {"mlp": {"fc": {"weight": _w((1024, 256))}}},
        ],
        "norm": {"weight": _w((256,))},             # 1D: skipped
        "tiny": {"weight": _w((8, 8))},             # too small: skipped
        "token_embedding": {"weight": _w((512, 256))},
    }
    qp, cfg = quantize_model(params, QuantConfig(weights_dtype="int8"))
    assert isinstance(qp["blocks"][0]["attn"]["to_q"]["weight"], QTensor)
    assert isinstance(qp["blocks"][1]["mlp"]["fc"]["weight"], QTensor)
    assert not isinstance(qp["norm"]["weight"], QTensor)
    assert not isinstance(qp["tiny"]["weight"], QTensor)
    # embedding skipped by default (quant_embedding=False)
    assert not isinstance(qp["token_embedding"]["weight"], QTensor)
    # bias untouched
    assert not isinstance(qp["blocks"][0]["attn"]["to_q"]["bias"], QTensor)
    back = dequantize_model(qp, dtype=jnp.float32)
    assert back["blocks"][0]["attn"]["to_q"]["weight"].shape == (256, 256)


def test_quantize_model_skip_lists():
    params = {"proj_out": {"weight": _w((256, 256))},
              "mid": {"weight": _w((256, 256))}}
    cfg = QuantConfig(modules_to_not_convert=["proj_out"])
    qp, _ = quantize_model(params, cfg)
    assert not isinstance(qp["proj_out"]["weight"], QTensor)
    assert isinstance(qp["mid"]["weight"], QTensor)


def test_dynamic_quantization_ladder():
    # easy weight: low-variance structure quantizes at 4 bits
    rng = np.random.default_rng(0)
    base = rng.normal(size=(128, 1)) @ rng.normal(size=(1, 256))
    w = jnp.asarray((base + 0.01 * rng.normal(size=(128, 256)))
                    .astype(np.float32))
    qt = quantize_tensor_dynamic(w, fmt="uint4",
                                 dynamic_loss_threshold=1e-2)
    assert qt is not None
    # hard weight at 2 bits escalates up the ladder
    w2 = _w((128, 256), seed=5)
    qt2 = quantize_tensor_dynamic(w2, fmt="int2", group_size=-1,
                                  dynamic_loss_threshold=1e-3)
    assert qt2 is not None
    from sdnq_tpu import get_format
    assert get_format(qt2.meta.fmt).num_bits > 2


def test_dynamic_ladder_svd_group_size_matches_reference_rule():
    """SVD layers must pick 2^(3+bits) groups in the dynamic ladder, same as
    the static path (reference: quantizer.py:171-214 computes SVD before the
    group-size search)."""
    w = _w((128, 512), seed=7)
    qt = quantize_tensor_dynamic(w, fmt="int4", use_svd=True, svd_rank=8,
                                 dynamic_loss_threshold=1.0)
    qt_static = quantize_tensor(w, "int4", use_svd=True, svd_rank=8)
    assert qt is not None
    assert qt.svd_up is not None
    assert qt.meta.group_size == qt_static.meta.group_size
    # int4 + SVD on a 512-channel linear: 2^(3+4)=128 groups of 128
    assert qt.meta.group_size == 128


def test_qlinear_under_jit_and_grad_nondiff_wrt_weight():
    w = _w((128, 256))
    qt = quantize_tensor(w, "int8")
    x = _w((8, 256), seed=6)

    @jax.jit
    def f(x, qt):
        return qlinear(x, qt).sum()

    v = f(x, qt)
    assert jnp.isfinite(v)
    g = jax.grad(lambda x: f(x, qt))(x)
    assert g.shape == x.shape


def test_packed_storage_is_bitplane_uint8():
    """Packed formats must store bit-plane uint8 bytes, never raw int32
    codes (regression: a mis-gated packing branch once left uint4 qdata as
    unpacked int32, tripling memory and breaking the packed kernel)."""
    for fmt, g, bits in [("uint4", 32, 4), ("int4", 64, 4),
                         ("int2", 16, 2), ("float6_e3m2fn", 64, 6)]:
        qt = quantize_tensor(_w((64, 256)), fmt, group_size=g)
        assert qt.qdata.dtype == jnp.uint8, (fmt, qt.qdata.dtype)
        assert qt.qdata.size == 64 * bits * 256 // 8, fmt


def test_fp16_matmul_storage_is_bf16():
    """The fp16 quantized-matmul family stores bf16 on TPU (no fp16 ALU;
    the MXU multiplies in bf16 either way — storing f16 costs a per-call
    conversion at ~1/3 the GEMM rate, measured 47 vs 151 TF on v5e)."""
    qt = quantize_tensor(_w((64, 256)), "fp16", use_quantized_matmul=True,
                         group_size=-1)
    assert qt.qdata.dtype == jnp.bfloat16
    # weight-only fp16 keeps the f16 grid (higher-precision dequant)
    qt2 = quantize_tensor(_w((64, 256)), "fp16")
    assert qt2.qdata.dtype == jnp.float16


def test_qlinear_uint4_packed_matmul_route(monkeypatch):
    """ADVICE r4: unsigned packed storage must route through
    packed_int8_matmul at the layer level and match the dequantized matmul
    (activation quant is symmetric int8 by design — an execution-format
    routing; the asymmetric WEIGHT offset rides the kernel's rank-G
    zero-point dot exactly)."""
    monkeypatch.setenv("SDNQ_TPU_KERNEL_BACKEND", "interpret")
    w = _w((128, 512)) + 0.8  # asymmetric distribution
    x = _w((64, 512), seed=2, scale=0.5)
    qt = quantize_tensor(w, "uint4", group_size=128,
                         use_quantized_matmul=True)
    assert qt.meta.re_quantize_for_matmul and qt.meta.is_packed

    import sdnq_tpu.kernels.dequant_mm as dm
    calls = []
    orig = dm.packed_int8_matmul

    def spy(*a, **k):
        out = orig(*a, **k)
        calls.append(out is not None)
        return out

    monkeypatch.setattr(dm, "packed_int8_matmul", spy)
    y = qlinear(x, qt, None, out_dtype=jnp.float32)
    assert calls == [True], "packed int8 route not taken"
    ref = x @ dequantize(qt, jnp.float32).T
    rel = float(jnp.abs(y - ref).max() / jnp.abs(ref).max())
    assert rel < 0.03, rel
