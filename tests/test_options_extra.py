"""Option re-targeting, conv-transpose path, per-module override tests."""

import numpy as np
import jax
import jax.numpy as jnp

from sdnq_tpu import (
    QTensor, QuantConfig, apply_options_to_model, quantize_model,
    quantize_tensor, requantize_model, qconv, dequantize, get_format,
)


def _w(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape)
                       .astype(np.float32))


def test_apply_options_toggles_matmul():
    qp = {"fc": {"weight": quantize_tensor(_w((128, 256)), "int8",
                                           use_quantized_matmul=True,
                                           group_size=-1)}}
    off = apply_options_to_model(qp, use_quantized_matmul=False)
    assert not off["fc"]["weight"].meta.use_quantized_matmul
    bf = apply_options_to_model(qp, dequant_dtype="float32")
    assert bf["fc"]["weight"].meta.dequant_dtype == "float32"


def test_requantize_model_changes_format():
    qp = {"fc": {"weight": quantize_tensor(_w((128, 256)), "int8")}}
    q4 = requantize_model(qp, "int4")
    assert q4["fc"]["weight"].meta.fmt == "int4"
    w8 = dequantize(qp["fc"]["weight"], jnp.float32)
    w4 = dequantize(q4["fc"]["weight"], jnp.float32)
    # int4 re-quantization of the int8 weight stays close
    assert float(jnp.mean((w8 - w4) ** 2) / jnp.var(w8)) < 2e-2


def test_conv_transpose_forward():
    w = _w((32, 64, 4, 4))  # (C_in, C_out, kh, kw) torch convT layout
    x = _w((1, 8, 8, 32), seed=1)
    qt = quantize_tensor(w, "int8", layer_kind="conv_transpose")
    y = qconv(x, qt, stride=2, padding="SAME", transpose=True,
              out_dtype=jnp.float32)
    assert y.shape == (1, 16, 16, 64)
    wd = dequantize(qt, jnp.float32)
    ref = qconv(x, wd, stride=2, padding="SAME", transpose=True,
                out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4)


def test_per_module_dtype_override():
    params = {"a": {"weight": _w((128, 256))},
              "b": {"weight": _w((128, 256), 1)}}
    cfg = QuantConfig(weights_dtype="int4",
                      modules_dtype_dict={"minimum_8bit": ["b"]})
    qp, _ = quantize_model(params, cfg)
    assert get_format(qp["a"]["weight"].meta.fmt).num_bits == 4
    assert get_format(qp["b"]["weight"].meta.fmt).num_bits == 8


def test_modules_quant_config_override():
    params = {"a": {"weight": _w((128, 256))},
              "b": {"weight": _w((128, 256), 1)}}
    cfg = QuantConfig(
        weights_dtype="int8",
        modules_quant_config={"b": {"weights_dtype": "uint4",
                                    "use_hadamard": True}})
    qp, _ = quantize_model(params, cfg)
    assert qp["a"]["weight"].meta.fmt == "int8"
    assert qp["b"]["weight"].meta.fmt == "uint4"
    assert qp["b"]["weight"].meta.use_hadamard
