"""Env-var configuration surface (the reference's ~20 SDNQ_* knobs:
kernel_wrappers.py:11-105, README.md:241-277)."""

import numpy as np
import jax.numpy as jnp

from sdnq_tpu.envconfig import (
    env_blocks, env_bool, env_float, env_int, vmem_limit_bytes,
)


def test_env_parsers(monkeypatch):
    monkeypatch.setenv("A_INT", "7")
    monkeypatch.setenv("A_FLOAT", "0.25")
    monkeypatch.setenv("A_BOOL", "true")
    monkeypatch.setenv("A_BLOCKS", "512,256")
    monkeypatch.setenv("A_BLOCKS3", "512x256x128")
    assert env_int("A_INT", 1) == 7
    assert env_float("A_FLOAT") == 0.25
    assert env_bool("A_BOOL") is True
    assert env_bool("A_MISSING") is None
    assert env_blocks("A_BLOCKS", 2) == (512, 256)
    assert env_blocks("A_BLOCKS3", 3) == (512, 256, 128)
    assert env_blocks("A_BLOCKS", 3) is None  # wrong arity
    monkeypatch.setenv("A_BAD", "abc")
    assert env_int("A_BAD", 3) == 3
    assert env_blocks("A_BAD", 2) is None


def test_vmem_limit_env(monkeypatch):
    monkeypatch.setenv("SDNQ_TPU_VMEM_LIMIT_MB", "64")
    assert vmem_limit_bytes() == 64 * 1024 * 1024


def test_quant_config_env_defaults(monkeypatch):
    monkeypatch.setenv("SDNQ_TPU_SVD_RANK", "16")
    monkeypatch.setenv("SDNQ_TPU_GROUP_SIZE", "64")
    monkeypatch.setenv("SDNQ_TPU_DEQUANT_DTYPE", "float32")
    from sdnq_tpu import QuantConfig
    cfg = QuantConfig()
    assert cfg.svd_rank == 16
    assert cfg.group_size == 64
    assert cfg.dequant_dtype == "float32"
    # explicit kwargs still win
    assert QuantConfig(svd_rank=8).svd_rank == 8


def test_min_matmul_rows_env(monkeypatch):
    from sdnq_tpu.layers import _min_matmul_rows
    assert _min_matmul_rows() == 32
    monkeypatch.setenv("SDNQ_TPU_MIN_MATMUL_ROWS", "64")
    assert _min_matmul_rows() == 64


def test_force_quantized_matmul_env(monkeypatch):
    from sdnq_tpu import QuantConfig, QTensor, quantize_model
    rng = np.random.default_rng(0)
    params = {"fc": {"weight": jnp.asarray(
        rng.normal(size=(128, 256)).astype(np.float32))}}
    monkeypatch.setenv("SDNQ_TPU_USE_QUANTIZED_MATMUL", "1")
    qp, _ = quantize_model(params, QuantConfig(use_quantized_matmul=False))
    assert qp["fc"]["weight"].meta.use_quantized_matmul
    monkeypatch.setenv("SDNQ_TPU_USE_QUANTIZED_MATMUL", "0")
    qp, _ = quantize_model(params, QuantConfig(use_quantized_matmul=True))
    assert not qp["fc"]["weight"].meta.use_quantized_matmul


def test_disable_fused_act_env(monkeypatch):
    from sdnq_tpu.kernels.scaled_mm import scaled_mm_fused_act
    monkeypatch.setenv("SDNQ_TPU_KERNEL_BACKEND", "interpret")
    monkeypatch.setenv("SDNQ_TPU_DISABLE_FUSED_ACT", "1")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(64, 256)).astype(np.float32))
    w = jnp.asarray(rng.integers(-127, 128, (128, 256)).astype(np.int8))
    ws = jnp.asarray(rng.uniform(0.01, 0.02, (128,)).astype(np.float32))
    out = scaled_mm_fused_act(x, w, ws, None, x_fmt="int8",
                              out_dtype=jnp.float32)
    assert out.shape == (64, 128)  # two-pass fallback path works
