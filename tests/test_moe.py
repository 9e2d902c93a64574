"""MoE / expert-parallelism tests (models/moe.py).

EP is absent from the reference (SURVEY §2.2) — these pin the from-scratch
TPU design: static-capacity dispatch correctness vs a per-token python
loop, quantized expert banks, and expert-axis sharding parity on the
virtual mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp

from sdnq_tpu.models.moe import (
    MoEConfig, init_moe, moe_ffn, quantize_moe, shard_moe)
from sdnq_tpu.parallel import create_mesh


def _dense_ffn(p, x):
    """Per-token reference: run token t through its top-1 expert densely."""
    g = x @ np.asarray(p["gate_proj"]["weight"]).transpose(0, 2, 1)
    u = x @ np.asarray(p["up_proj"]["weight"]).transpose(0, 2, 1)
    h = (g / (1 + np.exp(-g))) * u
    return h @ np.asarray(p["down_proj"]["weight"]).transpose(0, 2, 1)


def test_moe_top1_matches_per_token_loop():
    # capacity >= T so nothing drops; top_k=1 so the gate weight is 1.0
    cfg = MoEConfig(hidden_size=32, ff_dim=64, num_experts=4, top_k=1,
                    capacity_factor=4.0)
    params = init_moe(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(12, cfg.hidden_size))
                    .astype(np.float32))

    y, aux = jax.jit(lambda p, x: moe_ffn(p, x, cfg))(params, x)

    logits = np.asarray(x) @ np.asarray(params["router"]["weight"]).T
    choice = logits.argmax(-1)
    per_expert = _dense_ffn(params, np.asarray(x))   # (E, T, D) dense all
    ref = per_expert[choice, np.arange(x.shape[0])]
    # expert GEMMs run in bf16 (qlinear_batched); the loop is fp32
    np.testing.assert_allclose(np.asarray(y), ref, rtol=5e-2, atol=2e-2)
    assert np.isfinite(float(aux)) and float(aux) > 0


def test_moe_capacity_drops_tokens():
    # one-slot capacity: with 12 tokens routed across 4 experts some must
    # drop, and dropped tokens produce exactly zero output
    cfg = MoEConfig(hidden_size=32, ff_dim=64, num_experts=4, top_k=1,
                    capacity_factor=1.0 / 3.0)
    params = init_moe(jax.random.key(1), cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(12, cfg.hidden_size))
                    .astype(np.float32))
    y, _ = moe_ffn(params, x, cfg)
    rows = np.abs(np.asarray(y)).sum(-1)
    assert (rows == 0).sum() >= 12 - 4  # <= cap tokens survive per expert


def test_moe_quantized_close_to_dense():
    cfg = MoEConfig(hidden_size=64, ff_dim=128, num_experts=4, top_k=2,
                    capacity_factor=4.0)
    params = init_moe(jax.random.key(2), cfg)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(16, cfg.hidden_size))
                    .astype(np.float32))
    y0, _ = moe_ffn(params, x, cfg, out_dtype=jnp.float32)

    for qmm in (False, True):
        qp = quantize_moe(params, "int8", use_quantized_matmul=qmm)
        y1, _ = jax.jit(lambda p, x: moe_ffn(p, x, cfg,
                                             out_dtype=jnp.float32))(qp, x)
        err = float(jnp.abs(y1 - y0).max())
        scale = float(jnp.abs(y0).max())
        assert err < 0.15 * scale, (qmm, err, scale)


def test_moe_expert_parallel_matches_replicated():
    cfg = MoEConfig(hidden_size=32, ff_dim=64, num_experts=8, top_k=2,
                    capacity_factor=2.0)
    params = init_moe(jax.random.key(3), cfg)
    qp = quantize_moe(params, "int8", use_quantized_matmul=True)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(16, cfg.hidden_size))
                    .astype(np.float32))
    ref, _ = moe_ffn(qp, x, cfg, out_dtype=jnp.float32)

    mesh = create_mesh(tensor=4)
    sharded = shard_moe(qp, mesh, axis="tensor")
    with jax.set_mesh(mesh):
        out, _ = jax.jit(lambda p, x: moe_ffn(p, x, cfg,
                                              out_dtype=jnp.float32))(
            sharded, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_moe_grad_flows():
    cfg = MoEConfig(hidden_size=32, ff_dim=64, num_experts=4, top_k=2,
                    capacity_factor=2.0)
    params = init_moe(jax.random.key(4), cfg)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(8, cfg.hidden_size))
                    .astype(np.float32))

    def loss(p):
        y, aux = moe_ffn(p, x, cfg, out_dtype=jnp.float32)
        return jnp.mean(y ** 2) + 0.01 * aux

    g = jax.grad(loss)(params)
    gnorm = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a: float(jnp.abs(a).sum()), g))
    assert np.isfinite(gnorm) and gnorm > 0
    # router must receive gradient through the gate values
    assert float(jnp.abs(g["router"]["weight"]).sum()) > 0
