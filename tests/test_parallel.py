"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from sdnq_tpu import QuantConfig, quantize_model, quantize_tensor, qlinear
from sdnq_tpu.models import FLUX_TINY_CONFIG, dit_forward, init_dit, \
    make_rope_freqs
from sdnq_tpu.parallel import create_mesh, shard_params, DIT_TP_RULES


def test_mesh_creation():
    mesh = create_mesh(data=2, tensor=4)
    assert mesh.shape == {"data": 2, "fsdp": 1, "tensor": 4, "sequence": 1}


def test_qtensor_sharded_linear_matches_replicated():
    mesh = create_mesh(tensor=4)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(256, 512)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(8, 512)).astype(np.float32))
    qt = quantize_tensor(w, "int8", group_size=64)
    ref = qlinear(x, qt, out_dtype=jnp.float32)

    sharded = shard_params({"layer": {"weight": qt}}, mesh,
                           {"layer": "col"})["layer"]["weight"]
    with jax.set_mesh(mesh):
        out = jax.jit(lambda x, q: qlinear(x, q, out_dtype=jnp.float32))(
            x, sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_dit_tp_dp_sharded_forward_matches():
    cfg = FLUX_TINY_CONFIG
    mesh = create_mesh(data=2, tensor=4)
    params = init_dit(jax.random.key(0), cfg)
    qparams, _ = quantize_model(
        params, QuantConfig(weights_dtype="int8", dequant_dtype="float32"),
        arch="FluxTransformer2DModel")

    rng = np.random.default_rng(0)
    b, n_img, txt_len = 4, 64, 16
    img = jnp.asarray(rng.normal(size=(b, n_img, cfg.in_channels))
                      .astype(np.float32))
    txt = jnp.asarray(rng.normal(size=(b, txt_len, cfg.txt_dim))
                      .astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 1, (b,)).astype(np.float32))
    pooled = jnp.asarray(rng.normal(size=(b, cfg.vec_dim)).astype(np.float32))
    freqs = make_rope_freqs(cfg, txt_len, (8, 8))

    ref = dit_forward(qparams, img, txt, t, pooled, cfg,
                      guidance=t, freqs=freqs)

    sharded = shard_params(qparams, mesh, DIT_TP_RULES)
    data_sharding = NamedSharding(mesh, P("data"))
    img_s = jax.device_put(img, data_sharding)
    txt_s = jax.device_put(txt, data_sharding)

    with jax.set_mesh(mesh):
        fwd = jax.jit(lambda p, i, tx: dit_forward(
            p, i, tx, t, pooled, cfg, guidance=t, freqs=freqs))
        out = fwd(sharded, img_s, txt_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=1e-3)


def test_stacked_blocks_tp_sharded_forward():
    from sdnq_tpu.models import stack_dit_blocks
    cfg = FLUX_TINY_CONFIG
    mesh = create_mesh(data=2, tensor=4)
    params = init_dit(jax.random.key(0), cfg)
    qparams, _ = quantize_model(
        params, QuantConfig(weights_dtype="int8", dequant_dtype="float32"),
        arch="FluxTransformer2DModel")

    rng = np.random.default_rng(0)
    b, n_img, txt_len = 4, 64, 16
    img = jnp.asarray(rng.normal(size=(b, n_img, cfg.in_channels))
                      .astype(np.float32))
    txt = jnp.asarray(rng.normal(size=(b, txt_len, cfg.txt_dim))
                      .astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 1, (b,)).astype(np.float32))
    pooled = jnp.asarray(rng.normal(size=(b, cfg.vec_dim)).astype(np.float32))
    freqs = make_rope_freqs(cfg, txt_len, (8, 8))

    ref = dit_forward(qparams, img, txt, t, pooled, cfg, guidance=t,
                      freqs=freqs)
    stacked = stack_dit_blocks(qparams)
    sharded = shard_params(stacked, mesh, DIT_TP_RULES)
    with jax.set_mesh(mesh):
        out = jax.jit(lambda p, i: dit_forward(
            p, i, txt, t, pooled, cfg, guidance=t, freqs=freqs))(sharded, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=1e-3)
