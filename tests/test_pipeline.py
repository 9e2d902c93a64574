"""Pipeline tests: schedulers, end-to-end samplers, continuous batching."""

import numpy as np
import jax
import jax.numpy as jnp

from sdnq_tpu import QuantConfig, quantize_model
from sdnq_tpu.models import (
    UNET_TINY_CONFIG, init_unet, VAE_TINY_CONFIG, init_vae,
    FLUX_TINY_CONFIG, init_dit,
)
from sdnq_tpu.pipeline import (
    ContinuousBatcher, DDIMScheduler, FlowMatchScheduler, Request,
    flux_generate, sd_generate,
)


def test_ddim_add_noise_roundtrip():
    sched = DDIMScheduler()
    x0 = jnp.ones((1, 4, 4, 4))
    noise = jnp.zeros_like(x0)
    # zero noise at t=0-ish keeps x0 (alpha ~ 1)
    out = sched.add_noise(x0, noise, jnp.asarray([0]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-2)


def test_flowmatch_step_integrates():
    sched = FlowMatchScheduler()
    ts = sched.timesteps(4)
    assert float(ts[0]) == 1.0 and float(ts[-1]) > 0


def test_sd_generate_tiny():
    ucfg, vcfg = UNET_TINY_CONFIG, VAE_TINY_CONFIG
    up = init_unet(jax.random.key(0), ucfg)
    vp = init_vae(jax.random.key(1), vcfg)
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(1, 8, ucfg.cross_attention_dim))
                      .astype(np.float32))
    img = sd_generate(up, vp, emb, jnp.zeros_like(emb), unet_cfg=ucfg,
                      vae_cfg=vcfg, steps=2, height=32, width=32)
    # VAE_TINY upsamples 2x from latent: 32/8*2 = 8... shape check only
    assert img.ndim == 4 and img.shape[0] == 1 and img.shape[-1] == 3
    assert bool(jnp.isfinite(img).all())


def test_flux_generate_tiny_quantized():
    dcfg, vcfg = FLUX_TINY_CONFIG, VAE_TINY_CONFIG
    dp = init_dit(jax.random.key(0), dcfg)
    dq, _ = quantize_model(dp, QuantConfig(weights_dtype="int8"),
                           arch="FluxTransformer2DModel")
    vp = init_vae(jax.random.key(1), vcfg)
    rng = np.random.default_rng(0)
    txt = jnp.asarray(rng.normal(size=(1, 8, dcfg.txt_dim))
                      .astype(np.float32))
    pooled = jnp.asarray(rng.normal(size=(1, dcfg.vec_dim))
                         .astype(np.float32))
    img = flux_generate(dq, vp, txt, pooled, dit_cfg=dcfg, vae_cfg=vcfg,
                        steps=2, height=64, width=64)
    assert img.shape[0] == 1 and img.shape[-1] == 3
    assert bool(jnp.isfinite(img).all())


def test_continuous_batcher():
    """Slots refill mid-flight; per-slot timesteps advance independently."""
    calls = []

    def step_fn(latents, cond, t_idx, active):
        calls.append(np.asarray(t_idx).copy())
        return latents + (cond["v"][:, None]
                          * active[:, None].astype(latents.dtype))

    def init_latent(req):
        return jnp.zeros((4,), jnp.float32)

    b = ContinuousBatcher(step_fn, init_latent, num_slots=2,
                          num_steps_max=8)
    for i in range(5):
        b.submit(Request(request_id=i, cond={"v": jnp.asarray(i + 1.0)},
                         num_steps=i % 3 + 1))
    done = b.run()
    assert len(done) == 5
    by_id = {r.request_id: r for r in done}
    # each result = num_steps * (id+1)
    for i in range(5):
        expected = (i % 3 + 1) * (i + 1.0)
        np.testing.assert_allclose(by_id[i].result,
                                   np.full((4,), expected))
    # slots were reused: more requests than slots
    assert max(len(c) for c in calls) == 2


def test_continuous_batcher_multichip_mesh():
    """Slot axis sharded over the 8-device data axis: admission lands on
    the owning shard mid-flight and results match the unsharded run
    (BASELINE: continuous batching across hosts)."""
    from sdnq_tpu.parallel import create_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = create_mesh(data=8)

    @jax.jit
    def step_fn(latents, cond, t_idx, active):
        # a denoise-ish SPMD step: slotwise update rides the data axis
        upd = cond["v"][:, None] * active[:, None].astype(latents.dtype)
        return latents + upd * (1.0 + 0.1 * t_idx[:, None]
                                .astype(latents.dtype))

    def init_latent(req):
        return jnp.zeros((4,), jnp.float32)

    def run(mesh_arg):
        b = ContinuousBatcher(step_fn, init_latent, num_slots=16,
                              num_steps_max=8, mesh=mesh_arg)
        for i in range(40):
            b.submit(Request(request_id=i,
                             cond={"v": jnp.asarray(i + 1.0)},
                             num_steps=i % 4 + 1))
        done = b.run()
        return b, {r.request_id: r.result for r in done}

    b_mesh, res_mesh = run(mesh)
    # latents stayed sharded over the data axis through the whole run
    assert isinstance(b_mesh.latents.sharding, NamedSharding)
    assert b_mesh.latents.sharding.spec[0] == "data"
    b_ref, res_ref = run(None)
    assert set(res_mesh) == set(res_ref)
    for k in res_ref:
        np.testing.assert_allclose(res_mesh[k], res_ref[k], rtol=1e-6)
    # mid-flight admission kept slots busy: efficiency well above 1/slots
    assert b_mesh.efficiency > 0.5, b_mesh.efficiency


def test_continuous_batcher_slot_count_must_divide():
    from sdnq_tpu.parallel import create_mesh
    mesh = create_mesh(data=8)
    import pytest
    with pytest.raises(ValueError):
        ContinuousBatcher(lambda *a: a[0], lambda r: jnp.zeros((2,)),
                          num_slots=12, num_steps_max=4, mesh=mesh)
