"""Two-process SPMD worker for tests/test_multiprocess.py.

Run as:  python tests/_mp_worker.py <process_id> <num_processes> <port>

Each process owns 4 virtual CPU devices (XLA_FLAGS set by the launcher)
and joins a jax.distributed coordination service, producing a *global*
8-device mesh that spans a real process boundary — the thing the virtual
single-process mesh in the rest of the test suite cannot exercise
(BASELINE north star: continuous batching "across hosts"; the reference's
entire multi-host story is c10d collective transparency,
/root/reference/src/sdnq/training/tensor.py:141-160).

Work done per process, results printed as one JSON line on stdout:
  1. the quantized TP+DP train step from __graft_entry__.dryrun_multichip,
     over the cross-process mesh -> loss
  2. a ContinuousBatcher drain with the slot axis sharded over the
     process-spanning data axis -> admission schedule + completion order +
     per-request result digests
The launcher asserts both processes print identical values: deterministic
admission means every host replays the same decisions with no extra
collective (pipeline/batching.py docstring contract).
"""

import json
import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                               process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sdnq_tpu import QuantConfig, quantize_model
    from sdnq_tpu.models import DiTConfig, dit_forward, init_dit, \
        make_rope_freqs
    from sdnq_tpu.parallel import create_mesh, shard_params, DIT_TP_RULES
    from sdnq_tpu.pipeline import ContinuousBatcher, Request
    from sdnq_tpu.train import convert_model_to_training, value_and_grad
    from sdnq_tpu.optim import adamw

    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc  # global device view

    out = {"pid": pid, "nproc": nproc, "ndev": len(jax.devices())}

    # --- 1. quantized TP+DP train step over the cross-process mesh -----
    mesh = create_mesh(data=2, tensor=2 * nproc, devices=jax.devices())
    cfg = DiTConfig(in_channels=8, hidden_size=128, num_heads=4,
                    depth_double=1, depth_single=2, txt_dim=64, vec_dim=32,
                    axes_dims=(8, 12, 12), guidance_embed=False)
    params = init_dit(jax.random.key(0), cfg)
    qparams, _ = quantize_model(
        params, QuantConfig(weights_dtype="int8", dequant_dtype="float32"),
        arch="FluxTransformer2DModel")
    tparams = convert_model_to_training(qparams)
    tparams = shard_params(tparams, mesh, DIT_TP_RULES)
    opt = adamw(lr=1e-4, quantize_state=True, stochastic_rounding=True)
    opt_state = opt.init(tparams)

    b, img_hw, txt_len = 4, (4, 4), 8
    n_img = img_hw[0] * img_hw[1]
    data_sh = NamedSharding(mesh, P("data"))
    img = jax.device_put(jnp.ones((b, n_img, cfg.in_channels)), data_sh)
    txt = jax.device_put(jnp.ones((b, txt_len, cfg.txt_dim)), data_sh)
    target = jax.device_put(jnp.zeros((b, n_img, cfg.in_channels)), data_sh)
    t = jnp.full((b,), 0.5, jnp.float32)
    pooled = jnp.ones((b, cfg.vec_dim), jnp.float32)
    freqs = make_rope_freqs(cfg, txt_len, img_hw)

    def loss_fn(tp, img, txt, target):
        pred = dit_forward(tp, img, txt, t, pooled, cfg, freqs=freqs)
        return jnp.mean((pred.astype(jnp.float32) - target) ** 2)

    with jax.set_mesh(mesh):
        # NOTE: cross-process global arrays must be ARGUMENTS of the jitted
        # step — closing over non-addressable arrays is an error.
        @jax.jit
        def step(tp, opt_state, key, img, txt, target):
            loss, grads = value_and_grad(
                lambda p: loss_fn(p, img, txt, target))(tp)
            tp, opt_state = opt.update(grads, opt_state, tp, rng=key)
            return loss, tp, opt_state

        loss, tparams, opt_state = step(tparams, opt_state,
                                        jax.random.key(1),
                                        img, txt, target)
        out["loss"] = float(jax.device_get(
            jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))
            (loss)))

    # --- 2. continuous batcher drain over the process-spanning mesh ----
    # the mesh must span EVERY global device: a data axis smaller than the
    # device count builds a mesh living entirely on process 0 and leaves
    # the other processes with zero addressable shards
    bmesh = create_mesh(data=len(jax.devices()), devices=jax.devices())
    S, H = 4 * nproc, 8

    def step_fn(latents, cond, t_idx, active):
        upd = latents * 0.5 + cond[:, None] * 0.25 \
            + t_idx[:, None, None].astype(jnp.float32)
        return jnp.where(active[:, None, None], upd, latents)

    def init_latent(req):
        return jnp.full((H, H), float(req.rng_seed), jnp.float32)

    admissions = []

    class LoggingBatcher(ContinuousBatcher):
        def _admit(self):
            before = [None if s is None else s.request_id
                      for s in self.slots]
            changed = super()._admit()
            for i, s in enumerate(self.slots):
                rid = None if s is None else s.request_id
                if rid != before[i]:
                    admissions.append([self.total_slot_steps, i, rid])
            return changed

    step_jit = jax.jit(step_fn)
    batcher = LoggingBatcher(step_jit, init_latent, num_slots=S,
                             num_steps_max=8, mesh=bmesh)
    for rid in range(3 * S):
        batcher.submit(Request(request_id=rid,
                               cond=jnp.full((H,), 0.1 * rid, jnp.float32),
                               num_steps=2 + rid % 5, rng_seed=rid))
    done = batcher.run()
    out["admissions"] = admissions
    out["completed"] = [r.request_id for r in done]
    out["digests"] = {str(r.request_id): round(float(np.sum(r.result)), 4)
                      for r in done}
    out["efficiency"] = round(batcher.efficiency, 6)
    print("MPRESULT " + json.dumps(out, sort_keys=True), flush=True)


if __name__ == "__main__":
    main()
