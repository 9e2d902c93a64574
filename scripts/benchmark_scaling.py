#!/usr/bin/env python
"""Scaling-efficiency harness: quantized DiT steps/s at mesh sizes 1..N.

BASELINE.md asks for "tokens/s and images/s efficiency at 1 chip, 1 host,
N>=2 hosts".  This harness weak-scales the quantized DiT denoise step over
a growing data(-x-tensor) mesh (per-device batch constant) and reports
images/s and parallel efficiency vs the 1-device run.

On real TPU hardware it reports true pod efficiency; in this repo's
environment only ONE real chip is reachable, so CI runs it on the virtual
CPU mesh (PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8) where the numbers
validate the sharding/collective structure (no cross-device stragglers,
batch rides the data axis) rather than chip throughput.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--double", type=int, default=2)
    ap.add_argument("--single", type=int, default=2)
    ap.add_argument("--tokens", type=int, default=256)
    ap.add_argument("--per-device-batch", type=int, default=2)
    ap.add_argument("--tensor", type=int, default=1,
                    help="tensor-parallel degree inside each data shard")
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()

    from sdnq_tpu import QuantConfig, quantize_model
    from sdnq_tpu.models import (
        DiTConfig, dit_forward, init_dit, make_rope_freqs,
    )
    from sdnq_tpu.parallel import (
        DIT_TP_RULES, NamedSharding, P, create_mesh, shard_params,
    )

    n_dev = len(jax.devices())
    hd = args.hidden // args.heads
    a1 = hd - 2 * ((hd // 3) // 2 * 2)
    rest = (hd - a1) // 2
    cfg = DiTConfig(in_channels=8, hidden_size=args.hidden,
                    num_heads=args.heads, depth_double=args.double,
                    depth_single=args.single, txt_dim=128, vec_dim=64,
                    axes_dims=(a1, rest, rest), guidance_embed=False)
    params = init_dit(jax.random.key(0), cfg, dtype=jnp.float32)
    qp, _ = quantize_model(
        params, QuantConfig(weights_dtype="int8", use_quantized_matmul=True),
        arch="FluxTransformer2DModel")

    side = int(args.tokens ** 0.5)
    txt_len = 32
    freqs = make_rope_freqs(cfg, txt_len, (side, side))
    rng = np.random.default_rng(0)

    base_rate = None
    sizes = [s for s in (1, 2, 4, 8, 16) if s <= n_dev]
    print(f"devices: {n_dev} ({jax.devices()[0].platform}); weak scaling, "
          f"per-device batch {args.per_device_batch}")
    for nd in sizes:
        if nd % args.tensor:
            continue
        data = nd // args.tensor
        mesh = create_mesh(data=data, tensor=args.tensor,
                           devices=jax.devices()[:nd])
        qps = shard_params(qp, mesh, DIT_TP_RULES if args.tensor > 1
                           else {})
        b = args.per_device_batch * data
        dsh = NamedSharding(mesh, P("data"))
        img = jax.device_put(
            jnp.asarray(rng.normal(size=(b, side * side, cfg.in_channels))
                        .astype(np.float32)).astype(jnp.bfloat16), dsh)
        txt = jax.device_put(
            jnp.ones((b, txt_len, cfg.txt_dim), jnp.bfloat16), dsh)
        t = jax.device_put(jnp.full((b,), 0.5, jnp.float32), dsh)
        pooled = jax.device_put(jnp.ones((b, cfg.vec_dim), jnp.bfloat16),
                                dsh)

        fwd = jax.jit(lambda img, txt, t, pooled: dit_forward(
            qp if False else qps, img, txt, t, pooled, cfg, freqs=freqs,
            attn_config={"matmul_dtype": "int8"}))
        out = fwd(img, txt, t, pooled)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = fwd(img, txt, t, pooled)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.steps
        rate = b / dt  # images (latents) per second
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * nd)
        print(f"mesh={nd:2d} (data={data} tensor={args.tensor}) "
              f"batch={b:3d}  {rate:10.2f} img/s  efficiency {eff:5.1%}",
              flush=True)


if __name__ == "__main__":
    main()
