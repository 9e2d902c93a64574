"""GPipe pipeline parallelism tests on the CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from sdnq_tpu import quantize_tensor, qlinear
from sdnq_tpu.parallel import create_mesh, pipeline_forward, \
    shard_stage_params


def test_pipeline_matches_sequential():
    mesh = create_mesh(fsdp=4)
    L, d = 8, 64
    rng = np.random.default_rng(0)
    ws = jnp.asarray(rng.normal(size=(L, d, d)).astype(np.float32) * 0.1)
    params = {"w": ws}

    def block_fn(blk, x):
        return jnp.tanh(x @ blk["w"].T)

    x_micro = jnp.asarray(rng.normal(size=(6, 4, d)).astype(np.float32))

    # sequential reference
    def seq(x):
        for i in range(L):
            x = block_fn({"w": ws[i]}, x)
        return x
    ref = jnp.stack([seq(x_micro[i]) for i in range(6)])

    sharded = shard_stage_params(params, mesh)
    out = pipeline_forward(block_fn, sharded, x_micro, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_with_quantized_blocks():
    mesh = create_mesh(fsdp=2)
    L, d = 4, 128
    rng = np.random.default_rng(1)
    ws = [jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.1)
          for _ in range(L)]
    qts = [quantize_tensor(w, "int8") for w in ws]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *qts)
    params = {"w": stacked}

    def block_fn(blk, x):
        return jax.nn.gelu(qlinear(x, blk["w"], out_dtype=jnp.float32))

    x_micro = jnp.asarray(rng.normal(size=(4, 8, d)).astype(np.float32))

    def seq(x):
        for i in range(L):
            x = block_fn({"w": qts[i]}, x)
        return x
    ref = jnp.stack([seq(x_micro[i]) for i in range(4)])

    sharded = shard_stage_params(params, mesh)
    out = pipeline_forward(block_fn, sharded, x_micro, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
