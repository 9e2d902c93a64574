"""Pipeline parallelism (GPipe-style) over layer-stacked block params.

Absent from the reference AND from its torch ecosystem story (SURVEY §2.2:
"Pipeline parallel: Absent") — implemented natively here.  The scan-stacked
block parameters (models.stack_dit_blocks / stack_llm_blocks layout) shard
their leading LAYER axis over a mesh axis; each device owns a contiguous
stage of L/P layers.  Microbatches enter stage 0, activations hop stages
via ppermute each tick, and after num_micro + P - 1 ticks every microbatch
has flowed through all layers.

The block function must be shape-preserving (x -> x), which all
single-stream transformer blocks are.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["pipeline_forward", "shard_stage_params"]


def shard_stage_params(stacked_params, mesh: Mesh, axis: str = "fsdp"):
    """Shard the leading layer axis of scan-stacked block params over
    `axis` (each device holds its stage's layers)."""
    def put(leaf):
        if not hasattr(leaf, "ndim") or leaf.ndim == 0:
            return leaf
        return jax.device_put(
            leaf, NamedSharding(mesh, P(axis, *([None] * (leaf.ndim - 1)))))
    from ..tensor import QTensor
    return jax.tree_util.tree_map(
        lambda l: jax.tree_util.tree_map(put, l)
        if isinstance(l, QTensor) else put(l),
        stacked_params, is_leaf=lambda x: isinstance(x, QTensor))


def pipeline_forward(block_fn, stacked_params, x_micro, mesh: Mesh, *,
                     axis: str = "fsdp"):
    """Run x through all L stacked layers with the layer axis sharded over
    `axis` as pipeline stages.

    block_fn(block_params, x) -> x      (single-layer forward)
    stacked_params: pytree with leading layer axis L (L % P == 0)
    x_micro: (num_micro, ...) microbatches
    Returns (num_micro, ...) outputs.
    """
    p_size = mesh.shape[axis]
    num_micro = x_micro.shape[0]
    ticks = num_micro + p_size - 1

    pspec = jax.tree_util.tree_map(
        lambda l: P(axis, *([None] * (max(getattr(l, "ndim", 1), 1) - 1))),
        stacked_params)
    xspec = P(*([None] * x_micro.ndim))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(pspec, xspec), out_specs=xspec)
    def _pipe(params_local, xs):
        stage = jax.lax.axis_index(axis)
        mb_shape = xs.shape[1:]
        buf = jnp.zeros(mb_shape, xs.dtype)
        outputs = jnp.zeros_like(xs)
        perm = [(i, (i + 1) % p_size) for i in range(p_size)]

        def layers_fn(x):
            def body(x, blk):
                return block_fn(blk, x), None
            x, _ = jax.lax.scan(body, x, params_local)
            return x

        def tick(carry, t):
            buf, outputs = carry
            # stage 0 ingests microbatch t (when in range)
            feed = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, num_micro - 1), axis=0, keepdims=False)
            x_in = jnp.where(stage == 0, feed, buf)
            y = layers_fn(x_in)
            # last stage emits microbatch t - (P - 1)
            out_idx = jnp.clip(t - (p_size - 1), 0, num_micro - 1)
            emit = jnp.logical_and(stage == p_size - 1,
                                   t >= p_size - 1)
            outputs = jax.lax.cond(
                emit,
                lambda o: jax.lax.dynamic_update_index_in_dim(
                    o, y, out_idx, axis=0),
                lambda o: o, outputs)
            buf = jax.lax.ppermute(y, axis, perm)
            return (buf, outputs), None

        (buf, outputs), _ = jax.lax.scan(
            tick, (jax.lax.pcast(buf, axis, to='varying'),
             jax.lax.pcast(outputs, axis, to='varying')),
            jnp.arange(ticks))
        # only the last stage holds real outputs; broadcast them
        outputs = jax.lax.psum(
            jnp.where(stage == p_size - 1, outputs, 0.0), axis)
        return outputs

    with jax.set_mesh(mesh):
        return _pipe(stacked_params, x_micro)
