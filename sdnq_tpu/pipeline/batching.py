"""Continuous batching for diffusion denoise loops.

vLLM-style slot scheduling adapted to diffusion (BASELINE north star:
"diffusion denoising batches continuously scheduled across hosts"): the
chip always runs a full fixed-shape batch of model steps, but each slot
carries its own latent, conditioning, and timestep index.  When a slot's
denoise trajectory completes, its image is emitted and a queued request is
admitted into the slot mid-flight — no pipeline drain, no recompilation
(shapes are static; per-slot timesteps are data).

Multi-chip/multi-host: pass a `mesh` — the slot axis is sharded over the
`data` mesh axis with NamedSharding, so the jitted step runs SPMD with each
device owning num_slots/P slots and admission writes land on the owning
shard.  The admission schedule is a deterministic function of the request
queue, so in a true multi-host (one-process-per-host) deployment every
host replays the same decisions and the single-controller program stays
coherent — the same contract as process-0 scheduling with broadcast, but
with no extra collective.  Utilization accounting (`efficiency`) reports
useful slot-steps over total slot-steps to quantify batching quality at
any device count.
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Request", "ContinuousBatcher"]


@dataclasses.dataclass
class Request:
    request_id: int
    cond: Any                 # conditioning pytree (text embeddings, ...)
    num_steps: int
    rng_seed: int = 0
    result: Any = None


class ContinuousBatcher:
    """Host-side slot scheduler around a jitted per-step function.

    step_fn(latents, cond, t_idx, active) -> new_latents
      latents: (S, ...) slot-stacked; cond: slot-stacked pytree;
      t_idx: (S,) int32 per-slot step index; active: (S,) bool.
    The function must treat inactive slots as no-ops (mask or harmless
    compute — the batcher ignores their outputs).
    """

    def __init__(self, step_fn: Callable, init_latent_fn: Callable,
                 num_slots: int, num_steps_max: int, *,
                 mesh=None, data_axis: str = "data"):
        self.step_fn = step_fn
        self.init_latent_fn = init_latent_fn
        self.num_slots = num_slots
        self.num_steps_max = num_steps_max
        self.mesh = mesh
        self.data_axis = data_axis
        self._sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            if num_slots % mesh.shape[data_axis] != 0:
                raise ValueError(
                    f"num_slots={num_slots} must divide over "
                    f"{data_axis}={mesh.shape[data_axis]}")
            self._sharding = lambda ndim: NamedSharding(
                mesh, PartitionSpec(data_axis, *([None] * (ndim - 1))))
        self.queue: deque[Request] = deque()
        self.slots: list[Request | None] = [None] * num_slots
        self.latents = None
        self.cond = None
        self.t_idx = np.zeros((num_slots,), np.int32)
        self.steps_left = np.zeros((num_slots,), np.int32)
        self.completed: list[Request] = []
        self._fetch_fn = None
        self.total_slot_steps = 0
        self.active_slot_steps = 0

    @property
    def efficiency(self) -> float:
        """Useful slot-steps / total slot-steps over the run so far."""
        return (self.active_slot_steps / self.total_slot_steps
                if self.total_slot_steps else 0.0)

    def _alloc(self, lat, cond):
        shape = (self.num_slots,) + lat.shape
        z = jnp.zeros(shape, lat.dtype)
        zc = jax.tree_util.tree_map(
            lambda c: jnp.zeros((self.num_slots,) + c.shape, c.dtype), cond)
        if self._sharding is not None:
            z = jax.device_put(z, self._sharding(z.ndim))
            zc = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, self._sharding(a.ndim)), zc)
        return z, zc

    def submit(self, req: Request):
        self.queue.append(req)

    def _admit(self):
        changed = False
        for s in range(self.num_slots):
            if self.slots[s] is None and self.queue:
                req = self.queue.popleft()
                self.slots[s] = req
                lat = self.init_latent_fn(req)
                if self.latents is None:
                    self.latents, self.cond = self._alloc(lat, req.cond)
                self.latents = self.latents.at[s].set(lat)
                self.cond = jax.tree_util.tree_map(
                    lambda full, c: full.at[s].set(c), self.cond, req.cond)
                self.t_idx[s] = 0
                self.steps_left[s] = req.num_steps
                changed = True
        return changed

    @property
    def busy(self) -> bool:
        return bool(self.queue) or any(s is not None for s in self.slots)

    def _fetch_slot(self, s: int) -> np.ndarray:
        """Read one slot's latent back to the host.  Under true
        multi-process SPMD the slot axis is sharded across processes, so
        the raw array is not fully addressable: replicate the one slot
        (a tiny all-gather over the data axis) before the host read.
        Every process executes the same fetch, keeping the
        single-controller program identical on all hosts."""
        if self.mesh is not None and jax.process_count() > 1:
            from jax.sharding import NamedSharding, PartitionSpec
            rep = NamedSharding(self.mesh, PartitionSpec())
            if self._fetch_fn is None:
                self._fetch_fn = jax.jit(lambda l, i: l[i],
                                         out_shardings=rep)
            return np.asarray(self._fetch_fn(self.latents, s))
        return np.asarray(self.latents[s])

    def run(self, max_iterations: int = 100000):
        """Drain the queue; returns completed requests in finish order."""
        it = 0
        while self.busy and it < max_iterations:
            it += 1
            self._admit()
            active = np.array([s is not None for s in self.slots])
            if not active.any():
                break
            self.latents = self.step_fn(
                self.latents, self.cond,
                jnp.asarray(self.t_idx), jnp.asarray(active))
            self.t_idx += active.astype(np.int32)
            self.steps_left -= active.astype(np.int32)
            self.total_slot_steps += self.num_slots
            self.active_slot_steps += int(active.sum())
            for s in range(self.num_slots):
                if self.slots[s] is not None and self.steps_left[s] <= 0:
                    req = self.slots[s]
                    req.result = self._fetch_slot(s)
                    self.completed.append(req)
                    self.slots[s] = None
        return self.completed
