"""Resilient training loop: periodic sharded checkpoints, resume after
restart, non-finite-loss guards.

The reference has no failure handling beyond local try/except (SURVEY §5:
"multi-host elasticity is out of scope in the reference; the TPU build
needs at minimum checkpoint-restart semantics across pod restarts").
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..utils import log

__all__ = ["fit", "latest_checkpoint_step"]


def latest_checkpoint_step(ckpt_dir: str) -> int | None:
    if not ckpt_dir or not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        if name.startswith("step_") and name[5:].isdigit():
            steps.append(int(name[5:]))
    return max(steps) if steps else None


def fit(step_fn: Callable, state: Any, num_steps: int, *,
        rng: jax.Array | None = None,
        ckpt_dir: str | None = None, save_every: int = 1000,
        keep: int = 3, on_metrics: Callable | None = None,
        max_bad_steps: int = 10) -> Any:
    """Run `state = step_fn(state, key) -> (loss, state)` for num_steps.

    * resumes from the newest ``step_N`` checkpoint under ckpt_dir;
    * saves every `save_every` steps (pruned to `keep` newest);
    * a non-finite loss skips the state update (the pre-step state is kept)
      and aborts after `max_bad_steps` consecutive bad steps.
    """
    from ..io import restore_checkpoint, save_checkpoint

    start = 0
    if ckpt_dir:
        last = latest_checkpoint_step(ckpt_dir)
        if last is not None:
            state = restore_checkpoint(
                os.path.join(ckpt_dir, f"step_{last}"), state)
            start = last
            log.info("resumed from step %d", last)
    if rng is None:
        rng = jax.random.key(0)

    bad = 0
    for step in range(start, num_steps):
        rng, key = jax.random.split(rng)
        t0 = time.perf_counter()
        loss, new_state = step_fn(state, key)
        loss_val = float(loss)
        if not jnp.isfinite(loss):
            bad += 1
            log.warning("non-finite loss at step %d (%d consecutive); "
                        "update skipped", step, bad)
            if bad >= max_bad_steps:
                raise FloatingPointError(
                    f"{bad} consecutive non-finite losses at step {step}")
            continue
        bad = 0
        state = new_state
        if on_metrics is not None:
            on_metrics(step=step, loss=loss_val,
                       step_time=time.perf_counter() - t0)
        if ckpt_dir and (step + 1) % save_every == 0:
            path = os.path.join(ckpt_dir, f"step_{step + 1}")
            save_checkpoint(path, state)
            _prune(ckpt_dir, keep)
    return state


def _prune(ckpt_dir: str, keep: int):
    import shutil
    steps = sorted(
        int(n[5:]) for n in os.listdir(ckpt_dir)
        if n.startswith("step_") and n[5:].isdigit())
    for s in steps[:-keep]:
        shutil.rmtree(os.path.join(ckpt_dir, f"step_{s}"),
                      ignore_errors=True)
