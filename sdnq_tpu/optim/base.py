"""Quantized-state optimizer machinery.

Re-design of the reference's SDNQOptimizer base
(/root/reference/src/sdnq/optim/optimizer.py:12-207, utils.py:7-166) as
functional JAX transforms: each optimizer is (init, update) over pytrees
whose *parameters* may be QTensor/TrainQTensor and whose *moment buffers*
are themselves SDNQ-quantized (int8 group-wise) when large enough.

Covered capabilities: nan-scrubbed grads, grad clipping, quantized moment
buffers with stochastic-rounded writes, Kahan compensation on the parameter
write, cautious masking, the final-norm modes
(none/clip/rms/rms_clip/relative), decoupled weight decay.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..tensor import QTensor, dequantize

__all__ = ["QOptimizer", "OptConfig", "quantize_buffer",
           "dequantize_buffer", "update_buffer_lerp", "apply_norm_to_update",
           "scrub_grad", "cautious_mask", "BufferQ",
           "offload_opt_state", "fetch_opt_state",
           "cast_state_for_transfer", "cast_state_from_transfer"]

# moment buffers smaller than this stay fp32 (reference: optim gate by numel)
MIN_QUANT_BUFFER_NUMEL = 16384
BUFFER_GROUP = 256


@dataclasses.dataclass
class OptConfig:
    lr: float = 1e-4
    weight_decay: float = 0.0
    eps: float = 1e-8
    grad_clip: float | None = None
    final_norm_mode: str = "none"   # none|clip|rms|rms_clip|relative
    use_cautious: bool = False
    use_kahan: bool = True
    quantize_state: bool = True
    state_fmt: str = "int8"
    stochastic_rounding: bool = True


class QOptimizer(NamedTuple):
    init: Callable
    update: Callable  # (grads, state, params, rng) -> (new_params, state)


@partial(jax.tree_util.register_dataclass,
         data_fields=["qdata", "scale"], meta_fields=["shape", "unsigned"])
@dataclasses.dataclass
class BufferQ:
    """Int8 group-quantized optimizer buffer (flat groups of 256)."""
    qdata: jax.Array      # (n_groups, 256) int8
    scale: jax.Array      # (n_groups, 1) f32
    shape: tuple
    unsigned: bool


# Moment buffers use 8-bit MICROFLOAT codes, not linear int8: second moments
# span many orders of magnitude within a group, and a linear grid collapses
# the small entries to zero -> m/(sqrt(0)+eps) explodes the update.  The
# e4m4fnu / e4m3 grids keep ~2^-11 relative resolution (the same reasoning
# as bitsandbytes' dynamic 8-bit Adam states, built from our own codec).
_FMT_UNSIGNED = "float8_e4m4fnu"
_FMT_SIGNED = "float8_e4m3fn_sdnq"


def quantize_buffer(x: jax.Array, rng=None, unsigned: bool = False):
    from ..formats import get_format
    from ..packing import encode_float

    numel = x.size
    if numel < MIN_QUANT_BUFFER_NUMEL or numel % BUFFER_GROUP != 0:
        return x
    fmt = get_format(_FMT_UNSIGNED if unsigned else _FMT_SIGNED)
    flat = x.reshape(-1, BUFFER_GROUP).astype(jnp.float32)
    amax = jnp.max(jnp.abs(flat), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / fmt.max, 2.0 ** -126)
    v = jnp.clip(flat / scale, fmt.min, fmt.max)
    sr_bits = None
    if rng is not None:
        sr_bits = jax.random.bits(rng, v.shape, jnp.uint32)
    codes = encode_float(v, fmt, sr_bits=sr_bits).astype(jnp.uint8)
    return BufferQ(qdata=codes, scale=scale, shape=tuple(x.shape),
                   unsigned=unsigned)


def dequantize_buffer(b) -> jax.Array:
    if isinstance(b, BufferQ):
        from ..formats import get_format
        from ..packing import decode_float
        fmt = get_format(_FMT_UNSIGNED if b.unsigned else _FMT_SIGNED)
        flat = decode_float(b.qdata.astype(jnp.int32), fmt) * b.scale
        return flat.reshape(b.shape)
    return b


def update_buffer_lerp(buf, new_value: jax.Array, beta: float, rng=None):
    """buf <- beta*buf + (1-beta)*new  with dequant->lerp->requant for
    quantized buffers (reference optim/utils.py:98-113)."""
    cur = dequantize_buffer(buf)
    nxt = beta * cur + (1.0 - beta) * new_value.astype(jnp.float32)
    if isinstance(buf, BufferQ):
        return quantize_buffer(nxt, rng=rng, unsigned=buf.unsigned), nxt
    return nxt, nxt


def scrub_grad(g: jax.Array, clip: float | None,
               grad_scale: jax.Array | float | None = None) -> jax.Array:
    """nan-scrub + optional AMP grad-scale divide + clip
    (reference optim/utils.py:7-25)."""
    g = jnp.nan_to_num(g.astype(jnp.float32))
    if grad_scale is not None:
        g = g / jnp.asarray(grad_scale, jnp.float32)
    if clip is not None:
        norm = jnp.sqrt(jnp.sum(jnp.square(g)) + 1e-12)
        g = g * jnp.minimum(1.0, clip / norm)
    return g


def cautious_mask(update: jax.Array, grad: jax.Array) -> jax.Array:
    """Zero update components whose sign disagrees with the gradient,
    rescaled to preserve mean magnitude (cautious optimizers;
    reference optim/utils.py:27-71)."""
    mask = (update * grad > 0).astype(update.dtype)
    mask = mask / jnp.maximum(mask.mean(), 1e-3)
    return update * mask


def apply_norm_to_update(update: jax.Array, param_norm: jax.Array,
                         mode: str) -> jax.Array:
    """Final-norm modes (reference optim/utils.py:116-166)."""
    if mode in (None, "none"):
        return update
    rms = jnp.sqrt(jnp.mean(jnp.square(update)) + 1e-12)
    if mode == "rms":
        return update / jnp.maximum(rms, 1.0)
    if mode == "rms_clip":
        return update / jnp.maximum(rms, 1e-12) * jnp.minimum(rms, 1.0)
    if mode == "clip":
        norm = jnp.sqrt(jnp.sum(jnp.square(update)) + 1e-12)
        return update * jnp.minimum(1.0, 1.0 / norm)
    if mode == "relative":
        return update * jnp.maximum(param_norm, 1e-3)
    if mode == "rms_scaled":
        # normalize update RMS to 0.2 (reference: rms w/ clip*0.2)
        return update * (0.2 / jnp.maximum(rms, 1e-12))
    if mode == "rms_clip_scaled":
        # only ever shrink, to RMS <= 0.2 (reference: rms_clip w/ clip*0.2)
        return update * jnp.minimum(0.2 / jnp.maximum(rms, 1e-12), 1.0)
    if mode == "muon":
        rows = update.shape[0] if update.ndim else 1
        cols = max(1, update.size // max(rows, 1))
        return update * (max(1.0, rows / cols) ** 0.5)
    return update


# ---------------------------------------------------------------------------
# Host-offload staging + transfer casting (the TPU analogue of the
# reference's CPU offload, optim/optimizer.py:34-36 + utils.py:152-166, and
# its 16-bit-transfer state-dict load, optimizer.py:139-207).
# ---------------------------------------------------------------------------

def _put_memory_kind(x, memory_kind: str):
    if isinstance(x, BufferQ):
        return BufferQ(qdata=_put_memory_kind(x.qdata, memory_kind),
                       scale=_put_memory_kind(x.scale, memory_kind),
                       shape=x.shape, unsigned=x.unsigned)
    if not hasattr(x, "sharding"):
        return x
    try:
        return jax.device_put(x, x.sharding.with_memory_kind(memory_kind))
    except (ValueError, NotImplementedError, AttributeError):
        return x  # backend without memories support (e.g. CPU): no-op


def _map_buffers(state, fn):
    """Apply `fn` to every moment-buffer leaf, skipping `kahan` entries
    (they must stay on device in their bf16 storage dtype)."""
    is_leaf = lambda x: isinstance(x, BufferQ)  # noqa: E731
    per = [
        st if st is None else {
            k: (v if k == "kahan"
                else jax.tree_util.tree_map(fn, v, is_leaf=is_leaf))
            for k, v in st.items()
        }
        for st in state["per_param"]
    ]
    return {**state, "per_param": per}


def offload_opt_state(state, memory_kind: str = "pinned_host"):
    """Stage optimizer moment buffers in host memory between steps.

    Moment buffers are only read/written inside the update step; parking
    them in pinned host memory frees HBM for activations at the cost of a
    PCIe/host transfer per step, which XLA overlaps with compute when the
    update is donated.  Kahan buffers stay on device, mirroring the
    reference's `key != "kahan_buffer"` exclusion (utils.py:152-160)."""
    return _map_buffers(state, lambda a: _put_memory_kind(a, memory_kind))


def fetch_opt_state(state):
    """Bring offloaded buffers back to device memory."""
    return _map_buffers(state, lambda a: _put_memory_kind(a, "device"))


def cast_state_for_transfer(state, dtype=jnp.bfloat16):
    """Cast fp32 moment buffers to a 16-bit transfer dtype (checkpoint /
    host-transfer size), reversed by ``cast_state_from_transfer`` — the
    reference's 16-bit-transfer-then-fp32-cast load path
    (optim/optimizer.py:139-207).  Quantized (BufferQ) leaves, integer
    leaves, and the step counter are left untouched."""
    def cast(x):
        if isinstance(x, BufferQ):
            return x
        if hasattr(x, "dtype") and x.dtype == jnp.float32 and x.ndim > 0:
            return x.astype(dtype)
        return x
    return _map_buffers(state, cast)


def cast_state_from_transfer(state):
    def cast(x):
        if isinstance(x, BufferQ):
            return x
        if hasattr(x, "dtype") and x.dtype in (jnp.bfloat16, jnp.float16):
            return x.astype(jnp.float32)
        return x
    return _map_buffers(state, cast)


def param_value(p):
    from ..train.matmul import TrainQTensor
    if isinstance(p, TrainQTensor):
        p = p.qt
    if isinstance(p, QTensor):
        return dequantize(p, jnp.float32)
    return p.astype(jnp.float32) if hasattr(p, "astype") else p
