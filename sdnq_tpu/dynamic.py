"""Dynamic per-layer format selection.

The reference's MSE ladder (/root/reference/src/sdnq/quantizer.py:264-398):
walk the accuracy-ordered dtype ladder upward from the requested format
until the normalized quantization loss
``mse(W, dequant(quant(W))) / var(W)`` drops below the per-bitwidth
threshold ``10^(-bits/2)``.

TPU note (SURVEY §7 hard-part 4): the ladder is data-dependent Python
control flow, so it runs at *quantize time* on host-side values — the
resulting heterogeneous pytree (different layers carrying different static
formats) then specializes the jitted forward per layer at trace time.
Hadamard/SVD are computed once and reused across ladder steps, like the
reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import QuantConfig
from .formats import (
    WEIGHTS_DTYPE_ORDER,
    default_matmul_format,
    get_format,
    resolve_alias,
)
from .tensor import QTensor, quantize_tensor, dequantize

__all__ = ["quantize_tensor_dynamic", "quantization_loss"]


def quantization_loss(w: jax.Array, qt: QTensor) -> float:
    """Normalized MSE of the round-trip (reference: quantizer.py:367-380)."""
    deq = dequantize(qt, dtype=jnp.float32)
    w = w.astype(jnp.float32)
    var = jnp.maximum(jnp.var(w), 1e-8)
    return float(jnp.mean(jnp.square(deq - w)) / var)


def _matmul_combo_valid(weights_fmt: str, matmul_fmt: str,
                        requested_fmt: str) -> bool:
    """Format/matmul compatibility rules (reference: quantizer.py:326-338)."""
    wf, mf = get_format(weights_fmt), get_format(matmul_fmt)
    rf = get_format(requested_fmt)
    if mf.is_integer and not wf.is_integer:
        return False
    if (wf.num_bits == mf.num_bits and wf.is_unsigned and not mf.is_integer):
        return False
    if rf.num_bits <= mf.num_bits and wf.num_bits > mf.num_bits:
        return False
    return True


def quantize_tensor_dynamic(
    w: jax.Array,
    layer_kind: str = "linear",
    *,
    fmt: str = "uint4",
    matmul_fmt: str | None = None,
    dynamic_loss_threshold: float | None = None,
    config: QuantConfig | None = None,
    param_name: str | None = None,
    rng: jax.Array | None = None,
    **kwargs,
) -> QTensor | None:
    """Walk the format ladder from `fmt` upward; return the first QTensor
    whose normalized loss is within threshold, or None if even the widest
    format fails (layer left unquantized, reference: quantizer.py:393-398)."""
    start = resolve_alias(fmt)
    if dynamic_loss_threshold is None or dynamic_loss_threshold < 0:
        dynamic_loss_threshold = 10.0 ** -(get_format(start).num_bits / 2)

    w32 = w.astype(jnp.float32)
    requested_matmul = matmul_fmt
    use_quantized_matmul = kwargs.pop("use_quantized_matmul", False)

    # Pre-compute Hadamard rotation and SVD factors ONCE and reuse across
    # ladder steps (reference: quantizer.py:296-313) — svd_lowrank per step
    # would dominate quantize time.
    use_hadamard = kwargs.pop("use_hadamard", False)
    use_svd = kwargs.pop("use_svd", False)
    hadamard_group_size = kwargs.pop("hadamard_group_size", 256)
    svd_rank = kwargs.pop("svd_rank", 32)
    svd_steps = kwargs.pop("svd_steps", 8)
    pre = w32
    pre_svd_up = pre_svd_down = None
    if use_hadamard:
        from .quant.hadamard import apply_hadamard
        pre, use_hadamard, hadamard_group_size = apply_hadamard(
            pre, hadamard_group_size,
            is_conv=(layer_kind == "conv" and pre.ndim > 2))
    if use_svd and pre.ndim >= 2 and layer_kind != "conv_transpose":
        from .quant.svd import apply_svdquant
        dd = kwargs.get("dequant_dtype", "bfloat16")
        pre, pre_svd_up, pre_svd_down = apply_svdquant(
            pre, rank=svd_rank, niter=svd_steps,
            key=rng if rng is not None else jax.random.key(0))
        pre_svd_up = pre_svd_up.astype(jnp.dtype(dd))
        pre_svd_down = pre_svd_down.astype(jnp.dtype(dd))

    try:
        start_idx = WEIGHTS_DTYPE_ORDER.index(start)
    except ValueError:
        start_idx = 0

    import dataclasses as _dc
    for name in WEIGHTS_DTYPE_ORDER[start_idx:]:
        mm = requested_matmul or default_matmul_format(name)
        cur_use_mm = use_quantized_matmul and _matmul_combo_valid(
            name, mm, start)
        qt = quantize_tensor(
            pre, name, layer_kind,
            matmul_fmt=mm,
            use_quantized_matmul=cur_use_mm,
            use_hadamard=False,
            use_svd=False,
            svd_precomputed=pre_svd_up is not None,
            hadamard_group_size=hadamard_group_size,
            svd_rank=svd_rank,
            svd_steps=svd_steps,
            rng=rng,
            **kwargs,
        )
        if pre_svd_up is not None or use_hadamard:
            qt = QTensor(
                qdata=qt.qdata, scale=qt.scale, zero_point=qt.zero_point,
                svd_up=pre_svd_up, svd_down=pre_svd_down,
                meta=_dc.replace(
                    qt.meta,
                    use_hadamard=bool(use_hadamard),
                    hadamard_group_size=hadamard_group_size,
                    svd_rank=svd_rank if pre_svd_up is not None else 0,
                ),
            )
        loss = quantization_loss(w32, qt)
        if loss <= dynamic_loss_threshold:
            if (config is not None and param_name is not None
                    and use_quantized_matmul and not cur_use_mm):
                if not any(param_name == p
                           for p in config.modules_to_not_use_matmul):
                    config.modules_to_not_use_matmul.append(param_name)
            return qt
    return None
