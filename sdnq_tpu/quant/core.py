"""Pure-functional quantization math.

Numerics mirror the reference's ``quant_utils.py`` (scale rules at
/root/reference/src/sdnq/quant_utils.py:12-54, activation quantizers at
:199-233) re-designed as pure JAX functions: no in-place ops, explicit
`jax.random` keys for stochastic rounding, everything jit-traceable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..formats import Format, get_format
from ..packing import encode_float, decode_float

__all__ = [
    "get_scale_symmetric",
    "get_scale_asymmetric",
    "quantize_weight",
    "dequantize_values",
    "quantize_int_mm",
    "quantize_uint_mm",
    "quantize_fp_mm",
]

# Guard against all-zero groups producing scale == 0 -> NaN. The reference
# relies on torch's inf/nan_to_num behaviour; a tiny floor is cleaner and
# changes nothing for real weights.
_SCALE_EPS = np.float32(2.0 ** -126)


def get_scale_symmetric(w: jax.Array, axis, fmt: Format) -> jax.Array:
    """absmax / qmax along `axis` (keepdims). reference: quant_utils.py:21-22."""
    amax = jnp.max(jnp.abs(w), axis=axis, keepdims=True)
    return jnp.maximum(amax / np.float32(fmt.max), _SCALE_EPS)


def get_scale_asymmetric(w: jax.Array, axis, fmt: Format):
    """(scale, zero_point) for unsigned/asymmetric storage.

    scale = (max-min)/(qmax-qmin); zero_point = min - scale*qmin (= min for
    uint formats whose qmin == 0). reference: quant_utils.py:12-17."""
    wmin = jnp.min(w, axis=axis, keepdims=True)
    wmax = jnp.max(w, axis=axis, keepdims=True)
    scale = jnp.maximum((wmax - wmin) / np.float32(fmt.max - fmt.min), _SCALE_EPS)
    zero_point = wmin - scale * np.float32(fmt.min)
    return scale, zero_point


def _stochastic_int_round(x: jax.Array, key: jax.Array) -> jax.Array:
    # Reference parity: add 0.1 * N(0,1) jitter then round
    # (quant_utils.py:44-46).
    return jnp.round(x + 0.1 * jax.random.normal(key, x.shape, x.dtype))


def quantize_weight(
    w: jax.Array,
    fmt: Format | str,
    axis=-1,
    *,
    scale_dtype=None,
    rng: jax.Array | None = None,
):
    """Quantize `w` to `fmt` with per-`axis` scales.

    Returns ``(q, scale, zero_point)`` where `q` holds quantized values in
    the format's working dtype — integer formats as integers (storage
    dtype), float formats as fp32 values constrained to the format grid —
    and `zero_point` is None for symmetric (signed) formats.
    """
    if isinstance(fmt, str):
        fmt = get_format(fmt)
    w = w.astype(jnp.float32)

    if fmt.is_unsigned:
        scale, zero_point = get_scale_asymmetric(w, axis, fmt)
        if scale_dtype is not None:
            scale = scale.astype(scale_dtype).astype(jnp.float32)
            zero_point = zero_point.astype(scale_dtype).astype(jnp.float32)
        q = (w - zero_point) / scale
    else:
        scale = get_scale_symmetric(w, axis, fmt)
        if scale_dtype is not None:
            scale = scale.astype(scale_dtype).astype(jnp.float32)
        zero_point = None
        q = w / scale

    if fmt.is_integer:
        if rng is not None:
            q = _stochastic_int_round(q, rng)
        else:
            q = jnp.round(q)
        q = jnp.clip(q, fmt.min, fmt.max)
        q = q.astype(fmt.jnp_storage if not fmt.is_packed else jnp.int32)
    else:
        q = jnp.nan_to_num(jnp.clip(q, fmt.min, fmt.max))
        if fmt.is_packed:
            sr_bits = None
            if rng is not None:
                sr_bits = jax.random.bits(rng, q.shape, jnp.uint32)
            q = decode_float(encode_float(q, fmt, sr_bits=sr_bits), fmt)
        else:
            q = q.astype(fmt.jnp_storage)

    if scale_dtype is not None:
        scale = scale.astype(scale_dtype)
        if zero_point is not None:
            zero_point = zero_point.astype(scale_dtype)
    return q, scale, zero_point


def dequantize_values(q: jax.Array, scale: jax.Array,
                      zero_point: jax.Array | None = None,
                      dtype=jnp.float32) -> jax.Array:
    """q * scale (+ zero_point). Scales broadcast against q."""
    out = q.astype(scale.dtype) * scale
    if zero_point is not None:
        out = out + zero_point
    return out.astype(dtype)


# ---------------------------------------------------------------------------
# Activation / on-the-fly matmul-operand quantizers
# (reference: quant_utils.py:199-233).
# ---------------------------------------------------------------------------

def quantize_int_mm(x: jax.Array, axis=-1, fmt: Format | str = "int8",
                    rng: jax.Array | None = None):
    if isinstance(fmt, str):
        fmt = get_format(fmt)
    x = x.astype(jnp.float32)
    scale = get_scale_symmetric(x, axis, fmt)
    q = x / scale
    if rng is not None:
        q = _stochastic_int_round(q, rng)
    else:
        q = jnp.round(q)
    q = jnp.clip(q, fmt.min, fmt.max).astype(jnp.int8)
    return q, scale


def quantize_uint_mm(x: jax.Array, axis=-1, fmt: Format | str = "uint8",
                     rng: jax.Array | None = None):
    if isinstance(fmt, str):
        fmt = get_format(fmt)
    # Asymmetric quantization against the *signed* range of the same width,
    # matching the reference's removeprefix("u") trick
    # (quant_utils.py:211-220): uint8 activations are stored in int8 after
    # an xor-128 shift so they can feed the int8 MXU.
    signed_fmt = get_format(f"int{fmt.num_bits}")
    x = x.astype(jnp.float32)
    scale, zero_point = get_scale_asymmetric(x, axis, signed_fmt)
    q = (x - zero_point) / scale
    if rng is not None:
        q = _stochastic_int_round(q, rng)
    else:
        q = jnp.round(q)
    q = jnp.clip(q, signed_fmt.min, signed_fmt.max).astype(jnp.int8)
    return q, scale, zero_point


def quantize_fp_mm(x: jax.Array, axis=-1, fmt: Format | str = "float8_e4m3fn",
                   rng: jax.Array | None = None):
    if isinstance(fmt, str):
        fmt = get_format(fmt)
    x = x.astype(jnp.float32)
    scale = get_scale_symmetric(x, axis, fmt)
    q = x / scale
    if rng is not None:
        bits = jax.random.bits(rng, q.shape, jnp.uint32)
        shift = 23 - fmt.mantissa
        iq = jax.lax.bitcast_convert_type(q, jnp.int32)
        iq = (iq + (bits % jnp.uint32(1 << shift)).astype(jnp.int32)) & jnp.int32(
            -(1 << shift))
        q = jax.lax.bitcast_convert_type(iq, jnp.float32)
    q = jnp.nan_to_num(jnp.clip(q, fmt.min, fmt.max))
    return q.astype(fmt.jnp_storage), scale
