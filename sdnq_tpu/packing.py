"""Bit-packing codecs for sub-byte / non-hardware-width storage.

Covers the capability of the reference's ``packed_int/`` and
``packed_float.py`` (closed-form per-width shift/mask packing,
/root/reference/src/sdnq/packed_int/pack.py, packed_float.py:25-129) with a
different, TPU-first design: a single **bit-plane layout** for every width
1..16 instead of 15 hand-written layouts.

Layout
------
For a k-bit format, the last axis of the code array (length C, padded to a
multiple of 8) is stored as k bit-planes of C/8 bytes each, concatenated
along the last axis into one uint8 array of shape ``(..., k * C/8)``, in
**segment-major (transposed) order**:

    plane j, byte b, bit i  ==  bit j of code[..., i * C/8 + b]

i.e. the row is split into 8 segments of C/8 values; segment i lives in bit
position i across the full byte row.  Unpacking segment i of a tile is then
``((plane_j >> i) & 1) << j`` summed over planes — pure lane-wise shift/mask
with NO reshape or interleave, which is exactly what Mosaic can vectorize
inside a Pallas matmul prologue (an interleaved ``8*b + i`` layout would
need an unsupported (N, C/8, 8) -> (N, C) shape cast in-kernel).

This is exactly k bits/value (as tight as the reference), one code path for
all widths 1..16.  Signed integers are stored offset-binary (``x - min``)
like the reference (packed_int/__init__.py).

Float codes use the generic finite-minifloat codec below (sign | exponent |
mantissa fields, RTNE on encode, subnormals flush to scaled-linear).  The
representable grid is bit-identical to the reference's codec
(packed_float.py:25-129, cross-checked in tests/test_reference_parity.py);
rounding of off-grid values is a deliberate improvement — the reference
inspects only the top 4 truncated mantissa bits with a round-half-down
rule (packed_float.py:40-47), we do true round-to-nearest-even, which is
never farther from the input.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .formats import Format

__all__ = [
    "pad_to_multiple",
    "pack_codes",
    "unpack_codes",
    "pack_codes_halfsplit",
    "unpack_codes_halfsplit",
    "encode_float",
    "decode_float",
    "pack",
    "unpack",
]


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def pack_codes(codes: jax.Array, num_bits: int) -> jax.Array:
    """Pack non-negative integer codes (< 2**num_bits) into segment-major
    bit-planes (see module docstring).

    codes: integer array (..., C). Returns uint8 (..., num_bits * ceil(C/8)).
    """
    c = codes.shape[-1]
    cpad = pad_to_multiple(c, 8)
    codes = codes.astype(jnp.uint32)
    if cpad != c:
        codes = jnp.pad(codes, [(0, 0)] * (codes.ndim - 1) + [(0, cpad - c)])
    # segment-major: (..., 8 segments, C/8)
    segs = codes.reshape(*codes.shape[:-1], 8, cpad // 8)
    planes = []
    for j in range(num_bits):
        bits = (segs >> j) & 1                       # (..., 8, C/8)
        byte = jnp.zeros(segs.shape[:-2] + (cpad // 8,), jnp.uint32)
        for i in range(8):
            byte = byte | (bits[..., i, :] << i)
        planes.append(byte.astype(jnp.uint8))        # (..., C/8)
    return jnp.concatenate(planes, axis=-1)


def halfsplit_planes(num_bits: int) -> list[tuple[int, int]]:
    """Field-plane decomposition of a code width for the half-split layout:
    the set bits of ``num_bits`` in {8, 4, 2, 1}, MSB-first, as
    ``(width, shift)`` pairs.  6-bit codes (e.g. float6) split into a 4-bit
    plane of ``code >> 2`` and a 2-bit plane of ``code & 3``; every plane's
    width divides 8 so its decode stays one shift+mask per value."""
    planes, shift = [], num_bits
    for w in (8, 4, 2, 1):
        if num_bits & w:
            shift -= w
            planes.append((w, shift))
    return planes


def pack_codes_halfsplit(codes: jax.Array, num_bits: int) -> jax.Array:
    """Half-split byte layout for widths 1..8.

    For a width that divides 8: byte b packs codes ``[b, b + C/p,
    b + 2C/p, ...]`` in ascending bit fields, p = 8/num_bits values per
    byte — field t of byte b is ``code[t * C/p + b]``.  Decoding field t of
    the whole row is ONE shift+mask over the byte array — ~1 VPU op per
    value, vs ~2*num_bits for the bit-plane layout.  Widths 3/5/6/7 store
    the binary decomposition of the code's bit-fields as separate
    half-split planes concatenated along the last axis (6 = 4+2:
    ``code >> 2`` in a 4-bit plane, ``code & 3`` in a 2-bit plane) —
    still exactly ``num_bits`` bits/value, decode = one shift+mask per
    plane + one shift-or to recombine.  This is the *matmul layout* for
    low-bit weights: on v5e the VPU:HBM ratio (~2.4 ops per HBM byte)
    makes the decode, not the read, the small-batch bottleneck, so the
    weight-only kernel's win hinges on minimal per-value decode (see
    kernels/dequant_mm.py group-dot path).  The reference's
    prepare_weight_for_matmul plays the same storage-vs-matmul-layout
    role (quant_utils.py:187).

    codes: (..., C) non-negative ints < 2**num_bits, C % (8/min_width) == 0.
    Returns uint8 (..., C * num_bits / 8).
    """
    assert 1 <= num_bits <= 8, num_bits
    c = codes.shape[-1]
    codes = codes.astype(jnp.uint32)
    outs = []
    for w, shift in halfsplit_planes(num_bits):
        field = (codes >> shift) & ((1 << w) - 1)
        p = 8 // w
        assert c % p == 0, (c, p)
        seg = c // p
        parts = field.reshape(*codes.shape[:-1], p, seg)
        byte = jnp.zeros(codes.shape[:-1] + (seg,), jnp.uint32)
        for t in range(p):
            byte = byte | (parts[..., t, :] << (w * t))
        outs.append(byte.astype(jnp.uint8))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)


def unpack_codes_halfsplit(packed: jax.Array, num_bits: int,
                           c: int, out_dtype=jnp.int32) -> jax.Array:
    """Inverse of :func:`pack_codes_halfsplit`."""
    code = None
    off = 0
    for w, shift in halfsplit_planes(num_bits):
        p = 8 // w
        seg = c // p
        b = packed[..., off:off + seg].astype(out_dtype)
        off += seg
        mask = (1 << w) - 1
        parts = [(b >> (w * t)) & mask for t in range(p)]
        field = jnp.concatenate(parts, axis=-1)[..., :c] << shift
        code = field if code is None else code | field
    return code


def unpack_codes(packed: jax.Array, num_bits: int, c: int,
                 out_dtype=jnp.int32) -> jax.Array:
    """Inverse of :func:`pack_codes`. Returns (..., c) array of codes."""
    cpad = pad_to_multiple(c, 8)
    nbytes = cpad // 8
    planes = packed.reshape(*packed.shape[:-1], num_bits, nbytes) \
        .astype(out_dtype)
    # value v = i*C/8 + b  ->  bit i of plane[j][b], weighted by 2^j
    segs = []
    for i in range(8):
        seg = None
        for j in range(num_bits):
            bit = (planes[..., j, :] >> i) & 1
            seg = bit if seg is None else seg | (bit << j)
        segs.append(seg)
    vals = jnp.concatenate(segs, axis=-1)            # (..., cpad)
    return vals[..., :c]


# ---------------------------------------------------------------------------
# Generic finite minifloat codec (sign | e exponent bits | m mantissa bits).
# ---------------------------------------------------------------------------

def encode_float(x: jax.Array, fmt: Format,
                 sr_bits: jax.Array | None = None) -> jax.Array:
    """Encode fp32 values (already clamped to [fmt.min, fmt.max]) to integer
    codes of fmt.num_bits bits.

    RTNE on mantissa truncation; values below the minimum normal flush to the
    scaled-linear subnormal range; optional stochastic rounding via uniform
    ``sr_bits`` (uint32) added to the fp32 mantissa before truncation.
    """
    e, m, bias = fmt.exponent, fmt.mantissa, fmt.bias
    x = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    sign = (bits >> 31) & jnp.uint32(1)
    abs_bits = (bits & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)

    shift = 23 - m
    if sr_bits is not None:
        jitter = (sr_bits % jnp.uint32(1 << shift)).astype(jnp.int32)
        rounded = (abs_bits + jitter) >> shift
    else:
        # round-to-nearest-even at bit position `shift`
        lsb = (abs_bits >> shift) & 1
        rounded = (abs_bits + ((1 << (shift - 1)) - 1) + lsb) >> shift
    # rounded = (exp32 << m) | mant_m, with mantissa carry propagating into
    # the exponent field naturally.
    exp_mant = rounded  # biased-127 exponent in high bits
    # Re-bias: subtract (127 - bias) << m.
    code = exp_mant - ((127 - bias) << m)

    # Subnormal / underflow: value < 2^(1-bias)  <=>  code < (1 << m).
    # Linear code: round(|x| / 2^(1-bias-m)).
    absx = jnp.abs(x)
    sub_scale = np.float32(2.0 ** (bias - 1 + m))
    sub_rel = absx * sub_scale
    if sr_bits is not None:
        u = (sr_bits >> jnp.uint32(8)).astype(jnp.float32) * np.float32(2.0 ** -24)
        sub_code = jnp.floor(sub_rel + u).astype(jnp.int32)
    else:
        sub_code = jnp.round(sub_rel).astype(jnp.int32)  # RTNE via jnp.round
    is_sub = exp_mant < ((127 - bias + 1) << m)
    code = jnp.where(is_sub, sub_code, code)

    max_code = ((1 << e) - 1 << m) | ((1 << m) - 1)
    code = jnp.clip(code, 0, max_code)
    if not fmt.is_unsigned:
        code = code | (sign.astype(jnp.int32) << (e + m))
    return code


def decode_float(code: jax.Array, fmt: Format,
                 dtype=jnp.float32) -> jax.Array:
    """Decode integer codes back to floating point.

    Fast path (e <= 7): place the exp|mant fields into the f32
    exponent/mantissa slots with ONE shift+add and bitcast —
    ``bits = (mag << (23-m)) + ((127-bias) << 23)`` decodes every normal
    exactly; the subnormal rows (exp_field == 0) come out as
    ``2^-bias * (1 + mant/2^m)`` and one fused multiply-add fixes them to
    the true ``2^(1-bias) * mant/2^m``.  ~8 integer/VPU ops per value and
    bit-exact — vs the naive exp2/select decode chain (~30 ops with a
    transcendental), which is what made packed-float weight-only matmul
    VPU-bound (benchmarks/tpu_v5e_small_m.txt float6 row).  e == 8 formats
    would hit the f32 inf boundary and keep the exp2 path."""
    e, m, bias = fmt.exponent, fmt.mantissa, fmt.bias
    code = code.astype(jnp.int32)
    if not fmt.is_unsigned:
        sign = (code >> (e + m)) & 1
        mag = code & ((1 << (e + m)) - 1)
    else:
        sign = None
        mag = code
    if e <= 7:
        bits = (mag << (23 - m)) + ((127 - bias) << 23)
        raw = jax.lax.bitcast_convert_type(bits, jnp.float32)
        val = jnp.where(mag < (1 << m),
                        2.0 * raw - np.float32(2.0 ** (1 - bias)), raw)
    else:
        exp_field = mag >> m
        mant = (mag & ((1 << m) - 1)).astype(jnp.float32)
        normal = (1.0 + mant * np.float32(2.0 ** -m)) * jnp.exp2(
            (exp_field - bias).astype(jnp.float32))
        subnormal = mant * np.float32(2.0 ** (1 - bias - m))
        val = jnp.where(exp_field == 0, subnormal, normal)
    if sign is not None:
        val = jnp.where(sign == 1, -val, val)
    return val.astype(dtype)


# ---------------------------------------------------------------------------
# Top-level pack/unpack used by the quantizer.
# ---------------------------------------------------------------------------

def pack(q: jax.Array, fmt: Format, sr_bits: jax.Array | None = None,
         layout: str = "bitplane") -> jax.Array:
    """Pack quantized values into the packed representation.

    For integers `q` holds (possibly negative) quantized integers; they are
    stored offset-binary.  For floats `q` holds fp32 values in-range; they
    are encoded through the minifloat codec first.  ``layout``:
    "bitplane" (any width) or "halfsplit" (2/4-bit ints — the cheap-decode
    matmul layout).
    """
    if not fmt.is_packed:
        raise ValueError(f"{fmt.name} is not a packed format")
    if fmt.is_integer:
        codes = q.astype(jnp.int32) - jnp.int32(int(fmt.min))
    else:
        codes = encode_float(q, fmt, sr_bits=sr_bits)
    if layout == "halfsplit":
        return pack_codes_halfsplit(codes, fmt.code_bits)
    return pack_codes(codes, fmt.code_bits)


def unpack(packed: jax.Array, fmt: Format, c: int, dtype=jnp.float32,
           layout: str = "bitplane") -> jax.Array:
    """Unpack packed storage back to quantized values.

    Integers return as signed integers (int32, or int8 when they fit) unless
    a float dtype is requested; floats decode to `dtype`.
    """
    if layout == "halfsplit":
        codes = unpack_codes_halfsplit(packed, fmt.code_bits, c)
    else:
        codes = unpack_codes(packed, fmt.code_bits, c)
    if fmt.is_integer:
        vals = codes + jnp.int32(int(fmt.min))
        return vals.astype(dtype)
    return decode_float(codes, fmt, dtype=dtype)


def quantize_to_float_format(x: jax.Array, fmt: Format) -> jax.Array:
    """Round fp32 values to the representable set of `fmt` (encode+decode).

    Mirrors the reference's behaviour where quantized float weights are kept
    in fp32 but constrained to the target format's grid."""
    return decode_float(encode_float(x, fmt), fmt)
