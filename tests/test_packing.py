"""Round-trip and golden tests for the bit-plane packer and minifloat codec."""

import numpy as np
import pytest
import jax.numpy as jnp

from sdnq_tpu.formats import get_format
from sdnq_tpu.packing import (
    pack, unpack, pack_codes, unpack_codes, encode_float, decode_float,
)


@pytest.mark.parametrize("k", [1, 2, 3, 4, 5, 6, 7, 9, 10, 12, 15])
def test_pack_codes_roundtrip(k):
    rng = np.random.default_rng(k)
    codes = rng.integers(0, 2 ** k, size=(4, 64), dtype=np.int64)
    packed = pack_codes(jnp.asarray(codes), k)
    assert packed.dtype == jnp.uint8
    assert packed.shape == (4, k * 8)  # tight: k bits per value
    out = unpack_codes(packed, k, 64)
    np.testing.assert_array_equal(np.asarray(out), codes)


def test_pack_codes_pads_non_multiple_of_8():
    codes = jnp.arange(13, dtype=jnp.int32) % 4
    packed = pack_codes(codes, 2)
    out = unpack_codes(packed, 2, 13)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(codes))


@pytest.mark.parametrize("name", ["int4", "int3", "int7", "int12", "uint4",
                                  "uint2", "uint9"])
def test_int_pack_roundtrip(name):
    fmt = get_format(name)
    rng = np.random.default_rng(0)
    vals = rng.integers(int(fmt.min), int(fmt.max) + 1, size=(8, 32))
    packed = pack(jnp.asarray(vals, jnp.int32), fmt)
    out = unpack(packed, fmt, 32, dtype=jnp.int32)
    np.testing.assert_array_equal(np.asarray(out), vals)


@pytest.mark.parametrize("name", [
    "float8_e4m3fn_sdnq", "float8_e5m2fn", "float6_e3m2fn", "float4_e2m1fn",
    "float12_e3m8fn", "float16_e5m10fn", "float8_e4m4fnu", "float4_e2m2fnu",
    "float2_e1m0fn", "float1_e1m0fnu",
])
def test_float_codec_roundtrip_on_grid(name):
    """Every representable value must encode/decode exactly."""
    fmt = get_format(name)
    codes = np.arange(2 ** fmt.num_bits, dtype=np.int32)
    vals = decode_float(jnp.asarray(codes), fmt)
    re = encode_float(vals, fmt)
    redec = decode_float(re, fmt)
    # -0.0 and +0.0 decode equal; compare values not codes.
    np.testing.assert_allclose(np.asarray(redec), np.asarray(vals), rtol=0)


@pytest.mark.parametrize("name", ["float8_e4m3fn_sdnq", "float6_e3m2fn",
                                  "float4_e2m1fn", "float8_e4m4fnu"])
def test_float_codec_max_min(name):
    fmt = get_format(name)
    enc = encode_float(jnp.asarray([fmt.max], jnp.float32), fmt)
    assert float(decode_float(enc, fmt)[0]) == pytest.approx(fmt.max)
    if not fmt.is_unsigned:
        enc = encode_float(jnp.asarray([fmt.min], jnp.float32), fmt)
        assert float(decode_float(enc, fmt)[0]) == pytest.approx(fmt.min)


def test_float_codec_rtne():
    # e2m1: representable {0, .25(sub), .5, .75(sub? no)...}; grid around 1.0:
    # values 1.0, 1.5, 2.0 ... midpoint 1.25 must round to even (1.0).
    fmt = get_format("float4_e2m1fn")
    x = jnp.asarray([1.25, 1.75], jnp.float32)
    dec = decode_float(encode_float(x, fmt), fmt)
    assert float(dec[0]) == 1.0  # ties-to-even
    assert float(dec[1]) == 2.0


def test_e4m3_matches_ml_dtypes_grid():
    """Our generic codec on e4m3 must reproduce XLA's float8_e4m3fn rounding
    for in-range values (sdnq variant extends max to 480 but shares the grid
    below 448)."""
    fmt = get_format("float8_e4m3fn_sdnq")
    rng = np.random.default_rng(1)
    x = rng.uniform(-440, 440, size=2048).astype(np.float32)
    ours = np.asarray(decode_float(encode_float(jnp.asarray(x), fmt), fmt))
    xla = np.asarray(jnp.asarray(x).astype(jnp.float8_e4m3fn).astype(jnp.float32))
    np.testing.assert_array_equal(ours, xla)


def test_packed_float_roundtrip():
    fmt = get_format("float6_e3m2fn")
    rng = np.random.default_rng(2)
    x = rng.uniform(fmt.min, fmt.max, size=(4, 40)).astype(np.float32)
    grid = decode_float(encode_float(jnp.asarray(x), fmt), fmt)
    packed = pack(jnp.asarray(x), fmt)
    assert packed.shape == (4, fmt.num_bits * 5)
    out = unpack(packed, fmt, 40)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(grid))


def test_subnormal_handling():
    fmt = get_format("float8_e4m3fn_sdnq")  # bias 7, min normal 2^-6
    min_normal = 2.0 ** (1 - fmt.bias)
    min_sub = min_normal * 2.0 ** -fmt.mantissa
    xs = jnp.asarray([0.0, min_sub, 2.5 * min_sub, 0.4 * min_sub], jnp.float32)
    dec = np.asarray(decode_float(encode_float(xs, fmt), fmt))
    assert dec[0] == 0.0
    assert dec[1] == pytest.approx(min_sub)
    assert dec[2] == pytest.approx(2.0 * min_sub)  # RTNE: 2.5 -> 2 (even)
    assert dec[3] == 0.0  # 0.4 ulp rounds to zero


@pytest.mark.parametrize("bits", [1, 2, 3, 4, 5, 6, 7])
def test_halfsplit_roundtrip(bits):
    from sdnq_tpu.packing import pack_codes_halfsplit, unpack_codes_halfsplit
    rng = np.random.default_rng(bits)
    c = 256
    codes = jnp.asarray(rng.integers(0, 2 ** bits, (5, c)), jnp.int32)
    packed = pack_codes_halfsplit(codes, bits)
    assert packed.dtype == jnp.uint8
    assert packed.shape == (5, c * bits // 8)
    out = unpack_codes_halfsplit(packed, bits, c)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(codes))


def test_halfsplit_field_layout():
    """Field t of byte b must be code[t*C/p + b] — the property the
    group-dot kernel's one-shift decode depends on."""
    from sdnq_tpu.packing import pack_codes_halfsplit
    c, bits = 16, 4
    codes = jnp.arange(c, dtype=jnp.int32)[None]
    packed = np.asarray(pack_codes_halfsplit(codes, bits))[0]
    seg = c // 2
    for b in range(seg):
        assert packed[b] & 0xF == b              # field 0 -> code[b]
        assert (packed[b] >> 4) & 0xF == seg + b  # field 1 -> code[seg+b]


def test_pack_halfsplit_layout_int4():
    from sdnq_tpu.packing import pack, unpack
    from sdnq_tpu.formats import get_format
    fmt = get_format("int4")
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(-8, 8, (4, 64)), jnp.int32)
    packed = pack(q, fmt, layout="halfsplit")
    out = unpack(packed, fmt, 64, dtype=jnp.int32, layout="halfsplit")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(q))


@pytest.mark.parametrize("fname", ["float6_e3m2fn", "float4_e2m1fn",
                                   "float5_e2m2fn", "int3", "uint5",
                                   "uint7", "int6"])
def test_pack_halfsplit_all_widths(fname):
    """pack/unpack round-trip through the generalized half-split layout
    (widths 1..7; minifloats ride the integer code planes)."""
    from sdnq_tpu.packing import pack, unpack, encode_float, decode_float
    from sdnq_tpu.formats import get_format
    fmt = get_format(fname)
    rng = np.random.default_rng(3)
    if fmt.is_integer:
        q = jnp.asarray(rng.integers(int(fmt.min), int(fmt.max) + 1,
                                     (4, 128)), jnp.int32)
        expect = np.asarray(q)
    else:
        raw = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
        q = decode_float(encode_float(raw, fmt), fmt)
        expect = np.asarray(q)
    packed = pack(q, fmt, layout="halfsplit")
    assert packed.dtype == jnp.uint8
    assert packed.shape == (4, 128 * fmt.code_bits // 8)
    out = unpack(packed, fmt, 128,
                 dtype=jnp.int32 if fmt.is_integer else jnp.float32,
                 layout="halfsplit")
    np.testing.assert_array_equal(np.asarray(out), expect)


def test_decode_float_bitcast_fast_path():
    """The e<=7 bitcast decode must agree with the exp2 reference decode
    on every code of several formats (incl. subnormals and negatives)."""
    from sdnq_tpu.packing import decode_float
    from sdnq_tpu.formats import get_format
    for fname in ["float6_e3m2fn", "float4_e2m1fn", "float7_e4m2fn",
                  "float6_e2m3fn", "float5_e3m2fnu"]:
        fmt = get_format(fname)
        codes = jnp.arange(2 ** fmt.code_bits, dtype=jnp.int32)
        got = np.asarray(decode_float(codes, fmt))
        e, m, bias = fmt.exponent, fmt.mantissa, fmt.bias
        c = np.arange(2 ** fmt.code_bits)
        if not fmt.is_unsigned:
            sign = (c >> (e + m)) & 1
            mag = c & ((1 << (e + m)) - 1)
        else:
            sign, mag = None, c
        exp_field = mag >> m
        mant = (mag & ((1 << m) - 1)).astype(np.float64)
        normal = (1.0 + mant * 2.0 ** -m) * 2.0 ** (exp_field - bias)
        subnormal = mant * 2.0 ** (1 - bias - m)
        ref = np.where(exp_field == 0, subnormal, normal)
        if sign is not None:
            ref = np.where(sign == 1, -ref, ref)
        np.testing.assert_array_equal(got, ref.astype(np.float32),
                                      err_msg=fname)
