"""Golden-value tests for the generated format registry against the
reference's hand-written table (/root/reference/src/sdnq/common.py:18-336)."""

import pytest

from sdnq_tpu.formats import (
    FORMATS,
    WEIGHTS_DTYPE_ORDER,
    get_format,
    resolve_alias,
    default_matmul_format,
)

# (name, min, max, bits, exp, mantissa) golden rows sampled from the
# reference table across every family.
GOLDEN = [
    ("int8", -128, 127, 8, 0, 7),
    ("int4", -8, 7, 4, 0, 3),
    ("int12", -2048, 2047, 12, 0, 11),
    ("uint4", 0, 15, 4, 0, 4),
    ("uint8", 0, 255, 8, 0, 8),
    ("uint15", 0, 32768, 15, 0, 15),
    ("uint9", 0, 512, 9, 0, 9),
    ("float8_e4m3fn", -448.0, 448.0, 8, 4, 3),
    ("float8_e4m3fn_sdnq", -480.0, 480.0, 8, 4, 3),
    ("float8_e5m2fn", -114688.0, 114688.0, 8, 5, 2),
    ("float16_e1m14fn", -3.9998779296875, 3.9998779296875, 16, 1, 14),
    ("float16_e5m10fn", -131008.0, 131008.0, 16, 5, 10),
    ("float12_e3m8fn", -31.9375, 31.9375, 12, 3, 8),
    ("float6_e3m2fn", -28.0, 28.0, 6, 3, 2),
    ("float6_e5m0fn", -65536.0, 65536.0, 6, 5, 0),
    ("float4_e2m1fn", -6.0, 6.0, 4, 2, 1),
    ("float2_e1m0fn", -2.0, 2.0, 2, 1, 0),
    ("float16_e5m11fnu", 0, 131040.0, 16, 5, 11),
    ("float8_e4m4fnu", 0, 496.0, 8, 4, 4),
    ("float4_e2m2fnu", 0, 7.0, 4, 2, 2),
    ("float1_e1m0fnu", 0, 2.0, 1, 1, 0),
    ("float5_e4m0fn", -256.0, 256.0, 5, 4, 0),
    ("float9_e4m4fn", -496.0, 496.0, 9, 4, 4),
]


@pytest.mark.parametrize("name,vmin,vmax,bits,e,m", GOLDEN)
def test_golden_ranges(name, vmin, vmax, bits, e, m):
    f = get_format(name)
    assert f.min == pytest.approx(vmin)
    assert f.max == pytest.approx(vmax)
    assert f.num_bits == bits
    assert f.exponent == e
    assert f.mantissa == m


def test_aliases():
    assert resolve_alias("fp8") == "float8_e4m3fn"
    assert resolve_alias("fp4") == "float4_e2m1fn"
    assert resolve_alias("ufp8") == "float8_e4m4fnu"
    assert resolve_alias("fp15") == "float15_e5m9fn"
    assert resolve_alias("ufp9") == "float9_e4m5fnu"
    assert resolve_alias("int1") == "uint1"
    assert resolve_alias("bool") == "uint1"
    assert resolve_alias("fp1") == "float1_e1m0fnu"


def test_ladder_matches_reference_prefix():
    # reference: common.py:304-318
    assert WEIGHTS_DTYPE_ORDER[:8] == [
        "uint1", "float1_e1m0fnu", "int2", "float2_e1m0fn",
        "uint2", "float2_e1m1fnu", "float2_e2m0fnu", "int3",
    ]
    i8 = WEIGHTS_DTYPE_ORDER.index("int8")
    assert WEIGHTS_DTYPE_ORDER[i8:i8 + 8] == [
        "int8", "float8_e4m3fn", "float8_e5m2", "float8_e1m6fn",
        "float8_e2m5fn", "float8_e3m4fn", "float8_e4m3fn_sdnq",
        "float8_e5m2fn",
    ]
    i16 = WEIGHTS_DTYPE_ORDER.index("int16")
    assert WEIGHTS_DTYPE_ORDER[i16:i16 + 7] == [
        "int16", "float16", "float16_e1m14fn", "float16_e2m13fn",
        "float16_e3m12fn", "float16_e4m11fn", "float16_e5m10fn",
    ]


def test_registry_size_covers_reference_space():
    # 176 named storage formats in the reference; ours must cover at least
    # that many distinct formats (we add int/uint 32 variants etc).
    assert len(FORMATS) >= 170


def test_default_matmul_format():
    assert default_matmul_format("int4") == "int8"
    assert default_matmul_format("uint8") == "uint8"
    assert default_matmul_format("uint4") == "int8"
    assert default_matmul_format("float8_e4m3fn") == "float8_e4m3fn"
    assert default_matmul_format("fp6") == "float8_e4m3fn"
    assert default_matmul_format("float16_e3m12fn") == "float16"
    assert default_matmul_format("int16") == "int8"


def test_code_bits():
    assert get_format("uint15").code_bits == 16
    assert get_format("uint9").code_bits == 10
    assert get_format("uint4").code_bits == 4
    assert get_format("int4").code_bits == 4
    assert get_format("float4_e2m1fn").code_bits == 4
