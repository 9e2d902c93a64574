"""Extra policy/negotiation edge-case tests."""

from sdnq_tpu.policy import check_param_name_in, get_minimum_dtype
from sdnq_tpu.tensor import negotiate_group_count, auto_group_size
from sdnq_tpu.formats import get_format


def test_name_match_semantics():
    # reference utils.py:29-43
    assert check_param_name_in("a.b.weight", [".a.b"]) == ".a.b"
    assert check_param_name_in("x.proj_out.weight", ["proj_out"]) == "proj_out"
    assert check_param_name_in("blocks.0.norm.weight",
                               ["blocks.*.norm*"]) is not None
    assert check_param_name_in("blocks.0.attn.weight", ["mlp"]) is None
    # prefix form must anchor at the start
    assert check_param_name_in("c.a.b.weight", [".a.b"]) is None


def test_minimum_dtype_variants():
    d = {"minimum_6bit": ["x"], "uint8": ["y"]}
    assert get_minimum_dtype("int4", "m.x.weight", d) == "int6"
    assert get_minimum_dtype("int8", "m.x.weight", d) == "int8"  # already >=
    assert get_minimum_dtype("int4", "m.y.weight", d) == "uint8"
    assert get_minimum_dtype("int2", "m.z.weight", d) == "int2"
    # <=4 bit minimums promote to unsigned (reference utils.py:113-116)
    assert get_minimum_dtype("int2", "m.x.weight",
                             {"minimum_3bit": ["x"]}) == "uint3"


def test_group_negotiation():
    # reference quantizer.py:179-193 divisor search
    assert negotiate_group_count(4096, 128) == (128, 32)
    # num_of_groups decrements until divisible; <=1 collapses to one group
    assert negotiate_group_count(640, 256) == (640, 1)
    assert negotiate_group_count(4096, 768) == (1024, 4)
    assert negotiate_group_count(100, 64) == (100, 1)
    assert negotiate_group_count(31, 64) == (31, 1)


def test_auto_group_size():
    # reference quantizer.py:171-177
    f4 = get_format("int4")
    assert auto_group_size(f4, "linear", False, False, False) == 2 ** 6
    assert auto_group_size(f4, "linear", True, False, False) == 2 ** 7
    assert auto_group_size(f4, "conv", False, False, False) == 2 ** 5
    f8 = get_format("int8")
    assert auto_group_size(f8, "linear", False, True, False) == -1
