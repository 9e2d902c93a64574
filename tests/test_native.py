"""Native threaded safetensors reader tests."""

import numpy as np
import pytest

from sdnq_tpu.native import fast_load_safetensors, native_available


def test_native_library_builds():
    assert native_available(), "g++ build of st_reader.so failed"


def test_fast_load_matches_safetensors(tmp_path):
    from safetensors.numpy import save_file
    rng = np.random.default_rng(0)
    sd = {
        "a.weight": rng.normal(size=(128, 64)).astype(np.float32),
        "b.scale": rng.normal(size=(128, 1)).astype(np.float32),
        "c.qdata": rng.integers(-128, 128, (256, 256)).astype(np.int8),
        "d.small": np.asarray([1.5], np.float32),
    }
    p = str(tmp_path / "m.safetensors")
    save_file(sd, p)
    out = fast_load_safetensors(p, num_threads=4)
    assert set(out) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(out[k], sd[k])


def test_fast_load_key_subset(tmp_path):
    from safetensors.numpy import save_file
    sd = {"x": np.ones((4, 4), np.float32), "y": np.zeros((2,), np.int8)}
    p = str(tmp_path / "m.safetensors")
    save_file(sd, p)
    out = fast_load_safetensors(p, keys=["x"])
    assert list(out) == ["x"]
