"""ctypes wrapper for the native threaded safetensors reader.

Python parses the safetensors header (one JSON object); the C++ library
(st_reader.cpp) performs the parallel pread fan-out into pre-allocated
numpy buffers.  Falls back to the `safetensors` package when the shared
library can't be built.
"""

from __future__ import annotations

import ctypes
import json
import os
import struct
import subprocess

import numpy as np

__all__ = ["fast_load_safetensors", "native_available"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libst_reader.so")
_LIB = None

_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "U16": np.uint16, "U32": np.uint32, "BOOL": np.bool_,
    # bf16/fp8 load as raw uint carriers; caller bitcasts
    "BF16": np.uint16, "F8_E4M3": np.uint8, "F8_E5M2": np.uint8,
}


def _build() -> bool:
    src = os.path.join(_HERE, "st_reader.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-o", _SO, src],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO) and not _build():
        _LIB = False
        return _LIB
    try:
        lib = ctypes.CDLL(_SO)
        lib.st_read_ranges.restype = ctypes.c_int
        lib.st_read_ranges.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int64, ctypes.c_int]
        _LIB = lib
    except OSError:
        _LIB = False
    return _LIB


def native_available() -> bool:
    return bool(_lib())


def fast_load_safetensors(path: str, num_threads: int = 0,
                          keys: list[str] | None = None):
    """Load a safetensors file into {key: np.ndarray} with native threaded
    IO (bf16/fp8 arrive as uint16/uint8 carriers; see _DTYPES)."""
    lib = _lib()
    with open(path, "rb") as f:
        header_len = struct.unpack("<Q", f.read(8))[0]
        header = json.loads(f.read(header_len))
    data_start = 8 + header_len
    entries = [(k, v) for k, v in header.items() if k != "__metadata__"
               and (keys is None or k in keys)]

    if not lib:
        from safetensors import safe_open
        out = {}
        with safe_open(path, framework="np") as f:
            for k, _ in entries:
                out[k] = f.get_tensor(k)
        return out

    n = len(entries)
    offsets = (ctypes.c_uint64 * n)()
    sizes = (ctypes.c_uint64 * n)()
    dsts = (ctypes.POINTER(ctypes.c_uint8) * n)()
    arrays = {}
    for i, (k, info) in enumerate(entries):
        dt = _DTYPES[info["dtype"]]
        start, end = info["data_offsets"]
        arr = np.empty(info["shape"], dtype=dt)
        assert arr.nbytes == end - start, (k, arr.nbytes, end - start)
        arrays[k] = arr
        offsets[i] = data_start + start
        sizes[i] = end - start
        dsts[i] = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    rc = lib.st_read_ranges(path.encode(), offsets, sizes, dsts, n,
                            num_threads)
    if rc != 0:
        raise IOError(f"native safetensors read failed for {path}")
    return arrays
