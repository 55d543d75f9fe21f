"""Build + load the native rANS library.

Compiles ``epic_rans.cpp`` with g++ on first import and caches the shared
object next to the source, keyed by a hash of the source text so edits
trigger a rebuild. ctypes is used for binding (see SURVEY.md §2.4: the
reference relies on CompressAI's pybind11 C++ backend; ours is a fresh
TPU-VM-host implementation).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

_SRC = os.path.join(os.path.dirname(__file__), "epic_rans.cpp")
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None


def _lib_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "EPIC_TPU_NATIVE_CACHE", os.path.join(os.path.dirname(_SRC), "_build")
    )
    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir, f"libepic_rans_{digest}.so")


def _compile(path: str) -> None:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-march=native", "-pthread",
        _SRC, "-o", path + ".tmp",
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    os.replace(path + ".tmp", path)


def _declare(lib: ctypes.CDLL) -> None:
    c = ctypes
    i32p, u32p, i64p, u8p, f32p = (
        c.POINTER(c.c_int32), c.POINTER(c.c_uint32), c.POINTER(c.c_int64),
        c.POINTER(c.c_uint8), c.POINTER(c.c_float),
    )
    lib.epic_pmf_to_quantized_cdf.restype = c.c_int32
    lib.epic_pmf_to_quantized_cdf.argtypes = [f32p, c.c_int32, c.c_int32, u32p]

    lib.epic_pmf_to_quantized_cdf_batch.restype = c.c_int32
    lib.epic_pmf_to_quantized_cdf_batch.argtypes = [
        f32p, c.c_int64, i32p, c.c_int32, c.c_int32, u32p, c.c_int64, c.c_int32,
    ]

    lib.epic_rans_encode.restype = c.c_int64
    lib.epic_rans_encode.argtypes = [
        i32p, i32p, c.c_int64, u32p, c.c_int64, i32p, i32p, c.c_int32,
        u8p, c.c_int64,
    ]

    lib.epic_rans_decode.restype = c.c_int32
    lib.epic_rans_decode.argtypes = [
        u8p, c.c_int64, i32p, c.c_int64, u32p, c.c_int64, i32p, i32p,
        c.c_int32, i32p,
    ]

    lib.epic_rans_encode_seg.restype = c.c_int64
    lib.epic_rans_encode_seg.argtypes = [
        i32p, i32p, c.c_int64, i64p, c.c_int32, u32p, c.c_int64, i32p, i32p,
        c.c_int32, u8p, c.c_int64, i64p,
    ]

    lib.epic_rans_encode_seg_batch.restype = c.c_int32
    lib.epic_rans_encode_seg_batch.argtypes = [
        i32p, i32p, i64p, i64p, c.c_int32, i64p, c.c_int32, u32p, c.c_int64,
        i32p, i32p, c.c_int32, u8p, c.c_int64, i64p, i64p, c.c_int32,
    ]

    lib.epic_rans_stream_decode_batch.restype = c.c_int32
    lib.epic_rans_stream_decode_batch.argtypes = [
        c.POINTER(c.c_void_p), c.c_int32, i32p, i64p, i64p, u32p,
        c.c_int64, i32p, i32p, c.c_int32, i32p, c.c_int32,
    ]

    lib.epic_rans_encode_batch.restype = c.c_int32
    lib.epic_rans_encode_batch.argtypes = [
        i32p, i32p, i64p, i64p, c.c_int32, u32p, c.c_int64, i32p, i32p,
        c.c_int32, u8p, c.c_int64, i64p, c.c_int32,
    ]

    lib.epic_rans_decode_batch.restype = c.c_int32
    lib.epic_rans_decode_batch.argtypes = [
        u8p, i64p, i64p, i32p, i64p, i64p, c.c_int32, u32p, c.c_int64,
        i32p, i32p, c.c_int32, i32p, c.c_int32,
    ]

    i8p, i16p = c.POINTER(c.c_int8), c.POINTER(c.c_int16)
    lib.epic_rans_encode_shell_batch.restype = c.c_int32
    lib.epic_rans_encode_shell_batch.argtypes = [
        c.c_void_p, c.c_int32, u8p, c.c_int64,          # base sym/idx
        c.c_void_p, c.c_int32, u8p, i8p, c.c_int64,     # prog sym/idx/sid
        c.c_int32, c.c_int32,                           # nq, m
        u32p, c.c_int64, i32p, i32p, c.c_int32,         # tables
        u8p, c.c_int64, i64p, i64p, c.c_int32,          # out
    ]

    lib.epic_rans_stream_decode_shell_batch.restype = c.c_int32
    lib.epic_rans_stream_decode_shell_batch.argtypes = [
        c.POINTER(c.c_void_p), c.c_int32,
        u8p, i8p, c.c_int64,                            # idx/sid flat
        c.c_int32, c.c_int32, c.c_int32,                # j0, j1, nq
        u32p, c.c_int64, i32p, i32p, c.c_int32,         # tables
        i16p,                                           # canvas
        i64p, i32p, c.c_int32, c.c_int32,               # overflow, threads
    ]

    lib.epic_rans_stream_new.restype = c.c_void_p
    lib.epic_rans_stream_new.argtypes = [u8p, c.c_int64]

    lib.epic_rans_stream_decode.restype = c.c_int32
    lib.epic_rans_stream_decode.argtypes = [
        c.c_void_p, i32p, c.c_int64, u32p, c.c_int64, i32p, i32p,
        c.c_int32, i32p,
    ]

    lib.epic_rans_stream_free.restype = None
    lib.epic_rans_stream_free.argtypes = [c.c_void_p]


def load_library() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        path = _lib_path()
        if not os.path.exists(path):
            _compile(path)
        lib = ctypes.CDLL(path)
        _declare(lib)
        _LIB = lib
        return lib
