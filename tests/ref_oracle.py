"""ctypes bindings to the reference C library (built into .refbuild/) for
differential testing. Tests that need the oracle are skipped when the
reference build is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_REF_SO = os.path.join(_ROOT, ".refbuild", "libzxc_ref.so")
_REF_SRC = "/root/reference"

CONFORMANCE_DIR = os.path.join(_REF_SRC, "conformance")


def _build():
    build = os.path.join(_ROOT, ".refbuild")
    os.makedirs(build, exist_ok=True)
    if not os.path.exists(os.path.join(build, "libzxc.a")):
        subprocess.run(["cmake", _REF_SRC, "-DCMAKE_BUILD_TYPE=Release", "-G", "Ninja"],
                       cwd=build, check=True, capture_output=True)
        subprocess.run(["ninja"], cwd=build, check=True, capture_output=True)
    subprocess.run(["g++", "-shared", "-o", _REF_SO,
                    "-Wl,--whole-archive", os.path.join(build, "libzxc.a"),
                    "-Wl,--no-whole-archive"], check=True, capture_output=True)


_lib = None


def lib():
    global _lib
    if _lib is None:
        if not os.path.exists(_REF_SO):
            _build()
        _lib = ctypes.CDLL(_REF_SO)
        _lib.zxc_compress.restype = ctypes.c_int64
        _lib.zxc_decompress.restype = ctypes.c_int64
        _lib.zxc_compress_bound.restype = ctypes.c_size_t
        _lib.zxc_dict_id.restype = ctypes.c_uint32
    return _lib


class CompressOpts(ctypes.Structure):
    # Mirrors zxc_compress_opts_t (include/zxc_opts.h)
    _fields_ = [
        ("n_threads", ctypes.c_int),
        ("level", ctypes.c_int),
        ("block_size", ctypes.c_size_t),
        ("checksum_enabled", ctypes.c_int),
        ("seekable", ctypes.c_int),
        ("dict", ctypes.c_void_p),
        ("dict_size", ctypes.c_size_t),
        ("dict_huf", ctypes.c_void_p),
        ("progress_cb", ctypes.c_void_p),
        ("user_data", ctypes.c_void_p),
    ]


class DecompressOpts(ctypes.Structure):
    _fields_ = [
        ("n_threads", ctypes.c_int),
        ("checksum_enabled", ctypes.c_int),
        ("dict", ctypes.c_void_p),
        ("dict_size", ctypes.c_size_t),
        ("dict_huf", ctypes.c_void_p),
        ("progress_cb", ctypes.c_void_p),
        ("user_data", ctypes.c_void_p),
    ]


def ref_compress(data: bytes, level: int = 3, block_size: int = 512 * 1024,
                 checksum: bool = False, seekable: bool = False) -> bytes:
    L = lib()
    bound = L.zxc_compress_bound(len(data)) + block_size + 4096
    dst = ctypes.create_string_buffer(bound)
    opts = CompressOpts(level=level, block_size=block_size,
                        checksum_enabled=1 if checksum else 0,
                        seekable=1 if seekable else 0)
    n = L.zxc_compress(data, len(data), dst, bound, ctypes.byref(opts))
    assert n > 0, f"reference zxc_compress failed: {n}"
    return dst.raw[:n]


def ref_decompress(archive: bytes, dst_size: int, checksum: bool = True) -> bytes:
    L = lib()
    dst = ctypes.create_string_buffer(max(dst_size, 1))
    opts = DecompressOpts(checksum_enabled=1 if checksum else 0)
    n = L.zxc_decompress(archive, len(archive), dst, dst_size, ctypes.byref(opts))
    assert n >= 0, f"reference zxc_decompress failed: {n}"
    return dst.raw[:n]


def ref_checksum(data: bytes) -> int:
    """Reference per-block checksum via compressing a tiny frame is indirect;
    instead expose rapidhash through zxc internals is not exported. Tests use
    frame-level comparisons instead."""
    raise NotImplementedError
