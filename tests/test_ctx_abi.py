"""Reusable-context C ABI (zxch_cctx_*/zxch_dctx_*): sticky options,
dict-at-attach, byte-identity with the one-shot encoder across reuse."""
import ctypes

import numpy as np
import pytest

from zxc_tpu import runtime
from zxc_tpu.codec import frame
from zxc_tpu.codec.frame import EncodeOpts, DecodeOpts

pytestmark = pytest.mark.skipif(not runtime.available(),
                                reason="native toolchain unavailable")


def _lib():
    L = runtime.lib()
    vp, u64, i64, ci = (ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int64,
                        ctypes.c_int)
    L.zxch_cctx_new.restype = vp
    L.zxch_cctx_set.restype = ci
    L.zxch_cctx_set.argtypes = [vp, ci, u64, ci, ci]
    L.zxch_cctx_attach_dict.restype = ci
    L.zxch_cctx_attach_dict.argtypes = [vp, vp, u64, vp]
    L.zxch_cctx_compress.restype = i64
    L.zxch_cctx_compress.argtypes = [vp, vp, u64, vp, u64]
    L.zxch_cctx_free.argtypes = [vp]
    L.zxch_dctx_new.restype = vp
    L.zxch_dctx_new.argtypes = [ci]
    L.zxch_dctx_attach_dict.restype = ci
    L.zxch_dctx_attach_dict.argtypes = [vp, vp, u64, vp]
    L.zxch_dctx_decompress.restype = i64
    L.zxch_dctx_decompress.argtypes = [vp, vp, u64, vp, u64]
    L.zxch_dctx_free.argtypes = [vp]
    return L


def _body(seed, n):
    rng = np.random.default_rng(seed)
    return (b"context body " * 700
            + rng.integers(0, 256, 9000, dtype=np.uint8).tobytes())[:n]


def test_cctx_sticky_reuse_matches_oneshot():
    L = _lib()
    h = L.zxch_cctx_new()
    assert L.zxch_cctx_set(h, 6, 16384, 1, 0) == 0
    cap = 200000
    buf = (ctypes.c_uint8 * cap)()
    try:
        for seed in (1, 2, 3):       # many frames through ONE context
            data = _body(seed, 40000 + seed * 777)
            w = L.zxch_cctx_compress(h, data, len(data), buf, cap)
            assert w > 0
            ref = frame.compress(data, EncodeOpts(level=6, block_size=16384,
                                                  checksum=True))
            assert bytes(buf[:w]) == ref
    finally:
        L.zxch_cctx_free(h)


def test_cctx_rejects_bad_options():
    L = _lib()
    h = L.zxch_cctx_new()
    assert L.zxch_cctx_set(h, 3, 777, 0, 0) == -14       # not a power of 2
    assert L.zxch_cctx_set(h, 3, 1 << 23, 0, 0) == -14   # above 2 MiB
    L.zxch_cctx_free(h)


def test_ctx_dict_attach_roundtrip():
    from zxc_tpu.codec.dict_train import train_dict, train_dict_huf
    L = _lib()
    samples = [b"dict ctx sample %d payload " % i * 25 for i in range(10)]
    content = train_dict(samples, 1024)
    huf = train_dict_huf(samples, content)
    data = samples[2] + samples[7]
    cc = L.zxch_cctx_new()
    dc = L.zxch_dctx_new(1)
    cap = 100000
    buf = (ctypes.c_uint8 * cap)()
    out = (ctypes.c_uint8 * cap)()
    try:
        assert L.zxch_cctx_set(cc, 6, 4096, 1, 0) == 0
        assert L.zxch_cctx_attach_dict(cc, content, len(content), huf) == 0
        w = L.zxch_cctx_compress(cc, data, len(data), buf, cap)
        assert w > 0
        arc = bytes(buf[:w])
        ref = frame.compress(data, EncodeOpts(
            level=6, block_size=4096, checksum=True,
            dict_content=content, dict_huf=huf))
        assert arc == ref
        # decode fails without the dict, works after attach
        assert L.zxch_dctx_decompress(dc, arc, w, out, cap) == -15
        assert L.zxch_dctx_attach_dict(dc, content, len(content), huf) == 0
        n = L.zxch_dctx_decompress(dc, arc, w, out, cap)
        assert n == len(data) and bytes(out[:n]) == data
        # detach: plain frames still work through the same context
        assert L.zxch_cctx_attach_dict(cc, None, 0, None) == 0
        w2 = L.zxch_cctx_compress(cc, data, len(data), buf, cap)
        assert bytes(buf[:w2]) == frame.compress(
            data, EncodeOpts(level=6, block_size=4096, checksum=True))
    finally:
        L.zxch_cctx_free(cc)
        L.zxch_dctx_free(dc)


def test_static_contexts():
    """Caller-workspace contexts (reference zxc_init_static_cctx parity):
    size estimator, no-heap init, full interop with the heap handles,
    byte-identity with the one-shot encoder, -17 on dict overflow."""
    L = _lib()
    vp, u64, ci = ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int
    L.zxch_cctx_static_size.restype = u64
    L.zxch_cctx_static_size.argtypes = [u64]
    L.zxch_dctx_static_size.restype = u64
    L.zxch_dctx_static_size.argtypes = [u64]
    L.zxch_cctx_init_static.restype = vp
    L.zxch_cctx_init_static.argtypes = [vp, u64, ci, u64, ci, ci, u64]
    L.zxch_dctx_init_static.restype = vp
    L.zxch_dctx_init_static.argtypes = [vp, u64, ci, u64]

    data = (b"static context payload " * 500)[:9000]
    csz = int(L.zxch_cctx_static_size(4096))
    dsz = int(L.zxch_dctx_static_size(4096))
    cws = (ctypes.c_uint8 * csz)()
    dws = (ctypes.c_uint8 * dsz)()
    # too-small workspace is rejected
    assert L.zxch_cctx_init_static(cws, 16, 3, 4096, 0, 0, 4096) is None
    cc = L.zxch_cctx_init_static(cws, csz, 3, 4096, 1, 0, 4096)
    dc = L.zxch_dctx_init_static(dws, dsz, 1, 4096)
    assert cc and dc
    cap = 40000
    buf = (ctypes.c_uint8 * cap)()
    out = (ctypes.c_uint8 * cap)()
    w = L.zxch_cctx_compress(cc, data, len(data), buf, cap)
    assert w > 0
    exp = frame.compress(data, EncodeOpts(level=3, block_size=4096,
                                          checksum=True))
    assert bytes(buf[:w]) == exp
    n = L.zxch_dctx_decompress(dc, bytes(buf[:w]), w, out, cap)
    assert n == len(data) and bytes(out[:n]) == data
    # sticky-option change through the same entry point
    assert L.zxch_cctx_set(cc, 1, 4096, 0, 0) == 0
    w1 = L.zxch_cctx_compress(cc, data, len(data), buf, cap)
    assert bytes(buf[:w1]) == frame.compress(
        data, EncodeOpts(level=1, block_size=4096))
    # dict attach within / beyond capacity
    dict_content = (b"static dict seed " * 300)[:4096]
    assert L.zxch_cctx_attach_dict(cc, dict_content, 4096, None) == 0
    assert L.zxch_cctx_attach_dict(cc, dict_content + b"x", 4097, None) == -17
    # dict-framed roundtrip through static contexts
    assert L.zxch_cctx_attach_dict(cc, dict_content, 4096, None) == 0
    assert L.zxch_dctx_attach_dict(dc, dict_content, 4096, None) == 0
    w2 = L.zxch_cctx_compress(cc, data, len(data), buf, cap)
    assert w2 > 0
    n2 = L.zxch_dctx_decompress(dc, bytes(buf[:w2]), w2, out, cap)
    assert n2 == len(data) and bytes(out[:n2]) == data
    # free is a no-op on static handles (must not crash / double free)
    L.zxch_cctx_free(cc)
    L.zxch_dctx_free(dc)


def test_portable_tier_builds(tmp_path):
    """ZXCH_PORTABLE=1 produces an AVX2-tier .so that passes a roundtrip
    (the redistributable-binary story; reference ships per-ISA variants,
    cmake/zxcVariants.cmake:13-83)."""
    import subprocess, os
    src = os.path.join(os.path.dirname(runtime.__file__), "zxc_host.cpp")
    so = str(tmp_path / "libzxchost_avx2.so")
    r = subprocess.run(["g++", "-O3", "-mavx2", "-mbmi", "-mbmi2",
                        "-mlzcnt", "-shared", "-fPIC", "-o", so, src],
                       capture_output=True, timeout=240)
    assert r.returncode == 0, r.stderr[-500:]
    P = ctypes.CDLL(so)
    P.zxch_simple_compress.restype = ctypes.c_int64
    P.zxch_simple_decompress.restype = ctypes.c_int64
    assert P.zxch_isa_supported() == 1   # AVX2 host: tier must load
    data = (b"portable tier roundtrip " * 400)[:8000]
    buf = (ctypes.c_uint8 * 40000)()
    out = (ctypes.c_uint8 * 40000)()
    w = P.zxch_simple_compress(data, len(data), 3, 4096, 0, 0, buf, 40000)
    assert w > 0
    n = P.zxch_simple_decompress(bytes(buf[:w]), w, out, 40000,
                                 None, 0, None, 0)
    assert n == len(data) and bytes(out[:n]) == data
