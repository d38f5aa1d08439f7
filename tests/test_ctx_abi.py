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
