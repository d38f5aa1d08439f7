"""Push-streaming C ABI (zxch_cstream_*/zxch_dstream_*, zxc_host.cpp).

Contracts mirrored from the reference pstream suite (zxc_pstream.c):
reentrant drip-feed (1-byte pushes, tiny drain caps), byte-identity with
the one-shot frame encoder, sticky errors, truncation detection,
dictionary rejection, seekable-archive passthrough, checksum
verification, and interop with the Python pstream + frame decoders.
"""
import ctypes
import os

import numpy as np
import pytest

from zxc_tpu import runtime
from zxc_tpu.codec import frame, pstream
from zxc_tpu.codec.frame import EncodeOpts, DecodeOpts

pytestmark = pytest.mark.skipif(not runtime.available(),
                                reason="native toolchain unavailable")


def _lib():
    L = runtime.lib()
    vp, u64, i64, ci = (ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int64,
                        ctypes.c_int)
    L.zxch_cstream_new.restype = vp
    L.zxch_cstream_new.argtypes = [ci, u64, ci, ci]
    L.zxch_cstream_compress.restype = i64
    L.zxch_cstream_compress.argtypes = [vp, vp, u64, vp, u64, vp]
    L.zxch_cstream_end.restype = i64
    L.zxch_cstream_end.argtypes = [vp, vp, u64]
    L.zxch_cstream_finished.restype = ci
    L.zxch_cstream_finished.argtypes = [vp]
    L.zxch_cstream_free.argtypes = [vp]
    L.zxch_dstream_new.restype = vp
    L.zxch_dstream_new.argtypes = [ci]
    L.zxch_dstream_decompress.restype = i64
    L.zxch_dstream_decompress.argtypes = [vp, vp, u64, vp, u64, vp]
    L.zxch_dstream_finished.restype = ci
    L.zxch_dstream_finished.argtypes = [vp]
    L.zxch_dstream_free.argtypes = [vp]
    return L


def c_compress(data: bytes, level=3, block=16384, checksum=False,
               seekable=False, push=8192, drain=4096) -> bytes:
    L = _lib()
    h = L.zxch_cstream_new(level, block, int(checksum), int(seekable))
    assert h
    out = bytearray()
    buf = (ctypes.c_uint8 * max(drain, 1))()
    consumed = ctypes.c_uint64(0)
    try:
        pos = 0
        while pos < len(data):
            chunk = data[pos:pos + push]
            n = L.zxch_cstream_compress(
                h, chunk, len(chunk), buf, drain, ctypes.byref(consumed))
            assert n >= 0, n
            assert consumed.value == len(chunk)
            out += bytes(buf[:n])
            pos += len(chunk)
        while not L.zxch_cstream_finished(h):
            n = L.zxch_cstream_end(h, buf, drain)
            assert n >= 0, n
            if n == 0 and L.zxch_cstream_finished(h):
                break
            out += bytes(buf[:n])
    finally:
        L.zxch_cstream_free(h)
    return bytes(out)


def c_decompress(arc: bytes, verify=False, push=4096, drain=8192,
                 expect_err=None) -> bytes:
    L = _lib()
    h = L.zxch_dstream_new(int(verify))
    out = bytearray()
    buf = (ctypes.c_uint8 * max(drain, 1))()
    consumed = ctypes.c_uint64(0)
    try:
        pos = 0
        while pos < len(arc) or not L.zxch_dstream_finished(h):
            chunk = arc[pos:pos + push]
            n = L.zxch_dstream_decompress(
                h, chunk, len(chunk), buf, drain, ctypes.byref(consumed))
            if n < 0:
                assert expect_err is not None, f"unexpected error {n}"
                assert n == expect_err, (n, expect_err)
                return None
            out += bytes(buf[:n])
            pos += len(chunk)
            if pos >= len(arc) and n == 0 and not L.zxch_dstream_finished(h):
                assert expect_err is not None, "starved: truncated input"
                return None
    finally:
        L.zxch_dstream_free(h)
    assert expect_err is None
    return bytes(out)


def _mixed(seed, n):
    rng = np.random.default_rng(seed)
    body = (b"stream body text " * 900
            + rng.integers(0, 256, 20000, dtype=np.uint8).tobytes()
            + b"\x00" * 8000)
    return (body * (n // len(body) + 1))[:n]


@pytest.mark.parametrize("level", [1, 3, 7])
def test_cstream_matches_oneshot(level):
    data = _mixed(1, 60000)
    arc = c_compress(data, level=level, block=16384)
    ref = frame.compress(data, EncodeOpts(level=level, block_size=16384))
    assert arc == ref
    assert frame.decompress(arc) == data


def test_cstream_checksum_seekable_matches_oneshot():
    data = _mixed(2, 50000)
    arc = c_compress(data, level=3, block=16384, checksum=True,
                     seekable=True)
    ref = frame.compress(data, EncodeOpts(level=3, block_size=16384,
                                          checksum=True, seekable=True))
    assert arc == ref
    assert frame.decompress(arc, DecodeOpts(checksum=True)) == data


def test_drip_feed_one_byte():
    data = _mixed(3, 20000)
    arc = c_compress(data, level=2, block=4096, push=1, drain=1)
    assert arc == frame.compress(data, EncodeOpts(level=2, block_size=4096))
    assert c_decompress(arc, push=1, drain=1) == data


def test_dstream_roundtrip_and_python_interop():
    data = _mixed(4, 90000)
    arc = frame.compress(data, EncodeOpts(level=3, block_size=16384,
                                          checksum=True))
    assert c_decompress(arc, verify=True) == data
    # our C cstream archive through the Python DStream
    arc2 = c_compress(data, level=1, block=16384, checksum=True)
    ds = pstream.DStream(checksum=True)
    out, _ = ds.decompress(arc2, len(data) + 64)
    assert out == data and ds.finished


def test_dstream_seekable_passthrough():
    data = _mixed(5, 40000)
    arc = frame.compress(data, EncodeOpts(level=3, block_size=4096,
                                          seekable=True))
    assert c_decompress(arc) == data


def test_dstream_rejects_corruption_and_truncation():
    data = _mixed(6, 30000)
    arc = bytearray(frame.compress(data, EncodeOpts(level=3,
                                                    block_size=16384,
                                                    checksum=True)))
    arc[40] ^= 0x55
    c_decompress(bytes(arc), verify=True, expect_err=-7)
    good = frame.compress(data, EncodeOpts(level=3, block_size=16384))
    c_decompress(good[:len(good) // 2], expect_err=-999)  # starved


def test_dstream_rejects_dict_frames():
    from zxc_tpu.codec.dict_train import train_dict, train_dict_huf
    samples = [b"dict sample %d content here " % i * 20 for i in range(8)]
    content = train_dict(samples, 512)
    huf = train_dict_huf(samples, content)
    arc = frame.compress(samples[0], EncodeOpts(
        level=3, block_size=4096, dict_content=content, dict_huf=huf))
    c_decompress(arc, expect_err=-15)


def test_sticky_error_and_data_after_end():
    L = _lib()
    data = _mixed(7, 9000)
    arc = frame.compress(data, EncodeOpts(level=3, block_size=4096))
    h = L.zxch_dstream_new(0)
    buf = (ctypes.c_uint8 * 65536)()
    consumed = ctypes.c_uint64(0)
    n = L.zxch_dstream_decompress(h, arc, len(arc), buf, 65536,
                                  ctypes.byref(consumed))
    assert n >= 0
    total = bytes(buf[:n])
    while not L.zxch_dstream_finished(h):
        n = L.zxch_dstream_decompress(h, b"", 0, buf, 65536,
                                      ctypes.byref(consumed))
        assert n > 0
        total += bytes(buf[:n])
    assert total == data
    # pushing more after the footer is an error, and it sticks
    rc1 = L.zxch_dstream_decompress(h, b"x", 1, buf, 16,
                                    ctypes.byref(consumed))
    rc2 = L.zxch_dstream_decompress(h, b"", 0, buf, 16,
                                    ctypes.byref(consumed))
    assert rc1 < 0 and rc2 == rc1
    L.zxch_dstream_free(h)
