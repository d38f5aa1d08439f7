"""Push streaming: drip-feed, drain/resume, truncation, seekable passthrough,
sticky errors. (reference suite: tests/test_pstream.c)"""
import numpy as np
import pytest

from zxc_tpu.codec import frame, pstream
from zxc_tpu.codec.frame import DecodeOpts, EncodeOpts
from zxc_tpu.errors import ZxcError

import ref_oracle


def _data(n=100_000, seed=0):
    rng = np.random.default_rng(seed)
    seg = rng.integers(0, 200, 677, dtype=np.uint8).tobytes()
    return (seg * (n // len(seg) + 1))[:n]


def test_cstream_matches_oneshot():
    data = _data()
    got = pstream.stream_compress(data, level=3, block_size=8192, checksum=True)
    want = frame.compress(data, EncodeOpts(level=3, block_size=8192, checksum=True))
    assert got == want


def test_cstream_one_byte_pushes():
    data = _data(5000, seed=1)
    cs = pstream.CStream(level=2, block_size=4096, checksum=True)
    out = bytearray()
    for i in range(len(data)):
        produced, consumed = cs.compress(data[i:i + 1], 1 << 30)
        assert consumed == 1
        out += produced
    while not cs.finished:
        out += cs.end(7)  # tiny drain windows
    assert frame.decompress(bytes(out), DecodeOpts(checksum=True)) == data


def test_cstream_tiny_drain_windows():
    data = _data(30_000, seed=2)
    cs = pstream.CStream(level=1, block_size=4096)
    out = bytearray()
    produced, _ = cs.compress(data, 13)
    out += produced
    while True:
        chunk, _ = cs.compress(b"", 13)
        if not chunk:
            break
        out += chunk
    while not cs.finished:
        out += cs.end(13)
    assert frame.decompress(bytes(out)) == data


def test_dstream_roundtrip_chunked():
    data = _data(200_000, seed=3)
    archive = frame.compress(data, EncodeOpts(level=3, block_size=16384,
                                              checksum=True))
    for chunk in (1, 7, 4096, len(archive)):
        got = bytearray()
        ds = pstream.DStream(checksum=True)
        for pos in range(0, len(archive), chunk):
            produced, _ = ds.decompress(archive[pos:pos + chunk], 1 << 30)
            got += produced
        produced, _ = ds.decompress(b"", 1 << 30)
        got += produced
        assert ds.finished
        assert bytes(got) == data


def test_dstream_drain_resume():
    data = _data(50_000, seed=4)
    archive = frame.compress(data, EncodeOpts(level=2, block_size=8192))
    ds = pstream.DStream()
    got = bytearray()
    ds.decompress(archive, 0)          # feed all, drain nothing
    while True:
        produced, _ = ds.decompress(b"", 999)
        if not produced:
            break
        got += produced
    assert ds.finished
    assert bytes(got) == data


def test_dstream_truncation_detected():
    data = _data(20_000, seed=5)
    archive = frame.compress(data, EncodeOpts(level=1, block_size=4096))
    ds = pstream.DStream()
    ds.decompress(archive[:len(archive) // 2], 1 << 30)
    assert not ds.finished
    with pytest.raises(ZxcError):
        pstream.stream_decompress(archive[:len(archive) - 4])


def test_dstream_seekable_passthrough():
    data = _data(60_000, seed=6)
    archive = frame.compress(data, EncodeOpts(level=3, block_size=4096,
                                              seekable=True, checksum=True))
    assert pstream.stream_decompress(archive, checksum=True) == data


def test_dstream_reference_archive():
    data = _data(150_000, seed=7)
    archive = ref_oracle.ref_compress(data, level=4, block_size=16384,
                                      checksum=True, seekable=True)
    assert pstream.stream_decompress(archive, checksum=True, chunk=1333) == data


def test_dstream_sticky_error():
    data = _data(20_000, seed=8)
    archive = bytearray(frame.compress(data, EncodeOpts(level=1,
                                                        block_size=4096,
                                                        checksum=True)))
    archive[40] ^= 0xFF  # corrupt payload
    ds = pstream.DStream(checksum=True)
    with pytest.raises(ZxcError):
        ds.decompress(bytes(archive), 1 << 30)
    with pytest.raises(ZxcError):  # sticky: every later call re-raises
        ds.decompress(b"more", 1 << 30)


def test_dstream_input_after_end_rejected():
    data = _data(5000, seed=9)
    archive = frame.compress(data, EncodeOpts(level=1, block_size=4096))
    ds = pstream.DStream()
    ds.decompress(archive, 1 << 30)
    with pytest.raises(ZxcError):
        ds.decompress(b"extra", 1 << 30)


def test_cstream_dict_rejected():
    with pytest.raises(ZxcError):
        pstream.CStream(dict_content=b"dict bytes")
    with pytest.raises(ZxcError):
        pstream.DStream(dict_content=b"dict bytes")


def test_cstream_empty_input():
    cs = pstream.CStream(level=3)
    out = bytearray()
    while not cs.finished:
        out += cs.end(1 << 30)
    assert frame.decompress(bytes(out)) == b""
