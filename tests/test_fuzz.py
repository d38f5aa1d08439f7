"""Fuzz-style property tests (the reference's libFuzzer targets, as
deterministic pytest sweeps): mutated/truncated archives must never crash
or mis-decode silently — only raise ZxcError; random-shaped inputs must
roundtrip; encoder/decoder must agree with the reference C library both
directions. (reference: tests/fuzz_decompress.c, fuzz_roundtrip.c)
"""
import numpy as np
import pytest

from zxc_tpu.codec import frame, pstream, seekable
from zxc_tpu.codec.frame import DecodeOpts, EncodeOpts
from zxc_tpu.errors import ZxcError

import ref_oracle


def _shapes(rng, n_cases):
    """Diverse data shapes: runs, text-ish, random, periodic, sparse."""
    for i in range(n_cases):
        kind = i % 5
        n = int(rng.integers(0, 20_000))
        if kind == 0:
            yield rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        elif kind == 1:
            seg = rng.integers(97, 123, max(rng.integers(3, 50), 3),
                               dtype=np.uint8).tobytes()
            yield (seg * (n // max(len(seg), 1) + 1))[:n]
        elif kind == 2:
            yield bytes(n)
        elif kind == 3:
            k = int(rng.integers(1, 20))
            yield (bytes(range(k)) * (n // max(k, 1) + 1))[:n]
        else:
            a = rng.integers(0, 4, n, dtype=np.uint8) * 64
            yield a.tobytes()


def test_fuzz_roundtrip_shapes():
    rng = np.random.default_rng(1)
    for i, data in enumerate(_shapes(rng, 25)):
        level = int(rng.integers(1, 8))
        bs = 1 << int(rng.integers(12, 16))
        arc = frame.compress(data, EncodeOpts(level=level, block_size=bs,
                                              checksum=bool(i % 2)))
        assert frame.decompress(arc, DecodeOpts(checksum=True)) == data, \
            (i, level, bs)


def test_fuzz_decompress_mutations_never_crash():
    """Single-byte mutations across the whole archive: either clean
    ZxcError or a decode (possibly wrong bytes when checksums are off) —
    never an unhandled exception."""
    rng = np.random.default_rng(2)
    data = (b"mutation target payload " * 300
            + rng.integers(0, 256, 2000, dtype=np.uint8).tobytes())
    arc = bytearray(frame.compress(data, EncodeOpts(level=3, block_size=4096,
                                                    checksum=True)))
    step = max(1, len(arc) // 200)
    for pos in range(0, len(arc), step):
        bad = bytearray(arc)
        bad[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            frame.decompress(bytes(bad), DecodeOpts(checksum=True))
        except ZxcError:
            pass


def test_fuzz_truncations_never_crash():
    data = b"truncate me " * 2000
    arc = frame.compress(data, EncodeOpts(level=3, block_size=4096,
                                          checksum=True))
    for cut in range(0, len(arc), max(1, len(arc) // 100)):
        with pytest.raises(ZxcError):
            frame.decompress(arc[:cut], DecodeOpts(checksum=True))
    # full archive still fine
    assert frame.decompress(arc, DecodeOpts(checksum=True)) == data


def test_fuzz_pstream_mutations():
    rng = np.random.default_rng(3)
    data = b"stream fuzz " * 500
    arc = bytearray(frame.compress(data, EncodeOpts(level=2, block_size=4096,
                                                    checksum=True)))
    for _ in range(60):
        bad = bytearray(arc)
        pos = int(rng.integers(0, len(bad)))
        bad[pos] ^= 0xFF
        ds = pstream.DStream(checksum=True)
        try:
            for off in range(0, len(bad), 777):
                ds.decompress(bytes(bad[off:off + 777]), 1 << 30)
            ds.decompress(b"", 1 << 30)
        except ZxcError:
            pass


def test_fuzz_seekable_mutations():
    rng = np.random.default_rng(4)
    data = b"seekable fuzz " * 2000
    arc = bytearray(frame.compress(data, EncodeOpts(level=3, block_size=4096,
                                                    seekable=True,
                                                    checksum=True)))
    for _ in range(60):
        bad = bytearray(arc)
        pos = int(rng.integers(0, len(bad)))
        bad[pos] ^= 0xFF
        try:
            s = seekable.Seekable.open_bytes(bytes(bad))
            s.decompress_range(0, min(5000, s.decompressed_size),
                               verify_checksum=True)
        except ZxcError:
            pass


def test_fuzz_differential_vs_reference():
    """Our decoder and the reference C decoder agree on reference-encoded
    archives; the reference decodes our archives."""
    import ctypes
    rng = np.random.default_rng(5)
    L = ref_oracle.lib()
    for i, data in enumerate(_shapes(rng, 10)):
        level = int(rng.integers(1, 8))
        ra = ref_oracle.ref_compress(data, level=level, block_size=16384)
        assert frame.decompress(ra) == data, (i, level)
        oa = frame.compress(data, EncodeOpts(level=level, block_size=16384))
        dst = ctypes.create_string_buffer(max(len(data), 1))
        opts = ref_oracle.DecompressOpts()
        n = L.zxc_decompress(oa, len(oa), dst, len(data),
                             ctypes.byref(opts))
        assert n == len(data), (i, level, n)
        assert dst.raw[:len(data)] == data, (i, level)
