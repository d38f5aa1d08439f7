"""Device (jnp) decode path vs host oracle: conformance + roundtrips."""
import os
import glob

import numpy as np
import pytest

from zxc_tpu.codec import frame
from zxc_tpu.codec.frame import DecodeOpts, EncodeOpts
from zxc_tpu import ops
from zxc_tpu.errors import ZxcError

import ref_oracle
from test_conformance import VALID, INVALID, _opts_for


@pytest.mark.parametrize("path", VALID, ids=[os.path.basename(p) for p in VALID])
def test_device_conformance_valid(path):
    archive = open(path, "rb").read()
    expected = open(os.path.splitext(path)[0] + ".expected", "rb").read()
    got = ops.decompress(archive, _opts_for(path))
    assert got == expected


@pytest.mark.parametrize("path", INVALID, ids=[os.path.basename(p) for p in INVALID])
def test_device_conformance_invalid(path):
    archive = open(path, "rb").read()
    with pytest.raises(ZxcError):
        ops.decompress(archive, DecodeOpts(checksum=True))


@pytest.mark.parametrize("level", [1, 2, 3, 4, 5, 6, 7])
def test_device_roundtrip_levels(level):
    rng = np.random.default_rng(level)
    # compressible: repeated segments + noise
    seg = rng.integers(0, 256, 997, dtype=np.uint8).tobytes()
    data = (seg * 40 + rng.integers(0, 256, 5000, dtype=np.uint8).tobytes()
            + b"A" * 3000 + seg[:500])
    archive = frame.compress(data, EncodeOpts(level=level, block_size=4096,
                                              checksum=True))
    assert ops.decompress(archive, DecodeOpts(checksum=True)) == data


def test_device_matches_host_on_ref_archives():
    """Reference-encoded multi-block frames decode identically on device."""
    rng = np.random.default_rng(7)
    base = rng.integers(0, 64, 300_000, dtype=np.uint8).tobytes()
    data = base + base[:100_000] + bytes(50_000) + base[50_000:150_000]
    for level in (1, 3, 6):
        archive = ref_oracle.ref_compress(data, level=level, block_size=65536)
        host = frame.decompress(archive)
        dev = ops.decompress(archive)
        assert dev == host == data


def test_device_empty_and_tiny():
    for data in (b"", b"x", b"ab" * 3):
        archive = frame.compress(data, EncodeOpts(level=3))
        assert ops.decompress(archive) == data


def test_device_off1_run_heavy():
    """off==1 fills and short-period overlaps stress the modulo collapse."""
    data = b"\x00" * 100_000 + b"abc" * 30_000 + b"zy" * 20_000
    archive = frame.compress(data, EncodeOpts(level=3, block_size=32768))
    assert ops.decompress(archive) == data


def test_device_chained_matches():
    """Deep cross-match chains exercise the pointer-doubling while loop."""
    rng = np.random.default_rng(11)
    piece = rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
    data = piece
    for _ in range(200):
        data += data[-64:]
    archive = frame.compress(bytes(data), EncodeOpts(level=5, block_size=16384))
    assert ops.decompress(archive) == bytes(data)
