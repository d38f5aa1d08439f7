"""Seekable subsystem: SEK parse, block/range queries, range decode,
reader abstraction, device-batched range decode, error paths."""
import numpy as np
import pytest

import jax

from zxc_tpu.codec import frame, seekable
from zxc_tpu.codec.frame import EncodeOpts, DecodeOpts
from zxc_tpu.errors import ZxcError

import ref_oracle

CPU = None  # resolved lazily


def _cpu():
    global CPU
    if CPU is None:
        CPU = jax.devices("cpu")[0]
    return CPU


def _data(n=300_000, seed=0):
    rng = np.random.default_rng(seed)
    seg = rng.integers(0, 256, 977, dtype=np.uint8).tobytes()
    return (seg * (n // len(seg) + 1))[:n]


@pytest.fixture(scope="module")
def arc():
    data = _data()
    archive = frame.compress(data, EncodeOpts(level=3, block_size=16384,
                                              seekable=True, checksum=True))
    return data, archive


def test_open_and_metadata(arc):
    data, archive = arc
    s = seekable.Seekable.open_bytes(archive)
    assert s.decompressed_size == len(data)
    assert s.block_size == 16384
    assert s.num_blocks == (len(data) + 16383) // 16384
    assert s.header.has_checksum


def test_non_seekable_rejected():
    archive = frame.compress(b"hello" * 1000, EncodeOpts(level=1))
    with pytest.raises(ZxcError):
        seekable.Seekable.open_bytes(archive)
    assert not seekable.is_seekable(archive)


def test_block_queries(arc):
    data, archive = arc
    s = seekable.Seekable.open_bytes(archive)
    assert s.block_of(0) == 0
    assert s.block_of(16384) == 1
    assert s.block_range(16000, 1000) == (0, 1)
    with pytest.raises(ZxcError):
        s.block_range(len(data) - 10, 100)
    with pytest.raises(ZxcError):
        s.block_of(len(data) + 5)


def test_single_block_decode(arc):
    data, archive = arc
    s = seekable.Seekable.open_bytes(archive)
    assert s.decompress_block(0, verify_checksum=True) == data[:16384]
    last = s.num_blocks - 1
    assert s.decompress_block(last) == data[last * 16384:]


@pytest.mark.parametrize("off,ln", [(0, 100), (16380, 10), (16384, 16384),
                                    (50_000, 123_456), (299_990, 10),
                                    (0, 300_000)])
def test_range_decode(arc, off, ln):
    data, archive = arc
    s = seekable.Seekable.open_bytes(archive)
    assert s.decompress_range(off, ln) == data[off:off + ln]


def test_range_decode_device(arc):
    data, archive = arc
    s = seekable.Seekable.open_bytes(archive)
    got = s.decompress_range_device(20_000, 150_000, device=_cpu())
    assert got == data[20_000:170_000]


def test_reader_callback(arc):
    data, archive = arc
    calls = []

    def read_at(off, n):
        calls.append((off, n))
        return archive[off:off + n]

    s = seekable.Seekable(read_at, len(archive))
    assert s.decompress_range(100_000, 5_000) == data[100_000:105_000]
    # random access must NOT read the whole archive
    total_read = sum(n for _, n in calls)
    assert total_read < len(archive) / 2


def test_corrupt_sek_rejected(arc):
    _, archive = arc
    s = seekable.Seekable.open_bytes(archive)
    # corrupt one SEK entry (make it absurd) — reparse must reject
    bad = bytearray(archive)
    n = s.num_blocks
    import zxc_tpu.constants as C
    sek_start = len(archive) - C.FILE_FOOTER_SIZE - n * C.SEEK_ENTRY_SIZE
    bad[sek_start:sek_start + 4] = (2 ** 31 - 1).to_bytes(4, "little")
    with pytest.raises(ZxcError):
        seekable.Seekable.open_bytes(bytes(bad))


def test_truncated_archive_rejected(arc):
    _, archive = arc
    with pytest.raises(ZxcError):
        seekable.Seekable.open_bytes(archive[:60])


def test_reference_seekable_archive():
    """Archives produced by the reference C encoder parse + range-decode."""
    data = _data(200_000, seed=3)
    archive = ref_oracle.ref_compress(data, level=3, block_size=16384,
                                      seekable=True)
    s = seekable.Seekable.open_bytes(archive)
    assert s.decompressed_size == len(data)
    assert s.decompress_range(33_000, 50_000) == data[33_000:83_000]


def test_seekable_archive_plain_decode(arc):
    """A seekable archive still decodes through the normal frame path."""
    data, archive = arc
    assert frame.decompress(archive, DecodeOpts(checksum=True)) == data


def test_open_file_adapter(tmp_path):
    data = _data(80_000, seed=9)
    archive = frame.compress(data, EncodeOpts(level=3, block_size=8192,
                                              seekable=True))
    p = tmp_path / "a.zxc"
    p.write_bytes(archive)
    s = seekable.Seekable.open_file(str(p))
    assert s.decompressed_size == len(data)
    assert s.decompress_range(10_000, 30_000) == data[10_000:40_000]


def test_block_size_getters(arc):
    """Per-block size queries (zxc_seekable_get_block_*_size parity)."""
    data, archive = arc
    s = seekable.Seekable.open_bytes(archive)
    assert sum(s.block_comp_size(i) for i in range(s.num_blocks)) <= len(archive)
    assert sum(s.block_decomp_size(i) for i in range(s.num_blocks)) == len(data)
    assert s.block_decomp_size(s.num_blocks - 1) == len(data) % 16384 or 16384
    with pytest.raises(ZxcError):
        s.block_comp_size(s.num_blocks)
    with pytest.raises(ZxcError):
        s.block_decomp_size(-1)


def test_decompress_range_mt_matches_serial():
    """MT fork-join range decode is byte-identical to the serial path
    (reference zxc_seekable_decompress_range_mt parity)."""
    rng = np.random.default_rng(31)
    data = (b"seekable mt range " * 5000
            + rng.integers(0, 256, 120000, dtype=np.uint8).tobytes()) * 2
    arc = frame.compress(data, EncodeOpts(level=3, block_size=16384,
                                          seekable=True, checksum=True))
    sk = seekable.Seekable.open_bytes(arc)
    for off, ln in ((0, 1), (5000, 100000), (len(data) - 7, 7),
                    (16384 * 3 - 5, 16384 * 4)):
        assert (sk.decompress_range_mt(off, ln, n_threads=4)
                == sk.decompress_range(off, ln) == data[off:off + ln])
