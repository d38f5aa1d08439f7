"""Multi-threaded one-shot frame decode (zxch_decompress_frame_mt).

The reference decodes archives through its pthread stream engine
(zxc_driver.c:639-1035: N workers with thread-local dctx + an ordering
writer) and its seekable MT range decode (zxc_seekable.c:1005-1123:
fork-join, striped blocks). Our format decodes blocks to deterministic
i*block_size offsets, so the MT frame decode is a fork-join pool over
contiguous block ranges with bit-identical semantics to the sequential
walk — these tests pin that equivalence: bytes, error codes, checksum
verification, dictionaries, and degenerate shapes.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from gen_corpus import gen_corpus
from zxc_tpu import runtime
from zxc_tpu.codec import frame
from zxc_tpu.codec.frame import DecodeOpts, EncodeOpts
from zxc_tpu.errors import ZxcError

pytestmark = pytest.mark.skipif(runtime.lib() is None,
                                reason="native library unavailable")

BS = 64 * 1024


def _corpus(n):
    return gen_corpus(n)


@pytest.mark.parametrize("level", [1, 2, 3, 5, 6])
@pytest.mark.parametrize("threads", [2, 3, 8])
def test_mt_roundtrip_levels(level, threads):
    raw = _corpus(2 << 20)
    arc = frame.compress(raw, EncodeOpts(level=level, block_size=BS))
    assert frame.decompress(arc, DecodeOpts(threads=threads)) == raw


@pytest.mark.parametrize("threads", [2, 4])
def test_mt_checksum_verify(threads):
    raw = _corpus(1 << 20)
    arc = frame.compress(raw, EncodeOpts(level=3, block_size=BS,
                                         checksum=True))
    assert frame.decompress(
        arc, DecodeOpts(threads=threads, checksum=True)) == raw


def test_mt_detects_corrupt_block_checksum():
    raw = _corpus(1 << 20)
    arc = bytearray(frame.compress(raw, EncodeOpts(level=3, block_size=BS,
                                                   checksum=True)))
    # flip one payload byte mid-archive: per-block rapidhash must fail
    arc[len(arc) // 2] ^= 0xFF
    with pytest.raises(ZxcError):
        frame.decompress(bytes(arc), DecodeOpts(threads=4, checksum=True))


def test_mt_error_code_matches_sequential():
    raw = _corpus(1 << 20)
    base = frame.compress(raw, EncodeOpts(level=3, block_size=BS,
                                          checksum=True))
    rng = np.random.default_rng(7)
    checked = 0
    for _ in range(40):
        arc = bytearray(base)
        i = int(rng.integers(16, len(arc) - 12))
        arc[i] ^= int(rng.integers(1, 256))
        blob = bytes(arc)
        try:
            seq = frame.decompress(blob, DecodeOpts(threads=1,
                                                    checksum=True))
            seq_err = None
        except ZxcError as e:
            seq_err = e.code
        try:
            mt = frame.decompress(blob, DecodeOpts(threads=4,
                                                   checksum=True))
            mt_err = None
        except ZxcError as e:
            mt_err = e.code
        if seq_err is None:
            assert mt_err is None and mt == seq
        else:
            assert mt_err == seq_err, (i, seq_err, mt_err)
            checked += 1
    assert checked > 0  # the sweep actually exercised corrupt paths


def test_mt_dictionary_frames():
    from zxc_tpu.codec import dict_train
    rng = np.random.default_rng(3)
    seg = bytes(rng.integers(97, 105, 400, dtype=np.uint8))
    samples = [seg + bytes(rng.integers(0, 256, 200, dtype=np.uint8))
               for _ in range(50)]
    d = dict_train.dict_train(samples, target_size=4096)
    raw = b"".join(samples[:40])
    eo = EncodeOpts(level=3, block_size=BS, dict_content=d.content,
                    dict_huf=d.huf_lengths)
    arc = frame.compress(raw, eo)
    do = DecodeOpts(threads=4, dict_content=d.content,
                    dict_huf=d.huf_lengths)
    assert frame.decompress(arc, do) == raw


@pytest.mark.parametrize("size", [0, 1, BS - 1, BS, BS + 1,
                                  3 * BS + 777])
def test_mt_odd_sizes(size):
    raw = _corpus(size) if size else b""
    arc = frame.compress(raw, EncodeOpts(level=2, block_size=BS))
    assert frame.decompress(arc, DecodeOpts(threads=4)) == raw


def test_mt_threads_exceed_blocks():
    raw = _corpus(BS + 17)  # 2 blocks, 64 threads requested
    arc = frame.compress(raw, EncodeOpts(level=1, block_size=BS))
    assert frame.decompress(arc, DecodeOpts(threads=64)) == raw


def test_mt_incompressible_raw_blocks():
    rng = np.random.default_rng(11)
    raw = bytes(rng.integers(0, 256, (2 << 20) + 123, dtype=np.uint8))
    arc = frame.compress(raw, EncodeOpts(level=1, block_size=BS))
    assert frame.decompress(arc, DecodeOpts(threads=4)) == raw


def test_mt_matches_sequential_bytes_exactly():
    raw = _corpus(4 << 20)
    for level in (1, 3):
        arc = frame.compress(raw, EncodeOpts(level=level, block_size=BS))
        a = frame.decompress(arc, DecodeOpts(threads=1))
        b = frame.decompress(arc, DecodeOpts(threads=5))
        assert a == b == raw


# -- MT frame ENCODE (zxch_compress_frame_mt): byte-identical archives --

@pytest.mark.parametrize("level", [1, 2, 3, 5, 6])
def test_mt_encode_bytes_identical(level):
    raw = _corpus(1 << 20)
    a = frame.compress(raw, EncodeOpts(level=level, block_size=BS))
    b = frame.compress(raw, EncodeOpts(level=level, block_size=BS,
                                       threads=4))
    assert a == b
    assert frame.decompress(b) == raw


@pytest.mark.parametrize("checksum,seekable", [(True, False), (False, True),
                                               (True, True)])
def test_mt_encode_checksum_seekable(checksum, seekable):
    raw = _corpus(1 << 20)
    eo1 = EncodeOpts(level=3, block_size=BS, checksum=checksum,
                     seekable=seekable)
    eo4 = EncodeOpts(level=3, block_size=BS, checksum=checksum,
                     seekable=seekable, threads=4)
    a = frame.compress(raw, eo1)
    b = frame.compress(raw, eo4)
    assert a == b
    assert frame.decompress(b, DecodeOpts(checksum=checksum)) == raw


def test_mt_encode_with_dictionary():
    from zxc_tpu.codec import dict_train
    rng = np.random.default_rng(9)
    seg = bytes(rng.integers(97, 105, 400, dtype=np.uint8))
    samples = [seg + bytes(rng.integers(0, 256, 200, dtype=np.uint8))
               for _ in range(50)]
    d = dict_train.dict_train(samples, target_size=4096)
    raw = b"".join(samples[:40])
    kw = dict(level=3, block_size=16384, dict_content=d.content,
              dict_huf=d.huf_lengths)
    a = frame.compress(raw, EncodeOpts(**kw))
    b = frame.compress(raw, EncodeOpts(**kw, threads=4))
    assert a == b
    do = DecodeOpts(threads=3, dict_content=d.content,
                    dict_huf=d.huf_lengths)
    assert frame.decompress(b, do) == raw


def test_mt_encode_dict_switch_between_frames():
    # the per-thread dict staging re-copies per frame (epoch tag): two
    # frames with DIFFERENT dicts back-to-back must not reuse a stale
    # prefix in any worker
    from zxc_tpu.codec import dict_train
    rng = np.random.default_rng(13)
    mk = lambda seed: dict_train.dict_train(
        [bytes(np.random.default_rng(seed + i).integers(
            97, 120, 600, dtype=np.uint8)) for i in range(40)],
        target_size=2048)
    d1, d2 = mk(100), mk(500)
    raw = _corpus(256 * 1024)
    for d in (d1, d2, d1):
        kw = dict(level=2, block_size=16384, dict_content=d.content,
                  dict_huf=d.huf_lengths)
        a = frame.compress(raw, EncodeOpts(**kw))
        b = frame.compress(raw, EncodeOpts(**kw, threads=4))
        assert a == b


def test_mt_encode_small_input_delegates():
    raw = _corpus(1000)  # below one block: sequential path
    a = frame.compress(raw, EncodeOpts(level=3, block_size=BS))
    b = frame.compress(raw, EncodeOpts(level=3, block_size=BS, threads=8))
    assert a == b


# -- review-finding regressions (round 4) --

def _hash8(b: bytes) -> int:
    from zxc_tpu.format.hashes import hash8
    return hash8(b)


def test_mt_short_nonfinal_block_falls_back_to_sequential():
    """A conforming-per-format archive whose non-final block decodes to
    less than block_size breaks the i*block_size offset mapping AND can
    overflow the footer-sized buffer at strided offsets — the MT path
    must take the sequential fallback (which decodes it fine), not
    return a capacity error (review finding)."""
    from zxc_tpu.format import headers
    from zxc_tpu import constants as C
    bs = 4096
    part0 = bytes(range(10))
    part1 = os.urandom(bs)
    arc = bytearray(headers.write_file_header(bs, False))
    arc += headers.write_block_header(0, len(part0)) + part0
    arc += headers.write_block_header(0, len(part1)) + part1
    arc += headers.write_block_header(C.BLOCK_EOF, 0)
    arc += headers.write_file_footer(len(part0) + len(part1), 0, False)
    blob = bytes(arc)
    seq = frame.decompress(blob, DecodeOpts(threads=1))
    mt = frame.decompress(blob, DecodeOpts(threads=4))
    assert seq == mt == part0 + part1


def test_mt_verify_semantics_match_sequential_without_checksums():
    """Sequential checks `stored_hash != ghash` under verify even for
    non-checksum frames (ghash stays 0); the MT path must reject the
    same archives with the same -7 (review finding)."""
    import ctypes
    import numpy as np
    L = runtime.lib()
    raw = _corpus(256 * 1024)
    arc = bytearray(frame.compress(raw, EncodeOpts(level=1, block_size=BS,
                                                   checksum=False)))
    arc[-4:] = b"\xde\xad\xbe\xef"  # nonzero footer hash, no checksums
    blob = bytes(arc)
    src = np.frombuffer(blob, np.uint8)
    out = np.zeros(len(raw) + (1 << 17), np.uint8)
    vp = ctypes.c_void_p
    rcs = []
    for t in (1, 4):
        rcs.append(L.zxch_decompress_frame_mt(
            src.ctypes.data_as(vp), len(blob), BS, 0, 1,
            None, 0, None, out.ctypes.data_as(vp), len(out), t))
    assert rcs[0] == rcs[1] == -7, rcs


def test_mt_concurrent_frames_with_different_dicts():
    """Two Python threads MT-encoding frames with DIFFERENT dicts
    concurrently must both produce their sequential bytes (the
    per-frame epoch snapshot; review finding: a global epoch re-read
    per block let one frame's workers tag the other frame's epoch on a
    stale dict prefix)."""
    import threading
    from zxc_tpu.codec import dict_train
    mk = lambda seed: dict_train.dict_train(
        [bytes(np.random.default_rng(seed + i).integers(
            97, 120, 600, dtype=np.uint8)) for i in range(40)],
        target_size=2048)
    d1, d2 = mk(300), mk(900)
    raw = _corpus(512 * 1024)
    kws = [dict(level=2, block_size=16384, dict_content=d.content,
                dict_huf=d.huf_lengths) for d in (d1, d2)]
    expected = [frame.compress(raw, EncodeOpts(**kw)) for kw in kws]
    results = {}

    def job(idx):
        for _ in range(6):
            results.setdefault(idx, []).append(
                frame.compress(raw, EncodeOpts(**kws[idx], threads=4)))

    ts = [threading.Thread(target=job, args=(i,)) for i in (0, 1)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    for idx in (0, 1):
        for got in results[idx]:
            assert got == expected[idx], f"dict {idx} archive corrupted"
