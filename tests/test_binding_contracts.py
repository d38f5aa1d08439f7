"""Binding-contract harness: execute each language wrapper's EXACT C-ABI
call sequences against the built libzxchost.so, asserting the same
results the Rust/Go/Node test suites assert.

The Rust/Go/Node toolchains are absent in this image, so their runtime
suites cannot execute (tests/test_bindings.py carries the 3 skips). The
contracts those suites check are pure C-ABI behavior, though — this
module replays them through ctypes: same symbols, same argument
patterns (caller-allocated exact-size buffers, bound-then-call, handle
lifecycles, drip-feed loops), same assertions. A binding bug that is
NOT covered here is a marshalling bug in the wrapper language itself;
everything the wrapper delegates to the library is executed.

Sources mirrored:
  wrappers/go/zxc_test.go        (TestRoundtrip, TestCorruptRejected,
                                  TestDictionaryRoundtrip, TestTrainDictionary)
  wrappers/rust/zxc/src/lib.rs   (mod tests: roundtrip_all_levels,
                                  dict_roundtrip, dict_train, corrupt_rejected)
  wrappers/nodejs/test/test.js   (inline script: levels, corrupt, dict,
                                  trainDict)
plus the call sequences of the wrapper METHODS the suites construct:
  CStream/DStream drip-feed (Rust CStream::compress/end, Go CStream),
  Cctx/Dctx lifecycle incl. static workspace, MT one-shots.
"""
import ctypes
import os

import numpy as np
import pytest

from zxc_tpu import runtime

L = runtime.lib()
pytestmark = pytest.mark.skipif(L is None, reason="native library absent")

u64, i64, u32, ci, vp = (ctypes.c_uint64, ctypes.c_int64, ctypes.c_uint32,
                         ctypes.c_int, ctypes.c_void_p)


def _bind():
    """Bind exactly the symbols the wrappers bind, with their types."""
    sigs = {
        "zxch_compress_bound": (i64, [u64, u64]),
        "zxch_simple_compress": (i64, [vp, u64, ci, u64, ci, ci, vp, u64]),
        "zxch_simple_compress_mt": (i64, [vp, u64, ci, u64, ci, ci, vp,
                                          u64, ci]),
        "zxch_simple_compress_dict": (i64, [vp, u64, ci, u64, ci, ci, vp,
                                            u64, vp, vp, u64]),
        "zxch_get_decompressed_size": (i64, [vp, u64]),
        "zxch_simple_decompress_bound": (i64, [vp, u64]),
        "zxch_simple_decompress": (i64, [vp, u64, vp, u64, vp, u64, vp,
                                         ci]),
        "zxch_simple_decompress_mt": (i64, [vp, u64, vp, u64, vp, u64, vp,
                                            ci, ci]),
        "zxch_frame_info": (ci, [vp, u64, vp, vp, vp]),
        "zxch_seekable_range": (i64, [vp, u64, u64, u64, vp, u64, vp, u64,
                                      vp]),
        "zxch_dict_id": (u32, [vp, u64, vp]),
        "zxch_dict_train": (i64, [vp, vp, ci, u64, vp, u64]),
        "zxch_cstream_new": (vp, [ci, u64, ci, ci]),
        "zxch_cstream_compress": (i64, [vp, vp, u64, vp, u64, vp]),
        "zxch_cstream_end": (i64, [vp, vp, u64]),
        "zxch_cstream_finished": (ci, [vp]),
        "zxch_cstream_in_size": (u64, [vp]),
        "zxch_cstream_out_size": (u64, [vp]),
        "zxch_cstream_free": (None, [vp]),
        "zxch_dstream_new": (vp, [ci]),
        "zxch_dstream_decompress": (i64, [vp, vp, u64, vp, u64, vp]),
        "zxch_dstream_finished": (ci, [vp]),
        "zxch_dstream_out_size": (u64, [vp]),
        "zxch_dstream_free": (None, [vp]),
        "zxch_cctx_new": (vp, []),
        "zxch_cctx_set": (ci, [vp, ci, u64, ci, ci]),
        "zxch_cctx_attach_dict": (ci, [vp, vp, u64, vp]),
        "zxch_cctx_compress": (i64, [vp, vp, u64, vp, u64]),
        "zxch_cctx_free": (None, [vp]),
        "zxch_dctx_new": (vp, [ci]),
        "zxch_dctx_attach_dict": (ci, [vp, vp, u64, vp]),
        "zxch_dctx_decompress": (i64, [vp, vp, u64, vp, u64]),
        "zxch_dctx_free": (None, [vp]),
        "zxch_cctx_static_size": (u64, [u64]),
        "zxch_dctx_static_size": (u64, [u64]),
        "zxch_cctx_init_static": (vp, [vp, u64, ci, u64, ci, ci, u64]),
        "zxch_dctx_init_static": (vp, [vp, u64, ci, u64]),
    }
    b = {}
    for name, (res, args) in sigs.items():
        fn = getattr(L, name)
        fn.restype = res
        fn.argtypes = args
        b[name] = fn
    return b


F = _bind() if L is not None else {}


def buf(data: bytes):
    a = np.frombuffer(data, np.uint8)
    return a, a.ctypes.data_as(vp)


def out_buf(n: int):
    a = np.empty(max(n, 1), np.uint8)
    return a, a.ctypes.data_as(vp)


# -- corpora exactly as the wrappers build them ------------------------------

def go_corpus() -> bytes:
    text = b"the quick brown fox jumps over the dog " * 3000
    return text + bytes((i * 7) % 251 for i in range(60000))


def rust_corpus() -> bytes:
    return b"the quick brown fox " * 4000 + \
        bytes((i * 7) % 251 for i in range(50000))


def _compress(data: bytes, level=3, block_size=0, checksum=0, seekable=0,
              threads=0) -> bytes:
    src, sp = buf(data)
    cap = F["zxch_compress_bound"](len(data), block_size)
    assert cap > 0
    dst, dp = out_buf(cap)
    if threads:
        w = F["zxch_simple_compress_mt"](sp, len(data), level, block_size,
                                         checksum, seekable, dp, cap,
                                         threads)
    else:
        w = F["zxch_simple_compress"](sp, len(data), level, block_size,
                                      checksum, seekable, dp, cap)
    assert w > 0, f"compress rc={w}"
    return dst[:w].tobytes()


def _decompress(arc: bytes, verify=1, threads=0):
    """Returns bytes, or the negative rc (the wrappers map rc<0 to an
    error/exception)."""
    src, sp = buf(arc)
    bound = F["zxch_simple_decompress_bound"](sp, len(arc))
    if bound < 0:
        return int(bound)
    dst, dp = out_buf(bound)
    if threads:
        w = F["zxch_simple_decompress_mt"](sp, len(arc), dp, bound,
                                           None, 0, None, verify, threads)
    else:
        w = F["zxch_simple_decompress"](sp, len(arc), dp, bound,
                                        None, 0, None, verify)
    if w < 0:
        return int(w)
    return dst[:w].tobytes()


def _frame_info(arc: bytes):
    src, sp = buf(arc)
    bs = u64(0)
    ck = ci(0)
    did = u32(0)
    rc = F["zxch_frame_info"](sp, len(arc), ctypes.byref(bs),
                              ctypes.byref(ck), ctypes.byref(did))
    return rc, int(bs.value), int(ck.value), int(did.value)


# -- Go wrappers/go/zxc_test.go ---------------------------------------------

def test_go_roundtrip_contract():
    data = go_corpus()
    for level in (1, 2, 3, 5):
        arc = _compress(data, level=level, checksum=1, seekable=1)
        assert len(arc) < len(data), f"level {level}: no compression"
        src, sp = buf(arc)
        assert F["zxch_get_decompressed_size"](sp, len(arc)) == len(data)
        out = _decompress(arc, verify=1)
        assert out == data, f"level {level}: roundtrip mismatch"
        dst, dp = out_buf(5000)
        w = F["zxch_seekable_range"](sp, len(arc), 60000, 5000, dp, 5000,
                                     None, 0, None)
        assert w == 5000 and dst[:w].tobytes() == data[60000:65000]
        rc, bs, ck, did = _frame_info(arc)
        assert rc == 0 and ck == 1


def test_go_corrupt_rejected_contract():
    data = go_corpus()
    arc = _compress(data, level=3, checksum=1)
    for bad in (arc[:40], b"\x01\x02\x03", b""):
        assert isinstance(_decompress(bad, verify=1), int), \
            "truncated archive accepted"
    mut = bytearray(arc)
    mut[100] ^= 0xFF
    assert isinstance(_decompress(bytes(mut), verify=1), int), \
        "corrupted archive accepted"


def _compress_dict(data: bytes, dict_content: bytes, level=3, block_size=0,
                   checksum=0) -> bytes:
    src, sp = buf(data)
    d, dpp = buf(dict_content)
    cap = F["zxch_compress_bound"](len(data), block_size)
    dst, dp = out_buf(cap)
    w = F["zxch_simple_compress_dict"](sp, len(data), level, block_size,
                                       checksum, 0, d.ctypes.data_as(vp),
                                       len(dict_content), None, dp, cap)
    assert w > 0, f"compress_dict rc={w}"
    return dst[:w].tobytes()


def _decompress_dict(arc: bytes, dict_content: bytes, verify=1):
    src, sp = buf(arc)
    d, dpp = buf(dict_content)
    bound = F["zxch_simple_decompress_bound"](sp, len(arc))
    if bound < 0:
        return int(bound)
    dst, dp = out_buf(bound)
    w = F["zxch_simple_decompress"](sp, len(arc), dp, bound, dpp,
                                    len(dict_content), None, verify)
    if w < 0:
        return int(w)
    return dst[:w].tobytes()


def test_go_dictionary_roundtrip_contract():
    dict_content = b"shared dict content: json rows with common keys " * 40
    data = b"json rows with common keys and payload 12345 " * 30
    arc = _compress_dict(data, dict_content, level=3, checksum=1)
    rc, bs, ck, did = _frame_info(arc)
    d, dp = buf(dict_content)
    expect_id = F["zxch_dict_id"](dp, len(dict_content), None)
    assert rc == 0 and did != 0 and did == expect_id
    assert _decompress_dict(arc, dict_content, verify=1) == data
    assert isinstance(_decompress(arc, verify=1), int), \
        "decode without dict must fail"


def test_go_train_dictionary_contract():
    samples = [b"json rows with common keys and payload " * (20 + i)
               for i in range(12)]
    flat = b"".join(samples)
    fa, fp = buf(flat)
    sizes = np.array([len(s) for s in samples], np.uint64)
    blob, bp = out_buf(16 + 65536 + 128)
    n = F["zxch_dict_train"](fp, sizes.ctypes.data_as(vp), len(samples),
                             4096, bp, len(blob))
    assert n > 16 + 128, f"train rc={n}"
    zxd = blob[:n].tobytes()
    # parse the .zxd the way the wrappers do (format/dictionary parity)
    from zxc_tpu.format.dictionary import Dictionary
    dd = Dictionary.load(zxd)
    content, huf = dd.content, dd.huf_lengths
    assert len(content) > 0 and huf is not None and len(huf) == 128
    from zxc_tpu.codec import huffman
    cl = huffman.unpack_lengths(bytes(huf))
    assert len(cl) == 256
    data = samples[0]
    plain = _compress(data, level=3, block_size=4096)
    # trained dict + table (wrappers pass the unpacked code lengths)
    src, sp = buf(data)
    d, dpp = buf(bytes(content))
    cl8 = np.ascontiguousarray(cl, np.uint8)
    cap = F["zxch_compress_bound"](len(data), 4096)
    dst, dp = out_buf(cap)
    w = F["zxch_simple_compress_dict"](sp, len(data), 3, 4096, 0, 0,
                                       dpp, len(content),
                                       cl8.ctypes.data_as(vp), dp, cap)
    assert w > 0
    arc = dst[:w].tobytes()
    assert len(arc) < len(plain), "trained dict must improve ratio"
    a, ap = buf(arc)
    bound = F["zxch_simple_decompress_bound"](ap, len(arc))
    o, op = out_buf(bound)
    w2 = F["zxch_simple_decompress"](ap, len(arc), op, bound, dpp,
                                     len(content),
                                     cl8.ctypes.data_as(vp), 1)
    assert w2 == len(data) and o[:w2].tobytes() == data
    # empty samples must fail
    n = F["zxch_dict_train"](None, None, 0, 1024, bp, len(blob))
    assert n < 0


# -- Rust wrappers/rust/zxc/src/lib.rs mod tests ----------------------------

def test_rust_roundtrip_all_levels_contract():
    data = rust_corpus()
    for level in (1, 2, 3, 5):
        arc = _compress(data, level=level, checksum=1, seekable=1)
        assert len(arc) < len(data)
        src, sp = buf(arc)
        assert F["zxch_get_decompressed_size"](sp, len(arc)) == len(data)
        assert _decompress(arc, verify=1) == data
        dst, dp = out_buf(5000)
        w = F["zxch_seekable_range"](sp, len(arc), 60000, 5000, dp, 5000,
                                     None, 0, None)
        assert w == 5000 and dst[:w].tobytes() == data[60000:65000]
        rc, bs, ck, did = _frame_info(arc)
        assert rc == 0 and ck == 1


def test_rust_dict_and_corrupt_contracts():
    dict_content = b"json rows with common keys " * 80
    data = b"json rows with common keys and payload 42 " * 100
    arc = _compress_dict(data, dict_content, checksum=1)
    rc, bs, ck, did = _frame_info(arc)
    d, dp = buf(dict_content)
    assert did != 0 and did == F["zxch_dict_id"](dp, len(dict_content),
                                                 None)
    assert _decompress_dict(arc, dict_content, verify=1) == data
    assert isinstance(_decompress(arc, verify=1), int)
    data2 = rust_corpus()
    arc2 = _compress(data2, checksum=1)
    assert isinstance(_decompress(arc2[:40], verify=1), int)
    mut = bytearray(arc2)
    mut[100] ^= 0xFF
    assert isinstance(_decompress(bytes(mut), verify=1), int)


# -- Node wrappers/nodejs/test/test.js --------------------------------------

def test_node_script_contract():
    data = (b"the quick brown fox " * 4000
            + bytes((i * 7) % 251 for i in range(50000)))
    for level in (1, 2, 3, 5):
        arc = _compress(data, level=level, checksum=1, seekable=1)
        assert len(arc) < len(data)
        src, sp = buf(arc)
        assert F["zxch_get_decompressed_size"](sp, len(arc)) == len(data)
        assert _decompress(arc) == data
        dst, dp = out_buf(5000)
        w = F["zxch_seekable_range"](sp, len(arc), 60000, 5000, dp, 5000,
                                     None, 0, None)
        assert w == 5000 and dst[:w].tobytes() == data[60000:65000]
        assert _frame_info(arc)[2] == 1
    arc = _compress(data, level=3, checksum=1)
    for mut in (arc[:40], b"\x01\x02\x03"):
        assert isinstance(_decompress(mut), int)
    bad = bytearray(arc)
    bad[100] ^= 0xFF
    assert isinstance(_decompress(bytes(bad)), int)
    # dict section (Buffer.alloc pads/truncates the fill pattern)
    fill = b"json rows with common keys "
    dict_content = (fill * (2048 // len(fill) + 1))[:2048]
    fill2 = b"json rows with common keys and vals "
    small = (fill2 * (4096 // len(fill2) + 1))[:4096]
    darc = _compress_dict(small, dict_content, level=3, checksum=1)
    assert _frame_info(darc)[3] != 0
    assert _decompress_dict(darc, dict_content) == small
    assert isinstance(_decompress(darc), int)


# -- wrapper METHOD sequences (CStream/DStream/Cctx/Dctx/MT) ----------------

def test_cstream_dstream_dripfeed_contract():
    """Rust CStream::compress/end + DStream loops, 1-byte drip-feed
    included (Go CStream/DStream make the identical calls)."""
    data = go_corpus()[:100_000]
    h = F["zxch_cstream_new"](2, 65536, 1, 0)
    assert h
    cap = F["zxch_cstream_out_size"](h)
    assert cap > 0
    dst, dp = out_buf(cap)
    produced = bytearray()
    pos = 0
    # push in awkward chunk sizes incl. single bytes (pstream drip-feed)
    chunks = [1, 1, 7, 130, 65536, len(data)]
    src, sp = buf(data)
    while pos < len(data):
        push = min(chunks[min(pos % len(chunks), len(chunks) - 1)],
                   len(data) - pos)
        consumed = u64(0)
        n = F["zxch_cstream_compress"](
            h, ctypes.c_void_p(sp.value + pos), push, dp, cap,
            ctypes.byref(consumed))
        assert n >= 0, f"cstream rc={n}"
        produced += dst[:n].tobytes()
        assert consumed.value <= push
        pos += consumed.value
    while not F["zxch_cstream_finished"](h):
        n = F["zxch_cstream_end"](h, dp, cap)
        assert n >= 0
        produced += dst[:n].tobytes()
    F["zxch_cstream_free"](h)
    arc = bytes(produced)

    dh = F["zxch_dstream_new"](1)
    assert dh
    dcap = F["zxch_dstream_out_size"](dh)
    ob, op = out_buf(dcap)
    got = bytearray()
    a, ap = buf(arc)
    pos = 0
    while pos < len(arc):
        push = min(997, len(arc) - pos)   # prime-size drip
        consumed = u64(0)
        n = F["zxch_dstream_decompress"](
            dh, ctypes.c_void_p(ap.value + pos), push, op, dcap,
            ctypes.byref(consumed))
        assert n >= 0, f"dstream rc={n}"
        got += ob[:n].tobytes()
        assert consumed.value > 0 or n > 0, "no progress"
        pos += consumed.value
    assert F["zxch_dstream_finished"](dh)
    F["zxch_dstream_free"](dh)
    assert bytes(got) == data


def test_ctx_lifecycle_contract():
    """Rust Cctx/Dctx method sequence: new -> set -> attach_dict ->
    compress xN -> free; plus the static-workspace variant."""
    data = b"context lifecycle payload " * 2000
    dict_content = b"context lifecycle " * 100
    src, sp = buf(data)
    d, dp = buf(dict_content)
    cap = F["zxch_compress_bound"](len(data), 65536)
    dst, dstp = out_buf(cap)

    h = F["zxch_cctx_new"]()
    assert h
    assert F["zxch_cctx_set"](h, 3, 65536, 1, 0) == 0
    assert F["zxch_cctx_attach_dict"](h, dp, len(dict_content), None) == 0
    sizes = set()
    for _ in range(3):   # sticky options: repeat calls, identical bytes
        w = F["zxch_cctx_compress"](h, sp, len(data), dstp, cap)
        assert w > 0
        sizes.add(dst[:w].tobytes())
    assert len(sizes) == 1, "cctx repeat compress must be deterministic"
    arc = sizes.pop()
    F["zxch_cctx_free"](h)

    dh = F["zxch_dctx_new"](1)
    assert F["zxch_dctx_attach_dict"](dh, dp, len(dict_content), None) == 0
    a, ap = buf(arc)
    # the Rust wrapper sizes dst from zxch_simple_decompress_bound
    bound = F["zxch_simple_decompress_bound"](ap, len(arc))
    assert bound >= len(data)
    ob, op = out_buf(bound)
    w = F["zxch_dctx_decompress"](dh, ap, len(arc), op, bound)
    assert w == len(data) and ob[:w].tobytes() == data
    F["zxch_dctx_free"](dh)

    # static workspace: too-small rejected, exact works, free is a no-op
    need = F["zxch_cctx_static_size"](len(dict_content))
    assert need > 0
    assert not F["zxch_cctx_init_static"](None, 0, 3, 65536, 0, 0,
                                          len(dict_content))
    ws = np.zeros(need, np.uint8)
    wsp = ws.ctypes.data_as(vp)
    sh = F["zxch_cctx_init_static"](wsp, need, 3, 65536, 1, 0,
                                    len(dict_content))
    assert sh
    assert F["zxch_cctx_attach_dict"](sh, dp, len(dict_content), None) == 0
    w = F["zxch_cctx_compress"](sh, sp, len(data), dstp, cap)
    assert w > 0 and dst[:w].tobytes() == arc, \
        "static context must produce the heap context's bytes"
    F["zxch_cctx_free"](sh)  # no-op by contract


def test_mt_oneshot_contract():
    """Go CompressMT/DecompressMT: bytes and error codes identical at
    every thread count."""
    data = go_corpus()
    base = _compress(data, level=2, block_size=65536, checksum=1)
    for t in (2, 4):
        assert _compress(data, level=2, block_size=65536, checksum=1,
                         threads=t) == base
        assert _decompress(base, verify=1, threads=t) == data
    mut = bytearray(base)
    mut[100] ^= 0xFF
    rc1 = _decompress(bytes(mut), verify=1, threads=1)
    rc4 = _decompress(bytes(mut), verify=1, threads=4)
    assert isinstance(rc1, int) and rc1 == rc4, \
        "MT decode error code must match sequential"
