"""Dictionary trainer: trained dicts must actually help, roundtrip through
.zxd, and interop with the reference library. (reference: tests dict suite)"""
import ctypes

import numpy as np
import pytest

from zxc_tpu.codec import frame, dict_train
from zxc_tpu.codec.frame import DecodeOpts, EncodeOpts
from zxc_tpu.format.dictionary import Dictionary
from zxc_tpu.errors import ZxcError

import ref_oracle


def _samples(n=40, seed=0):
    """Small JSON-ish records sharing structure — the dict use case."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        rid = int(rng.integers(0, 10 ** 6))
        name = bytes(rng.integers(97, 123, 8, dtype=np.uint8))
        out.append(
            b'{"record_id": %d, "user_name": "%s", "status": "active", '
            b'"permissions": ["read", "write"], "created_at": '
            b'"2026-08-%02d"}' % (rid, name, (i % 28) + 1))
    return out


def test_trained_dict_improves_ratio():
    samples = _samples()
    d = dict_train.dict_train(samples, target_size=4096)
    assert 0 < len(d.content) <= 4096
    assert len(d.huf_lengths) == 128

    test_doc = _samples(5, seed=99)[0]
    plain = frame.compress(test_doc, EncodeOpts(level=6, block_size=4096))
    with_dict = frame.compress(test_doc, EncodeOpts(
        level=6, block_size=4096, dict_content=d.content,
        dict_huf=d.huf_lengths))
    assert len(with_dict) < len(plain)

    opts = DecodeOpts(dict_content=d.content, dict_huf=d.huf_lengths)
    assert frame.decompress(with_dict, opts) == test_doc


def test_dict_zxd_roundtrip():
    d = dict_train.dict_train(_samples(10), target_size=2048)
    blob = d.save()
    d2 = Dictionary.load(blob)
    assert d2.content == d.content
    assert d2.huf_lengths == d.huf_lengths
    assert d2.id == d.id


def test_dict_id_binding():
    d = dict_train.dict_train(_samples(10), target_size=2048)
    data = _samples(3, seed=5)[0]
    archive = frame.compress(data, EncodeOpts(
        level=3, dict_content=d.content, dict_huf=d.huf_lengths))
    assert frame.get_dict_id(archive) == d.id
    # wrong dict rejected
    with pytest.raises(ZxcError):
        frame.decompress(archive, DecodeOpts(dict_content=b"other dict x",
                                             dict_huf=d.huf_lengths))
    # no dict rejected
    with pytest.raises(ZxcError):
        frame.decompress(archive)


def test_trained_dict_interop_with_reference():
    """Archives we encode with our trained dict decode through the
    reference C library, and vice versa."""
    samples = _samples(20, seed=7)
    d = dict_train.dict_train(samples, target_size=4096)
    data = _samples(4, seed=42)[0]

    ours = frame.compress(data, EncodeOpts(
        level=3, block_size=4096,
        dict_content=d.content, dict_huf=d.huf_lengths))

    L = ref_oracle.lib()
    dst = ctypes.create_string_buffer(len(data) + 16)
    opts = ref_oracle.DecompressOpts()
    buf = ctypes.create_string_buffer(d.content, len(d.content))
    opts.dict = ctypes.cast(buf, ctypes.c_void_p)
    opts.dict_size = len(d.content)
    huf = ctypes.create_string_buffer(d.huf_lengths, 128)
    opts.dict_huf = ctypes.cast(huf, ctypes.c_void_p)
    n = L.zxc_decompress(ours, len(ours), dst, len(data) + 16,
                         ctypes.byref(opts))
    assert n == len(data), f"reference decode returned {n}"
    assert dst.raw[:n] == data


def test_trainer_rejects_empty():
    with pytest.raises(ZxcError):
        dict_train.train_dict([], 1024)
    with pytest.raises(ZxcError):
        dict_train.train_dict([b"abc"], 1024)  # all below KGRAM


# -- native trainer (C ABI zxch_dict_train; reference zxc_dict_train) --

def test_native_trainer_matches_python_selection():
    """The native trainer picks the same segment multiset as the NumPy
    trainer (order may differ: argsort tie order is unpinned) and an
    identical shared table."""
    from zxc_tpu import runtime
    if runtime.lib() is None:
        pytest.skip("native library unavailable")
    samples = _samples(20, seed=7)
    blob = runtime.dict_train(samples, 4096)
    d = Dictionary.load(blob)
    py_content = dict_train.train_dict(samples, 4096)
    py_table = dict_train.train_dict_huf(samples, py_content)
    segs = lambda c: sorted(c[i:i + 64] for i in range(0, len(c), 64))
    assert len(d.content) == len(py_content)
    assert segs(d.content) == segs(py_content)
    assert d.huf_lengths == py_table


def test_native_trained_dict_reference_interop():
    """A natively-trained dict compresses smaller and its archives decode
    through the reference C library."""
    from zxc_tpu import runtime
    if runtime.lib() is None:
        pytest.skip("native library unavailable")
    samples = _samples(20, seed=3)
    d = Dictionary.load(runtime.dict_train(samples, 4096))
    data = _samples(4, seed=99)[0]
    plain = frame.compress(data, EncodeOpts(level=3, block_size=4096))
    ours = frame.compress(data, EncodeOpts(
        level=3, block_size=4096,
        dict_content=d.content, dict_huf=d.huf_lengths))
    assert len(ours) < len(plain)
    assert frame.decompress(ours, DecodeOpts(
        dict_content=d.content, dict_huf=d.huf_lengths)) == data
    L = ref_oracle.lib()
    dst = ctypes.create_string_buffer(len(data) + 16)
    opts = ref_oracle.DecompressOpts()
    buf = ctypes.create_string_buffer(d.content, len(d.content))
    opts.dict = ctypes.cast(buf, ctypes.c_void_p)
    opts.dict_size = len(d.content)
    huf = ctypes.create_string_buffer(d.huf_lengths, 128)
    opts.dict_huf = ctypes.cast(huf, ctypes.c_void_p)
    n = L.zxc_decompress(ours, len(ours), dst, len(data) + 16,
                         ctypes.byref(opts))
    assert n == len(data) and dst.raw[:n] == data


def test_native_trainer_rejects_bad_input():
    from zxc_tpu import runtime
    if runtime.lib() is None:
        pytest.skip("native library unavailable")
    with pytest.raises(ZxcError):
        runtime.dict_train([b"abc"], 1024)  # all below KGRAM
