"""PivCo-Huffman codec differential tests vs the reference C trampolines."""
import ctypes

import numpy as np
import pytest

from zxc_tpu.codec import huffman as H
from ref_oracle import lib


def _ref_build_lengths(freq: np.ndarray, max_len: int) -> np.ndarray:
    L = lib()
    cl = (ctypes.c_uint8 * 256)()
    scratch = ctypes.create_string_buffer(1 << 20)
    rc = L.zxc_huf_build_code_lengths(
        freq.astype(np.uint32).ctypes.data_as(ctypes.c_void_p), cl, scratch, max_len)
    assert rc == 0
    return np.frombuffer(bytes(cl), np.uint8).copy()


def _ref_encode(data: bytes, code_len: np.ndarray) -> bytes:
    L = lib()
    freq = np.bincount(np.frombuffer(data, np.uint8), minlength=256).astype(np.uint32)
    cap = len(data) * 2 + 4096
    dst = ctypes.create_string_buffer(cap)
    n = L.zxc_huf_encode_section(data, len(data),
                                 freq.ctypes.data_as(ctypes.c_void_p),
                                 code_len.ctypes.data_as(ctypes.c_void_p), dst, cap)
    assert n > 0, f"ref encode failed: {n}"
    return dst.raw[:n]


def _ref_decode(payload: bytes, n: int) -> bytes:
    L = lib()
    dst = ctypes.create_string_buffer(n + 64)
    scratch = ctypes.create_string_buffer(n + 64)
    rc = L.zxc_huf_decode_section(payload, len(payload), dst, n, scratch)
    assert rc == 0, f"ref decode failed: {rc}"
    return dst.raw[:n]


CORPORA = {
    "english": b"the quick brown fox jumps over the lazy dog " * 200,
    "skewed": bytes(np.random.default_rng(1).choice(
        np.arange(256, dtype=np.uint8), 20000,
        p=np.concatenate([[0.5, 0.2, 0.1], np.full(253, 0.2 / 253)]))),
    "two_symbols": b"ababbbabaaab" * 500,
    "uniform16": bytes(np.random.default_rng(2).integers(0, 16, 8192, dtype=np.uint8)),
    "uniform256": bytes(np.random.default_rng(3).integers(0, 256, 8192, dtype=np.uint8)),
    "single": b"z" * 1000,
    "tiny": b"hello",
}


@pytest.mark.parametrize("name", list(CORPORA))
@pytest.mark.parametrize("max_len", [8, 11])
def test_encode_parity_and_decode(name, max_len):
    data = CORPORA[name]
    freq = np.bincount(np.frombuffer(data, np.uint8), minlength=256)
    cl = _ref_build_lengths(freq, max_len)
    ref_payload = _ref_encode(data, cl)
    # 1. our encoder produces byte-identical sections for the same lengths
    mine = H.encode_section(np.frombuffer(data, np.uint8), cl)
    assert mine == ref_payload, f"encode mismatch for {name}/{max_len}"
    # 2. our decoder decodes the reference payload
    out = H.decode_section(np.frombuffer(ref_payload, np.uint8), len(data))
    assert out.tobytes() == data
    # 3. reference decodes our payload (redundant given 1, kept as cross-check)
    assert _ref_decode(mine, len(data)) == data


@pytest.mark.parametrize("name", list(CORPORA))
def test_build_lengths_cost_optimal(name):
    """Our package-merge must match the reference's total bit cost."""
    data = CORPORA[name]
    freq = np.bincount(np.frombuffer(data, np.uint8), minlength=256)
    for max_len in (8, 11):
        ref_cl = _ref_build_lengths(freq, max_len)
        my_cl = H.build_code_lengths(freq, max_len)
        assert my_cl is not None
        assert int((freq * my_cl).sum()) == int((freq * ref_cl).sum()), name
        assert my_cl.max() <= max_len
        # Kraft exactness
        present = my_cl > 0
        if present.sum() >= 2:
            assert int((1 << (11 - my_cl[present].astype(np.int64))).sum()) == 1 << 11


def test_calc_size_exact():
    for name, data in CORPORA.items():
        freq = np.bincount(np.frombuffer(data, np.uint8), minlength=256)
        cl = _ref_build_lengths(freq, 11)
        tree = H.build_tree(cl)
        assert H.calc_size(freq, tree, with_header=True) == len(_ref_encode(data, cl)), name


def test_decode_rejects_corrupt():
    data = CORPORA["english"]
    freq = np.bincount(np.frombuffer(data, np.uint8), minlength=256)
    cl = _ref_build_lengths(freq, 8)
    payload = bytearray(_ref_encode(data, cl))
    # truncate body
    with pytest.raises(Exception):
        H.decode_section(np.frombuffer(bytes(payload[:140]), np.uint8), len(data))
    # break Kraft: bump a present symbol's length
    bad = bytearray(payload)
    bad[0] = (bad[0] & 0xF0) | ((bad[0] & 0x0F) + 1 if (bad[0] & 0x0F) in range(1, 11) else 5)
    with pytest.raises(Exception):
        H.decode_section(np.frombuffer(bytes(bad), np.uint8), len(data))


def test_lengths_header_roundtrip():
    rng = np.random.default_rng(0)
    cl = rng.integers(0, 12, 256, dtype=np.uint8)
    assert (H.unpack_lengths(H.pack_lengths(cl)) == cl).all()


def test_nudge_respects_size_budget_and_kraft():
    import numpy as np
    from zxc_tpu.codec import huffman
    rng = np.random.default_rng(0)
    # zipf-ish histogram: deep optimal tree
    freq = (10000 / (np.arange(256) + 1) ** 1.3).astype(np.int64) + 1
    cl = huffman.build_code_lengths(freq, 11)
    nudged = huffman.nudge_code_lengths(freq, cl, 11)
    base = huffman.encoded_bits(freq, cl)
    after = huffman.encoded_bits(freq, nudged)
    assert after <= base * huffman.NUDGE_MAX_GROWTH
    assert nudged.max() <= cl.max()
    huffman.build_tree(nudged)  # Kraft-valid
    # roundtrip through the section codec
    data = rng.choice(np.arange(256, dtype=np.uint8), size=5000,
                      p=freq / freq.sum())
    blob = huffman.encode_section(data, nudged)
    out = huffman.decode_section(np.frombuffer(blob, np.uint8), len(data))
    assert (out == data).all()


def test_nudge_flattens_when_cheap():
    import numpy as np
    from zxc_tpu.codec import huffman
    freq = np.zeros(256, np.int64)
    freq[:16] = 100  # uniform 16 symbols: depth-4 flat is optimal
    cl = huffman.build_code_lengths(freq, 8)
    nudged = huffman.nudge_code_lengths(freq, cl, 8)
    assert nudged.max() == 4
