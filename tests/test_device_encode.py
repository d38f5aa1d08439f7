"""Device-side encoder (ops.encode): XLA match finder + pointer-doubling
parse feeding the host emitters. SURVEY.md §7 step 6's TPU formulation."""
import numpy as np
import pytest

import jax

from zxc_tpu import ops
from zxc_tpu.ops import encode as dev_enc
from zxc_tpu.codec import frame, block_encode
from zxc_tpu.codec.frame import EncodeOpts, DecodeOpts

import ref_oracle


def _corpora():
    rng = np.random.default_rng(17)
    txt = (b"the quick brown fox jumps over the lazy dog. " * 800)[:30000]
    return {
        "text": txt,
        "mix": txt[:12000] + rng.integers(0, 256, 6000,
                                          dtype=np.uint8).tobytes() + txt[:6000],
        "runs": b"A" * 9000 + b"B" * 100 + b"A" * 3000,
        "random": rng.integers(0, 256, 20000, dtype=np.uint8).tobytes(),
        "tiny": b"abcabcabcabc",
    }


@pytest.mark.parametrize("name", ["text", "mix", "runs", "random"])
def test_device_matches_are_real(name):
    """Every (len, off) the device matcher emits must be an actual match."""
    arr = np.frombuffer(_corpora()[name], np.uint8)
    lens, offs = dev_enc.find_matches_device(arr, 4)
    ld = np.asarray(lens).astype(np.int64)
    od = np.asarray(offs).astype(np.int64)
    n = len(arr)
    for p in np.nonzero(ld >= 5)[0][::5]:
        l, o = int(ld[p]), int(od[p])
        assert 1 <= o <= p and p + l <= n
        # LZ semantics incl. self-overlap: d[p+i] == d[p+i-o]
        np.testing.assert_array_equal(
            arr[p:p + l], np.array([arr[p + i - o] for i in range(l)],
                                   np.uint8))


def test_device_matches_at_least_numpy():
    """The device matcher may find longer matches (different word width)
    but never shorter than the host vectorized finder at the same k."""
    arr = np.frombuffer(_corpora()["mix"], np.uint8)
    ld = np.asarray(dev_enc.find_matches_device(arr, 4)[0]).astype(np.int64)
    ln, _ = block_encode.find_matches(arr, 0, 4)
    assert (ld >= ln).mean() > 0.999


def test_parse_device_matches_host():
    """Pointer-doubling parse == host parse_sequences on identical input."""
    arr = np.frombuffer(_corpora()["text"], np.uint8)
    lens, offs = block_encode.find_matches(arr, 0, 4)
    for lazy in (False, True):
        keep = np.asarray(dev_enc.parse_device(
            lens.astype(np.int32), offs.astype(np.int32), lazy))
        m_pos = np.nonzero(keep)[0]
        h_pos, h_len, h_off = block_encode.parse_sequences(lens, offs, lazy)
        np.testing.assert_array_equal(m_pos, h_pos)


@pytest.mark.parametrize("level", [1, 2, 3, 5])
def test_device_encode_roundtrip_and_ref(level):
    for name, data in _corpora().items():
        arc = ops.compress_device(data, level=level, block_size=16384,
                                  checksum=True)
        assert frame.decompress(arc, DecodeOpts(checksum=True)) == data, \
            f"{name} L{level}"
        assert ref_oracle.ref_decompress(arc, len(data)) == data, \
            f"ref {name} L{level}"


def test_device_encode_size_competitive():
    """Device-matched archives within 2% of the host encoder's size."""
    data = _corpora()["text"] + _corpora()["mix"]
    dev = ops.compress_device(data, level=3, block_size=65536)
    host = frame.compress(data, EncodeOpts(level=3, block_size=65536))
    assert len(dev) <= len(host) * 1.02


def test_device_encode_empty_and_incompressible():
    assert frame.decompress(ops.compress_device(b"", level=3)) == b""
    rnd = np.random.default_rng(0).integers(0, 256, 50000,
                                            dtype=np.uint8).tobytes()
    arc = ops.compress_device(rnd, level=3, block_size=16384)
    # RAW fallback keeps expansion bounded
    assert len(arc) < len(rnd) + 16384
    assert frame.decompress(arc) == rnd


@pytest.mark.parametrize("name", ["text", "mix", "runs", "random"])
def test_lcp_matcher_matches_are_real(name):
    """Pallas-LCP matcher (interpret mode): every (len, off) must be an
    actual match — the kernel's claimed lengths are exact below the
    256-byte cap and never above the true length."""
    arr = np.frombuffer(_corpora()[name], np.uint8)
    lens, offs = dev_enc.find_matches_device_lcp(arr, 4, interpret=True)
    ld = np.asarray(lens).astype(np.int64)
    od = np.asarray(offs).astype(np.int64)
    n = len(arr)
    for p in np.nonzero(ld >= 5)[0][::7]:
        l, o = int(ld[p]), int(od[p])
        assert 1 <= o <= p and p + l <= n
        np.testing.assert_array_equal(
            arr[p:p + l], np.array([arr[p + i - o] for i in range(l)],
                                   np.uint8))


def test_lcp_matcher_vs_xla_matcher_size():
    """Whole-frame archives from the two device matchers stay within 1%
    (the LCP path caps extension at 256 bytes; offset-1 runs stay
    analytic and uncapped)."""
    import os
    data = _corpora()["text"] + _corpora()["mix"]
    arc_lcp = ops.compress_device(data, level=3, block_size=65536)
    os.environ["ZXC_DEVICE_MATCHER"] = "xla"
    try:
        arc_xla = ops.compress_device(data, level=3, block_size=65536)
    finally:
        del os.environ["ZXC_DEVICE_MATCHER"]
    assert frame.decompress(arc_lcp) == data
    assert len(arc_lcp) <= len(arc_xla) * 1.01


def test_parse_compact_walk_matches_doubling():
    """Scalar-walk parse == pointer-doubling parse (small interpret run;
    the hardware path is asserted by tools/tpu_lcp_probe.py phases)."""
    arr = np.frombuffer(_corpora()["text"][:2048], np.uint8)
    lens, offs = block_encode.find_matches(arr, 0, 4)
    for lazy in (False, True):
        a = dev_enc.parse_compact_walk(lens.astype(np.int32),
                                       offs.astype(np.int32), lazy,
                                       interpret=True)
        b = dev_enc.parse_compact_device(lens.astype(np.int32),
                                         offs.astype(np.int32), lazy)
        ka, kb = int(a[0]), int(b[0])
        assert ka == kb
        for x, y in zip(a[1:], b[1:]):
            np.testing.assert_array_equal(np.asarray(x[:ka]),
                                          np.asarray(y[:ka]))
