"""Native find_parse invariants across the level-parameter space.

The matcher is free to pick any matches (sizes are checked elsewhere);
these tests pin the *contract*: every emitted sequence must be a real
match inside the window, the parse must tile the block, and the encoded
result must reconstruct byte-exactly — for every combination of probe
depth, lazy, sufficient_len, and step-skip, including degenerate ones.
Reference behaviours mirrored: backward extension (zxc_compress.c:452),
repeat-offset seed (:242), miss step (:1231).
"""
import numpy as np
import pytest

from zxc_tpu import runtime
from zxc_tpu.codec import frame
from zxc_tpu.codec.frame import EncodeOpts

pytestmark = pytest.mark.skipif(runtime.lib() is None,
                                reason="native runtime unavailable")


def _corpora():
    rng = np.random.default_rng(99)
    words = [b"alpha ", b"beta ", b"gamma ", b"zxc "]
    soup = b"".join(words[int(i)] for i in rng.integers(0, 4, 3000))
    return {
        "text": (b"the quick brown fox jumps over the lazy dog. " * 300),
        "soup": soup,
        "runs": b"A" * 5000 + b"B" * 5000 + bytes(rng.integers(0, 256, 500,
                                                               dtype=np.uint8)),
        "random": rng.integers(0, 256, 8000, dtype=np.uint8).tobytes(),
        "periodic": (bytes(rng.integers(0, 256, 300, dtype=np.uint8)) * 40),
    }


PARAMS = [
    # (probes, lazy, sufficient_len, step_base, step_shift)
    (1, False, 0, 1, 0),
    (2, False, 16, 4, 4),
    (4, False, 18, 2, 6),
    (6, True, 32, 1, 6),
    (32, True, 256, 1, 0),
    (2, True, 5, 8, 1),     # degenerate: tiny suff, aggressive step
    (64, True, 1, 1, 0),    # suff smaller than MIN_MATCH
]


def _check_parse(data: bytes, pos, length, off):
    d = np.frombuffer(data, np.uint8)
    n = len(d)
    prev_end = 0
    for p, l, o in zip(pos, length, off):
        assert 0 <= p < n and p >= prev_end, "overlapping or unordered seq"
        assert l >= 5, "match below MIN_MATCH"
        assert 1 <= o <= 64 * 1024 and o <= p + 0, f"offset {o} out of window"
        assert p + l <= n, "match overruns block"
        assert p - o >= 0
        # LZ copy semantics (self-overlap included): out[p+i] == out[p+i-o],
        # and a correct parse reconstructs the input, so check on the input
        np.testing.assert_array_equal(d[p:p + l], d[p - o:p - o + l] if o >= l
                                      else np.array([d[p + i - o]
                                                     for i in range(l)]))
        prev_end = p + l


@pytest.mark.parametrize("probes,lazy,suff,sb,ss", PARAMS)
@pytest.mark.parametrize("name", ["text", "soup", "runs", "random",
                                  "periodic"])
def test_find_parse_contract(name, probes, lazy, suff, sb, ss):
    data = _corpora()[name]
    d = np.frombuffer(data, np.uint8)
    r = runtime.find_parse(d, 0, probes, lazy, suff, sb, ss)
    assert r is not None
    pos, length, off = r
    _check_parse(data, pos, length, off)


def test_find_parse_with_dict_prefix():
    """start > 0: matches may source from the prefix but never start in it,
    and backward extension must not cross below start."""
    rng = np.random.default_rng(7)
    dict_buf = rng.integers(0, 256, 4096, dtype=np.uint8)
    block = np.concatenate([dict_buf[1000:1400], dict_buf[2000:2300],
                            rng.integers(0, 256, 500, dtype=np.uint8)])
    full = np.concatenate([dict_buf, block])
    r = runtime.find_parse(full, len(dict_buf), 8, True, 64, 1, 0)
    assert r is not None
    pos, length, off = r
    n_blk = len(block)
    for p, l, o in zip(pos, length, off):
        assert 0 <= p and p + l <= n_blk
        abs_p = p + len(dict_buf)
        assert o <= abs_p  # source may reach into the dict, not before it
        src = abs_p - o
        got = bytes(full[abs_p:abs_p + l])
        # reconstruct with self-overlap
        win = bytearray(full[:abs_p])
        for i in range(l):
            win.append(win[src + i])
        assert bytes(win[abs_p:abs_p + l]) == got
    assert len(pos) > 0  # the dict-sourced repeats must be found


@pytest.mark.parametrize("level", [1, 2, 3, 4, 5, 6, 7])
def test_roundtrip_all_levels_all_corpora(level):
    for name, data in _corpora().items():
        arc = frame.compress(data, EncodeOpts(level=level, block_size=16384))
        assert frame.decompress(arc) == data, f"{name} level {level}"
