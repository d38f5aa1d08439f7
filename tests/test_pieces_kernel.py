"""Piece-plan device kernel: host C++ chain resolution + 2-gather expansion."""
import numpy as np
import pytest

import jax

from zxc_tpu import runtime, ops
from zxc_tpu.codec import frame
from zxc_tpu.codec.frame import EncodeOpts, DecodeOpts
from zxc_tpu.ops.batch import plan_frame, decode_plan_pieces_device

import ref_oracle

pytestmark = pytest.mark.skipif(not runtime.available(),
                                reason="native toolchain unavailable")
CPU = None


def _cpu():
    global CPU
    if CPU is None:
        CPU = jax.devices("cpu")[0]
    return CPU


def _roundtrip(data, level=3, block_size=8192, **kw):
    arc = frame.compress(data, EncodeOpts(level=level, block_size=block_size,
                                          **kw))
    plan = plan_frame(arc)
    plan.resolve()
    assert plan.all_pieces
    assert decode_plan_pieces_device(plan, device=_cpu()) == data


@pytest.mark.parametrize("level", [1, 2, 3, 4, 5, 6, 7])
def test_pieces_roundtrip_levels(level):
    rng = np.random.default_rng(level)
    seg = rng.integers(0, 256, 997, dtype=np.uint8).tobytes()
    data = (seg * 40 + rng.integers(0, 256, 5000, dtype=np.uint8).tobytes()
            + b"A" * 3000 + seg[:500])
    _roundtrip(data, level)


def test_pieces_off1_runs():
    _roundtrip(b"\x00" * 100_000 + b"abc" * 30_000 + b"zy" * 20_000,
               level=3, block_size=32768)


def test_pieces_deep_chains():
    rng = np.random.default_rng(11)
    piece = rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
    data = piece
    for _ in range(200):
        data += data[-64:]
    _roundtrip(bytes(data), level=5, block_size=16384)


def test_pieces_periodic_overlaps():
    # periods 2..17 stress the k=off composition and rep-emission paths
    data = b"".join(bytes(range(k)) * (3000 // k) for k in range(2, 18))
    _roundtrip(data, level=4, block_size=4096)


def test_pieces_ref_archive_matches():
    rng = np.random.default_rng(7)
    base = rng.integers(0, 64, 200_000, dtype=np.uint8).tobytes()
    data = base + base[:50_000] + bytes(30_000)
    for level in (1, 3, 6):
        arc = ref_oracle.ref_compress(data, level=level, block_size=65536)
        plan = plan_frame(arc)
        plan.resolve()
        assert plan.all_pieces
        assert decode_plan_pieces_device(plan, device=_cpu()) == data


def test_pieces_dict_frame():
    d = b"the quick brown fox jumps over the lazy dog " * 40
    data = b"the quick brown fox says hello to the lazy dog again " * 30
    arc = frame.compress(data, EncodeOpts(level=3, block_size=4096,
                                          dict_content=d))
    opts = DecodeOpts(dict_content=d)
    plan = plan_frame(arc, opts)
    plan.resolve()
    assert plan.all_pieces
    assert decode_plan_pieces_device(plan, device=_cpu()) == data


def test_ops_decompress_uses_pieces_by_default():
    data = b"piece plan end to end " * 4000
    arc = frame.compress(data, EncodeOpts(level=3, block_size=8192))
    assert ops.decompress(arc, device=_cpu()) == data
    assert ops.decompress(arc, device=_cpu(), use_pieces=False) == data
