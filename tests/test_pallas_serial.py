"""Pallas serial copy-engine decoder (interpret mode: runs on CPU).

The compiled-on-hardware path is exercised by bench.py on the real chip;
these tests pin the kernel's semantics — the same Mosaic ops run in the
interpreter.
"""
import numpy as np
import pytest

from zxc_tpu import runtime
from zxc_tpu.codec import frame
from zxc_tpu.codec.frame import EncodeOpts, DecodeOpts
from zxc_tpu.ops.batch import plan_frame
from zxc_tpu.ops import pallas_decode

import ref_oracle

# rejected kernel generations live in tools/kernel_attic.py (see PERF.md
# 3.2); their history suite keeps running from there
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))), "tools"))
import kernel_attic

pytestmark = pytest.mark.skipif(not runtime.available(),
                                reason="native toolchain unavailable")


def _decode(archive: bytes, opts=None) -> bytes:
    plan = plan_frame(archive, opts)
    pieces, lits = [], []
    for i in range(plan.n_blocks):
        r = runtime.resolve_pieces(plan.ll[i], plan.ml[i], plan.off[i],
                                   plan.lit[i], plan.dict_buf,
                                   device_pure=True)
        assert r is not None
        pieces.append(r[:4])
        lits.append(r[4])
    res = kernel_attic.decode_blocks(pieces, lits, plan.totals,
                                     plan.block_size, interpret=True)
    return b"".join(res)


@pytest.mark.parametrize("level", [1, 3, 5, 7])
def test_serial_kernel_levels(level):
    rng = np.random.default_rng(level)
    seg = rng.integers(0, 256, 733, dtype=np.uint8).tobytes()
    data = (seg * 20 + b"\x00" * 9000 + b"ab" * 4000 + seg[:500]
            + rng.integers(0, 256, 3000, dtype=np.uint8).tobytes())
    arc = frame.compress(data, EncodeOpts(level=level, block_size=8192))
    assert _decode(arc) == data


def test_serial_kernel_fills_and_periods():
    data = (b"\x00" * 30_000 + b"xy" * 8_000
            + b"".join(bytes(range(k)) * (2000 // k) for k in (3, 7, 13))
            + b"\xff" * 5_000)
    arc = frame.compress(data, EncodeOpts(level=4, block_size=4096))
    assert _decode(arc) == data


def test_serial_kernel_cross_window_pieces():
    """Pieces straddling 1024-element window boundaries."""
    rng = np.random.default_rng(9)
    base = rng.integers(0, 256, 5000, dtype=np.uint8).tobytes()
    data = base + base[100:3100] + base[:1024] + base[2000:2001] * 2000
    arc = frame.compress(data, EncodeOpts(level=3, block_size=16384))
    assert _decode(arc) == data


def test_serial_kernel_ref_archive():
    rng = np.random.default_rng(5)
    base = rng.integers(0, 64, 120_000, dtype=np.uint8).tobytes()
    data = base + base[:40_000]
    arc = ref_oracle.ref_compress(data, level=3, block_size=16384)
    assert _decode(arc) == data


def test_serial_kernel_dict():
    d = b"shared dictionary content for the serial kernel " * 30
    data = b"shared dictionary content appears here too! " * 25
    arc = frame.compress(data, EncodeOpts(level=3, block_size=4096,
                                          dict_content=d))
    assert _decode(arc, DecodeOpts(dict_content=d)) == data


@pytest.mark.parametrize("variant", [1, 2])
def test_serial_kernel_variants_agree(variant):
    rng = np.random.default_rng(33)
    seg = rng.integers(0, 256, 511, dtype=np.uint8).tobytes()
    data = seg * 30 + b"\x00" * 4000 + b"pq" * 2500 + seg[:100]
    arc = frame.compress(data, EncodeOpts(level=3, block_size=8192))
    plan = plan_frame(arc)
    pieces, lits = [], []
    for i in range(plan.n_blocks):
        r = runtime.resolve_pieces(plan.ll[i], plan.ml[i], plan.off[i],
                                   plan.lit[i], device_pure=True)
        pieces.append(r[:4])
        lits.append(r[4])
    res = kernel_attic.decode_blocks(pieces, lits, plan.totals,
                                     plan.block_size, interpret=True,
                                     variant=variant)
    assert b"".join(res) == data


def test_serial_kernel_v3_agrees():
    rng = np.random.default_rng(44)
    seg = rng.integers(0, 256, 811, dtype=np.uint8).tobytes()
    data = seg * 25 + b"\x00" * 5000 + b"zw" * 2000 + seg[:64]
    arc = frame.compress(data, EncodeOpts(level=3, block_size=8192))
    plan = plan_frame(arc)
    pieces, lits = [], []
    for i in range(plan.n_blocks):
        r = runtime.resolve_pieces(plan.ll[i], plan.ml[i], plan.off[i],
                                   plan.lit[i], device_pure=True)
        pieces.append(r[:4])
        lits.append(r[4])
    res = kernel_attic.decode_blocks(pieces, lits, plan.totals,
                                     plan.block_size, interpret=True,
                                     variant=3)
    assert b"".join(res) == data


@pytest.mark.parametrize("variant", [4, 5, 6, 7])
def test_window_op_kernels_agree(variant):
    rng = np.random.default_rng(55)
    seg = rng.integers(0, 256, 611, dtype=np.uint8).tobytes()
    data = (seg * 28 + b"\x00" * 6000 + b"tuv" * 2000 + seg[:99]
            + rng.integers(0, 256, 4000, dtype=np.uint8).tobytes())
    arc = frame.compress(data, EncodeOpts(level=3, block_size=8192))
    plan = plan_frame(arc)
    pieces, lits = [], []
    for i in range(plan.n_blocks):
        r = runtime.resolve_pieces(plan.ll[i], plan.ml[i], plan.off[i],
                                   plan.lit[i], device_pure=True)
        pieces.append(r[:4])
        lits.append(r[4])
    res = kernel_attic.decode_blocks_v4(pieces, lits, plan.totals,
                                         plan.block_size, interpret=True,
                                         variant=variant)
    assert b"".join(res) == data


def test_v9_lane_kernel_interpret():
    """v9 per-sublane lane-op kernel: bit-exact vs plaintext in interpret
    mode across content classes (text, periodic, fills, random)."""
    import numpy as np
    from zxc_tpu.ops import plan_frame, pallas_decode as PD
    from zxc_tpu import runtime
    from zxc_tpu.codec import frame
    from zxc_tpu.codec.frame import EncodeOpts
    if runtime.lib() is None:
        import pytest
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(3)
    seg = rng.integers(0, 256, 997, dtype=np.uint8).tobytes()
    data = (b"hello zxc world " * 800 + seg * 40 + b"A" * 5000
            + b"ab" * 3000
            + rng.integers(0, 256, 20000, dtype=np.uint8).tobytes())
    BLOCK = 16384
    data = (data * ((BLOCK * 5) // len(data) + 1))[:BLOCK * 5 - 77]
    arc = frame.compress(data, EncodeOpts(level=3, block_size=BLOCK))
    plan = plan_frame(arc)
    pieces, lits = [], []
    for i in range(plan.n_blocks):
        r = runtime.resolve_pieces(plan.ll[i], plan.ml[i], plan.off[i],
                                   plan.lit[i], plan.dict_buf,
                                   device_pure=True)
        assert r is not None
        pieces.append(r[:4])
        lits.append(r[4])
    outs = kernel_attic.decode_blocks_v9(pieces, lits, list(plan.totals), BLOCK,
                               interpret=True)
    assert b"".join(outs) == data


@pytest.mark.parametrize("variant", [12, 13, 14, 15, 16, 17, 19])
def test_v12_v13_windowed_gather_interpret(variant):
    """v12/v13 row-sorted windowed-gather kernels: bit-exact vs plaintext
    in interpret mode (the hardware path is validated by bench.py and
    tools/tpu_v12_hw.py; v13 measured 1.73 GB/s marginal on v5e)."""
    from zxc_tpu.ops import plan_frame
    rng = np.random.default_rng(variant)
    seg = rng.integers(0, 256, 997, dtype=np.uint8).tobytes()
    data = (b"hello zxc world " * 800 + seg * 40 + b"A" * 5000
            + b"ab" * 3000
            + rng.integers(0, 256, 20000, dtype=np.uint8).tobytes())
    # 16 KiB for v15 (its supertile minimum; smaller blocks delegate to
    # v13), 8 KiB for the rest
    BLOCK = 16384 if variant >= 15 else 8192
    data = (data * ((BLOCK * 5) // len(data) + 1))[:BLOCK * 5 - 77]
    arc = frame.compress(data, EncodeOpts(level=3, block_size=BLOCK))
    plan = plan_frame(arc)
    pieces, lits = [], []
    for i in range(plan.n_blocks):
        r = runtime.resolve_pieces(plan.ll[i], plan.ml[i], plan.off[i],
                                   plan.lit[i], plan.dict_buf,
                                   device_pure=True)
        assert r is not None
        pieces.append(r[:4])
        lits.append(r[4])
    fn = {13: pallas_decode.decode_blocks_v13,
          14: kernel_attic.decode_blocks_v14,
          15: kernel_attic.decode_blocks_v15,
          16: kernel_attic.decode_blocks_v16,
          17: kernel_attic.decode_blocks_v17,
          19: pallas_decode.decode_blocks_v19}.get(
              variant, kernel_attic.decode_blocks_v12)
    outs = fn(pieces, lits, list(plan.totals), BLOCK, interpret=True)
    assert b"".join(outs) == data


@pytest.mark.parametrize("ksub", [1, 2, 3])
def test_v19_multiop_slots_interpret(ksub):
    """v19 multi-op-slot kernel: bit-exact for each sub-op count K
    (K=2 is the production point: 1.30x v15 interleaved on v5e)."""
    from zxc_tpu.ops import plan_frame
    rng = np.random.default_rng(190 + ksub)
    data = (b"multi-op slot kernel " * 700 + b"Z" * 4000 + b"xy" * 2500
            + rng.integers(0, 256, 30000, dtype=np.uint8).tobytes())
    BLOCK = 16384
    data = (data * ((BLOCK * 4) // len(data) + 1))[:BLOCK * 4 - 33]
    arc = frame.compress(data, EncodeOpts(level=3, block_size=BLOCK))
    plan = plan_frame(arc)
    pieces, lits = [], []
    for i in range(plan.n_blocks):
        r = runtime.resolve_pieces(plan.ll[i], plan.ml[i], plan.off[i],
                                   plan.lit[i], plan.dict_buf,
                                   device_pure=True)
        assert r is not None
        pieces.append(r[:4])
        lits.append(r[4])
    outs = pallas_decode.decode_blocks_v19(
        pieces, lits, list(plan.totals), BLOCK, interpret=True, K=ksub)
    assert b"".join(outs) == data
    # v20 (plane-segregated packing) and v21 (pair-merged permute)
    # must agree too
    outs20 = kernel_attic.decode_blocks_v20(
        pieces, lits, list(plan.totals), BLOCK, interpret=True, K=ksub)
    assert b"".join(outs20) == data
    outs21 = kernel_attic.decode_blocks_v21(
        pieces, lits, list(plan.totals), BLOCK, interpret=True, K=ksub)
    assert b"".join(outs21) == data
