"""Golden format suite: byte-frozen archives pin encoder stability.

Mirrors the reference's tests/format golden suite (test_golden.c +
golden_cases.h + sha256 manifest): deterministic inputs are encoded at
fixed settings; the archive bytes' sha256 must never change without a
deliberate manifest update, and every on-disk field is re-parsed and
checked structurally. (Our goldens pin THIS encoder's byte stability —
the reference's goldens pin its own encoder, not a cross-impl contract.)
"""
import hashlib
import json
import os

import numpy as np
import pytest

import zxc_tpu.constants as C
from zxc_tpu.codec import frame
from zxc_tpu.codec.frame import EncodeOpts, DecodeOpts
from zxc_tpu.format import headers

MANIFEST = os.path.join(os.path.dirname(__file__), "golden_manifest.json")


def _case_inputs():
    rng = np.random.default_rng(20260817)
    text = (b"The ZXC v7 bitstream fixes its wire bytes forever. " * 120)
    runs = b"\x00" * 5000 + b"ab" * 2000 + b"\x7f" * 131 + text[:333]
    rand = rng.integers(0, 256, 6000, dtype=np.uint8).tobytes()
    mixed = text[:2000] + rand[:2000] + runs[:2000]
    return {
        "text_l1": (text, EncodeOpts(level=1, block_size=4096)),
        "text_l3_ck": (text, EncodeOpts(level=3, block_size=4096,
                                        checksum=True)),
        "text_l6": (text, EncodeOpts(level=6, block_size=4096)),
        "text_l7": (text, EncodeOpts(level=7, block_size=8192)),
        "runs_l3": (runs, EncodeOpts(level=3, block_size=4096)),
        "rand_l3": (rand, EncodeOpts(level=3, block_size=4096)),
        "mixed_l5_seek": (mixed, EncodeOpts(level=5, block_size=4096,
                                            seekable=True, checksum=True)),
        "empty_l3": (b"", EncodeOpts(level=3)),
        "tiny_l2": (b"x", EncodeOpts(level=2)),
        "multiblock_l4": (text * 40, EncodeOpts(level=4, block_size=16384,
                                                checksum=True)),
    }


def _manifest():
    with open(MANIFEST) as f:
        return json.load(f)


def test_manifest_exists_and_covers_all_cases():
    m = _manifest()
    assert set(m) == set(_case_inputs())


@pytest.mark.parametrize("name", sorted(_case_inputs()))
def test_golden_bytes_frozen(name):
    data, opts = _case_inputs()[name]
    archive = frame.compress(data, opts)
    digest = hashlib.sha256(archive).hexdigest()
    entry = _manifest()[name]
    assert digest == entry["sha256"], (
        f"golden archive bytes changed for {name}: encoder output is no "
        f"longer byte-stable (got {digest[:16]}..., manifest "
        f"{entry['sha256'][:16]}...). If the change is intentional, "
        f"regenerate tests/golden_manifest.json.")
    assert len(archive) == entry["size"]


@pytest.mark.parametrize("name", sorted(_case_inputs()))
def test_golden_structure(name):
    """Field-by-field structural validation of every golden archive."""
    data, opts = _case_inputs()[name]
    archive = frame.compress(data, opts)

    fh = headers.read_file_header(archive)
    assert fh.block_size == (opts.block_size or C.BLOCK_SIZE_DEFAULT)
    assert fh.has_checksum == opts.checksum
    assert fh.dict_id == 0

    size, ghash = headers.read_file_footer(archive)
    assert size == len(data)
    if not opts.checksum:
        assert ghash == 0

    n_blocks = 0
    for pos, bh in frame.iter_blocks(archive):
        assert bh.block_type in (C.BLOCK_RAW, C.BLOCK_GLO, C.BLOCK_GHI)
        assert bh.comp_size <= C.compress_block_bound(fh.block_size)
        n_blocks += 1
    expected_blocks = (len(data) + fh.block_size - 1) // fh.block_size
    assert n_blocks == expected_blocks

    sek = headers.parse_seek_table(archive)
    if opts.seekable and n_blocks:
        assert sek is not None and len(sek) == n_blocks
    # roundtrip is implied structure
    assert frame.decompress(archive, DecodeOpts(checksum=opts.checksum)) == data


def _regenerate():  # pragma: no cover - manual tool
    m = {}
    for name, (data, opts) in _case_inputs().items():
        archive = frame.compress(data, opts)
        m[name] = {"sha256": hashlib.sha256(archive).hexdigest(),
                   "size": len(archive)}
    with open(MANIFEST, "w") as f:
        json.dump(m, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    _regenerate()
    print("regenerated", MANIFEST)
