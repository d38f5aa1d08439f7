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


def _golden_dict():
    """Deterministic dictionary + shared Huffman table (for the dict and
    huffman-dict goldens, mirroring the reference's 09_block_dict.zxc and
    12_glo_huffman_dict.zxc coverage)."""
    from zxc_tpu.codec import huffman
    content = (b"wire-format golden dictionary seed: common prefixes "
               b"<row id='000000'><field>abcdefgh</field></row>\n" * 12)[:1024]
    freq = np.bincount(np.frombuffer(_dict_huf_payload(), np.uint8),
                       minlength=256)
    cl = huffman.build_code_lengths(freq, 8)  # no smoothing: only
    # payload symbols get codes, so the table actually fits the data
    table = huffman.pack_lengths(cl)
    return content, table


def _dict_huf_payload() -> bytes:
    """Match-free literal soup whose byte distribution the shared table is
    trained on, so the encoder's dict-table candidate (no 128B inline
    header) wins the literal-section auction (enc_lit=3)."""
    rng = np.random.default_rng(12)
    letters = np.frombuffer(b"etaoinshrdlu zxcfmt", np.uint8)
    probs = 1.0 / np.arange(1, len(letters) + 1) ** 0.8
    return rng.choice(letters, size=3000,
                      p=probs / probs.sum()).tobytes()


def _case_inputs():
    rng = np.random.default_rng(20260817)
    text = (b"The ZXC v7 bitstream fixes its wire bytes forever. " * 120)
    runs = b"\x00" * 5000 + b"ab" * 2000 + b"\x7f" * 131 + text[:333]
    rand = rng.integers(0, 256, 6000, dtype=np.uint8).tobytes()
    mixed = text[:2000] + rand[:2000] + runs[:2000]
    dict_content, dict_table = _golden_dict()
    # offsets forced past 255: a 389-byte period repeated across the block
    period = rng.integers(0, 256, 389, dtype=np.uint8).tobytes()
    far = period * 12 + b"tail" * 32
    # wide (>8-bit) literal tree: geometric symbol weights over a wide
    # shuffled alphabet -> package-merge emits 10-bit code lengths, which
    # only the ULTRA 11-bit tree layout can carry
    wrng = np.random.default_rng(99)
    counts = [max(1, int(1.25 ** i)) for i in range(60)]
    counts = [max(1, int(c * 7000 / sum(counts))) for c in counts]
    syms = np.repeat(np.arange(40, 100, dtype=np.uint8), counts)
    wrng.shuffle(syms)
    skew = syms.tobytes()
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
        # reference golden-case parity: 09_block_dict / 10_glo_offset16 /
        # 12_glo_huffman_dict / 13_glo_huffman_wide
        "dict_l3": (text[:3000], EncodeOpts(level=3, block_size=4096,
                                            dict_content=dict_content)),
        "dict_huf_l6": (_dict_huf_payload(),
                        EncodeOpts(level=6, block_size=4096,
                                   dict_content=dict_content,
                                   dict_huf=dict_table)),
        "offset16_l3": (far, EncodeOpts(level=3, block_size=8192)),
        "wide_l7": (skew, EncodeOpts(level=7, block_size=8192)),
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
    if opts.dict_content:
        from zxc_tpu.format.dictionary import dict_id
        assert fh.dict_id == dict_id(opts.dict_content, opts.dict_huf)
    else:
        assert fh.dict_id == 0

    size, ghash = headers.read_file_footer(archive)
    assert size == len(data)
    if not opts.checksum:
        assert ghash == 0

    n_blocks = 0
    first_gnr = None
    for pos, bh in frame.iter_blocks(archive):
        assert bh.block_type in (C.BLOCK_RAW, C.BLOCK_GLO, C.BLOCK_GHI)
        assert bh.comp_size <= C.compress_block_bound(fh.block_size)
        if first_gnr is None and bh.block_type in (C.BLOCK_GLO, C.BLOCK_GHI):
            off = pos + C.BLOCK_HEADER_SIZE
            n_sec = (C.GLO_SECTIONS if bh.block_type == C.BLOCK_GLO
                     else C.GHI_SECTIONS)
            first_gnr = headers.read_gnr_header(
                archive[off:off + C.GNR_HEADER_SIZE
                        + n_sec * C.SECTION_DESC_SIZE], n_sec)
        n_blocks += 1
    expected_blocks = (len(data) + fh.block_size - 1) // fh.block_size
    assert n_blocks == expected_blocks

    # per-case wire-feature pins (reference golden_cases.h analog)
    if name == "offset16_l3":
        gh, _ = first_gnr
        # wire: enc_off == 1 selects the compact 8-bit form; anything else
        # means 16-bit offsets (codec/block_decode.py parse_block_glo)
        assert gh.enc_off != 1, "offset16 golden must use 16-bit offsets"
    if name == "wide_l7":
        gh, descs = first_gnr
        assert gh.enc_lit == C.ENC_HUFFMAN
        from zxc_tpu.codec import huffman
        # literal section starts with the 128B packed lengths header
        lit_off = None
        for pos, bh in frame.iter_blocks(archive):
            if bh.block_type == C.BLOCK_GLO:
                lit_off = (pos + C.BLOCK_HEADER_SIZE + C.GNR_HEADER_SIZE
                           + C.GLO_SECTIONS * C.SECTION_DESC_SIZE)
                break
        cl = huffman.unpack_lengths(archive[lit_off:lit_off
                                            + C.HUF_TABLE_SIZE])
        assert int(cl.max()) > 8, "wide golden must pin an 11-bit tree"
    if name == "dict_huf_l6":
        gh, _ = first_gnr
        assert gh.enc_lit == C.ENC_HUFFMAN_DICT, \
            "dict-huffman golden must use the shared table (enc_lit=3)"

    sek = headers.parse_seek_table(archive)
    if opts.seekable and n_blocks:
        assert sek is not None and len(sek) == n_blocks
    # roundtrip is implied structure
    d_opts = DecodeOpts(checksum=opts.checksum,
                        dict_content=opts.dict_content,
                        dict_huf=opts.dict_huf)
    assert frame.decompress(archive, d_opts) == data


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
