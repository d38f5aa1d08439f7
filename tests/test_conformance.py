"""Conformance suite: every valid archive must byte-match its .expected;
every invalid archive must be rejected. (reference: conformance/README.md)
"""
import glob
import os

import pytest

from zxc_tpu.codec.frame import decompress, DecodeOpts
from zxc_tpu.format.dictionary import Dictionary
from zxc_tpu.errors import ZxcError
from ref_oracle import CONFORMANCE_DIR

VALID = sorted(glob.glob(os.path.join(CONFORMANCE_DIR, "valid", "*.zxc")))
INVALID = sorted(glob.glob(os.path.join(CONFORMANCE_DIR, "invalid", "*.zxc")))


def _opts_for(path: str) -> DecodeOpts:
    opts = DecodeOpts(checksum=True)
    base = os.path.basename(path)
    if base.startswith("dict_"):
        # dictionary vectors ship a .zxd next to them (dict_http.zxd covers
        # dict_http; dict_text.zxd covers the others)
        stem = os.path.splitext(path)[0]
        zxd = stem + ".zxd"
        if not os.path.exists(zxd):
            candidates = glob.glob(os.path.join(os.path.dirname(path), "*.zxd"))
            assert candidates, "no .zxd found for dict vector"
            from zxc_tpu.codec.frame import get_dict_id
            with open(path, "rb") as f:
                want = get_dict_id(f.read())
            zxd = None
            for c in candidates:
                with open(c, "rb") as f:
                    d = Dictionary.load(f.read())
                if d.id == want:
                    zxd = c
                    break
            assert zxd, f"no matching .zxd for {base}"
        with open(zxd, "rb") as f:
            d = Dictionary.load(f.read())
        opts.dict_content = d.content
        opts.dict_huf = d.huf_lengths
    return opts


@pytest.mark.parametrize("path", VALID, ids=[os.path.basename(p) for p in VALID])
def test_valid_vector(path):
    with open(path, "rb") as f:
        archive = f.read()
    with open(os.path.splitext(path)[0] + ".expected", "rb") as f:
        expected = f.read()
    out = decompress(archive, _opts_for(path))
    assert out == expected


@pytest.mark.parametrize("path", INVALID, ids=[os.path.basename(p) for p in INVALID])
def test_invalid_vector_rejected(path):
    with open(path, "rb") as f:
        archive = f.read()
    with pytest.raises(ZxcError):
        decompress(archive, DecodeOpts(checksum=True))
