"""Device PivCo-Huffman section decode (ops/pivco_device.py).

Contract: the routing kernel run on the raw wire bytes must reproduce
`huffman.decode_payload` exactly for every tree shape the format can
produce — deep skewed trees (11 levels), flat subtrees (incl. a flat
ROOT), leaf pairs, degenerate 1-symbol codes, dict shared tables — and
for every enc_lit=2/3 section in the conformance corpus. Malformed
streams must be rejected at plan time exactly like the host pass 1.
"""
import glob
import os

import numpy as np
import pytest

from zxc_tpu.codec import huffman
from zxc_tpu.ops import pivco_device as PV
from zxc_tpu.errors import ZxcError
from ref_oracle import CONFORMANCE_DIR


def _roundtrip(datas):
    """Encode each array with its own tree, decode all on device, compare."""
    payloads, ns, trees = [], [], []
    for data in datas:
        data = np.asarray(data, np.uint8)
        freq = np.bincount(data, minlength=256)
        cl = huffman.build_code_lengths(freq, huffman.MAX_LEN)
        tree = huffman.build_tree(cl)
        payloads.append(np.frombuffer(huffman.encode_payload(data, tree),
                                      np.uint8))
        ns.append(len(data))
        trees.append(tree)
    outs = PV.decode_sections_device(payloads, ns, trees)
    for data, out, pay, n, tree in zip(datas, outs, payloads, ns, trees):
        ref = huffman.decode_payload(pay, n, tree)
        assert np.array_equal(ref, np.asarray(data, np.uint8))
        assert np.array_equal(out, ref)


def test_skewed_deep_tree():
    rng = np.random.default_rng(0)
    # Zipf-ish histogram forces a deep (near-11-level) code
    syms = np.clip(rng.zipf(1.3, 20000), 1, 250).astype(np.uint8)
    _roundtrip([syms])


def test_flat_root_uniform():
    # 2^k equiprobable symbols => perfectly balanced tree = flat ROOT
    for k in (2, 3, 4, 6):
        data = np.tile(np.arange(1 << k, dtype=np.uint8), 700)
        _roundtrip([data])


def test_leaf_pairs_and_mixed():
    rng = np.random.default_rng(1)
    # two dominant symbols + a tail => leaf-pair near the root
    data = np.where(rng.random(30000) < 0.85,
                    rng.integers(0, 2, 30000),
                    rng.integers(0, 256, 30000)).astype(np.uint8)
    _roundtrip([data])


def test_degenerate_single_symbol():
    _roundtrip([np.full(1000, 42, np.uint8), np.full(1, 7, np.uint8)])


def test_full_alphabet_wide_tree():
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, 65536, dtype=np.uint8)
    _roundtrip([data])


def test_heterogeneous_batch():
    rng = np.random.default_rng(3)
    _roundtrip([
        np.clip(rng.zipf(1.5, 5000), 1, 255).astype(np.uint8),
        np.tile(np.arange(16, dtype=np.uint8), 100),
        np.full(333, 9, np.uint8),
        rng.integers(0, 256, 60000, dtype=np.uint8),
        np.where(rng.random(8192) < 0.9, 65, rng.integers(0, 256, 8192)
                 ).astype(np.uint8),
    ])


def test_rejects_malformed_stream():
    data = np.clip(np.random.default_rng(4).zipf(1.4, 4000), 1, 200
                   ).astype(np.uint8)
    freq = np.bincount(data, minlength=256)
    cl = huffman.build_code_lengths(freq, huffman.MAX_LEN)
    tree = huffman.build_tree(cl)
    pay = np.frombuffer(huffman.encode_payload(data, tree), np.uint8)
    with pytest.raises(ZxcError):
        PV.plan_section(pay[:len(pay) // 4], len(data), tree)  # truncated
    with pytest.raises(ZxcError):
        PV.plan_section(pay, len(data) * 3, tree)              # count lies


def _conformance_sections():
    """Every enc_lit=2 / enc_tok=2 PivCo section in the valid corpus."""
    from zxc_tpu import constants as C
    from zxc_tpu.format import headers
    out = []
    for path in sorted(glob.glob(os.path.join(CONFORMANCE_DIR, "valid",
                                              "*.zxc"))):
        with open(path, "rb") as f:
            arc = f.read()
        fh = headers.read_file_header(arc)
        pos = C.FILE_HEADER_SIZE
        while pos + C.BLOCK_HEADER_SIZE <= len(arc):
            bh = headers.read_block_header(arc, pos)
            if bh.block_type == C.BLOCK_EOF:
                break
            payload = np.frombuffer(
                arc[pos + C.BLOCK_HEADER_SIZE:
                    pos + C.BLOCK_HEADER_SIZE + bh.comp_size], np.uint8)
            pos += (C.BLOCK_HEADER_SIZE + bh.comp_size
                    + (C.BLOCK_CHECKSUM_SIZE if fh.has_checksum else 0))
            if bh.block_type != C.BLOCK_GLO:
                continue
            gh, descs = headers.read_gnr_header(
                payload.tobytes()[:C.GNR_HEADER_SIZE + C.GLO_SECTIONS * 8],
                C.GLO_SECTIONS)
            p = C.GNR_HEADER_SIZE + C.GLO_SECTIONS * C.SECTION_DESC_SIZE
            sz_lit, raw_lit = descs[0]
            sz_tok, _ = descs[1]
            lit_stream = payload[p:p + sz_lit]
            tok_stream = payload[p + sz_lit:p + sz_lit + sz_tok]
            if gh.enc_lit == C.ENC_HUFFMAN and raw_lit:
                out.append((lit_stream[C.HUF_TABLE_SIZE:], raw_lit,
                            bytes(lit_stream[:C.HUF_TABLE_SIZE])))
            if gh.enc_litlen == C.ENC_HUFFMAN and gh.n_sequences:
                out.append((tok_stream[C.HUF_TABLE_SIZE:], gh.n_sequences,
                            bytes(tok_stream[:C.HUF_TABLE_SIZE])))
    return out


def test_conformance_corpus_sections():
    secs = _conformance_sections()
    assert len(secs) >= 1, "corpus should contain a PivCo section"
    payloads = [s[0] for s in secs]
    ns = [s[1] for s in secs]
    trees = [huffman.build_tree_packed(s[2]) for s in secs]
    outs = PV.decode_sections_device(payloads, ns, trees)
    for (pay, n, packed), out, tree in zip(secs, outs, trees):
        ref = huffman.decode_payload(pay, n, tree)
        assert np.array_equal(out, ref)


def test_decompress_device_entropy_reference_archive():
    """Full device decode with the entropy path enabled: literal sections
    ship as wire bytes and decode on device, then feed the expansion
    kernel. Covers enc_lit=2 (inline tree) blocks, mixed with RAW/RLE."""
    import ref_oracle
    from zxc_tpu import ops
    rng = np.random.default_rng(6)
    body = (np.clip(rng.zipf(1.6, 120000), 1, 255).astype(np.uint8).tobytes()
            + b"repetitive words flow " * 3000
            + rng.integers(0, 256, 40000, dtype=np.uint8).tobytes())
    for level in (3, 6, 7):
        arc = ref_oracle.ref_compress(body, level=level, block_size=65536)
        out = ops.decompress(arc, device_entropy=True)
        assert out == body, f"level {level}"


def test_decompress_device_entropy_dict():
    """enc_lit=3 (shared dict table) sections through the device path."""
    from zxc_tpu.codec import frame
    from zxc_tpu.codec.frame import EncodeOpts, DecodeOpts
    from zxc_tpu.codec.dict_train import train_dict, train_dict_huf
    from zxc_tpu import ops
    rng = np.random.default_rng(7)
    samples = [(b"GET /api/v1/resource HTTP/1.1 host: example "
                + np.clip(rng.zipf(1.7, 900), 1, 127).astype(np.uint8)
                .tobytes()) for _ in range(24)]
    content = train_dict(samples, 1024)
    huf = train_dict_huf(samples, content)
    body = samples[3] + samples[11] + samples[19]
    arc = frame.compress(body, EncodeOpts(
        level=6, block_size=16384, dict_content=content, dict_huf=huf))
    opts = DecodeOpts(dict_content=content, dict_huf=huf)
    out = ops.decompress(arc, opts, device_entropy=True)
    assert out == body


def test_conformance_valid_device_entropy():
    """Every valid conformance vector through the device-entropy path."""
    from zxc_tpu import ops
    from test_conformance import VALID, _opts_for
    assert VALID
    for path in VALID:
        with open(path, "rb") as f:
            arc = f.read()
        with open(os.path.splitext(path)[0] + ".expected", "rb") as f:
            expected = f.read()
        out = ops.decompress(arc, _opts_for(path), device_entropy=True)
        assert out == expected, os.path.basename(path)


def test_self_encoded_frame_sections():
    """Sections pulled from our own level-6/7 archives (wide trees, dict)."""
    from zxc_tpu.codec import frame
    from zxc_tpu.codec.frame import EncodeOpts
    rng = np.random.default_rng(5)
    # skewed byte histogram with no LZ structure: the entropy candidate
    # wins the literal-section auction (enc_lit=2)
    body = np.clip(rng.zipf(1.6, 60000), 1, 255).astype(np.uint8).tobytes()
    for level in (6, 7):
        arc = frame.compress(body, EncodeOpts(level=level, block_size=16384))
        # reuse the conformance extractor machinery on the in-memory archive
        import tempfile
        with tempfile.TemporaryDirectory() as td:
            pass  # extractor reads from CONFORMANCE_DIR; parse inline instead
        from zxc_tpu import constants as C
        from zxc_tpu.format import headers
        fh = headers.read_file_header(arc)
        pos = C.FILE_HEADER_SIZE
        found = 0
        while pos + C.BLOCK_HEADER_SIZE <= len(arc):
            bh = headers.read_block_header(arc, pos)
            if bh.block_type == C.BLOCK_EOF:
                break
            payload = np.frombuffer(
                arc[pos + C.BLOCK_HEADER_SIZE:
                    pos + C.BLOCK_HEADER_SIZE + bh.comp_size], np.uint8)
            pos += C.BLOCK_HEADER_SIZE + bh.comp_size
            if bh.block_type != C.BLOCK_GLO:
                continue
            gh, descs = headers.read_gnr_header(
                payload.tobytes()[:C.GNR_HEADER_SIZE + C.GLO_SECTIONS * 8],
                C.GLO_SECTIONS)
            p = C.GNR_HEADER_SIZE + C.GLO_SECTIONS * C.SECTION_DESC_SIZE
            sz_lit, raw_lit = descs[0]
            if gh.enc_lit == C.ENC_HUFFMAN and raw_lit:
                lit_stream = payload[p:p + sz_lit]
                tree = huffman.build_tree_packed(
                    bytes(lit_stream[:C.HUF_TABLE_SIZE]))
                [out] = PV.decode_sections_device(
                    [lit_stream[C.HUF_TABLE_SIZE:]], [raw_lit], [tree])
                ref = huffman.decode_payload(
                    lit_stream[C.HUF_TABLE_SIZE:], raw_lit, tree)
                assert np.array_equal(out, ref)
                found += 1
        assert found, f"level {level} archive had no PivCo literal section"
