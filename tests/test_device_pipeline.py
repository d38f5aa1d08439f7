"""End-to-end device decode pipeline (ops/device_pipeline.py).

Two contracts:

1. **Pack parity**: the fused native prep (`zxch_v19_prep_block`) must be
   BYTE-IDENTICAL to the NumPy reference packer
   (`pallas_decode.pack_blocks_v19` over `resolve_pieces(device_pure,
   max_frag=1)` + `lane_ops`) on every array it writes — same quads, same
   control words, same literal rows.
2. **e2e correctness**: `decompress_e2e` returns the exact plaintext (and
   matching device fingerprints) for reference- and self-encoded archives
   across levels, block types, checksums and dictionaries, with the
   overlapped thread-pool orchestration active.

The hardware path is driven by bench.py on the real chip; interpret mode
runs the same Mosaic ops on CPU.
"""
import numpy as np
import pytest

from zxc_tpu import runtime
from zxc_tpu.codec import frame
from zxc_tpu.codec.frame import EncodeOpts, DecodeOpts
from zxc_tpu.ops.batch import plan_frame
from zxc_tpu.ops import pallas_decode as PD
from zxc_tpu.ops import device_pipeline as DPL

import ref_oracle

pytestmark = pytest.mark.skipif(not runtime.available(),
                                reason="native toolchain unavailable")


def _mixed_body(seed: int, size: int) -> bytes:
    rng = np.random.default_rng(seed)
    seg = rng.integers(0, 256, 997, dtype=np.uint8).tobytes()
    body = (b"text " * 5000 + seg * 40 + b"\x00" * 20000 + b"ab" * 8000
            + b"".join(bytes(range(k)) * (3000 // k) for k in (3, 7, 13))
            + rng.integers(0, 256, 60000, dtype=np.uint8).tobytes())
    return (body * (size // len(body) + 1))[:size]


def _assert_pack_parity(arc: bytes, opts=None, K: int = 2):
    plan = plan_frame(arc, opts)
    pieces, lits = [], []
    for i in range(plan.n_blocks):
        r = runtime.resolve_pieces(plan.ll[i], plan.ml[i], plan.off[i],
                                   plan.lit[i], plan.dict_buf,
                                   device_pure=True, max_frag=1)
        assert r is not None
        pieces.append(r[:4])
        lits.append(r[4])
    qs, qb, pc, tq, l8 = PD.pack_blocks_v19(pieces, lits, list(plan.totals),
                                            plan.block_size, K=K)
    MAXQ = -(-qb.shape[1] // 32) * 32
    RLP = -(-l8.shape[1] // 128) * 128
    ref = PD.pad_v19_set((qs, qb, pc, tq, l8), MAXQ, RLP, K)
    NG32 = 32 * (-(-(MAXQ * 4) // 128))

    w = DPL.walk_frame(arc, opts)
    B = plan.n_blocks
    buf = DPL._alloc_group(B, plan.block_size // 16384, MAXQ, NG32, RLP, K)
    pipe = DPL.DevicePipeline(w, arc, K=K, dispatch=B)
    for i in range(B):
        total, nq, mr, lr = pipe._prep_into(i, buf, i, MAXQ, NG32, RLP)
        assert total == plan.totals[i]
    for name, a, b in (("qs", ref[0], buf.qs), ("qbase", ref[1], buf.qbase),
                       ("pctrl", ref[2], buf.pctrl), ("tq", ref[3], buf.tq),
                       ("lit8", ref[4], buf.lit8)):
        assert np.array_equal(a, b), f"{name} differs from NumPy pack"


@pytest.mark.parametrize("level", [1, 2, 3, 6, 7])
def test_prep_matches_numpy_pack(level):
    body = _mixed_body(11, 16384 * 11 - 100)
    arc = frame.compress(body, EncodeOpts(level=level, block_size=16384))
    _assert_pack_parity(arc)


def test_prep_matches_numpy_pack_ref_archives():
    body = _mixed_body(12, 16384 * 8)
    _assert_pack_parity(ref_oracle.ref_compress(body, level=3,
                                                block_size=16384))
    _assert_pack_parity(ref_oracle.ref_compress(body, level=1,
                                                block_size=32768))
    _assert_pack_parity(ref_oracle.ref_compress(body, level=7,
                                                block_size=65536,
                                                checksum=True),
                        DecodeOpts(checksum=True))


def test_prep_matches_numpy_pack_raw_and_dict():
    rng = np.random.default_rng(5)
    _assert_pack_parity(frame.compress(
        rng.integers(0, 256, 80000, dtype=np.uint8).tobytes(),
        EncodeOpts(level=1, block_size=16384)))
    d = (b"shared dictionary content for the pipeline " * 40)[:1500]
    ddata = b"shared dictionary content appears here too " * 900
    arc = frame.compress(ddata, EncodeOpts(level=6, block_size=16384,
                                           dict_content=d))
    _assert_pack_parity(arc, DecodeOpts(dict_content=d))


def test_prep_matches_numpy_pack_k3():
    body = _mixed_body(13, 16384 * 6)
    arc = frame.compress(body, EncodeOpts(level=3, block_size=16384))
    _assert_pack_parity(arc, K=3)


def test_e2e_bytes_and_fingerprint():
    BLOCK = 16384
    data = _mixed_body(42, BLOCK * 13 - 77)
    arc = ref_oracle.ref_compress(data, level=3, block_size=BLOCK)
    out = DPL.decompress_e2e(arc, dispatch=4, interpret=True)
    assert out == data

    f1, f2, nb, dsz = DPL.decompress_e2e(arc, dispatch=4, interpret=True,
                                         _collect="fingerprint")
    assert dsz == len(data)
    exp1 = np.uint32(0)
    exp2 = np.uint32(0)
    wn = (np.arange(BLOCK, dtype=np.uint32) % 8191).astype(np.uint32)
    pos = 0
    with np.errstate(over="ignore"):
        while pos < len(data):
            blk = np.frombuffer(data[pos:pos + BLOCK], np.uint8)
            exp1 += blk.astype(np.uint32).sum(dtype=np.uint32)
            exp2 += (blk.astype(np.uint32) * wn[:len(blk)]
                     ).sum(dtype=np.uint32)
            pos += BLOCK
    assert f1 == int(exp1) and f2 == int(exp2)


def test_e2e_checksummed_l6():
    BLOCK = 16384
    data = _mixed_body(43, BLOCK * 7 - 13)
    arc = frame.compress(data, EncodeOpts(level=6, block_size=BLOCK,
                                          checksum=True))
    out = DPL.decompress_e2e(arc, DecodeOpts(checksum=True), dispatch=4,
                             interpret=True)
    assert out == data


def test_e2e_rejects_corruption():
    from zxc_tpu.errors import ZxcError
    BLOCK = 16384
    data = _mixed_body(44, BLOCK * 3)
    arc = frame.compress(data, EncodeOpts(level=3, block_size=BLOCK,
                                          checksum=True))
    bad = bytearray(arc)
    bad[60] ^= 0x20
    with pytest.raises(ZxcError):
        DPL.decompress_e2e(bytes(bad), DecodeOpts(checksum=True),
                           dispatch=4, interpret=True)
    with pytest.raises(ZxcError):
        DPL.decompress_e2e(arc[:len(arc) // 2], dispatch=4, interpret=True)


def test_e2e_shape_overflow_retry():
    """A wildly heterogeneous frame (dense random blocks after compressible
    ones) must survive the sizing-margin retry path."""
    rng = np.random.default_rng(45)
    BLOCK = 16384
    data = (b"a" * (BLOCK * 2)
            + rng.integers(0, 256, BLOCK * 4, dtype=np.uint8).tobytes())
    arc = frame.compress(data, EncodeOpts(level=3, block_size=BLOCK))
    out = DPL.decompress_e2e(arc, dispatch=2, interpret=True)
    assert out == data


# ---------------------------------------------------------------------------
# piece-plan hints (ops/hints.py): encode-time sidecar / first-decode cache
# ---------------------------------------------------------------------------

def test_hints_roundtrip(tmp_path):
    from zxc_tpu.ops import hints as H
    data = _mixed_body(11, 300_000)
    arc = ref_oracle.ref_compress(data, level=3, block_size=64 * 1024)
    path = str(tmp_path / "a.zxh")
    H.write_hints(arc, path)
    hf = H.HintFile(path, arc)
    assert hf.geo.nb == 5 and hf.geo.block_size == 64 * 1024
    # hint-path e2e must equal plaintext AND the cold-path fingerprints
    out = DPL.decompress_e2e(arc, dispatch=4, interpret=True, hint=path)
    assert out == data
    cold = DPL.decompress_e2e(arc, dispatch=4, interpret=True,
                              _collect="fingerprint")
    warm = DPL.decompress_e2e(arc, dispatch=4, interpret=True, hint=hf,
                              _collect="fingerprint")
    assert cold == warm


def test_hints_levels_and_selfencoded(tmp_path):
    from zxc_tpu.ops import hints as H
    data = _mixed_body(12, 200_000)
    for lvl, enc in ((1, "ref"), (6, "ref"), (3, "self")):
        arc = (ref_oracle.ref_compress(data, level=lvl,
                                       block_size=64 * 1024)
               if enc == "ref" else
               frame.compress(data, EncodeOpts(level=lvl,
                                               block_size=64 * 1024)))
        path = str(tmp_path / f"l{lvl}{enc}.zxh")
        H.write_hints(arc, path)
        out = DPL.decompress_e2e(arc, dispatch=4, interpret=True,
                                 hint=path)
        assert out == data, (lvl, enc)


def test_hints_reject_mismatch(tmp_path):
    from zxc_tpu.ops import hints as H
    from zxc_tpu.errors import ZxcError
    data = _mixed_body(13, 120_000)
    arc = ref_oracle.ref_compress(data, level=2, block_size=64 * 1024)
    other = ref_oracle.ref_compress(data[:100_000], level=2,
                                    block_size=64 * 1024)
    path = str(tmp_path / "a.zxh")
    H.write_hints(arc, path)
    with pytest.raises(ZxcError):
        H.HintFile(path, other)      # wrong archive
    blob = bytearray(open(path, "rb").read())
    blob[200] ^= 0xFF                # body corruption
    open(path, "wb").write(bytes(blob))
    with pytest.raises(ZxcError):
        H.HintFile(path, arc)


def test_hints_dict_archive(tmp_path):
    from zxc_tpu.ops import hints as H
    from zxc_tpu.codec import dict_train
    rng = np.random.default_rng(7)
    samples = [(b"common prefix " + rng.integers(0, 96, 300,
                                                 dtype=np.uint8).tobytes())
               for _ in range(50)]
    d = dict_train.dict_train(samples, target_size=4096)
    data = b"".join(samples)[:120_000]
    arc = frame.compress(data, EncodeOpts(level=3, block_size=64 * 1024,
                                          dict_content=d.content,
                                          dict_huf=d.huf_lengths))
    opts = DecodeOpts(dict_content=d.content, dict_huf=d.huf_lengths)
    path = str(tmp_path / "d.zxh")
    H.write_hints(arc, path, opts)
    out = DPL.decompress_e2e(arc, opts, dispatch=4, interpret=True,
                             hint=path)
    assert out == data


def test_hints_v27_ragged_shipping(tmp_path):
    """v27: the v26 hint drives the ragged-lit DMA kernel — bytes equal
    plaintext and the v26 path, with ragged tail groups covered."""
    from zxc_tpu.ops import hints as H
    data = _mixed_body(14, 330_000)           # 6 blocks: ragged tail group
    arc = ref_oracle.ref_compress(data, level=3, block_size=64 * 1024)
    path = str(tmp_path / "a.zxh")
    H.write_hints(arc, path)
    hf = H.HintFile(path, arc)
    assert hf.geo.variant == 26 and hf.geo.RLP % 32 == 0
    out27 = DPL.decompress_e2e(arc, dispatch=4, interpret=True, hint=hf,
                               variant=27)
    assert out27 == data
    fp26 = DPL.decompress_e2e(arc, dispatch=4, interpret=True, hint=hf,
                              _collect="fingerprint", variant=26)
    fp27 = DPL.decompress_e2e(arc, dispatch=4, interpret=True, hint=hf,
                              _collect="fingerprint", variant=27)
    assert fp26 == fp27


def test_lit8_load_batch_equivalence(tmp_path):
    """zxch_v19_lit8_load_batch (one call per worker stripe) must write
    exactly what per-block zxch_v19_lit8_load writes, including the
    alignment-tail zeroing."""
    from zxc_tpu.ops import hints as H
    from zxc_tpu import runtime as rt
    data = _mixed_body(15, 400_000)
    arc = ref_oracle.ref_compress(data, level=3, block_size=64 * 1024)
    path = str(tmp_path / "a.zxh")
    H.write_hints(arc, path)
    hf = H.HintFile(path, arc)
    w = DPL.walk_frame(arc)
    nb = w.n_blocks
    B = nb  # one group
    loff, lr32, rows_tot = hf.flat_geometry(B)
    RLP = hf.geo.RLP
    src = np.frombuffer(arc, np.uint8)
    # per-block reference
    ref_flat = np.full((rows_tot, 128), 0xAB, np.uint8)
    for i in range(nb):
        lo = int(loff[i])
        p0 = int(w.pos[i])
        lr = rt.v19_lit8_load(
            src[p0:p0 + int(w.comp[i])], int(w.typ[i]), 65536,
            hf.plan_slice(i), int(hf.plan_off[i + 1] - hf.plan_off[i]),
            int(hf.litlen[i]), ref_flat[lo:lo + RLP], RLP)
        ref_flat[lo + lr:lo + int(lr32[i])] = 0
    # batch, two interleaved stripes (stride 2) over a dirty buffer
    got = np.full((rows_tot, 128), 0xAB, np.uint8)
    po64 = np.ascontiguousarray(hf.plan_off, np.int64)
    ll64 = np.ascontiguousarray(hf.litlen, np.int64)
    for wk in range(2):
        rc = rt.v19_lit8_load_batch(src, w.pos, w.comp, w.typ, wk, nb, 2,
                                    65536, hf.plans, po64, ll64, got,
                                    loff, RLP, zrows=lr32)
        assert rc == 0
    # compare every block's [0, lr32) rows (bytes beyond stay untouched)
    for i in range(nb):
        lo = int(loff[i])
        assert np.array_equal(got[lo:lo + int(lr32[i])],
                              ref_flat[lo:lo + int(lr32[i])]), f"block {i}"


def test_hints_index_validation(tmp_path):
    """Garbage index arrays inside an otherwise-plausible hint must be
    rejected at load — the batch replay path derives pointers from
    plan_off, so the structural validation is load-bearing, not
    cosmetic. The tampered body rides the uncompressed format (flags
    without FLAG_BODY_ZXC) so bytes can be flipped surgically, with the
    leading-4KiB body hash recomputed to PASS."""
    import struct
    from zxc_tpu.ops import hints as H
    from zxc_tpu.errors import ZxcError
    from zxc_tpu.format import hashes
    data = _mixed_body(16, 200_000)
    arc = ref_oracle.ref_compress(data, level=3, block_size=64 * 1024)
    path = str(tmp_path / "a.zxh")
    H.write_hints(arc, path)
    hf = H.HintFile(path, arc)
    g = hf.geo
    # rebuild the file UNCOMPRESSED with a corrupted plan_off
    nb = g.nb
    parts = [np.asarray(hf.totals), np.asarray(hf.litlen),
             np.asarray(hf.litrows), np.asarray(hf.plan_off).copy(),
             np.asarray(hf.qs), np.asarray(hf.qbase),
             np.asarray(hf.tq), np.asarray(hf.pctrl),
             np.asarray(hf.plans)]
    parts[3][1] = 1 << 30          # plan_off spike -> wild pointer if used
    body = b"".join(np.ascontiguousarray(a).tobytes() for a in parts)
    hdr = H._HDR.pack(H.MAGIC, H.VERSION, H.FLAG_V26, len(arc),
                      H._archive_hash(arc), g.block_size, nb, g.K,
                      g.quad_align, g.MAXQ, g.NG32, g.RLP, g.NST,
                      hashes.rapidhash64(body[:4096]) ^ len(body))
    bad = str(tmp_path / "bad.zxh")
    open(bad, "wb").write(hdr + body)
    with pytest.raises(ZxcError):
        H.HintFile(bad, arc)
    # sanity: the same rebuild WITHOUT tampering loads fine
    parts[3][1] = int(np.asarray(hf.plan_off)[1])
    body = b"".join(np.ascontiguousarray(a).tobytes() for a in parts)
    hdr = H._HDR.pack(H.MAGIC, H.VERSION, H.FLAG_V26, len(arc),
                      H._archive_hash(arc), g.block_size, nb, g.K,
                      g.quad_align, g.MAXQ, g.NG32, g.RLP, g.NST,
                      hashes.rapidhash64(body[:4096]) ^ len(body))
    ok = str(tmp_path / "ok.zxh")
    open(ok, "wb").write(hdr + body)
    hf2 = H.HintFile(ok, arc)
    assert DPL.decompress_e2e(arc, dispatch=4, interpret=True,
                              hint=hf2) == data
