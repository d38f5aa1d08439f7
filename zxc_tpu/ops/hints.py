"""Encode-time piece-plan hints (.zxh sidecar / decode-side cache).

The v19 device decode needs, per block, (a) the packed control slices
(qs/qbase/pctrl/tq — pure CONTROL: quad geometry, lane control words,
target rows) and (b) the lit8 window (dict ++ literals ++ resolver-
materialized bytes — the DATA). Building (a) costs ~97% of host prep
(piece resolution 50% + lane-op packing 47%, measured round 4); (b) is
memcpy/entropy-grade.

A hint file stores (a) verbatim in the dispatch-group layout plus a
replay plan for (b)'s materialized tail. Decode with a hint then:

* mmaps qs/qbase/pctrl/tq and device_puts group slices directly
  (zero host transform),
* rebuilds lit8 from the ARCHIVE: literal-section decode + plan replay
  (`zxch_v19_lit8_load`) — every data byte still comes from the wire;
  the hint carries control records only,

which removes resolution+packing from the decode hot path entirely.
The wire format is UNCHANGED (SURVEY.md §5 "long-context" note blesses
hints as host-side precomputation); hints bind to one exact archive by
length + rapidhash64 and carry a body hash, so a stale or corrupt file
is rejected and the caller falls back to the cold path.

Reference analog: none (the reference decodes at memory speed on CPU and
needs no precomputation); this is the TPU-native answer to the same
"one call does everything" contract (zxc_dispatch.c:856-1055) when the
copy engine lives on an accelerator behind a host prep stage.
"""
from __future__ import annotations

import os
import struct
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import numpy as np

from ..errors import ZxcError, ERROR_CORRUPT_DATA
from .. import runtime

MAGIC = b"ZXCHINT1"
VERSION = 3
HEADER_SIZE = 128
FLAG_BODY_ZXC = 1   # body is itself a zxc L1 frame (dogfooding: the
# padded-i32 control layout compresses ~2.2x through our own fast tier,
# taking the sidecar from ~2.8x of plaintext to ~1.3x on disk; load
# decompresses through the MT frame decoder into the caller buffer)
FLAG_V26 = 2        # control carries the v26 unified-window geometry
# (self-referential sources as scratch rows RLP + out_row; decode must
# run the v26 kernel — round-5 contract, kernel-rate parity with v19 at
# ~11% less lit8 H2D and materialization-free lit8 replay)

# header layout (little-endian):
#   0  magic[8]
#   8  u32 version, u32 flags
#   16 u64 archive_len, u64 archive_hash (rapidhash64, seed 0)
#   32 u64 block_size, u64 nb
#   48 u32 K, u32 quad_align
#   56 u64 MAXQ, u64 NG32, u64 RLP, u64 NST
#   88 u64 body_hash (rapidhash64 of the leading 4 KiB of the on-disk
#      body xor the on-disk body length; catches truncation and
#      header-adjacent corruption without a full-file hash)
#   96 .. 128 reserved (zero)
_HDR = struct.Struct("<8sII QQ QQ II QQQQ Q 32x")


def _archive_hash(archive) -> int:
    from ..format import hashes
    return hashes.rapidhash64(bytes(archive))


@dataclass
class HintGeometry:
    block_size: int
    nb: int
    K: int
    quad_align: int
    MAXQ: int
    NG32: int
    RLP: int
    NST: int
    variant: int = 19


class HintFile:
    """Validated mmap view over a .zxh hint file."""

    def __init__(self, path: str, archive) -> None:
        self.path = path
        raw = np.memmap(path, np.uint8, mode="r")
        if len(raw) < HEADER_SIZE:
            raise ZxcError(ERROR_CORRUPT_DATA, "hint file truncated")
        (magic, version, flags, alen, ahash, block_size, nb, K, qa,
         MAXQ, NG32, RLP, NST, body_hash) = _HDR.unpack(
            bytes(raw[:HEADER_SIZE]))
        if magic != MAGIC or version != VERSION:
            raise ZxcError(ERROR_CORRUPT_DATA, "hint magic/version mismatch")
        if alen != len(archive) or ahash != _archive_hash(archive):
            raise ZxcError(ERROR_CORRUPT_DATA,
                           "hint does not match this archive")
        from ..format import hashes
        if body_hash != (hashes.rapidhash64(bytes(raw[HEADER_SIZE:
                                                      HEADER_SIZE + 4096]))
                         ^ (len(raw) - HEADER_SIZE)):
            raise ZxcError(ERROR_CORRUPT_DATA, "hint body hash mismatch")
        self.geo = HintGeometry(int(block_size), int(nb), int(K), int(qa),
                                int(MAXQ), int(NG32), int(RLP), int(NST),
                                26 if flags & FLAG_V26 else 19)
        g = self.geo
        if flags & FLAG_BODY_ZXC:
            # body is a zxc frame of the raw array concatenation: MT
            # decode straight into a fresh buffer via the out= surface
            from ..codec import frame as _frame
            comp = bytes(raw[HEADER_SIZE:])
            body = np.empty(_frame.get_decompressed_size(comp), np.uint8)
            _frame.decompress(comp, _frame.DecodeOpts(
                threads=min(os.cpu_count() or 1, 8)), out=body)
            data = body
        else:
            data = raw[HEADER_SIZE:]
        off = 0

        def view(dtype, shape):
            nonlocal off
            n = int(np.prod(shape)) * np.dtype(dtype).itemsize
            if off + n > len(data):
                raise ZxcError(ERROR_CORRUPT_DATA, "hint body truncated")
            a = data[off:off + n].view(dtype).reshape(shape)
            off += n
            return a

        self.totals = view(np.int64, (g.nb,))
        self.litlen = view(np.int64, (g.nb,))
        self.litrows = view(np.int64, (g.nb,))
        self.plan_off = view(np.int64, (g.nb + 1,))
        self.qs = view(np.int32, (g.nb, g.NST + 1))
        self.qbase = view(np.int32, (g.nb, g.MAXQ))
        self.tq = view(np.uint8, (g.nb, g.MAXQ, 128))
        self.pctrl = view(np.int32, (g.nb, g.K * g.NG32, 128))
        n_plan = int(self.plan_off[-1]) if g.nb else 0
        if n_plan < 0:
            raise ZxcError(ERROR_CORRUPT_DATA, "hint plan_off corrupt")
        self.plans = view(np.int32, (n_plan, 4))
        self._dev_groups: dict = {}
        self._flat_geo: dict = {}
        # structural validation of the index arrays: the body hash covers
        # the leading 4 KiB only and the compressed body carries no
        # content checksum, so a deep bit flip could decode to garbage
        # indices — and the BATCH replay path derives raw pointers from
        # plan_off before the per-record bounds checks run. Reject any
        # hint whose indices are not self-consistent.
        if g.nb:
            po = np.asarray(self.plan_off)
            if po[0] != 0 or (np.diff(po) < 0).any() or po[-1] != n_plan:
                raise ZxcError(ERROR_CORRUPT_DATA,
                               "hint plan_off not monotonic")
            lr = np.asarray(self.litrows)
            ll = np.asarray(self.litlen)
            if ((lr < 0) | (lr > g.RLP)).any() or \
                    ((ll < 0) | (ll > g.RLP * 128)).any():
                raise ZxcError(ERROR_CORRUPT_DATA,
                               "hint litrows/litlen out of range")
            tt = np.asarray(self.totals)
            if ((tt < 0) | (tt > g.block_size)).any():
                raise ZxcError(ERROR_CORRUPT_DATA,
                               "hint totals out of range")
            qs = np.asarray(self.qs)
            if (qs[:, 0] != 0).any() or (np.diff(qs, axis=1) < 0).any() \
                    or (qs > g.MAXQ).any():
                raise ZxcError(ERROR_CORRUPT_DATA,
                               "hint qs not a quad prefix")
            qb = np.asarray(self.qbase)
            hi = g.RLP + (g.block_size // 128)   # v26 scratch height
            if ((qb & ~(1 << 24)) > hi).any() or (qb < 0).any():
                raise ZxcError(ERROR_CORRUPT_DATA,
                               "hint qbase out of range")

    def plan_slice(self, i: int) -> np.ndarray:
        return self.plans[int(self.plan_off[i]):int(self.plan_off[i + 1])]

    # -- device-resident control pages -----------------------------------
    # The control slices (qs/qbase/pctrl/tq) are a pure function of the
    # archive, already pinned by this hint file — so repeat decodes of the
    # same archive need not re-ship them: device_put once per (dispatch,
    # device) and reuse. Per-decode H2D then reduces to lit8 (the DATA
    # derived from the wire) — the round-4 verdict's "cache the
    # device-ready pages so repeat decodes ship nothing [control]" item.
    # Drop with release_device() when the archive leaves the working set.

    def device_ctrl(self, g: int, B: int, device):
        """Device arrays (qs, qbase, pctrl, tq) for dispatch group ``g``
        of width ``B``, cached on (B, device). Tail groups pad with empty
        blocks (qs == 0 never executes a quad)."""
        import jax
        key = (B, device)
        groups = self._dev_groups.setdefault(key, {})
        ctrl = groups.get(g)
        if ctrl is not None:
            return ctrl
        nb = self.geo.nb
        i0, i1 = g * B, min((g + 1) * B, nb)
        if i1 - i0 == B:
            host = (self.qs[i0:i1], self.qbase[i0:i1],
                    self.pctrl[i0:i1], self.tq[i0:i1])
        else:  # tail group
            qs_p = np.zeros((B,) + self.qs.shape[1:], np.int32)
            qb_p = np.zeros((B,) + self.qbase.shape[1:], np.int32)
            pc_p = np.full((B,) + self.pctrl.shape[1:], 1 << 7, np.int32)
            tq_p = np.zeros((B,) + self.tq.shape[1:], np.uint8)
            qs_p[:i1 - i0] = self.qs[i0:i1]
            qb_p[:i1 - i0] = self.qbase[i0:i1]
            pc_p[:i1 - i0] = self.pctrl[i0:i1]
            tq_p[:i1 - i0] = self.tq[i0:i1]
            host = (qs_p, qb_p, pc_p, tq_p)
        ctrl = tuple(jax.device_put(a, device) for a in host)
        groups[g] = ctrl
        return ctrl

    def flat_geometry(self, B: int):
        """v27 ragged-lit shipping layout: per-block 32-row-aligned
        offsets into each dispatch group's flat lit buffer, plus the
        common (max-group) row count all groups pad to. Cached on B."""
        cached = self._flat_geo.get(B)
        if cached is not None:
            return cached
        lr = np.asarray(self.litrows, np.int64)
        lr32 = ((np.maximum(lr, 1) + 31) // 32) * 32
        nb = self.geo.nb
        n_groups = -(-nb // B) if nb else 0
        loff = np.zeros(nb, np.int32)
        rows_max = 1
        for g in range(n_groups):
            i0, i1 = g * B, min((g + 1) * B, nb)
            offs = np.zeros(i1 - i0, np.int64)
            offs[1:] = np.cumsum(lr32[i0:i1 - 1])
            loff[i0:i1] = offs
            rows_max = max(rows_max, int(offs[-1] + lr32[i1 - 1]))
        rows_tot = rows_max + self.geo.RLP   # tail: last block's DMA window
        cached = (loff, lr32.astype(np.int32), int(rows_tot))
        self._flat_geo[B] = cached
        return cached

    def device_loff(self, g: int, B: int, device):
        """Device copy of group ``g``'s block row offsets (v27 scalar
        prefetch operand), cached like device_ctrl."""
        import jax
        key = ("loff", B, device)
        groups = self._dev_groups.setdefault(key, {})
        arr = groups.get(g)
        if arr is None:
            loff, lr32, rows_tot = self.flat_geometry(B)
            nb = self.geo.nb
            i0, i1 = g * B, min((g + 1) * B, nb)
            host = np.zeros(B, np.int32)
            host[:i1 - i0] = loff[i0:i1]
            arr = groups[g] = jax.device_put(host, device)
        return arr

    def release_device(self) -> None:
        """Drop every cached device control page (frees device memory)."""
        self._dev_groups.clear()


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def write_hints(archive, path: str, opts=None, K: int = 2,
                quad_align: int = 2, workers: int | None = None,
                variant: int = 26) -> str:
    """Prep every block of ``archive`` and write the .zxh hint sidecar.

    Runs at encode time on our own archives, or as a first-decode cache
    for foreign ones — the file is a pure function of the archive bytes
    either way. Two passes: a sizing prep into generous scratch picks
    exact MAXQ/RLP (hints pin decode geometry, so margins are zero), then
    the final prep writes the pinned-layout arrays. Native prep releases
    the GIL, so both passes parallelize over blocks."""
    from .device_pipeline import walk_frame
    from ..codec.frame import DecodeOpts
    if opts is None:
        opts = DecodeOpts(checksum=False)
    w = walk_frame(bytes(archive), opts)
    nb = w.n_blocks
    bs = w.block_size
    if bs % 16384:
        raise ZxcError(ERROR_CORRUPT_DATA,
                       "hints need block_size % 16384 == 0")
    NST = bs // 16384
    src = np.frombuffer(bytes(archive), np.uint8)
    workers = workers or min(os.cpu_count() or 1, 8)

    # pass 1: size (generous scratch, per-thread buffers)
    MAXQ0 = bs // 128 + 256
    RLP0 = _round_up(3 * bs // 128 + (1 << 20) // 128 + 256, 128)
    NG320 = 32 * _round_up(MAXQ0 * 4, 128) // 128
    import threading
    tl = threading.local()

    def scratch():
        b = getattr(tl, "buf", None)
        if b is None:
            b = (np.zeros(NST + 1, np.int32), np.zeros(MAXQ0, np.int32),
                 np.full((K * NG320, 128), 1 << 7, np.int32),
                 np.zeros((MAXQ0, 128), np.uint8),
                 np.zeros((RLP0, 128), np.uint8))
            tl.buf = b
        return b

    def plan_scratch(need: int):
        pl = getattr(tl, "plan", None)
        if pl is None or len(pl) < need:
            pl = np.zeros((max(need, 1 << 18), 4), np.int32)
            tl.plan = pl
        return pl

    geom = np.zeros((nb, 4), np.int64)  # nq, maxrow, litrows, n_plan

    def size_one(i: int):
        qs, qbase, pctrl, tq, lit8 = scratch()
        plan = plan_scratch(1)
        p0 = int(w.pos[i])
        payload = src[p0:p0 + int(w.comp[i])]
        while True:
            r = runtime.v19_prep_block_plan(
                payload, int(w.typ[i]), bs, qs, qbase, pctrl, tq, lit8,
                MAXQ0, NG320, RLP0, plan, K=K, quad_align=quad_align,
                dict_buf=w.dict_buf, dict_cl=w.dict_cl,
                self_ref=(variant == 26))
            if r is None:
                raise ZxcError(ERROR_CORRUPT_DATA, "native runtime required")
            total, nq, maxrow, litrows, n_plan, litlen = r
            if total == -16:
                plan = plan_scratch(2 * len(plan))
                continue
            if total < 0:
                raise ZxcError(int(total), f"hint sizing block {i}")
            # v26: RLP sizes from litrows only — lit windows may poke
            # into the scratch's zero-initialized out region, so maxrow
            # (window ends) must not inflate the shipped lit8 height
            geom[i] = (nq, litrows if variant == 26
                       else max(maxrow, litrows), litrows, n_plan)
            return

    with ThreadPoolExecutor(workers) as ex:
        list(ex.map(size_one, range(nb)))

    MAXQ = _round_up(int(geom[:, 0].max(initial=1)) + 1, 32)
    RLP = _round_up(int(geom[:, 1].max(initial=1)) + 1,
                    32 if variant == 26 else 128)  # 32: v27 DMA tiling
    NG32 = 32 * _round_up(MAXQ * 4, 128) // 128

    # pass 2: final prep into the pinned-layout arrays
    totals = np.zeros(nb, np.int64)
    litlen = np.zeros(nb, np.int64)
    litrows = np.zeros(nb, np.int64)
    plan_off = np.zeros(nb + 1, np.int64)
    plan_off[1:] = np.cumsum(geom[:, 3])
    qs_all = np.zeros((nb, NST + 1), np.int32)
    qb_all = np.zeros((nb, MAXQ), np.int32)
    tq_all = np.zeros((nb, MAXQ, 128), np.uint8)
    pc_all = np.full((nb, K * NG32, 128), 1 << 7, np.int32)
    plans = np.zeros((int(plan_off[-1]), 4), np.int32)

    def prep_one(i: int):
        lit8 = scratch()[4]
        plan = plans[int(plan_off[i]):int(plan_off[i + 1])]
        if len(plan) == 0:
            plan = np.zeros((1, 4), np.int32)
        p0 = int(w.pos[i])
        payload = src[p0:p0 + int(w.comp[i])]
        r = runtime.v19_prep_block_plan(
            payload, int(w.typ[i]), bs, qs_all[i], qb_all[i], pc_all[i],
            tq_all[i], lit8, MAXQ, NG32, RLP, plan, K=K,
            quad_align=quad_align, dict_buf=w.dict_buf, dict_cl=w.dict_cl,
            self_ref=(variant == 26))
        total, nq, maxrow, lr, n_plan, ll = r
        if total < 0:
            raise ZxcError(int(total), f"hint prep block {i}")
        if n_plan != geom[i, 3]:
            raise ZxcError(ERROR_CORRUPT_DATA, "hint plan count drifted")
        totals[i] = total
        litlen[i] = ll
        litrows[i] = lr

    with ThreadPoolExecutor(workers) as ex:
        list(ex.map(prep_one, range(nb)))

    from ..format import hashes
    body_parts = [totals, litlen, litrows, plan_off, qs_all, qb_all,
                  tq_all, pc_all, plans]
    flags = FLAG_V26 if variant == 26 else 0
    body = b"".join(np.ascontiguousarray(a).tobytes() for a in body_parts)
    if runtime.lib() is not None:
        # compress the body with our own fast tier (the padded-i32
        # control layout is ~2.2x compressible); MT both directions
        from ..codec.frame import compress as _compress, EncodeOpts
        body = _compress(body, EncodeOpts(level=1, block_size=1 << 20,
                                          threads=workers))
        flags |= FLAG_BODY_ZXC
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(b"\0" * HEADER_SIZE)
        f.write(body)
    # body hash: first 4 KiB of the on-disk body xor its length (cheap,
    # catches truncation and header-adjacent corruption; full-file
    # hashing would double the write cost for a cache file)
    body_hash = hashes.rapidhash64(body[:4096]) ^ len(body)
    hdr = _HDR.pack(MAGIC, VERSION, flags, len(archive),
                    _archive_hash(archive), bs, nb, K, quad_align,
                    MAXQ, NG32, RLP, NST, body_hash)
    with open(tmp, "r+b") as f:
        f.write(hdr)
    os.replace(tmp, path)
    return path
