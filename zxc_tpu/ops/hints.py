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
VERSION = 2
HEADER_SIZE = 128

# header layout (little-endian):
#   0  magic[8]
#   8  u32 version, u32 flags
#   16 u64 archive_len, u64 archive_hash (rapidhash64, seed 0)
#   32 u64 block_size, u64 nb
#   48 u32 K, u32 quad_align
#   56 u64 MAXQ, u64 NG32, u64 RLP, u64 NST
#   88 u64 body_hash (rapidhash64 of everything after the header)
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


class HintFile:
    """Validated mmap view over a .zxh hint file."""

    def __init__(self, path: str, archive) -> None:
        self.path = path
        raw = np.memmap(path, np.uint8, mode="r")
        if len(raw) < HEADER_SIZE:
            raise ZxcError(ERROR_CORRUPT_DATA, "hint file truncated")
        (magic, version, _flags, alen, ahash, block_size, nb, K, qa,
         MAXQ, NG32, RLP, NST, body_hash) = _HDR.unpack(
            bytes(raw[:HEADER_SIZE]))
        if magic != MAGIC or version != VERSION:
            raise ZxcError(ERROR_CORRUPT_DATA, "hint magic/version mismatch")
        if alen != len(archive) or ahash != _archive_hash(archive):
            raise ZxcError(ERROR_CORRUPT_DATA,
                           "hint does not match this archive")
        self.geo = HintGeometry(int(block_size), int(nb), int(K), int(qa),
                                int(MAXQ), int(NG32), int(RLP), int(NST))
        g = self.geo
        off = HEADER_SIZE

        def view(dtype, shape):
            nonlocal off
            n = int(np.prod(shape)) * np.dtype(dtype).itemsize
            if off + n > len(raw):
                raise ZxcError(ERROR_CORRUPT_DATA, "hint body truncated")
            a = raw[off:off + n].view(dtype).reshape(shape)
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
        self.plans = view(np.int32, (n_plan, 4))
        from ..format import hashes
        if body_hash != (hashes.rapidhash64(bytes(raw[HEADER_SIZE:
                                                      HEADER_SIZE + 4096]))
                         ^ (len(raw) - HEADER_SIZE)):
            raise ZxcError(ERROR_CORRUPT_DATA, "hint body hash mismatch")

    def plan_slice(self, i: int) -> np.ndarray:
        return self.plans[int(self.plan_off[i]):int(self.plan_off[i + 1])]


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def write_hints(archive, path: str, opts=None, K: int = 2,
                quad_align: int = 2, workers: int | None = None) -> str:
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
                dict_buf=w.dict_buf, dict_cl=w.dict_cl)
            if r is None:
                raise ZxcError(ERROR_CORRUPT_DATA, "native runtime required")
            total, nq, maxrow, litrows, n_plan, litlen = r
            if total == -16:
                plan = plan_scratch(2 * len(plan))
                continue
            if total < 0:
                raise ZxcError(int(total), f"hint sizing block {i}")
            geom[i] = (nq, max(maxrow, litrows), litrows, n_plan)
            return

    with ThreadPoolExecutor(workers) as ex:
        list(ex.map(size_one, range(nb)))

    MAXQ = _round_up(int(geom[:, 0].max(initial=1)) + 1, 32)
    RLP = _round_up(int(geom[:, 1].max(initial=1)) + 1, 128)
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
            quad_align=quad_align, dict_buf=w.dict_buf, dict_cl=w.dict_cl)
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
    body_len = sum(a.nbytes for a in body_parts)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(b"\0" * HEADER_SIZE)
        for a in body_parts:
            f.write(np.ascontiguousarray(a).tobytes())
    # body hash: first 4 KiB of body xor body length (cheap, catches
    # truncation and header-adjacent corruption; full-file hashing would
    # double the write cost for a cache file)
    raw = np.memmap(tmp, np.uint8, mode="r")
    body_hash = (hashes.rapidhash64(bytes(raw[HEADER_SIZE:
                                            HEADER_SIZE + 4096]))
                 ^ body_len)
    del raw
    hdr = _HDR.pack(MAGIC, VERSION, 0, len(archive),
                    _archive_hash(archive), bs, nb, K, quad_align,
                    MAXQ, NG32, RLP, NST, body_hash)
    with open(tmp, "r+b") as f:
        f.write(hdr)
    os.replace(tmp, path)
    return path
