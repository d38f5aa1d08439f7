"""Seekable archives: O(1) random-access decode via the SEK table.

Mirrors the reference seekable subsystem (zxc_seekable.c): backward SEK
detection and parse (:274-411), storage-agnostic reader (:436), block/range
queries (:567-616), range decode (:701-825), and the fork-join MT range
decode (:1005-1123) — which here becomes a batched device decode of the
overlapping blocks (the TPU is the worker pool).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np

from .. import constants as C
from ..errors import (ZxcError, ERROR_CORRUPT_DATA, ERROR_SRC_TOO_SMALL,
                      ERROR_BAD_HEADER, ERROR_BAD_CHECKSUM,
                      ERROR_DICT_REQUIRED, ERROR_DICT_MISMATCH)
from ..format import headers
from ..format.hashes import rapidhash32
from ..format.dictionary import dict_id as compute_dict_id
from . import block_decode, huffman

# read_at(offset, size) -> bytes of exactly `size` (short read = error)
ReadAt = Callable[[int, int], bytes]


@dataclass
class _DictState:
    buf: np.ndarray | None = None
    tree: object | None = None
    provided_id: int = 0


class Seekable:
    """Random-access view over a seekable .zxc archive.

    Storage-agnostic: constructed from a ``read_at`` callback (mmap, HTTP
    range requests, object storage, ...) plus the total size; convenience
    constructors wrap bytes and files. (reference: zxc_reader_t,
    zxc_seekable.h / zxc_seekable.c:413-565)
    """

    def __init__(self, read_at: ReadAt, size: int):
        if size < C.FILE_HEADER_SIZE + C.BLOCK_HEADER_SIZE + C.FILE_FOOTER_SIZE:
            raise ZxcError(ERROR_SRC_TOO_SMALL)
        self._read = read_at
        self._size = size
        self._dict = _DictState()

        head = read_at(0, C.FILE_HEADER_SIZE)
        self.header = headers.read_file_header(head)
        tail = read_at(size - C.FILE_FOOTER_SIZE, C.FILE_FOOTER_SIZE)
        self.decompressed_size, self.global_hash = headers.read_file_footer(tail)

        bs = self.header.block_size
        n = (self.decompressed_size + bs - 1) // bs
        if n == 0:
            self.seek_entries: list[int] = []
            self.comp_offsets = np.zeros(1, np.int64)
            return
        sek_size = C.BLOCK_HEADER_SIZE + n * C.SEEK_ENTRY_SIZE
        start = size - C.FILE_FOOTER_SIZE - sek_size
        if start < C.FILE_HEADER_SIZE:
            raise ZxcError(ERROR_BAD_HEADER, "archive is not seekable")
        blob = read_at(start, sek_size)
        bh = headers.read_block_header(blob, 0)
        if bh.block_type != C.BLOCK_SEK or bh.comp_size != n * C.SEEK_ENTRY_SIZE:
            raise ZxcError(ERROR_BAD_HEADER, "archive is not seekable (no SEK)")
        entries = np.frombuffer(blob, np.uint8,
                                count=n * C.SEEK_ENTRY_SIZE,
                                offset=C.BLOCK_HEADER_SIZE).view("<u4").astype(np.int64)
        bound = C.compress_block_bound(bs)
        if (entries < C.BLOCK_HEADER_SIZE).any() or (entries > bound).any():
            raise ZxcError(ERROR_CORRUPT_DATA, "SEK entry out of range")
        self.seek_entries = [int(e) for e in entries]
        # cumulative byte offset of block i's header
        self.comp_offsets = np.concatenate(
            [[C.FILE_HEADER_SIZE], C.FILE_HEADER_SIZE + np.cumsum(entries)])
        if int(self.comp_offsets[-1]) + C.BLOCK_HEADER_SIZE > size:
            raise ZxcError(ERROR_CORRUPT_DATA, "SEK table exceeds archive")

    # -- constructors -----------------------------------------------------

    @classmethod
    def open_bytes(cls, archive: bytes) -> "Seekable":
        def read_at(off: int, n: int) -> bytes:
            if off + n > len(archive):
                raise ZxcError(ERROR_SRC_TOO_SMALL, "read past end")
            return archive[off:off + n]
        return cls(read_at, len(archive))

    @classmethod
    def open_file(cls, path: str) -> "Seekable":
        import os
        f = open(path, "rb")
        size = os.fstat(f.fileno()).st_size

        def read_at(off: int, n: int) -> bytes:
            b = os.pread(f.fileno(), n, off)
            if len(b) != n:
                raise ZxcError(ERROR_SRC_TOO_SMALL, "short read")
            return b
        obj = cls(read_at, size)
        obj._file = f  # keep alive
        return obj

    # -- dictionary -------------------------------------------------------

    def set_dict(self, content: bytes, huf_lengths: bytes | None = None) -> None:
        """Attach the dictionary required by the archive (tree built once,
        like zxc_cctx_attach_dict_huf)."""
        d = _DictState(np.frombuffer(content, np.uint8), None,
                       compute_dict_id(content, huf_lengths))
        if huf_lengths is not None:
            d.tree = huffman.build_tree_packed(bytes(huf_lengths))
        self._dict = d

    def _check_dict(self):
        if self.header.dict_id != 0:
            if self._dict.buf is None:
                raise ZxcError(ERROR_DICT_REQUIRED)
            if self._dict.provided_id != self.header.dict_id:
                raise ZxcError(ERROR_DICT_MISMATCH)

    # -- queries ----------------------------------------------------------

    @property
    def block_size(self) -> int:
        return self.header.block_size

    @property
    def num_blocks(self) -> int:
        return len(self.seek_entries)

    def block_comp_size(self, i: int) -> int:
        """Compressed bytes of block ``i`` incl. header/checksum tail
        (zxc_seekable_get_block_comp_size)."""
        if not (0 <= i < self.num_blocks):
            raise ZxcError(ERROR_SRC_TOO_SMALL, "block index out of range")
        return self.seek_entries[i]

    def block_decomp_size(self, i: int) -> int:
        """Decompressed bytes of block ``i``
        (zxc_seekable_get_block_decomp_size)."""
        if not (0 <= i < self.num_blocks):
            raise ZxcError(ERROR_SRC_TOO_SMALL, "block index out of range")
        if i < self.num_blocks - 1:
            return self.block_size
        return self.decompressed_size - i * self.block_size

    def block_of(self, offset: int) -> int:
        if not (0 <= offset < max(self.decompressed_size, 1)):
            raise ZxcError(ERROR_SRC_TOO_SMALL, "offset out of range")
        return offset // self.block_size

    def block_range(self, offset: int, length: int) -> tuple[int, int]:
        """[first, last] blocks overlapping the byte range."""
        if length <= 0 or offset < 0 or offset + length > self.decompressed_size:
            raise ZxcError(ERROR_SRC_TOO_SMALL, "range out of bounds")
        return offset // self.block_size, (offset + length - 1) // self.block_size

    # -- decode -----------------------------------------------------------

    def _block_payload(self, i: int) -> tuple[np.ndarray, int | None]:
        off = int(self.comp_offsets[i])
        blob = self._read(off, self.seek_entries[i])
        bh = headers.read_block_header(blob, 0)
        tail = C.BLOCK_CHECKSUM_SIZE if self.header.has_checksum else 0
        if C.BLOCK_HEADER_SIZE + bh.comp_size + tail != self.seek_entries[i]:
            raise ZxcError(ERROR_CORRUPT_DATA, "SEK entry / block header mismatch")
        payload = np.frombuffer(blob, np.uint8, count=bh.comp_size,
                                offset=C.BLOCK_HEADER_SIZE)
        stored = None
        if tail:
            stored = int(np.frombuffer(blob, np.uint8, count=4,
                                       offset=C.BLOCK_HEADER_SIZE + bh.comp_size
                                       ).view("<u4")[0])
        return payload, (bh.block_type, stored)

    def decompress_block(self, i: int, verify_checksum: bool = False) -> bytes:
        if not (0 <= i < self.num_blocks):
            raise ZxcError(ERROR_SRC_TOO_SMALL, "block index")
        self._check_dict()
        payload, (btype, stored) = self._block_payload(i)
        if verify_checksum and stored is not None:
            if rapidhash32(payload.tobytes()) != stored:
                raise ZxcError(ERROR_BAD_CHECKSUM, "block payload checksum")
        out = block_decode.decode_block(btype, payload, self.block_size,
                                        self._dict.buf, self._dict.tree)
        want = min(self.block_size,
                   self.decompressed_size - i * self.block_size)
        if len(out) != want:
            raise ZxcError(ERROR_CORRUPT_DATA, "block decoded size mismatch")
        return out.tobytes()

    def decompress_range(self, offset: int, length: int,
                         verify_checksum: bool = False) -> bytes:
        """Host-path range decode: only overlapping blocks are touched
        (zxc_seekable_decompress_range, zxc_seekable.c:701)."""
        if length == 0:
            return b""
        b0, b1 = self.block_range(offset, length)
        parts = [self.decompress_block(i, verify_checksum)
                 for i in range(b0, b1 + 1)]
        blob = b"".join(parts)
        lo = offset - b0 * self.block_size
        return blob[lo:lo + length]

    def decompress_range_mt(self, offset: int, length: int,
                            verify_checksum: bool = False,
                            n_threads: int = 0) -> bytes:
        """Fork-join MT range decode (zxc_seekable_decompress_range_mt,
        zxc_seekable.c:1005): overlapping blocks decode on a thread pool
        (the native block decode releases the GIL) and reassemble in
        order."""
        if length == 0:
            return b""
        import os
        from concurrent.futures import ThreadPoolExecutor
        b0, b1 = self.block_range(offset, length)
        if n_threads <= 0:
            n_threads = os.cpu_count() or 1
        workers = max(1, min(n_threads, b1 - b0 + 1, 16))
        if workers == 1:
            return self.decompress_range(offset, length, verify_checksum)
        with ThreadPoolExecutor(workers) as ex:
            parts = list(ex.map(
                lambda i: self.decompress_block(i, verify_checksum),
                range(b0, b1 + 1)))
        blob = b"".join(parts)
        lo = offset - b0 * self.block_size
        return blob[lo:lo + length]

    def decompress_range_device(self, offset: int, length: int,
                                device=None, batch: int = 64) -> bytes:
        """Device-batched range decode — the TPU equivalent of the
        reference's fork-join MT path (zxc_seekable.c:1005): the
        overlapping blocks become one sharded batch."""
        if length == 0:
            return b""
        self._check_dict()
        b0, b1 = self.block_range(offset, length)
        from ..ops.batch import FramePlan, decode_plan_device
        plan = FramePlan(block_size=self.block_size,
                         dict_buf=self._dict.buf,
                         dict_len=0 if self._dict.buf is None else len(self._dict.buf))
        for i in range(b0, b1 + 1):
            payload, (btype, _) = self._block_payload(i)
            ll, ml, off_, lit = block_decode.parse_block(
                btype, payload, self.block_size, self._dict.tree)
            total = int((ll + ml).sum()) + len(lit) - int(ll.sum())
            plan.ll.append(ll.astype(np.int32))
            plan.ml.append(ml.astype(np.int32))
            plan.off.append(off_.astype(np.int32))
            plan.lit.append(np.ascontiguousarray(lit))
            plan.totals.append(total)
            plan.decompressed_size += total
        plan.resolve()  # piece-plan kernel when the native resolver exists
        blob = decode_plan_device(plan, batch=batch, device=device)
        lo = offset - b0 * self.block_size
        return blob[lo:lo + length]


def is_seekable(archive: bytes) -> bool:
    try:
        Seekable.open_bytes(archive)
        return True
    except ZxcError:
        return False
