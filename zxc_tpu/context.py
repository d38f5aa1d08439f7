"""Reusable codec contexts with sticky options.

Mirrors the reference opaque-context API (zxc_create_cctx/dctx +
zxc_compress_cctx/zxc_decompress_dctx, zxc_dispatch.c:1257-1560): options
set once stick across calls; per-call overrides are allowed; attached
dictionaries have their Huffman tree built once at attach time (the
tree-at-attach behavior of zxc_cctx_attach_dict_huf, zxc_common.c:500).
"""
from __future__ import annotations

import numpy as np

from . import constants as C
from .errors import ZxcError, ERROR_BAD_LEVEL, ERROR_DICT_TOO_LARGE
from .codec import frame
from .codec.frame import EncodeOpts, DecodeOpts
from .codec import block_encode, huffman


class Cctx:
    """Reusable compression context (zxc_cctx_t equivalent)."""

    def __init__(self, level: int = C.LEVEL_DEFAULT,
                 block_size: int = C.BLOCK_SIZE_DEFAULT,
                 checksum: bool = False, seekable: bool = False):
        if not (C.LEVEL_MIN <= level <= C.LEVEL_MAX):
            raise ZxcError(ERROR_BAD_LEVEL, f"level {level}")
        self.opts = EncodeOpts(level=level, block_size=block_size,
                               checksum=checksum, seekable=seekable)
        self._dict_state: block_encode.DictState | None = None

    def attach_dict(self, content: bytes, huf_lengths: bytes | None = None):
        """Attach a dictionary; the shared tree is built once, here."""
        if len(content) > C.DICT_SIZE_MAX:
            raise ZxcError(ERROR_DICT_TOO_LARGE)
        self.opts.dict_content = content
        self.opts.dict_huf = huf_lengths
        self._dict_state = block_encode.DictState(
            np.frombuffer(content, np.uint8), huf_lengths)
        return self

    def compress(self, data: bytes, level: int | None = None) -> bytes:
        opts = self.opts
        if level is not None:
            if not (C.LEVEL_MIN <= level <= C.LEVEL_MAX):
                raise ZxcError(ERROR_BAD_LEVEL, f"level {level}")
            opts = EncodeOpts(**{**opts.__dict__, "level": level})
        return frame.compress(data, opts)

    def compress_block(self, data: bytes, level: int | None = None) -> bytes:
        """Single-block API: raw chunk, no frame (zxc_compress_block)."""
        lv = level if level is not None else self.opts.level
        if len(data) > self.opts.block_size:
            raise ZxcError(ERROR_BAD_LEVEL, "data exceeds block size")
        return block_encode.encode_chunk(
            np.frombuffer(data, np.uint8), lv, self._dict_state,
            self.opts.checksum)


class Dctx:
    """Reusable decompression context (zxc_dctx_t equivalent)."""

    def __init__(self, checksum: bool = False, device: bool = False):
        self.opts = DecodeOpts(checksum=checksum)
        self.device = device
        self._dict_tree = None

    def attach_dict(self, content: bytes, huf_lengths: bytes | None = None):
        self.opts.dict_content = content
        self.opts.dict_huf = huf_lengths
        if huf_lengths is not None:
            self._dict_tree = huffman.build_tree(
                huffman.unpack_lengths(huf_lengths))
        return self

    def decompress(self, archive: bytes) -> bytes:
        if self.device:
            from . import ops
            return ops.decompress(archive, self.opts)
        return frame.decompress(archive, self.opts)

    def decompress_block(self, block: bytes, dst_capacity: int) -> bytes:
        """Single-block API (zxc_decompress_block_safe equivalent — the
        Python path is always bounds-checked)."""
        from .format import headers
        from .codec import block_decode
        bh = headers.read_block_header(block, 0)
        payload = np.frombuffer(block, np.uint8, count=bh.comp_size,
                                offset=C.BLOCK_HEADER_SIZE)
        dict_buf = None
        if self.opts.dict_content:
            dict_buf = np.frombuffer(self.opts.dict_content, np.uint8)
        out = block_decode.decode_block(bh.block_type, payload, dst_capacity,
                                        dict_buf, self._dict_tree)
        return out.tobytes()
