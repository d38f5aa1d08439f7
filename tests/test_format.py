"""Format-layer tests: hashes, varints, headers vs the FORMAT.md worked
examples and the reference C library."""
import os
import struct

import numpy as np
import pytest

from zxc_tpu import constants as C
from zxc_tpu.format import hashes, varint, headers
from ref_oracle import ref_compress, ref_decompress

# FORMAT.md section 14 worked example: 10-byte input, level -1, checksums on.
WORKED = bytes.fromhex(
    "f52eb09c071380000000000000003e5d"
    "0000000a0000006948656c6c6f205a58"
    "430a90bba175ff000000000000020a00"
    "00000000000090bba175"
)


def test_worked_example_reproduced_by_oracle():
    arc = ref_compress(b"Hello ZXC\n", level=1, checksum=True)
    assert arc == WORKED


def test_hash16_file_header():
    hdr = WORKED[:16]
    tmp = bytearray(hdr)
    tmp[14] = tmp[15] = 0
    assert hashes.hash16(bytes(tmp)) == struct.unpack_from("<H", hdr, 14)[0] == 0x5D3E


def test_hash8_block_headers():
    for off, expect in ((0x10, 0x69), (0x26, 0x02)):
        hdr = bytearray(WORKED[off:off + 8])
        hdr[7] = 0
        assert hashes.hash8(bytes(hdr)) == expect


def test_rapidhash32_block_checksum():
    # Worked example: RAW payload checksum = 0x75A1BB90
    assert hashes.rapidhash32(b"Hello ZXC\n") == 0x75A1BB90


def test_rapidhash32_sizes_vs_frames():
    """Cross-check rapidhash32 against reference-produced block checksums for
    many payload sizes (covers every length class of the algorithm)."""
    rng = np.random.default_rng(0)
    for n in [0, 1, 2, 3, 4, 5, 7, 8, 9, 15, 16, 17, 32, 48, 63, 64, 80, 96,
              112, 113, 224, 225, 1000, 5000]:
        if n == 0:
            continue
        # random bytes are incompressible -> RAW block, payload = input
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        arc = ref_compress(data, level=1, checksum=True, block_size=C.BLOCK_SIZE_MAX)
        bh = headers.read_block_header(arc, C.FILE_HEADER_SIZE)
        assert bh.block_type == C.BLOCK_RAW
        payload_off = C.FILE_HEADER_SIZE + C.BLOCK_HEADER_SIZE
        payload = arc[payload_off:payload_off + bh.comp_size]
        stored = struct.unpack_from("<I", arc, payload_off + bh.comp_size)[0]
        assert payload == data
        assert hashes.rapidhash32(payload) == stored, f"len {n}"


def test_global_hash_rolling():
    data = os.urandom(3 * C.BLOCK_SIZE_MIN)
    arc = ref_compress(data, level=1, checksum=True, block_size=C.BLOCK_SIZE_MIN)
    g = 0
    pos = C.FILE_HEADER_SIZE
    while True:
        bh = headers.read_block_header(arc, pos)
        if bh.block_type == C.BLOCK_EOF:
            break
        payload = arc[pos + 8:pos + 8 + bh.comp_size]
        g = hashes.global_hash_update(g, hashes.rapidhash32(payload))
        pos += 8 + bh.comp_size + 4
    _, stored = headers.read_file_footer(arc)
    assert g == stored


def test_file_header_roundtrip_and_parity():
    mine = headers.write_file_header(C.BLOCK_SIZE_DEFAULT, True, 0)
    assert mine == WORKED[:16].replace(WORKED[:16], mine)  # self
    # exact parity with the worked example header
    assert mine == WORKED[:16]
    fh = headers.read_file_header(mine)
    assert fh.block_size == C.BLOCK_SIZE_DEFAULT and fh.has_checksum and fh.dict_id == 0


def test_block_header_parity():
    assert headers.write_block_header(C.BLOCK_RAW, 10) == WORKED[0x10:0x18]
    assert headers.write_block_header(C.BLOCK_EOF, 0) == WORKED[0x26:0x2E]


def test_seekable_worked_example():
    arc = ref_compress(b"Hello ZXC\n", level=1, checksum=True, seekable=True)
    table = headers.parse_seek_table(arc)
    assert table == [22]
    # our writer produces the same SEK bytes
    sek = headers.write_seek_table([22])
    assert sek == arc[0x2E:0x3A]


def test_varint_roundtrip():
    for v in [0, 1, 127, 128, 500, 16383, 16384, 100000, (1 << 21) - 1]:
        enc = varint.varint_encode(v)
        dec, pos = varint.varint_decode(enc, 0)
        assert dec == v and pos == len(enc)


def test_varint_array():
    vals = [0, 5, 127, 128, 9999, 16384, 2097151, 77]
    stream = b"".join(varint.varint_encode(v) for v in vals)
    arr, ok = varint.varint_decode_array(np.frombuffer(stream, np.uint8), len(vals))
    assert ok and list(arr) == vals


def test_varint_array_rejects_out_of_spec():
    arr, ok = varint.varint_decode_array(np.frombuffer(b"\xE0\x01\x02\x03", np.uint8), 1)
    assert not ok
    arr, ok = varint.varint_decode_array(np.frombuffer(b"\xC0\x01", np.uint8), 1)  # truncated
    assert not ok


def test_bad_headers_rejected():
    with pytest.raises(Exception):
        headers.read_file_header(b"\x00" * 16)
    corrupted = bytearray(WORKED[:16])
    corrupted[5] ^= 1
    with pytest.raises(Exception):
        headers.read_file_header(bytes(corrupted))
