"""Native C++ host runtime vs pure-Python implementations (differential)."""
import numpy as np
import pytest
import os

from zxc_tpu import runtime
from zxc_tpu.format import hashes, varint
from zxc_tpu.codec import block_decode, frame
from zxc_tpu.codec.frame import EncodeOpts
from zxc_tpu.errors import ZxcError

pytestmark = pytest.mark.skipif(not runtime.available(),
                                reason="native toolchain unavailable")


def test_rapidhash_parity():
    rng = np.random.default_rng(0)
    for n in (0, 1, 3, 4, 7, 8, 15, 16, 17, 48, 111, 112, 113, 1000, 65536):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert runtime.rapidhash32(data) == hashes._py_rapidhash32(data), n
        L = runtime.lib()
        assert L.zxch_rapidhash64(data, n, 7) == hashes.rapidhash64(data, 7)


def test_header_hash_parity():
    rng = np.random.default_rng(1)
    L = runtime.lib()
    for _ in range(50):
        b8 = rng.integers(0, 256, 8, dtype=np.uint8).tobytes()
        b16 = rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
        assert L.zxch_hash8(b8) == hashes.hash8(b8)
        assert L.zxch_hash16(b16) == hashes.hash16(b16)


def test_rle_parity():
    rng = np.random.default_rng(2)
    data = (b"\x00" * 500 + rng.integers(0, 256, 300, dtype=np.uint8).tobytes()
            + b"zz" * 400)
    from zxc_tpu.codec.block_encode import encode_rle_literals
    stream = np.frombuffer(encode_rle_literals(np.frombuffer(data, np.uint8)),
                           np.uint8)
    native = runtime.rle_decode(stream, len(data))
    py = block_decode.decode_rle_literals(stream, len(data))
    assert native.tobytes() == py.tobytes() == data


def test_rle_native_rejects_corrupt():
    with pytest.raises(ZxcError):
        runtime.rle_decode(np.frombuffer(b"\xff", np.uint8), 100)


def test_varint_chain_parity():
    vals = [0, 1, 127, 128, 5000, 16383, 16384, (1 << 21) - 1, 7, 99]
    blob = b"".join(varint.varint_encode(v) for v in vals)
    out, ok = runtime.varint_chain(np.frombuffer(blob, np.uint8), len(vals))
    assert ok and list(out) == vals
    _, ok_bad = runtime.varint_chain(np.frombuffer(b"\xe0\x01", np.uint8), 1)
    assert not ok_bad


def test_native_expand_parity():
    rng = np.random.default_rng(3)
    seg = rng.integers(0, 256, 333, dtype=np.uint8).tobytes()
    data = seg * 30 + b"\x01" * 5000 + seg[:100]
    arc = frame.compress(data, EncodeOpts(level=3, block_size=4096))
    from zxc_tpu.ops.batch import plan_frame
    plan = plan_frame(arc)
    out = b"".join(
        runtime.expand(plan.ll[i], plan.ml[i], plan.off[i], plan.lit[i],
                       plan.block_size).tobytes()
        for i in range(plan.n_blocks))
    assert out == data


def test_native_expand_bad_offset():
    with pytest.raises(ZxcError):
        runtime.expand(np.array([0], np.int32), np.array([5], np.int32),
                       np.array([9], np.int32),
                       np.zeros(0, np.uint8), 100)


def test_native_rapidhash_in_frame_path():
    """frame.decompress with checksums uses the native hash transparently."""
    data = b"checksum me " * 5000
    arc = frame.compress(data, EncodeOpts(level=3, checksum=True))
    from zxc_tpu.codec.frame import DecodeOpts
    assert frame.decompress(arc, DecodeOpts(checksum=True)) == data
    assert hashes._native_rapidhash32 is not None


def test_python_fallback_paths_still_work(monkeypatch):
    """ZXC_NO_NATIVE forces the vectorized NumPy oracle; conformance-grade
    roundtrip must still hold."""
    monkeypatch.setenv("ZXC_NO_NATIVE", "1")
    rng = np.random.default_rng(9)
    seg = rng.integers(0, 256, 431, dtype=np.uint8).tobytes()
    data = seg * 40 + b"\x00" * 3000
    arc = frame.compress(data, EncodeOpts(level=3, block_size=8192,
                                          checksum=True))
    from zxc_tpu.codec.frame import DecodeOpts
    assert frame.decompress(arc, DecodeOpts(checksum=True)) == data


def test_c_abi_consumer_compiles_and_runs(tmp_path):
    """The stable C header (include/zxc_host.h) + libzxchost.so are usable
    from plain C — the packaging consumer check (reference:
    tests/packaging/consumer.c)."""
    import subprocess
    import sys as _sys
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    runtime.lib()  # ensure the .so is built
    so = os.path.join(root, "zxc_tpu", "runtime", "libzxchost.so")
    src = tmp_path / "consumer.c"
    src.write_text('''
#include "zxc_host.h"
#include <stdlib.h>
#include <string.h>
int main(void) {
    const uint8_t d[] = "abc";
    if (zxch_rapidhash32(d, 3, 0) == 0) return 2;
    uint8_t rle[] = {0x83, 0x41};
    uint8_t out[7];
    if (zxch_rle_decode(rle, 2, out, 7) != 0) return 1;
    if (memcmp(out, "AAAAAAA", 7)) return 1;
    /* simple one-call ABI roundtrip (the binding surface) */
    enum { N = 100000 };
    uint8_t *data = malloc(N);
    for (int i = 0; i < N; i++) data[i] = (uint8_t)((i * 7) % 151);
    int64_t cap = zxch_compress_bound(N, 65536);
    uint8_t *arc = malloc(cap);
    int64_t w = zxch_simple_compress(data, N, 3, 65536, 1, 1, arc, cap);
    if (w <= 0) return 3;
    int64_t ds = zxch_get_decompressed_size(arc, w);
    if (ds != N) return 4;
    int64_t bound = zxch_simple_decompress_bound(arc, w);
    if (bound < N) return 5;
    uint8_t *back = malloc(bound);
    int64_t r = zxch_simple_decompress(arc, w, back, bound, 0, 0, 0, 1);
    if (r != N || memcmp(back, data, N)) return 6;
    /* seekable range */
    uint8_t slice[1000];
    int64_t sr = zxch_seekable_range(arc, w, 70000, 1000, slice, 1000,
                                     0, 0, 0);
    if (sr != 1000 || memcmp(slice, data + 70000, 1000)) return 7;
    free(data); free(arc); free(back);
    return 0;
}
''')
    exe = tmp_path / "consumer"
    subprocess.run(["gcc", "-I", os.path.join(root, "include"), str(src),
                    so, "-o", str(exe), f"-Wl,-rpath,{os.path.dirname(so)}"],
                   check=True, capture_output=True)
    subprocess.run([str(exe)], check=True)


def test_pivco_encode_matches_python():
    """Native zxch_pivco_encode is byte-exact vs the vectorized Python
    emitter across random trees at both caps (8 and 11 bits)."""
    from zxc_tpu.codec import huffman
    if runtime.lib() is None:
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(5)
    checked = 0
    for trial in range(25):
        nsym = int(rng.integers(1, 256))
        syms = rng.choice(256, nsym, replace=False)
        freq = np.zeros(256, np.int64)
        freq[syms] = rng.integers(1, 10000, nsym)
        for cap in (8, 11):
            cl = huffman.build_code_lengths(freq, cap)
            if cl is None:
                continue
            data = rng.choice(syms, int(rng.integers(1, 4000))).astype(np.uint8)
            tree = huffman.build_tree(cl)
            # go under the native hook: numpy path explicitly
            import zxc_tpu.runtime as rt
            nat = rt.pivco_encode(data, cl)
            orig = rt.pivco_encode
            try:
                rt.pivco_encode = lambda *a, **k: None  # force numpy path
                py = huffman.encode_payload(data, tree)
            finally:
                rt.pivco_encode = orig
            assert nat == py
            # and it must decode back
            assert bytes(huffman.decode_payload(
                np.frombuffer(nat, np.uint8), len(data), tree)) == data.tobytes()
            checked += 1
    assert checked > 20


def test_pivco_encode_vectorized_path_matches_python():
    """The level-order vectorized pack (pass-2 v2; engages at n >= 2048
    on AVX512-VBMI2 builds) is byte-exact vs the Python emitter across
    section sizes spanning the engage threshold, skewed/flat/sparse
    trees, and both caps. ZXCH_PIVCO_SCALAR=1 forces the scalar pass for
    the same-build A/B (tools/encode_ab.py measured the v2 speedup at
    byte-identical archives: PivCo sections 42 -> 1009 MB/s)."""
    from zxc_tpu.codec import huffman
    if runtime.lib() is None:
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(17)
    checked = 0
    sizes = [2047, 2048, 2049, 8192, 100_000]
    for trial in range(10):
        kind = trial % 5
        n = sizes[trial % len(sizes)]
        if kind == 0:
            data = rng.integers(0, 256, n).astype(np.uint8)   # near-flat
        elif kind == 1:
            data = np.minimum(rng.geometric(0.05, n) - 1, 255).astype(
                np.uint8)                                     # skewed
        elif kind == 2:
            data = rng.choice(np.array([7, 42, 200], np.uint8), n)  # sparse
        elif kind == 3:
            data = np.full(n, 9, np.uint8)                    # one symbol
        else:
            data = rng.choice(
                np.frombuffer(b"the quick brown fox\n", np.uint8), n)
        freq = np.bincount(data, minlength=256).astype(np.int64)
        for cap in (8, 11):
            cl = huffman.build_code_lengths(freq, cap)
            if cl is None:
                continue
            tree = huffman.build_tree(cl)
            nat = runtime.pivco_encode(data, cl)
            orig = runtime.pivco_encode
            try:
                runtime.pivco_encode = lambda *a, **k: None
                py = huffman.encode_payload(data, tree)
            finally:
                runtime.pivco_encode = orig
            assert nat == py, (n, kind, cap)
            assert bytes(huffman.decode_payload(
                np.frombuffer(nat, np.uint8), len(data),
                tree)) == data.tobytes()
            checked += 1
    assert checked >= 15
