"""Language-binding surfaces over the simple C ABI (SURVEY rows 27-31).

The wrappers (wrappers/{nodejs,go,rust,wasm}) are complete sources; this
environment has no node/go/cargo/emcc toolchains, so those suites gate on
availability. What always runs here: the WASM entry shims compile with
plain gcc (WASM_EXPORT is a no-op outside emscripten) and roundtrip
against libzxchost — the same C logic every wrapper calls.
"""
import os
import shutil
import subprocess
import sys

import pytest

_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_DIR)


def _ensure_so():
    from zxc_tpu import runtime
    assert runtime.lib() is not None, "native runtime unavailable"
    return os.path.join(_REPO, "zxc_tpu", "runtime", "libzxchost.so")


def test_wasm_entry_shims(tmp_path):
    """wasm_entry.c compiles natively and its u32 ABI roundtrips."""
    so = _ensure_so()
    main = tmp_path / "main.c"
    main.write_text(r'''
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
int32_t zxcw_compress_bound(uint32_t, uint32_t);
int32_t zxcw_compress(const uint8_t*, uint32_t, int32_t, uint32_t,
                      int32_t, int32_t, uint8_t*, uint32_t);
int32_t zxcw_get_decompressed_size(const uint8_t*, uint32_t);
int32_t zxcw_decompress_bound(const uint8_t*, uint32_t);
int32_t zxcw_decompress(const uint8_t*, uint32_t, uint8_t*, uint32_t,
                        int32_t);
int32_t zxcw_seekable_range(const uint8_t*, uint32_t, uint32_t, uint32_t,
                            uint8_t*);
int32_t zxcw_detect(const uint8_t*, uint32_t);
int32_t zxcw_compress_dict(const uint8_t*, uint32_t, int32_t, uint32_t,
                           int32_t, int32_t, const uint8_t*, uint32_t,
                           const uint8_t*, uint8_t*, uint32_t);
int32_t zxcw_decompress_dict(const uint8_t*, uint32_t, uint8_t*, uint32_t,
                             const uint8_t*, uint32_t, const uint8_t*,
                             int32_t);
int main(void) {
    enum { N = 120000 };
    uint8_t *data = malloc(N);
    for (int i = 0; i < N; i++) data[i] = (uint8_t)((i * 13) % 199);
    int32_t cap = zxcw_compress_bound(N, 65536);
    if (cap <= 0) return 1;
    uint8_t *arc = malloc(cap);
    int32_t w = zxcw_compress(data, N, 3, 65536, 1, 1, arc, cap);
    if (w <= 0) return 2;
    if (!zxcw_detect(arc, w)) return 3;
    if (zxcw_get_decompressed_size(arc, w) != N) return 4;
    int32_t bound = zxcw_decompress_bound(arc, w);
    uint8_t *back = malloc(bound);
    if (zxcw_decompress(arc, w, back, bound, 1) != N) return 5;
    if (memcmp(back, data, N)) return 6;
    uint8_t slice[512];
    if (zxcw_seekable_range(arc, w, 100000, 512, slice) != 512) return 7;
    if (memcmp(slice, data + 100000, 512)) return 8;
    /* dictionary surface: dict = first 4 KB of the input */
    int32_t wd = zxcw_compress_dict(data + 8000, 30000, 3, 65536, 1, 0,
                                    data, 4096, 0, arc, cap);
    if (wd <= 0) return 9;
    if (zxcw_decompress(arc, wd, back, bound, 1) >= 0) return 10;  /* no dict */
    if (zxcw_decompress_dict(arc, wd, back, bound, data, 4096, 0, 1)
        != 30000) return 11;
    if (memcmp(back, data + 8000, 30000)) return 12;
    /* seekable + dict through the full-int64 ABI */
    {
        int64_t zxch_simple_compress_dict(const uint8_t*, uint64_t, int,
            uint64_t, int, int, const uint8_t*, uint64_t, const uint8_t*,
            uint8_t*, uint64_t);
        int64_t zxch_seekable_range(const uint8_t*, uint64_t, uint64_t,
            uint64_t, uint8_t*, uint64_t, const uint8_t*, uint64_t,
            const uint8_t*);
        int64_t ws = zxch_simple_compress_dict(data + 8000, 30000, 3,
            16384, 0, 1, data, 4096, 0, arc, cap);
        if (ws <= 0) return 13;
        uint8_t r2[700];
        if (zxch_seekable_range(arc, ws, 20000, 700, r2, 700, data, 4096,
                                0) != 700) return 14;
        if (memcmp(r2, data + 8000 + 20000, 700)) return 15;
    }
    return 0;
}
''')
    exe = tmp_path / "wasm_shim_test"
    subprocess.run(
        ["gcc", "-O1", "-I", os.path.join(_REPO, "include"),
         os.path.join(_REPO, "wrappers", "wasm", "wasm_entry.c"),
         str(main), so, "-o", str(exe),
         f"-Wl,-rpath,{os.path.dirname(so)}"],
        check=True, capture_output=True)
    subprocess.run([str(exe)], check=True, timeout=120)


def test_binding_checks():
    """CI-shaped no-toolchain verification (tools/binding_check.py):
    FFI symbol audit of every wrapper against the built .so + N-API
    addon syntax check against the vendored shim. What stays unverified
    without node/go/cargo is documented in the tool's docstring."""
    _ensure_so()
    subprocess.run([sys.executable,
                    os.path.join(_REPO, "tools", "binding_check.py")],
                   check=True, timeout=120)


def test_c_abi_archival_levels(tmp_path):
    """Levels 6-7 through the plain int64 C ABI (VERDICT round-2 item 5:
    zxch_simple_compress used to clamp to 5). Every binding can now
    produce and consume archival frames; the archives must round-trip
    and (checked in test_runtime_native) match the Python path's bytes."""
    so = _ensure_so()
    main = tmp_path / "main.c"
    main.write_text(r'''
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
int64_t zxch_compress_bound(uint64_t, uint64_t);
int64_t zxch_simple_compress(const uint8_t*, uint64_t, int, uint64_t,
                             int, int, uint8_t*, uint64_t);
int64_t zxch_simple_decompress_bound(const uint8_t*, uint64_t);
int64_t zxch_simple_decompress(const uint8_t*, uint64_t, uint8_t*,
                               uint64_t, const uint8_t*, uint64_t,
                               const uint8_t*, int);
int64_t zxch_get_decompressed_size(const uint8_t*, uint64_t);
int main(void) {
    enum { N = 300000 };
    uint8_t *data = malloc(N);
    /* zipfish bytes + text + runs: forces Huffman literal AND (at L7)
       Huffman token sections into the auction */
    for (int i = 0; i < N / 2; i++) {
        int r = (i * 2654435761u) >> 20;
        data[i] = (uint8_t)(r % 7 ? (r % 3 ? 'e' : ' ') : (r % 251));
    }
    memset(data + N / 2, 'x', N / 4);
    for (int i = 3 * N / 4; i < N; i++)
        data[i] = (uint8_t)("compression test corpus "[i % 24]);
    int64_t cap = zxch_compress_bound(N, 65536);
    uint8_t *arc = malloc(cap);
    for (int level = 5; level <= 7; level++) {
        int64_t w = zxch_simple_compress(data, N, level, 65536, 1, 0,
                                         arc, cap);
        if (w <= 0) return 10 + level;
        if (w >= N / 2) return 20 + level;  /* must actually compress */
        if (zxch_get_decompressed_size(arc, w) != N) return 30 + level;
        int64_t bound = zxch_simple_decompress_bound(arc, w);
        uint8_t *back = malloc(bound);
        if (zxch_simple_decompress(arc, w, back, bound, 0, 0, 0, 1) != N)
            return 40 + level;
        if (memcmp(back, data, N)) return 50 + level;
        free(back);
    }
    return 0;
}
''')
    exe = tmp_path / "abi_archival_test"
    subprocess.run(
        ["gcc", "-O1", str(main), so, "-o", str(exe),
         f"-Wl,-rpath,{os.path.dirname(so)}"],
        check=True, capture_output=True)
    subprocess.run([str(exe)], check=True, timeout=120)


@pytest.mark.skipif(shutil.which("npm") is None, reason="node/npm absent — contract executed via ctypes in test_binding_contracts.py (runtime-gated)")
def test_node_binding(tmp_path):
    _ensure_so()
    cwd = os.path.join(_REPO, "wrappers", "nodejs")
    subprocess.run(["npm", "install"], cwd=cwd, check=True, timeout=600)
    subprocess.run(["npm", "test"], cwd=cwd, check=True, timeout=300)


@pytest.mark.skipif(shutil.which("go") is None, reason="go absent — contract executed via ctypes in test_binding_contracts.py (runtime-gated)")
def test_go_binding():
    _ensure_so()
    cwd = os.path.join(_REPO, "wrappers", "go")
    subprocess.run(["go", "test", "./..."], cwd=cwd, check=True, timeout=600)


@pytest.mark.skipif(shutil.which("cargo") is None, reason="cargo absent — contract executed via ctypes in test_binding_contracts.py (runtime-gated)")
def test_rust_binding():
    _ensure_so()
    cwd = os.path.join(_REPO, "wrappers", "rust", "zxc")
    subprocess.run(["cargo", "test"], cwd=cwd, check=True, timeout=900)
