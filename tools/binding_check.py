"""CI-shaped binding verification without node/go/cargo toolchains
(VERDICT round-2 item 6: convert "source-complete" from a claim into a
check, and document exactly what stays unverified).

What RUNS here:
  1. `gcc -fsyntax-only` on the Node N-API addon against a vendored
     minimal node_api.h shim (tools/napi_shim) — catches type/arity/
     syntax errors in our C.
  2. FFI symbol audit: every `zxch_*`/`zxcw_*` symbol referenced by the
     Rust sys crate, the Go cgo package, the Node addon, the WASM entry
     and the JS loaders must be exported by the freshly built
     libzxchost.so (undefined-symbol drift is the main rot risk when the
     C ABI evolves).
  3. The WASM entry shims compile and ROUNDTRIP natively
     (tests/test_bindings.py::test_wasm_entry_shims runs the binary).

What stays UNVERIFIED in this environment (documented, not claimed):
  - Rust: no `cargo` — the safe crate's borrow/type checking.
  - Go: no `go` — cgo pointer rules and vet checks.
  - Node: no `node` — runtime behavior of the addon + JS facade.
The per-wrapper test suites (wrappers/*/test*) gate on toolchain
presence and run everything when one exists.

Usage: python tools/binding_check.py   (exit 0 = all runnable checks pass)
"""
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def built_so() -> str:
    sys.path.insert(0, REPO)
    from zxc_tpu import runtime
    assert runtime.lib() is not None, "native runtime unavailable"
    return os.path.join(REPO, "zxc_tpu", "runtime", "libzxchost.so")


def exported_symbols(so: str) -> set:
    out = subprocess.run(["nm", "-D", "--defined-only", so],
                         capture_output=True, text=True, check=True).stdout
    return {line.split()[-1] for line in out.splitlines() if line.strip()}


def referenced_symbols() -> dict:
    """wrapper file -> set of zxch_/zxcw_ symbols it calls."""
    pats = [
        ("rust", os.path.join(REPO, "wrappers", "rust", "zxc-sys", "src",
                              "lib.rs")),
        ("rust", os.path.join(REPO, "wrappers", "rust", "zxc", "src",
                              "lib.rs")),
        ("go", os.path.join(REPO, "wrappers", "go", "zxc.go")),
        ("node", os.path.join(REPO, "wrappers", "nodejs", "src",
                              "zxc_addon.c")),
        ("wasm-c", os.path.join(REPO, "wrappers", "wasm", "wasm_entry.c")),
        ("wasm-js", os.path.join(REPO, "wrappers", "wasm", "zxc_wasm.js")),
    ]
    refs = {}
    for kind, path in pats:
        if not os.path.exists(path):
            continue
        src = open(path).read()
        syms = set(re.findall(r"\bzxch_\w+", src))
        if kind == "wasm-js":
            # the loader calls zxcw_* through emscripten cwrap strings
            syms |= set(re.findall(r"zxcw_\w+", src))
        refs[path] = syms
    return refs


def check_symbols(so: str) -> int:
    exported = exported_symbols(so)
    # zxcw_* shims live in wasm_entry.c (compiled separately) — resolve
    # them against that file's definitions instead of the .so
    wasm_src = open(os.path.join(REPO, "wrappers", "wasm",
                                 "wasm_entry.c")).read()
    wasm_defs = set(re.findall(r"(?:int32_t|int64_t|void)\s+(zxcw_\w+)\s*\(",
                               wasm_src))
    bad = 0
    for path, syms in referenced_symbols().items():
        missing = {s for s in syms
                   if s.startswith("zxch_") and s not in exported}
        missing |= {s for s in syms
                    if s.startswith("zxcw_") and s not in wasm_defs
                    and not path.endswith("wasm_entry.c")}
        rel = os.path.relpath(path, REPO)
        if missing:
            print(f"FAIL {rel}: unresolved FFI symbols: {sorted(missing)}")
            bad += 1
        else:
            print(f"ok   {rel}: {len(syms)} FFI symbols all exported")
    return bad


def check_node_syntax() -> int:
    addon = os.path.join(REPO, "wrappers", "nodejs", "src", "zxc_addon.c")
    r = subprocess.run(
        ["gcc", "-fsyntax-only", "-Wall", "-Werror",
         "-I", os.path.join(REPO, "tools", "napi_shim"),
         "-I", os.path.join(REPO, "include"), addon],
        capture_output=True, text=True)
    if r.returncode:
        print(f"FAIL node addon syntax: {r.stderr[:2000]}")
        return 1
    print("ok   node addon compiles against the N-API shim "
          "(gcc -fsyntax-only -Wall -Werror)")
    return 0


def main() -> int:
    so = built_so()
    bad = check_symbols(so)
    bad += check_node_syntax()
    if bad:
        print(f"{bad} binding check(s) FAILED")
        return 1
    print("all runnable binding checks passed "
          "(rust/go/node runtime checks need their toolchains)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
