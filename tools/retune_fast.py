"""Retune the fast encode levels (1-3) toward the reference's Pareto
ladder: maximize single-thread speed subject to size <= the reference C
encoder at the SAME level on EVERY held-out corpus (the BASELINE gate).

Round-2 finding: our L1/L2 overshoot the per-level size gate by 6-9 pp
(density the gate does not require) while running at 0.45x the
reference's speed — ref L3 Pareto-dominated both. Speed at the gate is
worth more than surplus density.

Run: python tools/retune_fast.py --level 1
"""
import argparse
import os
import sys
import time

sys.path[:0] = [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
sys.path[:0] = [os.path.join(sys.path[0], "tests"), os.path.join(sys.path[0], "tools")]

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import ref_oracle  # noqa: E402
from size_gate import build_corpora  # noqa: E402
from zxc_tpu import runtime  # noqa: E402
from zxc_tpu import constants as C  # noqa: E402

BS = 512 * 1024


def enc(arr, level, p):
    """Native one-shot encode with explicit matcher params.
    p = (probes, lazy, suff, step_base, step_shift, cover_base, min_emit)"""
    probes, lazy, suff, sb, ss, cb, me = p
    out = runtime.compress_frame(arr, level, probes, lazy, suff, sb, ss, cb,
                                 BS, C.block_size_code(BS), True, False, me)
    assert out is not None
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--level", type=int, default=1)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--grid", default=None,
                    help="semicolon-separated tuples probes,lazy,suff,sb,ss,cb,me")
    args = ap.parse_args()
    lvl = args.level

    corpora = build_corpora(args.quick)
    arrs = {k: np.frombuffer(v, np.uint8) for k, v in corpora.items()}
    ref_sz = {k: len(ref_oracle.ref_compress(v, level=lvl, block_size=BS))
              for k, v in corpora.items()}
    # reference speed on the pinned corpus (warm, best-of-3)
    ref_oracle.ref_compress(corpora["pinned"], level=lvl, block_size=BS)
    tbest = 1e9
    for _ in range(3):
        t0 = time.time()
        ref_oracle.ref_compress(corpora["pinned"], level=lvl, block_size=BS)
        tbest = min(tbest, time.time() - t0)
    ref_mbs = len(corpora["pinned"]) / 1e6 / tbest
    print(f"ref L{lvl}: {ref_mbs:.0f} MB/s pinned; sizes "
          + " ".join(f"{k}={v}" for k, v in ref_sz.items()), flush=True)

    if args.grid:
        grid = []
        for t in args.grid.split(";"):
            f = t.split(",")
            grid.append((int(f[0]), bool(int(f[1])), int(f[2]), int(f[3]),
                         int(f[4]), int(f[5]), int(f[6])))
    else:
        grid = {
            1: [(2, False, 16, 1, 4, 4, 5),     # current
                (1, False, 16, 1, 4, 4, 5),
                (1, False, 12, 1, 3, 6, 5),
                (1, False, 8, 1, 3, 8, 5),
                (1, False, 8, 2, 3, 8, 5),
                (1, False, 8, 1, 2, 12, 5),
                (2, False, 12, 1, 3, 8, 5)],
            2: [(6, True, 24, 1, 6, 4, 5),      # current
                (2, False, 16, 1, 4, 4, 5),
                (1, False, 16, 1, 4, 4, 5),
                (2, False, 24, 1, 4, 4, 5),
                (3, False, 24, 1, 4, 4, 5)],
            3: [(6, True, 32, 1, 6, 4, 5),      # current
                (4, True, 32, 1, 5, 4, 5),
                (3, True, 24, 1, 5, 4, 5),
                (2, True, 24, 1, 4, 4, 5),
                (4, False, 32, 1, 5, 4, 5)],
        }[lvl]

    for p in grid:
        sizes = {}
        ok = True
        for k, a in arrs.items():
            sz = len(enc(a, lvl, p))
            sizes[k] = sz
            if sz > ref_sz[k]:
                ok = False
        # speed: interleaved best-of-3 on pinned + csrc
        rates = []
        for key in ("pinned", "csrc"):
            a = arrs[key]
            enc(a, lvl, p)
            tb = 1e9
            for _ in range(3):
                t0 = time.time()
                enc(a, lvl, p)
                tb = min(tb, time.time() - t0)
            rates.append(len(a) / 1e6 / tb)
        deltas = " ".join(f"{k}{100*(sizes[k]-ref_sz[k])/ref_sz[k]:+.1f}"
                          for k in arrs)
        print(f"{p}: {'PASS' if ok else 'FAIL'} "
              f"pinned {rates[0]:.0f} MB/s ({rates[0]/ref_mbs:.2f}x) "
              f"csrc {rates[1]:.0f} MB/s | {deltas}", flush=True)


if __name__ == "__main__":
    main()
