"""Sweep ZXC_MAX_FRAG (resolver materialization cap): piece/quad counts,
resolve time, and lit_full growth on the pinned corpus.

The v13 device kernel is issue-bound per quad (~320 ns/quad), so fewer
quads ≈ proportionally faster device decode; materializing more (lower
MAX_FRAG) costs host memcpy + lit_full bytes (H2D). This prints the
tradeoff:

  for mf in 1 2 3 4 6; do ZXC_MAX_FRAG=$mf python tools/mf_sweep.py; done
"""
import os
import sys
import time

sys.path[:0] = ['/root/repo', '/root/repo/tests', '/root/repo/tools']

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from zxc_tpu.ops import plan_frame
import kernel_attic as PD  # superset view: live kernels + rejected generations
from zxc_tpu import runtime  # noqa: E402
from gen_corpus import gen_corpus  # noqa: E402
import ref_oracle  # noqa: E402


def main():
    mf = os.environ.get("ZXC_MAX_FRAG", "3")
    mb = int(os.environ.get("SWEEP_MB", "8"))
    data = gen_corpus(mb * 1024 * 1024)
    cache = f"/tmp/mf_sweep_{mb}.zxc"
    if os.path.exists(cache):
        arc = open(cache, "rb").read()
    else:
        arc = ref_oracle.ref_compress(data, level=3, block_size=65536)
        open(cache, "wb").write(arc)
    plan = plan_frame(arc)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        pieces, lits = [], []
        for i in range(plan.n_blocks):
            r = runtime.resolve_pieces(plan.ll[i], plan.ml[i], plan.off[i],
                                       plan.lit[i], plan.dict_buf,
                                       device_pure=True, max_frag=int(mf))
            assert r is not None
            pieces.append(r[:4])
            lits.append(r[4])
        best = min(best, time.time() - t0)
    npieces = sum(len(p[0]) for p in pieces)
    litsz = sum(len(x) for x in lits)
    nq = 0
    maxq = 0
    for d in range(0, plan.n_blocks, 16):
        s = PD.pack_blocks_v12(pieces[d:d + 16], lits[d:d + 16],
                               list(plan.totals)[d:d + 16],
                               plan.block_size, quad_align=2)
        nq += int(s[0][:, -1].sum())
        maxq = max(maxq, s[1].shape[1])
    # bit-exactness of the piece plans (numpy expansion oracle)
    pos = 0
    for i in range(min(plan.n_blocks, 8)):
        po, pc, ps, pk = pieces[i]
        out = np.zeros(plan.totals[i], np.uint8)
        lf = np.frombuffer(lits[i], np.uint8)
        for j in range(len(po)):
            e = po[j + 1] if j + 1 < len(po) else plan.totals[i]
            idx = pc[j] + (np.arange(po[j], e) - ps[j]) % max(pk[j], 1)
            out[po[j]:e] = lf[idx]
        assert out.tobytes() == data[pos:pos + plan.totals[i]], f"block {i}"
        pos += plan.totals[i]
    print(f"MF={mf}: resolve {best:.3f}s ({len(data)/1e9/best:.2f} GB/s), "
          f"pieces={npieces}, lit={litsz/1e6:.1f}MB "
          f"(+{(litsz-len(data))/1e6:.1f}), quads={nq}, MAXQ={maxq}",
          flush=True)


if __name__ == "__main__":
    main()
