#!/usr/bin/env python
"""Where do the ~500us per 4KB dict-framed file go? Breaks the
surface_bench dict config into: full Python compress(), direct
runtime.compress_frame, and native-internal phases (via env knobs).

Usage: JAX_PLATFORMS=cpu python tools/smallframe_profile.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

import numpy as np
from gen_corpus import gen_corpus
from zxc_tpu.codec import frame, dict_train, block_encode
from zxc_tpu.codec.frame import EncodeOpts
from zxc_tpu import runtime
import zxc_tpu.constants as C

raw = gen_corpus(4 << 20)
rng = np.random.default_rng(7)
files = []
hdr = b'{"schema":"zxc-bench-v1","fields":["ts","lvl","msg"],"row":'
pos = 0
for i in range(1000):
    n = int(rng.integers(2000, 6000))
    files.append(hdr + raw[pos:pos + n])
    pos = (pos + n) % (len(raw) - 8000)
total = sum(len(f) for f in files)
d = dict_train.dict_train(files[:200], target_size=16384)
opts = EncodeOpts(level=3, block_size=64 * 1024,
                  dict_content=d.content, dict_huf=d.huf_lengths)

def timeit(fn, reps=3):
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best

# 1) full Python path
t_full = timeit(lambda: [frame.compress(f, opts) for f in files])

# 2) pre-resolved args -> direct runtime.compress_frame calls
dict_state = block_encode.DictState(np.frombuffer(d.content, np.uint8), d.huf_lengths)
from zxc_tpu.codec.frame import compute_dict_id
did = compute_dict_id(d.content, d.huf_lengths)
params = block_encode.level_params(3)
arrs = [np.frombuffer(f, np.uint8) for f in files]
cl = dict_state.tree.code_len if dict_state.tree is not None else None

def direct():
    for a in arrs:
        runtime.compress_frame(
            a, 3, params.n_candidates, params.lazy, params.sufficient_len,
            params.step_base, params.step_shift, params.cover_base,
            64 * 1024, C.block_size_code(64 * 1024), True, False,
            params.min_emit, dict_buf=dict_state.content, dict_cl=cl,
            dict_id=did)

t_direct = timeit(direct)

# 3) no-dict direct (isolates dict seeding + shared-table candidate cost)
def direct_nodict():
    for a in arrs:
        runtime.compress_frame(
            a, 3, params.n_candidates, params.lazy, params.sufficient_len,
            params.step_base, params.step_shift, params.cover_base,
            64 * 1024, C.block_size_code(64 * 1024), True, False,
            params.min_emit)

t_nodict = timeit(direct_nodict)

print(f"files: {len(files)}  total {total/1e6:.2f} MB  dict {len(d.content)} B")
print(f"full Python compress():   {t_full*1e3:7.1f} ms  {total/t_full/1e6:6.1f} MB/s")
print(f"direct native call:       {t_direct*1e3:7.1f} ms  {total/t_direct/1e6:6.1f} MB/s")
print(f"direct native, no dict:   {t_nodict*1e3:7.1f} ms  {total/t_nodict/1e6:6.1f} MB/s")
print(f"python glue per file:     {(t_full-t_direct)/len(files)*1e6:6.1f} us")
print(f"dict-path extra per file: {(t_direct-t_nodict)/len(files)*1e6:6.1f} us")
