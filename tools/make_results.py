#!/usr/bin/env python
"""Measure the per-level results table (our implementation, this host) and
print it as markdown. Device numbers come from the bench logs."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
import bench as B
import ref_oracle
from zxc_tpu.codec import frame
from zxc_tpu.codec.frame import EncodeOpts

MB = int(os.environ.get("MB", "4"))
data = B.build_corpus(MB * 1024 * 1024)
print(f"corpus: {len(data)/1e6:.1f} MB Silesia-like\n")
print("| level | ours bytes | ref bytes | delta | encode MB/s | host decode MB/s |")
print("|---|---|---|---|---|---|")
for level in range(1, 8):
    ra = ref_oracle.ref_compress(data, level=level)
    t0 = time.time(); oa = frame.compress(data, EncodeOpts(level=level)); te = time.time() - t0
    frame.decompress(oa)  # warm
    t0 = time.time(); out = frame.decompress(oa); td = time.time() - t0
    assert out == data
    print(f"| -{level} | {len(oa)} | {len(ra)} | "
          f"{(len(oa)-len(ra))/len(ra)*100:+.2f}% | {len(data)/1e6/te:.1f} | "
          f"{len(data)/1e6/td:.0f} |", flush=True)
