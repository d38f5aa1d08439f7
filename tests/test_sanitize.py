"""ASan+UBSan sweeps of the native runtime (VERDICT round-1 item 8).

The reference runs its decoder under ClusterFuzzLite with ASan+UBSan;
here tools/san_driver.cpp links zxc_host.cpp into a standalone sanitized
binary and this suite drives it over: the full conformance corpus (valid
+ invalid), byte-flip and truncation mutations of fresh archives, and
encoder roundtrips — any out-of-bounds access or UB aborts the driver.
"""
import os
import subprocess
import sys
import glob

import numpy as np
import pytest

_DIR = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_DIR)
_SRC = os.path.join(_REPO, "tools", "san_driver.cpp")
_BIN = os.path.join(_REPO, ".san_driver")
CONFORMANCE = "/root/reference/conformance"


@pytest.fixture(scope="module")
def driver():
    src_mtime = max(os.path.getmtime(_SRC),
                    os.path.getmtime(os.path.join(
                        _REPO, "zxc_tpu", "runtime", "zxc_host.cpp")))
    if not os.path.exists(_BIN) or os.path.getmtime(_BIN) < src_mtime:
        r = subprocess.run(
            ["g++", "-O1", "-g", "-march=native", "-fsanitize=address,undefined",
             "-fsanitize-coverage=trace-pc",
             "-fno-sanitize-recover=all", "-o", _BIN + ".tmp", _SRC],
            capture_output=True, text=True, timeout=300)
        if r.returncode != 0:
            pytest.skip(f"sanitizer build unavailable: {r.stderr[-500:]}")
        os.replace(_BIN + ".tmp", _BIN)
    return _BIN


def _run(driver, mode, path, *extra, timeout=60):
    r = subprocess.run([driver, mode, path, *extra], capture_output=True,
                       text=True, timeout=timeout)
    assert r.returncode == 0, (
        f"sanitizer driver failed on {os.path.basename(path)} "
        f"(rc={r.returncode}):\n{r.stderr[-2000:]}")
    return r.stdout


def test_conformance_valid_under_sanitizers(driver, tmp_path):
    paths = sorted(glob.glob(os.path.join(CONFORMANCE, "valid", "*.zxc")))
    assert paths, "conformance corpus missing"
    for p in paths:
        _run(driver, "d", p)


def test_conformance_invalid_under_sanitizers(driver):
    paths = sorted(glob.glob(os.path.join(CONFORMANCE, "invalid", "*.zxc")))
    assert paths
    for p in paths:
        _run(driver, "d", p)


def test_mutation_sweep_under_sanitizers(driver, tmp_path):
    """Byte flips + truncations of fresh archives: every mutant must be
    decoded or cleanly rejected with no sanitizer report."""
    from zxc_tpu.codec import frame
    from zxc_tpu.codec.frame import EncodeOpts

    rng = np.random.default_rng(3)
    data = (b"sanitizer sweep corpus " * 200
            + rng.integers(0, 256, 3000, dtype=np.uint8).tobytes()
            + b"\x00" * 2000)
    for level in (1, 3, 6):
        arc = bytearray(frame.compress(
            data, EncodeOpts(level=level, block_size=4096, checksum=True)))
        mutants = []
        for k in range(60):  # deterministic single-byte flips
            m = bytearray(arc)
            i = int(rng.integers(0, len(m)))
            m[i] ^= int(rng.integers(1, 256))
            mutants.append(bytes(m))
        for cut in (0, 1, 15, 16, 17, len(arc) // 2, len(arc) - 1):
            mutants.append(bytes(arc[:cut]))
        for j, m in enumerate(mutants):
            p = tmp_path / f"m{level}_{j}.zxc"
            p.write_bytes(m)
            _run(driver, "d", str(p))


def test_encoder_roundtrip_under_sanitizers(driver, tmp_path):
    rng = np.random.default_rng(9)
    corpora = {
        "text": b"the quick brown fox jumps over the lazy dog " * 500,
        "runs": b"\x00" * 9000 + b"ab" * 4000,
        "rand": rng.integers(0, 256, 150_000, dtype=np.uint8).tobytes(),
        "edge": b"x",
        "empty": b"",
    }
    for name, data in corpora.items():
        p = tmp_path / f"{name}.bin"
        p.write_bytes(data)
        for level in (1, 2, 3, 5):
            _run(driver, "r", str(p), str(level), timeout=120)
            # dict path (window prefix + shared table) under sanitizers
            _run(driver, "rd", str(p), str(level), timeout=120)
