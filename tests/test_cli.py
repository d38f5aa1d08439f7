"""CLI end-to-end (reference: tests/test_cli.sh, 1387 lines of bash —
here as subprocess pytest cases)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def zxc(*args, data=None, cwd=None):
    env = dict(os.environ, PYTHONPATH=ROOT, ZXC_NO_NATIVE="")
    env.pop("ZXC_NO_NATIVE")
    return subprocess.run([sys.executable, "-m", "zxc_tpu", *args],
                          input=data, capture_output=True, env=env,
                          cwd=cwd, timeout=120)


@pytest.fixture()
def workdir(tmp_path):
    rng = np.random.default_rng(0)
    seg = rng.integers(32, 127, 600, dtype=np.uint8).tobytes()
    (tmp_path / "a.txt").write_bytes(seg * 40)
    (tmp_path / "b.bin").write_bytes(
        rng.integers(0, 256, 30_000, dtype=np.uint8).tobytes())
    return tmp_path


def test_compress_decompress_roundtrip(workdir):
    r = zxc("-z", "-k", "-3", "a.txt", cwd=workdir)
    assert r.returncode == 0, r.stderr
    assert (workdir / "a.txt.zxc").exists()
    r = zxc("-d", "-k", "-f", "-o", "a.out", "a.txt.zxc", cwd=workdir)
    assert r.returncode == 0, r.stderr
    assert (workdir / "a.out").read_bytes() == (workdir / "a.txt").read_bytes()


def test_keep_and_delete_semantics(workdir):
    zxc("-z", "-1", "b.bin", cwd=workdir)          # no -k: input deleted
    assert not (workdir / "b.bin").exists()
    assert (workdir / "b.bin.zxc").exists()


def test_test_mode_and_list(workdir):
    zxc("-z", "-k", "-S", "a.txt", cwd=workdir)
    r = zxc("-t", "a.txt.zxc", cwd=workdir)
    assert r.returncode == 0
    r = zxc("-l", "a.txt.zxc", cwd=workdir)
    assert b"zxc v7 archive" in r.stdout
    assert b"seekable:        yes" in r.stdout


def test_pipe_roundtrip(workdir):
    data = (workdir / "a.txt").read_bytes()
    r1 = zxc("-z", "-c", data=data)
    assert r1.returncode == 0
    r2 = zxc("-d", "-c", data=r1.stdout)
    assert r2.returncode == 0
    assert r2.stdout == data


def test_multiple_and_threads(workdir):
    r = zxc("-z", "-k", "-m", "-T", "2", "a.txt", "b.bin", cwd=workdir)
    assert r.returncode == 0, r.stderr
    assert (workdir / "a.txt.zxc").exists()
    assert (workdir / "b.bin.zxc").exists()


def test_train_and_dict_roundtrip(workdir):
    samples = [f"s{i}.json" for i in range(6)]
    for i, name in enumerate(samples):
        (workdir / name).write_bytes(
            b'{"id": %d, "status": "ok", "tags": ["a","b"]}' % i * 40)
    r = zxc("--train", "--dict-size", "2048", "-o", "d.zxd", "-f",
            *samples, cwd=workdir)
    assert r.returncode == 0, r.stderr
    r = zxc("-l", "d.zxd", cwd=workdir)
    assert b"zxc dictionary" in r.stdout
    r = zxc("-z", "-k", "-f", "-D", "d.zxd", "-o", "s0.zxc", "s0.json",
            cwd=workdir)
    assert r.returncode == 0, r.stderr
    r = zxc("-d", "-c", "-D", "d.zxd", "s0.zxc", cwd=workdir)
    assert r.stdout == (workdir / "s0.json").read_bytes()
    # without the dict it must fail
    r = zxc("-d", "-c", "s0.zxc", cwd=workdir)
    assert r.returncode == 1
    assert b"DICT_REQUIRED" in r.stderr


def test_bench_json(workdir):
    r = zxc("-b", "1", "-j", "-1", "a.txt", cwd=workdir)
    assert r.returncode == 0, r.stderr
    row = json.loads(r.stdout.splitlines()[-1])
    assert row["level"] == 1 and row["compress_mbps"] > 0


def test_error_exit_codes(workdir):
    assert zxc("-z", "nosuch.file", cwd=workdir).returncode == 1
    assert zxc("-d", "-c", "a.txt", cwd=workdir).returncode == 1  # not an archive
    assert zxc("-z", "-B", "777", "-c", "a.txt", cwd=workdir).returncode == 1
    r = zxc("-V")
    assert r.returncode == 0 and b"zxc" in r.stdout
