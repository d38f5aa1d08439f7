"""CLI end-to-end scenario matrix (reference: tests/test_cli.sh, 1387
lines of bash). Each test mirrors a named reference scenario group;
anything the reference covers that is n/a here says so inline.

Reference scenario groups -> coverage map:
  Basic Round-Trip, Piping, Flags, Error Handling, Version, Checksum,
  Integrity (-t), Global Checksum, List (-l), All Levels, Data Types,
  Large/Empty Files, One-Pass Pipe, Stdin, Keep (-k), Multi-Threading,
  JSON (-j), Multiple (-m), Recursive (-r), Block Size (-B),
  Seekable (-S), Dictionary (-D), unzxc alias, wildcard -m,
  Output (-o incl. positional), Default Input Deletion, Long Options,
  JSON list w/ failing entry, bench w/ dict (-b -D), Progress.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def zxc(*args, data=None, cwd=None, prog=None):
    env = dict(os.environ, PYTHONPATH=ROOT)
    env.pop("ZXC_NO_NATIVE", None)
    if prog:
        # run through a renamed launcher so argv[0] carries the alias
        return subprocess.run([sys.executable, prog, *args], input=data,
                              capture_output=True, env=env, cwd=cwd,
                              timeout=180)
    return subprocess.run([sys.executable, "-m", "zxc_tpu", *args],
                          input=data, capture_output=True, env=env,
                          cwd=cwd, timeout=180)


@pytest.fixture()
def wd(tmp_path):
    rng = np.random.default_rng(7)
    text = (b"The quick brown fox jumps over the lazy dog. " * 800
            + rng.integers(32, 127, 4000, dtype=np.uint8).tobytes())
    (tmp_path / "t.txt").write_bytes(text)
    (tmp_path / "rnd.bin").write_bytes(
        rng.integers(0, 256, 50_000, dtype=np.uint8).tobytes())
    (tmp_path / "runs.dat").write_bytes(b"\x00" * 30000 + b"ab" * 5000)
    (tmp_path / "empty").write_bytes(b"")
    return tmp_path


def _rt(wd, name, *flags):
    src = (wd / name).read_bytes()
    r = zxc("-z", "-k", "-f", *flags, name, cwd=wd)
    assert r.returncode == 0, r.stderr
    r = zxc("-d", "-c", name + ".zxc", cwd=wd)
    assert r.returncode == 0, r.stderr
    assert r.stdout == src


# --- Basic round-trips, levels, data types, block sizes ------------------

@pytest.mark.parametrize("level", ["-1", "-2", "-3", "-4", "-5", "-6", "-7"])
def test_all_levels_roundtrip(wd, level):
    _rt(wd, "t.txt", level)


@pytest.mark.parametrize("name", ["t.txt", "rnd.bin", "runs.dat"])
def test_data_types(wd, name):
    _rt(wd, name, "-3")


@pytest.mark.parametrize("bs", ["4K", "64K", "2M"])
def test_block_sizes(wd, bs):
    _rt(wd, "t.txt", "-B", bs)


def test_empty_file_roundtrip(wd):
    _rt(wd, "empty", "-3")


def test_large_multiblock(wd):
    rng = np.random.default_rng(1)
    big = (rng.integers(32, 100, 9000, dtype=np.uint8).tobytes() * 600)
    (wd / "big.dat").write_bytes(big)
    r = zxc("-z", "-k", "-B", "64K", "big.dat", cwd=wd)
    assert r.returncode == 0
    r = zxc("-d", "-c", "big.dat.zxc", cwd=wd)
    assert r.stdout == big


# --- Pipes and stdin ------------------------------------------------------

def test_pipe_compress_then_decompress(wd):
    data = (wd / "t.txt").read_bytes()
    arc = zxc("-z", "-c", "-6", data=data).stdout
    assert zxc("-d", "-c", data=arc).stdout == data


def test_stdin_default_mode_is_compress(wd):
    # `zxc < file > out.zxc` (reference stdin auto-detection scenario)
    data = (wd / "t.txt").read_bytes()
    r = zxc(data=data)
    assert r.returncode == 0 and len(r.stdout) > 16
    assert zxc("-d", "-c", data=r.stdout).stdout == data


def test_stdin_dash_operand(wd):
    data = (wd / "rnd.bin").read_bytes()
    r = zxc("-z", "-c", "-", data=data)
    assert r.returncode == 0
    assert zxc("-d", "-c", "-", data=r.stdout).stdout == data


# --- Keep / force / overwrite / deletion ----------------------------------

def test_default_input_deletion(wd):
    zxc("-z", "t.txt", cwd=wd)
    assert not (wd / "t.txt").exists()
    assert (wd / "t.txt.zxc").exists()
    zxc("-d", "t.txt.zxc", cwd=wd)
    assert (wd / "t.txt").exists()
    assert not (wd / "t.txt.zxc").exists()


def test_keep_flag_preserves_input(wd):
    zxc("-z", "-k", "t.txt", cwd=wd)
    assert (wd / "t.txt").exists() and (wd / "t.txt.zxc").exists()


def test_overwrite_requires_force(wd):
    zxc("-z", "-k", "t.txt", cwd=wd)
    r = zxc("-z", "-k", "t.txt", cwd=wd)          # .zxc already exists
    assert r.returncode == 1
    assert b"exists" in r.stderr
    assert zxc("-z", "-k", "-f", "t.txt", cwd=wd).returncode == 0


def test_output_option_keeps_input(wd):
    # -o names the output and the INPUT IS KEPT (auto-deletion only for
    # auto-derived names; reference section 28.1)
    r = zxc("-z", "-f", "-o", "named.zxc", "t.txt", cwd=wd)
    assert r.returncode == 0, r.stderr
    assert (wd / "t.txt").exists() and (wd / "named.zxc").exists()
    r = zxc("-d", "-f", "-o", "named.out", "named.zxc", cwd=wd)
    assert r.returncode == 0
    assert (wd / "named.out").read_bytes() == (wd / "t.txt").read_bytes()


def test_positional_output_file(wd):
    # `zxc -d INPUT OUTPUT` (reference section 28.3)
    zxc("-z", "-k", "t.txt", cwd=wd)
    r = zxc("-d", "-f", "t.txt.zxc", "pos.out", cwd=wd)
    assert r.returncode == 0, r.stderr
    assert (wd / "pos.out").read_bytes() == (wd / "t.txt").read_bytes()


def test_output_with_multiple_inputs_rejected(wd):
    r = zxc("-z", "-k", "-m", "-o", "x.zxc", "t.txt", "rnd.bin", cwd=wd)
    assert r.returncode == 1


# --- Multiple / recursive --------------------------------------------------

def test_multiple_mode(wd):
    r = zxc("-z", "-k", "-m", "t.txt", "rnd.bin", "runs.dat", cwd=wd)
    assert r.returncode == 0, r.stderr
    for n in ("t.txt", "rnd.bin", "runs.dat"):
        assert (wd / (n + ".zxc")).exists()
        assert zxc("-d", "-c", n + ".zxc", cwd=wd).stdout == \
            (wd / n).read_bytes()


def test_recursive_directory_tree(wd):
    d = wd / "tree" / "sub" / "leaf"
    d.mkdir(parents=True)
    (wd / "tree" / "one.txt").write_bytes(b"one " * 500)
    (wd / "tree" / "sub" / "two.txt").write_bytes(b"two " * 700)
    (d / "three.txt").write_bytes(b"three " * 900)
    r = zxc("-z", "-k", "-r", "tree", cwd=wd)
    assert r.returncode == 0, r.stderr
    for rel in ("one.txt", "sub/two.txt", "sub/leaf/three.txt"):
        p = wd / "tree" / (rel + ".zxc")
        assert p.exists(), rel
        assert zxc("-d", "-c", str(p), cwd=wd).stdout == \
            (wd / "tree" / rel).read_bytes()


# --- Integrity / checksums / corruption ------------------------------------

def test_test_mode_ok_and_corrupt(wd):
    zxc("-z", "-k", "-C", "t.txt", cwd=wd)
    assert zxc("-t", "t.txt.zxc", cwd=wd).returncode == 0
    blob = bytearray((wd / "t.txt.zxc").read_bytes())
    blob[len(blob) // 2] ^= 0xFF
    (wd / "bad.zxc").write_bytes(bytes(blob))
    assert zxc("-t", "bad.zxc", cwd=wd).returncode == 1


def test_no_checksum_flag(wd):
    zxc("-z", "-k", "-N", "t.txt", cwd=wd)
    r = zxc("-l", "t.txt.zxc", cwd=wd)
    assert b"checksums:       no" in r.stdout
    assert zxc("-d", "-c", "t.txt.zxc", cwd=wd).stdout == \
        (wd / "t.txt").read_bytes()


def test_truncated_archive_rejected(wd):
    zxc("-z", "-k", "t.txt", cwd=wd)
    blob = (wd / "t.txt.zxc").read_bytes()
    (wd / "trunc.zxc").write_bytes(blob[:len(blob) // 3])
    r = zxc("-d", "-c", "trunc.zxc", cwd=wd)
    assert r.returncode == 1


# --- List / JSON ------------------------------------------------------------

def test_list_field_assertions(wd):
    zxc("-z", "-k", "-S", "-C", "-B", "4K", "t.txt", cwd=wd)
    out = zxc("-l", "t.txt.zxc", cwd=wd).stdout.decode()
    size = (wd / "t.txt").stat().st_size
    assert "zxc v7 archive" in out
    assert "block size:      4096" in out
    assert f"decompressed:    {size} bytes" in out
    assert "checksums:       yes" in out
    assert "seekable:        yes" in out
    import re
    m = re.search(r"blocks:\s+(\d+)", out)
    assert m and int(m.group(1)) == -(-size // 4096)


def test_list_json_and_failing_entry(wd):
    zxc("-z", "-k", "t.txt", cwd=wd)
    (wd / "junk.zxc").write_bytes(b"this is not an archive at all")
    r = zxc("-l", "-j", "t.txt.zxc", "junk.zxc", "-m", cwd=wd)
    assert r.returncode == 1            # failing entry -> nonzero exit
    rows = [json.loads(l) for l in r.stdout.splitlines()]
    assert rows[0]["type"] == "archive" and rows[0]["blocks"] >= 1
    assert rows[0]["decompressed"] == (wd / "t.txt").stat().st_size
    assert "error" in rows[1]


def test_bench_json_fields_plausible(wd):
    r = zxc("-b", "1", "-j", "-3", "t.txt", cwd=wd)
    assert r.returncode == 0, r.stderr
    row = json.loads(r.stdout.splitlines()[-1])
    size = (wd / "t.txt").stat().st_size
    assert row["size"] == size
    assert 0 < row["compressed"] < size
    assert abs(row["ratio_pct"] - row["compressed"] / size * 100) < 0.1
    assert row["compress_mbps"] > 0.1 and row["decompress_mbps"] > 0.1


def test_bench_with_dictionary(wd):
    for i in range(5):
        (wd / f"s{i}.j").write_bytes(
            b'{"k": %d, "endpoint": "/api/v1/x"}' % i * 30)
    zxc("--train", "--dict-size", "1024", "-o", "d.zxd", "-f",
        *[f"s{i}.j" for i in range(5)], cwd=wd)
    r = zxc("-b", "1", "-j", "-D", "d.zxd", "s0.j", cwd=wd)
    assert r.returncode == 0, r.stderr
    assert json.loads(r.stdout.splitlines()[-1])["compress_mbps"] > 0


# --- Seekable / dictionary --------------------------------------------------

def test_seekable_archive_lists_and_decodes(wd):
    zxc("-z", "-k", "-S", "-B", "4K", "rnd.bin", cwd=wd)
    out = zxc("-l", "rnd.bin.zxc", cwd=wd).stdout
    assert b"seekable:        yes" in out
    assert zxc("-d", "-c", "rnd.bin.zxc", cwd=wd).stdout == \
        (wd / "rnd.bin").read_bytes()


def test_dict_wrong_dict_rejected(wd):
    for i in range(5):
        (wd / f"s{i}.j").write_bytes(
            b'{"k": %d, "endpoint": "/api/v1/x"}' % i * 30)
    zxc("--train", "--dict-size", "1024", "-o", "d1.zxd", "-f",
        *[f"s{i}.j" for i in range(5)], cwd=wd)
    for i in range(5):
        (wd / f"u{i}.j").write_bytes(b"completely different corpus %d " % i
                                     * 40)
    zxc("--train", "--dict-size", "1024", "-o", "d2.zxd", "-f",
        *[f"u{i}.j" for i in range(5)], cwd=wd)
    zxc("-z", "-k", "-f", "-D", "d1.zxd", "s0.j", cwd=wd)
    r = zxc("-d", "-c", "-D", "d2.zxd", "s0.j.zxc", cwd=wd)
    assert r.returncode == 1
    assert b"DICT" in r.stderr


# --- Flags, long options, alias, progress -----------------------------------

def test_long_options(wd):
    r = zxc("--compress", "--keep", "--force", "--block-size", "64K",
            "--no-checksum", "t.txt", cwd=wd)
    assert r.returncode == 0, r.stderr
    r = zxc("--decompress", "--stdout", "t.txt.zxc", cwd=wd)
    assert r.stdout == (wd / "t.txt").read_bytes()


def test_quiet_and_verbose(wd):
    r = zxc("-z", "-k", "-f", "-q", "t.txt", cwd=wd)
    assert r.returncode == 0 and r.stderr == b""
    r = zxc("-z", "-k", "-f", "-v", "t.txt", cwd=wd)
    assert b"t.txt" in r.stderr


def test_progress_always_renders(wd):
    r = zxc("-z", "-k", "-f", "--progress", "always", "t.txt", cwd=wd)
    assert r.returncode == 0
    assert b"100%" in r.stderr and b"MB/s" in r.stderr


def test_unzxc_alias(wd, tmp_path):
    launcher = tmp_path / "unzxc"
    launcher.write_text("import sys\nfrom zxc_tpu.cli import main\n"
                        "sys.exit(main())\n")
    zxc("-z", "-k", "t.txt", cwd=wd)
    r = zxc("-c", "t.txt.zxc", prog=str(launcher), cwd=wd)
    assert r.returncode == 0, r.stderr
    assert r.stdout == (wd / "t.txt").read_bytes()


def test_version_and_help():
    r = zxc("-V")
    assert r.returncode == 0 and b"zxc" in r.stdout and b"v7" in r.stdout
    r = zxc("--help")
    assert r.returncode == 0 and b"-z" in r.stdout.replace(b"--", b"-")


def test_decode_path_choice_pinned(wd):
    """-T rides the native MT frame codec on BOTH directions (round
    4): decode via zxch_decompress_frame_mt, compression via
    zxch_compress_frame_mt when the native library is present (the
    Python stream pipeline remains the no-toolchain fallback, with an
    identical block layout either way). Output must be bit-identical
    to -T 1 at every thread count."""
    zxc("-z", "-k", "-T", "4", "t.txt", cwd=wd)
    a = zxc("-d", "-c", "-T", "1", "t.txt.zxc", cwd=wd)
    b = zxc("-d", "-c", "-T", "4", "t.txt.zxc", cwd=wd)
    assert a.returncode == 0 and b.returncode == 0
    assert a.stdout == b.stdout == (wd / "t.txt").read_bytes()
    one = zxc("-z", "-c", "-T", "1", data=(wd / "t.txt").read_bytes())
    four = zxc("-z", "-c", "-T", "4", data=(wd / "t.txt").read_bytes())
    assert one.stdout == four.stdout


def test_bad_level_like_args(wd):
    assert zxc("-z", "-B", "3K", "-c", "t.txt", cwd=wd).returncode == 1
    assert zxc("-z", "-B", "1", "-c", "t.txt", cwd=wd).returncode == 1
    assert zxc("-d", "-c", "rnd.bin", cwd=wd).returncode == 1
    assert zxc("-z", "missing-input.xyz", cwd=wd).returncode == 1
    # cannot derive output name without .zxc suffix
    zxc("-z", "-k", "-f", "-o", "plain", "t.txt", cwd=wd)
    assert zxc("-d", "plain", cwd=wd).returncode == 1
