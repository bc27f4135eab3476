#!/usr/bin/env python
"""Generate the deterministic planted-truth `files` corpora (FIXTURES.md §1).

Writes fixtures/files_{tiny,small,bench}/{files,truth_pairs,truth_components}
.parquet. tiny/small are committed to the repo (pytest + the driver's
correctness gate read them); bench is regenerated on demand by bench.py.

Usage: python scripts/make_fixtures.py [tiny small bench]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spaczz_spark.sources.corpus import generate_corpus  # noqa: E402

SPECS = {
    # name: (base files, boilerplate cluster size)
    "tiny": (300, 40),
    "small": (1500, 150),
    "bench": (20000, 500),
    # large corpora for scaling-efficiency evidence (compute must dominate
    # the fixed per-stage orchestration cost; scale2 is sized so the
    # ~30-40s orchestration constant is <7% of the local[2] wall)
    "scale": (100000, 500),
    "scale2": (200000, 500),
    # verify-floor evidence (round-5 ask #3): big enough that the verify
    # stage's per-job orchestration constant (~15-20 s) is a single-digit
    # percent of its local[1] wall, so the (1,4) stage ratio reflects
    # compute, not job setup
    "scale4": (400000, 500),
}

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "fixtures")


def make(name: str) -> None:
    n, boiler = SPECS[name]
    bundle = generate_corpus(n_files=n, seed=42, boilerplate_cluster=boiler)
    # Oracle preconditions (ADVICE r4): the DuckDB mirrors of the verify
    # stage are exact only when
    #   (a) no file has < 3 whitespace tokens — a zero-shingle doc shares
    #       the sentinel MinHash with every other zero-shingle doc and its
    #       pairs route into the kernel band engine-side, while the
    #       oracle's jac CTE (>= 1 shared shingle) can never see them;
    #   (b) no file exceeds LEV_CHAR_KERNEL_MAX chars — above it the
    #       levenshtein kernel switches to token-level (bounded cost) which
    #       DuckDB's char-level levenshtein() does not mirror.
    # Committed fixtures satisfy both (files_small: min 57 tokens, max
    # 13,070 chars); regenerating with content params that break either
    # must fail loudly here, not as an oracle hash mismatch.
    from spaczz_spark.operators.verify import LEV_CHAR_KERNEL_MAX

    n_toks = bundle.files["content"].str.split().str.len()
    assert int(n_toks.min()) >= 3, "oracle precondition: zero-shingle file"
    max_len = int(bundle.files["content"].str.len().max())
    assert max_len <= LEV_CHAR_KERNEL_MAX, (
        f"oracle precondition: {max_len}-char file exceeds the char-level "
        f"levenshtein kernel bound {LEV_CHAR_KERNEL_MAX}"
    )
    out = os.path.join(ROOT, f"files_{name}")
    os.makedirs(out, exist_ok=True)
    # small row groups keep the file splittable — a single row group makes
    # the first Spark scan (normalize/sha) single-task regardless of cores
    bundle.files.to_parquet(
        os.path.join(out, "files.parquet"), index=False, row_group_size=2048
    )
    bundle.truth_pairs.to_parquet(
        os.path.join(out, "truth_pairs.parquet"), index=False
    )
    bundle.truth_components.to_parquet(
        os.path.join(out, "truth_components.parquet"), index=False
    )
    print(
        f"{name}: {len(bundle.files)} files, "
        f"{len(bundle.truth_pairs)} truth pairs -> {out}"
    )


def make_partial() -> None:
    """Committed fixture for the oracle-exact partial_ratio gate
    (files_substring_partial): substitution-only embedded copies at known
    offsets — see sources.corpus.generate_partial_corpus for the exactness
    argument. Self-checks every plant against the production anchored
    kernel before writing: anchor == planted offset and score ==
    100*(n-k)/n, so a generator/argument slip fails HERE, not as a driver
    hash mismatch."""
    from spaczz_spark.operators.substring import (
        partial_ratio_from_positions,
        winnow_fingerprints_pos,
    )
    from spaczz_spark.sources.corpus import generate_partial_corpus

    files, plant = generate_partial_corpus()
    by_key = {
        f"{r.repo}\x1f{r.path}\x1f{r.commit}": r.content
        for r in files.itertuples(index=False)
    }
    for p in plant.itertuples(index=False):
        a, b = by_key[p.a_key], by_key[p.b_key]
        assert len(a) == p.n and b[p.off : p.off + p.n].count("~") == p.k
        fs, ps = winnow_fingerprints_pos(a, 32, 32)
        fl, pl = winnow_fingerprints_pos(b, 32, 32)
        score = partial_ratio_from_positions(
            a.encode(), b.encode(), fs, ps, fl, pl, k=32, min_partial=75
        )
        expected = 100.0 * (1.0 - (2 * p.k) / (p.n + p.n))
        assert abs(score - expected) < 1e-9, (p.a_key, score, expected)
        assert round(expected) >= 75, "plant below the verify threshold"
    out = os.path.join(ROOT, "files_partial")
    os.makedirs(out, exist_ok=True)
    files.to_parquet(os.path.join(out, "files.parquet"), index=False,
                     row_group_size=64)
    plant.to_parquet(os.path.join(out, "plant.parquet"), index=False)
    print(f"partial: {len(files)} files, {len(plant)} plants -> {out}")


def make_ccpath(n: int = 100_000) -> None:
    """Worst-diameter CC stress fixture: a single path graph of ``n`` nodes
    (edges i—i+1). Naive min-label propagation needs O(n) rounds on it;
    the large/small-star implementation must converge in O(log n). Node
    ids are scrambled (odd-multiplier affine bijection mod 2^31) so the
    path order does not correlate with id order — the adversarial case for
    min-id star contraction."""
    import pandas as pd

    ids = [((i * 2654435761 + 12345) % (1 << 31)) for i in range(n)]
    df = pd.DataFrame(
        {"a_id": ids[:-1], "b_id": ids[1:]}, dtype="int64"
    )
    out = os.path.join(ROOT, "cc_path")
    os.makedirs(out, exist_ok=True)
    df.to_parquet(os.path.join(out, "edges.parquet"), index=False,
                  row_group_size=4096)
    print(f"ccpath: {n - 1} edges -> {out}")


def make_media() -> None:
    """Committed media fixture: deterministic real image headers (PNG / GIF /
    BMP / JPEG, baseline + progressive) plus corrupt/truncated/empty blobs,
    with the true (format, width, height) stored alongside so a DuckDB
    oracle can check the engine's pure-header decoder bit-for-bit."""
    import struct
    import zlib

    import pandas as pd

    def png(w, h):
        chunk = b"IHDR" + struct.pack(">II", w, h) + b"\x08\x06\x00\x00\x00"
        return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + chunk
                + struct.pack(">I", zlib.crc32(chunk)))

    def gif(w, h):
        return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00;"

    def bmp(w, h):
        return (b"BM" + struct.pack("<I", 54) + b"\x00\x00\x00\x00"
                + struct.pack("<I", 54) + struct.pack("<I", 40)
                + struct.pack("<ii", w, h) + struct.pack("<HH", 1, 24)
                + b"\x00" * 24)

    def jpeg(w, h, marker=b"\xff\xc0"):
        app0 = (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
                + struct.pack(">HH", 1, 1) + b"\x00\x00")
        sof = (marker + struct.pack(">H", 17) + b"\x08"
               + struct.pack(">HH", h, w) + b"\x03"
               + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01")
        return b"\xff\xd8" + app0 + sof + b"\xff\xd9"

    import random
    rng = random.Random(42)
    rows = []
    mid = 0
    for i in range(40):
        w, h = rng.randint(1, 4096), rng.randint(1, 4096)
        kind = i % 5
        if kind == 0:
            data, fmt = png(w, h), "png"
        elif kind == 1:
            data, fmt = gif(w % 65536, h % 65536), "gif"
            w, h = w % 65536, h % 65536
        elif kind == 2:
            data, fmt = bmp(w, h if i % 2 else -h), "bmp"
        elif kind == 3:
            data, fmt = jpeg(w % 65536, h % 65536), "jpeg"
            w, h = w % 65536, h % 65536
        else:
            data, fmt = jpeg(w % 65536, h % 65536, b"\xff\xc2"), "jpeg"
            w, h = w % 65536, h % 65536
        # pad with deterministic pseudo-pixel bytes so blobs have size
        data = data + bytes(rng.randrange(256) for _ in range(rng.randint(0, 512)))
        rows.append((mid, "image", data, f"image/{fmt}", fmt, w, h))
        mid += 1
    # corrupt / truncated / empty blobs decode to NULLs, not failures
    rows.append((mid, "image", b"not an image at all", "application/octet-stream",
                 None, None, None)); mid += 1
    rows.append((mid, "image", png(9, 9)[:12], "image/png", None, None, None)); mid += 1
    rows.append((mid, "image", b"", "image/png", None, None, None)); mid += 1

    df = pd.DataFrame(
        rows,
        columns=["media_id", "kind", "data", "mime",
                 "true_format", "true_width", "true_height"],
    )
    df["true_width"] = df["true_width"].astype("Int32")
    df["true_height"] = df["true_height"].astype("Int32")
    out = os.path.join(ROOT, "media_small")
    os.makedirs(out, exist_ok=True)
    df.to_parquet(os.path.join(out, "media.parquet"), index=False)
    print(f"media: {len(df)} blobs -> {out}")


if __name__ == "__main__":
    targets = sys.argv[1:] or ["tiny", "small", "media"]
    for t in targets:
        if t == "media":
            make_media()
        elif t == "ccpath":
            make_ccpath()
        elif t == "partial":
            make_partial()
        else:
            make(t)
