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
}

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "fixtures")


def make(name: str) -> None:
    n, boiler = SPECS[name]
    bundle = generate_corpus(n_files=n, seed=42, boilerplate_cluster=boiler)
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


if __name__ == "__main__":
    targets = sys.argv[1:] or ["tiny", "small"]
    for t in targets:
        make(t)
