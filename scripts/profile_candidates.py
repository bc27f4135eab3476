#!/usr/bin/env python
"""Per-sub-source profile of the candidate_pairs stage (round-6 scaling work).

The (2,8) scaling runs on the 560k-file scale4 corpus put candidate_pairs
at the top of the stage walls (314s @2c, 3.0x at 4x cores) — this script
times the stage's internal sub-plans at each requested parallelism so the
optimization target is measured, not guessed:

  mh_band   MinHash banding explode + bucket sizing + pair enumeration
  sh_block  SimHash pigeonhole blocks + pair enumeration + exact hamming
  sub_fp    substring fingerprint explode + pair enumeration
  union_gb  the full production stage: union + groupBy(min stage) + write

Usage:
  SPARK_GRAFT_PROFILE_FIXTURE=scale2 SPARK_GRAFT_PROFILE_LEVELS=2,8 \
      python scripts/profile_candidates.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

FIXTURE = os.environ.get("SPARK_GRAFT_PROFILE_FIXTURE", "scale2")
LEVELS = [
    int(x)
    for x in os.environ.get("SPARK_GRAFT_PROFILE_LEVELS", "2,8").split(",")
]
REPEATS = int(os.environ.get("SPARK_GRAFT_PROFILE_REPEATS", "2"))
IMPLS = os.environ.get("SPARK_GRAFT_PROFILE_IMPLS", "grouped,window").split(",")
CKPT = os.path.join(tempfile.gettempdir(), f"spaczz_profile_{FIXTURE}")


def session(cores: int):
    from spaczz_spark.plans.pipeline import recommended_session

    s = recommended_session(
        app=f"profile-candidates-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(cores, 16),
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def ensure_checkpoints() -> None:
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_fixtures import make

    fdir = os.path.join(REPO, "fixtures", f"files_{FIXTURE}")
    if not os.path.exists(os.path.join(fdir, "files.parquet")):
        make(FIXTURE)
    from spaczz_spark.plans.config import DedupConfig
    from spaczz_spark.plans.pipeline import DedupPipeline

    s = session(8)
    try:
        files = s.read.parquet(os.path.join(fdir, "files.parquet"))
        DedupPipeline(s, DedupConfig(), CKPT).run(files)
    finally:
        s.stop()


def profile_level(cores: int) -> dict:
    from pyspark.sql import functions as F

    from spaczz_spark.operators.lsh import (
        minhash_candidates,
        simhash_candidates,
    )
    from spaczz_spark.operators.substring import substring_candidates
    from spaczz_spark.plans.config import DedupConfig

    cfg = DedupConfig()
    s = session(cores)
    out: dict[str, float] = {}
    try:
        signatures = s.read.parquet(os.path.join(CKPT, "signatures"))

        import spaczz_spark.operators.lsh as lsh_mod

        for impl in IMPLS:
            lsh_mod.PAIRS_IMPL = impl
            t0 = time.time()
            mh = minhash_candidates(
                signatures, cfg.bands, cfg.rows, cfg.bucket_cap, dedup=False
            )
            out[f"n_mh_{impl}"] = mh.count()
            out[f"mh_band_{impl}_sec"] = round(time.time() - t0, 2)

            t0 = time.time()
            sh = simhash_candidates(
                signatures, cfg.max_hamming, cfg.bucket_cap, dedup=False
            )
            out[f"n_sh_{impl}"] = sh.count()
            out[f"sh_block_{impl}_sec"] = round(time.time() - t0, 2)

            t0 = time.time()
            sub = substring_candidates(
                signatures, k=cfg.substring_k, w=cfg.substring_w,
                bucket_cap=cfg.bucket_cap, min_bytes=cfg.substring_min_len,
            )
            out[f"n_sub_{impl}"] = sub.count()
            out[f"sub_fp_{impl}_sec"] = round(time.time() - t0, 2)

            # the full production stage plan, end-to-end, behind a real write
            t0 = time.time()
            sim = (
                mh.unionByName(sh)
                .groupBy("a_id", "b_id")
                .agg(F.min("stage").alias("stage"))
            )
            full = sim.unionByName(sub)
            outdir = os.path.join(
                tempfile.gettempdir(), f"spaczz_profile_cand_out_{cores}"
            )
            full.write.mode("overwrite").parquet(outdir)
            out[f"union_gb_write_{impl}_sec"] = round(time.time() - t0, 2)
    finally:
        s.stop()
    return out


def main() -> None:
    ensure_checkpoints()
    results: dict[int, list] = {c: [] for c in LEVELS}
    for _ in range(REPEATS):
        for c in LEVELS:
            results[c].append(profile_level(c))
    summary = {}
    for c in LEVELS:
        best = {}
        for key in results[c][0]:
            if key.endswith("_sec"):
                best[key] = min(r[key] for r in results[c])
            else:
                best[key] = results[c][0][key]
        best["all"] = results[c]
        summary[f"local[{c}]"] = best
    if len(LEVELS) == 2:
        lo, hi = LEVELS
        ratios = {}
        for key in summary[f"local[{lo}]"]:
            if key.endswith("_sec") and summary[f"local[{hi}]"][key] > 0:
                ratios[key] = round(
                    summary[f"local[{lo}]"][key]
                    / summary[f"local[{hi}]"][key], 2
                )
        summary["speedup_lo_over_hi"] = ratios
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
