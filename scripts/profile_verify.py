#!/usr/bin/env python
"""Per-sub-step profile of the verified_pairs stage (round-4 scaling work).

Builds (or reuses) the pipeline checkpoints up to `candidate_pairs` on a
scaling fixture, then times the verify stage's internal steps at each
requested parallelism level in separate SparkSessions:

  slim     attach (sha, shingles) to both pair sides + jaccard + localCheckpoint
  decided  sha/jaccard fast-path filter (forced via count)
  kernel   content join + Arrow InDel kernel + threshold filter
  dedup    best-per-pair window + union
  write    committed parquet write of the final verified table

Usage:
  SPARK_GRAFT_PROFILE_FIXTURE=scale SPARK_GRAFT_PROFILE_LEVELS=1,4 \
      python scripts/profile_verify.py
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

FIXTURE = os.environ.get("SPARK_GRAFT_PROFILE_FIXTURE", "scale")
LEVELS = [
    int(x)
    for x in os.environ.get("SPARK_GRAFT_PROFILE_LEVELS", "1,4").split(",")
]
REPEATS = int(os.environ.get("SPARK_GRAFT_PROFILE_REPEATS", "2"))
CKPT = os.path.join(tempfile.gettempdir(), f"spaczz_profile_{FIXTURE}")


def session(cores: int):
    from spaczz_spark.plans.pipeline import recommended_session

    s = recommended_session(
        app=f"profile-verify-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(cores, 16),
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def ensure_checkpoints() -> None:
    """Run the pipeline once (any core count) so signatures/candidates are
    committed; resume makes this a no-op on re-runs."""
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
    from pyspark.sql.window import Window

    from spaczz_spark.operators.verify import (
        decided_pairs,
        kernel_pairs,
        score_pairs_slim,
    )
    from spaczz_spark.plans.config import DedupConfig

    # The profiled plan IS the production plan: the sub-stages below are the
    # same factored functions verify_pairs composes, parameterized from
    # DedupConfig (ADVICE r4 — the previous inline copy with hard-coded
    # thresholds would silently diverge from any future verify_pairs change).
    cfg = DedupConfig()
    _, min_r2, _ = cfg.resolved_ratios()

    s = session(cores)
    out: dict[str, float] = {}
    try:
        signatures = s.read.parquet(os.path.join(CKPT, "signatures"))
        candidates = s.read.parquet(os.path.join(CKPT, "candidate_pairs"))
        # r7: the signatures checkpoint no longer carries `content`; the
        # kernel/phase-B joins read it from the committed normalized table,
        # exactly as the production verify stage does (content_df)
        content_df = s.read.parquet(
            os.path.join(CKPT, "normalized")
        ).select("file_id", "content")
        sim_cand = candidates.where(F.col("stage") != "substring")

        t0 = time.time()
        scored = score_pairs_slim(
            sim_cand,
            signatures,
            jaccard_min=cfg.jaccard_min,
            jaccard_floor=cfg.jaccard_floor,
        )
        out["slim_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        decided = decided_pairs(scored, jaccard_min=cfg.jaccard_min)
        n_decided = decided.count()
        out["decided_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        kernel_kept = kernel_pairs(
            scored, content_df, min_r2=min_r2, ratio_func=cfg.ratio_func
        ).localCheckpoint()
        out["kernel_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        allv = decided.unionByName(kernel_kept)
        w = Window.partitionBy("a_id", "b_id").orderBy(
            F.desc_nulls_last("edit_ratio"), F.desc_nulls_last("jaccard")
        )
        final = (
            allv.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .drop("rn")
        )
        outdir = os.path.join(
            tempfile.gettempdir(), f"spaczz_profile_out_{cores}"
        )
        final.repartition(s.sparkContext.defaultParallelism).write.mode(
            "overwrite"
        ).parquet(outdir)
        out["dedup_write_sec"] = round(time.time() - t0, 2)
        out["n_decided"] = n_decided

        # ---- substring path (two-phase, round-5) ------------------------
        from spaczz_spark.operators.substring import (
            screen_substring_pairs,
            verify_substring_pairs,
        )

        sub_cand = candidates.where(F.col("stage") == "substring")
        t0 = time.time()
        passed = screen_substring_pairs(
            sub_cand, signatures,
            min_len=cfg.substring_min_len, min_partial=min_r2,
            k=cfg.substring_k,
        ).localCheckpoint()
        out["n_sub_passed"] = passed.count()
        out["sub_screen_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        n_sub = verify_substring_pairs(
            sub_cand, signatures,
            min_len=cfg.substring_min_len,
            min_partial=min_r2 if cfg.substring_partial else None,
            k=cfg.substring_k,
            content_df=content_df,
        ).count()
        out["n_sub_verified"] = n_sub
        out["sub_fused_sec"] = round(time.time() - t0, 2)
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
