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
        attach_pair_sides,
        make_edit_ratio_udf,
    )

    s = session(cores)
    out: dict[str, float] = {}
    try:
        signatures = s.read.parquet(os.path.join(CKPT, "signatures"))
        candidates = s.read.parquet(os.path.join(CKPT, "candidate_pairs"))
        sim_cand = candidates.where(F.col("stage") != "substring")

        t0 = time.time()
        slim = attach_pair_sides(
            sim_cand, signatures, ["content_sha256", "n_shingles", "shingles"]
        )
        sha_eq = F.col("a_content_sha256") == F.col("b_content_sha256")
        inter_sz = F.size(F.array_intersect("a_shingles", "b_shingles"))
        union_sz = (
            F.col("a_n_shingles") + F.col("b_n_shingles") - F.col("isz")
        )
        scored = (
            slim.withColumn("isz", inter_sz)
            .withColumn(
                "jaccard",
                F.when(sha_eq, F.lit(1.0))
                .when(union_sz == 0, F.lit(0.0))
                .otherwise(F.col("isz") / union_sz),
            )
            .withColumn("sha_eq", sha_eq)
            .withColumn(
                "kernel_band",
                ~sha_eq
                & (F.col("jaccard") < 0.7)
                & ((F.col("jaccard") >= 0.2) | (union_sz == 0)),
            )
            .select("a_id", "b_id", "stage", "jaccard", "sha_eq",
                    "kernel_band")
            .localCheckpoint()
        )
        out["slim_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        decided = scored.where(
            F.col("sha_eq") | (F.col("jaccard") >= 0.7)
        ).select(
            "a_id", "b_id", "stage", "jaccard",
            F.when(F.col("sha_eq"), F.lit(100)).cast("int")
            .alias("edit_ratio"),
            F.when(F.col("sha_eq"), F.lit("sha")).otherwise("jaccard")
            .alias("verified_by"),
        )
        n_decided = decided.count()
        out["decided_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        edit_udf = make_edit_ratio_udf(74)
        band = attach_pair_sides(
            scored.where(F.col("kernel_band")).select(
                "a_id", "b_id", "stage", "jaccard"
            ),
            signatures,
            ["content"],
        )
        band = band.repartition(s.sparkContext.defaultParallelism * 4)
        kernel_kept = (
            band.withColumn("edit_ratio", edit_udf("a_content", "b_content"))
            .where(F.col("edit_ratio") >= 75)
            .select(
                "a_id", "b_id", "stage", "jaccard", "edit_ratio",
                F.lit("edit_ratio").alias("verified_by"),
            )
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
