#!/usr/bin/env python
"""A/B the verified_pairs stage COMPOSITION (round-5 VERDICT ask #3).

Round 5 quantified a ~36s gap at scale4/local[4] between the verify
sub-stages' sum (163s) and the fused v1-union-v2 stage wall (199s) —
union-job composition overhead (both verifies evaluated as one job behind
one write barrier). This script measures, on the SAME committed
signatures/candidate_pairs checkpoints (built by scripts/profile_verify.py):

  fused  — the exact production plan: v1 union v2 -> best-per-pair window
           -> parquet write, one job (plans/pipeline.py build_verified)
  split  — v1 and v2 each localCheckpoint'ed as separate jobs, then the
           (now trivially slim) union + window + write

at each parallelism level, interleaved min-of-REPEATS per variant.
Whichever wins goes into the pipeline; the loser's numbers are committed
as evidence (round-4 persist-refutation discipline).

Usage:
  SPARK_GRAFT_PROFILE_FIXTURE=scale4 SPARK_GRAFT_PROFILE_LEVELS=1,4 \
      python scripts/ab_verify_composition.py
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

FIXTURE = os.environ.get("SPARK_GRAFT_PROFILE_FIXTURE", "scale4")
LEVELS = [
    int(x)
    for x in os.environ.get("SPARK_GRAFT_PROFILE_LEVELS", "1,4").split(",")
]
REPEATS = int(os.environ.get("SPARK_GRAFT_PROFILE_REPEATS", "2"))
CKPT = os.path.join(tempfile.gettempdir(), f"spaczz_profile_{FIXTURE}")


def session(cores: int):
    from spaczz_spark.plans.pipeline import recommended_session

    s = recommended_session(
        app=f"ab-verify-{cores}", master=f"local[{cores}]",
        shuffle_partitions=max(cores, 16),
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def _verifies(s):
    from pyspark.sql import functions as F

    from spaczz_spark.operators.substring import verify_substring_pairs
    from spaczz_spark.operators.verify import verify_pairs
    from spaczz_spark.plans.config import DedupConfig

    cfg = DedupConfig()
    _, min_r2, _ = cfg.resolved_ratios()
    signatures = s.read.parquet(os.path.join(CKPT, "signatures"))
    candidates = s.read.parquet(os.path.join(CKPT, "candidate_pairs"))
    # r7: signatures checkpoint is content-less; text comes from normalized
    content_df = s.read.parquet(
        os.path.join(CKPT, "normalized")
    ).select("file_id", "content")
    v1 = verify_pairs(
        candidates.where(F.col("stage") != "substring"),
        signatures,
        min_r2=min_r2,
        jaccard_min=cfg.jaccard_min,
        jaccard_floor=cfg.jaccard_floor,
        ratio_func=cfg.ratio_func,
        content_df=content_df,
    )
    v2 = verify_substring_pairs(
        candidates.where(F.col("stage") == "substring"),
        signatures,
        min_len=cfg.substring_min_len,
        min_partial=min_r2 if cfg.substring_partial else None,
        k=cfg.substring_k,
        content_df=content_df,
    )
    return v1, v2


def _finish(s, v1, v2, outdir: str) -> int:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    allv = v1.unionByName(v2)
    w = Window.partitionBy("a_id", "b_id").orderBy(
        F.desc_nulls_last("edit_ratio"), F.desc_nulls_last("jaccard")
    )
    final = (
        allv.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    final.repartition(s.sparkContext.defaultParallelism).write.mode(
        "overwrite"
    ).parquet(outdir)
    return s.read.parquet(outdir).count()


def run_variant(cores: int, variant: str) -> dict:
    s = session(cores)
    out: dict = {"variant": variant, "cores": cores}
    outdir = os.path.join(tempfile.gettempdir(), f"spaczz_ab_out_{cores}")
    try:
        t0 = time.time()
        v1, v2 = _verifies(s)
        if variant == "split":
            t = time.time()
            v1 = v1.localCheckpoint()
            out["v1_sec"] = round(time.time() - t, 2)
            t = time.time()
            v2 = v2.localCheckpoint()
            out["v2_sec"] = round(time.time() - t, 2)
        n = _finish(s, v1, v2, outdir)
        out["total_sec"] = round(time.time() - t0, 2)
        out["rows"] = n
    finally:
        s.stop()
    return out


def main() -> None:
    if not os.path.exists(os.path.join(CKPT, "candidate_pairs")):
        raise SystemExit(
            f"no checkpoints at {CKPT}; run scripts/profile_verify.py first"
        )
    runs: list[dict] = []
    for _ in range(REPEATS):
        for cores in LEVELS:
            for variant in ("fused", "split"):
                r = run_variant(cores, variant)
                runs.append(r)
                print(json.dumps(r), flush=True)
    summary: dict = {"runs": runs}
    for cores in LEVELS:
        for variant in ("fused", "split"):
            walls = [
                r["total_sec"] for r in runs
                if r["cores"] == cores and r["variant"] == variant
            ]
            summary[f"{variant}_local[{cores}]_min_sec"] = min(walls)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
