"""One-off diagnostic: quantify the substring-verify partial-ratio cost on
the scale2 fixture (round-5 regression hunt).

Counts substring candidates, the verbatim-contained subset, and times the
verify stage with min_partial=None vs min_r2 — isolating the cost the
anchored partial kernel added to the pipeline's verified_pairs stage.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession, functions as F

from spaczz_spark.functions.signatures import (
    normalize,
    with_shingles_and_fingerprints,
)
from spaczz_spark.operators.substring import (
    substring_candidates,
    verify_substring_pairs,
)
from spaczz_spark.plans.config import DedupConfig

FIXTURE = os.environ.get("DIAG_FIXTURE", "fixtures/files_scale2")
CORES = os.environ.get("DIAG_CORES", "16")

spark = (
    SparkSession.builder.master(f"local[{CORES}]")
    .config("spark.driver.memory", "24g")
    .config("spark.sql.shuffle.partitions", str(int(CORES) * 2))
    .config("spark.sql.adaptive.enabled", "true")
    .appName("diag_substring")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

cfg = DedupConfig()
files = spark.read.parquet(os.path.join(FIXTURE, "files.parquet"))
norm = normalize(files)
# collapse exact dupes like the pipeline does
rep_map = norm.groupBy("content_sha256").agg(F.min("file_id").alias("rep_id"))
reps = norm.join(
    rep_map.withColumnRenamed("rep_id", "file_id").select("file_id"),
    "file_id",
    "left_semi",
)
sigs = with_shingles_and_fingerprints(
    reps, cfg.shingle_k, cfg.substring_k, cfg.substring_w, cfg.substring_min_len
).select(
    "file_id", "content", "fingerprints", "fp_positions"
).localCheckpoint()
print("reps:", sigs.count())

t0 = time.time()
cand = substring_candidates(
    sigs, k=cfg.substring_k, w=cfg.substring_w,
    bucket_cap=cfg.bucket_cap, min_bytes=cfg.substring_min_len,
).localCheckpoint()
n_cand = cand.count()
print(f"substring candidates: {n_cand}  ({time.time()-t0:.1f}s)")

corpus = sigs.select("file_id", "content")

t0 = time.time()
n_verb = verify_substring_pairs(
    cand, corpus, min_len=cfg.substring_min_len, min_partial=None
).count()
t_verb = time.time() - t0
print(f"verbatim-only verify: kept {n_verb}  wall {t_verb:.1f}s")

t0 = time.time()
kept_p = verify_substring_pairs(
    cand, corpus, min_len=cfg.substring_min_len, min_partial=75,
    k=cfg.substring_k,
)
agg = kept_p.groupBy("verified_by").count().collect()
t_part = time.time() - t0
print(f"partial verify: {dict((r['verified_by'], r['count']) for r in agg)}  "
      f"wall {t_part:.1f}s")

# length profile of the pairs that reach the partial kernel
joined = (
    cand.join(corpus.select(F.col("file_id").alias("a_id"),
                            F.col("content").alias("a_content")), "a_id")
    .join(corpus.select(F.col("file_id").alias("b_id"),
                        F.col("content").alias("b_content")), "b_id")
    .withColumn("a_len", F.length("a_content"))
    .withColumn("b_len", F.length("b_content"))
    .withColumn("verbatim",
                F.expr("locate(substring(case when a_len<=b_len then a_content else b_content end,1,2147483647), case when a_len<=b_len then b_content else a_content end) > 0"))
)
prof = joined.where(~F.col("verbatim")).select(
    F.count("*").alias("n_kernel_pairs"),
    F.sum(F.least("a_len", "b_len")).alias("sum_short_bytes"),
    F.sum(F.greatest("a_len", "b_len")).alias("sum_long_bytes"),
    F.max(F.greatest("a_len", "b_len")).alias("max_long"),
    F.countDistinct(F.greatest("a_id", "b_id")).alias("distinct_hi"),
).collect()[0]
print("kernel-pair profile:", prof.asDict())
spark.stop()
