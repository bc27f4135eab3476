"""Driver contract for the spark-graft builder (PySpark target).

The implementations live in ``spaczz_spark.queries`` (QUERIES/ORACLES);
this file is the thin adapter the driver imports. See SURVEY.md §2 for the
operator inventory each query exercises.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
# Python workers spawned by the JVM need the package importable too.
os.environ["PYTHONPATH"] = (
    REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
)


def _prepare(spark: SparkSession) -> SparkSession:
    # engine-recommended runtime settings (idempotent on a live session)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    except Exception:
        pass  # immutable on some session states; defaults are fine
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full near-duplicate detection + clustering pipeline
    (shingle -> MinHash/SimHash -> LSH -> exact verify -> connected
    components) over the planted tiny corpus; returns the component
    assignment table."""
    from spaczz_spark.queries import q_files_pipeline

    return q_files_pipeline(_prepare(spark), "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from spaczz_spark.queries import QUERIES

    def wrap(fn):
        return lambda spark, sf_dir: fn(_prepare(spark), sf_dir)

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from spaczz_spark.queries import ORACLES

    return dict(ORACLES)
