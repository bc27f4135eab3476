"""Scale-adaptive input layout helpers (guide §2: partitioning that adapts
to input size instead of constants tuned for one scale)."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["ensure_min_partitions"]


def ensure_min_partitions(df: DataFrame, n: int | None = None) -> DataFrame:
    """Round-robin spread ``df`` to at least ``n`` (default: the session's
    defaultParallelism) partitions — ONLY when it is under-partitioned.

    Why: the standalone operators are routinely pointed at single sub-MB
    parquet files (driver testdata, committed fixtures), which scan as ONE
    partition — and every Arrow UDF stage above the scan then runs serial
    on one task while the other cores idle. At warehouse scale inputs have
    plenty of partitions and this is a structural no-op (the partition
    count check costs a plan analysis, no job), so the expensive corpus is
    never re-shuffled just for layout.

    Round-robin repartition is retry-safe here: Spark sorts before
    round-robin distribution by default (sortBeforeRepartition), so task
    retries reproduce the same row placement.
    """
    sc = df.sparkSession.sparkContext
    n = n or sc.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df
