"""Similarity search over embedding columns (array<float>).

Spark analog of the reference's vector-similarity searcher (SURVEY.md §2.1
S6 — ``SimilaritySearcher.compare`` = cosine of pooled vectors,
``similaritysearcher.py:26-54``), generalized to table scale:

- ``cosine_topk``        exact brute-force top-k neighbors (the baseline):
  a broadcast cross-join of the query set against the corpus with the dot
  product computed JVM-side (``aggregate(zip_with(...))`` — whole-stage
  codegen, no Python), then a per-query window top-k.
- ``cosine_neardup_pairs`` exact all-pairs cosine >= threshold (self-join
  form of the same plan).
- ``lsh_cosine_pairs``   the scale path: random-hyperplane LSH — sign-bit
  sketches computed in a vectorized numpy pandas UDF, multi-table bucket
  join, exact cosine re-verification. Verified output ⊆ exact output with
  tunable recall (more tables/narrower bands -> higher recall).

All cosine arithmetic is done on L2-normalized vectors so the dot product
IS the cosine; normalization happens once per row, JVM-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .lsh import pairs_from_buckets

__all__ = [
    "l2_normalize",
    "dot",
    "cosine_topk",
    "cosine_neardup_pairs",
    "lsh_cosine_pairs",
]


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two array<double|float> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_normalize(v: Column) -> Column:
    """JVM-side L2 normalization (zero vectors pass through unchanged)."""
    norm = F.sqrt(dot(v, v))
    return F.when(norm > 0, F.transform(v, lambda x: x / norm)).otherwise(v)


def _normalized(docs: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("vec_id"),
        l2_normalize(F.transform(F.col(vec_col), lambda x: x.cast("double"))).alias(
            "nvec"
        ),
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Plan: broadcast the (small) query side against the corpus — a map-side
    nested-loop with codegen'd dot products, no shuffle of the corpus — then
    one shuffle for the per-query top-k window. Ties broken by neighbor id
    for determinism. Output: (query_id, neighbor_id, cosine, rank).
    """
    c = _normalized(corpus, id_col, vec_col)
    q = _normalized(queries, query_id_col, vec_col).withColumnsRenamed(
        {"vec_id": "query_id", "nvec": "qvec"}
    )
    scored = c.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(dot("nvec", "qvec"), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_neardup_pairs(
    docs: DataFrame,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine >= threshold (embedding near-dup baseline).

    O(n²) dot products — correct at any scale but quadratic; use
    :func:`lsh_cosine_pairs` for large corpora. The self-join broadcasts one
    side when small enough (AQE decides). Output: (a_id, b_id, cosine).
    """
    n = _normalized(docs, id_col, vec_col)
    a = n.withColumnsRenamed({"vec_id": "a_id", "nvec": "a_vec"})
    b = n.withColumnsRenamed({"vec_id": "b_id", "nvec": "b_vec"})
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .withColumn("cosine", F.round(dot("a_vec", "b_vec"), 6))
        .where(F.col("cosine") >= threshold)
        .select("a_id", "b_id", "cosine")
    )


def make_hyperplane_sketch_udf(dim: int, n_bits: int = 16, n_tables: int = 8,
                               seed: int = 42):
    """pandas UDF: embedding -> array of n_tables bucket keys (sign sketches).

    One numpy matmul per Arrow batch against a fixed (dim, n_tables*n_bits)
    Gaussian matrix; bits packed per table into an int64 bucket key.
    """
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((dim, n_tables * n_bits))
    weights = (1 << np.arange(n_bits, dtype=np.int64))

    from pyspark.sql.types import ArrayType, LongType

    @F.pandas_udf(ArrayType(LongType()))
    def sketch(vecs: pd.Series) -> pd.Series:
        mat = np.stack(
            [np.asarray(v, dtype=np.float64) if v is not None else
             np.zeros(dim) for v in vecs]
        )
        signs = (mat @ planes) > 0  # (batch, tables*bits)
        signs = signs.reshape(len(mat), n_tables, n_bits)
        keys = (signs * weights[None, None, :]).sum(axis=2).astype(np.int64)
        # mix table index in so buckets from different tables never collide
        keys = keys * np.int64(n_tables + 1) + np.arange(n_tables, dtype=np.int64)
        return pd.Series(list(keys))

    return sketch


def lsh_cosine_pairs(
    docs: DataFrame,
    *,
    threshold: float = 0.95,
    dim: int | None = None,
    n_bits: int = 16,
    n_tables: int = 8,
    seed: int = 42,
    bucket_cap: int = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs via random-hyperplane LSH + exact cosine verify.

    Recall at cosine s: 1 - (1 - p^n_bits)^n_tables with
    p = 1 - arccos(s)/π; at s=0.95 and (16 bits, 8 tables) ≈ 0.97.
    Every emitted pair is exactly verified, so precision is exact.
    """
    if dim is None:
        first = docs.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"])
    n = _normalized(docs, id_col, vec_col)
    sketch = make_hyperplane_sketch_udf(dim, n_bits, n_tables, seed)
    buckets = n.select(
        F.col("vec_id").alias("file_id"),
        F.explode(sketch("nvec")).alias("bucket_key"),
    )
    cand = pairs_from_buckets(buckets, bucket_cap)
    a = n.withColumnsRenamed({"vec_id": "a_id", "nvec": "a_vec"})
    b = n.withColumnsRenamed({"vec_id": "b_id", "nvec": "b_vec"})
    return (
        cand.join(a, "a_id")
        .join(b, "b_id")
        .withColumn("cosine", F.round(dot("a_vec", "b_vec"), 6))
        .where(F.col("cosine") >= threshold)
        .select("a_id", "b_id", "cosine")
    )
