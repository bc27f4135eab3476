"""Standalone dedup operators over generic document tables.

These expose the pipeline's machinery as single-call DataFrame operators a
training-data pipeline would use directly on a ``documents(doc_id, text)``
table (driver testdata shape). Each has an ANSI-SQL-expressible contract so
the DuckDB oracle can verify it exactly:

- exact_duplicates:   hash-groupBy on sha256(text)
- ngram_jaccard_pairs: brute-force token-shingle Jaccard via an exploded
  equi-join (the verification measure itself; selective because k-token
  shingles are rare across non-duplicates)
- minhash_neardup_pairs: shingle -> MinHash -> LSH banding -> exact Jaccard
  verify; at the default band config the candidate recall at the verify
  threshold is > 1 - 1e-7, so the verified output equals the brute-force
  oracle deterministically.
- simhash_neardup_pairs: SimHash blocking -> exact verify (same contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.layout import ensure_min_partitions
from ..functions.signatures import (
    SHINGLE_SEP,
    TOKEN_PATTERN,
    with_fused_signatures,
)
from .lsh import minhash_candidates, simhash_candidates

__all__ = [
    "exact_duplicates",
    "shingle_strings",
    "ngram_jaccard_pairs",
    "minhash_neardup_pairs",
    "simhash_neardup_pairs",
]


def exact_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of byte-identical documents: (group_id, doc_id, group_size).

    group_id = min doc_id of the group; only groups with >1 member returned.
    One hash shuffle on sha256; map-side partial aggregation applies.
    """
    hashed = docs.select(
        F.col(id_col).alias("doc_id"), F.sha2(text_col, 256).alias("sha")
    )
    groups = (
        hashed.groupBy("sha")
        .agg(
            F.min("doc_id").alias("group_id"),
            F.count(F.lit(1)).alias("group_size"),
            F.collect_list("doc_id").alias("members"),
        )
        .where(F.col("group_size") > 1)
    )
    return (
        groups.select(
            "group_id", F.explode("members").alias("doc_id"), "group_size"
        )
        .orderBy("group_id", "doc_id")
    )


def fingerprint_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Formatting-insensitive duplicate groups via the normalization
    fingerprint (md5 of lower-cased, whitespace-collapsed, trimmed text)."""
    from ..functions.text import doc_fingerprint

    hashed = docs.select(
        F.col(id_col).alias("doc_id"), doc_fingerprint(F.col(text_col)).alias("fp")
    )
    groups = (
        hashed.groupBy("fp")
        .agg(
            F.min("doc_id").alias("group_id"),
            F.count(F.lit(1)).alias("group_size"),
            F.collect_list("doc_id").alias("members"),
        )
        .where(F.col("group_size") > 1)
    )
    return groups.select(
        "group_id", F.explode("members").alias("doc_id"), "group_size"
    )


def shingle_strings(toks: Column, k: int = 5) -> Column:
    """Distinct token k-shingle strings from a *materialized* token-array
    column (see functions.signatures.kgram_hashes for why it must be
    materialized — inline expressions re-evaluate per element)."""
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                SHINGLE_SEP, *[F.get(toks, i + j - 1) for j in range(k)]
            ),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    *,
    k: int = 5,
    threshold: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All document pairs with token-k-shingle Jaccard >= threshold.

    Exact (no LSH): explode shingles, equi-join on the shingle, count
    intersections, compute |A∩B| / (|A| + |B| - |A∩B|). The exploded join is
    the classic set-similarity-join plan; k-token shingles keep the join
    selective. Output: (a_id, b_id, jaccard).
    """
    sh = ensure_min_partitions(docs).select(
        F.col(id_col).alias("doc_id"),
        F.regexp_extract_all(
            F.lower(text_col), F.lit(TOKEN_PATTERN), 0
        ).alias("_toks"),
    ).select(
        "doc_id", F.explode(shingle_strings(F.col("_toks"), k)).alias("shingle")
    )
    # materialized once (r7): `sh` feeds the per-doc sizes aggregate AND
    # both sides of the self-join; the interpreted tokenize+shingle
    # transform is the expensive part and ran once per consumer subtree.
    # LAZY so the persist happens inside the consuming job (no extra
    # serial job at operator-call time). Footprint note: the exploded
    # string table is ~k x the corpus text — comparable to ONE of the two
    # shuffle copies this operator's self-join writes anyway, and this
    # operator is the documented brute-force/oracle path (minhash LSH is
    # the scale path).
    sh = sh.localCheckpoint(eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc_id": "a_id", "n": "na"}), "a_id")
        .join(sizes.withColumnsRenamed({"doc_id": "b_id", "n": "nb"}), "b_id")
        .withColumn(
            "jaccard", F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
        )
        .where(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))
    )


def _docs_with_signatures(
    docs: DataFrame, k: int, num_perm: int, seed: int,
    id_col: str, text_col: str,
) -> DataFrame:
    # single-file inputs scan as ONE partition and would serialize the
    # signature UDF on one task; no-op on well-partitioned inputs
    base = ensure_min_partitions(
        docs.select(
            F.col(id_col).alias("file_id"), F.col(text_col).alias("content")
        )
    )
    # fused single-pass UDF: one ArrowEvalPython node (no chained-runner
    # deadlock shape, shingles cross the Arrow boundary once — see
    # functions.signatures.make_fused_signature_udf). Materialized ONCE
    # (r7): the candidate + verify consumers reference this table up to 7
    # times, and the nondeterministic UDF marker blocks exchange/subtree
    # reuse, so each reference re-ran the full Arrow signature pass over
    # the corpus (7 ArrowEvalPython nodes in the doc_minhash_neardup
    # plan). This is the standalone-operator analog of the pipeline's
    # committed `signatures` checkpoint. Content is dropped first — no
    # consumer of the signature table needs it, so the raw text never
    # enters the materialized footprint.
    return with_fused_signatures(base, k, num_perm, seed).drop(
        "content"
    ).localCheckpoint()


def _verify_jaccard(
    pairs: DataFrame, sigs: DataFrame, threshold: float
) -> DataFrame:
    side = sigs.select("file_id", "shingles")
    return (
        pairs.join(
            side.withColumnsRenamed({"file_id": "a_id", "shingles": "a_sh"}),
            "a_id",
        )
        .join(
            side.withColumnsRenamed({"file_id": "b_id", "shingles": "b_sh"}),
            "b_id",
        )
        .withColumn(
            "jaccard",
            # token-free docs have empty shingle sets and still reach here
            # (sentinel MinHash collides in every band): define 0/0 as 0.0
            # rather than ANSI-aborting the job. Such pairs never appear in
            # the brute-force oracle (the exploded equi-join needs a shared
            # shingle), so filtering them out preserves output equality.
            F.when(F.size(F.array_union("a_sh", "b_sh")) == 0, F.lit(0.0))
            .otherwise(
                F.size(F.array_intersect("a_sh", "b_sh"))
                / F.size(F.array_union("a_sh", "b_sh"))
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_neardup_pairs(
    docs: DataFrame,
    *,
    k: int = 5,
    threshold: float = 0.6,
    num_perm: int = 128,
    bands: int = 64,
    rows: int = 2,
    seed: int = 42,
    bucket_cap: int = 512,
    star_cap: int = 100_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH, exactly verified.

    Contract: identical output to :func:`ngram_jaccard_pairs` at the same
    (k, threshold) — LSH only prunes the candidate space; with (64, 2)
    banding the miss probability at Jaccard 0.6 is (1 - 0.36)^64 < 4e-13.

    Caveat: buckets larger than ``star_cap`` degrade to linear star
    expansion (pair-level output is then a subset; the transitive clusters
    are still complete after connected components). The default is high
    enough that this operator keeps brute-force pair equality on any corpus
    whose largest single LSH bucket is < ``star_cap`` docs; lower it only
    when trading pair completeness for skew protection.
    """
    sigs = _docs_with_signatures(docs, k, num_perm, seed, id_col, text_col)
    cand = minhash_candidates(sigs, bands, rows, bucket_cap, star_cap=star_cap)
    return _verify_jaccard(cand.select("a_id", "b_id"), sigs, threshold)


def simhash_neardup_pairs(
    docs: DataFrame,
    *,
    k: int = 5,
    threshold: float = 0.6,
    max_hamming: int = 8,
    seed: int = 42,
    bucket_cap: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate pairs via SimHash blocking, exactly verified by
    Jaccard. Note: SimHash recall at a Jaccard threshold is heuristic (the
    two measures differ); pairs it finds are exactly verified, so precision
    is exact even where recall is approximate."""
    sigs = _docs_with_signatures(docs, k, 128, seed, id_col, text_col)
    cand = simhash_candidates(sigs, max_hamming, bucket_cap)
    return _verify_jaccard(cand.select("a_id", "b_id"), sigs, threshold)
