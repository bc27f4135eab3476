"""Substring-duplicate stage — the ``partial_ratio`` analog (SURVEY.md §2.1 S2).

Shingle Jaccard dilutes verbatim-embedded duplicates (file A pasted inside a
10x larger file B has Jaccard ~ |A|/|B|), which is exactly the blind spot the
reference covers with ``fuzz.partial_ratio`` (best local alignment of the
shorter string; reference: ``registry/fuzzyfuncs.py:9``). At corpus scale we
cover it with **winnowed k-gram fingerprints** (Schleimer et al., MOSS):

- per document, hash all byte k-grams (k=32) with a vectorized numpy rolling
  window, then keep the minimum hash of every w-length window (w=32).
  Winnowing guarantee: any common substring of length >= w + k - 1 (= 63
  bytes) shares at least one selected fingerprint — deterministic recall for
  long verbatim overlaps, at ~2/w of the all-positions cost.
- explode fingerprints, bucket-join into candidate pairs (same cap/star skew
  guard as MinHash LSH).
- verify with an Arrow-batched pandas UDF: containment check plus
  ``partial_ratio`` of the shorter side against the aligned region.

Output pairs carry stage='substring' and the partial ratio as edit_ratio.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from .lsh import pairs_from_buckets
from .verify import attach_pair_sides

__all__ = ["make_fingerprint_udf", "substring_candidates", "verify_substring_pairs"]

_B = np.uint64(1099511628211)  # FNV-ish odd multiplier for the rolling hash


def _kgram_hashes(data: bytes, k: int) -> np.ndarray:
    """uint64 hashes of all k-grams of ``data`` (vectorized)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    if len(arr) < k:
        arr = np.pad(arr, (0, k - len(arr)), constant_values=0)
    win = np.lib.stride_tricks.sliding_window_view(arr, k).astype(np.uint64)
    # powers of B mod 2^64, computed in Python ints (numpy scalar uint64
    # multiply raises overflow warnings even though wrap-around is intended)
    powers_py = [1] * k
    for i in range(k - 2, -1, -1):
        powers_py[i] = (powers_py[i + 1] * int(_B)) & 0xFFFFFFFFFFFFFFFF
    powers = np.array(powers_py, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = (win * powers[None, :]).sum(axis=1, dtype=np.uint64)
    # final mix so low bytes influence high bits
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    return h


def winnow_fingerprints(text: str, k: int = 32, w: int = 32) -> np.ndarray:
    """Winnowed fingerprint set (distinct int64) of a document."""
    data = text.encode("utf-8", errors="ignore")
    h = _kgram_hashes(data, k)
    if len(h) <= w:
        sel = np.array([h.min()], dtype=np.uint64)
    else:
        wins = np.lib.stride_tricks.sliding_window_view(h, w)
        sel = wins.min(axis=1)
    return np.unique(sel).astype(np.int64)


def make_fingerprint_udf(k: int = 32, w: int = 32):
    @F.pandas_udf(ArrayType(LongType()))
    def fingerprints(content: pd.Series) -> pd.Series:
        return content.map(
            lambda t: winnow_fingerprints(t, k, w) if t else np.array([], np.int64)
        )

    return fingerprints


def substring_candidates(
    corpus: DataFrame,
    *,
    k: int = 32,
    w: int = 32,
    bucket_cap: int = 64,
    min_bytes: int = 100,
) -> DataFrame:
    """Candidate pairs sharing a winnowed fingerprint: (a_id, b_id, stage).

    Documents below ``min_bytes`` are excluded — tiny files share
    boilerplate k-grams and are already fully covered by the MinHash path.

    When the corpus already carries a precomputed ``fingerprints`` column
    (the fused signatures stage —
    ``functions.signatures.with_shingles_and_fingerprints``), this stage is
    pure JVM: explode + bucket joins, no Arrow pass over content at all.
    Short docs have empty precomputed arrays, so the explode reproduces the
    ``min_bytes`` filter exactly. The fused stage stamps its winnowing
    parameters into the column's metadata (which survives parquet
    checkpoints); the fast path verifies them against the requested
    (k, w, min_bytes) and raises on mismatch — a column merely *named*
    ``fingerprints`` but computed with different winnowing would silently
    yield wrong candidate pairs otherwise. Columns without metadata
    (hand-built inputs) get a warning instead of a hard failure.
    """
    if "fingerprints" in corpus.columns:
        meta = corpus.schema["fingerprints"].metadata or {}
        have = tuple(
            meta.get(key) for key in ("fp_k", "fp_w", "fp_min_bytes")
        )
        if all(v is not None for v in have):
            if tuple(int(v) for v in have) != (k, w, min_bytes):
                raise ValueError(
                    f"precomputed fingerprints were winnowed with "
                    f"(k, w, min_bytes)={tuple(int(v) for v in have)} but "
                    f"this stage was asked for {(k, w, min_bytes)}; "
                    f"recompute the signatures or align the config"
                )
        else:
            import warnings

            warnings.warn(
                "fingerprints column carries no winnowing-parameter "
                f"metadata; trusting it matches (k={k}, w={w}, "
                f"min_bytes={min_bytes})",
                stacklevel=2,
            )
        buckets = corpus.select(
            "file_id", F.explode("fingerprints").alias("bucket_key")
        )
    else:
        fp = make_fingerprint_udf(k, w)
        buckets = (
            corpus.where(F.col("n_bytes") >= min_bytes)
            .select("file_id", F.explode(fp("content")).alias("bucket_key"))
        )
    return pairs_from_buckets(buckets, bucket_cap).withColumn(
        "stage", F.lit("substring")
    )


def containment_pairs(
    docs: DataFrame,
    *,
    anchor_len: int = 64,
    min_len: int = 200,
    w: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact containment join: pairs (a, b) where a's full text appears
    verbatim inside b's (and a is strictly shorter).

    Candidate plan (winnowed, scale-safe): hosts emit only their
    **winnowed** k-gram fingerprints (the minimum hash of every
    ``w``-length k-gram window — ~2/w of all positions) and each needle
    emits the minimum hash of its FIRST ``w`` k-grams. Recall proof: if a
    is contained in b, a's k-gram sequence appears contiguously in b, so
    the host window exactly aligned with a's first ``w`` k-grams has the
    same minimum — the needle's anchor is always among the host's winnowed
    fingerprints. ``instr`` then verifies exactly, so the *output* equals
    the all-positions form (and the DuckDB oracle, which uses the naive
    every-position anchor join — different candidate plan, same perfect
    recall, same verified output) while shuffling ~w× fewer host rows:
    a 10 KB host emits ~600 fingerprints instead of ~10k anchors.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        F.length(text_col).alias("len"),
    )

    @F.pandas_udf(LongType())
    def needle_anchor(texts: pd.Series) -> pd.Series:
        # min hash of the first w k-grams — matches the host-side winnow
        # selection rule for the window aligned at the containment offset
        return pd.Series(
            [
                int(
                    _kgram_hashes(t.encode("utf-8", "ignore"), anchor_len)[:w]
                    .min()
                    .astype(np.int64)
                )
                for t in texts
            ],
            dtype="int64",
        )

    @F.pandas_udf(ArrayType(LongType()))
    def host_fingerprints(texts: pd.Series) -> pd.Series:
        # winnowed fingerprint set (numpy rolling hash + window minima);
        # the JVM per-position substring alternative is interpreted and
        # ~10x slower at corpus scale
        return texts.map(lambda t: winnow_fingerprints(t, anchor_len, w))

    needles = base.where(F.col("len") >= min_len).select(
        F.col("doc_id").alias("a_id"), needle_anchor("text").alias("anchor")
    )
    hosts = base.where(F.col("len") > min_len).select(
        F.col("doc_id").alias("b_id"),
        F.explode(host_fingerprints("text")).alias("anchor"),
    )
    cand = (
        needles.join(hosts, "anchor")
        .where(F.col("a_id") != F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    sides = cand.join(
        base.select(F.col("doc_id").alias("a_id"), F.col("text").alias("a_text"),
                    F.col("len").alias("a_len")),
        "a_id",
    ).join(
        base.select(F.col("doc_id").alias("b_id"), F.col("text").alias("b_text"),
                    F.col("len").alias("b_len")),
        "b_id",
    )
    return (
        sides.where(
            (F.col("a_len") < F.col("b_len"))
            & (F.expr("instr(b_text, a_text)") > 0)
        )
        .select("a_id", "b_id")
    )


def make_containment_udf(min_len: int = 100):
    """pandas UDF: partial containment ratio of the shorter side in the longer.

    100 when the shorter content appears verbatim in the longer; otherwise the
    byte-level longest-run heuristic is skipped and 0 is returned (candidates
    that merely share one fingerprint but no real containment).
    """

    @F.pandas_udf("int")
    def containment(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for s1, s2 in zip(a, b):
            if s1 is None or s2 is None:
                out.append(0)
                continue
            short, long_ = (s1, s2) if len(s1) <= len(s2) else (s2, s1)
            if len(short) < min_len:
                out.append(0)
            elif short in long_:
                out.append(100)
            else:
                out.append(0)
        return pd.Series(out, dtype="int32")

    return containment


def verify_substring_pairs(
    pairs: DataFrame,
    corpus: DataFrame,
    *,
    min_len: int = 100,
) -> DataFrame:
    """Keep candidate pairs where one side is verbatim-contained in the other.

    Schema-aligned with verify.verify_pairs output.
    """
    joined = attach_pair_sides(pairs, corpus, ["content"])
    udf = make_containment_udf(min_len)
    return (
        joined.withColumn("edit_ratio", udf("a_content", "b_content"))
        .where(F.col("edit_ratio") >= 100)
        .withColumns(
            {
                "jaccard": F.lit(None).cast("double"),
                "verified_by": F.lit("containment"),
            }
        )
        .select("a_id", "b_id", "stage", "jaccard", "edit_ratio", "verified_by")
    )
