"""Exact verification of candidate pairs (SURVEY.md §2.2 P2 analog).

Mirrors the reference's optimize/verify phase (reference:
``_search/phrasesearcher.py:79-177``): every LSH candidate is re-scored with
exact measures and gated by ``min_r2`` / ``jaccard_min``; the ``thresh``
skip ("already good enough -> don't optimize", ``phrasesearcher.py:120``)
becomes the sha256 fast path — byte-identical contents short-circuit to
ratio 100 without touching the Python kernel.

Measures per pair:
- ``jaccard``      exact Jaccard of the hashed shingle sets — pure JVM
  (``array_intersect``/``array_union``), whole-stage codegen, no Python.
- ``edit_ratio``   the reference's InDel similarity (S1), computed in an
  Arrow-batched pandas UDF with the bit-parallel LCS kernel. Because the
  kernel is O(len²/64) it is only invoked for pairs that pass a cheap
  Jaccard floor; everything else is decided by Jaccard alone. Long files
  fall back to token-level InDel (documented, deterministic).

A pair is verified when ``jaccard >= jaccard_min`` OR
``edit_ratio >= min_r2`` (the reference's `min_r2` default 75 with
`min_r=75`; ``phrasesearcher.py:290-297``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ratios import indel_ratio, levenshtein_ratio

__all__ = [
    "make_edit_ratio_udf",
    "attach_pair_sides",
    "score_pairs_slim",
    "decided_pairs",
    "kernel_pairs",
    "verify_pairs",
]

# Above this many characters the char-level InDel kernel switches to
# token-level (whitespace tokens) — same family of measure, bounded cost.
CHAR_KERNEL_MAX = 8192

# Operating bound of the char-level Levenshtein kernel. The numpy row DP is
# exact but quadratic, and unlike the InDel path the length-gap prefilter
# cannot save two SIMILAR-length huge files — so above this many characters
# the kernel switches to token-level Levenshtein (whitespace tokens, same
# integer ratio formula, numpy-coded rows) to bound per-pair cost, mirroring
# the InDel fallback. The bound sits above every committed oracle fixture's
# max content length (files_small max 13,070 — asserted at fixture-gen time
# in scripts/make_fixtures.py), so the DuckDB `levenshtein()` mirror in the
# oracle SQL is exercised only where the char kernel runs; at 32 KiB the
# worst-case numpy DP is ~1e9 cell ops (~1-2 s), the documented ceiling.
LEV_CHAR_KERNEL_MAX = 32768


def make_edit_ratio_udf(min_r: int = 0, func: str = "indel"):
    """pandas UDF (string, string) -> int edit ratio, reference rounding.

    ``func`` picks the kernel:

    - ``"indel"`` (default) — the reference's InDel similarity (S1,
      reference ``registry/fuzzyfuncs.py:9``); above ``CHAR_KERNEL_MAX``
      chars it falls back to token-level InDel (bounded cost, same family).
    - ``"levenshtein"`` — plain unit-cost Levenshtein as an integer
      percentage (``ratios.levenshtein_ratio``): the one kernel every
      ANSI-SQL engine mirrors bit-for-bit, which is what makes the full
      pipeline DuckDB-oracle-checkable. No token fallback (the numpy row
      DP keeps multi-KB pairs fast); instead, pairs whose *length gap
      alone* already caps the ratio below ``min_r`` short-circuit to 0
      without running the DP (d >= |len1 - len2| is an exact lower bound,
      so the cap (200*(m-|Δ|)+m)//(2m) is provable — mirrored as a plain
      integer predicate in the SQL oracle).
    """
    if func not in ("indel", "levenshtein"):
        raise ValueError(f"unknown edit-ratio kernel {func!r}")

    @F.pandas_udf("int")
    def edit_ratio(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for s1, s2 in zip(a, b):
            if s1 is None or s2 is None:
                out.append(0)
                continue
            if func == "levenshtein":
                if max(len(s1), len(s2)) > LEV_CHAR_KERNEL_MAX:
                    # ADVICE r4: two similar-length multi-100KB files defeat
                    # the length-gap prefilter and the quadratic DP stalls a
                    # task — switch to whitespace tokens (same integer
                    # formula over token edits, numpy-coded rows)
                    t1, t2 = s1.split(), s2.split()
                    m = max(len(t1), len(t2))
                    gap = abs(len(t1) - len(t2))
                    if m and min_r and (200 * (m - gap) + m) // (2 * m) < min_r:
                        out.append(0)
                        continue
                    r = levenshtein_ratio(t1, t2, score_cutoff=min_r)
                else:
                    m = max(len(s1), len(s2))
                    gap = abs(len(s1) - len(s2))
                    if m and min_r and (200 * (m - gap) + m) // (2 * m) < min_r:
                        out.append(0)
                        continue
                    r = levenshtein_ratio(s1, s2, score_cutoff=min_r)
            else:
                if max(len(s1), len(s2)) > CHAR_KERNEL_MAX:
                    t1, t2 = s1.split(), s2.split()
                else:
                    t1, t2 = s1, s2
                # provable O(1) skip: LCS <= min(l1, l2), so
                # ratio = 200*LCS/(l1+l2) <= 200*min/(l1+l2); pairs with a
                # big length disparity (substring-family candidates in the
                # jaccard band) can never reach the cutoff — don't run the
                # O(len^2/64) kernel on them
                l1, l2 = len(t1), len(t2)
                if min_r and 200 * min(l1, l2) < min_r * (l1 + l2):
                    out.append(0)
                    continue
                r = indel_ratio(t1, t2, score_cutoff=min_r)
            out.append(round(r))
        return pd.Series(out, dtype="int32")

    # The kernel IS deterministic; the marker only removes the optimizer's
    # freedom to duplicate the expression — without it, a filter + a
    # projection both referencing the column each get their own
    # ArrowEvalPython and the O(len²/64) kernel runs TWICE per pair
    # (observed in the plan audit).
    return edit_ratio.asNondeterministic()


def attach_pair_sides(
    pairs: DataFrame, corpus: DataFrame, cols: list[str]
) -> DataFrame:
    """Join per-file columns onto both sides of an (a_id, b_id) pair table.

    Two hash joins on file_id; at scale the corpus side is pre-bucketed by
    file_id so both joins co-locate (see plans.pipeline for the
    repartition strategy).
    """
    a_side = corpus.select(
        F.col("file_id").alias("a_id"), *[F.col(c).alias(f"a_{c}") for c in cols]
    )
    b_side = corpus.select(
        F.col("file_id").alias("b_id"), *[F.col(c).alias(f"b_{c}") for c in cols]
    )
    return pairs.join(a_side, "a_id").join(b_side, "b_id")


def verify_pairs(
    pairs: DataFrame,
    corpus: DataFrame,
    *,
    min_r2: int = 75,
    jaccard_min: float = 0.7,
    jaccard_floor: float = 0.2,
    ratio_func: str = "indel",
    content_df: DataFrame | None = None,
) -> DataFrame:
    """Exactly score candidate pairs and keep the verified ones.

    Returns (a_id, b_id, stage, jaccard, edit_ratio, verified_by) where
    verified_by in ('sha', 'jaccard', 'edit_ratio').

    ``corpus`` must carry (file_id, content, content_sha256, shingles,
    n_shingles) — the shingle arrays must be distinct-element (the
    signature UDFs guarantee this), which is what lets the union size be
    computed arithmetically instead of via a second hash-set pass.

    Two-phase plan (the verify join is the pipeline's widest shuffle, and
    its scaling is bounded by bytes-in-flight, not CPU):

    1. **slim phase** — the pair sides join only (sha256, shingles); sha
       equality and exact Jaccard decide most pairs without ``content``
       ever crossing an exchange. The slim scored table is localCheckpointed
       once so the two consumers below don't re-evaluate the join (at
       warehouse scale this intermediate would be a catalog checkpoint).
    2. **kernel phase** — only pairs in the ``[jaccard_floor, jaccard_min)``
       band (plus empty-shingle pairs: token-free files share the sentinel
       MinHash, and their 0/0 Jaccard is defined as 0.0 rather than an ANSI
       abort) join ``content`` and enter the Arrow InDel kernel — typically
       a small fraction of candidates, so the wide payload and the Python
       boundary both shrink by that factor.

    ``content_df`` optionally names a separate (file_id, content) source
    for the kernel phase — the pipeline passes its ``normalized`` table so
    the signatures checkpoint does not have to carry (write + re-read) a
    second copy of the corpus text.
    """
    scored = score_pairs_slim(
        pairs, corpus, jaccard_min=jaccard_min, jaccard_floor=jaccard_floor
    )
    return decided_pairs(scored, jaccard_min=jaccard_min).unionByName(
        kernel_pairs(
            scored, content_df if content_df is not None else corpus,
            min_r2=min_r2, ratio_func=ratio_func,
        )
    )


def score_pairs_slim(
    pairs: DataFrame,
    corpus: DataFrame,
    *,
    jaccard_min: float = 0.7,
    jaccard_floor: float = 0.2,
) -> DataFrame:
    """Slim phase: sha + Jaccard scoring with no ``content`` in flight.

    Returns the localCheckpointed (a_id, b_id, stage, jaccard, sha_eq,
    kernel_band) table both downstream passes consume. Factored out of
    :func:`verify_pairs` so ``scripts/profile_verify.py`` times the exact
    production plan instead of an inline re-implementation (ADVICE r4).
    """
    slim = attach_pair_sides(
        pairs, corpus, ["content_sha256", "n_shingles", "shingles"]
    )

    sha_eq = F.col("a_content_sha256") == F.col("b_content_sha256")
    # The shingle arrays are DISTINCT by construction (np.unique in the
    # signature UDF), so |A ∪ B| = |A| + |B| - |A ∩ B| in plain integer
    # arithmetic — ONE hash-set pass per pair instead of three
    # (array_union is itself a hash build, and the branched expression
    # evaluated it twice). Same exact ints -> bit-identical jaccard
    # doubles, but the slim phase's dominant boxing/allocation cost halves
    # (measured 30s -> 16s at local[1] on the 140k-row profile corpus).
    inter_sz = F.size(F.array_intersect("a_shingles", "b_shingles"))
    union_sz = F.col("a_n_shingles") + F.col("b_n_shingles") - F.col("isz")
    return (
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
            & (F.col("jaccard") < jaccard_min)
            & ((F.col("jaccard") >= jaccard_floor) | (union_sz == 0)),
        )
        .select("a_id", "b_id", "stage", "jaccard", "sha_eq", "kernel_band")
        # LAZY checkpoint (r7): both consumers (decided_pairs,
        # kernel_pairs) still evaluate the slim join exactly once — the
        # checkpointed RDD is persisted on first computation and the
        # second consumer reads the stored blocks — but the
        # materialization now happens INSIDE the verify stage's single
        # write job, where the decided/kernel/substring branches overlap
        # (guide §2.6), instead of as a separate serial job up front.
        .localCheckpoint(eager=False)
    )


def decided_pairs(scored: DataFrame, *, jaccard_min: float = 0.7) -> DataFrame:
    """Pairs the slim phase already decided (sha equality or high Jaccard)."""
    return scored.where(
        F.col("sha_eq") | (F.col("jaccard") >= jaccard_min)
    ).select(
        "a_id",
        "b_id",
        "stage",
        "jaccard",
        F.when(F.col("sha_eq"), F.lit(100)).cast("int").alias("edit_ratio"),
        F.when(F.col("sha_eq"), F.lit("sha")).otherwise("jaccard")
        .alias("verified_by"),
    )


def kernel_pairs(
    scored: DataFrame,
    corpus: DataFrame,
    *,
    min_r2: int = 75,
    ratio_func: str = "indel",
) -> DataFrame:
    """Kernel phase: the undecided band joins ``content`` and runs the
    Arrow edit-ratio kernel."""
    # min_r2 - 1 is the kernel's score_cutoff: every row the post-round
    # filter below could keep still comes back exact (a raw 74.6 rounds UP
    # to 75, so cutting at 75 would wrongly zero it — cutting at 74 cannot),
    # while sub-cutoff rows short-circuit (indel: rapidfuzz cutoff
    # semantics; levenshtein: the length-gap bound skips the DP entirely)
    edit_udf = make_edit_ratio_udf(max(min_r2 - 1, 0), func=ratio_func)
    band = attach_pair_sides(
        scored.where(F.col("kernel_band")).select(
            "a_id", "b_id", "stage", "jaccard"
        ),
        corpus,
        ["content"],
    )
    # The content join leaves the band partitioned by its join key, so
    # pairs sharing one big host file pile into the same partition — and
    # per-pair kernel cost varies ~quadratically with length, so that one
    # partition becomes the straggler that caps the stage's core scaling.
    # A round-robin repartition spreads the heavy pairs evenly; the shuffle
    # moves only the band subset (a small fraction of candidates).
    sc = band.sparkSession.sparkContext
    band = band.repartition(sc.defaultParallelism * 4)
    return (
        band.withColumn("edit_ratio", edit_udf("a_content", "b_content"))
        .where(F.col("edit_ratio") >= min_r2)
        .select(
            "a_id", "b_id", "stage", "jaccard", "edit_ratio",
            F.lit("edit_ratio").alias("verified_by"),
        )
    )
