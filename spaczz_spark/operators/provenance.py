"""Token-level match provenance — the custom-attribute analog (M9 fine
grain).

The reference decorates tokens with ``spaczz_token`` / ``spaczz_type`` /
``spaczz_ratio`` extensions and derives span/doc getters from them with an
all-equal-else-None rule (reference: ``customattrs.py:60-116``:
``get_span_type`` / ``get_ratio`` / ``get_pattern`` return the common value
iff every token agrees, ``get_spaczz_ent`` = all tokens matched,
``get_spaczz_doc`` = any token matched, ``get_doc_types`` = the set of
types). The table analog:

- :func:`token_provenance` — one row per (doc, token index) covered by a
  resolved match, carrying that match's label/type/ratio/pattern.
- :func:`span_provenance` — the span getters over an arbitrary span table:
  ``spaczz_ent`` (all tokens covered), ``spaczz_type``/``spaczz_ratio``/
  ``spaczz_pattern`` (all-equal-else-NULL), ``spaczz_types`` (distinct set).
- :func:`doc_provenance` — the doc getters (any-token flag + type set).

All pure JVM expressions: sequence/explode + grouped conditional
aggregates; no Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["token_provenance", "span_provenance", "doc_provenance"]


def token_provenance(matches: DataFrame) -> DataFrame:
    """Explode resolved matches to per-token rows.

    Input: the resolved match table (doc_id, label, start, end, ratio,
    pattern, type, ...). Output: (doc_id, token_i, label, type, ratio,
    pattern) — one row per covered token. Resolved matches never overlap
    (M5), so each token carries at most one row.
    """
    return matches.select(
        "doc_id",
        F.explode(F.sequence(F.col("start"), F.col("end") - 1)).alias("token_i"),
        "label",
        "type",
        "ratio",
        "pattern",
    )


def _all_equal_else_null(col: str):
    # reference _all_equal: one distinct non-null value and no nulls mixed in
    return F.when(
        (F.count_distinct(F.col(col)) == 1)
        & (F.count(F.col(col)) == F.count(F.lit(1))),
        F.min(F.col(col)),
    )


def span_provenance(token_prov: DataFrame, spans: DataFrame) -> DataFrame:
    """Span getters over (doc_id, span_start, span_end) rows.

    Returns one row per input span with:
    - ``spaczz_ent``     every token in [span_start, span_end) is covered
    - ``spaczz_type`` / ``spaczz_ratio`` / ``spaczz_pattern``  the common
      value iff all covered tokens agree AND the span is fully covered,
      else NULL (the reference getter sees default-None tokens, so any
      uncovered token breaks equality)
    - ``spaczz_types``   distinct types over covered tokens (set getter)
    """
    s = spans.select(
        "doc_id",
        F.col("span_start").cast("int").alias("span_start"),
        F.col("span_end").cast("int").alias("span_end"),
    ).withColumn("span_len", F.col("span_end") - F.col("span_start"))
    joined = s.join(
        token_prov,
        (s["doc_id"] == token_prov["doc_id"])
        & (token_prov["token_i"] >= s["span_start"])
        & (token_prov["token_i"] < s["span_end"]),
        "left",
    ).select(
        s["doc_id"], "span_start", "span_end", "span_len",
        "token_i", "label", "type", "ratio", "pattern",
    )
    grouped = joined.groupBy("doc_id", "span_start", "span_end", "span_len").agg(
        F.count("token_i").alias("_covered"),
        _all_equal_else_null("type").alias("_type"),
        _all_equal_else_null("ratio").alias("_ratio"),
        _all_equal_else_null("pattern").alias("_pattern"),
        F.sort_array(F.collect_set("type")).alias("spaczz_types"),
    )
    fully = F.col("_covered") == F.col("span_len")
    return grouped.select(
        "doc_id", "span_start", "span_end",
        fully.alias("spaczz_ent"),
        F.when(fully, F.col("_type")).alias("spaczz_type"),
        F.when(fully, F.col("_ratio")).alias("spaczz_ratio"),
        F.when(fully, F.col("_pattern")).alias("spaczz_pattern"),
        "spaczz_types",
    )


def doc_provenance(token_prov: DataFrame, docs: DataFrame,
                   id_col: str = "doc_id") -> DataFrame:
    """Doc getters: spaczz_doc (any matched token) + spaczz_types (set)."""
    agg = token_prov.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sort_array(F.collect_set("type")).alias("spaczz_types"),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("_n") > 0, F.lit(False)).alias("spaczz_doc"),
            F.coalesce(
                "spaczz_types", F.array().cast("array<string>")
            ).alias("spaczz_types"),
        )
    )
