"""Distributed fuzzy/regex pattern matching over a corpus table.

The reference's matcher layer (SURVEY.md §2.3 M1-M5) fans a labeled pattern
store out over one document at a time (reference:
``matcher/_phrasematcher.py:31-56``, ``pipeline/spaczzruler.py:571-581``).
The Spark form inverts it: the pattern store is a small broadcast list, the
corpus is the big side, and matching runs inside an Arrow-batched pandas UDF
that executes the same per-document kernels (``phrasesearch.match`` /
``regexsearch.regex_match``) — one narrow stage, no shuffle until
aggregation.

Output matches the reference's RulerResult shape: one row per match with
(doc id, label, token start/end, ratio, pattern, type) — plus the ruler's
conflict resolution:
- best-ratio dedup per (label, start, end)  (M4)
- greedy non-overlapping span assignment, longest-span-first  (M5)
"""

from __future__ import annotations

import json
import re
from collections import Counter
from dataclasses import dataclass, field
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

from ..phrasesearch import match as phrase_match
from ..regexsearch import regex_match
from ..similaritysearch import similarity_match
from ..tokenizer import tokenize
from ..tokensearch import token_spans

__all__ = [
    "Pattern",
    "match_patterns",
    "resolve_matches",
    "apply_callbacks",
    "ruler",
]


@dataclass(frozen=True)
class Pattern:
    """One labeled pattern (reference: ruler pattern dicts
    ``{label, pattern, type, kwargs, id}``)."""

    label: str
    pattern: str
    type: str = "fuzzy"  # fuzzy | regex
    kwargs: dict = field(default_factory=dict)
    id: str = ""


MATCH_SCHEMA = ArrayType(
    StructType(
        [
            StructField("label", StringType()),
            StructField("start", IntegerType()),
            StructField("end", IntegerType()),
            StructField("ratio", IntegerType()),
            StructField("pattern", StringType()),
            StructField("type", StringType()),
            StructField("ent_id", StringType()),
        ]
    )
)


# Fuzzy ratio functions for which the character-multiset screen below is a
# PROVEN upper bound (the pattern string enters the comparison verbatim and
# the denominator includes len(pattern), so ratio <= 200 * |multiset ∩| /
# len(pattern)). token_sort is screenable too — sorting is a permutation,
# so the compared pattern string sorted_join(p) has a FIXED multiset; the
# two whitespace wrinkles are handled explicitly: (1) the pattern side is
# measured on its sorted-join form (collapsing runs of whitespace can only
# SHORTEN it, so len(p) would over-divide and break the bound — we use
# len(sorted_join(p)) instead); (2) the window side's sorted-join turns
# every inter-token gap into one ' ', so the doc multiset is counted with
# all whitespace folded to ' ' (#tokens-1 <= #whitespace chars, hence
# folded doc counts still dominate the compared string's counts).
# Excluded: token_set/token/weighted (dedup can shorten the pattern side)
# and partial (it compares the SHORTER side against slices of the longer —
# when a window is shorter than the pattern the denominator is
# 2*len(window), not len(pattern)+len(window), and the bound is invalid;
# e.g. pattern "acetaminophen" vs doc "ace" scores partial 100 while the
# doc-level bound would prune it).
_SCREENABLE_FUNCS = {"simple", "quick", "levenshtein", "token_sort"}
_WS_RE = re.compile(r"\s")


@lru_cache(maxsize=4096)
def _pattern_doc(pattern: str):
    """Per-worker cache: tokenize each pattern once, not once per document."""
    return tokenize(pattern)


@lru_cache(maxsize=4096)
def _pattern_counter(
    pattern: str, lower: bool, sort_tokens: bool = False
) -> tuple[Counter, int]:
    s = pattern.lower() if lower else pattern
    if sort_tokens:
        s = " ".join(sorted(s.split()))
    return Counter(s), len(s)


def _screen_gate(kwargs: dict) -> int:
    """The weakest ratio gate any window must pass for this fuzzy pattern.

    The scan gate is min_r1 (given, else round(min_r/1.5)); parameter
    resolution can only RAISE it (flex=0 sets it to min_r2), so using the
    unresolved minimum keeps the screen lossless."""
    min_r = kwargs.get("min_r", 75)
    r1 = kwargs.get("min_r1")
    if r1 is None:
        r1 = round(min_r / 1.5)
    r2 = kwargs.get("min_r2")
    if r2 is None:
        r2 = min_r
    return max(min(r1, r2), 0)


def _run_patterns(
    text: str, patterns: list[Pattern], lexicon: dict | None = None
) -> list[tuple]:
    if not text:
        return []
    doc = tokenize(text)
    doc_counters: dict[tuple[bool, bool], Counter] = {}
    out = []
    seen = set()
    for p in patterns:
        if p.type == "fuzzy":
            # Lossless prefilter: any window w satisfies
            #   ratio(p, w) <= 200*LCS/(len_p+len_w) <= 200*I/len_p
            # where I is the character-multiset intersection of the pattern
            # with the WHOLE doc (LCS chars are common chars). If even that
            # bound misses the scan gate, no window can match — skip the
            # O(windows x kernel) scan entirely. Honest scope: because I is
            # doc-level it saturates on long same-script text; it prunes
            # when the pattern needs characters the doc simply lacks
            # (cross-script corpora, symbol-heavy entity lists) and costs
            # one Counter(text) per doc otherwise (~15% of kernel time).
            gate = _screen_gate(p.kwargs)
            func = p.kwargs.get("fuzzy_func", "simple")
            if gate > 0 and func in _SCREENABLE_FUNCS:
                ic = p.kwargs.get("ignore_case", True)
                sort_tokens = func == "token_sort"
                ckey = (ic, sort_tokens)
                if ckey not in doc_counters:
                    s = text.lower() if ic else text
                    if sort_tokens:
                        # fold all whitespace to ' ' so the counts dominate
                        # any window's sorted-join form (see _SCREENABLE_FUNCS)
                        s = _WS_RE.sub(" ", s)
                    doc_counters[ckey] = Counter(s)
                pc, plen = _pattern_counter(p.pattern, ic, sort_tokens)
                dc = doc_counters[ckey]
                inter = sum(min(n, dc.get(ch, 0)) for ch, n in pc.items())
                if plen and 200 * inter < gate * plen:
                    continue
            results = phrase_match(doc, _pattern_doc(p.pattern), **p.kwargs)
        elif p.type == "regex":
            results = regex_match(doc, p.pattern, **p.kwargs)
        elif p.type == "token":
            # pattern is the JSON-encoded token-dict list (ruler file shape)
            results = token_spans(doc, json.loads(p.pattern), **p.kwargs)
        elif p.type == "similarity":
            # pooled-vector cosine matching against the broadcast lexicon
            # (reference: matcher/similaritymatcher.py)
            results = similarity_match(doc, p.pattern, lexicon or {}, **p.kwargs)
        else:
            raise ValueError(f"unknown pattern type {p.type!r}")
        for start, end, ratio in results:
            key = (p.label, start, end, ratio, p.pattern)
            if key in seen:  # M1 set-union semantics
                continue
            seen.add(key)
            out.append((p.label, start, end, ratio, p.pattern, p.type, p.id))
    # M1 global sort: ascending start, then descending length/ratio/pattern
    out.sort(key=lambda m: (m[1], -(m[2] - m[1]), -m[3], m[4]), reverse=False)
    return out


def _best_then_greedy(rows: list[tuple]) -> list[tuple]:
    """M4 + M5 on one document's match tuples
    (label, start, end, ratio, pattern, type, ent_id), in pure Python.

    1. per (label, start, end): keep the max-ratio entry (ties: type asc,
       then pattern/ent_id asc — a deterministic refinement of the window
       form's row_number, which leaves deep ties arbitrary).
    2. greedy non-overlap ordered by (length desc, start asc, ratio desc),
       stable over the M1 input order (reference:
       ``spaczzruler.py:571-581,640-674``).

    This is the fused form of :func:`resolve_matches` used by
    :func:`ruler` — per doc the match list is tiny, so resolving inside
    the SAME pandas UDF that produced the matches costs ~nothing and
    removes an entire shuffle + grouped-pandas stage from the plan.
    """
    best: dict[tuple, tuple] = {}
    for m in rows:
        key = (m[0], m[1], m[2])
        cur = best.get(key)
        if cur is None or (-m[3], m[5], m[4], m[6]) < (-cur[3], cur[5], cur[4], cur[6]):
            best[key] = m
    ordered = sorted(
        best.values(), key=lambda m: (-(m[2] - m[1]), m[1], -m[3])
    )
    kept: list[tuple] = []
    occupied: list[tuple[int, int]] = []
    for m in ordered:
        if any(m[1] < e and s < m[2] for s, e in occupied):
            continue
        occupied.append((m[1], m[2]))
        kept.append(m)
    return kept


def match_patterns(
    docs: DataFrame,
    patterns: list[Pattern],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lexicon: dict | None = None,
    resolve: bool = False,
) -> DataFrame:
    """All pattern matches over a document table.

    Output: (doc_id, label, start, end, ratio, pattern, type, ent_id) —
    token-index spans, reference ordering within each doc.

    ``lexicon`` (token -> vector) is required by ``type="similarity"``
    patterns; it is shipped once per executor via a Spark broadcast, not
    per task.

    ``resolve=True`` additionally applies the ruler's M4/M5 conflict
    resolution (:func:`_best_then_greedy`) per document INSIDE the same
    UDF — the whole ruler becomes one narrow stage with no shuffle.
    """
    plist = list(patterns)
    bc_lex = (
        docs.sparkSession.sparkContext.broadcast(lexicon)
        if lexicon is not None
        else None
    )

    @F.pandas_udf(MATCH_SCHEMA)
    def run(texts: pd.Series) -> pd.Series:
        lex = bc_lex.value if bc_lex is not None else None
        if resolve:
            return texts.map(
                lambda t: _best_then_greedy(_run_patterns(t, plist, lex))
            )
        return texts.map(lambda t: _run_patterns(t, plist, lex))

    return (
        docs.select(
            F.col(id_col).alias("doc_id"), F.explode(run(text_col)).alias("m")
        )
        .select("doc_id", "m.*")
    )


def resolve_matches(matches: DataFrame, *, n_buckets: int = 256) -> DataFrame:
    """The ruler's conflict resolution (M4 + M5) over an arbitrary match
    table.

    1. per (doc, label, start, end): keep the max-ratio entry
    2. greedy non-overlap: order spans by (length desc, start asc, ratio
       desc) and keep each span iff it does not overlap a previously kept
       span (reference: ``spaczzruler.py:571-581,640-674``).

    Step 2 is sequential per document, but grouping the grouped-pandas
    stage by *document* would pay per-group Arrow/pandas overhead once per
    doc (~ms each — the dominant cost on corpora of small docs, and AQE
    happily coalesces the tiny shuffle to one partition, serializing it).
    Instead the stage groups by a hash BUCKET of the doc id (``n_buckets``
    groups) and loops the per-doc resolution in plain Python inside each
    bucket — same output, amortized overhead.

    :func:`ruler` skips this operator entirely: it resolves inside the
    matcher UDF (:func:`_best_then_greedy`) before the explode, so the
    standalone form only pays off for externally-supplied match tables.
    """
    cols = [
        "doc_id", "label", "start", "end", "ratio", "pattern", "type", "ent_id"
    ]
    out_schema = StructType(
        [
            StructField("doc_id", matches.schema["doc_id"].dataType),
            StructField("label", StringType()),
            StructField("start", IntegerType()),
            StructField("end", IntegerType()),
            StructField("ratio", IntegerType()),
            StructField("pattern", StringType()),
            StructField("type", StringType()),
            StructField("ent_id", StringType()),
        ]
    )

    def resolve_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        kept_rows: list[tuple] = []
        by_doc: dict = {}
        for row in pdf.itertuples(index=False):
            by_doc.setdefault(row.doc_id, []).append(
                (row.label, row.start, row.end, row.ratio, row.pattern,
                 row.type, row.ent_id)
            )
        for doc_id, rows in by_doc.items():
            for m in _best_then_greedy(rows):
                kept_rows.append((doc_id, *m))
        return pd.DataFrame(kept_rows, columns=cols)

    bucketed = matches.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(n_buckets))
    )
    return bucketed.groupBy("_bucket").applyInPandas(
        lambda pdf: resolve_bucket(pdf), out_schema
    )


def apply_callbacks(
    matches: DataFrame, callbacks: dict[str, object]
) -> DataFrame:
    """Run per-label ``on_match`` callbacks over the resolved match table.

    Spark analog of the reference's callback hook (reference:
    ``matcher/_phrasematcher.py:56-66`` — ``on_match(matcher, doc, i,
    matches)`` invoked per match): at corpus scale there is no mutable Doc,
    so the callback is a pure function ``on_match(label, doc_id, match
    dicts) -> match dicts | None`` applied per (doc, label) group inside a
    grouped-pandas stage (None keeps the group unchanged; returning a list
    replaces it — matches can be re-scored, re-labeled, or dropped).
    """
    cbs = {k: v for k, v in callbacks.items() if v is not None}
    if not cbs:
        return matches
    schema = matches.schema
    cols = [f.name for f in schema.fields]

    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        out_frames = []
        for label, grp in pdf.groupby("label", sort=False):
            cb = cbs.get(label)
            if cb is None:
                out_frames.append(grp)
                continue
            doc_id = grp["doc_id"].iloc[0]
            replaced = cb(label, doc_id, grp.to_dict("records"))
            if replaced is None:
                out_frames.append(grp)
            elif len(replaced):
                out_frames.append(pd.DataFrame(replaced)[cols])
        if not out_frames:
            return pd.DataFrame(columns=cols)
        return pd.concat(out_frames, ignore_index=True)[cols]

    return matches.groupBy("doc_id").applyInPandas(run_group, schema)


def ruler(
    docs: DataFrame,
    patterns: list[Pattern],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lexicon: dict | None = None,
    callbacks: dict[str, object] | None = None,
) -> DataFrame:
    """match_patterns + conflict resolution (+ optional on_match
    callbacks): the SpaczzRuler as one operator.

    Resolution is fused into the matcher UDF (``resolve=True``) — the plan
    is a single narrow Arrow stage per doc partition; no shuffle happens
    unless ``callbacks`` force the grouped-pandas callback stage."""
    resolved = match_patterns(
        docs, patterns, id_col=id_col, text_col=text_col, lexicon=lexicon,
        resolve=True,
    )
    return apply_callbacks(resolved, callbacks or {})
