"""Ruler pattern store CRUD + serialization round-trips (M2, M7)."""

import pytest

from spaczz_spark.ruler import SpaczzRuler

ENTRIES = [
    {"label": "NAME", "pattern": "grant andersen", "type": "fuzzy",
     "kwargs": {"min_r": 75}, "id": "name-1"},
    {"label": "GPE", "pattern": r"(usa){d<=1}", "type": "regex"},
    {"label": "DRUG", "type": "token",
     "pattern": [{"TEXT": {"FUZZY": "zithromax"}}, {"POS": "CCONJ"},
                  {"TEXT": {"FREGEX": "(advair){e<=1}"}}]},
]


def test_crud():
    r = SpaczzRuler()
    r.add_patterns(ENTRIES)
    assert len(r) == 3
    assert r.labels == ["NAME", "GPE", "DRUG"]
    assert "GPE" in r
    assert r.remove("GPE") == 1
    assert "GPE" not in r
    with pytest.raises(ValueError):
        r.remove("GPE")
    with pytest.raises(ValueError):
        r.add_patterns([{"label": "X", "pattern": "y", "type": "nope"}])


def test_patterns_round_trip_shape():
    r = SpaczzRuler()
    r.add_patterns(ENTRIES)
    pats = r.patterns
    assert pats[0]["kwargs"] == {"min_r": 75} and pats[0]["id"] == "name-1"
    assert isinstance(pats[2]["pattern"], list)  # token pattern decoded


def test_disk_round_trip(tmp_path):
    r = SpaczzRuler(defaults={"overwrite": False})
    r.add_patterns(ENTRIES)
    r.to_disk(str(tmp_path / "ruler"))
    r2 = SpaczzRuler.from_disk(str(tmp_path / "ruler"))
    assert r2.patterns == r.patterns
    assert r2.defaults == {"overwrite": False}


def test_bytes_round_trip():
    r = SpaczzRuler()
    r.add_patterns(ENTRIES)
    r2 = SpaczzRuler.from_bytes(r.to_bytes())
    assert r2.patterns == r.patterns


def test_apply_runs_all_three_types(spark):
    docs = spark.createDataFrame(
        [(1, "Grant Andersen took zithramax and advar in the USA")],
        ["doc_id", "text"],
    )
    r = SpaczzRuler()
    r.add_patterns(ENTRIES)
    out = r.apply(docs).collect()
    types = {row["type"] for row in out}
    assert {"fuzzy", "token"} <= types
    labels = {row["label"] for row in out}
    assert "NAME" in labels and "DRUG" in labels


def test_similarity_searcher_golden():
    """Mirror of reference test_similaritymatcher expectations (reference:
    matcher/similaritymatcher.py docstring example — 'I like apples.' with
    pattern 'fruit' at min_r 60 -> ('FRUIT', 2, 3, 70)): ratio is
    round(cosine(pooled vectors) * 100)."""
    import math

    from spaczz_spark.similaritysearch import similarity_compare, similarity_match

    lexicon = {
        "fruit": [1.0, 0.0],
        "apples": [0.7, math.sqrt(1 - 0.49)],  # cos(apples, fruit) = 0.7
    }
    assert similarity_compare("apples", "fruit", lexicon) == 70
    assert similarity_compare("like apples", "fruit", lexicon) == 70  # pooling
    assert similarity_compare("nothing here", "fruit", lexicon) == 0  # no vectors
    got = similarity_match("I like apples.", "fruit", lexicon, min_r=60)
    assert got == [(2, 3, 70)]
    assert similarity_match("I like apples.", "fruit", lexicon, min_r=75) == []


def test_similarity_ruler_distributed(spark):
    import math

    r = SpaczzRuler()
    r.add("FRUIT", ["fruit"], [{"min_r": 60}], type="similarity")
    docs = spark.createDataFrame(
        [(1, "I like apples."), (2, "pure garbage tokens")],
        ["doc_id", "text"],
    )
    lexicon = {"fruit": [1.0, 0.0], "apples": [0.7, math.sqrt(1 - 0.49)]}
    out = r.apply(docs, lexicon=lexicon).collect()
    assert [(x["doc_id"], x["label"], x["start"], x["end"], x["ratio"])
            for x in out] == [(1, "FRUIT", 2, 3, 70)]


def test_add_kwargs_zip_padding_warnings():
    """Reference contract (matcher/_phrasematcher.py:119-135): kwargs list
    shorter than patterns warns + pads; longer warns + truncates."""
    import pytest as _pytest

    from spaczz_spark.ruler import KwargsWarning

    r = SpaczzRuler()
    with _pytest.warns(KwargsWarning):
        r.add("A", ["one", "two"], [{"min_r": 90}])
    assert len(r) == 2
    assert r.patterns[0]["kwargs"] == {"min_r": 90}
    assert "kwargs" not in r.patterns[1]  # padded default = {}

    r2 = SpaczzRuler()
    with _pytest.warns(KwargsWarning):
        r2.add("B", ["one"], [{"min_r": 90}, {"min_r": 50}])
    assert len(r2) == 1
    assert r2.patterns[0]["kwargs"] == {"min_r": 90}

    with _pytest.raises(TypeError):
        r2.add("C", "not-a-list")
    with _pytest.raises(TypeError):
        r2.add("D", ["x"], ["not-a-dict"])


def test_on_match_callback(spark):
    """Per-label on_match callbacks run post-resolution and may re-label,
    re-score, or drop matches (pure function — the scale analog of the
    reference's mutate-the-Doc callback)."""

    def boost(label, doc_id, matches):
        return [{**m, "ratio": 100, "ent_id": "boosted"} for m in matches]

    def drop(label, doc_id, matches):
        return []

    r = SpaczzRuler()
    r.add("NAME", ["grant andersen"], [{"min_r": 75}], on_match=boost)
    r.add("GONE", ["acme corp"], [{"min_r": 75}], on_match=drop)
    docs = spark.createDataFrame(
        [(1, "grint anderson works at acme corp.")], ["doc_id", "text"]
    )
    rows = r.apply(docs).collect()
    assert len(rows) == 1  # GONE matched but its callback dropped it
    assert rows[0]["label"] == "NAME"
    assert rows[0]["ratio"] == 100 and rows[0]["ent_id"] == "boosted"
    # removing the label also removes its callback
    r.remove("GONE")
    assert "GONE" not in r


def test_token_and_span_provenance(spark):
    """Reference customattrs parity (customattrs.py:60-116): span getters
    return the common value iff all tokens agree (else None), spaczz_ent
    iff every span token is covered, doc getter = any covered token."""
    from spaczz_spark.operators.matcher import Pattern, ruler
    from spaczz_spark.operators.provenance import (
        doc_provenance,
        span_provenance,
        token_provenance,
    )

    docs = spark.createDataFrame(
        [(1, "grint anderson works at acme corp."), (2, "nothing to see")],
        ["doc_id", "text"],
    )
    pats = [
        Pattern("NAME", "grant andersen", "fuzzy", {"min_r": 75}),
        Pattern("ORG", "acme corp", "fuzzy", {"min_r": 85}),
    ]
    matches = ruler(docs, pats)
    tok = token_provenance(matches)
    tok_rows = {(r["doc_id"], r["token_i"]): r for r in tok.collect()}
    assert (1, 0) in tok_rows and tok_rows[(1, 0)]["label"] == "NAME"
    assert (1, 4) in tok_rows and tok_rows[(1, 4)]["label"] == "ORG"
    assert (1, 2) not in tok_rows  # "works" is unmatched

    spans = spark.createDataFrame(
        [
            (1, 0, 2),   # exactly the NAME span -> all getters agree
            (1, 0, 3),   # NAME + unmatched token -> ent False, attrs None
            (1, 3, 6),   # "at acme corp" -> partially covered
            (1, 0, 6),   # NAME + ORG tokens + gaps -> types set has both
            (2, 0, 2),   # uncovered doc
        ],
        ["doc_id", "span_start", "span_end"],
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"]): r
        for r in span_provenance(tok, spans).collect()
    }
    exact = got[(1, 0, 2)]
    assert exact["spaczz_ent"] is True
    assert exact["spaczz_type"] == "fuzzy" and exact["spaczz_ratio"] is not None
    over = got[(1, 0, 3)]
    assert over["spaczz_ent"] is False and over["spaczz_type"] is None
    assert got[(1, 3, 6)]["spaczz_ent"] is False
    assert got[(1, 0, 6)]["spaczz_types"] == ["fuzzy"]
    empty = got[(2, 0, 2)]
    assert empty["spaczz_ent"] is False and empty["spaczz_types"] == []

    doc_rows = {r["doc_id"]: r for r in doc_provenance(tok, docs).collect()}
    assert doc_rows[1]["spaczz_doc"] is True
    assert doc_rows[1]["spaczz_types"] == ["fuzzy"]
    assert doc_rows[2]["spaczz_doc"] is False and doc_rows[2]["spaczz_types"] == []


def test_resolve_matches_parity_with_fused_ruler(spark):
    """Round-4 advice: the standalone bucketed `resolve_matches` operator
    (public API for externally-supplied match tables) must reproduce the
    fused `ruler()` resolution exactly — including docs with zero matches,
    overlapping cross-label spans, and a single doc spread across many
    hash buckets (n_buckets >> docs)."""
    from spaczz_spark.operators.matcher import (
        Pattern,
        match_patterns,
        resolve_matches,
        ruler,
    )

    docs = spark.createDataFrame(
        [
            (1, "grint anderson works at acme corp."),
            (2, "nothing to see"),
            (3, "acme corp acme corp grant andersen big table"),
            (4, ""),
            (5, "grant andersen grant anderson grint andersen"),
        ],
        ["doc_id", "text"],
    )
    pats = [
        Pattern("NAME", "grant andersen", "fuzzy", {"min_r": 75}),
        Pattern("ORG", "acme corp", "fuzzy", {"min_r": 85}),
        # overlaps NAME on doc 3/5 -> greedy non-overlap must arbitrate
        Pattern("PERSON", "andersen", "fuzzy", {"min_r": 75}),
        Pattern("BIGTABLE", "big table", "regex", {}),
    ]

    def rows(df):
        return sorted(
            (r["doc_id"], r["label"], r["start"], r["end"], r["ratio"],
             r["pattern"], r["type"], r["ent_id"])
            for r in df.collect()
        )

    fused = rows(ruler(docs, pats))
    raw = match_patterns(docs, pats)
    standalone = rows(resolve_matches(raw))
    assert standalone == fused and len(fused) > 0
    # single-doc-many-buckets: every match of doc 3 hashes to ONE bucket,
    # but n_buckets larger than the corpus must not duplicate or drop rows
    one_doc = docs.where("doc_id = 3")
    assert rows(resolve_matches(match_patterns(one_doc, pats),
                                n_buckets=1024)) == rows(ruler(one_doc, pats))
    # empty match table resolves to an empty table with the right schema
    empty = match_patterns(docs.where("doc_id = 2"), pats)
    resolved_empty = resolve_matches(empty)
    assert resolved_empty.count() == 0
    assert [f.name for f in resolved_empty.schema.fields] == [
        "doc_id", "label", "start", "end", "ratio", "pattern", "type",
        "ent_id",
    ]
