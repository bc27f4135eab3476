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
