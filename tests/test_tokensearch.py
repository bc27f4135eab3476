"""Golden parity for token-pattern search (reference tokensearcher docstrings)."""

from spaczz_spark.tokensearch import regex_compare, token_match, token_spans


def test_regex_compare_sequel_67():
    # reference: tokensearcher.py:144-145 docstring
    assert regex_compare("sequel", "(sql){i<=3}") == 67


def test_regex_compare_no_match():
    assert regex_compare("xyz", "(sql){i<=1}") == 0


def test_token_match_golden():
    # reference: tokensearcher.py:50-57 docstring
    doc = "I was prescribed zithramax and advar"
    pattern = [
        {"TEXT": {"FUZZY": "zithromax"}},
        {"POS": "CCONJ"},
        {"TEXT": {"FREGEX": "(advair){e<=1}"}},
    ]
    assert token_match(doc, pattern) == [
        [("TEXT", "zithramax", 89), ("", "", 100), ("TEXT", "advar", 91)]
    ]


def test_token_match_all_or_nothing():
    doc = "I was prescribed zithramax and aspirin"
    pattern = [
        {"TEXT": {"FUZZY": "zithromax"}},
        {"POS": "CCONJ"},
        {"TEXT": {"FREGEX": "(advair){e<=1}"}},
    ]
    assert token_match(doc, pattern) == []


def test_token_spans_weighted_ratio():
    doc = "I was prescribed zithramax and advar"
    pattern = [
        {"TEXT": {"FUZZY": "zithromax"}},
        {"POS": "CCONJ"},
        {"TEXT": {"FREGEX": "(advair){e<=1}"}},
    ]
    spans = token_spans(doc, pattern)
    # tokens 3..6; weighted mean of (89 over 9 chars, 100 over 3, 91 over 5)
    expected = round((89 * 9 + 100 * 3 + 91 * 5) / 17)
    assert spans == [(3, 6, expected)]


def test_token_match_lower_vs_text_case():
    assert token_match("ZITHRAMAX", [{"LOWER": {"FUZZY": "zithromax"}}]) != []
    # TEXT is case-sensitive: upper vs lower scores below default min_r
    assert token_match("ZITHRAMAX", [{"TEXT": {"FUZZY": "zithromax"}}]) == []


def test_per_slot_min_r_override():
    assert token_match(
        "zithrmx", [{"TEXT": {"FUZZY": "zithromax", "MIN_R": 60}}]
    ) != []
    assert token_match(
        "zithrmx", [{"TEXT": {"FUZZY": "zithromax", "MIN_R": 95}}]
    ) == []
