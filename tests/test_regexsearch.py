"""Golden parity for the regex searcher.

Expected values from /root/reference/tests/test__search/test_regexsearcher.py.
"""

import pytest

from spaczz_spark.regexsearch import regex_match
from spaczz_spark.repatterns import RE_PATTERNS, RegexParseError, parse_regex


def test_predef_phones_golden():
    # reference: test_regexsearcher.py:14-21
    doc = "My phone number is (555) 555-5555, not (554) 554-5554."
    assert regex_match(doc, "phones", predef=True) == [(4, 10, 100), (12, 18, 100)]


def test_fuzzy_regex_usa_80():
    # reference: test_regexsearcher.py:24-29
    assert regex_match("I live in the US.", r"(USA){d<=1}", ignore_case=False) == [
        (4, 5, 80)
    ]


def test_fuzzy_regex_nicobolas_71():
    # reference: test_regexsearcher.py:32-37
    assert regex_match("nic bole", r"(nicobolas){e<=5}", min_r=70) == [(0, 2, 71)]


def test_fuzzy_regex_min_r_filters():
    # reference: test_regexsearcher.py:40-45
    assert regex_match("nic bole", r"(nicobolas){e<=5}", min_r=80) == []


def test_partial_expands_to_token_boundaries():
    # reference: test_regexsearcher.py:48-56
    doc = "We want to identify 'USA' even though only first two letters will matched."
    assert regex_match(doc, r"[Uu](nited|\.?) ?[Ss](tates|\.?)") == [(5, 6, 100)]


def test_partial_expand_at_index_0():
    # reference: test_regexsearcher.py:59-64
    assert regex_match("withh something", "with") == [(0, 1, 100)]


def test_german_combination_words():
    # reference: test_regexsearcher.py:67-75
    doc = "We want to identify a geman word combination Aussagekraft or Kraftfahrzeug"
    assert regex_match(doc, r"(kraft|Kraft)") == [(8, 9, 100), (10, 11, 100)]


def test_no_partial_expansion_when_disabled():
    # reference: test_regexsearcher.py:78-85
    doc = "We want to identify 'USA' even though only first two letters will matched."
    assert regex_match(doc, r"[Uu](nited|\.?) ?[Ss](tates|\.?)", partial=False) == []


def test_parse_regex_error():
    with pytest.raises(RegexParseError):
        parse_regex("(unclosed")


def test_all_16_predef_patterns_exist():
    expected = {
        "dates", "times", "phones", "phones_with_exts", "links", "emails",
        "ips", "ipv6s", "prices", "hex_colors", "credit_cards",
        "btc_addresses", "street_addresses", "zip_codes", "po_boxes",
        "ssn_numbers",
    }
    assert set(RE_PATTERNS) == expected


@pytest.mark.parametrize(
    "name,text,expect",
    [
        ("emails", "contact me at foo.bar+baz@example.com today", "foo.bar+baz@example.com"),
        ("ips", "server at 192.168.1.254 is down", "192.168.1.254"),
        ("times", "meet at 9:30 pm sharp", "9:30 pm"),
        ("prices", "it costs $1,234.56 total", "$1,234.56"),
        ("hex_colors", "background: #ff00aa;", "#ff00aa"),
        ("zip_codes", "Anytown, USA 90210-1234", "90210-1234"),
        ("ssn_numbers", "ssn 123-45-6789 leaked", "123-45-6789"),
        ("po_boxes", "mail to P.O. Box 1234", "P.O. Box 1234"),
        ("links", "see https://example.com/a?b=1 now", "https://example.com/a?b=1"),
        ("dates", "due 14th of August 2026 or 3/5/26", "14th of August 2026"),
        ("street_addresses", "at 123 Main Street we met", "123 Main Street"),
        ("credit_cards", "card 4111 1111 1111 1111 ok", "4111 1111 1111 1111"),
    ],
)
def test_predef_pattern_extraction(name, text, expect):
    m = RE_PATTERNS[name].search(text)
    assert m is not None and m.group().strip() == expect


def test_partial_expansion_ratio_uses_span_text():
    # Reference semantics (regexsearcher.py _spans_from_regex ->
    # normalize_fuzzy_regex_counts(span.text, ...)): when partial=True
    # expands a mid-token match to the containing tokens, the ratio is
    # normalized on the LONGER span text. Here the fuzzy match "nickalas"
    # (8 chars, counts (1,0,0)) sits inside the token "unickalasy"
    # (10 chars): span-normalized ratio is 90; normalizing on the raw
    # match text would give 88.
    got = regex_match("see unickalasy here", r"(nickolas){s<=1}", min_r=30)
    assert got == [(1, 2, 90)]


def test_exact_boundary_ratio_unchanged_by_span_normalization():
    # exact-boundary spans have the same length as the raw match, so the
    # span-text normalization is a no-op for them (golden stays 80)
    assert regex_match("I live in the US.", r"(USA){d<=1}", ignore_case=False) == [
        (4, 5, 80)
    ]
