"""Golden parity for the scan/optimize/match search core.

Token indices match the reference fixtures because the rule tokenizer
reproduces the spaCy-blank splits those fixtures rely on (contractions,
trailing punctuation, infix hyphens).
Source of expected values: /root/reference/tests/test__search/test_fuzzysearcher.py.
"""

import pytest

from spaczz_spark import phrasesearch as ps
from spaczz_spark.tokenizer import tokenize


def test_tokenizer_contraction_and_punct():
    doc = tokenize("Don't call me Sh1rley")
    assert doc.token_texts() == ["Do", "n't", "call", "me", "Sh1rley"]
    doc2 = tokenize("My favorite wine is white goldriesling.")
    assert doc2.token_texts()[-2:] == ["goldriesling", "."]
    doc3 = tokenize("named: Karem Abdul Jabar")
    assert doc3.token_texts() == ["named", ":", "Karem", "Abdul", "Jabar"]
    q = tokenize("Kareem Abdul-Jabbar")
    assert q.token_texts() == ["Kareem", "Abdul", "-", "Jabbar"]


def test_tokenizer_offsets_reconstruct_spans():
    doc = tokenize("There was a great basketball player named: Karem Abdul Jabar")
    assert doc.span_text(8, 11) == "Karem Abdul Jabar"


def test_calc_flex():
    # reference: test_fuzzysearcher.py:55-107
    assert ps.calc_flex(2, "default") == 1
    assert ps.calc_flex(3, "max") == 3
    assert ps.calc_flex(2, "min") == 0
    assert ps.calc_flex(2, 0) == 0
    with pytest.warns(ps.FlexWarning):
        assert ps.calc_flex(2, 5) == 2
    with pytest.warns(ps.FlexWarning):
        assert ps.calc_flex(2, -1) == 0
    with pytest.raises(TypeError):
        ps.calc_flex(2, None)


def test_set_ratios():
    # reference: test_fuzzysearcher.py:109-125
    assert ps.set_ratios(75, 40, 80) == (40, 80)
    assert ps.set_ratios(75, 40, None) == (40, 75)
    assert ps.set_ratios(75, None, 80) == (50, 80)
    assert ps.set_ratios(75, None, None) == (50, 75)


def test_check_ratios():
    # reference: test_fuzzysearcher.py:150-162
    with pytest.warns(ps.RatioWarning):
        assert ps.check_ratios(80, 75, 100, 1) == (75, 75, 100)
    with pytest.warns(ps.RatioWarning):
        assert ps.check_ratios(50, 75, 70, 1) == (50, 75, 75)
    # flex == 0 forces min_r1 = min_r2, silently
    assert ps.check_ratios(10, 75, 100, 0) == (75, 75, 100)


def test_scan_golden():
    # reference: test_fuzzysearcher.py:166-181
    doc = tokenize("Don't call me Sh1rley")
    query = tokenize("Shirley")
    assert ps.scan(doc, query, min_r1=30) == {4: 86}
    assert ps.scan(doc, query, min_r1=0) == {2: 18, 3: 22, 4: 86}
    assert ps.scan(doc, tokenize("xenomorph"), min_r1=30) is None
    assert ps.scan(doc, tokenize(""), min_r1=25) is None


def test_optimize_golden_flex4():
    # reference: test_fuzzysearcher.py:212-226
    doc = tokenize("There was a great basketball player named: Karem Abdul Jabar")
    query = tokenize("Kareem Abdul-Jabbar")
    match_values = {0: 33, 1: 39, 2: 41, 3: 33, 5: 37, 6: 59, 7: 84}
    assert ps.optimize(
        doc, query, match_values, pos=7, flex=4, min_r2=70, thresh=100
    ) == (8, 11, 89)


def test_optimize_no_flex_returns_initial():
    # reference: test_fuzzysearcher.py:229-245
    doc = tokenize("Patient was prescribed Zithroma tablets.")
    query = tokenize("zithromax")
    assert ps.optimize(doc, query, {3: 94}, pos=3, flex=0, min_r2=70, thresh=100) == (
        3,
        4,
        94,
    )


def test_match_golden_1():
    # reference: test_fuzzysearcher.py:256-263
    out = ps.match(
        "chiken from Popeyes is better than chken from Chick-fil-A",
        "chicken",
        ignore_case=False,
    )
    assert out == [(0, 1, 92), (6, 7, 83)]


def test_match_golden_2():
    # reference: test_fuzzysearcher.py:266-272
    assert ps.match("My favorite wine is white goldriesling.", "gold riesling") == [
        (5, 6, 96)
    ]


def test_match_golden_3():
    # reference: test_fuzzysearcher.py:275-281
    assert ps.match(
        "My favorite wine is white gold riesling.", "goldriesling", flex="max"
    ) == [(5, 7, 96)]


def test_match_no_matches():
    assert ps.match("G-rant Anderson lives in TN.", "xenomorph") == []


def test_match_bpl_would_equal_bpr():
    # reference: test_fuzzysearcher.py:248-253
    assert (
        ps.match(
            "trabalho, investimento e escolhas corajosas,",
            "Courtillier Musqué",
            flex="max",
        )
        == []
    )


def test_filter_overlapping_matches():
    # reference: searchutil.py docstring
    assert ps.filter_overlapping_matches([(1, 3, 80), (1, 2, 70)]) == [(1, 3, 80)]


def test_matcher_prefilter_is_lossless():
    """The character-multiset screen in operators.matcher never drops a doc
    that the unscreened kernel would match (byte-identical output)."""
    import random

    from spaczz_spark.operators.matcher import Pattern, _run_patterns
    from spaczz_spark.phrasesearch import match as phrase_match
    from spaczz_spark.tokenizer import tokenize

    rng = random.Random(5)
    vocab = ["table", "tabel", "grant", "grunt", "anderson", "andersen",
             "query", "big", "data", "zzz", "qqq"]
    docs = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12)))
        for _ in range(60)
    ] + ["", "zzz qqq", "grant andersen", "ace", "pen", "ace pen"]
    pattern_specs = [
        ("grant andersen", {"min_r": 75}),
        ("query big table", {"min_r": 60}),
        ("tabel", {"min_r": 75, "fuzzy_func": "partial"}),
        # partial_ratio compares the SHORTER side against slices of the
        # longer: on doc "ace" this pattern scores 100 even though the
        # doc-level multiset bound 200*I/len(pattern) = 46 < 75 — the
        # screen must NOT apply to partial (round-2 advice regression).
        ("acetaminophen", {"min_r": 75, "fuzzy_func": "partial"}),
        ("anderson", {"min_r": 90, "min_r1": 30}),
        ("zzz", {"min_r": 75, "fuzzy_func": "levenshtein", "flex": 0}),
        # token_sort (round-4): sorting is a permutation so the multiset
        # bound holds — measured on the sorted-join form. The double space
        # in the pattern exercises the whitespace-collapse length fix
        # (len("andersen  grant")=15 but the compared string has 14 chars).
        ("andersen  grant", {"min_r": 75, "fuzzy_func": "token_sort"}),
        ("big data", {"min_r": 60, "fuzzy_func": "token_sort"}),
    ]
    patterns = [Pattern(f"P{i}", q, "fuzzy", kw)
                for i, (q, kw) in enumerate(pattern_specs)]
    for text in docs:
        screened = [m for m in _run_patterns(text, patterns)]
        unscreened = []
        if text:
            doc = tokenize(text)
            seen = set()
            for p in patterns:
                for s, e, r in phrase_match(doc, p.pattern, **p.kwargs):
                    key = (p.label, s, e, r, p.pattern)
                    if key not in seen:
                        seen.add(key)
                        unscreened.append(
                            (p.label, s, e, r, p.pattern, p.type, p.id)
                        )
            unscreened.sort(key=lambda m: (m[1], -(m[2] - m[1]), -m[3], m[4]))
        assert screened == unscreened, (text, screened, unscreened)


def test_scan_window_screen_is_lossless():
    """Round-3: the vectorized per-window screen inside scan() must be
    byte-identical to the unscreened loop for every screenable func —
    including ratio==gate boundary hits and Unicode case-length changes."""
    import random

    from spaczz_spark.phrasesearch import _MIN_WINDOWS_TO_SCREEN, scan
    from spaczz_spark.ratios import compare
    from spaczz_spark.tokenizer import tokenize

    def brute(doc, query, min_r1, ignore_case, fuzzy_func):
        qtext = query.span_text(0, len(query))
        gate = min_r1 if min_r1 else 1
        out = {}
        for i in range(len(doc) - len(query) + 1):
            r = compare(qtext, doc.span_text(i, i + len(query)),
                        min_r=gate, ignore_case=ignore_case,
                        fuzzy_func=fuzzy_func)
            if r:
                out[i] = r
        return out or None

    rng = random.Random(31)
    vocab = ["table", "tabel", "grant", "grunt", "ab", "a", "xy",
             "İstanbul", "zzz", "data", "custmer", "customer"]
    queries = ["grant", "custmer", "ab xy", "İstanbul", "tabel zzz",
               "data  grant"]
    # mixed separators stress the token_sort whitespace folding (the
    # window's sorted-join replaces every gap with one ' ')
    seps = [" ", "  ", "\n", "\t", " \n "]
    for trial in range(260):
        n = rng.randint(_MIN_WINDOWS_TO_SCREEN, 40)
        words = [rng.choice(vocab) for _ in range(n)]
        text = words[0] + "".join(
            rng.choice(seps) + w for w in words[1:]
        )
        q = rng.choice(queries)
        func = rng.choice(["simple", "quick", "levenshtein", "token_sort"])
        gate = rng.choice([1, 40, 50, 67, 75, 80, 100])
        ic = rng.random() < 0.7
        doc, query = tokenize(text), tokenize(q)
        got = scan(doc, query, min_r1=gate, ignore_case=ic, fuzzy_func=func)
        want = brute(doc, query, gate, ic, func)
        assert got == want, (trial, text, q, func, gate, ic, got, want)
        if got:
            assert all(type(k) is int for k in got)
