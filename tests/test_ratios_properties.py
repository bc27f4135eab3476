"""Property-based tests for the ratio kernels (hypothesis)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from spaczz_spark import ratios

text = st.text(alphabet="abcdef _-", max_size=60)


@given(text, text)
@settings(max_examples=200, deadline=None)
def test_indel_ratio_bounds_and_symmetry(a, b):
    r = ratios.indel_ratio(a, b)
    assert 0.0 <= r <= 100.0
    assert r == ratios.indel_ratio(b, a)


@given(text)
@settings(max_examples=100, deadline=None)
def test_identity_is_100(a):
    assert ratios.indel_ratio(a, a) == 100.0
    assert ratios.token_sort_ratio(a, a) == 100.0


@given(text, text)
@settings(max_examples=200, deadline=None)
def test_distance_triangle_consistency(a, b):
    # indel distance metric properties: non-negativity, identity, symmetry
    d = ratios.indel_distance(a, b)
    assert d >= abs(len(a) - len(b))
    assert d <= len(a) + len(b)
    assert (d == 0) == (a == b)


@given(text, text)
@settings(max_examples=150, deadline=None)
def test_token_sort_ge_plain_on_permutations(a, b):
    # sorting tokens can only help when inputs are permutations of tokens
    perm_a = " ".join(sorted(a.split()))
    perm_b = " ".join(sorted(b.split()))
    assert ratios.token_sort_ratio(a, b) == ratios.indel_ratio(perm_a, perm_b)


@given(text, text, text)
@settings(max_examples=150, deadline=None)
def test_partial_ratio_is_100_for_true_substrings(prefix, a, suffix):
    # embedding a verbatim inside a larger string -> perfect window ratio
    if a:
        assert ratios.partial_ratio(a, prefix + a + suffix) == 100.0


@given(text, st.integers(min_value=0, max_value=100))
@settings(max_examples=100, deadline=None)
def test_score_cutoff_never_returns_between_zero_and_cutoff(a, cutoff):
    r = ratios.indel_ratio(a, a[::-1], score_cutoff=cutoff)
    assert r == 0.0 or r >= cutoff


@given(st.text(alphabet="ab", max_size=30), st.text(alphabet="ab", max_size=30))
@settings(max_examples=200, deadline=None)
def test_lcs_never_exceeds_either_length(a, b):
    lcs = ratios.lcs_length(a, b)
    assert 0 <= lcs <= min(len(a), len(b))
    # concatenation monotonicity
    assert ratios.lcs_length(a + "a", b + "a") >= lcs + (1 if True else 0) - 1


@given(st.text(max_size=40), st.text(max_size=40))
@settings(max_examples=300, deadline=None)
def test_levenshtein_ratio_properties(s1, s2):
    """Engine-extension lev ratio: symmetric, bounded, 100 iff equal, and
    consistent with the exact integer formula."""
    from spaczz_spark.ratios import levenshtein_distance, levenshtein_ratio

    r = levenshtein_ratio(s1, s2)
    assert r == levenshtein_ratio(s2, s1)
    assert 0 <= r <= 100
    if s1 == s2:
        assert r == 100
    m = max(len(s1), len(s2))
    if m:
        d = levenshtein_distance(s1, s2)
        assert r == (200 * (m - d) + m) // (2 * m)
        assert d <= m


@given(st.binary(max_size=256))
@settings(max_examples=400, deadline=None)
def test_parse_image_dims_never_crashes(blob):
    """Header parser total-function property: any byte string returns a
    well-typed triple, never raises, never loops."""
    from spaczz_spark.operators.multimodal import parse_image_dims

    fmt, w, h = parse_image_dims(blob)
    assert fmt in (None, "png", "gif", "bmp", "jpeg")
    if fmt is None:
        assert w is None and h is None
    else:
        assert isinstance(w, int) and isinstance(h, int) and w >= 0 and h >= 0


@given(
    st.lists(st.sampled_from("ab "), min_size=0, max_size=30).map("".join),
    st.lists(st.sampled_from("ab "), min_size=1, max_size=10).map("".join),
)
@settings(max_examples=200, deadline=None)
def test_similarity_compare_bounds(doc_text, query):
    """Pooled-cosine compare stays in [-100, 100] and is 0 whenever either
    side pools to a zero/absent vector."""
    from spaczz_spark.similaritysearch import similarity_compare

    lexicon = {"a": [1.0, 0.0], "b": [0.6, 0.8]}
    r = similarity_compare(doc_text, query, lexicon)
    assert -100 <= r <= 100
    assert similarity_compare(doc_text, query, {}) == 0


@given(
    st.text(alphabet="abc \n\tx", min_size=0, max_size=200),
    st.text(alphabet="abc \n\tx", min_size=0, max_size=200),
)
@settings(max_examples=150, deadline=None)
def test_numpy_levenshtein_matches_pure_python(s1, s2):
    """Round-4: the vectorized numpy row DP must be bit-identical to the
    pure-Python two-row DP on both sides of the length crossover."""
    from spaczz_spark.ratios import (
        _levenshtein_distance_np,
        levenshtein_distance,
    )

    def pure(a, b):
        if len(a) < len(b):
            a, b = b, a
        if not b:
            return len(a)
        prev = list(range(len(b) + 1))
        for i, c1 in enumerate(a, 1):
            cur = [i]
            for j, c2 in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (c1 != c2))
                )
            prev = cur
        return prev[-1]

    want = pure(s1, s2)
    assert levenshtein_distance(s1, s2) == want
    assert _levenshtein_distance_np(s1, s2) == want
