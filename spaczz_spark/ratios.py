"""Scalar similarity kernels (SURVEY.md §2.1 S1-S5, S7).

From-scratch reimplementation of the rapidfuzz-style ratio family the
reference registers by name (reference: ``registry/fuzzyfuncs.py:8-22``).
rapidfuzz is not available in this environment, so the kernels are written
from the published definitions and validated against the reference's own
golden test vectors (``tests/test__search/test_fuzzysearcher.py``), e.g.
``ratio("spaczz", "spacy") == 73``.

The core primitive is the InDel (insert/delete-only edit distance, i.e.
LCS-based) similarity::

    sim(s1, s2) = 100 * (1 - indel_dist / (len1 + len2))
    indel_dist  = len1 + len2 - 2 * LCS(s1, s2)

computed with the bit-parallel LCS recurrence (Allison-Dix / Hyyro style),
O(len(s2) * len(s1)/w) word operations using Python big-ints, which keeps
pair verification fast enough for multi-KB source files inside Arrow-batched
pandas UDFs.

All public ``*_ratio`` functions return floats in [0, 100] and honor
``score_cutoff`` with rapidfuzz semantics (result < cutoff -> 0.0).
``compare`` applies the reference's rounding contract
(``fuzzysearcher.py:64``: ``round(func(s1, s2, score_cutoff=min_r))``).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import NamedTuple

__all__ = [
    "lcs_length",
    "indel_distance",
    "indel_ratio",
    "ratio",
    "partial_ratio",
    "partial_ratio_alignment",
    "token_sort_ratio",
    "token_set_ratio",
    "token_ratio",
    "partial_token_sort_ratio",
    "partial_token_set_ratio",
    "partial_token_ratio",
    "wratio",
    "qratio",
    "FUZZY_FUNCS",
    "get_fuzzy_func",
    "compare",
    "normalize_fuzzy_regex_counts",
    "RE_WEIGHTS",
]


# ---------------------------------------------------------------------------
# LCS / InDel core
# ---------------------------------------------------------------------------


def lcs_length(s1: Sequence, s2: Sequence) -> int:
    """Length of the longest common subsequence of two sequences.

    Bit-parallel over ``s1`` (pattern) positions; works on strings or any
    hashable-element sequences (token lists).
    """
    n = len(s1)
    m = len(s2)
    if n == 0 or m == 0:
        return 0
    # Keep the bit-vector over the shorter sequence.
    if n > m:
        s1, s2 = s2, s1
        n, m = m, n
    match: dict = {}
    bit = 1
    for ch in s1:
        match[ch] = match.get(ch, 0) | bit
        bit <<= 1
    mask = (1 << n) - 1
    v = mask  # all ones; a 0 bit marks a matched LCS position
    for ch in s2:
        u = v & match.get(ch, 0)
        if u:
            v = ((v + u) & mask) | (v - u)
    return n - bin(v).count("1")


def indel_distance(s1: Sequence, s2: Sequence) -> int:
    """Insert/delete-only edit distance: ``len1 + len2 - 2*LCS``."""
    return len(s1) + len(s2) - 2 * lcs_length(s1, s2)


def _apply_cutoff(score: float, score_cutoff: float) -> float:
    return score if score >= score_cutoff else 0.0


def indel_ratio(s1: Sequence, s2: Sequence, *, score_cutoff: float = 0) -> float:
    """Normalized InDel similarity in [0, 100] (rapidfuzz ``fuzz.ratio``)."""
    total = len(s1) + len(s2)
    if total == 0:
        return _apply_cutoff(100.0, score_cutoff)
    dist = indel_distance(s1, s2)
    return _apply_cutoff(100.0 * (1.0 - dist / total), score_cutoff)


ratio = indel_ratio


# ---------------------------------------------------------------------------
# partial_* family (best local alignment of the shorter string)
# ---------------------------------------------------------------------------


class ScoreAlignment(NamedTuple):
    """Alignment result mirroring rapidfuzz's ``partial_ratio_alignment``."""

    score: float
    src_start: int
    src_end: int
    dest_start: int
    dest_end: int


def partial_ratio_alignment(
    s1: str, s2: str, *, score_cutoff: float = 0
) -> ScoreAlignment | None:
    """Best ``ratio`` of the shorter string vs any same-length window of the
    longer, with the winning window's offsets.

    Returns ``None`` when the score is below ``score_cutoff`` (rapidfuzz
    contract).
    """
    swapped = False
    if len(s1) > len(s2):
        s1, s2 = s2, s1
        swapped = True
    n, m = len(s1), len(s2)
    if n == 0:
        score = 100.0 if m == 0 else 0.0
        res = ScoreAlignment(score, 0, 0, 0, 0)
        return res if score >= score_cutoff else None
    best = -1.0
    best_i = 0
    # Max over all length-n windows of s2; early-exit on perfect score.
    for i in range(0, m - n + 1):
        sc = indel_ratio(s1, s2[i : i + n])
        if sc > best:
            best = sc
            best_i = i
            if best >= 100.0:
                break
    if best < score_cutoff:
        return None
    if swapped:
        return ScoreAlignment(best, best_i, best_i + n, 0, n)
    return ScoreAlignment(best, 0, n, best_i, best_i + n)


def partial_ratio(s1: str, s2: str, *, score_cutoff: float = 0) -> float:
    """rapidfuzz ``fuzz.partial_ratio``."""
    aln = partial_ratio_alignment(s1, s2, score_cutoff=score_cutoff)
    return aln.score if aln is not None else 0.0


# ---------------------------------------------------------------------------
# token_* family
# ---------------------------------------------------------------------------


def _sorted_join(s: str) -> str:
    return " ".join(sorted(s.split()))


def token_sort_ratio(s1: str, s2: str, *, score_cutoff: float = 0) -> float:
    """``ratio`` after whitespace-tokenizing and sorting both sides."""
    return indel_ratio(_sorted_join(s1), _sorted_join(s2), score_cutoff=score_cutoff)


def _token_sets(s1: str, s2: str):
    t1 = set(s1.split())
    t2 = set(s2.split())
    sect = sorted(t1 & t2)
    diff1 = sorted(t1 - t2)
    diff2 = sorted(t2 - t1)
    return sect, diff1, diff2


def token_set_ratio(s1: str, s2: str, *, score_cutoff: float = 0) -> float:
    """Set-algebra max of ratios over token intersections/differences."""
    sect, diff1, diff2 = _token_sets(s1, s2)
    if sect and (not diff1 or not diff2):
        return _apply_cutoff(100.0, score_cutoff)
    sect_str = " ".join(sect)
    s1_full = (sect_str + " " + " ".join(diff1)).strip()
    s2_full = (sect_str + " " + " ".join(diff2)).strip()
    best = indel_ratio(s1_full, s2_full)
    if sect:
        best = max(best, indel_ratio(sect_str, s1_full), indel_ratio(sect_str, s2_full))
    return _apply_cutoff(best, score_cutoff)


def token_ratio(s1: str, s2: str, *, score_cutoff: float = 0) -> float:
    """max(token_sort_ratio, token_set_ratio)."""
    return _apply_cutoff(
        max(token_sort_ratio(s1, s2), token_set_ratio(s1, s2)), score_cutoff
    )


def partial_token_sort_ratio(s1: str, s2: str, *, score_cutoff: float = 0) -> float:
    """``partial_ratio`` on sorted-token strings."""
    return partial_ratio(_sorted_join(s1), _sorted_join(s2), score_cutoff=score_cutoff)


def partial_token_set_ratio(s1: str, s2: str, *, score_cutoff: float = 0) -> float:
    """100 when any token is shared; else ``partial_ratio`` of the sorted
    unique-token strings."""
    sect, diff1, diff2 = _token_sets(s1, s2)
    if sect:
        return _apply_cutoff(100.0, score_cutoff)
    return partial_ratio(
        " ".join(diff1), " ".join(diff2), score_cutoff=score_cutoff
    )


def partial_token_ratio(s1: str, s2: str, *, score_cutoff: float = 0) -> float:
    """max(partial_token_sort_ratio, partial_token_set_ratio)."""
    return _apply_cutoff(
        max(partial_token_sort_ratio(s1, s2), partial_token_set_ratio(s1, s2)),
        score_cutoff,
    )


def wratio(s1: str, s2: str, *, score_cutoff: float = 0) -> float:
    """Weighted combination (rapidfuzz ``fuzz.WRatio`` heuristic)."""
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        base = 100.0 if len1 == len2 else 0.0
        return _apply_cutoff(base, score_cutoff)
    unbase_scale = 0.95
    end_ratio = indel_ratio(s1, s2)
    len_ratio = max(len1, len2) / min(len1, len2)
    if len_ratio < 1.5:
        end_ratio = max(end_ratio, token_ratio(s1, s2) * unbase_scale)
        return _apply_cutoff(end_ratio, score_cutoff)
    partial_scale = 0.9 if len_ratio < 8 else 0.6
    end_ratio = max(end_ratio, partial_ratio(s1, s2) * partial_scale)
    end_ratio = max(
        end_ratio, partial_token_ratio(s1, s2) * unbase_scale * partial_scale
    )
    return _apply_cutoff(end_ratio, score_cutoff)


# Above this many characters per side the pure-Python two-row DP switches
# to the vectorized numpy row recurrence (same exact result; the crossover
# is where numpy's per-row call overhead amortizes).
_LEV_NUMPY_MIN = 64


def _levenshtein_distance_np(s1: str, s2: str) -> int:
    """Vectorized two-row Levenshtein DP (exact, strings only).

    Per DP row the delete/substitute candidates are plain elementwise
    minima; the left-to-right insert dependency ``cur[j] = min(cand[j],
    cur[j-1]+1)`` unrolls to ``cur[j] = j + min_{i<=j}(cand[i] - i)``,
    i.e. one ``np.minimum.accumulate`` — so a row costs O(n) vector ops
    instead of O(n) Python-interpreted steps. ~100x faster on multi-KB
    source files, which is what makes a plain-Levenshtein verify kernel
    viable without the token-level fallback the InDel kernel needs.
    """
    import numpy as np

    if len(s1) < len(s2):
        s1, s2 = s2, s1
    if not s2:
        return len(s1)
    a = np.frombuffer(s1.encode("utf-32-le"), dtype=np.uint32)
    b = np.frombuffer(s2.encode("utf-32-le"), dtype=np.uint32)
    return _lev_rows_np(a, b)


def _lev_codes_np(t1: Sequence, t2: Sequence) -> int:
    """Numpy row DP over arbitrary hashable sequences (token lists).

    Elements are jointly integer-coded with one ``np.unique`` pass, then the
    same vectorized rows as the string path run on the code arrays —
    bit-identical distances to the pure-Python DP (the verify kernel's
    token-level Levenshtein fallback above ``LEV_CHAR_KERNEL_MAX`` needs
    this: a 100 KB file is ~15k tokens, quadratic in interpreted Python).
    """
    import numpy as np

    if len(t1) < len(t2):
        t1, t2 = t2, t1
    if not t2:
        return len(t1)
    codes = np.unique(np.asarray(list(t1) + list(t2), dtype=object), return_inverse=True)[1]
    return _lev_rows_np(codes[: len(t1)], codes[len(t1) :])


def _lev_rows_np(a, b) -> int:
    import numpy as np

    n = len(b)
    idx = np.arange(1, n + 1, dtype=np.int64)
    prev = np.arange(n + 1, dtype=np.int64)
    for i, c in enumerate(a, 1):
        cand = np.minimum(prev[1:] + 1, prev[:-1] + (b != c))
        cur = np.empty(n + 1, dtype=np.int64)
        cur[0] = i
        np.minimum.accumulate(
            np.concatenate(([np.int64(i)], cand - idx)), out=cur
        )
        cur[1:] = cur[1:] + idx
        prev = cur
    return int(prev[-1])


def levenshtein_distance(s1: Sequence, s2: Sequence) -> int:
    """Unit-cost Levenshtein distance (two-row DP; numpy rows for long
    strings — bit-identical results, see :func:`_levenshtein_distance_np`)."""
    if min(len(s1), len(s2)) >= _LEV_NUMPY_MIN:
        if isinstance(s1, str) and isinstance(s2, str):
            return _levenshtein_distance_np(s1, s2)
        return _lev_codes_np(s1, s2)
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    if not s2:
        return len(s1)
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1, 1):
        cur = [i]
        for j, c2 in enumerate(s2, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (c1 != c2)))
        prev = cur
    return prev[-1]


def levenshtein_ratio(s1: str, s2: str, *, score_cutoff: float = 0) -> float:
    """Unit-cost Levenshtein similarity as an integer percentage.

    **Engine extension** — not one of the reference's 11 registered ratio
    functions. Exists because plain Levenshtein is the one fuzzy measure
    every ANSI-SQL engine ships (Spark ``levenshtein``, DuckDB
    ``levenshtein``), so queries built on it are exactly oracle-checkable.
    Defined in pure integer arithmetic so SQL mirrors reproduce it
    bit-for-bit with no float-rounding hazard::

        ratio = (200*(m - d) + m) // (2*m)      # == round_half_up(100*(m-d)/m)

    where ``m = max(len(s1), len(s2))`` and ``d = levenshtein(s1, s2)``.
    """
    m = max(len(s1), len(s2))
    if m == 0:
        return 100.0
    d = levenshtein_distance(s1, s2)
    r = float((200 * (m - d) + m) // (2 * m))
    return _apply_cutoff(r, score_cutoff)


def qratio(s1: str, s2: str, *, score_cutoff: float = 0) -> float:
    """Quick ratio — plain ``ratio`` (0 when either side is empty)."""
    if len(s1) == 0 or len(s2) == 0:
        return 0.0
    return indel_ratio(s1, s2, score_cutoff=score_cutoff)


# ---------------------------------------------------------------------------
# Named registry (reference: registry/fuzzyfuncs.py — same public key names)
# ---------------------------------------------------------------------------

FUZZY_FUNCS = {
    "simple": indel_ratio,
    "partial": partial_ratio,
    "token": token_ratio,
    "token_set": token_set_ratio,
    "token_sort": token_sort_ratio,
    "partial_token": partial_token_ratio,
    "partial_token_set": partial_token_set_ratio,
    "partial_token_sort": partial_token_sort_ratio,
    "weighted": wratio,
    "quick": qratio,
    "partial_alignment": partial_ratio_alignment,
    # engine extension (not in the reference registry): SQL-mirrorable
    # integer Levenshtein ratio — see levenshtein_ratio docstring
    "levenshtein": levenshtein_ratio,
}


def get_fuzzy_func(name: str):
    """Look up a ratio function by registered name.

    Raises ``ValueError`` for unknown names (reference contract:
    ``test_fuzzysearcher.py:48-53``).
    """
    try:
        return FUZZY_FUNCS[name]
    except KeyError:
        raise ValueError(
            f"unknown fuzzy_func {name!r}; known: {sorted(FUZZY_FUNCS)}"
        ) from None


def compare(
    s1: str,
    s2: str,
    *,
    ignore_case: bool = True,
    min_r: int = 0,
    fuzzy_func: str = "simple",
) -> int:
    """The reference's ``FuzzySearcher.compare`` contract on plain strings.

    Lower-cases when ``ignore_case``, applies ``min_r`` as a score cutoff,
    and rounds with Python banker's rounding (``fuzzysearcher.py:58-64``).
    """
    if ignore_case:
        s1 = s1.lower()
        s2 = s2.lower()
    return round(get_fuzzy_func(fuzzy_func)(s1, s2, score_cutoff=min_r))


# ---------------------------------------------------------------------------
# Fuzzy-regex count normalization (S7; reference: searchutil.py:79-107)
# ---------------------------------------------------------------------------

# (substitution, insertion, deletion) weights by registered name
# (reference: registry/reweights.py:8-9).
RE_WEIGHTS: dict[str, tuple[int, int, int]] = {
    "indel": (1, 1, 2),
    "lev": (1, 1, 1),
}


def normalize_fuzzy_regex_counts(
    match: str,
    fuzzy_counts: tuple[int, int, int],
    fuzzy_weights: str = "indel",
) -> int:
    """Convert a fuzzy-regex ``(subs, ins, dels)`` count triple into a 0-100
    ratio under a named weight triple.

    Mirrors the arithmetic of the reference exactly (verbatim-formula parity;
    pure arithmetic, no code reuse): ``r = round(100 - 100*sum(w_i*c_i)/dist_max)``
    where ``dist_max`` depends on the reconstructed source/match lengths.
    Golden vectors: exact match -> 100; ``"sequel"`` vs ``(sql){i<=3}`` -> 67.
    """
    if fuzzy_counts == (0, 0, 0):
        return 100
    try:
        w_ins, w_del, w_sub = RE_WEIGHTS[fuzzy_weights]
    except KeyError:
        raise ValueError(
            f"unknown fuzzy_weights {fuzzy_weights!r}; known: {sorted(RE_WEIGHTS)}"
        ) from None
    subs, ins, dels = fuzzy_counts
    # Length of the pattern-side string implied by the edit counts.
    s1_len = len(match) - ins + dels
    s2_len = len(match)
    cost = ins * w_ins + dels * w_del + subs * w_sub
    if w_sub <= w_ins + w_del:
        dist_max = min(s1_len, s2_len) * w_sub
    else:
        dist_max = s1_len * w_del + s2_len * w_ins
    if s1_len > s2_len:
        dist_max += (s1_len - s2_len) * w_del
    elif s1_len < s2_len:
        dist_max += (s2_len - s1_len) * w_ins
    return round(100 - 100 * cost / dist_max)
