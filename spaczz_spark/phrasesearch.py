"""Phrase search core: scan / optimize / overlap-filter (SURVEY.md §2.2 P1-P4).

Reimplements — from the documented semantics, not the code — the reference's
two-phase phrase search (reference: ``_search/phrasesearcher.py:79-321``):

1. ``scan``     (P1): stride-1 windows of ``len(query)`` tokens scored with a
   cheap gate ``min_r1`` — the recall-oriented candidate pass. In the
   distributed engine this role is played by MinHash/LSH; the faithful
   per-document form here powers the FuzzyMatcher surface and the golden-value
   parity tests.
2. ``optimize`` (P2): greedy boundary flexing (±f tokens, six variants per
   step, early break on no improvement, skipped when the scan ratio already
   meets ``thresh``), gated by ``min_r2``.
3. parameter resolution (P3): ``flex``/``min_r1``/``min_r2``/``thresh``
   coherence rules.
4. ``filter_overlapping_matches`` (P4): greedy interval dedup on
   (-ratio, start)-sorted matches.

This module is pure Python and driver/executor agnostic; the distributed
fan-out lives in ``spaczz_spark.operators.matcher``.
"""

from __future__ import annotations

import re
import warnings

import numpy as np

from .ratios import compare
from .tokenizer import TokenDoc, tokenize

__all__ = [
    "FlexWarning",
    "RatioWarning",
    "calc_flex",
    "set_ratios",
    "check_ratios",
    "scan",
    "optimize",
    "filter_overlapping_matches",
    "match",
]

SearchResult = tuple[int, int, int]  # (token start, token end, ratio)


class FlexWarning(UserWarning):
    """flex value was clamped into [0, len(query)]."""


class RatioWarning(UserWarning):
    """min_r1/min_r2/thresh were adjusted for coherence."""


# ---------------------------------------------------------------------------
# P3 — parameter resolution (reference: phrasesearcher.py:228-321)
# ---------------------------------------------------------------------------


def calc_flex(query_len: int, flex: int | str = "default") -> int:
    """Resolve flex: 'default' -> len//2, 'max' -> len, 'min' -> 0; ints are
    clamped into [0, len] with a FlexWarning."""
    if flex == "default":
        return query_len // 2
    if flex == "max":
        return query_len
    if flex == "min":
        return 0
    if isinstance(flex, int) and not isinstance(flex, bool):
        if flex > query_len:
            warnings.warn(
                f"flex {flex} > len(query) {query_len}; clamping to {query_len}",
                FlexWarning,
                stacklevel=2,
            )
            return query_len
        if flex < 0:
            warnings.warn("flex < 0; clamping to 0", FlexWarning, stacklevel=2)
            return 0
        return flex
    raise TypeError("flex must be 'default', 'max', 'min', or an int")


def set_ratios(
    min_r: int, min_r1: int | None = None, min_r2: int | None = None
) -> tuple[int, int]:
    """Default the two-phase gates from min_r: min_r1=round(min_r/1.5),
    min_r2=min_r."""
    r1 = min_r1 if min_r1 is not None else round(min_r / 1.5)
    r2 = min_r2 if min_r2 is not None else min_r
    return r1, r2


def check_ratios(
    min_r1: int, min_r2: int, thresh: int, flex: int
) -> tuple[int, int, int]:
    """Coherence: with flex, enforce min_r1 <= min_r2 <= thresh (warning);
    without flex the scan is final so min_r1 = min_r2."""
    if flex:
        if min_r1 > min_r2:
            warnings.warn(
                "min_r1 > min_r2; setting min_r1 = min_r2", RatioWarning, stacklevel=2
            )
            min_r1 = min_r2
        if thresh < min_r2:
            warnings.warn(
                "thresh < min_r2; setting thresh = min_r2", RatioWarning, stacklevel=2
            )
            thresh = min_r2
    else:
        min_r1 = min_r2
    return min_r1, min_r2, thresh


# ---------------------------------------------------------------------------
# P1 — scan (reference: phrasesearcher.py:179-226)
# ---------------------------------------------------------------------------


# Ratio functions whose float score admits the per-window multiset upper
# bound used by _screen_window_starts: for simple/quick the score is
# 200*LCS/(len_q+len_w) and LCS chars are common chars, so
# score <= 200*I/(len_q+len_w); for the integer levenshtein ratio,
# d >= m - I gives ratio <= (200*I + m) // (2*m) with m = max(len_q, len_w).
# token_sort is screenable because sorting is a permutation: the compared
# strings are sorted_join(q) (fixed multiset, measured directly) and
# sorted_join(w), whose per-char counts are dominated by the window's
# counts with all whitespace folded to ' ' (non-ws chars pass through
# unchanged; #tokens-1 joiner spaces <= #whitespace chars in the window);
# len(sorted_join(w)) >= window_len - window_ws gives the denominator
# lower bound. partial/token_set/token/weighted change which strings enter
# the comparison in window-dependent ways and are NOT screenable (same
# analysis as operators.matcher._SCREENABLE_FUNCS).
_WINDOW_SCREENABLE = {"simple", "quick", "levenshtein", "token_sort"}
_WS_RE = re.compile(r"\s")
# Below this many windows the numpy setup costs more than it saves.
_MIN_WINDOWS_TO_SCREEN = 8


def _screen_window_starts(
    doc: TokenDoc, query_len: int, qtext: str, gate: int,
    ignore_case: bool, fuzzy_func: str,
):
    """Vectorized per-window prefilter: return the start indices whose
    character-multiset upper bound can reach ``gate`` (a superset of the
    kernel's accepted windows — pruned windows provably score < gate, i.e.
    compare() would return 0), or None when the screen does not apply.

    One cumulative char-count pass over the doc text (restricted to the
    query's alphabet) turns every window's multiset intersection into two
    array lookups; the InDel/Levenshtein kernel then runs only on survivors.
    """
    q = qtext.lower() if ignore_case else qtext
    sort_tokens = fuzzy_func == "token_sort"
    if sort_tokens:
        # the kernel compares sorted_join forms; measure the query on its
        # compared form (whitespace runs collapse, so len(q) would be too
        # big a denominator and the bound would over-prune)
        q = " ".join(sorted(q.split()))
    lq = len(q)
    if not lq:
        return None
    text = doc.text
    if ignore_case:
        lowered = text.lower()
        if len(lowered) != len(text):
            # Unicode case folding changed offsets (e.g. 'İ' -> 'i̇');
            # token spans no longer index the lowered text — skip screening.
            return None
        text = lowered
    if sort_tokens:
        # fold every whitespace char to ' ' (length-preserving, so token
        # spans still index correctly): the window's folded counts dominate
        # sorted_join(window)'s counts per char
        text = _WS_RE.sub(" ", text)
    # query alphabet + query char counts
    alpha: dict[str, int] = {}
    for ch in q:
        if ch not in alpha:
            alpha[ch] = len(alpha)
    if sort_tokens and " " not in alpha:
        alpha[" "] = len(alpha)  # need the window ws count for the bound
    qc = np.zeros(len(alpha), dtype=np.int64)
    for ch in q:
        qc[alpha[ch]] += 1
    codes = np.fromiter(
        (alpha.get(ch, -1) for ch in text), dtype=np.int64, count=len(text)
    )
    onehot = np.zeros((len(text) + 1, len(alpha)), dtype=np.int32)
    pos = np.nonzero(codes >= 0)[0]
    onehot[pos + 1, codes[pos]] = 1
    cum = np.cumsum(onehot, axis=0)
    n_tok = len(doc)
    tok_starts = np.fromiter(
        (t.start for t in doc.tokens), dtype=np.int64, count=n_tok
    )
    tok_ends = np.fromiter(
        (t.end for t in doc.tokens), dtype=np.int64, count=n_tok
    )
    ws = tok_starts[: n_tok - query_len + 1]
    we = tok_ends[query_len - 1:]
    wlen = we - ws
    counts = cum[we] - cum[ws]
    inter = np.minimum(counts, qc[None, :]).sum(axis=1)
    if fuzzy_func == "levenshtein":
        m = np.maximum(wlen, lq)
        keep = (200 * inter + m) // (2 * m) >= gate
    elif sort_tokens:
        # score = 200*LCS(sq, sw) / (lq + len(sw)); LCS <= I (folded window
        # counts dominate sw's), and len(sw) >= wlen - window_ws_count
        w_ws = counts[:, alpha[" "]]
        keep = 200 * inter >= gate * (lq + wlen - w_ws)
    else:
        # float score >= gate  requires  200*I >= gate*(lq+lw) exactly
        # (both sides integer-valued up to the exact rational comparison)
        keep = 200 * inter >= gate * (lq + wlen)
    return np.nonzero(keep)[0]


def scan(
    doc: TokenDoc,
    query: TokenDoc,
    *,
    min_r1: int,
    ignore_case: bool = True,
    fuzzy_func: str = "simple",
    compare_fn=None,
) -> dict[int, int] | None:
    """Stride-1 candidate scan: {start index -> ratio} for windows of
    len(query) tokens whose ratio >= min_r1 (>0 when min_r1 == 0).

    ``compare_fn(s1, s2, min_r, ignore_case) -> int`` overrides the named
    ratio function — the hook the similarity (pooled-vector) searcher uses
    to reuse this exact scan/optimize control flow."""
    doc_len = len(doc)
    query_len = len(query)
    if not query_len:
        return None
    qtext = query.span_text(0, query_len)
    gate = min_r1 if min_r1 else 1
    starts = range(doc_len - query_len + 1)
    if (
        compare_fn is None
        and fuzzy_func in _WINDOW_SCREENABLE
        and len(starts) >= _MIN_WINDOWS_TO_SCREEN
    ):
        screened = _screen_window_starts(
            doc, query_len, qtext, gate, ignore_case, fuzzy_func
        )
        if screened is not None:
            starts = screened
    out: dict[int, int] = {}
    for i in starts:
        i = int(i)
        wtext = doc.span_text(i, i + query_len)
        if compare_fn is not None:
            r = compare_fn(qtext, wtext, gate, ignore_case)
        else:
            r = compare(
                qtext, wtext, min_r=gate, ignore_case=ignore_case,
                fuzzy_func=fuzzy_func,
            )
        if r:
            out[i] = r
    return out or None


# ---------------------------------------------------------------------------
# P2 — optimize (reference: phrasesearcher.py:79-177)
# ---------------------------------------------------------------------------


def optimize(
    doc: TokenDoc,
    query: TokenDoc,
    match_values: dict[int, int],
    pos: int,
    *,
    flex: int,
    min_r2: int,
    thresh: int = 100,
    ignore_case: bool = True,
    fuzzy_func: str = "simple",
    compare_fn=None,
) -> SearchResult | None:
    """Greedy boundary flexing around one scan hit; returns the best
    (start, end, ratio) if ratio >= min_r2, else None."""
    doc_len = len(doc)
    qtext = query.span_text(0, len(query))

    def cmp(lo: int, hi: int, cutoff: int) -> int:
        if compare_fn is not None:
            return compare_fn(qtext, doc.span_text(lo, hi), cutoff, ignore_case)
        return compare(
            qtext,
            doc.span_text(lo, hi),
            min_r=cutoff,
            ignore_case=ignore_case,
            fuzzy_func=fuzzy_func,
        )

    p_l = bp_l = pos
    p_r = bp_r = pos + len(query)
    r = match_values[pos]
    if flex and r < thresh:
        optim_r = r
        for f in range(1, flex + 1):
            # Six boundary variants per step: move left edge out/in, right
            # edge in/out, both out, both in — keep any strict improvement
            # (the cutoff makes non-improvements return 0).
            candidates = []
            if p_l - f >= 0:
                candidates.append((p_l - f, p_r))
            if p_l + f < p_r:
                candidates.append((p_l + f, p_r))
            if p_r - f > p_l:
                candidates.append((p_l, p_r - f))
            if p_r + f <= doc_len:
                candidates.append((p_l, p_r + f))
            if p_l - f >= 0 and p_r + f <= doc_len:
                candidates.append((p_l - f, p_r + f))
            if p_l + f < p_r and p_r - f > p_l:
                candidates.append((p_l + f, p_r - f))
            for lo, hi in candidates:
                new_r = cmp(lo, hi, optim_r)
                if new_r:
                    optim_r = new_r
                    bp_l, bp_r = lo, hi
            if optim_r == r:
                break
            r = optim_r
    if r >= min_r2:
        return (bp_l, bp_r, r)
    return None


# ---------------------------------------------------------------------------
# P4 — overlap filter (reference: searchutil.py:13-41)
# ---------------------------------------------------------------------------


def filter_overlapping_matches(matches) -> list[SearchResult]:
    """Greedy interval dedup: expects (-ratio, start) pre-sorted input; keeps
    a match iff its token range intersects no previously kept match."""
    kept: list[SearchResult] = []
    for m in matches:
        if not any(m[0] < k[1] and k[0] < m[1] for k in kept):
            kept.append(m)
    return kept


# ---------------------------------------------------------------------------
# Full match (reference: phrasesearcher.py:32-77)
# ---------------------------------------------------------------------------


def match(
    doc: TokenDoc | str,
    query: TokenDoc | str,
    *,
    min_r: int = 75,
    thresh: int = 100,
    min_r1: int | None = None,
    min_r2: int | None = None,
    flex: int | str = "default",
    ignore_case: bool = True,
    fuzzy_func: str = "simple",
    compare_fn=None,
) -> list[SearchResult]:
    """Two-phase fuzzy phrase search over one document."""
    if isinstance(doc, str):
        doc = tokenize(doc)
    if isinstance(query, str):
        query = tokenize(query)
    flex_ = calc_flex(len(query), flex)
    r1, r2 = set_ratios(min_r, min_r1, min_r2)
    r1, r2, thresh_ = check_ratios(r1, r2, thresh, flex_)
    match_map = scan(
        doc, query, min_r1=r1, ignore_case=ignore_case, fuzzy_func=fuzzy_func,
        compare_fn=compare_fn,
    )
    if not match_map:
        return []
    results = []
    for pos in match_map:
        res = optimize(
            doc,
            query,
            match_map,
            pos,
            flex=flex_,
            min_r2=r2,
            thresh=thresh_,
            ignore_case=ignore_case,
            fuzzy_func=fuzzy_func,
            compare_fn=compare_fn,
        )
        if res:
            results.append(res)
    if not results:
        return []
    return filter_overlapping_matches(sorted(results, key=lambda x: (-x[2], x[0])))
