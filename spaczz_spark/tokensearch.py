"""Token-pattern search (SURVEY.md §2.2 P6, §2.3 M3).

Reimplements the reference's token-level pattern matching semantics
(reference: ``_search/tokensearcher.py:22-232``,
``matcher/tokenmatcher.py:304-333``):

- a pattern is a list of token dicts; ``TEXT``/``LOWER`` keys select case
  handling (TEXT = case-sensitive, LOWER = case-insensitive);
- ``{"FUZZY": s}`` slots run the named ratio kernel with per-slot
  ``MIN_R``/``FUZZY_FUNC``; ``{"FREGEX": p}`` slots run anchored fuzzy-regex
  with per-slot ``MIN_R``/``FUZZY_WEIGHTS``/``PREDEF``;
- any other attribute is a pass-through slot ``('', '', 100)``;
- windows are all-or-nothing: the first failing slot kills the window;
- results are order-preserving deduped by matched values;
- span ratio (M3) = char-length-weighted mean of per-slot ratios.
"""

from __future__ import annotations

import regex as re

from .ratios import compare, normalize_fuzzy_regex_counts
from .repatterns import parse_regex
from .tokenizer import TokenDoc, tokenize

__all__ = ["regex_compare", "token_match", "token_spans"]


def regex_compare(
    text: str,
    pattern: str,
    *,
    ignore_case: bool = False,
    min_r: int = 0,
    fuzzy_weights: str = "indel",
    predef: bool = False,
) -> int:
    """Anchored fuzzy-regex ratio of one token (0 when no match/below min_r).

    Golden: regex_compare("sequel", "(sql){i<=3}") == 67.
    """
    pat = parse_regex(pattern, predef=predef)
    if ignore_case:
        text = text.lower()
    m = re.match(pat, text)
    if m:
        r = normalize_fuzzy_regex_counts(
            m.group(0),
            tuple(getattr(m, "fuzzy_counts", (0, 0, 0))),
            fuzzy_weights,
        )
        if r >= min_r:
            return r
    return 0


def _parse_case(token: dict):
    text = token.get("TEXT")
    if text:
        return text, "TEXT", False
    return token.get("LOWER"), "LOWER", True


def _eval_window(
    toks: list[str], pattern: list[dict], min_r: int
) -> list[tuple[str, str, int]] | None:
    out: list[tuple[str, str, int]] = []
    for i, slot in enumerate(pattern):
        spec, case, ignore_case = _parse_case(slot)
        if isinstance(spec, dict):
            fuzzy = spec.get("FUZZY")
            fregex = spec.get("FREGEX")
            if fuzzy:
                r = compare(
                    toks[i],
                    fuzzy,
                    ignore_case=ignore_case,
                    min_r=spec.get("MIN_R", min_r),
                    fuzzy_func=spec.get("FUZZY_FUNC", "simple"),
                )
                if not r:
                    return None
                out.append((case, toks[i], r))
            elif fregex:
                r = regex_compare(
                    toks[i],
                    fregex,
                    ignore_case=ignore_case,
                    min_r=spec.get("MIN_R", min_r),
                    fuzzy_weights=spec.get("FUZZY_WEIGHTS", "indel"),
                    predef=spec.get("PREDEF", False),
                )
                if not r:
                    return None
                out.append((case, toks[i], r))
            else:
                out.append(("", "", 100))
        else:
            out.append(("", "", 100))
    return out


def token_match(
    doc: TokenDoc | str,
    pattern: list[dict],
    min_r: int = 75,
) -> list[list[tuple[str, str, int]]]:
    """Reference-shaped output: one value-list per matching window,
    order-preserving deduped by values."""
    if isinstance(doc, str):
        doc = tokenize(doc)
    toks = doc.token_texts()
    n = len(pattern)
    matches = []
    for i in range(len(toks) - n + 1):
        m = _eval_window(toks[i : i + n], pattern, min_r)
        if m and m not in matches:
            matches.append(m)
    return matches


def token_spans(
    doc: TokenDoc | str,
    pattern: list[dict],
    min_r: int = 75,
) -> list[tuple[int, int, int]]:
    """(start, end, ratio) spans; ratio is the char-length-weighted mean of
    per-slot ratios (reference M3 ``_calc_ratio``)."""
    if isinstance(doc, str):
        doc = tokenize(doc)
    toks = doc.token_texts()
    n = len(pattern)
    spans = []
    for i in range(len(toks) - n + 1):
        m = _eval_window(toks[i : i + n], pattern, min_r)
        if not m:
            continue
        total = sum(len(t) for t in toks[i : i + n])
        if total == 0:
            continue
        ratio = round(
            sum(r * len(t) for t, (_, _, r) in zip(toks[i : i + n], m)) / total
        )
        spans.append((i, i + n, ratio))
    return spans
