"""Vector-similarity phrase search — the SimilarityMatcher analog (S6 span
level).

Mirrors the reference's ``SimilaritySearcher`` (reference:
``_search/similaritysearcher.py:26-54``: ``compare`` = ``round(s1.similarity
(s2) * 100)`` where spaCy ``similarity`` is the cosine of mean-pooled token
vectors, 0 when either side has no vector norm) and its matcher wrapper
(reference: ``matcher/similaritymatcher.py`` — a PhraseMatcher whose scorer
is the vector compare, sharing scan/optimize/flex semantics).

The engine analog swaps spaCy's vocab vectors for an explicit **lexicon**
(token -> vector mapping). Driver-side it is a plain dict; in the
distributed matcher the lexicon rides a Spark broadcast next to the pattern
list — at corpus scale the lexicon is vocabulary-sized (small dim table),
the corpus is the big side.
"""

from __future__ import annotations

import numpy as np

from .phrasesearch import match as _phrase_match
from .tokenizer import TokenDoc, tokenize

__all__ = ["pooled_vector", "similarity_compare", "similarity_match"]


def pooled_vector(
    tokens: list[str], lexicon: dict[str, np.ndarray]
) -> np.ndarray | None:
    """Mean of the tokens' vectors (spaCy ``Doc.vector`` semantics: OOV
    tokens contribute zero vectors and still count in the denominator).
    Returns None for an empty token list or an empty lexicon."""
    if not tokens or not lexicon:
        return None
    dim = len(next(iter(lexicon.values())))
    acc = np.zeros(dim, dtype=np.float64)
    for t in tokens:
        v = lexicon.get(t)
        if v is not None:
            acc += np.asarray(v, dtype=np.float64)
    return acc / len(tokens)


def similarity_compare(
    s1: str,
    s2: str,
    lexicon: dict[str, np.ndarray],
    *,
    min_r: int = 0,
    ignore_case: bool = True,
) -> int:
    """``round(cosine(pooled(s1), pooled(s2)) * 100)``, 0 below ``min_r``
    or when either pooled vector has zero norm (reference contract:
    vector-less containers always score 0)."""
    if ignore_case:
        s1, s2 = s1.lower(), s2.lower()
    v1 = pooled_vector(tokenize(s1).token_texts(), lexicon)
    v2 = pooled_vector(tokenize(s2).token_texts(), lexicon)
    if v1 is None or v2 is None:
        return 0
    n1, n2 = float(np.linalg.norm(v1)), float(np.linalg.norm(v2))
    if n1 == 0.0 or n2 == 0.0:
        return 0
    r = round(100 * float(np.dot(v1, v2)) / (n1 * n2))
    return r if r >= min_r else 0


def similarity_match(
    doc: TokenDoc | str,
    query: TokenDoc | str,
    lexicon: dict[str, np.ndarray],
    *,
    min_r: int = 75,
    thresh: int = 100,
    min_r1: int | None = None,
    min_r2: int | None = None,
    flex: int | str = "default",
    ignore_case: bool = True,
) -> list[tuple[int, int, int]]:
    """Two-phase vector-similarity phrase search over one document.

    Reuses the fuzzy searcher's scan/optimize/overlap-filter control flow
    (P1-P4) with the pooled-cosine compare — exactly the reference's
    SimilarityMatcher-extends-PhraseMatcher structure."""

    def compare_fn(s1: str, s2: str, cutoff: int, ic: bool) -> int:
        return similarity_compare(s1, s2, lexicon, min_r=cutoff, ignore_case=ic)

    return _phrase_match(
        doc,
        query,
        min_r=min_r,
        thresh=thresh,
        min_r1=min_r1,
        min_r2=min_r2,
        flex=flex,
        ignore_case=ignore_case,
        compare_fn=compare_fn,
    )
