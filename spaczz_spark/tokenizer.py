"""Offset-preserving rule tokenizer.

A minimal stand-in for ``spacy.blank("en")`` tokenization (spaCy is not
installed in this environment), implementing the rules the reference's golden
test fixtures depend on:

- whitespace splitting
- leading/trailing punctuation split into their own tokens
  (``"named:"`` -> ``named``, ``:``; ``"goldriesling."`` -> ``goldriesling``, ``.``)
- English contraction suffixes split off (``"Don't"`` -> ``Do``, ``n't``)
- infix hyphens split (``"Abdul-Jabbar"`` -> ``Abdul``, ``-``, ``Jabbar``)

Each token carries its character span into the original text so that span
text is reconstructed exactly (``TokenDoc.span_text``), mirroring
``Doc.__getitem__``/``Span.text`` semantics the reference relies on
(reference: ``_search/phrasesearcher.py`` uses ``doc[i:j]`` slices).
"""

from __future__ import annotations

from typing import NamedTuple

__all__ = ["Token", "TokenDoc", "tokenize"]

_PUNCT = set(".,;:!?()[]{}<>\"'`“”‘’…«»~*&%$#@^|/\\")
_SUFFIXES = ("n't", "'s", "'m", "'re", "'ve", "'ll", "'d")


class Token(NamedTuple):
    text: str
    start: int  # char offset into the source text (inclusive)
    end: int  # char offset (exclusive)


class TokenDoc:
    """A tokenized text with char offsets; supports len() and span slicing."""

    __slots__ = ("text", "tokens")

    def __init__(self, text: str, tokens: list[Token]):
        self.text = text
        self.tokens = tokens

    def __len__(self) -> int:
        return len(self.tokens)

    def span_text(self, start: int, end: int) -> str:
        """Original text covered by tokens[start:end] (like ``Span.text``)."""
        if start >= end:
            return ""
        return self.text[self.tokens[start].start : self.tokens[end - 1].end]

    def token_texts(self) -> list[str]:
        return [t.text for t in self.tokens]


def _split_chunk(chunk: str, base: int, out: list[Token]) -> None:
    """Tokenize one whitespace-free chunk, appending Tokens to ``out``."""
    start, end = 0, len(chunk)
    # Leading punctuation, one char at a time.
    while start < end and chunk[start] in _PUNCT:
        out.append(Token(chunk[start], base + start, base + start + 1))
        start += 1
    # Trailing punctuation, collected then emitted after the core.
    trail: list[Token] = []
    while end > start and chunk[end - 1] in _PUNCT:
        trail.append(Token(chunk[end - 1], base + end - 1, base + end))
        end -= 1
    core = chunk[start:end]
    if core:
        low = core.lower()
        suffix_len = 0
        for suf in _SUFFIXES:
            if low.endswith(suf) and len(core) > len(suf):
                suffix_len = len(suf)
                break
        head = core[: len(core) - suffix_len] if suffix_len else core
        # Infix hyphen split on the head.
        pos = start
        for part in head.split("-"):
            if part:
                out.append(Token(part, base + pos, base + pos + len(part)))
                pos += len(part)
            if pos < start + len(head):  # the hyphen itself
                out.append(Token("-", base + pos, base + pos + 1))
                pos += 1
        if suffix_len:
            sfx_start = start + len(head)
            out.append(
                Token(core[len(head) :], base + sfx_start, base + sfx_start + suffix_len)
            )
    out.extend(reversed(trail))


def tokenize(text: str) -> TokenDoc:
    """Tokenize ``text`` into a :class:`TokenDoc`."""
    tokens: list[Token] = []
    i, n = 0, len(text)
    while i < n:
        if text[i].isspace():
            i += 1
            continue
        j = i
        while j < n and not text[j].isspace():
            j += 1
        _split_chunk(text[i:j], i, tokens)
        i = j
    return TokenDoc(text, tokens)
