"""Predefined regex pattern registry (SURVEY.md §2.1 S8).

Provides the same 16 public key names as the reference's registry
(reference: ``registry/repatterns.py:8-141``) so user queries written against
the reference's `predef=True` surface keep working. The pattern bodies are
written independently from common public regex idioms — they are deliberately
NOT copies of the reference's patterns (which themselves derive from the
CommonRegex project); behavioral parity is asserted on the reference's test
fixtures, not pattern-text equality.
"""

from __future__ import annotations

import regex as re

__all__ = ["RE_PATTERNS", "get_re_pattern", "parse_regex", "RegexParseError"]


class RegexParseError(Exception):
    """Raised when a pattern string fails to compile."""


_MONTH = (
    r"(?:jan(?:uary)?|feb(?:ruary)?|mar(?:ch)?|apr(?:il)?|may|jun(?:e)?|"
    r"jul(?:y)?|aug(?:ust)?|sep(?:tember)?|oct(?:ober)?|nov(?:ember)?|"
    r"dec(?:ember)?)\.?"
)

_PATTERN_SOURCES: dict[str, str] = {
    "dates": (
        r"(?ix)\b(?:"
        rf"[0-3]?\d(?:st|nd|rd|th)?\s+(?:of\s+)?{_MONTH}(?:,?\s*\d{{4}})?"
        rf"|{_MONTH}\s+[0-3]?\d(?:st|nd|rd|th)?(?:,?\s*\d{{4}})?"
        r"|[0-3]?\d[-/.][0-3]?\d[-/.]\d{2,4}"
        r")"
    ),
    "times": r"(?i)\b\d{1,2}:\d{2}(?::\d{2})?\s?(?:[ap]\.?m\.?)?|\b\d{1,2}\s?[ap]\.?m\.?",
    "phones": (
        r"(?x)(?<![\d-])"
        r"(?:\+?\d{1,2}[\s.-]?)?"
        r"(?:\(\d{3}\)|\d{3})[\s.-]?"
        r"\d{3}[\s.-]?\d{4}"
        r"(?![\d-])"
    ),
    "phones_with_exts": (
        r"(?ix)(?<![\d-])"
        r"(?:\+?\d{1,2}[\s.-]?)?"
        r"(?:\(\d{3}\)|\d{3})[\s.-]?"
        r"\d{3}[\s.-]?\d{4}"
        r"\s*(?:\#|x\.?|ext\.?|extension)\s*\d{1,5}"
    ),
    "links": (
        r"(?i)\b(?:https?://|www\.)[^\s<>\"]+"
        r"|\b[a-z0-9][a-z0-9.-]*\.(?:com|org|net|edu|gov|mil|io|co|us|uk|de|fr|"
        r"info|biz|dev|app|ai)\b(?:/[^\s<>\"]*)?"
    ),
    "emails": r"(?i)\b[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}\b",
    "ips": (
        r"\b(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
        r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\b"
    ),
    "ipv6s": (
        r"(?i)\b(?:[0-9a-f]{1,4}:){7}[0-9a-f]{1,4}\b"
        r"|(?i)\b(?:[0-9a-f]{1,4}:){1,7}:(?:[0-9a-f]{1,4}(?::[0-9a-f]{1,4})*)?\b"
    ),
    "prices": r"[$€£]\s?\d{1,3}(?:,\d{3})*(?:\.\d{1,2})?|\b\d+\s?(?:USD|EUR|GBP)\b",
    "hex_colors": r"#(?:[0-9a-fA-F]{6}|[0-9a-fA-F]{3})\b",
    "credit_cards": r"\b(?:\d{4}[ -]?){3}\d{1,4}\b",
    "btc_addresses": r"\b[13][a-km-zA-HJ-NP-Z1-9]{25,34}\b",
    "street_addresses": (
        r"(?i)\b\d{1,5}\s+(?:[a-z0-9'.-]+\s+){0,3}"
        r"(?:street|st|avenue|ave|road|rd|boulevard|blvd|lane|ln|drive|dr|"
        r"court|ct|circle|cir|way|place|pl|terrace|ter|parkway|pkwy)\b\.?"
    ),
    "zip_codes": r"\b\d{5}(?:-\d{4})?\b",
    "po_boxes": r"(?i)\bp\.?\s?o\.?\s?box\s+\d+",
    "ssn_numbers": r"\b\d{3}-\d{2}-\d{4}\b",
}

RE_PATTERNS: dict[str, re.Pattern] = {
    name: re.compile(src) for name, src in _PATTERN_SOURCES.items()
}


def get_re_pattern(name: str) -> re.Pattern:
    """Look up a predefined pattern by key name (ValueError on unknown)."""
    try:
        return RE_PATTERNS[name]
    except KeyError:
        raise ValueError(
            f"unknown predef pattern {name!r}; known: {sorted(RE_PATTERNS)}"
        ) from None


def parse_regex(regex_str: str, predef: bool = False) -> re.Pattern:
    """Compile a pattern string, or look up a predefined pattern.

    Mirrors the reference contract (``searchutil.py:44-76``): raises
    ``RegexParseError`` on compilation failure.
    """
    if predef:
        return get_re_pattern(regex_str)
    try:
        return re.compile(regex_str)
    except (re.error, TypeError, ValueError) as e:
        raise RegexParseError(str(e)) from e
