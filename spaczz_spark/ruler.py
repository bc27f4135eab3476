"""Driver-side ruler: labeled pattern store with (de)serialization (M2, M7).

Mirrors the reference's pattern-store surface (reference:
``matcher/_phrasematcher.py:108-161`` add/remove/labels/patterns;
``pipeline/spaczzruler.py:676-882`` to_disk/from_disk JSONL + cfg):

- ``add_patterns`` takes the ruler's JSONL entry shape
  ``{"label", "pattern", "type", "kwargs"?, "id"?}`` (token patterns carry
  their token-dict list in ``pattern``);
- ``to_disk``/``from_disk`` round-trip patterns as JSONL plus a JSON cfg —
  the run-manifest form the distributed pipeline persists;
- ``apply`` fans the store out over a corpus DataFrame via
  ``operators.matcher.ruler`` (broadcast patterns × Arrow-batched kernels).
"""

from __future__ import annotations

import json
import os
import warnings

from pyspark.sql import DataFrame

from .operators.matcher import Pattern, ruler as _ruler_op

__all__ = ["SpaczzRuler", "KwargsWarning"]

_VALID_TYPES = {"fuzzy", "regex", "token", "similarity"}


class KwargsWarning(UserWarning):
    """len(kwargs) != len(patterns) in ``add`` — zip-padded/truncated
    (reference contract: ``matcher/_phrasematcher.py:119-135``)."""


class SpaczzRuler:
    def __init__(self, defaults: dict | None = None):
        self._patterns: list[Pattern] = []
        self.defaults = dict(defaults or {})
        self._callbacks: dict[str, object] = {}

    # -- CRUD (M2) -------------------------------------------------------------
    def add_patterns(self, entries: list[dict]) -> None:
        for e in entries:
            ptype = e.get("type", "fuzzy")
            if ptype not in _VALID_TYPES:
                raise ValueError(
                    f"pattern type must be one of {sorted(_VALID_TYPES)}, "
                    f"got {ptype!r}"
                )
            pattern = e["pattern"]
            if ptype == "token":
                if not isinstance(pattern, str):
                    pattern = json.dumps(pattern)
            elif not isinstance(pattern, str):
                raise ValueError("fuzzy/regex patterns must be strings")
            self._patterns.append(
                Pattern(
                    label=e["label"],
                    pattern=pattern,
                    type=ptype,
                    kwargs=dict(e.get("kwargs", {})),
                    id=str(e.get("id", "")),
                )
            )

    def add(
        self,
        label: str,
        patterns: list,
        kwargs: list[dict] | None = None,
        type: str = "fuzzy",
        on_match=None,
    ) -> None:
        """Matcher-style add (reference: ``matcher/_phrasematcher.py:108-145``):
        one label, a list of patterns, an optional parallel kwargs list
        (zip-padded/truncated with a KwargsWarning on length mismatch), and
        an optional per-label ``on_match`` callback applied after span
        resolution (see ``operators.matcher.apply_callbacks``)."""
        if not isinstance(patterns, list):
            raise TypeError("patterns must be a list")
        if kwargs is None:
            kwargs = [{} for _ in patterns]
        elif len(kwargs) < len(patterns):
            warnings.warn(
                "There are more patterns then there are kwargs. "
                "Patterns not matched to a kwarg dict will have "
                "default settings.",
                KwargsWarning,
                stacklevel=2,
            )
            kwargs = kwargs + [{} for _ in range(len(patterns) - len(kwargs))]
        elif len(kwargs) > len(patterns):
            warnings.warn(
                "There are more kwargs dicts than patterns. "
                "The extra kwargs will be ignored.",
                KwargsWarning,
                stacklevel=2,
            )
            kwargs = kwargs[: len(patterns)]
        for kw in kwargs:
            if not isinstance(kw, dict):
                raise TypeError("kwargs must be a list of dicts")
        self.add_patterns(
            [
                {"label": label, "pattern": p, "type": type, "kwargs": kw}
                for p, kw in zip(patterns, kwargs)
            ]
        )
        self._callbacks[label] = on_match

    def remove(self, label: str) -> int:
        """Remove all patterns under a label; returns how many were removed."""
        before = len(self._patterns)
        self._patterns = [p for p in self._patterns if p.label != label]
        removed = before - len(self._patterns)
        if not removed:
            raise ValueError(f"no patterns with label {label!r}")
        self._callbacks.pop(label, None)
        return removed

    @property
    def labels(self) -> list[str]:
        seen: dict[str, None] = {}
        for p in self._patterns:
            seen.setdefault(p.label)
        return list(seen)

    @property
    def patterns(self) -> list[dict]:
        out = []
        for p in self._patterns:
            e: dict = {"label": p.label, "type": p.type}
            e["pattern"] = (
                json.loads(p.pattern) if p.type == "token" else p.pattern
            )
            if p.kwargs:
                e["kwargs"] = p.kwargs
            if p.id:
                e["id"] = p.id
            out.append(e)
        return out

    def __len__(self) -> int:
        return len(self._patterns)

    def __contains__(self, label: str) -> bool:
        return any(p.label == label for p in self._patterns)

    # -- serialization (M7) -----------------------------------------------------
    def to_disk(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "patterns.jsonl"), "w") as f:
            for e in self.patterns:
                f.write(json.dumps(e, sort_keys=True) + "\n")
        with open(os.path.join(path, "cfg.json"), "w") as f:
            json.dump(self.defaults, f, indent=2, sort_keys=True)

    @classmethod
    def from_disk(cls, path: str) -> "SpaczzRuler":
        with open(os.path.join(path, "cfg.json")) as f:
            ruler = cls(defaults=json.load(f))
        with open(os.path.join(path, "patterns.jsonl")) as f:
            ruler.add_patterns([json.loads(line) for line in f if line.strip()])
        return ruler

    def to_bytes(self) -> bytes:
        return json.dumps(
            {"cfg": self.defaults, "patterns": self.patterns}, sort_keys=True
        ).encode()

    @classmethod
    def from_bytes(cls, data: bytes) -> "SpaczzRuler":
        obj = json.loads(data.decode())
        ruler = cls(defaults=obj.get("cfg", {}))
        ruler.add_patterns(obj.get("patterns", []))
        return ruler

    # -- execution (M1/M4/M5) ----------------------------------------------------
    def apply(
        self,
        docs: DataFrame,
        *,
        id_col: str = "doc_id",
        text_col: str = "text",
        lexicon: dict | None = None,
    ) -> DataFrame:
        return _ruler_op(
            docs,
            self._patterns,
            id_col=id_col,
            text_col=text_col,
            lexicon=lexicon,
            callbacks=self._callbacks,
        )
