"""Vectorized ratio UDF registry — the engine's user-facing UDF surface.

The reference exposes its similarity kernels as a named registry users can
extend (reference: ``registry/fuzzyfuncs.py:8-26``, catalogue entry points).
The Spark analog: every registered kernel name resolves to an Arrow-batched
pandas UDF ``(string, string) -> int ratio`` with the same semantics
(``ignore_case``, ``min_r`` cutoff, reference rounding), and
``register_all`` installs them into a SparkSession as SQL functions
``spaczz_<name>(s1, s2)`` so the kernels are usable from spark.sql too.

Users add kernels with ``register_fuzzy_udf(name, fn)`` where fn is a plain
``(s1, s2, *, score_cutoff) -> float`` Python function — the wrapper does
the batching.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..ratios import FUZZY_FUNCS

__all__ = ["make_ratio_udf", "register_fuzzy_udf", "register_all", "RATIO_UDFS"]

RATIO_UDFS: dict[str, object] = {}


def make_ratio_udf(fn, *, ignore_case: bool = True, min_r: int = 0):
    """Wrap a scalar ratio kernel into an Arrow-batched pandas UDF."""

    @F.pandas_udf("int")
    def ratio_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
        out = []
        for a, b in zip(s1, s2):
            if a is None or b is None:
                out.append(0)
                continue
            if ignore_case:
                a, b = a.lower(), b.lower()
            out.append(round(fn(a, b, score_cutoff=min_r)))
        return pd.Series(out, dtype="int32")

    return ratio_udf


def register_fuzzy_udf(name: str, fn) -> None:
    """Register a user ratio kernel by name (reference: extensible
    fuzzy_funcs registry)."""
    RATIO_UDFS[name] = make_ratio_udf(fn)


for _name, _fn in FUZZY_FUNCS.items():
    if _name == "partial_alignment":  # returns a struct, not a ratio
        continue
    register_fuzzy_udf(_name, _fn)


def register_all(spark: SparkSession, prefix: str = "spaczz_") -> list[str]:
    """Install every registered kernel as a SQL function."""
    installed = []
    for name, udf in RATIO_UDFS.items():
        spark.udf.register(f"{prefix}{name}", udf)
        installed.append(f"{prefix}{name}")
    return installed
