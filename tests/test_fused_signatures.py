"""Bit-identity of the fused single-pass signature UDF vs the composed
(chained) UDF shape it replaces.

The pipeline/streaming/dedup signature stages now run ONE ArrowEvalPython
node (``with_fused_signatures``) instead of chaining a shingle/fingerprint
UDF into MinHash/SimHash UDFs — the chained shape could deadlock at scale
(two pipelined Python runners per task, both socket directions full; see
``make_fused_signature_udf``'s docstring). These tests pin that the fusion
changed ONLY the physical shape: every signature column is exactly equal,
row by row, to the composed path's output, on a corpus that exercises the
edge rows (empty content, fewer tokens than k, non-ASCII, below/above the
fingerprint min-bytes gate).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spaczz_spark.functions.signatures import (
    with_fused_signatures,
    with_shingles,
    with_shingles_and_fingerprints,
    with_signatures,
)

EDGE_ROWS = [
    ("empty", ""),
    ("null_like", " \n\t "),
    ("one_token", "x"),
    ("two_tokens", "if x"),
    ("nonascii", "def café(α, β): return α + β\n" * 8),
    ("short_under_fp_gate", "return 1 + 2"),
]


@pytest.fixture(scope="module")
def sig_input(spark, tiny_files):
    base = tiny_files.select(
        F.xxhash64("repo", "path", "commit").alias("file_id"), "content"
    )
    edges = spark.createDataFrame(
        pd.DataFrame(
            {"file_id": range(len(EDGE_ROWS)),
             "content": [c for _, c in EDGE_ROWS]}
        )
    )
    return base.unionByName(edges)


def _collected(df, cols):
    return (
        df.select("file_id", *cols)
        .toPandas()
        .sort_values("file_id")
        .reset_index(drop=True)
    )


def _assert_frames_equal(got, want, cols):
    assert len(got) == len(want) and len(got) > 0
    for c in cols:
        for i, (g, w) in enumerate(zip(got[c], want[c])):
            if isinstance(g, (list, tuple)) or hasattr(g, "__len__"):
                assert list(g) == list(w), f"{c} differs at row {i}"
            else:
                assert g == w, f"{c} differs at row {i}: {g} != {w}"


def test_fused_equals_composed_with_fingerprints(sig_input):
    cols = [
        "shingles", "n_shingles", "minhash", "simhash",
        "fingerprints", "fp_positions",
    ]
    composed = with_signatures(
        with_shingles_and_fingerprints(sig_input, 3, 32, 32, 100), 128, 42
    )
    fused = with_fused_signatures(sig_input, 3, 128, 42, 32, 32, 100)
    _assert_frames_equal(
        _collected(fused, cols), _collected(composed, cols), cols
    )


def test_fused_equals_composed_without_fingerprints(sig_input):
    cols = ["shingles", "n_shingles", "minhash", "simhash"]
    composed = with_signatures(with_shingles(sig_input, 3), 128, 42)
    fused = with_fused_signatures(sig_input, 3, 128, 42)
    _assert_frames_equal(
        _collected(fused, cols), _collected(composed, cols), cols
    )
    assert "fingerprints" not in fused.columns


def test_fused_fingerprint_metadata_survives(sig_input):
    """substring_candidates validates winnowing params from the column
    metadata — the fused path must stamp them identically."""
    fused = with_fused_signatures(sig_input, 3, 128, 42, 32, 32, 100)
    meta = fused.schema["fingerprints"].metadata
    assert (meta["fp_k"], meta["fp_w"], meta["fp_min_bytes"]) == (32, 32, 100)


def test_fused_single_python_eval_node(sig_input):
    """The whole point: ONE ArrowEvalPython node in the physical plan
    (the composed shape has two, which is the deadlock-prone pipeline)."""
    fused = with_fused_signatures(sig_input, 3, 128, 42, 32, 32, 100).select(
        "file_id", "shingles", "minhash", "simhash", "fingerprints"
    )
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan
    composed = with_signatures(
        with_shingles_and_fingerprints(sig_input, 3, 32, 32, 100), 128, 42
    ).select("file_id", "shingles", "minhash", "simhash", "fingerprints")
    cplan = composed._jdf.queryExecution().executedPlan().toString()
    assert cplan.count("ArrowEvalPython") >= 2, cplan


def test_partial_fingerprint_params_rejected_eagerly(sig_input):
    """ADVICE r6: a partial (fp_k, fp_w, fp_min_bytes) set must fail at
    plan-build time, not deep inside the executor UDF."""
    with pytest.raises(ValueError, match="must be set together"):
        with_fused_signatures(sig_input, 3, 128, 42, fp_k=32)
    with pytest.raises(ValueError, match="must be set together"):
        with_fused_signatures(sig_input, 3, 128, 42, fp_k=32, fp_w=32)
