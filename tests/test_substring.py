"""S2 partial_ratio at corpus scale (round-5 ask #1).

The reference's ``partial_ratio`` (``registry/fuzzyfuncs.py:9``) scores the
best *approximate* alignment of the shorter string inside the longer — a file
pasted into a larger host and then lightly edited still gets credit. The
engine's substring stage used to verify verbatim containment only; these
tests pin the fingerprint-anchored partial scoring that closes that gap:

- kernel: ``anchored_partial_ratio`` equals the unrestricted O(n*m)
  ``partial_ratio`` sweep on light-edit embeddings (and is O(window));
- operator: ``verify_substring_pairs(min_partial=...)`` labels verbatim
  pairs ``containment`` and edited embeddings ``partial``;
- pipeline: planted embedded-with-edits duplicates (not recallable by
  verbatim containment NOR by Jaccard — the host dilutes the shingle set)
  are recovered with recall >= 0.99.
"""

import random

import pytest

from spaczz_spark.operators.substring import anchored_partial_ratio
from spaczz_spark.operators.verify import CHAR_KERNEL_MAX
from spaczz_spark.ratios import partial_ratio

_WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lambda", "sigma",
]


def _gen(rng: random.Random, n_tokens: int) -> str:
    return " ".join(
        rng.choice(_WORDS) + str(rng.randint(0, 9999)) for _ in range(n_tokens)
    )


def _spaced_edit(text: str, every: int) -> str:
    toks = text.split(" ")
    for i in range(every // 2, len(toks), every):
        toks[i] = f"EDITED{i}"
    return " ".join(toks)


# ---------------------------------------------------------------------------
# kernel (no Spark)
# ---------------------------------------------------------------------------


def test_anchored_verbatim_is_100():
    rng = random.Random(1)
    short = _gen(rng, 120)
    host = _gen(rng, 300) + "\n\n" + short + "\n\n" + _gen(rng, 200)
    assert anchored_partial_ratio(short, host) == 100.0


def test_anchored_matches_full_sweep_on_light_edits():
    """On spaced-edit embeddings the anchored score must equal the
    unrestricted partial_ratio sweep (the shared-gram votes recover the
    true embedding offset)."""
    for seed in (2, 3, 4):
        rng = random.Random(seed)
        short = _gen(rng, 100 + 20 * seed)
        edited = _spaced_edit(short, every=40)
        host = _gen(rng, 250) + "\n\n" + edited + "\n\n" + _gen(rng, 250)
        anchored = anchored_partial_ratio(short, host)
        full = partial_ratio(short, host)
        assert anchored > 90.0, (seed, anchored)
        assert abs(anchored - full) < 0.5, (seed, anchored, full)


def test_anchored_is_order_insensitive():
    rng = random.Random(5)
    short = _gen(rng, 120)
    host = _gen(rng, 300) + " " + _spaced_edit(short, 50) + " " + _gen(rng, 100)
    assert anchored_partial_ratio(short, host) == anchored_partial_ratio(
        host, short
    )


def test_anchored_unrelated_is_low():
    rng = random.Random(6)
    a, b = _gen(rng, 150), _gen(rng, 600)
    # no shared 32-byte gram at all -> no anchor -> 0 (not a full sweep)
    assert anchored_partial_ratio(a, b) == 0.0


def test_anchored_score_cutoff():
    rng = random.Random(7)
    short = _gen(rng, 120)
    host = _gen(rng, 200) + " " + _spaced_edit(short, 30) + " " + _gen(rng, 200)
    raw = anchored_partial_ratio(short, host)
    assert raw > 0
    assert anchored_partial_ratio(short, host, score_cutoff=raw + 1) == 0.0
    assert anchored_partial_ratio(short, host, score_cutoff=raw - 1) == raw


def test_anchored_empty_and_tiny_inputs():
    assert anchored_partial_ratio("", "anything at all here") == 0.0
    assert anchored_partial_ratio("xy", "abcdefgh") == 0.0  # < k, padded grams


def test_anchored_large_strings_token_fallback():
    """Above CHAR_KERNEL_MAX bytes the window is scored token-level (the
    same documented bounded-cost fallback as the InDel verify kernel) —
    still ~100 for an embedded lightly-edited copy, and fast."""
    rng = random.Random(8)
    short = _gen(rng, CHAR_KERNEL_MAX // 4)  # ~2.5x CHAR_KERNEL_MAX bytes
    assert len(short.encode()) > CHAR_KERNEL_MAX
    edited = _spaced_edit(short, every=80)
    host = _gen(rng, 500) + "\n\n" + edited + "\n\n" + _gen(rng, 500)
    sc = anchored_partial_ratio(short, host)
    assert sc > 95.0, sc


# ---------------------------------------------------------------------------
# operator: verify_substring_pairs
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def verify_fixture(spark):
    from pyspark.sql import functions as F

    rng = random.Random(11)
    base = _gen(rng, 150)
    host_verbatim = _gen(rng, 300) + "\n\n" + base + "\n\n" + _gen(rng, 100)
    host_edited = (
        _gen(rng, 300) + "\n\n" + _spaced_edit(base, 60) + "\n\n" + _gen(rng, 100)
    )
    unrelated = _gen(rng, 500)
    corpus = spark.createDataFrame(
        [
            (1, base),
            (2, host_verbatim),
            (3, host_edited),
            (4, unrelated),
        ],
        ["file_id", "content"],
    )
    pairs = spark.createDataFrame(
        [(1, 2, "substring"), (1, 3, "substring"), (1, 4, "substring")],
        ["a_id", "b_id", "stage"],
    )
    return corpus, pairs


def test_verify_substring_partial_labels(spark, verify_fixture):
    from spaczz_spark.operators.substring import verify_substring_pairs

    corpus, pairs = verify_fixture
    out = {
        r["b_id"]: r
        for r in verify_substring_pairs(
            pairs, corpus, min_len=100, min_partial=75
        ).collect()
    }
    assert out[2]["verified_by"] == "containment"
    assert out[2]["edit_ratio"] == 100
    assert out[3]["verified_by"] == "partial"
    assert 75 <= out[3]["edit_ratio"] < 100
    assert 4 not in out  # shares no real containment
    # schema parity with verify.verify_pairs output
    assert set(out[2].asDict()) == {
        "a_id", "b_id", "stage", "jaccard", "edit_ratio", "verified_by",
    }


def test_verify_substring_default_is_verbatim_only(spark, verify_fixture):
    """min_partial=None (the oracle-exact config) must reproduce the old
    behavior exactly: verbatim containment only."""
    from spaczz_spark.operators.substring import verify_substring_pairs

    corpus, pairs = verify_fixture
    rows = verify_substring_pairs(pairs, corpus, min_len=100).collect()
    assert [(r["b_id"], r["verified_by"], r["edit_ratio"]) for r in rows] == [
        (2, "containment", 100)
    ]


# ---------------------------------------------------------------------------
# pipeline: planted embedded-with-edits recall gate (>= 0.99)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def edited_corpus():
    from spaczz_spark.sources.corpus import generate_corpus

    return generate_corpus(n_files=120, seed=9, substring_edited=12)


def test_pipeline_recalls_embedded_with_edits(
    spark, edited_corpus, tmp_path_factory
):
    from spaczz_spark.plans.config import DedupConfig
    from spaczz_spark.plans.pipeline import DedupPipeline

    root = str(tmp_path_factory.mktemp("ckpt_sub"))
    pipe = DedupPipeline(spark, DedupConfig(), root)  # substring_partial=True
    components = pipe.run(spark.createDataFrame(edited_corpus.files))
    truth = spark.createDataFrame(
        edited_corpus.truth_pairs.query("kind == 'substring_edited'")
    )
    assert truth.count() == 12
    recall = pipe.pair_recall(components, truth)
    assert recall >= 0.99, pipe.metrics


def test_partial_path_is_what_recalls_them(spark, edited_corpus, tmp_path_factory):
    """Negative control: with substring_partial=False (verbatim-only verify,
    the oracle-exact config) the edited embeddings must NOT be broadly
    recalled — proving the recall above comes from the partial_ratio path,
    not from Jaccard or accidental verbatim containment."""
    from spaczz_spark.plans.config import DedupConfig
    from spaczz_spark.plans.pipeline import DedupPipeline

    root = str(tmp_path_factory.mktemp("ckpt_sub_off"))
    pipe = DedupPipeline(
        spark, DedupConfig(substring_partial=False), root
    )
    components = pipe.run(spark.createDataFrame(edited_corpus.files))
    truth = spark.createDataFrame(
        edited_corpus.truth_pairs.query("kind == 'substring_edited'")
    )
    recall = pipe.pair_recall(components, truth)
    assert recall <= 0.5, pipe.metrics
