"""End-to-end pipeline tests: recall vs planted truth, sha invariant, resume."""

import pytest

from spaczz_spark.plans.config import DedupConfig
from spaczz_spark.plans.pipeline import DedupPipeline


@pytest.fixture(scope="module")
def pipeline_run(spark, tiny_corpus, tiny_files, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ckpt"))
    cfg = DedupConfig()
    pipe = DedupPipeline(spark, cfg, root)
    components = pipe.run(tiny_files)
    return pipe, components, root, cfg


def test_components_schema(pipeline_run):
    _, components, _, _ = pipeline_run
    cols = set(components.columns)
    assert {
        "repo", "path", "commit", "lang", "file_id", "content_sha256",
        "component_id", "stages", "max_jaccard", "max_edit_ratio",
    } <= cols


def test_every_file_assigned_exactly_once(pipeline_run, tiny_corpus):
    _, components, _, _ = pipeline_run
    n = components.count()
    assert n == len(tiny_corpus.files)
    assert components.select("file_id").distinct().count() == n


def test_pair_recall_at_least_099(pipeline_run, spark, tiny_corpus):
    pipe, components, _, _ = pipeline_run
    truth = spark.createDataFrame(tiny_corpus.truth_pairs)
    recall = pipe.pair_recall(components, truth)
    assert recall >= 0.99, pipe.metrics


def test_pair_prf(pipeline_run, spark, tiny_corpus):
    pipe, components, _, _ = pipeline_run
    truth_pairs = spark.createDataFrame(tiny_corpus.truth_pairs)
    truth_comps = spark.createDataFrame(tiny_corpus.truth_components)
    prf = pipe.pair_prf(components, truth_pairs, truth_comps)
    assert prf["recall"] >= 0.99
    # precision can dip slightly below 1.0 if the generator emits accidental
    # near-dups the truth tables don't know about
    assert prf["precision"] >= 0.95, prf
    assert prf["f1"] >= 0.97


def test_sha_invariant(pipeline_run, tiny_files):
    pipe, components, _, _ = pipeline_run
    assert pipe.sha_invariant_holds(tiny_files, components)


def test_negatives_stay_apart(pipeline_run, spark, tiny_corpus):
    """Precision guard: the planted-truth components must not be merged
    wildly — number of multi-member components should be close to truth."""
    _, components, _, _ = pipeline_run
    truth_comps = tiny_corpus.truth_components
    n_truth_clusters = (
        truth_comps.groupby("component_key").size().loc[lambda s: s > 1].shape[0]
    )
    got = (
        components.groupBy("component_id").count().where("count > 1").count()
    )
    # Allow small deviation (generator can emit accidental near-dups)
    assert abs(got - n_truth_clusters) <= max(2, int(0.1 * n_truth_clusters)), (
        got,
        n_truth_clusters,
    )


def test_resume_is_identical_and_skips_work(pipeline_run, spark, tiny_files):
    pipe, components, root, cfg = pipeline_run
    first = sorted(
        (r["file_id"], r["component_id"])
        for r in components.select("file_id", "component_id").collect()
    )
    pipe2 = DedupPipeline(spark, cfg, root)
    components2 = pipe2.run(tiny_files)
    second = sorted(
        (r["file_id"], r["component_id"])
        for r in components2.select("file_id", "component_id").collect()
    )
    assert first == second
    # every checkpointed stage must have been resumed, not recomputed
    # (normalized, signatures, candidate_pairs, verified_pairs, components)
    resumed = [k for k in pipe2.metrics if k.endswith("_resumed")]
    assert len(resumed) >= 5, pipe2.metrics


def test_config_change_invalidates_checkpoints(spark, tiny_files, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ckpt2"))
    cfg = DedupConfig(jaccard_min=0.8)
    pipe = DedupPipeline(spark, cfg, root)
    pipe.run(tiny_files)
    cfg2 = DedupConfig(jaccard_min=0.9)
    pipe2 = DedupPipeline(spark, cfg2, root)
    pipe2.run(tiny_files)
    assert not any(k.endswith("_resumed") for k in pipe2.metrics), pipe2.metrics


def test_empty_shingle_pairs_do_not_divide_by_zero(spark):
    """Token-free (whitespace-only) files share the sentinel MinHash and
    always become LSH candidates; the Jaccard expression must not 0/0 under
    ANSI mode, and the pair must fall through to the InDel kernel."""
    import pandas as pd

    from spaczz_spark.operators.dedup import minhash_neardup_pairs
    from spaczz_spark.operators.verify import verify_pairs
    from spaczz_spark.functions.signatures import (
        normalize, with_shingles, with_signatures,
    )

    files = spark.createDataFrame(
        pd.DataFrame(
            {
                "repo": ["r", "r"],
                "path": ["a", "b"],
                "commit": ["c", "c"],
                "lang": ["txt", "txt"],
                "content": ["   \n\t ", " \t\t\n"],
            }
        )
    )
    sigs = with_signatures(with_shingles(normalize(files), 3), 128, 42).select(
        "file_id", "content_sha256", "content", "n_bytes",
        "shingles", "n_shingles", "minhash", "simhash",
    )
    ids = [r["file_id"] for r in sigs.select("file_id").collect()]
    pairs = spark.createDataFrame(
        [(min(ids), max(ids), "minhash")], "a_id long, b_id long, stage string"
    )
    rows = verify_pairs(pairs, sigs).collect()  # must not raise DIVIDE_BY_ZERO
    # whitespace-only contents are similar enough for the InDel kernel
    assert all(r["verified_by"] in ("sha", "edit_ratio") for r in rows)

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["   \n", " \t "]})
    )
    out = minhash_neardup_pairs(docs, k=3, threshold=0.5)
    assert out.count() == 0  # no shared shingle -> not a Jaccard duplicate


def test_different_input_same_config_invalidates_resume(
    spark, tiny_files, tmp_path_factory
):
    """Checkpoint resume keys on (config_hash, input fingerprint): the same
    config over a DIFFERENT input corpus must rebuild every stage."""
    root = str(tmp_path_factory.mktemp("ckpt3"))
    cfg = DedupConfig()
    DedupPipeline(spark, cfg, root).run(tiny_files)

    other = tiny_files.limit(50)
    pipe2 = DedupPipeline(spark, cfg, root)
    pipe2.run(other)
    assert not any(k.endswith("_resumed") for k in pipe2.metrics), pipe2.metrics
    assert pipe2.metrics["normalized_rows"] == 50


def test_iceberg_validation_script_skips_cleanly(spark):
    """scripts/validate_iceberg.py must exit 0 with a SKIP message when the
    Iceberg runtime jar is absent (CI-style guard; with a jar it runs the
    full commit/resume/invalidate validation)."""
    import subprocess
    import sys as _sys

    proc = subprocess.run(
        [_sys.executable, "scripts/validate_iceberg.py"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "SKIP" in proc.stderr or "validated" in proc.stdout
