"""Incremental/streaming dedup tests: state-store joins + availableNow stream."""

import os

import pytest
from pyspark.sql import functions as F

from spaczz_spark.plans.config import DedupConfig
from spaczz_spark.sources.corpus import generate_corpus
from spaczz_spark.streaming.incremental import IncrementalDedup


@pytest.fixture(scope="module")
def split_corpus():
    bundle = generate_corpus(n_files=60, seed=7)
    files = bundle.files
    # first half seeds the store; second half arrives as "new" batches and
    # includes duplicates of first-half files (generator interleaves dups)
    mid = len(files) // 2
    return files.iloc[:mid], files.iloc[mid:]


def test_process_batch_finds_cross_batch_dups(spark, split_corpus, tmp_path):
    seed, incoming = split_corpus
    inc = IncrementalDedup(spark, DedupConfig(), str(tmp_path / "store"))
    first = inc.process_batch(spark.createDataFrame(seed))
    n_first = first.count()
    second = inc.process_batch(spark.createDataFrame(incoming))
    n_second = second.count()
    assert n_second > 0  # dups of seed files arrive in batch 2
    # state accumulated: signature store holds both batches
    sigs = spark.read.parquet(os.path.join(str(tmp_path / "store"), "signatures"))
    assert sigs.count() == len(seed) + len(incoming)
    # verified pairs appended across batches
    pairs = spark.read.parquet(
        os.path.join(str(tmp_path / "store"), "verified_pairs")
    )
    assert pairs.count() == n_first + n_second


def test_streaming_available_now(spark, split_corpus, tmp_path):
    seed, incoming = split_corpus
    inp = str(tmp_path / "in")
    os.makedirs(inp)
    spark.createDataFrame(seed).coalesce(1).write.mode("append").parquet(inp)
    spark.createDataFrame(incoming).coalesce(1).write.mode("append").parquet(inp)

    inc = IncrementalDedup(spark, DedupConfig(), str(tmp_path / "store2"))
    schema = spark.read.parquet(inp).schema
    q = inc.start(inp, schema, str(tmp_path / "ckpt"), maxFilesPerTrigger=1)
    q.awaitTermination(300)
    pairs = spark.read.parquet(
        os.path.join(str(tmp_path / "store2"), "verified_pairs")
    )
    assert pairs.count() > 0
    sigs = spark.read.parquet(os.path.join(str(tmp_path / "store2"), "signatures"))
    assert sigs.count() == len(seed) + len(incoming)
    # dedup semantics: every pair references stored signatures
    ids = {r["file_id"] for r in sigs.select("file_id").collect()}
    for r in pairs.select("a_id", "b_id").collect():
        assert r["a_id"] in ids and r["b_id"] in ids
