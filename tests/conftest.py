"""Shared fixtures: one SparkSession per test session, tiny planted corpus."""

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Python workers spawned by the JVM need the repo on their import path.
os.environ["PYTHONPATH"] = (
    REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
)
sys.path.insert(0, REPO_ROOT)


@pytest.fixture(scope="session")
def spark():
    from spaczz_spark.plans.pipeline import recommended_session

    s = recommended_session(
        app="spaczz-tests", master="local[4]", shuffle_partitions=8
    )
    s.sparkContext.setLogLevel("WARN")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_corpus():
    """Deterministic planted corpus (pandas bundle), ~200 base files."""
    from spaczz_spark.sources.corpus import generate_corpus

    return generate_corpus(n_files=200, seed=42, boilerplate_cluster=30)


@pytest.fixture(scope="session")
def tiny_files(spark, tiny_corpus):
    return spark.createDataFrame(tiny_corpus.files)
