#!/usr/bin/env python
"""Extra measurement harness for the optimization round (guide §1).

NOT the driver bench — bench.py stays frozen. This script isolates:

  stages   — per-stage walls of the flagship DedupPipeline on the bench
             corpus (fresh checkpoint dir, warm session, repeats, min)
  noop     — per-query noop-sink walls for the bench query set (repeats)
  explain  — .explain("formatted") of every bench query (and each pipeline
             stage's build DataFrame) into plans/r07/<name>_<tag>.txt

Usage: python bench_extra.py stages|noop|explain [tag]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLANS_DIR = os.path.join(REPO, "plans", "r07")


def session():
    from spaczz_spark.plans.pipeline import recommended_session

    s = recommended_session(
        app="spaczz-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def bench_files_path() -> str:
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_fixtures import make

    path = os.path.join(REPO, "fixtures", "files_bench")
    if not os.path.exists(os.path.join(path, "files.parquet")):
        make("bench")
    return os.path.join(path, "files.parquet")


def run_pipeline_with_stages(spark, files_path):
    from pyspark.sql import functions as F

    from spaczz_spark.plans.config import DedupConfig
    from spaczz_spark.plans.pipeline import DedupPipeline

    ckpt = tempfile.mkdtemp(prefix="spaczz_bx_")
    try:
        files = spark.read.parquet(files_path)
        n = files.count()
        t0 = time.time()
        pipe = DedupPipeline(spark, DedupConfig(), ckpt)
        comps = pipe.run(files)
        t1 = time.time()
        comps.select(F.count(F.lit(1)), F.countDistinct("component_id")).collect()
        m = {k: v for k, v in pipe.metrics.items() if k.endswith("_sec")}
        m["final_collect_sec"] = round(time.time() - t1, 2)
        m["cc_iterations"] = pipe.metrics.get("cc_iterations", -1)
        m["total_sec"] = round(time.time() - t0, 2)
        m["n_files"] = n
        return m
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def cmd_stages():
    spark = session()
    files_path = bench_files_path()
    reps = int(os.environ.get("BX_REPEATS", "3"))
    runs = []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"bx stages repeat {i}")
        runs.append(run_pipeline_with_stages(spark, files_path))
        print(json.dumps(runs[-1]), flush=True)
    best = min(runs, key=lambda m: m["total_sec"])
    print(json.dumps({"best": best, "all_total": [m["total_sec"] for m in runs]}))


def _bench_queries(spark):
    """Same query set + impl substitutions as bench.py."""
    from spaczz_spark import queries as Q

    def _bench_emb_topk_ann(spark, sf_dir):
        from spaczz_spark.operators.ann import lsh_cosine_topk

        emb = Q._emb(spark, sf_dir).repartition(
            spark.sparkContext.defaultParallelism
        )
        return lsh_cosine_topk(emb, k=5, n_bits=4, n_tables=32, n_probes=2)

    def _bench_emb_ivf_ann(spark, sf_dir):
        from spaczz_spark.operators.ann import ivf_cosine_topk

        emb = Q._emb(spark, sf_dir).repartition(
            spark.sparkContext.defaultParallelism
        )
        return ivf_cosine_topk(emb, k=5, n_cells=16, n_probe=8, seed=42)

    impls = {
        "emb_topk_ann": _bench_emb_topk_ann,
        "emb_ivf_ann": _bench_emb_ivf_ann,
    }
    names = [
        "doc_minhash_neardup", "doc_ngram_jaccard", "doc_quality",
        "events_windowed", "events_sessions", "tpch_q1",
        "emb_topk_ann", "emb_ivf_ann", "doc_ruler", "media_decode",
        "files_neardup_pairs", "files_substring_pairs", "files_components",
    ]
    return [(n, impls.get(n, Q.QUERIES[n])) for n in names]


def cmd_noop():
    spark = session()
    reps = int(os.environ.get("BX_REPEATS", "3"))
    only = os.environ.get("BX_ONLY")
    walls: dict[str, list[float]] = {}
    qs = _bench_queries(spark)
    if only:
        wanted = only.split(",")
        qs = [(n, f) for n, f in qs if n in wanted]
    for _ in range(reps):
        for name, fn in qs:
            spark.sparkContext.setJobDescription(f"bx noop {name}")
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            walls.setdefault(name, []).append(round(time.time() - t0, 3))
    out = {n: {"min": min(w), "all": w} for n, w in walls.items()}
    print(json.dumps(out, indent=1))


def cmd_explain(tag: str):
    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = session()
    for name, fn in _bench_queries(spark):
        df = fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{tag}.txt", flush=True)
    # pipeline stages: capture each stage's build-DataFrame plan by running
    # the pipeline with a hooked catalog that dumps before writing
    from spaczz_spark.plans.config import DedupConfig
    from spaczz_spark.plans.pipeline import DedupPipeline
    from spaczz_spark.sources.catalog import CheckpointCatalog

    ckpt = tempfile.mkdtemp(prefix="spaczz_bx_")
    try:
        files = spark.read.parquet(bench_files_path())
        pipe = DedupPipeline(spark, DedupConfig(), ckpt)
        orig_write = CheckpointCatalog.write

        def hooked(self, name, df, config_hash, **kw):
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(PLANS_DIR, f"pipeline_{name}_{tag}.txt"), "w"
            ) as f:
                f.write(plan)
            print(f"wrote pipeline_{name}_{tag}.txt", flush=True)
            return orig_write(self, name, df, config_hash, **kw)

        CheckpointCatalog.write = hooked
        try:
            pipe.run(files)
        finally:
            CheckpointCatalog.write = orig_write
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "stages"
    tag = sys.argv[2] if len(sys.argv) > 2 else "before"
    if mode == "stages":
        cmd_stages()
    elif mode == "noop":
        cmd_noop()
    elif mode == "explain":
        cmd_explain(tag)
    else:
        raise SystemExit(f"unknown mode {mode}")
