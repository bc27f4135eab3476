#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline set = the flagship dedup pipeline over the bench `files` corpus
(generated deterministically on first run) plus representative operator
queries over the driver testdata. The flagship metric is files/sec through
the full pipeline (cold, no checkpoints reused).

Scaling evidence (north rule): SPARK_GRAFT_SCALING=1 re-runs the flagship
at two parallelism levels (default local[1] vs local[4]) in separate
SparkSessions on the same input and reports throughput at both plus the
efficiency ratio (throughput_ratio / core_ratio).
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
BENCH_FIXTURE = os.path.join(REPO, "fixtures", "files_bench")


def ensure_fixture(name: str) -> str:
    path = os.path.join(REPO, "fixtures", f"files_{name}")
    if not os.path.exists(os.path.join(path, "files.parquet")):
        sys.path.insert(0, os.path.join(REPO, "scripts"))
        from make_fixtures import make

        make(name)
    return path


def session(cores: int):
    from spaczz_spark.plans.pipeline import recommended_session

    s = recommended_session(
        app=f"spaczz-bench-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 16),
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def run_pipeline(
    spark, files_path: str, metrics_out: dict | None = None
) -> tuple[float, int]:
    from pyspark.sql import functions as F

    from spaczz_spark.plans.config import DedupConfig
    from spaczz_spark.plans.pipeline import DedupPipeline

    ckpt = tempfile.mkdtemp(prefix="spaczz_bench_")
    try:
        files = spark.read.parquet(files_path)
        n = files.count()
        t0 = time.time()
        pipe = DedupPipeline(spark, DedupConfig(), ckpt)
        comps = pipe.run(files)
        # force full materialization
        t1 = time.time()
        comps.select(F.count(F.lit(1)), F.countDistinct("component_id")).collect()
        if metrics_out is not None:
            stage_sec = {
                k: v for k, v in pipe.metrics.items() if k.endswith("_sec")
            }
            stage_sec["final_collect_sec"] = round(time.time() - t1, 2)
            stage_sec["cc_iterations"] = pipe.metrics.get("cc_iterations", -1)
            metrics_out.update(stage_sec)
        return time.time() - t0, n
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def main() -> None:
    from spaczz_spark import queries as Q

    fixture = ensure_fixture("bench")
    files_path = os.path.join(fixture, "files.parquet")

    # Round-4 lesson (adjudicated by an interleaved judge A/B): this host's
    # wall times vary 2-3x run-to-run under neighbor load, and a
    # single-shot-per-query bench manufactured a phantom 36% regression.
    # Every number below is therefore min over SPARK_GRAFT_BENCH_REPEATS
    # interleaved rounds (default 2; all walls kept in the JSON).
    repeats_bench = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    results: dict[str, float] = {}
    walls_all: dict[str, list[float]] = {}
    skip_headline = os.environ.get("SPARK_GRAFT_SKIP_HEADLINE") == "1"
    spark = None
    if not skip_headline:
        spark = session(CPUS)

        # headline: full dedup pipeline on the bench corpus (cold each
        # repeat: fresh checkpoint dir, no resume)
        headline_walls = []
        for _ in range(repeats_bench):
            wall, n_files = run_pipeline(spark, files_path)
            headline_walls.append(wall)
        best = min(headline_walls)
        results["files_pipeline"] = round(best, 3)
        walls_all["files_pipeline"] = [round(w, 3) for w in headline_walls]
        files_per_sec = n_files / best
    else:
        n_files, files_per_sec = 0, 0.0

    # representative operator queries over driver testdata — PRODUCTION
    # paths only. The deliberately-O(n^2) oracle fixtures (emb_topk,
    # emb_neardup — DuckDB-mirrorable ground truth, never the scale path)
    # are excluded from the headline so the bench measures the engine, not
    # the correctness fixtures; opt back in with
    # SPARK_GRAFT_ORACLE_FIXTURES=1.
    #
    # The ANN queries in spaczz_spark.queries run ORACLE-EXACT configs
    # (full-probe breadth -> candidate set == corpus, for the correctness
    # gate); the bench measures the PRODUCTION tuning instead — the plan
    # the engine would actually run at scale.
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

    bench_impls = {
        "emb_topk_ann": _bench_emb_topk_ann,
        "emb_ivf_ann": _bench_emb_ivf_ann,
    }
    bench_queries = [
        "doc_minhash_neardup",
        "doc_ngram_jaccard",
        "doc_quality",
        "events_windowed",
        "events_sessions",
        "tpch_q1",
        "emb_topk_ann",
        "emb_ivf_ann",
        "doc_ruler",
        "media_decode",
        "files_neardup_pairs",
        "files_substring_pairs",
        "files_components",
    ]
    if os.environ.get("SPARK_GRAFT_ORACLE_FIXTURES") == "1":
        bench_queries += ["emb_neardup", "emb_topk"]
    # interleaved rounds (full query sweep per round, then repeat) so a
    # transient neighbor-load spike degrades one ROUND, not one QUERY —
    # per-query min then compares like against like
    for _round in range(0 if skip_headline else repeats_bench):
        for name in bench_queries:
            fn = bench_impls.get(name, Q.QUERIES.get(name))
            t0 = time.time()
            try:
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            except Exception:
                # noop sink unavailable or query error -> fall back to count
                try:
                    fn(spark, SF_DIR).count()
                except Exception as e:  # pragma: no cover
                    walls_all.setdefault(name, []).append(-1.0)
                    print(f"bench query {name} failed: {e}", file=sys.stderr)
                    continue
            walls_all.setdefault(name, []).append(round(time.time() - t0, 3))
    for name, walls in walls_all.items():
        if name == "files_pipeline":
            continue
        ok = [w for w in walls if w >= 0]
        results[name] = min(ok) if ok else -1.0

    out = {
        "metric": "files_per_sec_full_dedup_pipeline",
        "value": round(files_per_sec, 2),
        "unit": "files/sec",
        "queries": results,
        "queries_walls_all": walls_all,
        "bench_repeats": repeats_bench,
        "sf": SF_DIR,
        "bench_corpus_files": n_files,
        "cpus": CPUS,
    }

    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        if spark is not None:
            spark.stop()
        # N vs 4N cores. The sandbox advertises 32 CPUs but measured
        # parallel throughput saturates at ~14.5 effective cores with
        # external neighbor load of 2-7 on top (see BENCH/BASELINE.md);
        # a level with N task threads also runs ~N Arrow Python workers,
        # so both levels must keep 2N inside that envelope: (1,4) is the
        # honest 4x pair. Repeats with min-wall to shed host noise.
        pair = [
            int(x)
            for x in os.environ.get("SPARK_GRAFT_SCALE_PAIR", "1,4").split(",")
        ]
        repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "2"))
        # scaling uses a large corpus so compute dominates fixed stage
        # orchestration; interleave the two levels to spread host noise
        scale_fixture = os.environ.get("SPARK_GRAFT_SCALE_FIXTURE", "scale2")
        scale_path = os.path.join(ensure_fixture(scale_fixture), "files.parquet")
        walls: dict[int, list] = {c: [] for c in pair}
        stage_metrics: dict[int, list] = {c: [] for c in pair}
        n = 0
        for _ in range(repeats):
            for cores in pair:
                s = session(cores)
                m: dict = {}
                w, n = run_pipeline(s, scale_path, metrics_out=m)
                walls[cores].append(w)
                stage_metrics[cores].append(m)
                s.stop()
        scaling = {}
        for cores in pair:
            best = min(walls[cores])
            ibest = walls[cores].index(best)
            scaling[f"local[{cores}]"] = {
                "wall_sec_min": round(best, 2),
                "wall_sec_all": [round(w, 2) for w in walls[cores]],
                "files_per_sec": round(n / best, 2),
                "stage_sec_best": stage_metrics[cores][ibest],
            }
        lo, hi = pair
        tput_lo = scaling[f"local[{lo}]"]["files_per_sec"]
        tput_hi = scaling[f"local[{hi}]"]["files_per_sec"]
        out["scaling"] = scaling
        out["scaling_efficiency"] = round((tput_hi / tput_lo) / (hi / lo), 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
