#!/usr/bin/env python
"""spark-submit entry point for embedding similarity search.

Production:
    spark-submit --py-files dist/spaczz_spark.zip jobs/similarity.py \
        --input <parquet/iceberg of (vec_id, embedding)> --mode pairs \
        --threshold 0.9 --output <path>

    spark-submit ... jobs/similarity.py --input <corpus> --mode topk \
        --k 10 [--queries <parquet of query vectors>] --output <path>

Modes:
    pairs  near-duplicate pairs via hyperplane LSH + exact cosine verify
           (operators.ann.lsh_cosine_pairs — bucketed, no self-cross)
    topk   approximate k-NN via multiprobe LSH (operators.ann.lsh_cosine_topk)

Sandbox smoke:
    python jobs/similarity.py --input /root/testdata/sf0.001/embeddings.parquet \
        --mode topk --k 5 --master 'local[4]' --output /tmp/topk
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# Python workers spawned by the JVM import the package by path too
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--queries", default=None,
                    help="optional separate query-vector parquet (topk mode)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--mode", choices=["pairs", "topk"], default="pairs")
    ap.add_argument("--threshold", type=float, default=0.9)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-bits", type=int, default=8)
    ap.add_argument("--n-tables", type=int, default=16)
    ap.add_argument("--n-probes", type=int, default=2)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--iceberg", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from spaczz_spark.operators.ann import lsh_cosine_pairs, lsh_cosine_topk
    from spaczz_spark.plans.pipeline import recommended_session

    if args.master:
        spark = recommended_session(app="spaczz-similarity", master=args.master)
    else:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.appName("spaczz-similarity").getOrCreate()

    read = spark.read.table if args.iceberg else spark.read.parquet
    corpus = read(args.input)
    if args.mode == "pairs":
        out = lsh_cosine_pairs(
            corpus,
            threshold=args.threshold,
            n_bits=args.n_bits,
            n_tables=args.n_tables,
            seed=args.seed,
        )
    else:
        queries = read(args.queries) if args.queries else None
        out = lsh_cosine_topk(
            corpus,
            queries,
            k=args.k,
            n_bits=args.n_bits,
            n_tables=args.n_tables,
            n_probes=args.n_probes,
            seed=args.seed,
        )
    out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(f'{{"mode": "{args.mode}", "rows": {n}, "output": "{args.output}"}}')


if __name__ == "__main__":
    main()
