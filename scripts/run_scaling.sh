#!/bin/bash
cd /root/repo
export SPARK_GRAFT_SCALING=1
export SPARK_GRAFT_SCALE_REPEATS="${SPARK_GRAFT_SCALE_REPEATS:-3}"
export SPARK_GRAFT_SCALE_FIXTURE="${SPARK_GRAFT_SCALE_FIXTURE:-scale2}"
export SPARK_GRAFT_SCALE_PAIR="${SPARK_GRAFT_SCALE_PAIR:-2,8}"
export SPARK_GRAFT_SKIP_HEADLINE="${SPARK_GRAFT_SKIP_HEADLINE:-0}"
OUT="${1:-/root/repo/BENCH/scaling_run.json}"
exec python bench.py > "$OUT" 2> "${OUT%.json}.log"
