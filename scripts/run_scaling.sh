#!/bin/bash
cd /root/repo
export SPARK_GRAFT_SCALING=1 SPARK_GRAFT_SCALE_REPEATS=3 SPARK_GRAFT_SCALE_FIXTURE=scale2
exec python bench.py > /root/repo/BENCH/scaling_r2.json 2> /root/repo/BENCH/scaling_r2.log
