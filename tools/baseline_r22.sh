#!/bin/bash
# r22 baseline: 5 quiet full-bench runs at the current head, cpus=4,
# tripwire disabled (floor-pool protocol per BENCH_POLICY).
set -e
cd /root/repo
for r in a b c d e; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_CPUS=4 \
  SPARK_GRAFT_BENCH_REF=/nonexistent \
  SPARK_GRAFT_BENCH_DETAIL=docs/bench_detail_r22_base_$r.json \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_out_r22_base_$r.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_r22_base_$r.log 2>&1
  echo "run $r done $(date +%T)"
done
