#!/bin/bash
# Canonical r13 baseline promotion: 3x sf0.1 + 1x sf1, sequential, quiet box.
cd /root/repo
for i in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=/root/repo/bench/BENCH_r13_final168_sf0.1_run$i.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_sf01_run$i.log 2>&1
done
SPARK_GRAFT_SF_DIR=/root/testdata/sf1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_OUT=/root/repo/bench/BENCH_r13_final168_sf1_run1.json \
sbt -batch "runMain graft.Bench" > /tmp/bench_sf1_run1.log 2>&1
touch /tmp/ALL_BENCHES_DONE
