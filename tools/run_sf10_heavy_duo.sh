#!/bin/bash
# sf10 probe for the two queries the r13 record shows out-shuffling this
# box's disk: TPC-H q9 (6-way join over 600M lineitem rows) and q21
# (triple lineitem self-join). Runs them ALONE (Dev time, one query per
# JVM) under tools/sf10_heavy.yml (zstd shuffle/spill compression + 96
# shuffle partitions + AQE) and a 16g driver heap. Success fills the
# BASELINE.md sf10 column for the heavy duo; failure is recorded, keeping
# them on the sf10 skip list with the documented reason.
set -u
cd /root/repo/.benchtree || { touch /tmp/HEAVY_DUO_FAILED; exit 1; }
if [ ! -d target/sf10 ]; then
  sbt -batch "runMain graft.tools.GenScale /root/testdata/sf0.1 target/sf10 100" \
    > /tmp/genscale_sf10.log 2>&1
fi
for q in sql_tpch_q9 sql_tpch_q21; do
  SPARK_GRAFT_CONFIG_YML=/root/repo/tools/sf10_heavy.yml \
  SPARK_DRIVER_MEM=16g SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.tools.Dev time /root/repo/.benchtree/target/sf10 $q" \
    > /root/repo/bench/sf10_heavy_${q}.log 2>&1 \
    || echo "FAILED $q" >> /root/repo/bench/sf10_heavy_failures.log
done
touch /tmp/HEAVY_DUO_DONE
