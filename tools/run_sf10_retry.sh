#!/bin/bash
# sf10-comparable retry at a 16g driver heap: the 8g default OOM'd at the
# 174-entry catalog (stage-level heap exhaustion after 35 min; the r12
# 147-entry run passed at 8g — the new TPC-H partsupp derivation and
# write-heavy acid entries push peak pressure past 8g at sf10).
set -u
cd /root/repo/.benchtree || exit 1
for _ in $(seq 1 60); do
  l=$(cut -d' ' -f1 /proc/loadavg)
  ok=$(python3 -c "print(1 if $l < 2.5 else 0)")
  [ "$ok" = "1" ] && break
  sleep 10
done
SPARK_DRIVER_MEM=16g \
SPARK_GRAFT_SKIP=dedup_embedding,dedup_lsh_cosine,dedup_simhash_hamming,dedup_embedding_cluster,dedup_semantic_cells \
SPARK_GRAFT_SF_DIR=/root/repo/.benchtree/target/sf10 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_OUT=/root/repo/bench/BENCH_r13_final174_sf10_comparable_run1.json \
sbt -batch "runMain graft.Bench" > /tmp/bench_174_sf10_retry.log 2>&1
touch /tmp/SF10_DONE
