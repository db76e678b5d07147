#!/bin/bash
# r15 remainder program (replaces the killed tail of
# run_canonical_benches.sh): the original back-to-back sequencing let
# each leg's teardown load leak into the next leg's loadavg_before, so
# sf0.1 run1/2 and sf1 run1/2 stamped contended:true and the
# sf10-comparable leg was killed at launch before it could do the same.
# Every leg here gets a settle sleep so loadavg_before reflects the BOX,
# not the program's own wake. Binary: the same pinned .benchtree
# checkout (2049646) — no re-checkout, no recompile.
# Order: quick sf0.1 legs first (freshest box → least sustained-load
# drift in the canonical trio), sf1, then the critical sf10-comparable
# with a wide margin, and the sacrificial full-coverage Run B last.
set -u
cd /root/repo/.benchtree || { touch /tmp/BENCH_FAILED; exit 1; }

for i in 4 5; do
  sleep 170
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=/root/repo/bench/BENCH_r15_final175_sf0.1_run$i.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_r15_sf01_run$i.log 2>&1
done

sleep 170
SPARK_GRAFT_SF_DIR=/root/repo/.benchtree/target/sf1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_OUT=/root/repo/bench/BENCH_r15_final175_sf1_run3.json \
sbt -batch "runMain graft.Bench" > /tmp/bench_r15_sf1_run3.log 2>&1

sleep 170
SPARK_GRAFT_SKIP=dedup_embedding,dedup_lsh_cosine,dedup_simhash_hamming,dedup_embedding_cluster,dedup_semantic_cells,dedup_lsh_sketched,sql_tpch_q9,sql_tpch_q21 \
SPARK_DRIVER_MEM=16g \
SPARK_GRAFT_SF_DIR=/root/repo/.benchtree/target/sf10 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_OUT=/root/repo/bench/BENCH_r15_final175_sf10_comparable_run1.json \
sbt -batch "runMain graft.Bench" > /tmp/bench_r15_sf10_run1.log 2>&1
touch /tmp/COMPARABLE_DONE

sleep 170
SPARK_GRAFT_SKIP=dedup_embedding,dedup_lsh_cosine,dedup_simhash_hamming,dedup_embedding_cluster,dedup_semantic_cells,dedup_lsh_sketched \
SPARK_GRAFT_CONFIG_YML=/root/repo/tools/sf10_heavy.yml \
SPARK_DRIVER_MEM=16g \
SPARK_GRAFT_SF_DIR=/root/repo/.benchtree/target/sf10 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_OUT=/root/repo/bench/BENCH_r15_final175_sf10_full_heavyconf_run1.json \
sbt -batch "runMain graft.Bench" > /tmp/bench_r15_sf10_full_run1.log 2>&1

touch /tmp/ALL_BENCHES_DONE
