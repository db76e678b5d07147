#!/bin/bash
# Canonical r14 baseline program, quiet box required: sf0.1 x3, sf1 x2
# (GenScale 10x), sf10-comparable x1 (GenScale 100x). Runs from the PINNED
# git worktree (.benchtree) so working-tree edits can never change the
# measured binary mid-program. Artifacts land in the main repo's bench/.
#
# sf10 skip list = the r10 five-op quadratic-by-contract set PLUS
# sql_tpch_q9 and sql_tpch_q21 (r13 record, twice-documented: q9's 6-way
# join over 600M lineitem rows and q21's triple self-join shuffle more at
# sf10 than this box's disk holds — 8 GiB driver heap OOM'd, 16 GiB died
# ENOSPC with 70 GiB free). The skip list is stamped into the artifact.
# A separate heavy-duo probe (run_sf10_heavy_duo.sh) attempts q9/q21 alone
# with zstd shuffle compression.
set -u
cd /root/repo/.benchtree || { touch /tmp/BENCH_FAILED; exit 1; }
sbt -batch compile > /tmp/bench_compile.log 2>&1 || { touch /tmp/BENCH_FAILED; exit 1; }

for i in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=/root/repo/bench/BENCH_r14_final175_sf0.1_run$i.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_r14_sf01_run$i.log 2>&1
done

if [ ! -d target/sf1 ]; then
  sbt -batch "runMain graft.tools.GenScale /root/testdata/sf0.1 target/sf1 10" \
    > /tmp/genscale_sf1.log 2>&1
fi
for i in 1 2; do
  SPARK_GRAFT_SF_DIR=/root/repo/.benchtree/target/sf1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=/root/repo/bench/BENCH_r14_final175_sf1_run$i.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_r14_sf1_run$i.log 2>&1
done

if [ ! -d target/sf10 ]; then
  sbt -batch "runMain graft.tools.GenScale /root/testdata/sf0.1 target/sf10 100" \
    > /tmp/genscale_sf10.log 2>&1
fi
SPARK_GRAFT_SKIP=dedup_embedding,dedup_lsh_cosine,dedup_simhash_hamming,dedup_embedding_cluster,dedup_semantic_cells,sql_tpch_q9,sql_tpch_q21 \
SPARK_DRIVER_MEM=16g \
SPARK_GRAFT_SF_DIR=/root/repo/.benchtree/target/sf10 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_OUT=/root/repo/bench/BENCH_r14_final175_sf10_comparable_run1.json \
sbt -batch "runMain graft.Bench" > /tmp/bench_r14_sf10_run1.log 2>&1

# Run B — the FULL catalog at sf10 under the spill-budget recipe
# (tools/sf10_heavy.yml: zstd, 96 partitions, AQE, 16g driver), only the
# five quadratic-by-contract oracle twins skipped: fills the sf10 column
# completely. Confs differ from the default-conf comparable run above, so
# the two artifacts answer different questions (comparability vs coverage).
SPARK_GRAFT_SKIP=dedup_embedding,dedup_lsh_cosine,dedup_simhash_hamming,dedup_embedding_cluster,dedup_semantic_cells \
SPARK_GRAFT_CONFIG_YML=/root/repo/tools/sf10_heavy.yml \
SPARK_DRIVER_MEM=16g \
SPARK_GRAFT_SF_DIR=/root/repo/.benchtree/target/sf10 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_OUT=/root/repo/bench/BENCH_r14_final175_sf10_full_heavyconf_run1.json \
sbt -batch "runMain graft.Bench" > /tmp/bench_r14_sf10_full_run1.log 2>&1

touch /tmp/ALL_BENCHES_DONE
