#!/bin/bash
# r17 final program: final-binary sf0.1 runs + the 8-vs-32-core scaling legs
# (r16 verdict item 2). Runs from the pinned .benchtree worktree (HEAD
# 6c7691a); artifacts land in the main repo's bench/. Settle sleeps between
# legs so loadavg_before decays below the contended threshold.
set -u
fresh() {
  if [ -e "$1" ]; then echo "REFUSING to overwrite $1" >&2; exit 1; fi
}
leg() {
  local artifact=$1 logf=$2; shift 2
  fresh "$artifact"
  sleep 170
  env "$@" SPARK_GRAFT_BENCH_OUT="$artifact" \
    sbt -batch "runMain graft.Bench" > "$logf" 2>&1
}
cd /root/repo/.benchtree || exit 1

SKIP_SF10_CMP=dedup_embedding,dedup_lsh_cosine,dedup_simhash_hamming,dedup_embedding_cluster,dedup_semantic_cells,dedup_lsh_sketched

for i in 1 2; do
  leg /root/repo/bench/BENCH_r17_final_sf0.1_run$i.json \
      /tmp/bench_r17_final_sf01_run$i.log \
      SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32
done

leg /root/repo/bench/BENCH_r17_final_sf1_run1.json \
    /tmp/bench_r17_final_sf1_run1.log \
    SPARK_GRAFT_SF_DIR=/root/repo/target/sf1 SPARK_GRAFT_CPUS=32
leg /root/repo/bench/BENCH_r17_final_sf1_c8_run1.json \
    /tmp/bench_r17_final_sf1_c8_run1.log \
    SPARK_GRAFT_SF_DIR=/root/repo/target/sf1 SPARK_GRAFT_CPUS=8

leg /root/repo/bench/BENCH_r17_final_sf10_comparable_run1.json \
    /tmp/bench_r17_final_sf10_run1.log \
    SPARK_GRAFT_SF_DIR=/root/repo/target/sf10 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_SKIP=$SKIP_SF10_CMP SPARK_DRIVER_MEM=16g
leg /root/repo/bench/BENCH_r17_final_sf10_comparable_c8_run1.json \
    /tmp/bench_r17_final_sf10_c8_run1.log \
    SPARK_GRAFT_SF_DIR=/root/repo/target/sf10 SPARK_GRAFT_CPUS=8 \
    SPARK_GRAFT_SKIP=$SKIP_SF10_CMP SPARK_DRIVER_MEM=16g

touch /tmp/R17_PROGRAM_DONE
