#!/bin/bash
# Tail of the canonical r13 program: the sf1/sf10 runs, each preceded by a
# LOADAVG SETTLE — the first attempt started sf1 straight after GenScale
# and stamped contended:true (loadavg_before 4.26). Waits until the 1-min
# loadavg drops below 2.5 (max 10 min) before every timed run.
set -u
cd /root/repo/.benchtree || { touch /tmp/BENCH_FAILED; exit 1; }

settle() {
  for _ in $(seq 1 60); do
    l=$(cut -d' ' -f1 /proc/loadavg)
    ok=$(python3 -c "print(1 if $l < 2.5 else 0)")
    [ "$ok" = "1" ] && return 0
    sleep 10
  done
}

settle
for i in 1 2; do
  SPARK_GRAFT_SF_DIR=/root/repo/.benchtree/target/sf1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=/root/repo/bench/BENCH_r13_final174_sf1_run$i.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_174_sf1_run$i.log 2>&1
  settle
done

if [ ! -d target/sf10 ]; then
  sbt -batch "runMain graft.tools.GenScale /root/testdata/sf0.1 target/sf10 100" \
    > /tmp/genscale_sf10.log 2>&1
fi
settle
SPARK_GRAFT_SKIP=dedup_embedding,dedup_lsh_cosine,dedup_simhash_hamming,dedup_embedding_cluster,dedup_semantic_cells \
SPARK_GRAFT_SF_DIR=/root/repo/.benchtree/target/sf10 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_OUT=/root/repo/bench/BENCH_r13_final174_sf10_comparable_run1.json \
sbt -batch "runMain graft.Bench" > /tmp/bench_174_sf10_run1.log 2>&1

touch /tmp/ALL_BENCHES_DONE
