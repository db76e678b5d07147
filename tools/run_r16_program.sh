#!/bin/bash
# r16 measurement program (run detached; no other sbt/duckdb work while
# live — bench-discipline memory): canonical benches, then the sketched-
# LSH ladder (r15 verdict item 2) — the 2.2M rung re-run on the r16
# binary (the r14 rung predates the conditional pre-band exchange) and a
# new ~5.06M rung (sf10 embeddings x23 + 10% planted) to stress the
# sketch geometry's band growth. Ladder legs run from the SAME pinned
# .benchtree binary the canonical program checks out.
set -u
/root/repo/tools/run_canonical_benches.sh r16
cd /root/repo/.benchtree || exit 1
sleep 170
SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.tools.Dev lshladder /root/repo/.benchtree/target/sf1 0.8 x100" \
  > /root/repo/bench/lshladder_r16_x100_sketch.log 2>&1
sleep 170
SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.tools.Dev lshladder /root/repo/.benchtree/target/sf10 0.8 x23" \
  > /root/repo/bench/lshladder_r16_sf10x23_5M.log 2>&1
touch /tmp/R16_PROGRAM_DONE
