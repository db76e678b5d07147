#!/bin/bash
# Box-independent r12-vs-r13 A/B (r13 verdict item 3): rebuild BOTH closing
# binaries in the pinned worktree and bench them back-to-back on the SAME
# box state, sf0.1, one run each. The r13-vs-r12 0.777x headline mixed a
# real code speedup with r12's degraded-box artifact; this separates them.
#   r12 closing binary: b34c179 (final-155)
#   r13 closing binary: c224c35 (final-174)
# Artifacts land in bench/ with binary-name stamps; compare on the
# shared-155 subset only.
set -u
cd /root/repo/.benchtree || { touch /tmp/AB_FAILED; exit 1; }

git checkout -q b34c179 || { touch /tmp/AB_FAILED; exit 1; }
sbt -batch compile > /tmp/ab_compile_r12.log 2>&1 || { touch /tmp/AB_FAILED; exit 1; }
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_OUT=/root/repo/bench/BENCH_r14_ab_r12binary_sf0.1_run1.json \
sbt -batch "runMain graft.Bench" > /tmp/ab_bench_r12.log 2>&1

git checkout -q c224c35 || { touch /tmp/AB_FAILED; exit 1; }
sbt -batch compile > /tmp/ab_compile_r13.log 2>&1 || { touch /tmp/AB_FAILED; exit 1; }
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_OUT=/root/repo/bench/BENCH_r14_ab_r13binary_sf0.1_run1.json \
sbt -batch "runMain graft.Bench" > /tmp/ab_bench_r13.log 2>&1

touch /tmp/AB_DONE
