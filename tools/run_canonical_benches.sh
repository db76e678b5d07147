#!/bin/bash
# Canonical per-round baseline program, quiet box required. Usage:
#   tools/run_canonical_benches.sh rNN Sequence:
#   A/B  — the PREVIOUS round's binary (pinned second worktree) at sf0.1,
#          then this round's binary at sf0.1: same-day same-box ratio that
#          separates code delta from the documented box drift. Every
#          artifact also stamps `calibration_s` (fixed single-thread CPU
#          microbench) so later readers can normalize across windows
#          without reruns.
#   sf0.1 x3, sf1 x3 (GenScale 10x; r15 verdict item 5 — median-of-3
#   quiet legs), sf10-comparable x1 (GenScale 100x, now incl. q9/q21).
# Runs from the PINNED git worktree (.benchtree) so working-tree edits can
# never change the measured binary mid-program. Artifacts land in the main
# repo's bench/.
#
# sf10-comparable skip list = the r10 five-op quadratic-by-contract set
# PLUS dedup_lsh_sketched (r15: the DEMO-geometry sketch entry — 4 bands x
# 4 bits mirrors the dedup_lsh_cosine oracle, so its candidate multiset is
# quadratic-by-contract exactly like the cosine twin already skipped; all
# three r14 sf10 passes died ENOSPC in its banded sort. The SCALE path is
# dedup_lsh_sketched_adaptive, which stays in). The skip list is stamped
# into the artifact.
#
# sql_tpch_q9 / sql_tpch_q21 REJOINED the comparable set in r16: the
# engine-side rewrites (pre-aggregated q21 EXISTS/NOT EXISTS, red-filtered
# q9 partsupp derivation — oracle SQL unchanged, hash-gated) fit default
# confs at sf10 (probe: q9 17.7/3.8 s, q21 25.4/14.2 s cold/warm on the
# 8 GiB default heap). That also retires the heavy-conf Run B: its only
# purpose was q9/q21 coverage, and the comparable run now covers the same
# 169-query set under default confs (the r14 heavy-vs-default conf ratio,
# 1.044x, stays recorded in BASELINE.md).
set -u
# Round tag is REQUIRED (r15 advisor finding: a hardcoded name silently
# overwrote the prior round's A/B artifact on re-run). Artifacts refuse
# to overwrite — never reuse an artifact name; bump the run suffix.
ROUND=${1:?usage: run_canonical_benches.sh rNN (round tag for artifact names)}
fresh() {  # fresh <path>: fail the program rather than clobber history
  if [ -e "$1" ]; then
    echo "REFUSING to overwrite existing artifact $1" >&2
    touch /tmp/BENCH_FAILED; exit 1
  fi
}
# leg <artifact> <log> [env k=v ...]: freshness-check the artifact, settle,
# then run Bench with the leg's env attached to the BENCH COMMAND ITSELF.
# (r16 fix: the previous layout attached the env assignments to the `fresh`
# shell-function call — temporary for the function only in bash — so the
# sbt invocation would have run WITHOUT its SF dir. This generalized script
# had not run a full program before r16; r15 used its predecessor.)
leg() {
  local artifact=$1 logf=$2; shift 2
  fresh "$artifact"
  sleep 170
  env "$@" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_OUT="$artifact" \
    sbt -batch "runMain graft.Bench" > "$logf" 2>&1
}
cd /root/repo/.benchtree || { touch /tmp/BENCH_FAILED; exit 1; }
# pin the worktree to main's HEAD as of program LAUNCH (one checkout, so
# mid-program edits to the working tree can never change the binary)
git checkout --detach "$(git -C /root/repo rev-parse main)" \
  > /tmp/bench_checkout.log 2>&1 || { touch /tmp/BENCH_FAILED; exit 1; }
sbt -batch compile > /tmp/bench_compile.log 2>&1 || { touch /tmp/BENCH_FAILED; exit 1; }

SKIP_SF10_CMP=dedup_embedding,dedup_lsh_cosine,dedup_simhash_hamming,dedup_embedding_cluster,dedup_semantic_cells,dedup_lsh_sketched

# -- Same-day A/B: PREVIOUS round's binary first. Pin it before launch:
#   git worktree add --detach /root/repo/.benchtree_prev <prev-round-commit>
# (.benchtree_r14 kept as a fallback name for the r15 program's layout) --
ABTREE=/root/repo/.benchtree_prev
[ -d "$ABTREE" ] || ABTREE=/root/repo/.benchtree_r14
if [ -d "$ABTREE" ]; then
  ( cd "$ABTREE" && \
    sbt -batch compile > /tmp/bench_prevab_compile.log 2>&1 && \
    leg /root/repo/bench/BENCH_${ROUND}_ab_prevbinary_sf0.1_run1.json \
        /tmp/bench_${ROUND}_ab_prev.log \
        SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 )
fi

# settle sleeps before every leg (r15 lesson, inside `leg`): without them
# each leg's own teardown load leaks into the next leg's loadavg_before and
# every back-to-back artifact stamps contended:true — 1-min loadavg needs
# ~3 min to decay below the threshold after a 32-thread run exits.
for i in 1 2 3; do
  leg /root/repo/bench/BENCH_${ROUND}_canonical_sf0.1_run$i.json \
      /tmp/bench_${ROUND}_sf01_run$i.log \
      SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
done

if [ ! -d target/sf1 ]; then
  sbt -batch "runMain graft.tools.GenScale /root/testdata/sf0.1 target/sf1 10" \
    > /tmp/genscale_sf1.log 2>&1
fi
for i in 1 2 3; do
  leg /root/repo/bench/BENCH_${ROUND}_canonical_sf1_run$i.json \
      /tmp/bench_${ROUND}_sf1_run$i.log \
      SPARK_GRAFT_SF_DIR=/root/repo/.benchtree/target/sf1
done

if [ ! -d target/sf10 ]; then
  sbt -batch "runMain graft.tools.GenScale /root/testdata/sf0.1 target/sf10 100" \
    > /tmp/genscale_sf10.log 2>&1
fi
leg /root/repo/bench/BENCH_${ROUND}_canonical_sf10_comparable_run1.json \
    /tmp/bench_${ROUND}_sf10_run1.log \
    SPARK_GRAFT_SF_DIR=/root/repo/.benchtree/target/sf10 \
    SPARK_GRAFT_SKIP=$SKIP_SF10_CMP \
    SPARK_DRIVER_MEM=16g

# (Run B — the heavy-conf full-catalog sf10 pass — retired in r16: the
# comparable run above now covers the same 169-query set under default
# confs since q9/q21's engine-side rewrites fit the default budget.)

touch /tmp/ALL_BENCHES_DONE
