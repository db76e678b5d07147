#!/usr/bin/env python3
"""Emit the canonical per-query baseline table from quiet bench artifacts.

Usage: python3 tools/mk_baseline_table.py [prefix]
Reads bench/BENCH_<prefix>_* (default r13_final169; the r10_final130 set
regenerates the previous canonical table) and prints the markdown table
BASELINE.md embeds: per-query median across the sf0.1 runs, median across
sf1 runs, the sf10-comparable value, and the scaling ratios. Queries
excluded at sf10 (quadratic-by-contract skip list) show an em-dash.
"""
import json, statistics, sys

def load(path):
    with open(path) as f:
        return json.load(f)

prefix = sys.argv[1] if len(sys.argv) > 1 else "r13_final174"
# optional second arg: comma-separated sf0.1 run ids (default 1,2,3) — for
# programs where one leg drew a contended window and a supplemental quiet
# run replaces it (artifact names are never reused, per the discipline)
run_ids = [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2 else [1, 2, 3]
sf01 = [load(f"bench/BENCH_{prefix}_sf0.1_run{i}.json") for i in run_ids]
# optional third arg: sf1 run ids (default 1,2)
sf1_ids = [int(x) for x in sys.argv[3].split(",")] if len(sys.argv) > 3 else [1, 2]
sf1 = []
for i in sf1_ids:
    try:
        sf1.append(load(f"bench/BENCH_{prefix}_sf1_run{i}.json"))
    except FileNotFoundError:
        pass  # one quiet sf1 artifact suffices; note it in prose
assert sf1, "need at least one sf1 artifact"
try:
    sf10 = load(f"bench/BENCH_{prefix}_sf10_comparable_run1.json")
except FileNotFoundError:
    sf10 = None  # sf10 column renders as em-dashes; note it in prose

for a in sf01 + sf1 + ([sf10] if sf10 else []):
    assert not a["failed"], a["failed"]
    assert not a.get("contended"), "contended artifact must not be canonical"

# Box-speed stamps (r14 verdict item 5): every artifact since r15 carries
# `calibration_s` — a fixed single-thread CPU microbench. Surface them so
# a reader comparing this table against another window can normalize for
# box drift without re-running binaries. (Absent on pre-r15 artifacts.)
cals = [a.get("calibration_s") for a in sf01 + sf1 + ([sf10] if sf10 else [])]
if any(c is not None for c in cals):
    shown = ", ".join(f"{c:.3f}" if c is not None else "—" for c in cals)
    print(f"calibration_s per artifact (sf0.1×{len(sf01)}, sf1×{len(sf1)}"
          f"{', sf10' if sf10 else ''}): {shown}", file=sys.stderr)

names = sorted(sf01[0]["queries"])
rows = []
for n in names:
    v01 = statistics.median(a["queries"][n] for a in sf01)
    v1 = statistics.median(a["queries"][n] for a in sf1)
    v10 = sf10["queries"].get(n) if sf10 else None
    rows.append((n, v01, v1, v10))

rows.sort(key=lambda r: -(r[3] / r[1] if r[3] else -1 / r[1]))
print("| query | sf0.1 (s) | sf1 (s) | sf10 (s) | sf1/sf0.1 (10x) | sf10/sf0.1 (100x) |")
print("|---|---|---|---|---|---|")
t01 = t1 = t10 = 0.0
for n, v01, v1, v10 in rows:
    t01 += v01; t1 += v1; t10 += v10 or 0.0
    s10 = f"{v10:.2f}" if v10 is not None else "—"
    r10 = f"{v10 / v01:.1f}" if v10 is not None else "—"
    print(f"| {n} | {v01:.2f} | {v1:.2f} | {s10} | {v1 / v01:.2f} | {r10} |")
s10tot = f"**{t10:.1f}**" if sf10 else "—"
print(f"| **total** | **{t01:.1f}** | **{t1:.1f}** | {s10tot} | | |")
shared01 = sum(v01 for n, v01, v1, v10 in rows if v10 is not None)
shared1 = sum(v1 for n, v01, v1, v10 in rows if v10 is not None)
n10 = sum(1 for r in rows if r[3] is not None)
if n10:
    print(f"\nshared {n10}-query subtotal: sf0.1 {shared01:.1f} s, sf1 {shared1:.1f} s, "
          f"sf10 {t10:.1f} s — {t10 / shared01:.1f}x over 100x the data", file=sys.stderr)
else:
    print("\n(no sf10 artifact — sf10 column omitted)", file=sys.stderr)
