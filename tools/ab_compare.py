#!/usr/bin/env python3
"""Compare two bench artifacts on their shared query set.

Usage: python3 tools/ab_compare.py A.json B.json [top_n]
Prints shared-subtotal ratio B/A, calibration stamps, and the worst
per-query ratios (sub-second entries flagged — the classic drift
signature, not operator regressions).
"""
import json, sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 12
qa, qb = a["queries"], b["queries"]
shared = sorted(set(qa) & set(qb))
sa = sum(qa[n] for n in shared)
sb = sum(qb[n] for n in shared)

def fmt_load(art):
    # pre-r14 artifacts carry no loadavg_before — format only when present
    v = art.get("loadavg_before")
    return f"{v:.2f}" if isinstance(v, (int, float)) else "—"

print(f"A: {sys.argv[1]}  commit={a.get('commit')} contended={a.get('contended')} "
      f"load={fmt_load(a)} cal={a.get('calibration_s', '—')}")
print(f"B: {sys.argv[2]}  commit={b.get('commit')} contended={b.get('contended')} "
      f"load={fmt_load(b)} cal={b.get('calibration_s', '—')}")
if not shared or sa == 0:
    print(f"no comparable shared set (shared={len(shared)}, A subtotal={sa}) — "
          "nothing to ratio")
    sys.exit(0)
print(f"shared-{len(shared)} subtotal: A {sa:.1f} s, B {sb:.1f} s -> B/A = {sb/sa:.3f}x")
only_a = set(qa) - set(qb); only_b = set(qb) - set(qa)
if only_a: print(f"only in A: {sorted(only_a)}")
if only_b: print(f"only in B: {sorted(only_b)}")
rows = sorted(((qb[n] / qa[n] if qa[n] > 0 else float('inf'), n) for n in shared
               if qa[n] > 0), reverse=True)
print(f"\nworst {top_n} B/A ratios:")
for r, n in rows[:top_n]:
    flag = "  (sub-second)" if qa[n] < 1.0 and qb[n] < 1.0 else ""
    print(f"  {n:35s} {qa[n]:8.3f} -> {qb[n]:8.3f}  {r:5.2f}x{flag}")
