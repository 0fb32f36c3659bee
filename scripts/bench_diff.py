#!/usr/bin/env python3
"""Per-query round-over-round bench regression guard (dev tool).

Compares the last two entries of bench_history/history.jsonl and flags any
query that got >1.5x slower AND lost more than 0.3s absolute (the floor
filters out noise on sub-second queries). Exit 1 iff regressions found.

Round 2 shipped a 10x single-query regression (q46: 1s-class -> 10.8s)
undetected because only the total was eyeballed; this is the guardrail.

Usage: scripts/bench_diff.py [history.jsonl] [ratio] [abs_floor_sec]
"""
import json, sys

path = sys.argv[1] if len(sys.argv) > 1 else "bench_history/history.jsonl"
ratio = float(sys.argv[2]) if len(sys.argv) > 2 else 1.5
floor = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3

with open(path) as f:
    entries = [json.loads(l) for l in f if l.strip()]
if len(entries) < 2:
    print(f"bench_diff: only {len(entries)} entry(ies) in {path}; nothing to diff")
    sys.exit(0)

prev, cur = entries[-2]["queries"], entries[-1]["queries"]
tp = entries[-2]["value"]; tc = entries[-1]["value"]
print(f"bench_diff: total {tp:.1f}s -> {tc:.1f}s ({tc/tp:.2f}x of previous)"
      if tp > 0 else "bench_diff: no previous total")

regressed, improved, new = [], [], []
for q, t in sorted(cur.items()):
    if q not in prev:
        new.append(q); continue
    p = prev[q]
    if p > 0 and t > ratio * p and t - p > floor:
        regressed.append((q, p, t))
    elif t > 0 and p > ratio * t and p - t > floor:
        improved.append((q, p, t))

for q, p, t in improved:
    print(f"  IMPROVED  {q:<28} {p:6.2f}s -> {t:6.2f}s  ({t/p:.2f}x)")
for q in new:
    print(f"  NEW       {q:<28} {cur[q]:6.2f}s")
for q, p, t in regressed:
    print(f"  REGRESSED {q:<28} {p:6.2f}s -> {t:6.2f}s  ({t/p:.2f}x)")

if regressed:
    print(f"bench_diff: {len(regressed)} regression(s) above {ratio}x+{floor}s")
    sys.exit(1)
print("bench_diff: no per-query regressions")
