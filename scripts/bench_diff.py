#!/usr/bin/env python3
"""Per-query round-over-round bench regression guard (dev tool).

Compares the newest same-SF entry of bench_history/history.jsonl against a
per-query BASELINE and flags any query that got >1.5x slower AND lost more
than 0.3s absolute (the floor filters out noise on sub-second queries).
Exit 1 iff regressions found.

Round 2 shipped a 10x single-query regression (q46: 1s-class -> 10.8s)
undetected because only the total was eyeballed; this is the guardrail.

Round 4 showed the other failure mode: driver-snapshot runs on a loaded box
spiked random queries 10x with zero code change, and this guard dutifully
"found" 5 regressions that were all ambient-load artifacts. Defenses:
  * entries carry min-of-3-interleaved per-query times ("queries"), which
    ambient load cannot inflate unless it contaminates all three separated
    passes; the diff compares those mins;
  * a run whose shared-query total exceeds 1.3x the same-SF history median
    is marked CONTAMINATED and the per-query diff is skipped (exit 0)
    rather than reported as regressions;
  * the BASELINE per query is the MIN over the last 5 same-SF, same-STAT
    history entries — so one contaminated entry in history cannot become
    the comparison floor and mask the next real regression, and entries
    recorded under a different stat protocol (median vs min) are never
    ratio-compared against each other.

Round 5 showed the residual failure mode: the contamination gate is a
TOTAL-level check, so a run whose total is fine can still carry one or two
ambient-inflated queries (q61 read 1.22s in the official snapshot while
same-day local runs of the SAME code measured 0.71s — flagged as the
round's one regression, root cause: checkpoint-heavy correctness pass
sharing the box). Defense: a flagged row is re-checked against the
SAME-DAY window (same sf/stat entries within 24h). If the day's window min
shows the query running at < cur/1.3 on the same code, the inflation is
AMBIENT — annotated with the window min, not reported as a regression. A
real code regression cannot be misclassified this way: post-change runs
inflate the same-day window floor too, so the fast precedent it needs is
absent.

Usage: scripts/bench_diff.py [history.jsonl] [ratio] [abs_floor_sec]
"""
import json, statistics, sys

path = sys.argv[1] if len(sys.argv) > 1 else "bench_history/history.jsonl"
ratio = float(sys.argv[2]) if len(sys.argv) > 2 else 1.5
floor = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
CONTAMINATION = 1.3
BASELINE_WINDOW = 5
AMBIENT_RATIO = 1.3          # cur > 1.3x same-day min => ambient, not code
SAME_DAY_MS = 24 * 3600 * 1000

with open(path) as f:
    entries = [json.loads(l) for l in f if l.strip()]
# harness self-test runs (SPARK_GRAFT_BENCH_ONLY) measure a named subset
# and are annotated "subset":true — never comparable, never a baseline
entries = [e for e in entries if not e.get("config", {}).get("subset")]
if not entries:
    print(f"bench_diff: no entries in {path}; nothing to diff")
    sys.exit(0)

cur_e = entries[-1]
sf = cur_e.get("sf")
stat_c = cur_e.get("config", {}).get("stat", "median")
same_sf = [e for e in entries[:-1] if e.get("sf") == sf]
# protocol discipline: only same-stat, same-shuffle-partition entries are
# comparable (a min-stat total is systematically below a median-stat one,
# and a P=8/P=64 sweep entry measures a deliberately different config;
# mixing either biases the contamination ratio and every comparison)
part_c = cur_e.get("config", {}).get("shuffle_partitions")
base_pool = [e for e in same_sf
             if e.get("config", {}).get("stat", "median") == stat_c
             and e.get("config", {}).get("shuffle_partitions") == part_c]
if not base_pool:
    print(f"bench_diff: no previous sf={sf} entry with stat={stat_c}; "
          "nothing comparable to diff")
    sys.exit(0)
prev_e = base_pool[-1]

# Contamination check: a run's total far above its same-SF history median
# means something else shared the box — per-query numbers are untrustworthy.
# Queries are added round over round, so normalize totals to the overlapping
# query set before comparing (an honest +6s of new queries is not load).
cur_q = cur_e["queries"]
pair_ratios = []
for e in base_pool:
    shared = set(e["queries"]) & set(cur_q)
    if not shared:
        continue
    h = sum(t for q, t in e["queries"].items() if q in shared and t > 0)
    c = sum(t for q, t in cur_q.items() if q in shared and t > 0)
    if h > 0:
        pair_ratios.append(c / h)
if pair_ratios:
    med_ratio = statistics.median(pair_ratios)
    if med_ratio > CONTAMINATION:
        print(f"bench_diff: CONTAMINATED run — shared-query total is "
              f"{med_ratio:.2f}x the same-SF history median (>{CONTAMINATION}x). "
              f"Per-query diff skipped; re-run on a quiet box.")
        sys.exit(0)

# Declared intentional cost changes (bench_history/EXPECTED.json):
#   {"q145_bpe_merges": {"since_ts": 1786728896463,
#                        "reason": "BPE depth 3->8 (round 9)"}}
# History entries BEFORE since_ts are excluded from that query's baseline —
# otherwise a deliberately-deepened query is compared against its shallow
# past for BASELINE_WINDOW rounds and re-flags as REGRESSED every run
# (the q145 round-9/10 recurring false positive). The declaration is the
# auditable artifact: a cost increase is either declared here with a
# reason, or it is a regression.
import os
expected = {}
exp_path = os.path.join(os.path.dirname(path) or ".", "EXPECTED.json")
if os.path.exists(exp_path):
    with open(exp_path) as f:
        expected = json.load(f)

# Per-query baseline: min over the last BASELINE_WINDOW same-stat entries
# THAT RAN THE QUERY (not the last N entries overall — a query temporarily
# out of the headline set would otherwise re-enter as 'NEW' with no
# baseline and dodge the regression check). Min is immune to any single
# contaminated entry in the window (a loaded run only ever reads HIGH).
baseline = {}
seen = {}
for e in reversed(base_pool):
    for q, t in e["queries"].items():
        if q in expected and e.get("ts", 0) < expected[q].get("since_ts", 0):
            continue  # pre-cost-change entry: not comparable
        if t > 0 and seen.get(q, 0) < BASELINE_WINDOW:
            seen[q] = seen.get(q, 0) + 1
            baseline[q] = min(baseline.get(q, t), t)

tp, tc = prev_e["value"], cur_e["value"]
print(f"bench_diff: total {tp:.1f}s -> {tc:.1f}s (stat={stat_c})"
      + (f"  ({tc/tp:.2f}x of previous)" if tp > 0 else ""))

# Common-subset TOTAL gate (VERDICT r12 #6): per-query diffs catch single
# regressions, but a broad +3%-everywhere drift passes them every round
# and compounds silently toward the 2x bench gate. Compare the COMMON
# query subset's total against the previous comparable entry; above the
# declared threshold, fail the round close like a per-query regression.
TOTAL_RATIO = 1.10
shared_prev = set(prev_e["queries"]) & set(cur_q)
common_prev = sum(t for q, t in prev_e["queries"].items()
                  if q in shared_prev and t > 0)
common_cur = sum(t for q, t in cur_q.items()
                 if q in shared_prev and t > 0)
total_regressed = False
if common_prev > 0:
    r_tot = common_cur / common_prev
    print(f"bench_diff: common-subset total {common_prev:.1f}s -> "
          f"{common_cur:.1f}s  ({r_tot:.2f}x, gate {TOTAL_RATIO}x over "
          f"{len(shared_prev)} shared queries)")
    if r_tot > TOTAL_RATIO:
        total_regressed = True
        print(f"  TOTAL REGRESSED: common-subset suite total grew "
              f"{r_tot:.2f}x > {TOTAL_RATIO}x vs the previous round — "
              "broad drift, not a single query; bisect before closing")

regressed, improved, new = [], [], []
for q, t in sorted(cur_q.items()):
    if q not in baseline:
        new.append(q); continue
    p = baseline[q]
    if p > 0 and t > ratio * p and t - p > floor:
        regressed.append((q, p, t))
    elif t > 0 and p > ratio * t and p - t > floor:
        improved.append((q, p, t))

# Ambient re-check for flagged rows: the same-day window (same sf/stat,
# within 24h of this entry, excluding it) re-measures the box, and — iff
# the entry carries the SAME git commit — the same CODE. A fast same-day
# same-commit precedent (cur > 1.3x the day's min) proves the slowness is
# load, not code — annotate, don't flag. The commit gate matters: without
# it, a fast pre-change run earlier the same day would hand a genuine
# regression introduced later that day its "fast precedent on identical
# code", silencing the gate exactly when code changed mid-day (the common
# round workflow). Entries without a commit (pre-round-7 history) never
# qualify as precedents — uncertain provenance falls back to REGRESSED.
cur_ts = cur_e.get("ts", 0)
cur_commit = cur_e.get("commit")
same_day = [e for e in base_pool
            if abs(e.get("ts", 0) - cur_ts) <= SAME_DAY_MS
            and cur_commit is not None
            and e.get("commit") == cur_commit]
ambient, real = [], []
for q, p, t in regressed:
    day = [e["queries"][q] for e in same_day
           if e["queries"].get(q, -1) > 0]
    if day and t > AMBIENT_RATIO * min(day):
        ambient.append((q, p, t, min(day)))
    else:
        real.append((q, p, t))

for q, p, t in improved:
    print(f"  IMPROVED  {q:<28} {p:6.2f}s -> {t:6.2f}s  ({t/p:.2f}x vs window-min)")
for q in new:
    print(f"  NEW       {q:<28} {cur_q[q]:6.2f}s")
for q, p, t, d in ambient:
    print(f"  AMBIENT   {q:<28} {p:6.2f}s -> {t:6.2f}s  (same-day min "
          f"{d:.2f}s on identical code — inflation is box load, not a "
          "code regression)")
for q, p, t in real:
    print(f"  REGRESSED {q:<28} {p:6.2f}s -> {t:6.2f}s  ({t/p:.2f}x vs window-min)")

if real or total_regressed:
    if real:
        print(f"bench_diff: {len(real)} regression(s) above {ratio}x+{floor}s")
    sys.exit(1)
if ambient:
    print(f"bench_diff: {len(ambient)} ambient-inflated row(s) annotated; "
          "no code regressions")
else:
    print("bench_diff: no per-query regressions")
