#!/usr/bin/env python3
"""Compare two BENCH_HISTORY.jsonl records (sf0.1 baseline vs sf1) and
flag super-linear scaling: with 10x data, a query growing >15x is where
a hidden scale-killer would surface first (VERDICT r11 methodology).

Usage: python3 scripts/sf1_compare.py [threshold_ratio]
Picks the most recent record whose sf ends in sf0.1 and the most recent
whose sf ends in sf1 from BENCH_HISTORY.jsonl.
"""
import json, sys

THRESH = float(sys.argv[1]) if len(sys.argv) > 1 else 15.0

base = sf1 = None
for line in open("BENCH_HISTORY.jsonl"):
    r = json.loads(line)
    if len(r.get("queries", {})) < 10:
        continue  # single-query profiling runs are not comparison baselines
    sf = r.get("sf", "")
    if sf.endswith("sf0.1"):
        base = r
    elif sf.endswith("sf1"):
        sf1 = r

if not base or not sf1:
    sys.exit("need both an sf0.1 and an sf1 record in BENCH_HISTORY.jsonl")

common = sorted(set(base["queries"]) & set(sf1["queries"]))
print(f"{'query':28s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>7s}")
flagged = []
for q in common:
    b, s = base["queries"][q], sf1["queries"][q]
    if b <= 0 or s <= 0:
        print(f"{q:28s} {b:8.2f} {s:8.2f}   FAILED")
        flagged.append((q, None))
        continue
    ratio = s / b
    mark = "  <-- SUPER-LINEAR" if ratio > THRESH else ""
    if mark:
        flagged.append((q, ratio))
    print(f"{q:28s} {b:8.2f} {s:8.2f} {ratio:6.1f}x{mark}")
tb = sum(v for v in base["queries"].values() if v > 0)
ts = sum(v for v in sf1["queries"].values() if v > 0)
print(f"\n{'TOTAL':28s} {tb:8.2f} {ts:8.2f} {ts/tb:6.1f}x")
print(f"\n{len(flagged)} queries above {THRESH}x for 10x data" if flagged
      else f"\nall {len(common)} queries scale sub-{THRESH}x for 10x data")
