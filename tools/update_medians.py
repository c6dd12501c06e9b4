#!/usr/bin/env python3
"""Rebuild the BASELINE.md per-query medians table from N bench JSON runs.

Usage: update_medians.py bench1.json bench2.json bench3.json
Prints the new table rows (sorted by name) and the total, for manual splice.
"""
import json, statistics, sys

runs = [json.load(open(p)) for p in sys.argv[1:]]
names = sorted(runs[0]["queries"].keys())
for r in runs:
    assert sorted(r["queries"].keys()) == names, "query sets differ between runs"
rows = {n: statistics.median([r["queries"][n] for r in runs]) for n in names}
for n in names:
    print(f"| {n} | {rows[n]:.2f} |")
print(f"TOTAL {sum(rows.values()):.1f} s over {len(names)} queries")
