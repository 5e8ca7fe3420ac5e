#!/usr/bin/env python3
"""Re-baseline BASELINE.md rows from two quiet-host full-suite runs.

Usage: tools/rebaseline.py run1.json run2.json q93_dedup_simhash,q125_...

For each named query: min s = min(run1, run2); typ s = the other run's
min (the q116a/b round-11 precedent: both columns carry full-suite
interleaved mins, never a focused-run figure).
"""
import json
import sys

run1 = json.load(open(sys.argv[1]))["queries"]
run2 = json.load(open(sys.argv[2]))["queries"]
names = set(sys.argv[3].split(","))

missing = names - set(run1) - set(run2)
if missing:
    sys.exit(f"not benched: {sorted(missing)}")

out = []
for line in open("BASELINE.md"):
    if line.startswith("| q"):
        q = line.split("|")[1].strip()
        if q in names:
            lo, hi = sorted([run1[q], run2[q]])
            out.append(f"| {q} | {lo:.2f} | {hi:.2f} |\n")
            names.discard(q)
            continue
    out.append(line)

if names:
    sys.exit(f"rows not found in BASELINE.md: {sorted(names)}")
open("BASELINE.md", "w").write("".join(out))
print("re-baselined", sys.argv[3])
