#!/usr/bin/env python3
"""Distill runs=N cold bench logs into per-query / per-family medians.

Usage: distill_baseline.py <run1.log> [run2.log ...]

Each log is a `runMain graft.Bench` capture; the first JSON line
(`"metric":"detail"`) carries the complete per-query timing map. Prints
per-family medians + min/max band and the slowest per-query medians —
the numbers BASELINE.md's recorded section and Bench.familyBand use.
"""
import json
import re
import statistics
import sys


def detail(path):
    with open(path) as f:
        for line in f:
            m = re.search(r'\{"metric":"detail".*\}', line)
            if m:
                d = json.loads(m.group(0))
                return {k: float(v) for k, v in d["queries"].items()}
    raise SystemExit(f"{path}: no detail line (run incomplete?)")


def family(name):
    return "_".join(name.split("_")[:2]) if name.startswith("p_") else name.split("_")[0]


def main(paths):
    runs = [detail(p) for p in paths]
    keys = set(runs[0])
    for r in runs[1:]:
        if set(r) != keys:
            raise SystemExit(f"query sets differ across runs: {sorted(set(r) ^ keys)}")
    med = {k: statistics.median(r[k] for r in runs) for k in keys}
    fam_runs = []
    for r in runs:
        fr = {}
        for k, v in r.items():
            fr[family(k)] = fr.get(family(k), 0.0) + v
        fam_runs.append(fr)
    print(f"runs={len(runs)} queries={len(keys)}")
    print(f"totals per run: {[round(sum(r.values()), 1) for r in runs]}")
    print(f"total of per-query medians: {round(sum(med.values()), 1)}")
    print("\nfamily: median [min..max] across runs   (familyBand source)")
    fams = sorted(fam_runs[0], key=lambda f: -statistics.median(fr[f] for fr in fam_runs))
    for f in fams:
        vals = [fr[f] for fr in fam_runs]
        print(f"  {f:12s} {statistics.median(vals):7.1f} [{min(vals):.1f}..{max(vals):.1f}]")
    print("\nslowest per-query medians:")
    for k in sorted(med, key=lambda k: -med[k])[:25]:
        vals = [r[k] for r in runs]
        print(f"  {k:32s} {med[k]:7.1f} [{min(vals):.1f}..{max(vals):.1f}]")


if __name__ == "__main__":
    main(sys.argv[1:])
