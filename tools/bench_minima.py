#!/usr/bin/env python3
"""Per-query minima across the repo's bench artifacts.

The full-sweep totals swing with sub-threshold host steal (122.9 s vs
139.6 s at identical code in round 10), so a single artifact cannot
separate drift from regression. This walks every BENCH*.json in the
repo root (and any extra paths given as args), takes the per-query
minimum over artifacts whose telemetry is clean (contended == false
when the field exists), and prints one JSON line:
  {"queries": {name: min_sec}, "n_artifacts": N, "artifacts": [...]}
A genuine regression is a query whose fresh clean time exceeds its
historical minimum by more than the noise envelope; anything else is
host weather. Stdlib-only; run: python3 tools/bench_minima.py
"""
import glob
import json
import os
import sys


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(root, "BENCH*.json")))
    paths += sys.argv[1:]
    minima, used = {}, []
    for p in paths:
        try:
            with open(p) as f:
                d = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if d.get("contended") is True:
            continue  # self-reported dirty capture: never a minimum source
        qs = d.get("queries")
        if not isinstance(qs, dict) or not qs:
            continue
        used.append(os.path.basename(p))
        for k, v in qs.items():
            if isinstance(v, (int, float)) and v >= 0:
                minima[k] = min(minima.get(k, v), v)
    print(json.dumps({
        "queries": {k: round(v, 3) for k, v in sorted(minima.items())},
        "n_artifacts": len(used),
        "artifacts": used,
    }))


if __name__ == "__main__":
    main()
