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
import statistics
import sys


def sf_token(sf: str) -> str:
    base = sf.rstrip("/").split("/")[-1]
    return base[2:] if base.startswith("sf") else base


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # scale filter (mirrors graft.Bench.sfToken): history never mixes
    # scale factors. First arg may be an sf token (default 0.1).
    args = sys.argv[1:]
    sf = args.pop(0) if args and not args[0].endswith(".json") else "0.1"
    paths = sorted(glob.glob(os.path.join(root, "BENCH*.json")))
    paths += args
    hist, used = {}, []
    for p in paths:
        try:
            with open(p) as f:
                d = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if d.get("contended") is True:
            continue  # self-reported dirty capture: never a minimum source
        if sf_token(str(d.get("sf", ""))) != sf_token(sf):
            continue
        qs = d.get("queries")
        if not isinstance(qs, dict) or not qs:
            continue
        used.append(os.path.basename(p))
        for k, v in qs.items():
            if isinstance(v, (int, float)) and v >= 0:
                hist.setdefault(k, []).append(v)
    # variance model (mirrors graft.Bench.varModel): robust location =
    # median, robust scale = 1.4826*MAD floored at 5% of median and
    # 50 ms; queries with < 4 clean observations fall back to the
    # minima envelope only
    model = {}
    for k, xs in hist.items():
        if len(xs) >= 4:
            med = statistics.median(xs)
            mad = statistics.median(abs(x - med) for x in xs)
            model[k] = {
                "med": round(med, 3),
                "scale": round(max(1.4826 * mad, 0.05 * med, 0.05), 3),
                "n": len(xs),
            }
    print(json.dumps({
        "queries": {k: round(min(v), 3) for k, v in sorted(hist.items())},
        "var_model": {k: model[k] for k in sorted(model)},
        "n_artifacts": len(used),
        "artifacts": used,
    }))


if __name__ == "__main__":
    main()
