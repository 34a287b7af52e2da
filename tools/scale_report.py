#!/usr/bin/env python3
"""Merge per-factor Bench outputs into BENCH_SCALE.json.

Usage: scale_report.py OUT x1:FILE x3:FILE x10:FILE ...

Each FILE is a Bench full-line JSON (medians per query). The report holds
per-query medians per factor, the per-query growth ratio vs the linear
ideal (time_xK / (K * time_x1)), and a verdict: a query is flagged
superlinear when its x10 time exceeds 1.5x the linear ideal AND the
absolute excess is > 1s (sub-second noise is not a growth curve).
"""
import json
import sys


def main() -> int:
    out_path = sys.argv[1]
    runs = {}
    for spec in sys.argv[2:]:
        tag, path = spec.split(":", 1)
        with open(path) as f:
            runs[tag] = json.load(f)
    factors = sorted(runs, key=lambda t: int(t.lstrip("x")))
    base = runs[factors[0]]["queries"]
    report = {"factors": {}, "queries": {}, "superlinear": []}
    for tag in factors:
        report["factors"][tag] = {
            "total_sec": runs[tag]["value"],
            "sf": runs[tag]["sf"],
            "failed": runs[tag]["failed"],
        }
    for q, t1 in sorted(base.items()):
        row = {"x1_sec": round(t1, 3)}
        for tag in factors[1:]:
            k = int(tag.lstrip("x"))
            tk = runs[tag]["queries"].get(q)
            if tk is None:
                continue
            ideal = k * t1
            row[f"{tag}_sec"] = round(tk, 3)
            row[f"{tag}_vs_linear"] = round(tk / ideal, 3) if ideal > 0 else None
        report["queries"][q] = row
        last = factors[-1]
        k = int(last.lstrip("x"))
        tk = runs[last]["queries"].get(q)
        if tk is not None and tk > 1.5 * k * t1 and tk - k * t1 > 1.0:
            report["superlinear"].append(q)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps({"superlinear": report["superlinear"],
                      "totals": {t: report["factors"][t]["total_sec"]
                                 for t in factors}}))
    return 1 if report["superlinear"] else 0


if __name__ == "__main__":
    sys.exit(main())
