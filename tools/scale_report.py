#!/usr/bin/env python3
"""Merge per-factor Bench outputs into BENCH_SCALE.json.

Usage: scale_report.py OUT x1:FILE x3:FILE x10:FILE ...

Each FILE is a Bench full-line JSON (medians per query). The report holds
per-query medians per factor, the per-query growth ratio vs the linear
ideal (time_xK / (K * time_x1)), and a verdict: a query is flagged
superlinear when its x10 time exceeds 1.5x the linear ideal AND the
absolute excess is > 1s (sub-second noise is not a growth curve).

PROVENANCE GATE: every per-factor Bench file carries the five-probe
contention canary (spin/parallel/memory/disk/Spark-work + /proc/stat
steal) with its own canonical flag. A contended window inflates the x10
numerator (fake superlinear) or the x1 denominator (masked superlinear)
just as effectively as it fakes a main-bench regression, so this script
REFUSES to emit a clean/flagged verdict unless every factor's window is
canonical — the merged report still lands (with verdict "indeterminate"
and the per-factor canary blocks embedded) so the data isn't lost, but
exit code 2 signals "re-run in a quiet window", distinct from 1
("genuinely superlinear").
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
    non_canonical = []
    for tag in factors:
        canary = runs[tag].get("canary")
        report["factors"][tag] = {
            "total_sec": runs[tag]["value"],
            "sf": runs[tag]["sf"],
            "failed": runs[tag]["failed"],
            "canary": canary,
        }
        if not (canary and canary.get("canonical") is True):
            non_canonical.append(tag)
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
    report["verdict"] = (
        "indeterminate" if non_canonical
        else ("superlinear" if report["superlinear"] else "clean"))
    report["non_canonical_factors"] = non_canonical
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps({"verdict": report["verdict"],
                      "superlinear": report["superlinear"],
                      "non_canonical_factors": non_canonical,
                      "totals": {t: report["factors"][t]["total_sec"]
                                 for t in factors}}))
    if non_canonical:
        print(f"scale_report: factors {non_canonical} ran in a contended/"
              "uncanaried window — no clean/flagged verdict; re-run them "
              "when the canary reads canonical", file=sys.stderr)
        return 2
    return 1 if report["superlinear"] else 0


if __name__ == "__main__":
    sys.exit(main())
