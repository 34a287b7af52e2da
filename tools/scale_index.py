#!/usr/bin/env python3
"""Consolidated scale-coverage index (VERDICT r9 #4).

A dozen BENCH_SCALE_*.json artifacts exist, written across rounds under two
provenance regimes (pre-r9 files carry no contention canary). Which of the
declared queries has a canonical x3/x10 growth result is not auditable
without reading all of them — so this script emits SCALE_INDEX.json mapping
EVERY query in BENCH.json to its best available scale evidence:

  - "artifact": the BENCH_SCALE file the entry comes from. When a query
    appears in several, canonical artifacts (every factor's window carries
    canary.canonical == true) beat uncanaried ones, then the larger max
    factor, then the newer file.
  - "max_factor": largest factor stressed there (e.g. "x10").
  - "canonical": whether that artifact's windows are all canonical.
  - "worst_vs_linear": the worst time/(k*x1) ratio across its factors.
  - "all_artifacts": every artifact containing the query.

Queries with NO scale artifact at all are listed explicitly under
"never_stressed" — silent absence is the failure mode this index exists to
remove.

Usage: python3 tools/scale_index.py [repo_dir]   (writes SCALE_INDEX.json)
Exit 0 always (the index is an inventory, not a gate; gates live in
tools/scale_report.py).
"""
import glob
import json
import os
import sys


def artifact_meta(path):
    with open(path) as f:
        d = json.load(f)
    factors = d.get("factors", {})
    canonical = bool(factors) and all(
        (v.get("canary") or {}).get("canonical") is True
        for v in factors.values())
    max_factor = max(factors, key=lambda t: int(t.lstrip("x"))) if factors else None
    return d, canonical, max_factor


def worst_ratio(row):
    ratios = [v for k, v in row.items()
              if k.endswith("_vs_linear") and isinstance(v, (int, float))]
    return max(ratios) if ratios else None


def main():
    repo = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    bench = json.load(open(os.path.join(repo, "BENCH.json")))
    universe = sorted(bench.get("queries", {}))

    entries = {}   # q -> list of candidate dicts
    artifacts = sorted(glob.glob(os.path.join(repo, "BENCH_SCALE*.json")))
    for path in artifacts:
        name = os.path.basename(path)
        d, canonical, max_factor = artifact_meta(path)
        mtime = os.path.getmtime(path)
        for q, row in d.get("queries", {}).items():
            entries.setdefault(q, []).append({
                "artifact": name,
                "canonical": canonical,
                "max_factor": max_factor,
                "worst_vs_linear": worst_ratio(row),
                "_rank": (canonical, int((max_factor or "x0").lstrip("x")), mtime),
            })

    index = {}
    for q, cands in entries.items():
        best = max(cands, key=lambda c: c["_rank"])
        index[q] = {
            "artifact": best["artifact"],
            "max_factor": best["max_factor"],
            "canonical": best["canonical"],
            "worst_vs_linear": best["worst_vs_linear"],
            "all_artifacts": sorted({c["artifact"] for c in cands}),
        }

    never = [q for q in universe if q not in index]
    # queries indexed but no longer declared (renamed/removed) — kept
    # visible so stale artifacts can't masquerade as current coverage
    stale = sorted(q for q in index if q not in universe)
    out = {
        "artifacts_scanned": [os.path.basename(p) for p in artifacts],
        "queries": {q: index[q] for q in sorted(index) if q in universe},
        "never_stressed": never,
        "stale_entries": stale,
        "summary": {
            "declared_queries": len(universe),
            "stressed": len(universe) - len(never),
            "stressed_canonical": sum(
                1 for q in universe
                if q in index and index[q]["canonical"]),
            "never_stressed": len(never),
        },
    }
    out_path = os.path.join(repo, "SCALE_INDEX.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out["summary"]))
    print(f"wrote {out_path}; never_stressed: {len(never)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
