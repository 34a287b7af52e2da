#!/usr/bin/env python3
"""Wide cross-engine differential sweep: run graft.FuzzDump (Spark) for N
seeded random queries, then execute each sample's SQL in DuckDB and
value-compare — same comparator as tools/check.py, over generated plans
nobody hand-wrote.

Usage: python3 tools/fuzz_check.py [sfdir] [nsamples] [seedbase] [v1..v8|asof|incagg|cdc|cdcstream]
"""
import json, os, shutil, subprocess, sys, glob

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
N = sys.argv[2] if len(sys.argv) > 2 else "200"
BASE = sys.argv[3] if len(sys.argv) > 3 else "1"
GEN = sys.argv[4] if len(sys.argv) > 4 else "v1"  # v1..v8 | asof | incagg | cdc | cdcstream
OUT = "/tmp/graft_fuzz_out"

ADD_OPENS = [f"--add-opens={p}=ALL-UNNAMED" for p in [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"]]


def run_dump():
    shutil.rmtree(OUT, ignore_errors=True)
    cp = f"{REPO}/target/scala-2.13/classes:" + ":".join(
        glob.glob("/opt/spark/jars/*.jar"))
    cmd = ["java", *ADD_OPENS, "-Xmx8g",
           "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
           "-cp", cp, "graft.FuzzDump", SF, OUT, N, BASE, GEN]
    r = subprocess.run(cmd, capture_output=True, text=True)
    for line in r.stderr.splitlines():
        if "[fuzz]" in line:
            print(line)
    if r.returncode != 0:
        print(r.stdout[-3000:]); print(r.stderr[-5000:])
        sys.exit(1)


def compare():
    import duckdb, pandas as pd
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for p in glob.glob(f"{SF}/*.parquet"):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{OUT}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracles.items(), key=lambda kv: int(kv[0].split("_")[1])):
        spark_dir = f"{OUT}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output"); fail += 1; continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in
                             sorted(glob.glob(f"{spark_dir}/*.parquet"))])
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}\n  SQL: {sql}"); fail += 1; continue
        g = got.reindex(sorted(got.columns), axis=1)
        w = want.reindex(sorted(want.columns), axis=1)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: cols {list(g.columns)} vs {list(w.columns)}\n  SQL: {sql}")
            fail += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}\n  SQL: {sql}")
            fail += 1; continue
        gs = g.sort_values(by=list(g.columns), na_position='first').reset_index(drop=True)
        ws = w.sort_values(by=list(w.columns), na_position='first').reset_index(drop=True)
        diffs = []
        for c in g.columns:
            a, b = gs[c], ws[c]
            try:
                eq = (a.astype(str) == b.astype(str)) | (a.isna() & b.isna())
            except Exception:
                eq = a == b
            if not eq.all():
                i = (~eq).idxmax()
                diffs.append(f"col {c} row {i}: spark={a[i]!r} duckdb={b[i]!r} "
                             f"({(~eq).sum()} diffs)")
        if diffs:
            print(f"FAIL {name}: " + "; ".join(diffs[:3]) + f"\n  SQL: {sql}")
            fail += 1
        else:
            ok += 1
    print(f"\n{ok} ok, {fail} fail (seeds {BASE}..{int(BASE)+int(N)-1} at {SF})")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    run_dump()
    compare()
