#!/bin/bash
# Time individual queries at a given SF via graft.Bench.
# usage: tools/timeq.sh <sfdir> <query> [query...]
#
# -Xmx8g is the CANONICAL bench heap: bigger heaps (16g/64g) inflate
# mid-size queries 3-9x via G1 region geometry (verify skill, round 5) —
# a regression-triage tool must not embed the known noise source.
#
# Output goes to a temp file, never the repo tree: a triage run must not
# clobber the committed BENCH.json (VERDICT r7 #1/#2). Env vars ride on
# the same simple command as `java` via `env` — NO backslash-continuation
# before the command (the r7 bug: a continuation into a comment line made
# every assignment bind to nothing, so the tool benched the full suite at
# the default SF and overwrote BENCH.json).
set -euo pipefail
if [ $# -lt 2 ]; then echo "usage: tools/timeq.sh <sfdir> <query> [query...]" >&2; exit 2; fi
SF=$1; shift
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
OPENS=$(for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar; do echo --add-opens=$p=ALL-UNNAMED; done)
OUT=$(mktemp /tmp/graft-timeq-XXXXXX.json)
env SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="${CPUS:-32}" \
    SPARK_GRAFT_ONLY="$*" SPARK_GRAFT_BENCH_OUT="$OUT" \
  java $OPENS -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Bench 2>/dev/null >/dev/null
cat "$OUT"
rm -f "$OUT"
