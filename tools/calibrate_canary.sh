#!/bin/bash
# Recalibrate the host-steal canary constant (graft.Bench.CanaryRef).
# Run on a verified-quiet machine; prints 5 canary timings + their median.
# Paste the median into Bench.scala's CanaryRef.
set -euo pipefail
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
java -cp "$CP" graft.CanaryCalibrate
