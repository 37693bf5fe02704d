#!/bin/bash
# Focused bench runner: tools/bench.sh [comma-separated-queries] [sfdir]
# Uses the compiled classes directly (no sbt JVM) — the fast path from
# .claude/skills/verify/SKILL.md. Run on an idle machine, min-of-3.
set -eo pipefail
cd "$(dirname "$0")/.."
QUERIES="${1:-}"
SFDIR="${2:-/root/testdata/sf0.1}"
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
# stderr (Spark INFO noise, but also any crash) goes to a log, not
# /dev/null: with pipefail a dead JVM now exits non-zero AND leaves
# its diagnostics readable instead of vanishing behind tail's 0.
# Default path is per-run (PID-suffixed) so concurrent invocations
# don't clobber each other's crash diagnostics; BENCH_STDERR_LOG pins
# a fixed path when you want one.
STDERR_LOG="${BENCH_STDERR_LOG:-/tmp/graft_bench_stderr.$$.log}"
# only export the subset filter when non-empty: Bench treats a SET but
# EMPTY SPARK_GRAFT_QUERIES as "select zero queries" (an empty-but-set
# var would silently bench nothing and exit green)
if [ -n "$QUERIES" ]; then export SPARK_GRAFT_QUERIES="$QUERIES"; else unset SPARK_GRAFT_QUERIES; fi
SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "/opt/spark/jars/*:target/scala-2.13/classes" graft.Bench 2>"$STDERR_LOG" | tail -1 \
  || { echo "bench failed; last stderr:" >&2; tail -5 "$STDERR_LOG" >&2; exit 1; }
