#!/usr/bin/env bash
# Deploy-day smoke for the PG COPY path (K4): exercises the reflective
# pgjdbc CopyManager adapter against a REAL Postgres — the one seam the
# development sandbox cannot test (no PG server, no pgjdbc jar there).
#
# Usage:
#   PGJDBC_JAR=/path/to/postgresql-42.x.x.jar \
#   scripts/pg_smoke.sh "jdbc:postgresql://host:5432/db" user password [table]
#
# What it does: packages the library, then runs graft.PgSmoke, which
# COPY-loads 4 hostile rows (NULL vs empty string, embedded
# quotes/commas/newlines, fractional-second timestamp) through the real
# wire protocol from 2 partitions, reads them back, asserts every
# framing case round-tripped, and drops its scratch table.
#
# Exit 0 + "PG SMOKE: OK" = the COPY path is safe to point at the
# production load. Any failure exits nonzero.
set -euo pipefail

if [[ $# -lt 3 ]]; then
  echo "usage: PGJDBC_JAR=... $0 <jdbc-url> <user> <password> [table]" >&2
  exit 2
fi
: "${PGJDBC_JAR:?set PGJDBC_JAR to the postgresql driver jar path}"
[[ -f "$PGJDBC_JAR" ]] || { echo "PGJDBC_JAR not found: $PGJDBC_JAR" >&2; exit 2; }

SPARK_JARS="${SPARK_JARS:-/opt/spark/jars}"
cd "$(dirname "$0")/.."

sbt -batch package >/dev/null

APP_JAR=$(ls target/scala-2.13/*.jar | head -1)
exec java -cp "$APP_JAR:$SPARK_JARS/*:$PGJDBC_JAR" \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  graft.sinks.PgSmoke "$@"
