#!/usr/bin/env bash
# Deploy-day smoke for the PG load path (K4): exercises the reflective
# pgjdbc CopyManager adapter against a REAL Postgres — the one seam the
# development sandbox cannot test (no PG server, no pgjdbc jar, zero
# egress there). Everything else runs for real in EVERY mode: COPY csv
# framing round-trip (NULL vs empty string, embedded quotes/commas/
# newlines, fractional-second timestamp, 2 partitions → 2 COPY
# messages), then the FULL K4–K7 protocol (armed constraint hooks via
# real ALTER TABLE, per-streak ranged DELETEs, COPY bulk append,
# per-day audit inserts, constraint RECREATE), loaded TWICE to prove
# run idempotence, with a duplicate-key insert asserting the recreated
# PK enforces. Scratch tables are dropped on the way out.
#
# Three modes:
#
#   1. DRY RUN (no Postgres, no docker — what CI and the test suite
#      run; PgCopySpec exercises the same entry point):
#        scripts/pg_smoke.sh --dry-run
#      Runs both phases against in-memory Derby with a CSV-parsing
#      CopyApi double standing in for the PG wire. Proves the harness;
#      the only seam it does NOT cover is pgjdbc's CopyManager itself.
#
#   2. COMPOSE (one command on any box with docker + the pgjdbc jar —
#      the intended deploy-day form):
#        PGJDBC_JAR=/path/to/postgresql-42.7.x.jar scripts/pg_smoke.sh --compose
#      Starts a scratch postgres:16 via scripts/pg_smoke_compose.yml
#      (port 55432, user/pass/db all "graft"), waits for healthy, runs
#      the smoke over the real wire, tears the container and its
#      volume down whatever the outcome. Get the driver jar from Maven
#      Central (coordinates org.postgresql:postgresql, any 42.x).
#
#   3. EXPLICIT URL (an existing server):
#        PGJDBC_JAR=... scripts/pg_smoke.sh "jdbc:postgresql://host:5432/db" user password [table]
#
# Expected output (modes 2 and 3; dry run prints the same two phase
# lines and "PG SMOKE (DRY RUN): OK"):
#
#   framing: loaded=4 ok=true
#   protocol: rows_after_double_load=6 (want 6) audit_rows=8 (want 8) pk_enforces=true
#   PG SMOKE: OK
#
# Exit 0 + the OK line = the COPY path is safe to point at the
# production load. Any failure exits nonzero.
set -euo pipefail

cd "$(dirname "$0")/.."
SPARK_JARS="${SPARK_JARS:-/opt/spark/jars}"

run_smoke() { # <args...> passed to graft.sinks.PgSmoke
  sbt -batch package >/dev/null
  local app_jar extra_cp=""
  app_jar=$(ls target/scala-2.13/*.jar | head -1)
  [[ -n "${PGJDBC_JAR:-}" ]] && extra_cp=":$PGJDBC_JAR"
  java -cp "$app_jar:$SPARK_JARS/*$extra_cp" \
    --add-opens=java.base/java.lang=ALL-UNNAMED \
    --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
    --add-opens=java.base/java.nio=ALL-UNNAMED \
    --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
    --add-opens=java.base/java.util=ALL-UNNAMED \
    --add-opens=java.base/java.io=ALL-UNNAMED \
    graft.sinks.PgSmoke "$@"
}

case "${1:-}" in
  --dry-run)
    # Derby ships with the Spark jars — no driver, server, or docker
    run_smoke --dry-run
    ;;
  --compose)
    : "${PGJDBC_JAR:?set PGJDBC_JAR to the postgresql driver jar path (org.postgresql:postgresql 42.x from Maven Central)}"
    [[ -f "$PGJDBC_JAR" ]] || { echo "PGJDBC_JAR not found: $PGJDBC_JAR" >&2; exit 2; }
    command -v docker >/dev/null || { echo "docker not found" >&2; exit 2; }
    COMPOSE_FILE=scripts/pg_smoke_compose.yml
    trap 'docker compose -f "$COMPOSE_FILE" down -v >/dev/null 2>&1 || true' EXIT
    docker compose -f "$COMPOSE_FILE" up -d --wait
    run_smoke "jdbc:postgresql://localhost:55432/graft" graft graft "${2:-graft_pg_smoke}"
    ;;
  "")
    echo "usage: $0 --dry-run | PGJDBC_JAR=... $0 --compose [table] | PGJDBC_JAR=... $0 <jdbc-url> <user> <password> [table]" >&2
    exit 2
    ;;
  *)
    if [[ $# -lt 3 ]]; then
      echo "usage: PGJDBC_JAR=... $0 <jdbc-url> <user> <password> [table]" >&2
      exit 2
    fi
    : "${PGJDBC_JAR:?set PGJDBC_JAR to the postgresql driver jar path}"
    [[ -f "$PGJDBC_JAR" ]] || { echo "PGJDBC_JAR not found: $PGJDBC_JAR" >&2; exit 2; }
    run_smoke "$@"
    ;;
esac
