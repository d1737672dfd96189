#!/usr/bin/env bash
# Round-19 measurement campaign — executes the protocol round 18 wrote
# into NOTES.md (sf10 scale anchor) plus the two instrumented
# microbenches and the sf1 oracle replay. Run on an OTHERWISE IDLE box
# (NOTES.md: co-tenant load inflates bench numbers 3-8x); everything is
# serial for exactly that reason.
#
#   scripts/r19_campaign.sh [outdir]     # default target/r19
#
# Artifacts land in <outdir>:
#   bench_sf0.1.json / bench_sf1.json / bench_sf10.json  (same sitting)
#   skewscale_sf1.json                                   (zipf A/B)
#   versionlog_e1k.json / versionlog_e20k.json           (cadence axes)
#   verify_sf1/ (parquet dumps)  -> oracle replay is run separately
#     (scripts/oracle_check.py target/sf1 <outdir>/verify_sf1)
set -euo pipefail
cd "$(git rev-parse --show-toplevel)"
OUT=${1:-target/r19}
mkdir -p "$OUT"

GATES22="q100_ivfpq_recall,q101_ivfpq_nprobe2,q102_ivfpq_recall_curve,q103_ivfpq_residual,q104_ivfpq_residual_recall,q121_ivfpq_persisted,q122_ivfpq_append,q125_skipping_read,q144_resample_ffill,q145_compact_small,q161_equi_depth,q164_time_travel,q165_store_upsert,q166_change_feed,q169_retention_delete,q170_recluster,q182_index_append,q184_snapshot_export,q189_replicate_feed,q194_ivfpq_serve,q23_trainlist_reader,q54_load_protocol"
GATES23="$GATES22,q195_zipf_salted"

json_line() { # extract the one bare-JSON line from an sbt log
  grep -o '{.*}' "$1" | tail -1
}

step() { echo "== [$(date +%H:%M:%S)] $*" >&2; }

# ---- 1. deterministic scale-ups (zipf 1.2 skew fixture included)
if [ ! -d target/sf1/skew.parquet ]; then
  step "GenScale 10x -> target/sf1"
  sbt -batch "runMain graft.GenScale /root/testdata/sf0.1 target/sf1 10 1.2" \
    > "$OUT/genscale_sf1.log" 2>&1
fi
if [ ! -d target/sf10/skew.parquet ]; then
  step "GenScale 100x -> target/sf10"
  sbt -batch "runMain graft.GenScale /root/testdata/sf0.1 target/sf10 100 1.2" \
    > "$OUT/genscale_sf10.log" 2>&1
fi

# ---- 2. same-sitting scale anchor: 22 lifecycle gates + q195 at three scales
bench() { # <sfdir> <tag>
  step "Bench $2 ($1)"
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_QUERIES="$GATES23" \
    SPARK_GRAFT_BENCH_OUT="$OUT/bench_$2.json" \
    sbt -batch "runMain graft.Bench" > "$OUT/bench_$2.log" 2>&1
}
bench /root/testdata/sf0.1 sf0.1
bench "$PWD/target/sf1" sf1
bench "$PWD/target/sf10" sf10

# ---- 3. skew A/B on the zipf(1.2) fixture
step "SkewScale on target/sf1"
sbt -batch "runMain graft.operators.SkewScale target/sf1" \
  > "$OUT/skewscale_sf1.log" 2>&1
json_line "$OUT/skewscale_sf1.log" > "$OUT/skewscale_sf1.json"

# ---- 4. version-log cadence-policy + second-vacuum axes
step "VersionLogScale E=1k (adaptive K=10)"
sbt -batch "runMain graft.sinks.VersionLogScale 10000 1000" \
  > "$OUT/versionlog_e1k.log" 2>&1
json_line "$OUT/versionlog_e1k.log" > "$OUT/versionlog_e1k.json"
step "VersionLogScale E=20k (adaptive K=100)"
sbt -batch "runMain graft.sinks.VersionLogScale 10000 20000" \
  > "$OUT/versionlog_e20k.log" 2>&1
json_line "$OUT/versionlog_e20k.log" > "$OUT/versionlog_e20k.json"

# ---- 5. sf1 correctness dump at HEAD (oracle replay runs after, via
#      scripts/oracle_check.py — DuckDB is driver-side tooling)
step "Verify dump at sf1"
sbt -batch "runMain graft.Verify target/sf1 $OUT/verify_sf1" \
  > "$OUT/verify_sf1.log" 2>&1

step "campaign artifacts complete: $OUT"
