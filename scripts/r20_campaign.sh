#!/usr/bin/env bash
# Round-20 measurement campaign — executes the sf100 protocol NOTES.md
# round 19 pre-recorded: the SAME 23 anchor gates, engine-only, four
# same-sitting legs at sf0.1 / sf1 / sf10 / sf100 (GenScale 10x / 100x /
# 1000x of sf0.1, zipf 1.2 fixture included), min-of-passes + retime
# protocol identical at every scale, and a 150-minute ABORT on the
# sf100 leg (a timed-out leg is a finding, not a silent shrink).
#
# The three smaller legs ALSO time the two r20 gates (q196 deployed-
# configuration IVF-PQ serve, q197 one-call join pre-flight) for their
# own 3-scale slopes; the sf100 leg stays at exactly the protocol's 23
# (combine_anchor.py intersects names, so the 4-scale anchor is the 23
# either way).
#
# After the bench sitting: Verify dump + DuckDB oracle replay at sf10
# for the oracle-feasible subset (VERDICT r20 item 4) — relational and
# text gates; the ANN/PQ oracles (superlinear in DuckDB's blocking
# operators; q103/q104 took ~9 min EACH at sf1) and the store-lifecycle
# gates (sf1 oracle pins + in-gate asserts already cover semantics)
# are the explicit infeasible/skip list.
#
#   scripts/r20_campaign.sh [outdir]    # default target/r20
set -euo pipefail
cd "$(git rev-parse --show-toplevel)"
OUT=${1:-target/r20}
mkdir -p "$OUT"

GATES23="q100_ivfpq_recall,q101_ivfpq_nprobe2,q102_ivfpq_recall_curve,q103_ivfpq_residual,q104_ivfpq_residual_recall,q121_ivfpq_persisted,q122_ivfpq_append,q125_skipping_read,q144_resample_ffill,q145_compact_small,q161_equi_depth,q164_time_travel,q165_store_upsert,q166_change_feed,q169_retention_delete,q170_recluster,q182_index_append,q184_snapshot_export,q189_replicate_feed,q194_ivfpq_serve,q195_zipf_salted,q23_trainlist_reader,q54_load_protocol"
GATES25="$GATES23,q196_ivfpq_serve_deployed,q197_join_preflight"

# sf10 oracle-replay subset: relational + text families. Explicitly
# SKIPPED (recorded in CORRECTNESS_r20_sf10.json's note): the ivfpq/ANN
# family (DuckDB replay superlinear), the store-lifecycle gates (sf1
# pins + in-gate asserts), and the LSH pair-join dedup gates (DuckDB
# list_intersect at sf10 exceeds the 20 GB spill cap).
ORACLE_SF10="q01_groupby_agg,q02_filter_project,q03_notnull_good,q05_empty_to_null,q06_broadcast_lookup,q08_first_ts_enrich,q09_distinct,q10_union,q11_keeplast_dedup,q13_date_streaks,q14_derive_keys,q16_service_date,q18_vat_grossup,q20_topk_orders,q25_consolidate_dedup,q27_salted_agg,q28_salted_join,q29_heavy_hitters,q30_exact_dedup,q33_text_stats,q45_ngram_jaccard,q46_bpe_rolling,q48_quality_lang_profile,q50_repetition_stats,q59_redaction,q61_tfidf_terms,q64_length_percentiles,q65_c4_line_clean,q69_repeated_lines,q70_asof_join,q72_top_ngrams,q73_quality_filter,q74_rolling_window,q75_pivot,q76_cube,q85_interval_join,q87_token_chunks,q88_scd2_build,q92_quality_threshold,q94_source_percentrank,q109_pagerank,q114_hopping_window,q117_funnel,q119_set_ops,q127_join_size_preflight,q128_asof_ntz,q130_session_paths,q131_retention_cohorts,q133_incremental_rollup,q135_rollup,q136_grouping_sets,q141_auto_salt,q142_window_funcs,q143_nullsafe_join,q147_resample_interp,q148_unpivot,q150_star_join,q152_markov_chain,q153_outliers,q155_session_window,q156_nearest_join,q157_below_avg,q158_hopping_distinct,q160_top_unshipped,q161_equi_depth,q162_incremental_sessions,q163_epoch_shuffle,q172_collocations,q173_bigram_lm,q174_hashing_tf,q176_source_drift,q179_volume_outliers,q180_ingest_gaps,q183_sole_returner,q193_growth_accounting,q195_zipf_salted,q197_join_preflight"

step() { echo "== [$(date +%H:%M:%S)] $*" >&2; }

# ---- 1. deterministic scale-ups (reused when already generated —
#         GenScale is deterministic, so the fixture is the same bytes)
gen() { # <dst> <factor>
  if [ ! -d "$1/skew.parquet" ]; then
    step "GenScale ${2}x -> $1"
    sbt -batch "runMain graft.GenScale /root/testdata/sf0.1 $1 $2 1.2" \
      > "$OUT/genscale_$(basename "$1").log" 2>&1
  fi
}
gen target/sf1 10
gen target/sf10 100
gen target/sf100 1000

# ---- 2. the same-sitting 4-leg anchor
bench() { # <sfdir> <tag> <gates> <mem>
  step "Bench $2 ($1, mem $4)"
  SPARK_DRIVER_MEM="$4" SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_QUERIES="$3" \
    SPARK_GRAFT_BENCH_OUT="$OUT/bench_$2.json" \
    sbt -batch "runMain graft.Bench" > "$OUT/bench_$2.log" 2>&1
}
bench /root/testdata/sf0.1 sf0.1 "$GATES25" 8g
bench "$PWD/target/sf1"    sf1   "$GATES25" 8g
bench "$PWD/target/sf10"   sf10  "$GATES25" 16g
# sf100: the pre-recorded 150-min abort criterion, enforced mechanically
step "Bench sf100 (abort at 150 min)"
set +e
SPARK_DRIVER_MEM=96g SPARK_GRAFT_SF_DIR="$PWD/target/sf100" \
  SPARK_GRAFT_QUERIES="$GATES23" \
  SPARK_GRAFT_BENCH_OUT="$OUT/bench_sf100.json" \
  timeout -k 60 9000 sbt -batch "runMain graft.Bench" \
  > "$OUT/bench_sf100.log" 2>&1
RC=$?
set -e
if [ "$RC" = "124" ]; then
  step "sf100 leg ABORTED at 150 min (protocol criterion) — partial log kept"
  echo '{"aborted":true,"criterion":"150min","log":"bench_sf100.log"}' \
    > "$OUT/bench_sf100_ABORTED.json"
elif [ "$RC" != "0" ]; then
  step "sf100 leg FAILED rc=$RC — see bench_sf100.log"
fi

# ---- 3. combine + the standing slope gate
if [ -s "$OUT/bench_sf100.json" ]; then
  python3 scripts/combine_anchor.py \
    sf0.1=1="$OUT/bench_sf0.1.json" sf1=10="$OUT/bench_sf1.json" \
    sf10=100="$OUT/bench_sf10.json" sf100=1000="$OUT/bench_sf100.json" \
    --metric scale_anchor_sf0.1_sf1_sf10_sf100 \
    --note "Round-20 execution of the NOTES.md round-19 sf100 protocol: the 23 anchor gates same-sitting at four scales (GenScale 10x/100x/1000x of sf0.1, zipf 1.2 fixture), min-of-passes floored by retimes (provenance recorded), engine-only above sf0.01 (oracle pins at sf0.01 and sf1; selective sf10 replay in CORRECTNESS_r20_sf10.json; in-gate pins assert inside the engine at every scale). slope = (t_big/t_small)/ratio on per-query MIN; 1.0 = linear." \
    > BENCH_r20_sf100.json
  step "slope gate on the 4-scale anchor"
  python3 scripts/slope_gate.py BENCH_r20_sf100.json | tee "$OUT/slope_gate.out"
fi
# 3-scale combine including the two new r20 gates
python3 scripts/combine_anchor.py \
  sf0.1=1="$OUT/bench_sf0.1.json" sf1=10="$OUT/bench_sf1.json" \
  sf10=100="$OUT/bench_sf10.json" \
  --metric scale_anchor_r20_gates_sf0.1_sf1_sf10 \
  > "$OUT/combine_3scale.json"
python3 scripts/slope_gate.py "$OUT/combine_3scale.json" \
  | tee "$OUT/slope_gate_3scale.out"

# ---- 4. selective sf10 oracle replay (engine dump, then DuckDB)
step "Verify dump at sf10 (oracle-feasible subset)"
SPARK_DRIVER_MEM=16g sbt -batch \
  "runMain graft.Verify $PWD/target/sf10 $OUT/verify_sf10 ${ORACLE_SF10//,/ }" \
  > "$OUT/verify_sf10.log" 2>&1
step "DuckDB oracle replay at sf10"
python3 scripts/oracle_check.py target/sf10 "$OUT/verify_sf10" \
  --json CORRECTNESS_r20_sf10.json ${ORACLE_SF10//,/ } \
  > "$OUT/oracle_sf10.log" 2>&1 || step "oracle replay recorded failures — see $OUT/oracle_sf10.log"

step "campaign artifacts complete: $OUT"
