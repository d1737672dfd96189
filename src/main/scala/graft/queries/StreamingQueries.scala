package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.streaming.EventStreams

/** Batch-mode correctness entries for the streaming transforms: the same
  * operator definitions run under `readStream` (EventStreams scaladoc);
  * here they run on the batch `events` table so the DuckDB oracle can
  * check them exactly.
  */
object StreamingQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Tumbling 1-hour window aggregation (watermark-compatible shape).
    "q40_windowed_events" -> ((s, dir) =>
      EventStreams.windowedCounts(Tables.events(s, dir))),

    // Sessionization: 30-minute-gap sessions per user (gaps-and-islands
    // over per-user event times; one shuffle on user_id).
    "q41_event_sessions" -> ((s, dir) =>
      EventStreams.batchSessions(Tables.events(s, dir), gapMs = 1800000L)),

    // Incremental sessionization store (q41 as a DAILY INCREMENTAL
    // fold): the month of events splits at Jan 16 into two time-ranged
    // batches; fold #1 emits closed sessions and an open-session state,
    // fold #2 folds the rest into that state and flushes. closed₁ ∪
    // closed₂ must equal a direct one-shot sessionize of everything —
    // the materialized-view law that makes a 100 TB sessionize job cost
    // one day of data per day.
    "q162_incremental_sessions" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      import graft.operators.IncrementalSessions
      val gap = 1800000L
      val split = 1705363200000L // 2024-01-16T00:00:00Z, epoch millis
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"))
      val b1 = ev.filter(unix_millis(col("ts")) < split)
      val b2 = ev.filter(unix_millis(col("ts")) >= split)
      val (c1, o1) = IncrementalSessions.fold(
        IncrementalSessions.emptyState(s), b1, gap, split)
      val (c2, _) = IncrementalSessions.fold(o1, b2, gap, Long.MaxValue)
      c1.unionByName(c2).select(col("user_id"),
        date_format(timestamp_millis(col("start_ms")), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        date_format(timestamp_millis(col("end_ms")), "yyyy-MM-dd HH:mm:ss")
          .as("session_end"),
        col("n_events"))
    }),

    // Built-in session_window sessionization, batch form: q41's islands
    // on the engine-maintained dynamic windows (the definition that
    // also runs under readStream with watermark-evicted state). End =
    // last event + gap by definition; the oracle replays islands with
    // max(ts) + 30 minutes.
    "q155_session_window" -> ((s, dir) =>
      EventStreams.sessionWindowAgg(Tables.events(s, dir), gap = "30 minutes")),

    // Stream-STREAM watermarked attribution join, batch form: purchases
    // matched to the same user's views in the half-open 30-minute
    // lookback. The identical definition runs under readStream with
    // bounded state (watermark-derived eviction, suite-asserted); here
    // the watermarks are no-ops and DuckDB checks the join law exactly.
    "q139_attribution" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val ev = Tables.events(s, dir)
      EventStreams.attributionJoin(
          ev.filter(col("event_type") === "view"),
          ev.filter(col("event_type") === "purchase"))
        .select(col("purchase_id"), col("user_id"), col("view_id"),
          date_format(col("purchase_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          date_format(col("view_ts"), "yyyy-MM-dd HH:mm:ss").as("view_ts"),
          floor(col("purchase_value") * 100 + 0.5).cast("long").as("purchase_cents"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q40_windowed_events" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
        |  event_type,
        |  COUNT(*) AS n_events,
        |  SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q41_event_sessions" ->
      """WITH e AS (SELECT user_id, event_id, ts, epoch_ms(ts) AS ms FROM events),
        |m AS (SELECT *, lag(ms) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e),
        |n AS (SELECT *, CASE WHEN prev IS NULL OR ms - prev > 1800000 THEN 1 ELSE 0 END AS nw FROM m),
        |s AS (SELECT *, SUM(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS UNBOUNDED PRECEDING) AS si FROM n)
        |SELECT user_id, CAST(si AS BIGINT) AS session_idx,
        |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
        |  COUNT(*) AS n_events
        |FROM s GROUP BY 1, 2""".stripMargin,

    // The direct one-shot sessionize the fold must reproduce. Islands
    // and aggregates run in epoch MILLIS (the store's clock): ordering
    // by ms vs ts only permutes rows whose gap is 0, which cannot
    // change island membership or min/max.
    "q162_incremental_sessions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
        |m AS (SELECT *, lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev FROM e),
        |n AS (SELECT *, CASE WHEN prev IS NULL OR ms - prev > 1800000 THEN 1 ELSE 0 END AS nw FROM m),
        |s AS (SELECT *, SUM(nw) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |        ROWS UNBOUNDED PRECEDING) AS si FROM n)
        |SELECT user_id,
        |  strftime(make_timestamp(MIN(ms) * 1000), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(make_timestamp(MAX(ms) * 1000), '%Y-%m-%d %H:%M:%S') AS session_end,
        |  COUNT(*) AS n_events
        |FROM s GROUP BY user_id, si""".stripMargin,

    "q155_session_window" ->
      """WITH e AS (SELECT user_id, event_id, ts, epoch_ms(ts) AS ms,
        |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v FROM events),
        |m AS (SELECT *, lag(ms) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e),
        |n AS (SELECT *, CASE WHEN prev IS NULL OR ms - prev > 1800000 THEN 1 ELSE 0 END AS nw FROM m),
        |s AS (SELECT *, SUM(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS UNBOUNDED PRECEDING) AS si FROM n)
        |SELECT user_id,
        |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(v) AS BIGINT) AS sum_cents
        |FROM s GROUP BY user_id, si""".stripMargin,

    "q139_attribution" ->
      """SELECT p.event_id AS purchase_id, p.user_id, v.event_id AS view_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
        |  CAST(FLOOR(p.value * 100 + 0.5) AS BIGINT) AS purchase_cents
        |FROM events p JOIN events v
        |  ON v.user_id = p.user_id
        |  AND p.event_type = 'purchase' AND v.event_type = 'view'
        |  AND v.ts >= p.ts - INTERVAL 30 MINUTE AND v.ts < p.ts""".stripMargin
  )
}
