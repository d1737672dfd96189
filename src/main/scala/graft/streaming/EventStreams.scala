package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference is strictly batch (SURVEY §2.9) — this is the engine's
  * forward extension: the same transforms run on a batch DataFrame (for
  * the oracle gate) and on a streaming DataFrame (`readStream` source),
  * because they are built from watermark-compatible operators only.
  */
object EventStreams {

  /** Tumbling-window aggregation (1 hour) with a 2-hour watermark when
    * streaming. On a batch frame `withWatermark` is a no-op, so one
    * definition serves both the oracle-checked batch path and the
    * streaming path.
    */
  def windowedCounts(events: DataFrame): DataFrame = {
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), (sum(cents) / 100.0).as("sum_value"))
      .select(
        date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n_events"), col("sum_value"))
  }

  /** Hopping-window counts (q114's streaming form): 1-hour windows
    * every 15 minutes, so each event feeds 4 open windows. State is
    * bounded by (open windows × event types) — the hop factor
    * multiplies state size versus tumbling, which is the budget line a
    * deployment reads before shrinking the slide.
    */
  def hoppingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n_events"))

  /** Batch sessionization (gaps-and-islands on per-user event gaps): a new
    * session starts when the gap to the previous event exceeds `gapMs`.
    * One shuffle on user_id (window partition); the cumulative-sum session
    * index and the session aggregation reuse that partitioning.
    */
  def batchSessions(events: DataFrame, gapMs: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val ms = unix_millis(col("ts"))
    val prev = lag(ms, 1).over(byUser)
    val isNew = when(prev.isNull || ms - prev > gapMs, 1L).otherwise(0L)
    events
      .withColumn("__new", isNew)
      .withColumn("session_idx", sum(col("__new")).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** Sessionization on the BUILT-IN `session_window` (q41's islands
    * re-expressed on the operator Spark ships for exactly this):
    * dynamic gap-merging windows the ENGINE maintains, which — unlike
    * the window-function islands plan — also run under `readStream`,
    * where the watermark both merges late-arriving extensions and
    * evicts closed sessions' state (bounded by ACTIVE sessions, the
    * [[closedSessions]] guarantee without hand-written state code).
    *
    * Definition pin: `session_window.end = last event + gap`, so the
    * batch oracle is [[batchSessions]]' gaps-and-islands with
    * `max(ts) + gap` as the end — one definition, three gates (DuckDB
    * islands replay, batch ≡ batchSessions, streaming ≡ batch).
    * Money stays exact integer cents inside the aggregate.
    */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame = {
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("win"))
      .agg(count(lit(1)).as("n_events"), sum(cents).as("sum_cents"))
      .select(col("user_id"),
        date_format(col("win.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("win.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"), col("sum_cents"))
  }

  // ----------------------------------------------------- streaming state

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(startMs: Long, lastMs: Long, nEvents: Long)
  final case class UserSession(user_id: Long, start_ms: Long, last_ms: Long, n_events: Long)

  /** Streaming sessionization via `mapGroupsWithState`: per-user state
    * carries (session start, last event, count) across micro-batches; a
    * gap larger than `gapMs` rolls the session. Emits the CURRENT session
    * per user per batch (Update mode semantics).
    */
  def streamingSessions(events: Dataset[Event], gapMs: Long): Dataset[UserSession] = {
    val f: (Long, Iterator[Event], GroupState[SessionState]) => UserSession =
      (userId, it, state) => {
        val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        var st = state.getOption.getOrElse(SessionState(-1L, -1L, 0L))
        sorted.foreach { e =>
          val t = e.ts.getTime
          st =
            if (st.startMs < 0 || t - st.lastMs > gapMs) SessionState(t, t, 1L)
            else SessionState(st.startMs, math.max(st.lastMs, t), st.nEvents + 1L)
        }
        state.update(st)
        UserSession(userId, st.startMs, st.lastMs, st.nEvents)
      }
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(f)(
        Encoders.product[SessionState], Encoders.product[UserSession])
  }

  final case class ClosedSession(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long)

  /** [[closedSessions]] re-expressed on Spark 4's MODERN stateful API
    * (`transformWithState` + `StatefulProcessor`): a typed `ValueState`
    * carries the open session and an event-time TIMER at `last + gap`
    * replaces the hand-rolled timeout bookkeeping — when the watermark
    * passes it the engine calls `handleExpiredTimer`, which emits the
    * closed session exactly once and clears the state (bounded by
    * ACTIVE users, the [[closedSessions]] guarantee). Rolling inside a
    * batch emits the closed predecessor immediately, same contract, so
    * the two forms are suite-gated EQUAL on the same feed. Requires the
    * RocksDB state-store provider (the transformWithState backend).
    */
  class SessionTwsProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, ClosedSession] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TTLConfig, TimeMode, TimerValues}
    @transient private var state: org.apache.spark.sql.streaming.ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[ClosedSession] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var closed = List.empty[ClosedSession]
      var st = if (state.exists()) state.get() else SessionState(-1L, -1L, 0L)
      sorted.foreach { e =>
        val t = e.ts.getTime
        if (st.startMs < 0) st = SessionState(t, t, 1L)
        else if (t - st.lastMs > gapMs) {
          closed ::= ClosedSession(key, st.startMs, st.lastMs, st.nEvents)
          st = SessionState(t, t, 1L)
        } else st = SessionState(st.startMs, math.max(st.lastMs, t), st.nEvents + 1L)
      }
      // one live timer per key: re-arm to the (possibly extended) gap end
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      getHandle.registerTimer(st.lastMs + gapMs)
      state.update(st)
      closed.reverse.iterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[ClosedSession] = {
      if (!state.exists()) Iterator.empty
      else {
        val st = state.get()
        if (st.lastMs + gapMs <= info.getExpiryTimeInMs) {
          state.clear()
          Iterator.single(ClosedSession(key, st.startMs, st.lastMs, st.nEvents))
        } else Iterator.empty // superseded by a later re-arm
      }
    }
  }

  /** The `transformWithState` driver for [[SessionTwsProcessor]]. */
  def closedSessionsTws(events: Dataset[Event], gapMs: Long,
      watermarkDelay: String = "10 minutes"): Dataset[ClosedSession] = {
    import org.apache.spark.sql.streaming.TimeMode
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new SessionTwsProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())(Encoders.product[ClosedSession])
  }

  /** Streaming sessionization that emits each session EXACTLY ONCE — when
    * its gap has expired against the event-time watermark — and then
    * drops the per-user state (`flatMapGroupsWithState` + event-time
    * timeout). Unlike [[streamingSessions]] (Update-mode, current-session
    * snapshots, state retained forever), this is the bounded-state form a
    * long-running deployment needs: state size is O(active users), not
    * O(all users ever seen).
    *
    * Mechanics per micro-batch: new events extend or roll the session
    * (rolling emits the closed predecessor immediately); the state's
    * timeout is re-armed to `last event + gapMs`, so when the watermark
    * passes it with no new events the timed-out callback emits the final
    * session and removes the state.
    */
  def closedSessions(events: Dataset[Event], gapMs: Long,
      watermarkDelay: String = "10 minutes"): Dataset[ClosedSession] = {
    val f: (Long, Iterator[Event], GroupState[SessionState]) => Iterator[ClosedSession] =
      (userId, it, state) => {
        if (state.hasTimedOut) {
          val st = state.get
          state.remove()
          Iterator.single(ClosedSession(userId, st.startMs, st.lastMs, st.nEvents))
        } else {
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(SessionState(-1L, -1L, 0L))
          val closed = Seq.newBuilder[ClosedSession]
          sorted.foreach { e =>
            val t = e.ts.getTime
            st =
              if (st.startMs < 0) SessionState(t, t, 1L)
              else if (t - st.lastMs > gapMs) {
                closed += ClosedSession(userId, st.startMs, st.lastMs, st.nEvents)
                SessionState(t, t, 1L)
              } else SessionState(st.startMs, math.max(st.lastMs, t), st.nEvents + 1L)
          }
          state.update(st)
          // clamp: a very-late event (lastMs + gap already behind the
          // watermark) must not arm a timeout in the past — Spark throws
          // on timestamps <= watermark. Clamped sessions close at the
          // next watermark advance.
          state.setTimeoutTimestamp(
            math.max(st.lastMs + gapMs, state.getCurrentWatermarkMs() + 1))
          closed.result().iterator
        }
      }
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(f)(
        Encoders.product[SessionState], Encoders.product[ClosedSession])
  }

  final case class Scd2Change(key: Long, ts: java.sql.Timestamp, attr: String, seq: Long)
  final case class Scd2State(tsMs: Long, attr: String, seq: Long)
  final case class ClosedVersion(key: Long, attr: String, valid_from_ms: Long,
      valid_to_ms: Long)

  /** Streaming SCD-2 maintenance — the incremental form of
    * [[graft.operators.Scd2.build]]: each key's CURRENT version lives in
    * the state store; a newer change CLOSES it (emitting the finished
    * validity window exactly once, Append mode) and becomes the new
    * current row. The closed-version stream unioned with a state
    * snapshot is the full dimension at any instant.
    *
    * Ordering contract: within a micro-batch changes sort by (ts, seq);
    * equal-ts changes apply last-writer-wins WITHOUT closing a window
    * (they are the same instant — matching the batch operator). ACROSS
    * batches a change older than the key's current version is DROPPED:
    * re-opening history would mean re-emitting corrected windows, which
    * Append-mode exactly-once cannot express — replay the batch builder
    * for late-data corrections (the standard lambda split).
    *
    * State: one (ts, attr, seq) row per key — the dimension's own
    * cardinality, which is exactly what any SCD-2 store must hold;
    * NoTimeout because a dimension key's current version never expires.
    */
  def scd2Stream(changes: Dataset[Scd2Change]): Dataset[ClosedVersion] = {
    val f: (Long, Iterator[Scd2Change], GroupState[Scd2State]) => Iterator[ClosedVersion] =
      (key, it, state) => {
        val sorted = it.toSeq.sortBy(c => (c.ts.getTime, c.seq))
        var st = state.getOption.orNull
        val closed = Seq.newBuilder[ClosedVersion]
        sorted.foreach { c =>
          val t = c.ts.getTime
          if (st == null) st = Scd2State(t, c.attr, c.seq)
          else if (t == st.tsMs) {
            if (c.seq >= st.seq) st = Scd2State(t, c.attr, c.seq)
          } else if (t > st.tsMs) {
            closed += ClosedVersion(key, st.attr, st.tsMs, t)
            st = Scd2State(t, c.attr, c.seq)
          } // else: older than current -> dropped (see ordering contract)
        }
        if (st != null) state.update(st)
        closed.result().iterator
      }
    changes.groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(f)(
        Encoders.product[Scd2State], Encoders.product[ClosedVersion])
  }

  /** Streaming exact-dedup at ingest: drop rows whose key re-appears
    * within the watermark horizon (`dropDuplicatesWithinWatermark`) —
    * the streaming form of the batch exact dedup with BOUNDED state:
    * a key's dedup entry expires once the watermark passes it, so state
    * is O(keys per watermark window), not O(all keys ever). The batch
    * form (plain `dropDuplicates`) answers the oracle; this is the
    * ingest-path guard a continuous document/event feed runs.
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-static enrichment: join the event stream to a broadcast
    * dimension (same shape as the batch J1; Structured Streaming executes
    * it per micro-batch with the static side broadcast once).
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Streaming count-min maintenance: the live frequency profile of an
    * ingest stream. Each micro-batch reduces to its own
    * [[graft.operators.Sketches.countMin]] relation (depth·width rows —
    * map-side combined, so per-batch cost is one pass over the batch)
    * and lands in the store as the `batch_id=<id>` partition via
    * DYNAMIC partition overwrite. That makes a foreachBatch RETRY of
    * the same epoch overwrite its own partition rather than
    * double-count — at-least-once delivery becomes exactly-once state,
    * the same idempotence-by-key discipline as the K5 partition
    * overwrite sink ([[graft.sinks.Sinks.load]]).
    *
    * Store size is `batches · depth · width` counters (tiny); serving
    * ([[countMinServe]]) folds all partitions with the proven-mergeable
    * counter-wise sum (q126 pins merge ≡ direct build bit-equal). A
    * 100 TB/day ingest keeps a queryable frequency profile at the cost
    * of one sketch-sized write per micro-batch, and the profile answers
    * heavy-key / skew pre-flights ([[graft.operators.Sketches.countMinJoinSize]])
    * without ever re-reading the stream's history.
    *
    * The per-batch body is [[upsertBatchSketch]] (package-private so the
    * suite exercises retry idempotence without a running stream).
    */
  private[streaming] def upsertBatchSketch(batch: DataFrame, batchId: Long,
      keyCol: String, depth: Int, width: Int, storeDir: String): Unit =
    graft.operators.Sketches.countMin(batch, keyCol, depth, width)
      .withColumn("batch_id", lit(batchId))
      .coalesce(1) // depth·width rows — one file per batch partition
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      // writer-scoped, NOT a session-conf toggle: a concurrent writer in
      // the same session (another stream's foreachBatch, a static-
      // overwrite batch job) must never race a global set/restore
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(storeDir)

  /** Start the maintenance stream: one sketch partition per epoch. */
  def countMinStreamStart(events: DataFrame, keyCol: String, depth: Int, width: Int,
      storeDir: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        upsertBatchSketch(batch, id, keyCol, depth, width, storeDir)
      }
      .start()

  /** The maintained profile: counter-wise fold of every batch partition
    * — bit-equal to a direct sketch of everything ingested (q126's
    * merge law), served from batches·depth·width stored counters.
    */
  def countMinServe(spark: org.apache.spark.sql.SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(storeDir)
      .groupBy(col("r"), col("c")).agg(sum(col("cnt")).as("cnt"))

  /** Stream-STREAM watermarked inner join — the attribution query (which
    * view led to this purchase?), the canonical shape that forces two
    * unbounded inputs to meet: each purchase matches the SAME user's
    * views in the half-open lookback window `[purchase_ts − lookback,
    * purchase_ts)` — the [[graft.operators.IntervalJoin]] law with the
    * purchase as the interval, which is exactly how the suite
    * cross-validates it against the batch operator.
    *
    * State is bounded by construction, the non-negotiable at 100 TB/day:
    * both sides carry an event-time watermark and the join condition
    * carries an explicit event-time RANGE, so Spark derives per-side
    * retention (a view can only ever match purchases up to `lookback`
    * later; a purchase only views no older than `lookback`) and evicts
    * buffered rows as the watermark passes them — the suite asserts the
    * eviction. Matches emit immediately (inner join; only state CLEANUP
    * waits for the watermark), and the user-key equality keeps the
    * shuffle an ordinary hash exchange on user_id for both streams.
    *
    * On batch frames the watermarks are no-ops and the same definition
    * is the plain interval join — one definition, both engines, like
    * every operator in this object.
    */
  /** @param joinType `"inner"` (matched pairs only) or `"right_outer"`
    *   — purchases preserved: an UNATTRIBUTED purchase emits once, with
    *   null view columns, when the watermark passes its lookback window
    *   and no view can still arrive (the "organic conversions" report;
    *   outer results are watermark-delayed by definition — emitting
    *   earlier could produce a match later, and the suite pins exactly
    *   this timing).
    */
  def attributionJoin(views: DataFrame, purchases: DataFrame,
      lookback: String = "30 minutes",
      watermarkDelay: String = "1 hour",
      joinType: String = "inner"): DataFrame = {
    val v = views
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermarkDelay)
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id").as("__p_user"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermarkDelay)
    v.join(p,
        col("user_id") === col("__p_user") &&
          col("view_ts") >= col("purchase_ts") - expr(s"INTERVAL $lookback") &&
          col("view_ts") < col("purchase_ts"),
        joinType)
      .select(col("purchase_id"), coalesce(col("user_id"), col("__p_user")).as("user_id"),
        col("view_id"), col("purchase_ts"), col("view_ts"), col("purchase_value"))
  }

  /** File-based streaming source with the events schema (the streaming
    * entry point for directory-fed deployments).
    */
  def readEventStream(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Streaming sink shorthand: append to parquet with a checkpoint. */
  def writeEventStream(df: DataFrame, path: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream.outputMode(OutputMode.Append)
      .format("parquet").option("path", path)
      .option("checkpointLocation", checkpoint).start()
}
