package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSuite

class StreamingSpec extends SparkSuite {
  import spark.implicits._
  import EventStreams._

  private def ev(id: Long, t: String, user: Long, kind: String = "click", v: Double = 1.0) =
    Event(id, Timestamp.valueOf(t), user, kind, v)

  test("streaming windowed counts aggregate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("win_out").outputMode(OutputMode.Complete).start()
    try {
      mem.addData(ev(1, "2024-01-01 10:05:00", 1), ev(2, "2024-01-01 10:55:00", 2))
      q.processAllAvailable()
      mem.addData(ev(3, "2024-01-01 11:05:00", 1))
      q.processAllAvailable()
      val rows = spark.sql("SELECT win_start, n_events FROM win_out ORDER BY win_start")
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(rows.toSeq === Seq(("2024-01-01 10:00:00", 2L), ("2024-01-01 11:00:00", 1L)))
    } finally q.stop()
  }

  test("streaming hopping windows: each event counts in its 4 sliding windows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = hoppingCounts(mem.toDF())
      .writeStream.format("memory").queryName("hop_out").outputMode(OutputMode.Complete).start()
    try {
      mem.addData(ev(1, "2024-01-01 10:05:00", 1))
      q.processAllAvailable()
      mem.addData(ev(2, "2024-01-01 10:20:00", 2))
      q.processAllAvailable()
      val rows = spark.sql("SELECT win_start, n_events FROM hop_out ORDER BY win_start")
        .collect().map(r => (r.getString(0), r.getLong(1)))
      // 10:05 → starts 09:15..10:00; 10:20 → 09:30..10:15; overlap 09:30..10:00
      assert(rows.toSeq === Seq(
        ("2024-01-01 09:15:00", 1L), ("2024-01-01 09:30:00", 2L),
        ("2024-01-01 09:45:00", 2L), ("2024-01-01 10:00:00", 2L),
        ("2024-01-01 10:15:00", 1L)))
    } finally q.stop()
  }

  test("streaming CDC apply: foreachBatch rolls the snapshot to the batch-apply result") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.CdcApply
    val mem = MemoryStream[(Long, Long, String, String, String)]
    var snap = Seq((1L, "one", "a"), (2L, "two", "a"), (3L, "three", "b"))
      .toDF("id", "text", "src")
    val q = mem.toDF().toDF("id", "seq", "op", "text", "src")
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        // materialize each roll so the next micro-batch applies to data,
        // not to an ever-growing lazy lineage
        snap = spark.createDataFrame(
          snap.sparkSession.sparkContext.parallelize(
            CdcApply.rollForward(snap, b, Seq("id")).collect().toSeq), snap.schema)
        ()
      }.start()
    try {
      mem.addData((1L, 1L, "upsert", "one-v2", "a"), (4L, 2L, "upsert", "four", "c"))
      q.processAllAvailable()
      mem.addData((4L, 3L, "delete", null, null), (3L, 4L, "upsert", "three-v2", "b"))
      q.processAllAvailable()
      val got = snap.as[(Long, String, String)].collect().toSet
      // equals ONE batch apply of the full log (split invariance)
      val full = Seq(
        (1L, 1L, "upsert", "one-v2", "a"), (4L, 2L, "upsert", "four", "c"),
        (4L, 3L, "delete", null.asInstanceOf[String], null.asInstanceOf[String]),
        (3L, 4L, "upsert", "three-v2", "b")).toDF("id", "seq", "op", "text", "src")
      val expect = CdcApply.rollForward(
          Seq((1L, "one", "a"), (2L, "two", "a"), (3L, "three", "b"))
            .toDF("id", "text", "src"), full, Seq("id"))
        .as[(Long, String, String)].collect().toSet
      assert(got === expect)
      assert(got === Set((1L, "one-v2", "a"), (2L, "two", "a"), (3L, "three-v2", "b")))
    } finally q.stop()
  }

  test("streaming sessions carry state across micro-batches and roll on gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = streamingSessions(mem.toDS(), gapMs = 1800000L)
      .writeStream.format("memory").queryName("sess_out").outputMode(OutputMode.Update).start()
    try {
      mem.addData(ev(1, "2024-01-01 10:00:00", 7), ev(2, "2024-01-01 10:10:00", 7))
      q.processAllAvailable()
      mem.addData(ev(3, "2024-01-01 10:20:00", 7)) // same session continues
      q.processAllAvailable()
      val afterB2 = spark.sql("SELECT n_events FROM sess_out").collect().map(_.getLong(0)).max
      assert(afterB2 === 3L) // state carried over: 2 + 1
      mem.addData(ev(4, "2024-01-01 12:00:00", 7)) // > 30min gap → new session
      q.processAllAvailable()
      val last = spark.sql("SELECT n_events FROM sess_out").collect().map(_.getLong(0))
      assert(last.contains(1L)) // rolled session emitted with fresh count
    } finally q.stop()
  }

  test("closed sessions: emitted exactly once on timeout, state cleared") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = closedSessions(mem.toDS(), gapMs = 1800000L, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("closed_out").outputMode(OutputMode.Append).start()
    try {
      def rows() = spark.sql(
        "SELECT user_id, start_ms, end_ms, n_events FROM closed_out ORDER BY user_id, start_ms")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      val t0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime

      mem.addData(ev(1, "2024-01-01 10:00:00", 7), ev(2, "2024-01-01 10:10:00", 7))
      q.processAllAvailable()
      assert(rows().isEmpty) // session still open — nothing emitted yet

      // another user's event pushes the watermark past 10:40 (10:10+gap):
      // the no-data micro-batch fires user 7's timeout exactly once.
      mem.addData(ev(3, "2024-01-01 12:00:00", 8))
      q.processAllAvailable()
      assert(rows() === Seq((7L, t0, t0 + 600000L, 2L)))

      // state was cleared: a new user-7 event opens a FRESH session
      // (n_events restarts at 1), closed by a later watermark advance.
      mem.addData(ev(4, "2024-01-01 13:00:00", 7))
      q.processAllAvailable()
      mem.addData(ev(5, "2024-01-01 15:00:00", 9))
      q.processAllAvailable()
      val t13 = Timestamp.valueOf("2024-01-01 13:00:00").getTime
      assert(rows().filter(_._1 == 7L) ===
        Seq((7L, t0, t0 + 600000L, 2L), (7L, t13, t13, 1L)))

      // an event older than the watermark (15:00) is filtered before the
      // state function (Spark's late-row filter for stateful operators)
      // — no session, no crash; the timeout clamp in closedSessions is
      // defense-in-depth for engines/configs without that filter.
      mem.addData(ev(6, "2024-01-01 09:00:00", 11))
      q.processAllAvailable()
      mem.addData(ev(7, "2024-01-01 16:00:00", 12))
      q.processAllAvailable()
      assert(rows().filter(_._1 == 11L).isEmpty)
    } finally q.stop()
  }

  test("transformWithState sessions: event-time timers emit once and clear state — equal to the flatMapGroupsWithState form") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Event]
    val q = closedSessionsTws(mem.toDS(), gapMs = 1800000L, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("tws_out").outputMode(OutputMode.Append).start()
    try {
      def rows() = spark.sql(
        "SELECT user_id, start_ms, end_ms, n_events FROM tws_out ORDER BY user_id, start_ms")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      val t0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime

      mem.addData(ev(1, "2024-01-01 10:00:00", 7), ev(2, "2024-01-01 10:10:00", 7))
      q.processAllAvailable()
      assert(rows().isEmpty, "open session must not emit")

      // watermark passes 10:40 (last+gap): the TIMER fires exactly once
      mem.addData(ev(3, "2024-01-01 12:00:00", 8))
      q.processAllAvailable()
      q.processAllAvailable()
      assert(rows() === Seq((7L, t0, t0 + 600000L, 2L)))

      // state cleared: a fresh user-7 session; an in-batch roll also
      // emits the predecessor immediately (same contract as the
      // flatMapGroupsWithState form — the two stay interchangeable)
      mem.addData(ev(4, "2024-01-01 13:00:00", 7), ev(5, "2024-01-01 14:00:00", 7))
      q.processAllAvailable()
      val t13 = Timestamp.valueOf("2024-01-01 13:00:00").getTime
      assert(rows().filter(_._1 == 7L) ===
        Seq((7L, t0, t0 + 600000L, 2L), (7L, t13, t13, 1L)))
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming SCD-2: newer changes close windows exactly once; equal-ts last-writer; late drops") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Scd2Change]
    def ch(k: Long, t: String, a: String, s: Long) =
      Scd2Change(k, Timestamp.valueOf(t), a, s)
    def ms(t: String) = Timestamp.valueOf(t).getTime
    val q = scd2Stream(mem.toDS())
      .writeStream.format("memory").queryName("scd2_out").outputMode(OutputMode.Append).start()
    try {
      def rows() = spark.sql(
        "SELECT key, attr, valid_from_ms, valid_to_ms FROM scd2_out ORDER BY key, valid_from_ms")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq

      // batch 1: two versions in one batch -> v1 closes immediately
      mem.addData(ch(1, "2024-01-01 00:00:00", "v1", 1), ch(1, "2024-01-03 00:00:00", "v2", 2))
      q.processAllAvailable()
      assert(rows() === Seq((1L, "v1", ms("2024-01-01 00:00:00"), ms("2024-01-03 00:00:00"))))

      // batch 2: same-ts higher-seq overwrites the open version without
      // closing a window; a later change then closes the OVERWRITTEN attr
      mem.addData(ch(1, "2024-01-03 00:00:00", "v2b", 3))
      q.processAllAvailable()
      assert(rows().size === 1)
      mem.addData(ch(1, "2024-01-05 00:00:00", "v3", 4))
      q.processAllAvailable()
      assert(rows() === Seq(
        (1L, "v1", ms("2024-01-01 00:00:00"), ms("2024-01-03 00:00:00")),
        (1L, "v2b", ms("2024-01-03 00:00:00"), ms("2024-01-05 00:00:00"))))

      // a change older than the current version drops (ordering contract)
      mem.addData(ch(1, "2024-01-02 00:00:00", "late", 5))
      q.processAllAvailable()
      assert(rows().size === 2)

      // independent keys keep independent state
      mem.addData(ch(2, "2024-01-01 00:00:00", "x", 1))
      q.processAllAvailable()
      assert(rows().count(_._1 == 2L) === 0) // still open, nothing emitted
    } finally q.stop()
  }

  test("streaming SCD-2 equals the batch builder's closed rows on in-order data") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(7)
    // unique (key, ts) pairs, fed to the stream in ts order (the contract)
    val changes = rnd.shuffle((0 until 60).toList).zipWithIndex.map { case (slot, i) =>
      Scd2Change(slot % 5L, Timestamp.valueOf(f"2024-01-01 ${slot / 60}%02d:${slot % 60}%02d:00"),
        s"v$i", i.toLong)
    }.sortBy(_.ts.getTime)
    val mem = MemoryStream[Scd2Change]
    val q = scd2Stream(mem.toDS())
      .writeStream.format("memory").queryName("scd2_xval").outputMode(OutputMode.Append).start()
    try {
      val (b1, b2) = changes.splitAt(30)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT key, attr, valid_from_ms, valid_to_ms FROM scd2_xval")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      import spark.implicits._
      val batch = graft.operators.Scd2
        .build(changes.toDF("key", "ts", "attr", "seq"), "key", "ts", Seq("attr"), "seq")
        .filter(!col("is_current"))
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getTimestamp(2).getTime, r.getTimestamp(3).getTime)).toSet
      assert(streamed === batch)
      assert(streamed.size === 60 - 5, "every key leaves exactly one open current row")
    } finally q.stop()
  }

  test("streaming SCD-2 dimension drives stream-static point-in-time enrichment (CDC in, enrichment out)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.expr
    def ch(k: Long, t: String, a: String, s: Long) =
      Scd2Change(k, Timestamp.valueOf(t), a, s)
    // phase 1: a CDC change feed maintains the dimension incrementally;
    // a final per-key sentinel close-out turns the closed-version stream
    // into the COMPLETE dimension (the documented "closed ∪ state
    // snapshot" contract, with the snapshot realized as sentinel closes)
    val realChanges = Seq(
      ch(1, "2024-01-01 00:00:00", "p10", 1), ch(1, "2024-01-03 00:00:00", "p11", 2),
      ch(1, "2024-01-06 00:00:00", "p12", 3),
      ch(2, "2024-01-02 00:00:00", "q20", 4), ch(2, "2024-01-05 00:00:00", "q21", 5))
    val sentinels = Seq(ch(1, "9999-01-01 00:00:00", "__closed", 99),
      ch(2, "9999-01-01 00:00:00", "__closed", 99))
    val mem = MemoryStream[Scd2Change]
    val dimQ = scd2Stream(mem.toDS())
      .writeStream.format("memory").queryName("scd2_dim").outputMode(OutputMode.Append).start()
    val ptsQ = try {
      val (b1, b2) = realChanges.splitAt(3)
      mem.addData(b1: _*); dimQ.processAllAvailable()
      mem.addData(b2: _*); dimQ.processAllAvailable()
      mem.addData(sentinels: _*); dimQ.processAllAvailable()

      // phase 2: the maintained dimension (now a static table) enriches a
      // STREAM of points via the broadcast interval join — left never
      // shuffles, the state-derived windows broadcast per micro-batch
      val dim = spark.table("scd2_dim")
        .select(col("key").as("user_id"), col("attr"),
          expr("timestamp_millis(valid_from_ms)").as("valid_from"),
          expr("timestamp_millis(valid_to_ms)").as("valid_to"))
      val pmem = MemoryStream[Event]
      val enrichedQ = graft.operators.IntervalJoin.broadcastByKey(
          pmem.toDF().select(col("event_id"), col("user_id"), col("ts")),
          dim, "user_id", "ts", "valid_from", "valid_to", Seq("attr"))
        .writeStream.format("memory").queryName("scd2_enriched")
        .outputMode(OutputMode.Append).start()
      val points = Seq(
        ev(100, "2024-01-02 12:00:00", 1), // inside p10's window
        ev(101, "2024-01-04 12:00:00", 1), // inside p11's window
        ev(102, "2024-02-01 00:00:00", 1), // after last real change: current version
        ev(103, "2023-12-01 00:00:00", 1), // before first change: unmatched
        ev(104, "2024-01-02 12:00:00", 2), // q20
        ev(105, "2024-01-01 00:00:00", 3)) // unknown key: unmatched
      pmem.addData(points.take(3): _*); enrichedQ.processAllAvailable()
      pmem.addData(points.drop(3): _*); enrichedQ.processAllAvailable()
      val streamed = spark.sql("SELECT event_id, attr FROM scd2_enriched")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(streamed === Set((100L, "p10"), (101L, "p11"), (102L, "p12"), (104L, "q20")))

      // cross-validate: the batch composition (Scd2.build over the same
      // feed + the same broadcast interval join) enriches identically
      val batchDim = graft.operators.Scd2
        .build((realChanges ++ sentinels).toDF("key", "ts", "attr", "seq"),
          "key", "ts", Seq("attr"), "seq")
        .filter(!col("is_current"))
        .select(col("key").as("user_id"), col("attr"),
          col("valid_from"), col("valid_to"))
      val batchEnriched = graft.operators.IntervalJoin.broadcastByKey(
          points.toDF().select(col("event_id"), col("user_id"), col("ts")),
          batchDim, "user_id", "ts", "valid_from", "valid_to", Seq("attr"))
        .collect().map(r => (r.getLong(0), r.getString(3))).toSet
      assert(batchEnriched === streamed,
        "stream-maintained and batch-built dimensions must enrich identically")
      enrichedQ
    } finally dimQ.stop()
    ptsQ.stop()
  }

  test("composed streaming gate: one DAG from CDC through scd2Stream into broadcast interval enrichment equals the batch composition") {
    // VERDICT r11 item 6: the enrichment must live INSIDE the streaming
    // flow, not behind a static handoff — here the scd2 stream's closed
    // windows feed IntervalJoin.broadcastByKey per micro-batch via
    // foreachBatch, so CDC goes in and enriched rows come out of ONE
    // query. Correct because closed windows are emitted exactly once
    // (Append contract) and a point's timestamp lies in at most one
    // validity window of its key — the union of per-batch joins IS the
    // join against the complete dimension, with each micro-batch
    // broadcasting only its newly closed windows (dimension-delta-sized,
    // the shape an hourly 100 TB feature-store refresh needs).
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.expr
    def ch(k: Long, t: String, a: String, s: Long) =
      Scd2Change(k, Timestamp.valueOf(t), a, s)
    val realChanges = Seq(
      ch(1, "2024-01-01 00:00:00", "p10", 1), ch(1, "2024-01-03 00:00:00", "p11", 2),
      ch(1, "2024-01-06 00:00:00", "p12", 3),
      ch(2, "2024-01-02 00:00:00", "q20", 4), ch(2, "2024-01-05 00:00:00", "q21", 5))
    val sentinels = Seq(ch(1, "9999-01-01 00:00:00", "__closed", 99),
      ch(2, "9999-01-01 00:00:00", "__closed", 99))
    val points = Seq(
      ev(100, "2024-01-02 12:00:00", 1), // p10's window
      ev(101, "2024-01-04 12:00:00", 1), // p11's window
      ev(102, "2024-02-01 00:00:00", 1), // current version (closed by sentinel)
      ev(103, "2023-12-01 00:00:00", 1), // before first change: unmatched
      ev(104, "2024-01-02 12:00:00", 2), // q20
      ev(105, "2024-01-01 00:00:00", 3)) // unknown key: unmatched
    val ptsDf = points.toDF().select(col("event_id"), col("user_id"), col("ts"))
    // filled from the stream-execution thread, read after
    // processAllAvailable — guarded by its own monitor on both sides
    val enrichedAcc = scala.collection.mutable.HashSet.empty[(Long, String)]
    val mem = MemoryStream[Scd2Change]
    val q = scd2Stream(mem.toDS()).toDF()
      .select(col("key").as("user_id"), col("attr"),
        expr("timestamp_millis(valid_from_ms)").as("valid_from"),
        expr("timestamp_millis(valid_to_ms)").as("valid_to"))
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (dimDelta: org.apache.spark.sql.DataFrame, _: Long) =>
        val hits = graft.operators.IntervalJoin.broadcastByKey(
            ptsDf, dimDelta, "user_id", "ts", "valid_from", "valid_to", Seq("attr"))
          .collect().map(r => (r.getLong(0), r.getString(3)))
        enrichedAcc.synchronized { enrichedAcc ++= hits }
        ()
      }
      .start()
    try {
      val (b1, b2) = realChanges.splitAt(3)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(sentinels: _*); q.processAllAvailable()
      val streamed = enrichedAcc.synchronized { enrichedAcc.toSet }
      assert(streamed === Set((100L, "p10"), (101L, "p11"), (102L, "p12"), (104L, "q20")))
      // cross-validate against the batch composition over the same feed
      val batchDim = graft.operators.Scd2
        .build((realChanges ++ sentinels).toDF("key", "ts", "attr", "seq"),
          "key", "ts", Seq("attr"), "seq")
        .filter(!col("is_current"))
        .select(col("key").as("user_id"), col("attr"),
          col("valid_from"), col("valid_to"))
      val batchEnriched = graft.operators.IntervalJoin.broadcastByKey(
          ptsDf, batchDim, "user_id", "ts", "valid_from", "valid_to", Seq("attr"))
        .collect().map(r => (r.getLong(0), r.getString(3))).toSet
      assert(batchEnriched === streamed,
        "the single-DAG streaming enrichment must equal Scd2.build + broadcastByKey")
    } finally q.stop()
  }

  test("streaming count-min maintenance: served profile bit-equals the direct sketch; epoch retries don't double-count") {
    implicit val sqlCtx = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("cms_store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cms_ckpt").toString
    val batches = Seq(
      (0 until 40).map(i => ev(i.toLong, "2024-01-01 10:00:00", i % 7)),
      (40 until 70).map(i => ev(i.toLong, "2024-01-01 11:00:00", i % 5)),
      (70 until 90).map(i => ev(i.toLong, "2024-01-01 12:00:00", i % 11)))
    val mem = MemoryStream[Event]
    val q = EventStreams.countMinStreamStart(
      mem.toDF().select(col("user_id")), "user_id", depth = 4, width = 64,
      storeDir = store, checkpoint = ckpt)
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    def served = EventStreams.countMinServe(spark, store)
      .orderBy("r", "c").collect()
    val all = batches.flatten.toDF().select(col("user_id"))
    val direct = graft.operators.Sketches.countMin(all, "user_id", 4, 64)
      .orderBy("r", "c").collect()
    assert(served === direct, "merge law: served profile ≡ direct sketch of all ingested rows")
    // at-least-once retry of an epoch: re-running batch 1's upsert with
    // the same batch_id must overwrite its own partition, not add to it
    EventStreams.upsertBatchSketch(
      batches(1).toDF().select(col("user_id")), batchId = 1L,
      "user_id", 4, 64, store)
    assert(served === direct, "epoch replay must be idempotent, not double-count")
  }

  test("streaming dedup: repeated keys within the watermark dropped across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = dedupStream(mem.toDF(), Seq("event_id"), "1 hour")
      .writeStream.format("memory").queryName("dedup_out").outputMode(OutputMode.Append).start()
    try {
      mem.addData(ev(1, "2024-01-01 10:00:00", 1), ev(1, "2024-01-01 10:01:00", 2))
      q.processAllAvailable()
      mem.addData(ev(1, "2024-01-01 10:02:00", 3), ev(2, "2024-01-01 10:03:00", 4))
      q.processAllAvailable()
      // event_id 1 appeared three times (twice in batch 1, once in batch 2
      // — state carried across batches) → kept once; id 2 kept once.
      val got = spark.sql("SELECT event_id, count(*) FROM dedup_out GROUP BY event_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === Map(1L -> 1L, 2L -> 1L))
    } finally q.stop()
  }

  test("file stream: read parquet directory as a stream, aggregate, write with checkpoint") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val src = s"$dir/src"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    Seq(ev(1, "2024-01-01 10:05:00", 1), ev(2, "2024-01-01 10:35:00", 2))
      .toDF().write.parquet(src)
    val stream = readEventStream(spark, src, Seq.empty[Event].toDF().schema)
    // append-mode file sink requires a watermarked aggregation
    val q = writeEventStream(windowedCounts(stream), out, ckpt)
    try q.processAllAvailable() finally q.stop()
    // watermark holds the open window back in append mode until more data
    // arrives; restart with a late batch to close the first window
    Seq(ev(3, "2024-01-01 14:00:00", 1)).toDF().write.mode("append").parquet(src)
    val q2 = writeEventStream(windowedCounts(readEventStream(spark, src,
      Seq.empty[Event].toDF().schema)), out, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(out)
    assert(rows.filter(col("win_start") === "2024-01-01 10:00:00")
      .select("n_events").as[Long].collect().toSeq === Seq(2L))
  }

  test("stream-static join enriches micro-batches against a broadcast dim") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = enrichWithDim(mem.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enrich_out").outputMode(OutputMode.Append).start()
    try {
      mem.addData(ev(1, "2024-01-01 10:00:00", 1), ev(2, "2024-01-01 10:01:00", 3))
      q.processAllAvailable()
      val got = spark.sql("SELECT user_id, tier FROM enrich_out ORDER BY user_id")
        .collect().map(r => (r.getLong(0), Option(r.getString(1))))
      assert(got.toSeq === Seq((1L, Some("gold")), (3L, None)))
    } finally q.stop()
  }

  test("streaming near-dup flagging against the static signature store, exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val store = graft.llm.Dedup.signatureTable(Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "completely different content about spark shuffles and partition pruning for scale"))
      .toDF("doc_id", "text"), "doc_id", "text")
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = graft.llm.Dedup.streamNearDupsAgainstStore(
        mem.toDF().toDF("doc_id", "ts", "text"), store, "doc_id", "text", "ts")
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(
        (101L, Timestamp.valueOf("2024-01-01 10:00:00"),
          "the quick brown fox jumps over the lazy dog near the river bank today"), // dup of store 1
        (102L, Timestamp.valueOf("2024-01-01 10:00:30"),
          "entirely novel subject matter discussing oceans tides and the moon phases"))
      q.processAllAvailable()
      // the same doc re-sent inside the watermark horizon: every (id,
      // corpus_id) pair must still emit exactly once
      mem.addData((101L, Timestamp.valueOf("2024-01-01 10:01:00"),
        "the quick brown fox jumps over the lazy dog near the river bank today"))
      q.processAllAvailable()
      val got = spark.sql("SELECT id, corpus_id, n_sig_match FROM neardup_out")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === Map((101L, 1L) -> 12L)) // identical text: all 12 components agree
    } finally q.stop()
  }

  test("stream-stream attribution join matches the batch interval join and bounds its state") {
    implicit val sqlCtx = spark.sqlContext
    val views = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "view"),
      ev(2, "2024-01-01 10:10:00", 1, "view"),
      ev(3, "2024-01-01 10:40:00", 1, "view"),
      ev(4, "2024-01-01 10:05:00", 2, "view"))
    val purchases = Seq(
      ev(101, "2024-01-01 10:30:00", 1, "purchase", 9.99),
      ev(102, "2024-01-01 10:45:00", 1, "purchase", 5.00),
      ev(103, "2024-01-01 11:00:00", 2, "purchase", 7.77))
    // expected (30-min half-open lookback [p_ts − 30m, p_ts)):
    //   p101 ← v1 (10:00 ≥ 10:00) and v2; v3 is after the purchase
    //   p102 ← v3 only (v2 at 10:10 < 10:15 fell out of the window)
    //   p103 ← nothing (user 2's view is 55 min before) — inner join drops
    val expected = Set((101L, 1L), (101L, 2L), (102L, 3L))

    val memV = MemoryStream[Event]
    val memP = MemoryStream[Event]
    val q = attributionJoin(memV.toDF(), memP.toDF())
      .writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append).start()
    try {
      // views and purchases arrive interleaved across micro-batches
      memV.addData(views.take(2): _*)
      memP.addData(purchases.head)
      q.processAllAvailable()
      memV.addData(views.drop(2): _*)
      memP.addData(purchases.tail: _*)
      q.processAllAvailable()
      val got = spark.sql("SELECT purchase_id, view_id FROM attr_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected)

      // same definition on batch frames (watermarks no-op) …
      val batch = attributionJoin(views.toDF(), purchases.toDF())
        .select("purchase_id", "view_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch === expected)

      // … and the batch INTERVAL-join law: purchase = interval
      // [p_ts − lookback, p_ts) over views as points
      val pts = views.toDF().select(col("user_id"),
        col("event_id").as("view_id"), col("ts").as("view_ts"))
      val ivs = purchases.toDF().select(col("user_id"),
        col("event_id").as("purchase_id"),
        (col("ts") - org.apache.spark.sql.functions.expr("INTERVAL 30 minutes")).as("start_ts"),
        col("ts").as("end_ts"))
      val viaInterval = graft.operators.IntervalJoin.broadcastByKey(
          pts, ivs, "user_id", "view_ts", "start_ts", "end_ts", Seq("purchase_id"))
        .select("purchase_id", "view_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaInterval === expected)

      // state bound: push the watermark ~3h forward — everything
      // buffered for the 10:00–11:00 window must be EVICTED, not kept
      memV.addData(ev(5, "2024-01-01 14:00:00", 3, "view"))
      memP.addData(ev(104, "2024-01-01 14:05:00", 3, "purchase", 1.0))
      q.processAllAvailable()
      memV.addData(ev(6, "2024-01-01 14:10:00", 3, "view"))
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      val fed = (views.size + 3) + (purchases.size + 1)
      assert(stateRows < fed,
        s"watermark must evict matured join state: $stateRows rows held of $fed fed")
      assert(stateRows <= 4,
        s"only the post-watermark rows may remain buffered, got $stateRows")
    } finally q.stop()
  }

  test("outer attribution: unattributed purchases emit with null view ONLY after the watermark closes their window") {
    implicit val sqlCtx = spark.sqlContext
    val memV = MemoryStream[Event]
    val memP = MemoryStream[Event]
    val q = attributionJoin(memV.toDF(), memP.toDF(), joinType = "right_outer")
      .writeStream.format("memory").queryName("attr_outer_out")
      .outputMode(OutputMode.Append).start()
    try {
      // p201 has an attributing view; p202 (user 9) has none
      memV.addData(ev(11, "2024-01-01 10:20:00", 1, "view"))
      memP.addData(
        ev(201, "2024-01-01 10:30:00", 1, "purchase", 3.0),
        ev(202, "2024-01-01 10:35:00", 9, "purchase", 4.0))
      q.processAllAvailable()
      def got(): Map[Long, Option[Long]] =
        spark.sql("SELECT purchase_id, view_id FROM attr_outer_out")
          .collect().map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      // matched pair emits immediately; the unmatched purchase must NOT
      // have emitted yet — a view inside its window could still arrive
      assert(got() === Map(201L -> Some(11L)))

      // advance both watermarks well past 10:35 + lookback + delay
      memV.addData(ev(12, "2024-01-01 14:00:00", 3, "view"))
      memP.addData(ev(203, "2024-01-01 14:05:00", 3, "purchase", 1.0))
      q.processAllAvailable()
      memV.addData(ev(13, "2024-01-01 14:10:00", 3, "view"))
      q.processAllAvailable()
      val after = got()
      assert(after(202L) === None, "the organic purchase emits with a null view")
      assert(after(201L) === Some(11L))
      assert(after.contains(203L), "the in-window pair for user 3 also emits")
    } finally q.stop()
  }

  test("streaming data-contract gate: the per-epoch quality report catches a planted defect in exactly its batch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.DataFrame
    val mem = MemoryStream[Event]
    val reports = scala.collection.mutable.ArrayBuffer[(Long, String, Long, Boolean)]()
    val q = mem.toDF().writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      graft.operators.Quality.report(batch,
          notNull = Seq("event_type"),
          violations = Seq("nonpositive_value" -> (col("value") <= 0)))
        .collect().foreach(r =>
          reports.synchronized {
            reports += ((id, r.getString(0), r.getLong(1), r.getBoolean(2))): Unit
          })
    }.start()
    try {
      mem.addData(ev(1, "2024-01-01 10:00:00", 1, v = 1.0),
        ev(2, "2024-01-01 10:01:00", 1, v = 2.0))
      q.processAllAvailable()
      mem.addData(ev(3, "2024-01-01 10:02:00", 1, v = -5.0),
        ev(4, "2024-01-01 10:03:00", 2, v = 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val byBatch = reports.groupBy(_._1).view
      .mapValues(_.map(t => t._2 -> ((t._3, t._4))).toMap).toMap
    assert(byBatch(0L)("row_count") === ((2L, true)))
    assert(byBatch(0L)("violations:nonpositive_value") === ((0L, true)))
    assert(byBatch(1L)("row_count") === ((2L, true)))
    // the defect surfaces in ITS epoch — the admission-control contract
    assert(byBatch(1L)("violations:nonpositive_value") === ((1L, false)))
    assert(byBatch(1L)("null_count:event_type") === ((0L, true)))
  }

  test("streaming drift admission: a planted out-of-distribution epoch alarms in exactly its epoch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.{count, explode, lit}
    import graft.llm.{Dedup, TextAnalysis}
    val ref = Seq((1L, "scan join hash table"), (2L, "scan join merge"))
      .toDF("doc_id", "text")
    val profile = Dedup.once(ref.select(col("text").as("__text")),
        "__toks", TextAnalysis.tokens(col("__text")))
      .select(explode(col("__toks")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c_t"))
      .localCheckpoint()
    val mem = MemoryStream[(Long, String)]
    val alarms = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
        val tv = TextAnalysis.driftAgainstProfile(batch, "text", profile)
          .collect().head.getLong(2)
        alarms.synchronized { alarms += ((id, tv)): Unit }
      }.start()
    try {
      // epoch 0: the reference distribution itself → zero drift
      mem.addData((10L, "scan join hash table"), (11L, "scan join merge"))
      q.processAllAvailable()
      // epoch 1: disjoint vocabulary → total variation 1, alarm HERE
      mem.addData((12L, "le chat dort"), (13L, "la maison bleue"))
      q.processAllAvailable()
    } finally q.stop()
    val byEpoch = alarms.toMap
    assert(byEpoch(0L) === 0L, "an in-distribution epoch passes")
    assert(byEpoch(1L) === 1000000L, "the OOD epoch alarms in exactly its epoch")
  }

  test("streaming ingest into the skipping store: epochs land exactly once and the store serves pruned reads mid-stream") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.DataFrame
    import graft.sinks.DataSkipping
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-store").toString
    // initialize the store with an empty batch (defines schema + manifest)
    DataSkipping.writeWithStats(
      Seq.empty[(Long, Long)].toDF("event_id", "user_id"),
      dir, col("event_id"), numFiles = 1, statsCols = Seq("event_id"))
    val mem = MemoryStream[Event]
    val q = mem.toDF().select(col("event_id"), col("user_id"))
      .writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
        DataSkipping.appendEpoch(batch.sparkSession, dir, batch,
          col("event_id"), numFiles = 1, epochId = id): Unit
        // simulate the sink's at-least-once redelivery: same epoch again
        DataSkipping.appendEpoch(batch.sparkSession, dir, batch,
          col("event_id"), numFiles = 1, epochId = id): Unit
      }.start()
    try {
      mem.addData((1L to 50L).map(i => ev(i, "2024-01-01 10:00:00", i % 5)): _*)
      q.processAllAvailable()
      mem.addData((51L to 80L).map(i => ev(i, "2024-01-01 11:00:00", i % 5)): _*)
      q.processAllAvailable()
    } finally q.stop()
    val all = DataSkipping.readPruned(spark, dir,
      Seq(("event_id", Long.MinValue, Long.MaxValue - 1)))
    assert(all.count() === 80L, "each event lands exactly once despite redelivery")
    // the streamed store is a first-class skipping store: narrow reads prune
    val narrow = DataSkipping.readPruned(spark, dir, Seq(("event_id", 1L, 50L)))
    assert(narrow.count() === 50L)
    assert(narrow.inputFiles.length <
      DataSkipping.readManifest(spark, dir).files.size)
  }

  test("batch sessions split exactly on the gap boundary") {
    val df = Seq(
      ev(1, "2024-01-01 10:00:00", 1),
      ev(2, "2024-01-01 10:30:00", 1),  // exactly 30min → same session (strict >)
      ev(3, "2024-01-01 11:00:01", 1),  // 30min+1s → new session
      ev(4, "2024-01-01 10:00:00", 2)).toDF()
    val s = batchSessions(df, 1800000L).orderBy("user_id", "session_idx").collect()
    assert(s.map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq ===
      Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("session_window batch equals batchSessions with last+gap as the end, including the exact-gap boundary") {
    val df = Seq(
      ev(1, "2024-01-01 10:00:00", 1, v = 1.25),
      ev(2, "2024-01-01 10:30:00", 1, v = 2.50),  // exactly 30min → merges (both definitions)
      ev(3, "2024-01-01 11:00:01", 1, v = 0.75),  // 30min+1s after ev2 → new session
      ev(4, "2024-01-01 10:00:00", 2, v = 4.00)).toDF()
    val got = sessionWindowAgg(df, "30 minutes")
      .orderBy("user_id", "session_start")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (1L, "2024-01-01 10:00:00", "2024-01-01 11:00:00", 2L, 375L),
      (1L, "2024-01-01 11:00:01", "2024-01-01 11:30:01", 1L, 75L),
      (2L, "2024-01-01 10:00:00", "2024-01-01 10:30:00", 1L, 400L)))
    // same end law as the islands builder on the shared fixture
    val viaIslands = batchSessions(df, 1800000L)
      .select(col("user_id"), col("session_start"),
        org.apache.spark.sql.functions.date_format(
          org.apache.spark.sql.functions.to_timestamp(col("session_end"))
            + org.apache.spark.sql.functions.expr("INTERVAL 30 MINUTES"),
          "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(viaIslands.toSeq === got.map(t => (t._1, t._2, t._3, t._4)).toSeq)
  }

  test("streaming session_window: extensions merge across micro-batches; a session emits once closed by the watermark and its state is evicted") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = sessionWindowAgg(mem.toDF(), "30 minutes")
      .writeStream.format("memory").queryName("sw_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(ev(1, "2024-01-01 10:00:00", 1), ev(2, "2024-01-01 10:20:00", 1))
      q.processAllAvailable()
      // extends the open session; nothing final yet (watermark 2h behind)
      mem.addData(ev(3, "2024-01-01 10:45:00", 1))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM sw_out").count() === 0L,
        "append mode must not emit an open session")
      // far-future event advances the watermark past the session's end →
      // the 3-event merged session finalizes EXACTLY ONCE
      mem.addData(ev(4, "2024-01-02 06:00:00", 1))
      q.processAllAvailable()
      q.processAllAvailable()
      val rows = spark.sql(
          "SELECT session_start, session_end, n_events FROM sw_out ORDER BY session_start")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      assert(rows.toSeq === Seq(
        ("2024-01-01 10:00:00", "2024-01-01 11:15:00", 3L)))
      // closed session's state is gone: only the open ev4 session remains
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 1, s"expected closed-session state evicted, got $stateRows rows")
    } finally q.stop()
  }
}
