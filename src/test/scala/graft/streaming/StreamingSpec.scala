package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
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
}
