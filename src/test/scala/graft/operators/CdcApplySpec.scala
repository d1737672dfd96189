package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Contract tests for the CDC batch apply: op-log collapse order, delete
  * semantics, absent-key no-ops, loud failure on unknown ops, and the
  * diff/apply round-trip against [[graft.llm.Dedup.snapshotDiff]].
  */
class CdcApplySpec extends SparkSuite {
  import spark.implicits._

  private def snap = Seq(
    (1L, "one", "a"), (2L, "two", "a"), (3L, "three", "b")
  ).toDF("id", "text", "src")

  test("CDC: upsert replaces, insert adds, delete removes") {
    val changes = Seq(
      (1L, 1L, "upsert", "one-v2", "a"),
      (4L, 1L, "upsert", "four", "c"),
      (3L, 1L, "delete", null, null)
    ).toDF("id", "seq", "op", "text", "src")
    val out = CdcApply.rollForward(snap, changes, Seq("id"))
      .as[(Long, String, String)].collect().toSet
    assert(out === Set((1L, "one-v2", "a"), (2L, "two", "a"), (4L, "four", "c")))
  }

  test("CDC: keep-last collapse — highest seq wins in either direction") {
    val changes = Seq(
      (1L, 1L, "upsert", "one-v2", "a"), (1L, 2L, "delete", null, null),
      (3L, 1L, "delete", null, null), (3L, 2L, "upsert", "three-v2", "b")
    ).toDF("id", "seq", "op", "text", "src")
    val out = CdcApply.rollForward(snap, changes, Seq("id"))
      .as[(Long, String, String)].collect().toSet
    assert(out === Set((2L, "two", "a"), (3L, "three-v2", "b")))
  }

  test("CDC: delete of an absent key is a no-op (SQL MERGE semantics)") {
    val changes = Seq((99L, 1L, "delete", null.asInstanceOf[String],
      null.asInstanceOf[String])).toDF("id", "seq", "op", "text", "src")
    assert(CdcApply.rollForward(snap, changes, Seq("id")).count() === 3)
  }

  test("CDC: unknown op fails the job loudly, never drops rows silently") {
    val changes = Seq((1L, 1L, "upsrt", "oops", "a")).toDF("id", "seq", "op", "text", "src")
    val e = intercept[Exception] {
      CdcApply.rollForward(snap, changes, Seq("id")).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("unknown op")))
  }

  test("CDC: NULL key column fails the job loudly, never inserts NULL-keyed rows") {
    // a NULL id never matches the anti-join, so without the guard this
    // upsert would land a NULL-keyed row in the next snapshot
    val changes = Seq((null.asInstanceOf[java.lang.Long], 1L, "upsert", "ghost", "a"))
      .toDF("id", "seq", "op", "text", "src")
    val e = intercept[Exception] {
      CdcApply.rollForward(snap, changes, Seq("id")).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("NULL key column")))
  }

  test("CDC: snapshot columns may not collide with seq/op") {
    val withSeq = snap.withColumn("seq", lit(1L))
    val changes = Seq((1L, 1L, "delete", null.asInstanceOf[String],
      null.asInstanceOf[String], 1L)).toDF("id", "seq2", "op", "text", "src", "seq")
    intercept[IllegalArgumentException] {
      CdcApply.rollForward(withSeq, changes, Seq("id"), seqCol = "seq")
    }
  }

  test("CDC: batch-split invariance — chained applies equal one combined apply (seeded random ops)") {
    val rnd = new scala.util.Random(7)
    val snap0 = (0L until 40L).map(i => (i, s"v$i", "s")).toDF("id", "text", "src")
    // two waves of random ops; wave-2 sequences strictly above wave-1's,
    // matching any log-ordered CDC feed
    def wave(seqBase: Long, n: Int) = (0 until n).map { j =>
      val id = rnd.nextInt(50).toLong // some ids absent from the snapshot
      if (rnd.nextBoolean()) (id, seqBase + j, "upsert", s"w$seqBase-$j", "s")
      else (id, seqBase + j, "delete", null.asInstanceOf[String], null.asInstanceOf[String])
    }
    val c1 = wave(100L, 30).toDF("id", "seq", "op", "text", "src")
    val c2 = wave(1000L, 30).toDF("id", "seq", "op", "text", "src")
    val chained = CdcApply.rollForward(
      CdcApply.rollForward(snap0, c1, Seq("id")), c2, Seq("id"))
    val combined = CdcApply.rollForward(snap0, c1.unionByName(c2), Seq("id"))
    assert(chained.as[(Long, String, String)].collect().toSet ===
      combined.as[(Long, String, String)].collect().toSet)
  }

  test("CDC: applying a snapshotDiff-derived batch rolls old forward to new") {
    val oldSnap = Seq((1L, "one", "a"), (2L, "two", "a"), (3L, "three", "b"))
      .toDF("id", "text", "src")
    val newSnap = Seq((2L, "two", "a"), (3L, "three-v2", "b"), (4L, "four", "c"))
      .toDF("id", "text", "src")
    // diff → change batch: added/changed become upserts carrying the NEW
    // payload, removed become deletes
    val diff = graft.llm.Dedup.snapshotDiff(
      oldSnap.select(col("id"), col("text")),
      newSnap.select(col("id"), col("text")), "id", "text")
      .filter(col("status") =!= "unchanged")
    val ups = newSnap
      .join(diff.filter(col("status").isin("added", "changed")).select("id"),
        Seq("id"), "left_semi")
      .select(col("id"), lit(1L).as("seq"), lit("upsert").as("op"),
        col("text"), col("src"))
    val dels = diff.filter(col("status") === "removed")
      .select(col("id"), lit(1L).as("seq"), lit("delete").as("op"),
        lit(null).cast("string").as("text"), lit(null).cast("string").as("src"))
    val rolled = CdcApply.rollForward(oldSnap, ups.unionByName(dels), Seq("id"))
    assert(rolled.as[(Long, String, String)].collect().toSet ===
      newSnap.as[(Long, String, String)].collect().toSet)
  }
}
