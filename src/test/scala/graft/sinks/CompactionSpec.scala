package graft.sinks

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSuite

class CompactionSpec extends SparkSuite {
  import spark.implicits._

  private def tmpDir(name: String): String = {
    val p = Files.createTempDirectory(name)
    p.toFile.deleteOnExit()
    p.toString
  }

  test("compact: fewer files, identical rows, stats reflect the listing") {
    val dir = tmpDir("graft-compact")
    val df = (0 until 2000).map(i => (i.toLong, s"doc-$i" * 10)).toDF("id", "text")
    df.repartition(32).write.mode("overwrite").parquet(s"$dir/frag")
    val stats = Compaction.compact(spark, s"$dir/frag", s"$dir/packed",
      targetBytes = 512L << 10)
    assert(stats.inputFiles === 32L)
    assert(stats.outputFiles < stats.inputFiles)
    // n = ceil(inputBytes / target) — the listing drives the task count
    val expectedN = math.max(1L, (stats.inputBytes + (512L << 10) - 1) / (512L << 10))
    assert(stats.outputFiles === expectedN)
    val back = spark.read.parquet(s"$dir/packed")
    assert(back.count() === 2000L)
    assert(back.agg(sum(col("id"))).head().getLong(0) === (0L until 2000L).sum)
    // the fragmented original is untouched (swap happens outside compact)
    assert(spark.read.parquet(s"$dir/frag").count() === 2000L)
  }

  test("compactPartitions: fragmented partitions rewritten, untouched ones not even read") {
    val dir = tmpDir("graft-compact-inc")
    val t = s"$dir/t"
    // k=0: one tidy file. k=1: fragmented into 8 files.
    (0 until 500).map(i => (i.toLong, 0L, s"v$i")).toDF("id", "k", "v")
      .repartition(1).write.partitionBy("k").mode("overwrite").parquet(t)
    (0 until 500).map(i => (i.toLong + 1000, 1L, s"w$i")).toDF("id", "k", "v")
      .repartition(8).write.partitionBy("k").mode("append").parquet(t)
    val before = spark.read.parquet(t)
    val beforeSum = before.agg(sum(col("id"))).head().getLong(0)
    def listFiles(part: String): Map[String, Long] = {
      val d = new java.io.File(s"$t/$part")
      d.listFiles().filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val untouchedBefore = listFiles("k=0")
    val out = Compaction.compactPartitions(spark, t, sortCols = Seq("id"))
    assert(out.map(_.partition).sorted === Seq("k=0", "k=1"))
    val byPart = out.map(p => p.partition -> p).toMap
    assert(byPart("k=0").skipped, "the tidy partition must be skipped")
    assert(!byPart("k=1").skipped)
    assert(byPart("k=1").stats.inputFiles === 8L)
    assert(byPart("k=1").stats.outputFiles === 1L)
    // the skipped partition's files are bit-for-bit untouched (same
    // names, same mtimes — never rewritten)
    assert(listFiles("k=0") === untouchedBefore)
    // no temp dirs left behind; row set identical
    assert(!new java.io.File(t).listFiles().exists(_.getName.startsWith("_compact_tmp")))
    val after = spark.read.parquet(t)
    assert(after.count() === 1000L)
    assert(after.agg(sum(col("id"))).head().getLong(0) === beforeSum)
    // a second pass is a full no-op
    assert(Compaction.compactPartitions(spark, t, sortCols = Seq("id")).forall(_.skipped))
  }

  test("compactPartitions: a failing leaf fails the pass loudly; healthy leaves stay consistent (pool failure drain)") {
    val dir = tmpDir("graft-compact-fail")
    val t = s"$dir/t"
    // three fragmented partitions; k=1's data is then corrupted so its
    // leaf rewrite fails inside the bounded pool
    (0 until 300).map(i => (i.toLong, i % 3L, s"v$i")).toDF("id", "k", "v")
      .repartition(8).write.partitionBy("k").mode("overwrite").parquet(t)
    val broken = new java.io.File(s"$t/k=1").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.write(broken.toPath, Array.fill[Byte](64)(0x7f))
    intercept[Throwable] {
      Compaction.compactPartitions(spark, t, sortCols = Seq("id"))
    }
    // the failure surfaces only after the pool DRAINED, so every other
    // leaf is in a complete pre- or post-compaction state: k=0 and k=2
    // hold their full row sets whether or not their rewrite committed.
    // (refresh: the swap renames files behind Spark's listing cache)
    spark.catalog.refreshByPath(t)
    Seq(0L, 2L).foreach { k =>
      spark.catalog.refreshByPath(s"$t/k=$k")
      val part = spark.read.parquet(s"$t/k=$k")
      assert(part.count() === 100L, s"leaf k=$k lost rows after a pool failure")
    }
  }

  test("compact refuses in-place rewrites and nonpositive targets") {
    val dir = tmpDir("graft-compact-ip")
    Seq((1L, "x")).toDF("id", "v").write.mode("overwrite").parquet(s"$dir/t")
    val e = intercept[IllegalArgumentException] {
      Compaction.compact(spark, s"$dir/t", s"$dir/t")
    }
    assert(e.getMessage.contains("NEW directory"))
    val e2 = intercept[IllegalArgumentException] {
      Compaction.compact(spark, s"$dir/t", s"$dir/u", targetBytes = 0L)
    }
    assert(e2.getMessage.contains("targetBytes"))
  }

  test("dirStats ignores _-prefixed bookkeeping files") {
    val dir = tmpDir("graft-compact-ds")
    Seq((1L, "x"), (2L, "y")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/t")
    val (files, bytes) = Compaction.dirStats(spark, s"$dir/t")
    assert(files === 1L, "_SUCCESS must not count as a data file")
    assert(bytes > 0L)
    assert(Files.exists(Paths.get(s"$dir/t/_SUCCESS")))
  }
}
