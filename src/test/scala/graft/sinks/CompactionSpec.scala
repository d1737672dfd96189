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
