package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

class DataSkippingSpec extends SparkSuite {
  import spark.implicits._

  private def tmpDir(name: String): String = {
    val p = Files.createTempDirectory(name)
    p.toFile.deleteOnExit()
    p.toString
  }

  test("writeWithStats + readPruned: pruned listing, exact filter result") {
    val dir = tmpDir("graft-skip")
    // two dimensions laid out on the z-order key: both get tight ranges
    val df = (0 until 4096).map(i => (i.toLong % 64, i.toLong / 64, i.toLong))
      .toDF("a", "b", "payload")
    val m = DataSkipping.writeWithStats(df, dir,
      graft.functions.ZOrder64(col("a"), col("b")),
      numFiles = 16, statsCols = Seq("a", "b"))
    assert(m.cols === Seq("a", "b"))
    assert(m.files.map(_.rows).sum === 4096L)
    // manifest round-trips exactly
    assert(DataSkipping.readManifest(spark, dir) === m)

    val pruned = DataSkipping.readPruned(spark, dir,
      Seq(("a", 3L, 9L), ("b", 10L, 20L)))
    val total = spark.read.parquet(dir).inputFiles.length
    assert(pruned.inputFiles.length < total,
      s"a narrow 2-D range must skip files: read ${pruned.inputFiles.length} of $total")
    val expected = df.filter(col("a").between(3, 9) && col("b").between(10, 20))
    assert(pruned.orderBy("payload").collect() ===
      expected.orderBy("payload").collect())
  }

  test("readPruned with an empty intersection returns the empty result") {
    val dir = tmpDir("graft-skip-empty")
    val df = (0 until 100).map(i => (i.toLong, i.toLong)).toDF("a", "payload")
    DataSkipping.writeWithStats(df, dir, col("a"), numFiles = 4,
      statsCols = Seq("a"))
    val out = DataSkipping.readPruned(spark, dir, Seq(("a", 1000L, 2000L)))
    assert(out.count() === 0L)
    assert(out.columns.toSeq === Seq("a", "payload"))
  }

  test("all-NULL stats column records an empty range and is skippable") {
    val dir = tmpDir("graft-skip-null")
    val withNull = Seq((Some(1L), 1L), (Some(2L), 2L)).toDF("a", "payload")
      .unionByName(Seq((Option.empty[Long], 3L)).toDF("a", "payload"))
    // one file per row: the null row lands alone in some file
    val m = DataSkipping.writeWithStats(withNull, dir, col("payload"),
      numFiles = 3, statsCols = Seq("a"))
    val nullFile = m.files.find(f => f.mins.head == Long.MaxValue)
    assert(nullFile.isDefined, "the all-null file must record an empty range")
    assert(nullFile.get.maxs.head === Long.MinValue)
    // a range covering everything still never lists the null-only file
    val all = DataSkipping.readPruned(spark, dir, Seq(("a", Long.MinValue, Long.MaxValue - 1)))
    assert(all.count() === 2L)
    // partial-null files keep non-null min/max (nulls never satisfy the
    // residual, so correctness is unaffected)
    assert(m.files.map(_.rows).sum === 3L)
  }

  test("readPruned rejects columns without stats; manifest survives refresh") {
    val dir = tmpDir("graft-skip-cols")
    val df = (0 until 10).map(i => (i.toLong, i.toLong)).toDF("a", "b")
    DataSkipping.writeWithStats(df, dir, col("a"), numFiles = 2, statsCols = Seq("a"))
    val e = intercept[IllegalArgumentException] {
      DataSkipping.readPruned(spark, dir, Seq(("b", 0L, 5L)))
    }
    assert(e.getMessage.contains("no stats"))
    // refresh with more stats columns — the reader now prunes on both
    DataSkipping.writeManifest(spark, dir, Seq("a", "b"))
    assert(DataSkipping.readPruned(spark, dir, Seq(("b", 0L, 5L))).count() === 6L)
  }
}
