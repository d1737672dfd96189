package graft.sinks

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Erasure laws: only manifest-hit files change (the rest stay
  * byte-identical), NULL keys survive, emptied files vanish, and the
  * refreshed manifest prunes erased keys to nothing.
  */
class ErasureSpec extends SparkSuite {
  import spark.implicits._

  private def tmpDir(name: String): String = {
    val p = Files.createTempDirectory(name)
    p.toFile.deleteOnExit()
    p.toString
  }

  test("erasure rewrites only hit files, preserves NULL keys, and refreshes the manifest") {
    val dir = tmpDir("graft-erase")
    // keys 0..799 clustered by range into 8 files (~100 keys each),
    // plus NULL-key rows that must survive any erasure
    val rows = (0 until 4000).map(i => (java.lang.Long.valueOf(i.toLong % 800), i.toLong)) ++
      (0 until 50).map(i => (null.asInstanceOf[java.lang.Long], 100000L + i))
    val df = rows.toDF("k", "payload")
    DataSkipping.writeWithStats(df, dir, col("k"), numFiles = 8, statsCols = Seq("k"))
    val before = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-"))
      .map(f => f.getName -> Files.readAllBytes(Paths.get(f.getPath)).toSeq).toMap

    // doomed keys live in a narrow range -> few files hit
    val doomed = Seq(10L, 11L, 12L, 13L)
    val rpt = Erasure.deleteKeys(spark, dir, "k", doomed)
    assert(rpt.filesTotal === 8)
    assert(rpt.filesRewritten + rpt.filesDeleted >= 1)
    assert(rpt.filesRewritten + rpt.filesDeleted <= 2,
      s"range-clustered keys must hit at most a couple of files, got $rpt")
    assert(rpt.rowsDeleted === 4L * 5, "each key appears 4000/800 = 5 times")

    val after = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-"))
      .map(f => f.getName -> Files.readAllBytes(Paths.get(f.getPath)).toSeq).toMap
    val changed = before.keySet.filter(n => after.get(n) != Some(before(n)))
    assert(changed.size === rpt.filesRewritten + rpt.filesDeleted,
      s"exactly the reported files may differ, got $changed")

    val survivors = spark.read.parquet(dir)
    assert(survivors.filter(col("k").isin(doomed: _*)).count() === 0L, "no doomed key survives")
    assert(survivors.filter(col("k").isNull).count() === 50L, "NULL keys must survive erasure")
    assert(survivors.count() === 4050L - 20L)
    // refreshed manifest: a pruned read for an erased key finds nothing
    assert(DataSkipping.readPruned(spark, dir, Seq(("k", 10L, 10L))).count() === 0L)
  }

  test("a file whose every row is doomed is deleted outright") {
    val dir = tmpDir("graft-erase-all")
    val df = (0 until 100).map(i => (i.toLong / 50, i.toLong)).toDF("k", "payload")
    DataSkipping.writeWithStats(df, dir, col("k"), numFiles = 2, statsCols = Seq("k"))
    val rpt = Erasure.deleteKeys(spark, dir, "k", Seq(0L))
    assert(rpt.filesDeleted === 1 && rpt.filesRewritten === 0)
    assert(rpt.rowsDeleted === 50L)
    assert(spark.read.parquet(dir).count() === 50L)
    assert(DataSkipping.readManifest(spark, dir).files.size === 1)
  }

  test("an erasure list matching nothing touches nothing") {
    val dir = tmpDir("graft-erase-none")
    val df = (0 until 100).map(i => (i.toLong, i.toLong)).toDF("k", "payload")
    DataSkipping.writeWithStats(df, dir, col("k"), numFiles = 2, statsCols = Seq("k"))
    val rpt = Erasure.deleteKeys(spark, dir, "k", Seq(99999L))
    assert(rpt === Erasure.ErasureReport(2, 0, 0, 0L))
    assert(spark.read.parquet(dir).count() === 100L)
  }

  test("manifest refresh is hit-sized: untouched files are never re-read") {
    val dir = tmpDir("graft-erase-hitsized")
    val df = (0 until 800).map(i => (i.toLong, i.toLong)).toDF("k", "payload")
    val m = DataSkipping.writeWithStats(df, dir, col("k"), numFiles = 8,
      statsCols = Seq("k"))
    // corrupt the LAST file (k-range ~700..799) on disk: any refresh
    // that scans the whole directory now throws; a hit-sized patch of
    // an erasure confined to the FIRST file's range succeeds
    val victim = m.files.last.file
    val victimPath = Paths.get(dir, victim)
    val original = Files.readAllBytes(victimPath)
    Files.write(victimPath, "not a parquet file".getBytes("UTF-8"))

    val rpt = Erasure.deleteKeys(spark, dir, "k", Seq(10L, 11L))
    assert(rpt.filesRewritten === 1 && rpt.filesDeleted === 0)
    assert(rpt.rowsDeleted === 2L)

    // the corrupted (untouched) file's manifest entry survived verbatim
    val after = DataSkipping.readManifest(spark, dir)
    assert(after.files.find(_.file === victim) === m.files.lastOption)
    Files.write(victimPath, original) // restore for the exactness check
    assert(spark.read.parquet(dir).filter(col("k").isin(10L, 11L)).count() === 0L)
    assert(spark.read.parquet(dir).count() === 798L)
  }

  test("erasing every row leaves an empty directory and a valid empty manifest") {
    val dir = tmpDir("graft-erase-empty")
    val df = (0 until 100).map(i => (i.toLong % 10, i.toLong)).toDF("k", "payload")
    DataSkipping.writeWithStats(df, dir, col("k"), numFiles = 2, statsCols = Seq("k"))
    val rpt = Erasure.deleteKeys(spark, dir, "k", (0L until 10L))
    assert(rpt.filesDeleted === 2 && rpt.filesRewritten === 0)
    assert(rpt.rowsDeleted === 100L)
    val m = DataSkipping.readManifest(spark, dir)
    assert(m.files.isEmpty && m.cols === Seq("k"))
  }

  test("string-key erasure via the bloom sidecar") {
    val dir = tmpDir("graft-erase-str")
    val rows = (0 until 400).map(i => (i.toLong, s"u${i % 100}@x.example", i.toLong))
    val df = rows.toDF("id", "email", "payload")
    DataSkipping.writeWithStats(df, dir, col("id"), numFiles = 4,
      statsCols = Seq("id"), bloomCols = Seq("email"), bloomExpected = 200L)
    val rpt = Erasure.delete(spark, dir, "email", Seq("u7@x.example", "u13@x.example"))
    assert(rpt.rowsDeleted === 8L, "each erased address appears 4x")
    val left = spark.read.parquet(dir)
    assert(left.filter(col("email").isin("u7@x.example", "u13@x.example")).count() === 0L)
    assert(left.count() === 392L)
    // long-only stats alone cannot serve a string list
    val statsOnly = tmpDir("graft-erase-str-nostats")
    DataSkipping.writeWithStats(df, statsOnly, col("id"), numFiles = 2,
      statsCols = Seq("id"))
    val e = intercept[IllegalArgumentException] {
      Erasure.delete(spark, statsOnly, "email", Seq("u7@x.example"))
    }
    assert(e.getMessage.contains("bloom"))
  }

  test("deleteRange deletes wholly-doomed files from the listing WITHOUT reading them; boundary files rewrite") {
    val dir = tmpDir("graft-ttl")
    // keys 0..799 range-clustered into 8 files (~100 keys each)
    val df = (0 until 800).map(i => (i.toLong, i.toLong)).toDF("k", "payload")
    val m = DataSkipping.writeWithStats(df, dir, col("k"), numFiles = 8,
      statsCols = Seq("k"))
    // corrupt the FIRST file (k ~0..99) on disk: it is wholly inside the
    // doomed range with a known-zero null count, so deleteRange must
    // drop it from the listing without opening it — a read would throw
    val victim = m.files.minBy(_.mins.head).file
    Files.write(Paths.get(dir, victim), "not a parquet file".getBytes("UTF-8"))

    val rpt = Erasure.deleteRange(spark, dir, "k", Long.MinValue, 149L)
    assert(rpt.filesDeleted === 1, s"the wholly-doomed file deletes listing-only: $rpt")
    assert(rpt.filesRewritten === 1, s"the straddling file rewrites survivors: $rpt")
    assert(rpt.rowsDeleted === 150L)

    val left = spark.read.parquet(dir)
    assert(left.filter(col("k") <= 149L).count() === 0L)
    assert(left.count() === 650L)
    // refreshed manifest prunes the erased range to nothing
    assert(DataSkipping.readPruned(spark, dir, Seq(("k", 0L, 149L))).count() === 0L)
  }

  test("deleteRange preserves NULL keys: a null-bearing file takes the rewrite path even when its range is wholly doomed") {
    val dir = tmpDir("graft-ttl-null")
    // NULLs sort first under range partitioning -> they share the
    // lowest-key file, whose non-null range the delete wholly covers
    val rows = (0 until 200).map(i => (java.lang.Long.valueOf(i.toLong), i.toLong)) ++
      (0 until 30).map(i => (null.asInstanceOf[java.lang.Long], 9000L + i))
    val df = rows.toDF("k", "payload")
    DataSkipping.writeWithStats(df, dir, col("k"), numFiles = 2, statsCols = Seq("k"))
    val rpt = Erasure.deleteRange(spark, dir, "k", Long.MinValue, 99L)
    assert(rpt.rowsDeleted === 100L)
    val left = spark.read.parquet(dir)
    assert(left.filter(col("k").isNull).count() === 30L, "NULL keys must survive a range delete")
    assert(left.filter(col("k") <= 99L).count() === 0L)
  }

  test("deleteRange on a legacy manifest (no null counts) stays conservative: null rows survive a whole-file range") {
    val dir = tmpDir("graft-ttl-legacy")
    val rows = (0 until 100).map(i => (java.lang.Long.valueOf(i.toLong), i.toLong)) ++
      (0 until 10).map(i => (null.asInstanceOf[java.lang.Long], 9000L + i))
    val df = rows.toDF("k", "payload")
    DataSkipping.writeWithStats(df, dir, col("k"), numFiles = 1, statsCols = Seq("k"))
    // simulate a pre-null-counts manifest: strip the nulls field
    val mf = Paths.get(dir, DataSkipping.ManifestName)
    val legacy = new String(Files.readAllBytes(mf), "UTF-8")
      .replaceAll(""","nulls":\[[^\]]*\]""", "")
    Files.write(mf, legacy.getBytes("UTF-8"))
    // drop the checksum sidecar invalidated by the out-of-band edit
    Files.deleteIfExists(Paths.get(dir, s".${DataSkipping.ManifestName}.crc")): Unit
    assert(DataSkipping.readManifest(spark, dir).files.forall(_.nulls.isEmpty))
    // the file's whole non-null range is doomed, but the null count is
    // UNKNOWN — a blind listing-delete would destroy the NULL rows
    val rpt = Erasure.deleteRange(spark, dir, "k", 0L, 99L)
    assert(rpt.rowsDeleted === 100L)
    assert(spark.read.parquet(dir).filter(col("k").isNull).count() === 10L,
      "unknown null counts must force the conservative rewrite path")
  }

  test("deleteRange matching nothing touches nothing; reversed bounds are rejected") {
    val dir = tmpDir("graft-ttl-none")
    val df = (0 until 100).map(i => (i.toLong, i.toLong)).toDF("k", "payload")
    DataSkipping.writeWithStats(df, dir, col("k"), numFiles = 2, statsCols = Seq("k"))
    val rpt = Erasure.deleteRange(spark, dir, "k", 5000L, 6000L)
    assert(rpt === Erasure.ErasureReport(2, 0, 0, 0L))
    assert(spark.read.parquet(dir).count() === 100L)
    intercept[IllegalArgumentException] {
      Erasure.deleteRange(spark, dir, "k", 10L, 5L)
    }: Unit
    intercept[IllegalArgumentException] {
      Erasure.deleteRange(spark, dir, "payload", 0L, 1L) // no stats column
    }: Unit
  }

  test("stale .erasure_tmp_* leftovers are swept on the next run") {
    val dir = tmpDir("graft-erase-sweep")
    val df = (0 until 100).map(i => (i.toLong, i.toLong)).toDF("k", "payload")
    DataSkipping.writeWithStats(df, dir, col("k"), numFiles = 2, statsCols = Seq("k"))
    val stale = Paths.get(dir, ".erasure_tmp_part-crashed")
    Files.createDirectory(stale)
    Files.write(stale.resolve("junk"), Array[Byte](1, 2, 3))
    // backdate past the sweep grace: a YOUNG .erasure_tmp_* dir may be
    // a live concurrent upsert's staging and must survive the sweep
    Files.setLastModifiedTime(stale, java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - DataSkipping.SweepGraceMs - 60000L)): Unit
    Erasure.deleteKeys(spark, dir, "k", Seq(5L)): Unit
    assert(!Files.exists(stale), "crashed-run leftovers must be swept")
    assert(spark.read.parquet(dir).count() === 99L)
  }

  test("a key list past IsinMaxKeys takes the broadcast anti-join path: law-equal, NULL keys survive") {
    // 15k doomed keys would be a 15k-literal IN; the anti-join form
    // must produce exactly the same survivors, including every
    // NULL-keyed row (NULL equals no doomed key in either form)
    val dir = tmpDir("graft-erase-bigk")
    val rows = (0 until 30000).map(i => (java.lang.Long.valueOf(i.toLong), i.toLong)) ++
      (0 until 50).map(i => (null.asInstanceOf[java.lang.Long], 1000000L + i))
    DataSkipping.writeWithStats(rows.toDF("k", "payload"), dir, col("k"),
      numFiles = 4, statsCols = Seq("k"))
    val doomed: Seq[Long] = (0L until 30000L by 2L)
    assert(doomed.size > Erasure.IsinMaxKeys, "fixture must exercise the join path")
    val rpt = Erasure.deleteKeys(spark, dir, "k", doomed)
    assert(rpt.rowsDeleted === 15000L)
    val left = spark.read.parquet(dir)
    assert(left.count() === 15050L)
    assert(left.filter(col("k").isNull).count() === 50L, "NULL keys must survive")
    assert(left.filter(col("k") % 2 === 0).count() === 0L, "every even key erased")
  }
}
