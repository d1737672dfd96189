package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data skipping — the lakehouse read-path complement of the
  * [[graft.functions.ZOrder64]] layout key: a table written CLUSTERED on
  * a layout key carries tight per-file min/max ranges on the clustered
  * columns, and a range query can then skip whole files from the
  * LISTING, before a single parquet footer is opened. Parquet's own
  * row-group stats prune pages only after the scan task has already
  * been scheduled against the file; at 100 TB the win is never
  * scheduling the task at all — the same move Delta/Iceberg/Hudi make
  * with their stats manifests, here as a plain JSON sidecar over a
  * plain parquet directory (reference has no analogue; this serves the
  * `events`/`lineitem`-shaped range scans of SURVEY.md §2.11 at scale).
  *
  * Write side ([[writeWithStats]]): range-repartition + sort on the
  * layout key (a z-order key makes BOTH interleaved dimensions' per-file
  * ranges tight), then ONE column-pruned stats pass over the written
  * files (`input_file_name()` group-by — reads only the stats columns)
  * produces `_skip_manifest.json`: per file, row count and min/max of
  * each stats column. The manifest is file-count-sized — driver metadata,
  * exactly what a table format keeps in its log.
  *
  * Read side ([[readPruned]]): bounds are intersected against the
  * manifest DRIVER-SIDE (a metadata decision, like partition pruning),
  * only intersecting files are handed to the reader, and the residual
  * predicate still applies — so the result is EXACTLY the full scan's
  * filter, independent of layout quality: a bad layout skips nothing
  * but never returns a wrong row. Stats min/max ignore NULLs (files
  * recording no non-null value are always skippable: a NULL never
  * satisfies a range predicate).
  *
  * Single-writer discipline as everywhere in this package: the manifest
  * describes the directory as of its write; rewrite it after any
  * append/compaction (stats collection is idempotent).
  */
object DataSkipping {

  val ManifestName = "_skip_manifest.json"

  /** Per-file stats: `mins`/`maxs` align with the manifest's column
    * list. A file with zero non-null values in a column records
    * (Long.MaxValue, Long.MinValue) — an empty range nothing intersects.
    */
  final case class FileStats(file: String, rows: Long, mins: Seq[Long], maxs: Seq[Long])

  final case class SkipManifest(cols: Seq[String], files: Seq[FileStats])

  /** Write `df` to `outDir` clustered on `layoutKey` in ~`numFiles`
    * range-partitioned, internally sorted files, then collect per-file
    * min/max of `statsCols` (long-valued columns) into the skip
    * manifest. Returns the manifest, ordered by file name.
    *
    * `numFiles` sizes files for the target corpus (bytes / ~128 MB);
    * the stats pass reads only `statsCols` (column-pruned) once.
    */
  def writeWithStats(df: DataFrame, outDir: String, layoutKey: Column,
      numFiles: Int, statsCols: Seq[String]): SkipManifest = {
    require(numFiles >= 1, "numFiles must be >= 1")
    require(statsCols.nonEmpty, "statsCols must be non-empty")
    df.withColumn("__layout", layoutKey)
      .repartitionByRange(numFiles, col("__layout"))
      .sortWithinPartitions(col("__layout"))
      .drop("__layout")
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    writeManifest(df.sparkSession, outDir, statsCols)
  }

  /** Build and write the manifest for an existing parquet directory —
    * also the refresh step after an append or compaction.
    */
  def writeManifest(spark: SparkSession, outDir: String,
      statsCols: Seq[String]): SkipManifest = {
    val aggs = statsCols.flatMap(c => Seq(
      min(col(c).cast("long")).as(s"__min_$c"),
      max(col(c).cast("long")).as(s"__max_$c")))
    val rows = spark.read.parquet(outDir)
      .groupBy(input_file_name().as("__file"))
      .agg(count(lit(1)).as("__rows"), aggs: _*)
      .collect() // one row per FILE — manifest-sized, never data-sized
    val files = rows.map { r =>
      val name = r.getString(0).split('/').last
      val (mins, maxs) = statsCols.map { c =>
        val mi = r.getAs[Any](s"__min_$c"); val ma = r.getAs[Any](s"__max_$c")
        if (mi == null || ma == null) (Long.MaxValue, Long.MinValue)
        else (mi.asInstanceOf[Long], ma.asInstanceOf[Long])
      }.unzip
      FileStats(name, r.getAs[Long]("__rows"), mins, maxs)
    }.sortBy(_.file).toIndexedSeq
    val m = SkipManifest(statsCols, files)
    val text = new StringBuilder
    text ++= s"""{"cols":${m.cols.map(c => "\"" + c + "\"").mkString("[", ",", "]")},"files":[""" + "\n"
    text ++= files.map(f =>
      s"""{"file":"${f.file}","rows":${f.rows},"mins":${f.mins.mkString("[", ",", "]")},"maxs":${f.maxs.mkString("[", ",", "]")}}""")
      .mkString(",\n")
    text ++= "\n]}\n"
    val p = new Path(outDir, ManifestName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(text.toString.getBytes("UTF-8")) finally out.close()
    m
  }

  /** Parse the manifest back (hand-rolled like the writer — the format
    * is ours, one file object per line between the header/footer lines).
    */
  def readManifest(spark: SparkSession, dir: String): SkipManifest = {
    val p = new Path(dir, ManifestName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    def corrupt(why: String): Nothing =
      throw new IllegalStateException(s"corrupt skip manifest $p: $why")
    val ColsRe = """\{"cols":\[([^\]]*)\],"files":\[""".r
    val FileRe = """\{"file":"([^"]+)","rows":(\d+),"mins":\[([^\]]*)\],"maxs":\[([^\]]*)\]\},?""".r
    val lines = text.linesIterator.map(_.trim).filter(_.nonEmpty).toVector
    if (lines.isEmpty) corrupt("empty")
    val cols = lines.head match {
      case ColsRe(cs) => cs.split(',').map(_.stripPrefix("\"").stripSuffix("\"")).toIndexedSeq
      case _ => corrupt(s"bad header '${lines.head}'")
    }
    def longs(s: String): Seq[Long] =
      if (s.isEmpty) Nil
      else s.split(',').map { x =>
        try x.toLong
        catch { case _: NumberFormatException => corrupt(s"non-long '$x'") }
      }.toIndexedSeq
    val files = lines.tail.dropRight(1).map {
      case FileRe(f, r, mi, ma) =>
        val (mins, maxs) = (longs(mi), longs(ma))
        if (mins.length != cols.length || maxs.length != cols.length)
          corrupt(s"file '$f' stats arity != ${cols.length}")
        FileStats(f, r.toLong, mins, maxs)
      case l => corrupt(s"bad file line '$l'")
    }
    SkipManifest(cols, files)
  }

  /** Range query with file skipping: keep only the files whose
    * [min, max] intersects EVERY bound, read just those, and apply the
    * residual predicate. `bounds` are inclusive (col, lo, hi) on
    * manifest stats columns. Result == full-scan filter, always; the
    * layout only decides how many files the listing keeps.
    */
  def readPruned(spark: SparkSession, dir: String,
      bounds: Seq[(String, Long, Long)]): DataFrame = {
    require(bounds.nonEmpty, "bounds must be non-empty")
    val m = readManifest(spark, dir)
    val idx = bounds.map { case (c, _, _) =>
      val i = m.cols.indexOf(c)
      require(i >= 0, s"column '$c' has no stats in $dir/$ManifestName " +
        s"(stats cols: ${m.cols.mkString(", ")})")
      i
    }
    val keep = m.files.filter(f => bounds.zip(idx).forall {
      case ((_, lo, hi), i) => f.maxs(i) >= lo && f.mins(i) <= hi
    })
    val residual = bounds.map { case (c, lo, hi) =>
      col(c).between(lo, hi)
    }.reduce(_ && _)
    if (keep.isEmpty)
      // schema-only: lists the directory once, reads no data (limit 0)
      spark.read.parquet(dir).filter(residual).limit(0)
    else
      spark.read.parquet(keep.map(f => s"$dir/${f.file}"): _*).filter(residual)
  }
}
