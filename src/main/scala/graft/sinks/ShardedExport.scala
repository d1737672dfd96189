package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic training-shard export: the dataset-layout sink of a
  * pretraining pipeline (fixed shard count, stable shard membership,
  * reproducible file contents — what a data loader shuffles over and a
  * backfill must reproduce byte-for-byte).
  *
  * Shard assignment is the PORTABLE id hash mod `numShards`
  * ([[graft.llm.Dedup.hash32]] — md5-prefix, never Spark's partitioner
  * or `rand()`), so a document's shard survives retries, cluster
  * resizes, and engine swaps. The frame repartitions on the shard
  * column with the partition count ALIGNED to the shard count: hashing
  * shard ids into the default shuffle-partition count lets two shards
  * land in one task (serializing their writes while other tasks idle —
  * invisible at 8 shards, a straggler at 10k); with `numShards`
  * partitions the skew is bounded to hash collisions, and `partitionBy`
  * still writes exactly one file per shard directory (the co-location
  * rule; without co-location each of N tasks would open a file per
  * shard it touches: N·numShards tiny files). Rows inside a shard are
  * sorted by id, making file contents deterministic, not just file
  * membership.
  *
  * Every export also writes an `_manifest.json` (shard → rows, bytes,
  * md5 of the shard's data bytes): a loader verifies an export's
  * integrity — or a mirror's — by hashing files, without decoding a
  * single parquet page. The underscore name keeps Spark's directory
  * reader from treating it as data.
  *
  * Size `numShards` so a shard fits an executor's write buffer at the
  * target corpus (shards ≈ corpus_bytes / desired_file_size); a loader
  * wanting more read parallelism than files can over-shard cheaply —
  * the cost is one shuffle either way.
  */
object ShardedExport {

  val ManifestName = "_manifest.json"

  final case class ManifestEntry(shard: Long, n_rows: Long, n_bytes: Long, md5: String)

  /** Write `df` under `outDir/shard=K/` (one sorted parquet file per
    * shard) plus `outDir/_manifest.json`, overwriting a previous
    * export — the reproducibility contract is that the same frame and
    * shard count always produce the same layout and bytes.
    *
    * @return the manifest, ordered by shard
    */
  def write(df: DataFrame, idCol: String, outDir: String, numShards: Int): Seq[ManifestEntry] = {
    require(numShards >= 1, "numShards must be >= 1")
    df.withColumn("shard",
        graft.llm.Dedup.hash32(col(idCol).cast("string")) % numShards)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(outDir)
    writeManifest(df.sparkSession, outDir)
  }

  /** JSONL variant of [[write]] — the interchange format a tokenizer /
    * loader fleet actually consumes (one JSON object per line, shard
    * directories, same portable hash membership and same manifest).
    * Rows serialize via `to_json(struct(cols...))` — field order is the
    * frame's column order, so the byte layout is deterministic — and
    * sort by the serialized line within each shard (the line embeds the
    * leading id field, so this is id order with a total tie-break).
    * Callers keep doubles out of exported frames (JSON float text is
    * engine-specific); ints/longs/strings round-trip exactly.
    *
    * @return the manifest, ordered by shard
    */
  def writeJsonl(df: DataFrame, idCol: String, outDir: String, numShards: Int): Seq[ManifestEntry] = {
    require(numShards >= 1, "numShards must be >= 1")
    df.withColumn("shard",
        graft.llm.Dedup.hash32(col(idCol).cast("string")) % numShards)
      .withColumn("__line", to_json(struct(df.columns.map(col): _*)))
      .select(col("shard"), col("__line"))
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__line"))
      .write.mode(SaveMode.Overwrite).partitionBy("shard").text(outDir)
    writeManifestFor(df.sparkSession, outDir, ".txt",
      df.sparkSession.read.text(outDir))
  }

  /** Build and write the manifest for an existing export: per-shard row
    * counts from ONE metadata-weight aggregation over the written files
    * (the scan projects only the `shard` partition column — no data
    * pages), bytes and md5 from a driver-side stream over each shard's
    * data files (numShards files — the unit the export was sized in).
    * Files within a shard are hashed in name order, so the digest is
    * stable for any fixed layout.
    */
  def writeManifest(spark: SparkSession, outDir: String): Seq[ManifestEntry] =
    writeManifestFor(spark, outDir, ".parquet", spark.read.parquet(outDir))

  private def writeManifestFor(spark: SparkSession, outDir: String,
      dataSuffix: String, readBack: DataFrame): Seq[ManifestEntry] = {
    import org.apache.hadoop.fs.Path
    val rows = readBack
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_rows"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val root = new Path(outDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val entries = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("shard="))
      .sortBy(_.getPath.getName.stripPrefix("shard=").toLong)
      .map { d =>
        val shard = d.getPath.getName.stripPrefix("shard=").toLong
        val files = fs.listStatus(d.getPath)
          .filter(_.getPath.getName.endsWith(dataSuffix))
          .sortBy(_.getPath.getName)
        val md = java.security.MessageDigest.getInstance("MD5")
        val buf = new Array[Byte](64 * 1024)
        var nBytes = 0L
        files.foreach { f =>
          nBytes += f.getLen
          val in = fs.open(f.getPath)
          try {
            var n = in.read(buf)
            while (n > 0) { md.update(buf, 0, n); n = in.read(buf) }
          } finally in.close()
        }
        val hex = md.digest().map(b => f"$b%02x").mkString
        ManifestEntry(shard, rows.getOrElse(shard, 0L), nBytes, hex)
      }.toSeq
    val out = fs.create(new Path(root, ManifestName), true)
    try {
      entries.foreach { e =>
        out.write(
          s"""{"shard":${e.shard},"n_rows":${e.n_rows},"n_bytes":${e.n_bytes},"md5":"${e.md5}"}\n"""
            .getBytes("UTF-8"))
      }
    } finally out.close()
    entries
  }

  /** Parse an export's `_manifest.json` back into entries. */
  def readManifest(spark: SparkSession, outDir: String): Seq[ManifestEntry] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(outDir, ManifestName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val Line =
      """\{"shard":(\d+),"n_rows":(\d+),"n_bytes":(\d+),"md5":"([0-9a-f]{32})"\}""".r
    text.linesIterator.filter(_.nonEmpty).map {
      case Line(s, r, b, m) => ManifestEntry(s.toLong, r.toLong, b.toLong, m)
      case other => throw new IllegalArgumentException(s"bad manifest line: $other")
    }.toSeq
  }
}
