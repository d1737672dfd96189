package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Targeted delete-by-key over a stats-manifested parquet directory
  * ([[DataSkipping]]): the erasure/right-to-be-forgotten primitive.
  *
  * A naive delete rewrites the whole table to remove a handful of keys.
  * With the per-file min/max manifest, only files whose key RANGE can
  * contain a listed key are touched — on a layout clustered by the key
  * (the [[DataSkipping.writeWithStats]] contract) that is a few files
  * out of thousands, so erasure cost tracks the erasure list, not the
  * table. Untouched files stay byte-identical, which also means their
  * downstream caches/replicas stay valid.
  *
  * Each hit file is rewritten write-aside-then-swap (temp dir is
  * dot-prefixed, so directory readers never see it; the repo's
  * single-writer discipline — see DataSkipping's scaladoc); a file
  * whose every row is doomed is deleted outright. The manifest is
  * rebuilt afterwards so subsequent pruned reads see the new stats.
  *
  * NULL keys are never deleted: a NULL can't equal a listed key, and
  * the keep-predicate says so explicitly because `!isin` alone would
  * evaluate to NULL and silently drop them — the suite pins this.
  *
  * The driver loop is manifest-sized (hit files only); each iteration
  * reads one file twice (count + rewrite), both file-local and
  * column-complete by necessity (the file is being rewritten).
  */
object Erasure {

  /** @param filesTotal     files in the manifest before erasure
    * @param filesRewritten hit files rewritten with survivors
    * @param filesDeleted   hit files removed entirely (no survivors)
    * @param rowsDeleted    total rows erased
    */
  final case class ErasureReport(filesTotal: Int, filesRewritten: Int,
      filesDeleted: Int, rowsDeleted: Long)

  /** Erase every row whose `keyCol` (long) appears in `keys`. */
  def deleteKeys(spark: SparkSession, dir: String, keyCol: String,
      keys: Seq[Long]): ErasureReport = {
    require(keys.nonEmpty, "keys must be non-empty")
    val m = DataSkipping.readManifest(spark, dir)
    val i = m.cols.indexOf(keyCol)
    require(i >= 0, s"column '$keyCol' has no stats in $dir/" +
      s"${DataSkipping.ManifestName} (stats cols: ${m.cols.mkString(", ")})")
    val hits = m.files.filter(f => keys.exists(k => k >= f.mins(i) && k <= f.maxs(i)))
    if (hits.isEmpty) return ErasureReport(m.files.size, 0, 0, 0L)
    val conf = spark.sessionState.newHadoopConf()
    var rewritten = 0
    var deletedFiles = 0
    var rowsDeleted = 0L
    val keep = col(keyCol).isNull || !col(keyCol).isin(keys: _*)
    hits.foreach { f =>
      val target = new Path(dir, f.file)
      val fs = target.getFileSystem(conf)
      val survivors = spark.read.parquet(target.toString).filter(keep)
      val keptRows = survivors.count()
      rowsDeleted += f.rows - keptRows
      if (keptRows == 0) {
        fs.delete(target, false): Unit
        deletedFiles += 1
      } else if (keptRows < f.rows) {
        val tmp = new Path(dir, s".erasure_tmp_${f.file}")
        survivors.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        val part = fs.listStatus(tmp).map(_.getPath)
          .find(_.getName.startsWith("part-"))
          .getOrElse(throw new IllegalStateException(s"no part file under $tmp"))
        fs.delete(target, false): Unit
        fs.rename(part, target): Unit
        fs.delete(tmp, true): Unit
        rewritten += 1
      }
      // keptRows == f.rows: a range hit with no actual key present —
      // the file is left untouched (and uncounted), not rewritten
    }
    DataSkipping.writeManifest(spark, dir, m.cols): Unit
    ErasureReport(m.files.size, rewritten, deletedFiles, rowsDeleted)
  }
}
