package graft.sinks

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Targeted delete-by-key over a stats-manifested parquet directory
  * ([[DataSkipping]]): the erasure/right-to-be-forgotten primitive.
  *
  * A naive delete rewrites the whole table to remove a handful of keys.
  * With the per-file manifest, only files that might contain a listed
  * key are touched — by min/max range on a layout-clustered long key
  * (the [[DataSkipping.writeWithStats]] contract), by Bloom sidecar on
  * any other key (including strings), or the intersection when both
  * exist — a few files out of thousands, so erasure cost tracks the
  * erasure list, not the table. That contract now holds END TO END: the
  * manifest refresh is [[DataSkipping.patchManifest]], which recomputes
  * stats only for the files this run actually rewrote (a file-local,
  * column-pruned pass over just those paths), drops deleted files'
  * entries, and keeps every other entry verbatim. Untouched files are
  * never re-read and stay byte-identical, which also means their
  * downstream caches/replicas stay valid.
  *
  * Each hit file is rewritten write-aside-then-swap; the swap is a
  * single rename-with-OVERWRITE of the rewritten file onto the target
  * (`FileContext.rename(…, Options.Rename.OVERWRITE)`), so there is no
  * window where the survivors exist only in the temp dir: a crash
  * before the rename leaves the ORIGINAL file (and manifest) fully
  * intact — the erasure simply hasn't happened yet for that file and a
  * rerun completes it. Leftover dot-prefixed `.erasure_tmp_*` dirs from
  * a crashed run are invisible to directory readers and are swept at
  * the start of the next run. A file whose every row is doomed is
  * deleted outright — but only AFTER the manifest commit that drops its
  * entry (delete-last, so no crash window can strand a manifest
  * referencing a missing file); if EVERY file empties, the patch writes
  * an empty manifest rather than failing schema inference on an empty
  * dir.
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
      keys: Seq[Long]): ErasureReport =
    delete(spark, dir, keyCol, keys)

  /** Erase every row whose `keyCol` equals one of `keys` (Long or
    * String — string keys require a Bloom sidecar in the manifest,
    * since min/max stats are long-only).
    */
  def delete(spark: SparkSession, dir: String, keyCol: String,
      keys: Seq[Any]): ErasureReport = {
    require(keys.nonEmpty, "keys must be non-empty")
    val base = DataSkipping.currentVersion(spark, dir) // writer-fence base
    val m = DataSkipping.readManifest(spark, dir)
    val conf = spark.sessionState.newHadoopConf()
    sweepStaleTmp(new Path(dir), conf)
    val hits = DataSkipping.candidateFiles(m, keyCol, keys,
      s"$dir/${DataSkipping.ManifestName}")
    if (hits.isEmpty) return ErasureReport(m.files.size, 0, 0, 0L)
    val (removedFiles, rewrittenFiles, rowsDeleted) =
      dropKeyRows(spark, dir, hits, keyCol, keys)
    DataSkipping.patchManifest(spark, dir, removedFiles, rewrittenFiles,
      Some(base)): Unit
    // right-to-be-forgotten truncates the version LOG too: older
    // manifests reference pre-erasure files and carry the erased keys'
    // min/max/Bloom metadata — forgetting must forget history
    DataSkipping.truncateVersions(spark, dir)
    // wholly-emptied files delete LAST, after the commit (delete-last
    // protocol): a crash before the commit leaves them manifest-listed
    // and intact; after it they are orphans pruned reads ignore
    deleteFiles(dir, removedFiles, conf)
    ErasureReport(m.files.size, rewrittenFiles.size, removedFiles.size, rowsDeleted)
  }

  /** Retention / TTL enforcement — erase every row whose `keyCol` (a
    * long stats column, typically event-time micros) falls in the
    * INCLUSIVE [lo, hi] range: "delete everything older than the
    * retention horizon" as a listing-sized decision. NULL keys survive
    * (a NULL satisfies no range predicate), matching [[delete]].
    *
    * Three file classes, decided from the manifest alone:
    *  - disjoint range → untouched, never read;
    *  - wholly inside [lo, hi] with a KNOWN-ZERO null count → deleted
    *    from the listing WITHOUT reading a byte (min/max ignore NULLs,
    *    so only the recorded null count proves no NULL row hides
    *    inside; legacy manifests without null counts stay conservative
    *    and take the rewrite path);
    *  - straddling (or null-count-unknown) → survivors rewrite via the
    *    same atomic-overwrite swap as key erasure.
    *
    * For the dominant retention shape — time-clustered store, horizon
    * sweeping forward — almost every doomed file is wholly doomed, so
    * the cost is file deletes + a boundary file's rewrite, never a
    * table scan.
    */
  def deleteRange(spark: SparkSession, dir: String, keyCol: String,
      lo: Long, hi: Long): ErasureReport = {
    require(lo <= hi, s"lo=$lo must be <= hi=$hi")
    val base = DataSkipping.currentVersion(spark, dir) // writer-fence base
    val m = DataSkipping.readManifest(spark, dir)
    val si = m.cols.indexOf(keyCol)
    require(si >= 0, s"column '$keyCol' has no range stats in " +
      s"$dir/${DataSkipping.ManifestName} (stats cols: ${m.cols.mkString(", ")})")
    val conf = spark.sessionState.newHadoopConf()
    sweepStaleTmp(new Path(dir), conf)
    val hits = m.files.filter(f => f.maxs(si) >= lo && f.mins(si) <= hi)
    if (hits.isEmpty) return ErasureReport(m.files.size, 0, 0, 0L)
    val (whole, partial) = hits.partition(f =>
      f.mins(si) >= lo && f.maxs(si) <= hi &&
        f.nulls.nonEmpty && f.nulls(si) == 0L)
    val keep = col(keyCol).isNull || !col(keyCol).between(lo, hi)
    val (removed, rewritten, partialRows) = dropRows(spark, dir, partial, keep)
    val rowsDeleted = partialRows + whole.map(_.rows).sum
    // the COMMIT comes first; ALL doomed files (listing-decided wholes
    // AND rewrite-path files that emptied) delete AFTER it — the
    // store's delete-last protocol (compaction step 4): a crash before
    // the commit leaves the manifest and files consistent (the erasure
    // simply hasn't happened for those files), a crash after it leaves
    // post-commit orphans that manifest-driven reads already ignore
    // and the next maintenance entry sweeps. Deleting first would let
    // a crash strand a manifest that references missing files — every
    // pruned read of the store would then fail. (Straddling files
    // rewrite in place BEFORE the commit; a crash in that window
    // leaves their manifest stats stale-but-safe — a superset, so
    // pruned reads stay exact — but fsck checkRows will report a
    // rowMismatch until the rerun completes; see [[DataSkipping.fsck]].)
    DataSkipping.patchManifest(spark, dir,
      whole.map(_.file) ++ removed, rewritten, Some(base)): Unit
    DataSkipping.truncateVersions(spark, dir)
    deleteFiles(dir, whole.map(_.file) ++ removed, conf)
    ErasureReport(m.files.size, rewritten.size,
      whole.size + removed.size, rowsDeleted)
  }

  /** The shared drop-rows-by-key rewrite loop ([[delete]] and
    * [[DataSkipping.upsertKeys]]): for each candidate file, survivors
    * rewrite IN PLACE via the atomic-overwrite swap (the target always
    * holds either the old complete file or the new complete one),
    * false-positive hits stay untouched. Returns
    * (removed, rewritten, rowsDropped) WITHOUT committing OR deleting:
    * the caller owns the manifest commit so it can fold more changes
    * into one, and it must physically delete the removed files ONLY
    * AFTER that commit ([[deleteFiles]] — the delete-last protocol).
    */
  private[sinks] def dropKeyRows(spark: SparkSession, dir: String,
      hits: Seq[DataSkipping.FileStats], keyCol: String,
      keys: Seq[Any]): (List[String], List[String], Long) =
    dropRows(spark, dir, hits,
      col(keyCol).isNull || !col(keyCol).isin(keys: _*))

  /** Rewrite each candidate file to its `keep`-satisfying survivors —
    * the predicate-generic core of [[dropKeyRows]] and [[deleteRange]].
    *
    * A file whose EVERY row is doomed is NOT deleted here: it is only
    * reported in the removed list, and the caller physically deletes it
    * AFTER its manifest commit (the store's delete-last protocol).
    * Deleting pre-commit would let a crash in the window strand a
    * manifest that still references the missing file — every pruned
    * read would then fail. Pre-commit the original file stays on disk
    * and manifest-listed (reads consistent); post-commit it is an
    * orphan that manifest-driven reads already ignore and the caller
    * (or the next maintenance entry's sweep) removes.
    */
  private def dropRows(spark: SparkSession, dir: String,
      hits: Seq[DataSkipping.FileStats],
      keep: org.apache.spark.sql.Column): (List[String], List[String], Long) = {
    val conf = spark.sessionState.newHadoopConf()
    var rewrittenFiles = List.empty[String]
    var removedFiles = List.empty[String]
    var rowsDeleted = 0L
    hits.foreach { f =>
      val target = new Path(dir, f.file)
      val fs = target.getFileSystem(conf)
      val survivors = spark.read.parquet(target.toString).filter(keep)
      val keptRows = survivors.count()
      rowsDeleted += f.rows - keptRows
      if (keptRows == 0) {
        removedFiles ::= f.file
      } else if (keptRows < f.rows) {
        val tmp = new Path(dir, s".erasure_tmp_${f.file}")
        survivors.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        val part = fs.listStatus(tmp).map(_.getPath)
          .find(_.getName.startsWith("part-"))
          .getOrElse(throw new IllegalStateException(s"no part file under $tmp"))
        // atomic-overwrite swap: the target always holds either the old
        // complete file or the new complete file, never neither
        val fc = FileContext.getFileContext(fs.getUri, conf)
        fc.rename(part, target, Options.Rename.OVERWRITE)
        fs.delete(tmp, true): Unit
        rewrittenFiles ::= f.file
      }
      // keptRows == f.rows: a range/bloom hit with no actual key present
      // (false positive) — the file is left untouched (and uncounted)
    }
    (removedFiles, rewrittenFiles, rowsDeleted)
  }

  /** Post-commit physical delete of files a drop pass emptied (and,
    * for [[deleteRange]], the listing-decided wholly-doomed set) — the
    * last step of every erasure/upsert, strictly AFTER the manifest
    * commit that stopped referencing them.
    */
  private[sinks] def deleteFiles(dir: String, files: Seq[String],
      conf: org.apache.hadoop.conf.Configuration): Unit =
    files.foreach { n =>
      val target = new Path(dir, n)
      target.getFileSystem(conf).delete(target, false): Unit
    }

  /** Remove `.erasure_tmp_*` leftovers of a crashed prior run: their
    * targets were never overwritten (the rename is the last step), so
    * the temp contents are stale garbage, not the only copy of data.
    */
  private def sweepStaleTmp(dir: Path, conf: org.apache.hadoop.conf.Configuration): Unit = {
    val fs = dir.getFileSystem(conf)
    if (fs.exists(dir))
      fs.listStatus(dir).map(_.getPath)
        .filter(_.getName.startsWith(".erasure_tmp_"))
        .foreach(p => fs.delete(p, true): Unit)
  }
}
