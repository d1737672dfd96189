package graft.sinks

import java.util.Base64

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.BloomAgg

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
  * each stats column, plus an optional per-file Bloom filter per
  * `bloomCols` entry ([[graft.functions.BloomAgg]]) for columns the
  * layout does NOT cluster — min/max ranges on those overlap across
  * every file, but a Bloom still answers point lookups (and erasure
  * lists, [[Erasure]]) with no false negatives. The manifest is
  * file-count-sized — driver metadata, exactly what a table format keeps
  * in its log.
  *
  * Read side: [[readPruned]] intersects range bounds against the
  * manifest DRIVER-SIDE (a metadata decision, like partition pruning);
  * [[readPrunedKeys]] does the same for a key LIST, consulting the
  * Bloom sidecar when the key column has one. Only surviving files are
  * handed to the reader, and the residual predicate still applies — so
  * the result is EXACTLY the full scan's filter, independent of layout
  * quality: a bad layout skips nothing but never returns a wrong row.
  * Stats min/max ignore NULLs (files recording no non-null value are
  * always skippable: a NULL never satisfies a range predicate), and the
  * Bloom fold skips NULLs for the same reason.
  *
  * Maintenance is HIT-SIZED: [[patchManifest]] recomputes stats only
  * for files an erasure/compaction/append actually touched (a file-local
  * pass over just those paths), drops deleted entries, and keeps every
  * other entry verbatim — so refreshing the manifest after deleting 5
  * keys never re-reads the other 99.99% of a 100 TB table.
  *
  * Versioning / time travel: every manifest commit also lands as an
  * append-only `_skip_manifest.vNNNNN.json`, so [[readPrunedAt]] serves
  * "the table as of commit N" as a pure metadata decision — the
  * Delta/Iceberg snapshot read on a plain parquet directory. At or
  * above [[deltaThreshold]] entries the log is CHECKPOINTED (round
  * 16): a commit writes a KB-sized DELTA version file (dropped names +
  * added entries) and a tiny `{"redirect":v}` latest pointer, with a
  * full checkpoint every [[checkpointEvery]]-th version (and on every
  * erasure, recluster, or stats-config change), so per-commit metadata
  * cost tracks the touched-file list — measured at 1M entries:
  * 4.3 s full rewrite vs 0.3 s delta commit — while reads reconstruct
  * checkpoint + ≤K deltas at the same cost as the old full parse.
  * Below the threshold the single-file format is byte-identical to
  * the legacy layout.
  *
  * TOMBSTONED DELETES (round 16): rewrite-shaped maintenance
  * (upsert, compaction, recluster) never physically deletes the files
  * it replaces. Post-commit they become TOMBSTONES — on disk,
  * referenced by OLDER version manifests, absent from the latest — so
  * a concurrent reader that planned its scan from the previous
  * manifest (or a [[readPrunedAt]] time-travel read) keeps every file
  * it needs until [[vacuumVersions]] expires that history: vacuum is
  * the ONLY physical deleter (the Delta/Iceberg VACUUM-retention
  * model). The single exception is [[Erasure]]: right-to-be-forgotten
  * must forget NOW, so erasure deletes its doomed files immediately,
  * TRUNCATES the log outright (old manifests carry the erased keys'
  * min/max/Bloom metadata), and clears every tombstone (an old row
  * version of an erased key may live in a replaced file). Erasure is
  * therefore the one op after which older snapshots die; everything
  * else keeps history serveable until vacuum.
  *
  * Single-writer discipline as everywhere in this package — and since
  * round 14 it is ENFORCED, not just documented: every commit is a
  * compare-and-swap on the version log (the version file is created
  * atomically no-overwrite, and maintenance operations pass the version
  * they read at as the fence base), so of two interleaving writers
  * exactly one commits and the other throws
  * `ConcurrentModificationException` before the latest pointer moves —
  * re-read and re-run is the loser's recovery. The manifest describes
  * the directory as of its write; patch it after any append/compaction
  * (stats collection is idempotent).
  */
object DataSkipping {

  val ManifestName = "_skip_manifest.json"

  /** Versioned manifest names: every manifest COMMIT also lands as
    * `_skip_manifest.v00001.json`, `v00002`, ... — an append-only
    * metadata log next to the mutable latest pointer. Metadata-sized
    * (one JSON file per commit), so the log costs nothing at 100 TB.
    */
  private[sinks] def versionName(v: Long): String = f"_skip_manifest.v$v%05d.json"
  private val VersionRe = """_skip_manifest\.v(\d+)\.json""".r
  // both quarantine spellings recoverLog produces: plain '.corrupt'
  // and the stamped fallback '.corrupt.<millis>'
  private val CorruptSuffixRe = """\.corrupt(\.\d+)?$""".r

  val DefaultBloomExpected = 100000L
  val DefaultBloomFpp = 0.01

  /** Per-file stats: `mins`/`maxs`/`nulls` align with the manifest's
    * `cols`, `blooms` (base64-serialized [[BloomFilter]]s) with
    * `bloomCols`. A file with zero non-null values in a column records
    * (Long.MaxValue, Long.MinValue) — an empty range nothing intersects.
    * `nulls` (per-column NULL counts — what lets a range DELETE drop a
    * wholly-in-range file from the listing without reading it: min/max
    * ignore NULLs, so only a known-zero null count proves no NULL row
    * hides inside) is `Nil` on legacy manifests, meaning UNKNOWN —
    * consumers must then stay conservative ([[Erasure.deleteRange]]
    * rewrites instead of blind-deleting).
    */
  final case class FileStats(file: String, rows: Long, mins: Seq[Long], maxs: Seq[Long],
      blooms: Seq[String] = Nil, nulls: Seq[Long] = Nil,
      origin: String = "") {
    /** Decode the i-th Bloom sidecar (aligned with `bloomCols`). */
    def bloom(i: Int): BloomFilter =
      BloomFilter.readFrom(Base64.getDecoder.decode(blooms(i)))
    /** True when this file's content is a REWRITE of rows already
      * committed at the previous version under other names (upsert
      * survivor stage, compaction, recluster) rather than newly
      * ingested rows — the provenance bit that lets
      * [[changesBetween]] emit TRUE-DELTA feeds instead of
      * re-asserting rewritten content.
      */
    def isRewrite: Boolean = origin == OriginRewrite
  }

  /** `origin` value for files whose rows were already committed at the
    * previous version under other names. "" (legacy manifests and
    * freshly ingested files) means new content.
    */
  val OriginRewrite = "rewrite"

  /** `bloomExpected`/`bloomFpp` record the sidecar sizing so a patch
    * rebuilds rewritten files' filters with the original parameters.
    */
  final case class SkipManifest(cols: Seq[String], files: Seq[FileStats],
      bloomCols: Seq[String] = Nil,
      bloomExpected: Long = DefaultBloomExpected,
      bloomFpp: Double = DefaultBloomFpp)

  /** Layout-placement hint for the [[writeWithStats]] family: the
    * layout key is KNOWN uniform over `[lo, hi]` (a hash, by
    * construction — e.g. [[graft.llm.Dedup.hash32]]'s md5 prefix over
    * [0, 2³²)). [[clustered]] then places fixed-width key ranges
    * directly instead of letting `repartitionByRange`'s
    * RangePartitioner SAMPLE its input: the sample executes the whole
    * child plan one extra time to learn quantiles the caller already
    * knows (for an aggregated child — the inverted-index postings
    * build — that is a full re-run of the aggregation's reduce stage).
    * Files stay disjoint sorted key ranges, so manifest pruning works
    * exactly as with sampled ranges; only the boundary positions
    * differ (fixed-width vs sampled quantiles — equivalent for a
    * uniform key).
    */
  final case class UniformKey(lo: Long, hi: Long) {
    require(hi > lo && hi - lo + 1 > 0, s"UniformKey range [$lo, $hi] invalid")
  }

  /** The [[UniformKey]] span of a 32-bit hash key ([0, 2³²)). */
  val Hash32Key: UniformKey = UniformKey(0L, 0xFFFFFFFFL)

  /** Write `df` to `outDir` clustered on `layoutKey` in ~`numFiles`
    * range-partitioned, internally sorted files, then collect per-file
    * min/max of `statsCols` (long-valued columns) — and a per-file
    * Bloom filter for each of `bloomCols` (long or string) — into the
    * skip manifest. Returns the manifest, ordered by file name.
    *
    * `numFiles` sizes files for the target corpus (bytes / ~128 MB);
    * the stats pass reads only the stats+bloom columns (column-pruned)
    * once. Size `bloomExpected` to the per-file distinct count.
    */
  def writeWithStats(df: DataFrame, outDir: String, layoutKey: Column,
      numFiles: Int, statsCols: Seq[String], bloomCols: Seq[String] = Nil,
      bloomExpected: Long = DefaultBloomExpected,
      bloomFpp: Double = DefaultBloomFpp,
      uniform: Option[UniformKey] = None): SkipManifest = {
    require(numFiles >= 1, "numFiles must be >= 1")
    require(statsCols.nonEmpty, "statsCols must be non-empty")
    clustered(df, layoutKey, numFiles, uniform)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    writeManifest(df.sparkSession, outDir, statsCols, bloomCols, bloomExpected, bloomFpp)
  }

  /** The shared clustered-layout shape: ~`numFiles` range partitions on
    * the layout key, rows sorted by it within each. `numFiles == 1`
    * skips the range exchange — a RangePartitioner SAMPLES its input
    * with an extra pass over the child plan before the real shuffle,
    * which buys nothing when everything lands in one partition anyway
    * (single-file appends/upserts are the store's hottest write shape);
    * a plain 1-partition repartition + in-partition sort produces the
    * byte-identical single sorted file with one pass. A [[UniformKey]]
    * hint removes the sampling pass for `numFiles > 1` too: bucket
    * b = (key − lo) div width with width = ⌈span / numFiles⌉, routed to
    * partition b EXACTLY via [[partitionProxies]] — per-file ranges
    * are disjoint and sorted like the sampled layout's.
    */
  private def clustered(df: DataFrame, layoutKey: Column,
      numFiles: Int, uniform: Option[UniformKey] = None): DataFrame = {
    val keyed = df.withColumn("__layout", layoutKey)
    val parted =
      if (numFiles == 1) keyed.repartition(1)
      else uniform match {
        case Some(u) =>
          val width = (u.hi - u.lo) / numFiles + 1 // ceil: max bucket <= numFiles-1
          // clamp defends against out-of-contract key values; in-range
          // keys are untouched (bucket already in [0, numFiles-1])
          val bucket = expr(
            s"least(greatest(CAST((__layout - ${u.lo}) DIV $width AS INT), 0), ${numFiles - 1})")
          keyed.repartition(numFiles,
            element_at(lit(partitionProxies(numFiles)), bucket + lit(1)))
        case None => keyed.repartitionByRange(numFiles, col("__layout"))
      }
    parted.sortWithinPartitions(col("__layout")).drop("__layout")
  }

  /** For each bucket b in [0, n): an Int proxy value v with
    * pmod(murmur3_hash(v), n) == b, so `repartition(n, proxy(bucket))`
    * lands bucket b in shuffle partition b exactly. Computed by
    * evaluating Spark's OWN partition-id expression
    * (`Pmod(Murmur3Hash(v), n)` — what HashPartitioning evaluates per
    * row) driver-side, so the mapping cannot drift from the engine's.
    * Cached per n; the search tries small ints and needs ~n·ln n draws.
    */
  private val proxyCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Int]]()
  private[sinks] def partitionProxies(n: Int): Array[Int] =
    proxyCache.computeIfAbsent(n, _ => {
      import org.apache.spark.sql.catalyst.InternalRow
      import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash, Pmod}
      val proxies = new Array[Int](n)
      val found = new Array[Boolean](n)
      var remaining = n
      var v = 0
      while (remaining > 0) {
        // `new`: the auxiliary constructor supplies HashPartitioning's
        // default seed (42)
        val b = Pmod(new Murmur3Hash(Seq(Literal(v))), Literal(n))
          .eval(InternalRow.empty).asInstanceOf[Int]
        if (!found(b)) { found(b) = true; proxies(b) = v; remaining -= 1 }
        v += 1
      }
      proxies
    })

  /** Append a new batch to a stats-manifested directory, clustered on
    * the same layout key WITHIN the batch, then patch ONLY the new
    * files into the manifest ([[patchManifest]]) — the daily-ingest
    * path: cost is one pass over the batch, never a re-scan of the
    * table, and existing entries stay verbatim. Per-file ranges of the
    * new files may overlap the old ones' (each batch clusters
    * independently); [[Compaction]] is the periodic re-tighten.
    *
    * CONCURRENCY-SAFE BY CONSTRUCTION (the one maintenance op parallel
    * ingest genuinely runs in parallel):
    *  - the batch stages in a writer-unique dot-tmp dir, so two
    *    appends never share Spark's job staging (concurrent writes to
    *    ONE output path corrupt each other under FileOutputCommitter);
    *  - the commit registers exactly the file names THIS writer moved
    *    in — never a directory-listing diff, which could capture (and
    *    prematurely commit a partial view of) a neighbor's half-moved
    *    batch;
    *  - a writer that loses the commit CAS deletes ITS OWN moved files
    *    before rethrowing (the self-cleaning loser), so no orphan
    *    accumulates and no shared sweep — which could delete a
    *    neighbor's in-flight files — is ever needed. Wrap with
    *    [[withFenceRetry]] and independent appenders all commit,
    *    serialized by the CAS.
    */
  def appendWithStats(df: DataFrame, dir: String, layoutKey: Column,
      numFiles: Int, uniform: Option[UniformKey] = None): SkipManifest = {
    require(numFiles >= 1, "numFiles must be >= 1")
    val spark = df.sparkSession
    val base = currentVersion(spark, dir) // writer-fence base
    val moved = moveInClustered(spark, dir,
      s".append_tmp_${java.util.UUID.randomUUID()}", df, layoutKey, numFiles, uniform)
    try patchManifest(spark, dir, Nil, moved, Some(base))
    catch {
      case e: java.util.ConcurrentModificationException =>
        // lost the CAS: remove exactly OUR files (still orphans —
        // invisible to every reader) and let the caller retry clean
        Erasure.deleteFiles(dir, moved, spark.sessionState.newHadoopConf())
        throw e
    }
  }

  /** MERGE (upsert) a keyed batch into the store in ONE manifest
    * commit: rows whose key already exists are REPLACED (only
    * sidecar-candidate files rewritten — the [[Erasure]] machinery),
    * and the whole batch lands as fresh clustered files. Cost = hit
    * files + the batch, never the table.
    *
    * Contracts: the store and the batch are UNIQUE per `keyCol`
    * (enforced on the batch — a duplicate-keyed upsert is ambiguous);
    * NULL keys rejected; batch keys driver-collected, so batches are
    * update-list-sized (`maxKeys` guard — for bulk rewrites use
    * [[writeWithStats]]). Atomicity: EVERYTHING stages first — the
    * batch's files AND the hit files' survivor rewrites
    * ([[Erasure.stageDropRows]]) land as orphans invisible to
    * manifest-driven reads — and the single [[patchManifest]] CAS at
    * the end is the commit. A lost CAS (or a crash, or an abandoned
    * retry) therefore loses nothing: every committed file is still
    * byte-identical, and the loser deletes exactly its own staged
    * names before rethrowing. Replaced originals are NOT deleted:
    * they become tombstones (still referenced by older version
    * manifests) so concurrent readers pinned to the previous version
    * and time-travel reads survive the upsert; [[vacuumVersions]]
    * reclaims them when their history expires.
    */
  def upsertKeys(spark: SparkSession, dir: String, keyCol: String,
      updates: DataFrame, layoutKey: Column, numFiles: Int = 1,
      maxKeys: Int = 1000000): SkipManifest = {
    require(numFiles >= 1, "numFiles must be >= 1")
    val base = currentVersion(spark, dir) // writer-fence base
    val m = readManifestBase(spark, dir, base) // at the base, never the pointer
    val keyRows = updates.select(col(keyCol)).limit(maxKeys + 1).collect()
    require(keyRows.length <= maxKeys,
      s"update batch exceeds maxKeys=$maxKeys: upsertKeys is for " +
        "update-list-sized batches; bulk-rewrite via writeWithStats instead")
    require(keyRows.forall(_.get(0) != null), "update keys must be non-null")
    val keys = keyRows.map(_.get(0)).toIndexedSeq
    require(keys.distinct.length == keys.length,
      s"update batch must be unique per '$keyCol' (an ambiguous upsert)")
    // 1) STAGE matched keys' survivor rewrites as fresh orphan files —
    // no committed file is touched (a lost CAS must lose nothing)
    val hits = candidateFiles(m, keyCol, keys, s"$dir/$ManifestName")
    val d = Erasure.stageDropKeyRows(spark, dir, hits, keyCol, keys, m.cols)
    // 2) land the batch as orphan files (invisible to manifest reads),
    // staged in a writer-unique tmp dir and committed by NAME — the
    // same discipline as appendWithStats, so an upsert racing a
    // concurrent append never shares job staging and never captures
    // (or prematurely commits a partial view of) the appender's
    // half-moved batch
    val added = moveInClustered(spark, dir,
      s".append_tmp_${java.util.UUID.randomUUID()}", updates, layoutKey, numFiles)
    // 3) ONE CAS commit: replaced-out originals + staged survivors +
    // batch additions together
    val patched =
      try patchManifest(spark, dir, d.removed, d.replacedNew ++ added,
        Some(base), rewriteOrigin = d.replacedNew.toSet, known = Some(m))
      catch {
        case e: java.util.ConcurrentModificationException =>
          // lost the CAS: remove exactly OUR staged names (batch AND
          // survivor files — all still orphans); every committed file
          // is byte-identical, so the retry re-runs against the
          // winner's manifest with nothing lost
          Erasure.deleteFiles(dir, added ++ d.replacedNew,
            spark.sessionState.newHadoopConf())
          throw e
      }
    // 4) replaced/emptied ORIGINALS are NOT deleted: post-commit they
    // are tombstones — still referenced by the pre-upsert version
    // manifests, so a reader pinned to the previous version (a
    // long-running scan, a readPrunedAt) never loses a file mid-scan,
    // and the true-delta change feed keeps its chain readable.
    // vacuumVersions is the physical deleter.
    patched
  }

  /** Exactly-once epoch append — the streaming-ingest form of
    * [[appendWithStats]]: the batch's files carry the epoch id in their
    * names (`part-e<id>-...`), and the MANIFEST is the idempotence
    * ledger — an epoch is committed iff the manifest lists its files.
    * A retry of a committed epoch is a no-op; a retry after a crash
    * anywhere before the commit first sweeps the half-landed orphans
    * and re-runs. At-least-once delivery (Structured Streaming's
    * foreachBatch contract) therefore yields exactly-once store
    * content, the same argument as the streaming count-min store.
    */
  def appendEpoch(spark: SparkSession, dir: String, batch: DataFrame,
      layoutKey: Column, numFiles: Int, epochId: Long,
      uniform: Option[UniformKey] = None): SkipManifest = {
    require(numFiles >= 1, "numFiles must be >= 1")
    require(epochId >= 0, "epochId must be >= 0")
    val prefix = s"part-e$epochId-"
    val base = currentVersion(spark, dir) // writer-fence base
    val m = readManifestBase(spark, dir, base) // at the base, never the pointer
    if (m.files.exists(_.file.startsWith(prefix))) return m // committed
    // a crashed PRIOR attempt of THIS epoch may have half-landed files;
    // sweep exactly those (name-identified by the epoch prefix) and this
    // epoch's tmp dir — never the general orphan sweep, which cannot
    // tell crashed debris from a LIVE concurrent appendWithStats
    // writer's staged or just-moved pre-commit files. Epoch retries are
    // sequential by the foreachBatch contract, so "my prefix, not in
    // the manifest" is provably my own debris.
    val tmp = new Path(dir, s".epoch_tmp_$epochId")
    val fs = tmp.getFileSystem(spark.sessionState.newHadoopConf())
    listPartFiles(spark, dir).filter(_.startsWith(prefix))
      .foreach(n => fs.delete(new Path(dir, n), false): Unit)
    fs.delete(tmp, true): Unit
    clustered(batch, layoutKey, numFiles, uniform)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val moved = fs.listStatus(tmp).map(_.getPath)
      .filter(p => p.getName.startsWith("part-") && !p.getName.endsWith(".crc"))
      .map { p =>
        val name = prefix + p.getName.stripPrefix("part-")
        val dst = new Path(dir, name)
        fs.rename(p, dst): Unit
        touchAppeared(fs, dst)
        name
      }.toIndexedSeq.sorted
    fs.delete(tmp, true): Unit
    patchManifest(spark, dir, Nil, moved, Some(base), known = Some(m)) // the commit
  }

  /** Compact the store's SMALL files (manifest rows < `minRows`) into
    * `targetFiles` layout-sorted files, patching the manifest hit-sized:
    * big files' entries (and bytes) stay verbatim — compaction cost
    * tracks the small-file backlog, never the table.
    *
    * The MANIFEST is the commit point, which makes the protocol
    * crash-safe without a transaction log, PROVIDED reads go through
    * [[readPruned]]/[[readPrunedKeys]] (the store's contract: the
    * manifest defines the table; a bare `spark.read.parquet(dir)` over
    * a crashed-mid-compaction directory may see both generations):
    *
    *  1. new files write into a dot-prefixed tmp dir (invisible);
    *  2. they move into the directory — still ORPHANS (not in the
    *     manifest, so manifest-driven reads ignore them);
    *  3. [[patchManifest]] atomically swaps the small files' entries
    *     for the new files' (the commit);
    *  4. the old small files become TOMBSTONES — on disk, referenced
    *     by the pre-compaction version manifests, reclaimed only by
    *     [[vacuumVersions]] — so concurrent readers planned from the
    *     previous manifest and time-travel reads survive.
    *
    * A crash at any point leaves manifest-driven reads exact: before 3
    * the olds are listed and intact; after 3 the news are listed and
    * complete. The next run (or any maintenance entry) sweeps orphan
    * part files referenced by NO version before doing new work.
    */
  def compactSmallFiles(spark: SparkSession, dir: String, layoutKey: Column,
      minRows: Long, targetFiles: Int = 1): SkipManifest = {
    require(targetFiles >= 1, "targetFiles must be >= 1")
    sweepOrphans(spark, dir)
    val base = currentVersion(spark, dir) // writer-fence base
    val m = readManifestBase(spark, dir, base) // at the base, never the pointer
    val smalls = m.files.filter(_.rows < minRows)
    if (smalls.size <= 1) return m
    val moved = moveInClustered(spark, dir, ".compact_tmp",
      spark.read.parquet(smalls.map(f => s"$dir/${f.file}"): _*),
      layoutKey, targetFiles)
    val patched =
      try patchManifest(spark, dir, smalls.map(_.file), moved,
        Some(base), rewriteOrigin = moved.toSet, known = Some(m)) // commit
      catch {
        case e: java.util.ConcurrentModificationException =>
          // self-cleaning loser (the appendWithStats discipline): our
          // moved files are still orphans; the age-gated sweep won't
          // collect young debris for us, so delete exactly our names
          Erasure.deleteFiles(dir, moved, spark.sessionState.newHadoopConf())
          throw e
      }
    // the replaced smalls stay as tombstones (older versions still
    // reference them); vacuumVersions reclaims them with their history
    patched
  }

  /** LAYOUT EVOLUTION — re-cluster the store on a NEW layout key (and a
    * new stats/bloom configuration): the move a table makes when its
    * query pattern changes after years of appends (Iceberg's
    * partition-spec evolution, Delta's re-OPTIMIZE ZORDER BY). The whole
    * table rewrites — that cost is the operation's definition — but the
    * COMMIT protocol is compaction's, so manifest-driven reads stay
    * exact through any crash:
    *
    *  1. the current manifest's files re-cluster into a dot-prefixed
    *     tmp dir (range-partition + sort on the new key);
    *  2. new files move in as ORPHANS (absent from the manifest);
    *  3. ONE manifest write swaps the entire file set AND the stats
    *     config to the new key (the commit);
    *  4. old files become tombstones (the whole previous generation —
    *     disk temporarily doubles, the documented recluster cost),
    *     reclaimed by [[vacuumVersions]] when their history expires.
    *
    * After the commit, range/point pruning on the NEW key shrinks the
    * listing the way the old key used to. The version log records the
    * commit; pre-recluster snapshots stay serveable until vacuum.
    */
  def recluster(spark: SparkSession, dir: String, layoutKey: Column,
      numFiles: Int, statsCols: Seq[String], bloomCols: Seq[String] = Nil,
      bloomExpected: Long = DefaultBloomExpected,
      bloomFpp: Double = DefaultBloomFpp): SkipManifest = {
    require(numFiles >= 1, "numFiles must be >= 1")
    require(statsCols.nonEmpty, "statsCols must be non-empty")
    sweepOrphans(spark, dir)
    val base = currentVersion(spark, dir) // writer-fence base
    val old = readManifestBase(spark, dir, base) // at the base, never the pointer
    if (old.files.isEmpty) {
      val m = SkipManifest(statsCols, Vector.empty, bloomCols, bloomExpected, bloomFpp)
      writeManifestFile(spark, dir, m, Some(base))
      return m
    }
    val moved = moveInClustered(spark, dir, ".recluster_tmp",
      spark.read.parquet(old.files.map(f => s"$dir/${f.file}"): _*),
      layoutKey, numFiles)
    val fresh = statsFor(spark, moved.map(f => s"$dir/$f"),
      statsCols, bloomCols, bloomExpected, bloomFpp)
      .map(_.copy(origin = OriginRewrite)) // re-clustered, not new content
    val m = SkipManifest(statsCols, fresh, bloomCols, bloomExpected, bloomFpp)
    try writeManifestFile(spark, dir, m, Some(base)) // the commit: file set + stats config swap
    catch {
      case e: java.util.ConcurrentModificationException =>
        // self-cleaning loser: our re-clustered files are still orphans
        Erasure.deleteFiles(dir, moved, spark.sessionState.newHadoopConf())
        throw e
    }
    // the old generation stays as tombstones until vacuumVersions
    m
  }

  /** The crash-sensitive MOVE-IN step shared by [[compactSmallFiles]]
    * and [[recluster]]: write `df` range-clustered on `layoutKey` into
    * a dot-prefixed tmp dir (invisible to directory readers), then
    * rename the part files into `dir` as ORPHANS — absent from the
    * manifest, so manifest-driven reads ignore them until the caller's
    * commit. Returns the moved names, sorted. ([[appendEpoch]] keeps
    * its own variant: it renames with the epoch prefix.)
    */
  private def moveInClustered(spark: SparkSession, dir: String, tmpName: String,
      df: DataFrame, layoutKey: Column, numFiles: Int,
      uniform: Option[UniformKey] = None): IndexedSeq[String] = {
    val tmp = new Path(dir, tmpName)
    val fs = tmp.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(tmp, true): Unit
    clustered(df, layoutKey, numFiles, uniform)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val moved = fs.listStatus(tmp).map(_.getPath)
      .filter(p => p.getName.startsWith("part-") && !p.getName.endsWith(".crc"))
      .map { p =>
        val dst = new Path(dir, p.getName)
        fs.rename(p, dst): Unit
        touchAppeared(fs, dst)
        p.getName
      }.toIndexedSeq.sorted
    fs.delete(tmp, true): Unit
    moved
  }

  /** Re-stamp a file's mtime to NOW as it is renamed into the store
    * dir. The orphan-sweep age gate measures time-since-APPEARANCE,
    * but rename preserves mtime — a part file whose WRITE phase took
    * longer than the grace window would otherwise be sweep-eligible
    * the instant it appears, letting a concurrent maintenance sweep
    * delete a healthy writer's pre-commit files (and, if that sweep's
    * op then commits nothing, the writer's CAS fence never trips and
    * it commits a manifest referencing deleted files). Stamping at the
    * rename makes the gate measure the right clock. Stores whose FS
    * rejects setTimes fall back to the raw mtime — raise
    * `graft.store.sweepGraceMs` there.
    */
  private[sinks] def touchAppeared(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): Unit =
    try fs.setTimes(p, System.currentTimeMillis(), -1)
    // several Hadoop FileSystems surface unsupported/failed setTimes
    // as plain IOException rather than UnsupportedOperationException;
    // the documented degradation (raw mtime + a raised sweepGraceMs)
    // must apply there too instead of failing a healthy append — but
    // LOUDLY: a silently un-re-stamped file whose write outlasted the
    // grace window is sweep-eligible the instant it appears, and the
    // operator can only raise sweepGraceMs if told the clock degraded
    catch {
      case scala.util.control.NonFatal(e) =>
        log.warn(s"setTimes failed on $p (${e.getClass.getSimpleName}: " +
          s"${e.getMessage}) — the sweep age gate falls back to raw " +
          "mtime for this file; raise graft.store.sweepGraceMs if this " +
          "filesystem cannot re-stamp appearance times")
    }

  /** Minimum age before the orphan sweeps may collect an unlisted part
    * file or staging dir: anything younger might be a LIVE concurrent
    * writer's staged or just-moved pre-commit files (appendWithStats /
    * upsertKeys run concurrently by design). Crashed-run debris is, by
    * definition, older than this by the time a maintenance window
    * opens; a writer that stalls longer than the grace mid-commit is
    * outside the store's liveness contract (the Delta/Iceberg VACUUM
    * retention argument in miniature). The age anchor is
    * time-since-appearance-in-dir ([[touchAppeared]]), not write time.
    * Deployments with slower storage or longer maintenance overlap can
    * raise it via `-Dgraft.store.sweepGraceMs=...` (the VACUUM
    * retention knob in miniature).
    */
  private[sinks] val SweepGraceMs: Long = 10L * 60 * 1000

  private[sinks] def sweepGraceMs: Long =
    sys.props.get("graft.store.sweepGraceMs").flatMap(_.toLongOption)
      .getOrElse(SweepGraceMs)

  /** Every part file referenced by ANY committed version manifest (the
    * latest included) — the set the tombstone machinery pivots on: a
    * file on disk but outside it is debris; inside it but outside the
    * LATEST manifest it is a tombstone an old snapshot still serves.
    * Metadata-sized (one small JSON per commit).
    */
  private[sinks] def versionReferencedFiles(spark: SparkSession,
      dir: String): Set[String] = {
    val b = Set.newBuilder[String]
    b ++= readManifest(spark, dir).files.map(_.file)
    // anchor: cumulative state at the log start (the first retained
    // version may be a delta whose base was truncated away) — one
    // bounded chain walk; own-names cover every later entry event
    listVersions(spark, dir).headOption.foreach(first =>
      b ++= readManifestAt(spark, dir, first).files.map(_.file))
    versionOwnNames(spark, dir)((_, ns) => b ++= ns)
    b.result()
  }

  /** Delete part files present on disk but referenced by NO committed
    * version — the leftovers of a crash between a writer's move and
    * its commit — and stale `.append_tmp_*`/`.erasure_tmp_*` staging
    * dirs of crashed appends/upserts. TOMBSTONES (files an older
    * version manifest still references) are never swept here: they
    * are live history, reclaimed only by [[vacuumVersions]]. Runs only
    * inside the maintenance-window ops (compaction, recluster), and is
    * AGE-GATED by [[sweepGraceMs]]: entries younger than the grace
    * window are skipped, because a listing cannot tell a crashed
    * writer's debris from a live concurrent appender's in-flight files
    * — age (since appearance, [[touchAppeared]]) can.
    * [[appendEpoch]] instead sweeps only its OWN epoch's
    * name-identified debris and needs no grace.
    */
  private[sinks] def sweepOrphans(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(new Path(dir, ManifestName))) return
    val listed = versionReferencedFiles(spark, dir)
    val cutoff = System.currentTimeMillis() - sweepGraceMs
    fs.listStatus(p)
      .filter(_.getModificationTime < cutoff)
      .map(_.getPath)
      .filter { t =>
        val n = t.getName
        (n.startsWith("part-") && !n.endsWith(".crc") && !listed.contains(n)) ||
          n.startsWith(".append_tmp_") || n.startsWith(".erasure_tmp_")
      }
      .foreach(t => fs.delete(t, true): Unit)
  }

  /** Build and write the manifest for an existing parquet directory.
    * For refreshes after a partial rewrite prefer [[patchManifest]] —
    * this one scans every file. An empty directory (every file deleted)
    * yields an empty manifest rather than a schema-inference failure.
    */
  def writeManifest(spark: SparkSession, outDir: String,
      statsCols: Seq[String], bloomCols: Seq[String] = Nil,
      bloomExpected: Long = DefaultBloomExpected,
      bloomFpp: Double = DefaultBloomFpp): SkipManifest = {
    val parts = listPartFiles(spark, outDir)
    val files =
      if (parts.isEmpty) Vector.empty
      else statsFor(spark, parts.map(p => s"$outDir/$p"),
        statsCols, bloomCols, bloomExpected, bloomFpp)
    val m = SkipManifest(statsCols, files, bloomCols, bloomExpected, bloomFpp)
    writeManifestFile(spark, outDir, m)
    m
  }

  /** HIT-SIZED manifest refresh: entries in `removedFiles` are dropped,
    * entries in `rewrittenFiles` are recomputed by reading ONLY those
    * paths (file-local stats+bloom pass), and every other entry is kept
    * verbatim — cost tracks the touched-file list, never the table.
    * Sidecar parameters (cols, bloom sizing) come from the existing
    * manifest. If nothing remains, an empty manifest is written without
    * touching any data file.
    *
    * `expectedBase` is the writer fence ([[currentVersion]]): pass the
    * version the operation READ its manifest at and the commit is a
    * compare-and-swap — if any other writer committed in between, this
    * commit throws [[java.util.ConcurrentModificationException]]
    * instead of silently interleaving with (and possibly undoing) the
    * other writer's changes. Every maintenance entry point in this
    * package passes it; `None` skips the check (initial builds).
    */
  def patchManifest(spark: SparkSession, dir: String,
      removedFiles: Seq[String], rewrittenFiles: Seq[String],
      expectedBase: Option[Long] = None,
      rewriteOrigin: Set[String] = Set.empty,
      known: Option[SkipManifest] = None,
      forceCheckpoint: Boolean = false): SkipManifest = {
    // `known` skips the re-read when the CALLER already read the
    // manifest under the same fence base: manifest and version are
    // 1:1, so if the CAS passes, the caller's copy was current — and
    // if it wasn't, the CAS throws before anything is written. At 1M
    // entries this saves a full reconstruct per commit. Without
    // `known`, a FENCED commit reads at its base version
    // ([[readManifestBase]] — the immutable file, never the pointer,
    // which can lag the log head after a crashed commit).
    val old = known.filter(_ => expectedBase.isDefined)
      .getOrElse(expectedBase match {
        case Some(b) => readManifestBase(spark, dir, b)
        case None => readManifest(spark, dir)
      })
    val touched = (removedFiles ++ rewrittenFiles).toSet
    val kept = old.files.filterNot(f => touched.contains(f.file))
    val fresh =
      if (rewrittenFiles.isEmpty) Vector.empty
      else statsFor(spark, rewrittenFiles.map(f => s"$dir/$f"),
        old.cols, old.bloomCols, old.bloomExpected, old.bloomFpp)
        // provenance: names in rewriteOrigin hold content that was
        // already committed at the base version under other names
        // (staged survivor rewrites, compacted folds) — the change
        // feed may skip them; everything else is fresh ingest
        .map(f => if (rewriteOrigin.contains(f.file))
          f.copy(origin = OriginRewrite) else f)
    val m = old.copy(files = (kept ++ fresh).sortBy(_.file).toIndexedSeq)
    // CHECKPOINTED LOG (the store's 1M-entry scale fix): above
    // `deltaThreshold` entries a commit writes a KB-sized DELTA
    // version file (dropped names + fresh entries) instead of
    // re-serializing the whole manifest — the per-commit metadata
    // cost then tracks the touched-file list, never the table. Every
    // `checkpointEvery`-th version (and every config change, erasure,
    // or full rewrite) is a full CHECKPOINT, bounding reconstruction
    // to a handful of small files. Below the threshold the format is
    // byte-identical to the legacy single-file manifest.
    val removedPresent = old.files.map(_.file).filter(touched.contains)
    val useDelta = !forceCheckpoint && expectedBase.isDefined &&
      m.files.size >= deltaThreshold &&
      (expectedBase.get + 1) > 1 &&
      (expectedBase.get + 1) % checkpointCadence(m.files.size) != 0
    if (useDelta)
      commitVersion(spark, dir, serializeDelta(removedPresent, fresh),
        expectedBase, v => s"""{"redirect":$v}\n""".getBytes("UTF-8"))
    else
      writeManifestFile(spark, dir, m, expectedBase)
    m
  }

  /** Delta-mode threshold: manifests at or above this many entries
    * commit deltas instead of full rewrites. Default 100k (~a 100 TB
    * table at 1 GB files); `-Dgraft.store.deltaThreshold=` overrides
    * (tests force 1 to exercise the delta path at toy scale).
    */
  private[sinks] def deltaThreshold: Int =
    sys.props.get("graft.store.deltaThreshold").flatMap(_.toIntOption)
      .getOrElse(100000)

  /** Every N-th version is a full checkpoint in delta mode, bounding
    * the reconstruction walk. `-Dgraft.store.checkpointEvery=` pins a
    * STATIC cadence; unset, the cadence is ADAPTIVE in the manifest's
    * entry count — see [[checkpointCadence]].
    */
  private[sinks] def checkpointEvery: Option[Long] =
    sys.props.get("graft.store.checkpointEvery").flatMap(_.toLongOption)

  /** The checkpoint cadence for a manifest of `entries` entries:
    * `clamp(entries / 200, 10, 1000)` unless pinned by
    * `-Dgraft.store.checkpointEvery=`.
    *
    * Why adaptive: a checkpoint costs O(entries) to write, a delta
    * O(touched files) — so a STATIC cadence makes the amortized
    * per-commit metadata cost grow with the table (entries/K per
    * commit), exactly the scaling the delta log exists to avoid. Tying
    * K to entries/200 holds that amortized term at ~200 entries per
    * commit at any table size, and the measured anchor justifies the
    * constant: at E=20k entries, K=100 (= E/200) cut the maintenance
    * log walks 4.6× with flat reader cost (SCALE.md round-17 cadence
    * table). The floor keeps the legacy K=10 for small delta-mode
    * logs; the ceiling bounds a reader's worst-case delta chain to
    * 1000 KB-sized parses regardless of table size.
    *
    * Readers need no knowledge of the cadence — version files are
    * self-describing (`{"delta":` header), the reconstruction walk
    * just backtracks to the nearest checkpoint — so the cadence can
    * change MID-LOG (a growing table crosses clamp steps; an operator
    * flips the override) with zero read-side coordination (law-pinned).
    */
  private[sinks] def checkpointCadence(entries: Int): Long =
    checkpointEvery.getOrElse(
      math.max(10L, math.min(1000L, entries.toLong / 200L)))

  /** The store's latest committed version (0 on an empty log) — what a
    * maintenance operation captures alongside its [[readManifest]] and
    * hands back to its commit as the fence base ([[patchManifest]]).
    */
  def currentVersion(spark: SparkSession, dir: String): Long =
    listVersions(spark, dir).lastOption.getOrElse(0L)

  /** The manifest a FENCED WRITER must build on: the content at its
    * fence `base`, read from the immutable version file — never the
    * mutable latest pointer. The two can disagree after a crash
    * between a commit's version-file CAS and its pointer swap: the
    * version file (the CAS arbiter) then holds a commit the pointer
    * never published. A writer that fenced on the log head but read
    * the stale pointer would commit a delta the reconstruction applies
    * ON TOP of the crashed version it never saw — survivors of a
    * crashed upsert double-count under a later fold (the law pins
    * this). Reading at the base adopts the crashed commit instead;
    * the pointer self-heals at the next commit's swap, and readers in
    * between serve the pointer's (older, committed, tombstone-intact)
    * snapshot.
    */
  private[sinks] def readManifestBase(spark: SparkSession, dir: String,
      base: Long): SkipManifest =
    if (base == 0L) readManifest(spark, dir) // empty log: legacy error/empty semantics
    else try readManifestAt(spark, dir, base) catch {
      case e: IllegalStateException if quarantineCrashedHead(spark, dir, base, e) =>
        // the unparsable file was the never-published log HEAD (a
        // writer crashed mid-create, truncating its bytes) — it is now
        // quarantined. FENCE, don't re-anchor: the caller captured
        // `base` before calling here, so returning the v(base−1)
        // manifest would hand it a (base, manifest) pair that
        // disagrees — and while it stages (Spark jobs, seconds), a
        // concurrent fenced writer can legitimately recommit a FRESH
        // v`base`, which this caller's eventual CAS would then pass
        // against (the fence compares version NUMBERS, not file
        // identity) and silently build over — a lost update (dropped
        // batch in checkpoint mode, unrewritten duplicate keys in
        // delta mode). Throwing the fence's own signal instead makes
        // withFenceRetry re-run the op, which re-captures base and
        // manifest as a consistent pair — liveness restored without
        // an operator, and nothing published was touched.
        throw new java.util.ConcurrentModificationException(
          s"crashed head ${versionName(base)} of $dir quarantined: this " +
            "operation's fence base no longer exists (and its number may " +
            "be recommitted by a concurrent writer) — re-read the " +
            "manifest and re-run")
    }

  /** LIVENESS repair for the one crash residue that would otherwise
    * brick every fenced maintenance op: a writer killed mid-create of
    * its version file leaves unparsable bytes at the log head, and
    * since fenced writers read at the head ([[readManifestBase]]),
    * every subsequent op would fail its base read forever. Quarantine
    * (rename to `.corrupt`, keeping forensics) is safe ONLY under all
    * of:
    *  - the failing file IS the version we are reading (the corrupt
    *    error names it) — a parse failure deeper in a delta chain
    *    means a PUBLISHED predecessor rotted, which no repair can
    *    reconstruct: stays loud;
    *  - it is the current log HEAD — nothing chains through it yet;
    *  - the latest pointer does not redirect to it — unpublished by
    *    construction (the crash happened before the pointer swap; a
    *    published pointer is always backed by the bytes that parsed
    *    at commit time);
    *  - it is older than [[sweepGraceMs]] — a LIVE writer sits between
    *    its open(O_EXCL) and close for microseconds, never minutes.
    * Racing repairers are benign: the rename is atomic, the loser's
    * missing-source failure still reports "head changed, retry".
    */
  private def quarantineCrashedHead(spark: SparkSession, dir: String,
      base: Long, cause: IllegalStateException): Boolean = {
    val msg = Option(cause.getMessage).getOrElse("")
    if (!msg.contains(versionName(base))) return false
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (listVersions(spark, dir).lastOption != Some(base)) return false
    // unreadable pointer bytes: we cannot rule out that the pointer
    // PUBLISHED this head — quarantining a published head is
    // data-visible, so refuse (the caller's original parse error
    // propagates; recoverLog is the documented heal)
    pointerRedirectTargetE(fs, dir) match {
      case Right(t) => if (t.contains(base)) return false
      case Left(_) => return false
    }
    val vf = new Path(dir, versionName(base))
    val age = try System.currentTimeMillis() - fs.getFileStatus(vf).getModificationTime
      catch { case _: java.io.FileNotFoundException => return true } // raced: already repaired
    if (age < sweepGraceMs) return false
    try fs.rename(vf, new Path(dir, versionName(base) + ".corrupt")): Unit
    catch { case _: java.io.IOException => () } // loser of a repair race
    !listVersions(spark, dir).lastOption.contains(base)
  }

  /** OPTIMISTIC CONCURRENCY on top of the writer fence: run `op` (a
    * fenced maintenance operation on the store), and when it loses the
    * commit CAS to a concurrent writer, re-run it against the new
    * manifest — the Delta/Iceberg commit-retry loop. The fence
    * guarantees SAFETY (no interleaved commit can corrupt the store);
    * this loop adds PROGRESS (independent writers all eventually
    * commit, serialized by the CAS). No shared cleanup happens here —
    * a sweep could delete a NEIGHBOR's in-flight files; instead each
    * op is responsible for its own lost-attempt debris
    * ([[appendWithStats]] is the self-cleaning model: it deletes
    * exactly its own moved files before rethrowing).
    *
    * Commutativity is the CALLER's judgment: two appends of different
    * batches compose under any order; an append retried across someone
    * else's erasure re-appends its batch unchanged. An op whose INPUT
    * depends on a read of the store (read-modify-write) re-reads
    * inside `op` by construction (every op starts at readManifest), so
    * the retry sees the winner's state — serializable, never a lost
    * update.
    */
  def withFenceRetry[A](maxAttempts: Int = 5)(op: => A): A = {
    require(maxAttempts >= 1, "maxAttempts must be >= 1")
    var attempt = 1
    while (true) {
      try return op
      catch {
        case e: java.util.ConcurrentModificationException =>
          if (attempt >= maxAttempts) throw e
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** One stats pass over exactly `paths`: per file, row count, min/max
    * of `statsCols`, Bloom of `bloomCols`. The collect is one row per
    * FILE — manifest-sized, never data-sized.
    *
    * When no Bloom sidecars are requested the pass is METADATA-ONLY:
    * parquet footers already carry exact per-row-group min/max,
    * null-count and row-count for integer columns, so the manifest is
    * assembled from footer reads (KBs per file) instead of a
    * column-pruned data scan — at 100 TB the stats pass of a table
    * write/patch drops from a full read of the stats columns to a
    * footer read per touched file. The footer path refuses (and the
    * scan fallback runs) whenever any file/column lacks valid footer
    * statistics or is not a plain signed INT32/INT64 (annotated types —
    * timestamps, decimals, dates — cast differently than the raw
    * physical value, so only unannotated integers are provably equal to
    * the scan's `min(col.cast("long"))`). Bloom builds still need the
    * values, so `bloomCols` keeps the one-scan path (the scan computes
    * stats and Blooms together — footers would save nothing there).
    * `-Dgraft.store.footerStats=false` pins the scan path.
    */
  private def statsFor(spark: SparkSession, paths: Seq[String],
      statsCols: Seq[String], bloomCols: Seq[String],
      bloomExpected: Long, bloomFpp: Double): IndexedSeq[FileStats] = {
    if (bloomCols.isEmpty &&
        sys.props.getOrElse("graft.store.footerStats", "true").toBoolean) {
      footerStats(spark, paths, statsCols) match {
        case Some(st) => return st
        case None => () // fall through to the exact scan
      }
    }
    statsForScan(spark, paths, statsCols, bloomCols, bloomExpected, bloomFpp)
  }

  /** Footer-metadata stats for `paths`: Some(per-file stats, scan-path-
    * identical) or None when any file/column cannot be proven equal from
    * footers alone. Files whose footers record ZERO rows are omitted,
    * exactly as the scan path's `groupBy(input_file_name())` omits them.
    */
  private def footerStats(spark: SparkSession, paths: Seq[String],
      statsCols: Seq[String]): Option[IndexedSeq[FileStats]] = try {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    def plainInt(pt: org.apache.parquet.schema.PrimitiveType): Boolean = {
      val name = pt.getPrimitiveTypeName
      (name == PrimitiveTypeName.INT64 || name == PrimitiveTypeName.INT32) &&
        (pt.getLogicalTypeAnnotation match {
          case null => true
          case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation =>
            i.isSigned && (i.getBitWidth == 64 || i.getBitWidth == 32)
          case _ => false // timestamp/date/decimal: cast semantics differ
        })
    }
    def fileStats(p: String): Option[Option[FileStats]] = {
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(p), conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala.toIndexedSeq
        val rows = blocks.map(_.getRowCount).sum
        if (rows == 0L) return Some(None) // scan path omits 0-row files
        val perCol = statsCols.map { c =>
          var nulls = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
          blocks.foreach { b =>
            val chunk = b.getColumns.asScala
              .find(_.getPath.toDotString == c).getOrElse(return None)
            if (!plainInt(chunk.getPrimitiveType)) return None
            val st = chunk.getStatistics
            if (st == null || st.isEmpty || !st.isNumNullsSet) return None
            nulls += st.getNumNulls
            if (st.hasNonNullValue) {
              val (lo, hi) = (st.genericGetMin, st.genericGetMax) match {
                case (a: java.lang.Long, b: java.lang.Long) =>
                  (a.longValue, b.longValue)
                case (a: java.lang.Integer, b: java.lang.Integer) =>
                  (a.longValue, b.longValue)
                case _ => return None
              }
              mn = math.min(mn, lo); mx = math.max(mx, hi)
            }
          }
          (mn, mx, nulls) // all-null file keeps the (Max, Min) sentinel
        }
        Some(Some(FileStats(p.split('/').last, rows,
          perCol.map(_._1), perCol.map(_._2), Nil, perCol.map(_._3))))
      } finally reader.close()
    }
    // footer reads are tiny but per-file; overlap them so a many-file
    // patch is not serialized on driver round-trips
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(16, paths.size)))
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      // bounded, not Inf: a wedged footer read should surface as a
      // failure (caught below → scan fallback), never a driver hang;
      // footer reads are KB-sized, so the bound is orders of magnitude
      // above any legitimate read
      val all = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(
          paths.map(p => scala.concurrent.Future(fileStats(p)))),
        scala.concurrent.duration.Duration(1, "hour"))
      if (all.exists(_.isEmpty)) None
      else Some(all.flatMap(_.get).sortBy(_.file).toIndexedSeq)
    } finally pool.shutdown()
  } catch {
    // any structural surprise (missing footer, exotic writer) — the
    // exact scan is always available and always right
    case scala.util.control.NonFatal(e) =>
      log.warn(s"footer stats pass failed (${e.getClass.getSimpleName}: " +
        s"${e.getMessage}); falling back to the scan pass")
      None
  }

  /** The exact column-pruned SCAN stats pass (the only path when Bloom
    * sidecars are requested; the fallback otherwise).
    */
  private def statsForScan(spark: SparkSession, paths: Seq[String],
      statsCols: Seq[String], bloomCols: Seq[String],
      bloomExpected: Long, bloomFpp: Double): IndexedSeq[FileStats] = {
    val aggs = statsCols.flatMap(c => Seq(
      min(col(c).cast("long")).as(s"__min_$c"),
      max(col(c).cast("long")).as(s"__max_$c"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"))) ++
      bloomCols.map(c => BloomAgg(col(c), bloomExpected, bloomFpp).as(s"__bloom_$c"))
    val rows = spark.read.parquet(paths: _*)
      .groupBy(input_file_name().as("__file"))
      .agg(count(lit(1)).as("__rows"), aggs: _*)
      .collect()
    rows.map { r =>
      val name = r.getString(0).split('/').last
      val (mins, maxs) = statsCols.map { c =>
        val mi = r.getAs[Any](s"__min_$c"); val ma = r.getAs[Any](s"__max_$c")
        if (mi == null || ma == null) (Long.MaxValue, Long.MinValue)
        else (mi.asInstanceOf[Long], ma.asInstanceOf[Long])
      }.unzip
      val nulls = statsCols.map(c => r.getAs[Long](s"__nulls_$c"))
      val blooms = bloomCols.map(c =>
        Base64.getEncoder.encodeToString(r.getAs[Array[Byte]](s"__bloom_$c")))
      FileStats(name, r.getAs[Long]("__rows"), mins, maxs, blooms, nulls)
    }.sortBy(_.file).toIndexedSeq
  }

  private[sinks] def listPartFiles(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(n => n.startsWith("part-") && !n.endsWith(".crc"))
      .sorted.toIndexedSeq
  }

  /** Serialize (legacy-stable): the bloom header fields and per-file
    * `blooms` arrays appear only when `bloomCols` is non-empty, so
    * bloom-free manifests stay byte-identical to the v1 format.
    *
    * WRITER FENCE: the version file is created with overwrite=FALSE —
    * an atomic create that makes the append-only log the commit
    * arbiter. Two racing writers both compute `next`; exactly one
    * create succeeds, the loser throws ConcurrentModificationException
    * before the latest pointer moves. `expectedBase` additionally
    * rejects a STALE writer (one whose read predates another's commit)
    * even when no race is in flight at commit instant — the
    * compare-and-swap on the version number the caller read at.
    * Single-writer discipline is thus enforced, not just documented:
    * the loser fails loudly and must re-read + re-run.
    */
  /** One serialized FileStats line — shared by the full and delta
    * writers. Optional fields appear only when known, so legacy
    * (bloom-free, null-count-free) entries re-serialize
    * byte-identically.
    */
  private def serializeEntry(f: FileStats): String = {
    val nullsField =
      if (f.nulls.isEmpty) ""
      else s""","nulls":${f.nulls.mkString("[", ",", "]")}"""
    val bloomField =
      if (f.blooms.isEmpty) ""
      else s""","blooms":${f.blooms.map(b => "\"" + b + "\"").mkString("[", ",", "]")}"""
    val originField =
      if (f.origin.isEmpty) "" else s""","origin":"${f.origin}""""
    s"""{"file":"${f.file}","rows":${f.rows},"mins":${f.mins.mkString("[", ",", "]")},"maxs":${f.maxs.mkString("[", ",", "]")}$nullsField$bloomField$originField}"""
  }

  private def serializeManifest(m: SkipManifest): Array[Byte] = {
    val text = new StringBuilder
    val bloomHeader =
      if (m.bloomCols.isEmpty) ""
      else s""","bloomCols":${m.bloomCols.map(c => "\"" + c + "\"").mkString("[", ",", "]")}""" +
        s""","bloomExpected":${m.bloomExpected},"bloomFpp":${m.bloomFpp}"""
    text ++= s"""{"cols":${m.cols.map(c => "\"" + c + "\"").mkString("[", ",", "]")}$bloomHeader,"files":[""" + "\n"
    text ++= m.files.map(serializeEntry).mkString(",\n")
    text ++= "\n]}\n"
    text.toString.getBytes("UTF-8")
  }

  /** A delta version file: the names this commit dropped plus the
    * entries it added, against the immediately preceding version.
    * Column/bloom config is inherited from the base (config changes
    * always checkpoint). KB-sized for a hit-sized patch, whatever the
    * table's entry count.
    */
  private def serializeDelta(removed: Seq[String],
      added: Seq[FileStats]): Array[Byte] = {
    val text = new StringBuilder
    text ++= s"""{"delta":true,"removed":${removed.map(n => "\"" + n + "\"").mkString("[", ",", "]")},"files":[""" + "\n"
    text ++= added.map(serializeEntry).mkString(",\n")
    text ++= "\n]}\n"
    text.toString.getBytes("UTF-8")
  }

  private[sinks] def writeManifestFile(spark: SparkSession, outDir: String,
      m: SkipManifest, expectedBase: Option[Long] = None): Unit = {
    val bytes = serializeManifest(m)
    commitVersion(spark, outDir, bytes, expectedBase, _ => bytes)
  }

  /** The commit protocol shared by checkpoint and delta commits:
    * fence check, CAS-create of the version file (the arbiter), then
    * the atomic latest-pointer swap. `latestBytes(v)` supplies the
    * pointer content — the full manifest for checkpoints, a tiny
    * `{"redirect":v}` for deltas (readers follow it through
    * [[readManifestAt]]'s reconstruction).
    *
    * Version file FIRST, latest second: the latest pointer is always
    * backed by a version. A crash between the two leaves a version
    * file the pointer never published — the COMMIT still stands,
    * because the version file is the CAS arbiter every later writer
    * fences against: the next fenced operation reads its manifest at
    * that head ([[readManifestBase]]) and so ADOPTS the crashed
    * commit, and its own pointer swap heals the pointer forward.
    * Readers in the window serve the pointer's older snapshot, whose
    * files tombstoning keeps intact. (Writers must never mix the
    * head as a fence base with the pointer as content — in delta mode
    * that commits a delta the reconstruction applies on top of the
    * unseen crashed version; the crash-adoption law pins the
    * double-count that caused.)
    */
  private def commitVersion(spark: SparkSession, outDir: String,
      bytes: Array[Byte], expectedBase: Option[Long],
      latestBytes: Long => Array[Byte]): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(outDir).getFileSystem(conf)
    val cur = listVersions(spark, outDir).lastOption.getOrElse(0L)
    expectedBase.foreach { base =>
      if (cur != base) throw new java.util.ConcurrentModificationException(
        s"stale writer fenced: this operation read $outDir at v$base but " +
          s"the latest commit is now v$cur — another writer committed in " +
          "between; re-read the manifest and re-run")
    }
    val next = cur + 1L
    try createExclusive(fs, new Path(outDir, versionName(next)), bytes)
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
        throw new java.util.ConcurrentModificationException(
          s"concurrent writer fenced: version v$next of $outDir was " +
            "committed by another writer while this commit was in flight; " +
            "re-read the manifest and re-run")
    }
    // the LATEST pointer swaps in atomically (write-aside + rename with
    // OVERWRITE): a concurrent manifest-driven reader sees either the
    // old complete pointer or the new complete one, never a torn write
    // — and createExclusive above already arbitrated the writer race
    // before the pointer moves, so losers never reach this line
    swapPointer(fs, conf, outDir, latestBytes(next))
    // brand the directory at its FIRST commit (covers every init path —
    // writeWithStats, exportSnapshot, legacy writeManifest): the marker
    // is the on-disk hint that this directory is MANIFEST-DEFINED. A
    // bare spark.read.parquet(dir) on a store that has seen upserts or
    // compactions silently includes tombstoned files; readers must go
    // through readPruned/readPrunedKeys/readPrunedAt. Best-effort: a
    // marker-write failure never fails a commit that already stands.
    if (next == 1L)
      try {
        val mk = fs.create(new Path(outDir, StoreMarkerName), true)
        try mk.write(StoreMarkerText.getBytes("UTF-8")) finally mk.close()
      } catch { case scala.util.control.NonFatal(_) => () }
  }

  /** The ONE copy of the latest-pointer swap protocol (commit path and
    * [[recoverLog]]'s dead-pointer heal): write-aside to a dot-tmp,
    * then an atomic FileContext rename with OVERWRITE — a concurrent
    * reader sees either the old complete pointer or the new complete
    * one, never a torn write.
    */
  private[sinks] def swapPointer(fs: org.apache.hadoop.fs.FileSystem,
      conf: org.apache.hadoop.conf.Configuration, outDir: String,
      bytes: Array[Byte]): Unit = {
    // UNIQUE write-aside per swap: a shared tmp name let
    // [[recoverLog]]'s dead-pointer heal race a live commit's swap —
    // the second create(overwrite=true) clobbered the first swapper's
    // tmp between its write and rename, so the first rename threw
    // FileNotFoundException and a commit whose version file had
    // already CAS'd durably REPORTED failure (and withFenceRetry
    // re-ran into a CME). With a nonce'd tmp the two swaps serialize
    // on the destination rename only — last-wins, worst case the
    // ordinary lag-1 pointer the next commit heals. A crash between
    // write and rename strands the nonce'd dot-file; vacuum sweeps
    // aged ones.
    val tmp = new Path(outDir,
      s".$ManifestName.tmp.${java.util.UUID.randomUUID().toString.take(13)}")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, conf)
    val dst = new Path(outDir, ManifestName)
    // On HDFS/object stores the OVERWRITE rename is atomic server-side.
    // On the LOCAL filesystem it is delete-then-rename, so two racing
    // swappers can each delete the destination and then collide on the
    // low-level rename (FileAlreadyExists when the other lands first).
    // Bounded retry: our tmp is nonce'd so it survives the failed
    // attempt intact; if the storm outlasts the retries, leave the
    // pointer as the OTHER swapper's value — a lag-≤1 pointer is the
    // ordinary crash-window state the next commit heals — and sweep
    // our tmp so it never reads as debris.
    var attempt = 0
    var done = false
    while (!done) {
      try { fc.rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE); done = true }
      catch {
        case _: java.io.FileNotFoundException if !fs.exists(tmp) =>
          // local ChecksumFs can throw on the .crc sidecar AFTER the
          // data rename already moved our tmp — the only mover of a
          // nonce'd tmp is our own rename, so a vanished tmp means the
          // payload landed (or was last-wins superseded); done, not a
          // retry storm
          done = true
        case scala.util.control.NonFatal(_) if attempt < 8 =>
          attempt += 1
          Thread.sleep(1L << math.min(attempt, 5))
        case scala.util.control.NonFatal(e) =>
          log.warn(s"pointer swap lost a local-FS rename race after $attempt retries " +
            s"($dst): leaving the concurrent swapper's pointer (self-heals at the " +
            s"next commit): $e")
          try fs.delete(tmp, false) catch { case scala.util.control.NonFatal(_) => () }
          done = true
      }
    }
  }

  /** On-disk hint that a directory is a manifest-defined skipping store
    * (written at the first commit): directory-level parquet reads see
    * tombstones; use the manifest-driven readers.
    */
  val StoreMarkerName = "_GRAFT_STORE"
  private val StoreMarkerText: String =
    "This directory is a manifest-defined skipping store: the table is\n" +
      "the file set named by _skip_manifest.json, NOT the directory\n" +
      "listing. After upserts/compactions a bare parquet read of the\n" +
      "directory includes tombstoned (replaced) files. Read through\n" +
      "DataSkipping.readPruned / readPrunedKeys / readPrunedAt.\n"

  /** Atomic create-no-overwrite of the version file — the arbiter the
    * whole CAS rests on, so it must be GENUINELY exclusive. Hadoop's
    * `fs.create(path, overwrite = false)` is only atomic where the
    * underlying store makes it so (HDFS): on `LocalFileSystem` it is an
    * exists() check followed by a plain create — a TOCTOU window in
    * which two simultaneous committers can both pass, both "win", and
    * the second latest-pointer swap silently discards the first
    * writer's manifest. For `file://` the create therefore goes through
    * `java.nio.file.Files.newOutputStream(CREATE_NEW)`, which maps to
    * open(O_CREAT|O_EXCL) — atomic at the kernel. Other schemes use the
    * Hadoop call: HDFS qualifies; a deployment targeting a store
    * WITHOUT atomic no-overwrite create (bare S3A) must front the log
    * with a coordinator that has one (the same requirement Delta's
    * LogStore docs state for S3).
    */
  private def createExclusive(fs: org.apache.hadoop.fs.FileSystem, p: Path,
      bytes: Array[Byte]): Unit =
    if (fs.getScheme == "file") {
      val local = java.nio.file.Paths.get(fs.makeQualified(p).toUri.getPath)
      Option(local.getParent).foreach(d => java.nio.file.Files.createDirectories(d): Unit)
      val out =
        try java.nio.file.Files.newOutputStream(local,
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            throw new org.apache.hadoop.fs.FileAlreadyExistsException(p.toString)
        }
      try out.write(bytes) finally out.close()
    } else {
      val out = fs.create(p, false)
      try out.write(bytes) finally out.close()
    }

  // -------------------------------------------------- version log / travel

  /** Committed manifest versions, ascending. */
  def listVersions(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).map(_.getPath.getName).collect {
      case VersionRe(v) => v.toLong
    }.sorted.toIndexedSeq
  }

  /** The manifest as of commit `version` (time travel). A delta
    * version reconstructs from its predecessor — the walk is bounded
    * by [[checkpointEvery]] (every K-th version is a full checkpoint,
    * and erasure/recluster/config changes always checkpoint).
    */
  def readManifestAt(spark: SparkSession, dir: String, version: Long): SkipManifest = {
    val p = new Path(dir, versionName(version))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    if (text.startsWith("""{"delta":""")) {
      val base = readManifestAt(spark, dir, version - 1)
      applyDelta(base, text, p)
    } else parseManifest(text, p)
  }

  /** Fold the version log FORWARD in one pass over `[fromV, toV]`:
    * each version file is read and parsed exactly ONCE — the first
    * in-range version anchors via [[readManifestAt]] (one bounded
    * chain walk), every later delta applies incrementally on top of
    * the running manifest, every later checkpoint re-parses fresh —
    * and each reconstructed (version, manifest) streams through `f`.
    * Whole-log passes (vacuum, fsck's referenced-file set,
    * [[validVersions]], the feed's pairwise walk) previously called
    * [[readManifestAt]] PER VERSION, each call re-walking its delta
    * chain back to a checkpoint — at the 1M-entry scale the
    * checkpointed log targets that is O(versions × multi-second
    * checkpoint parse), largely negating the delta-commit win. The
    * fold makes a whole-log pass cost one parse per log file.
    */
  private[sinks] def foldVersions[A](spark: SparkSession, dir: String,
      fromV: Long = 1L, toV: Long = Long.MaxValue)(
      f: (Long, SkipManifest) => A): Seq[A] =
    foldVersionsCore(spark, dir, fromV, toV).map {
      case (_, Left(e)) => throw e // loud view: readers must not skip rot
      case (v, Right(m)) => f(v, m)
    }

  /** The ONE copy of the forward-fold reconstruction law (both
    * [[foldVersions]] — loud — and [[logHealth]] — resilient — are
    * views over it): each version file reads and parses exactly once;
    * the first in-range version anchors via [[readManifestAt]] (one
    * bounded chain walk), a contiguous delta applies incrementally on
    * the running manifest, a checkpoint re-parses fresh, and a delta
    * over a broken predecessor is broken itself (transitively, until
    * the next checkpoint re-anchors).
    */
  private def foldVersionsCore(spark: SparkSession, dir: String,
      fromV: Long, toV: Long): Seq[(Long, Either[Throwable, SkipManifest])] = {
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    var cur: Option[SkipManifest] = None
    var prevV = Long.MinValue
    var prevBroken = false
    listVersions(spark, dir).filter(v => v >= fromV && v <= toV).map { v =>
      val p = new Path(dir, versionName(v))
      val r: Either[Throwable, SkipManifest] =
        try {
          val in = fs.open(p)
          val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          if (!text.startsWith("""{"delta":""")) Right(parseManifest(text, p))
          else cur match {
            case Some(base) if prevV == v - 1 => Right(applyDelta(base, text, p))
            case None if prevV == v - 1 && prevBroken =>
              Left(new IllegalStateException(
                s"corrupt skip manifest ${new Path(dir, versionName(v))}: " +
                  s"delta over broken v$prevV"))
            // range start (or a defensive log gap): ONE anchored chain walk
            case _ => Right(readManifestAt(spark, dir, v))
          }
        } catch { case scala.util.control.NonFatal(e) => Left(e) }
      cur = r.toOption
      prevV = v
      prevBroken = r.isLeft
      (v, r)
    }
  }

  private val DeltaHeaderRe = """\{"delta":true,"removed":\[([^\]]*)\],"files":\[""".r

  private def applyDelta(base: SkipManifest, text: String, p: Path): SkipManifest = {
    def corrupt(why: String): Nothing =
      throw new IllegalStateException(s"corrupt skip delta $p: $why")
    val lines = text.linesIterator.map(_.trim).filter(_.nonEmpty).toVector
    if (lines.isEmpty) corrupt("empty")
    val removed = lines.head match {
      case DeltaHeaderRe(names) =>
        if (names.isEmpty) Set.empty[String]
        else names.split(',').map(_.stripPrefix("\"").stripSuffix("\"")).toSet
      case _ => corrupt(s"bad header '${lines.head}'")
    }
    // same terminator law as parseManifest: a line-boundary-truncated
    // delta must fail loudly, never apply minus its tail entries
    if (lines.last != "]}") corrupt("missing ']}' terminator (truncated write)")
    val added = parseEntries(lines.tail.dropRight(1),
      base.cols.length, base.bloomCols.length, corrupt)
    base.copy(files =
      (base.files.filterNot(f => removed.contains(f.file)) ++ added)
        .sortBy(_.file).toIndexedSeq)
  }

  /** True when the version file at `v` is a delta (needs its
    * predecessor to reconstruct) — a header sniff, not a full read.
    */
  private[sinks] def isDeltaVersion(fs: org.apache.hadoop.fs.FileSystem,
      dir: String, v: Long): Boolean = {
    val in = fs.open(new Path(dir, versionName(v)))
    try {
      val buf = new Array[Byte](9)
      var n = 0
      while (n < 9) {
        val r = in.read(buf, n, 9 - n)
        if (r < 0) return false
        n += r
      }
      new String(buf, "UTF-8") == """{"delta":"""
    } finally in.close()
  }

  /** [[readPruned]] against the table AS OF commit `version` — the
    * time-travel read: the version's manifest defines the file set, so
    * the result is the table exactly as that commit left it, provided
    * the version is still VALID (its files not yet removed by
    * erasure/compaction/vacuum — [[validVersions]]). Append-only
    * histories stay valid forever.
    */
  def readPrunedAt(spark: SparkSession, dir: String,
      bounds: Seq[(String, Long, Long)], version: Long): DataFrame =
    readPrunedWith(spark, dir, readManifestAt(spark, dir, version), bounds)

  /** Versions a time-travel read may target: every referenced file
    * still exists AND its manifest entry matches the latest's for that
    * name — an in-place rewrite (erasure/upsert survivor swap) keeps
    * the NAME but changes the content, which silently invalidates the
    * older snapshot; the entry mismatch (row count at minimum)
    * detects it. One directory listing, metadata-sized.
    */
  def validVersions(spark: SparkSession, dir: String): Seq[Long] = {
    val present = listPartFiles(spark, dir).toSet
    val latest = readManifest(spark, dir).files.map(f => f.file -> f).toMap
    foldVersions(spark, dir)((v, m) =>
      if (m.files.forall(f =>
        present.contains(f.file) && latest.get(f.file).forall(_ == f)))
        Some(v)
      else None).flatten
  }

  /** Per-version log health in ONE resilient forward pass: `Right(m)`
    * when the version reconstructs, `Left(cause)` when its own bytes
    * are unparsable OR its delta chain passes through a broken
    * predecessor (transitively: every delta downstream of a corpse is
    * broken until the next full checkpoint re-anchors). Never throws
    * on corrupt content — this is the diagnostic walk behind [[fsck]]
    * and [[recoverLog]]; [[readManifestAt]] stays loud for readers.
    */
  private[sinks] def logHealth(spark: SparkSession,
      dir: String): Seq[(Long, Either[String, SkipManifest])] =
    foldVersionsCore(spark, dir, 1L, Long.MaxValue).map { case (v, r) =>
      (v, r.left.map(e => Option(e.getMessage).getOrElse(e.getClass.getName)))
    }

  /** Stream each version file's OWN entry names (a checkpoint's full
    * listing, a delta's added names) in log order — the primitive
    * behind the referenced-name unions ([[vacuumVersions]], the orphan
    * sweep): a name present at ANY version entered it via the log
    * start, a delta add, or a checkpoint listing at-or-before that
    * version, so `union of cumulative states over a version RANGE =
    * cumulative state at the range start (the caller's one anchored
    * [[readManifestAt]]) ∪ own-names of the range's files`. No
    * cumulative reconstruction, no per-version O(table) work — a
    * 10k-version backlog costs one cheap parse per log FILE. Name
    * extraction is a prefix/indexOf scan (the full-entry regex is the
    * dominant cost when 100k-entry checkpoints are re-listed every
    * K-th version); truncation stays LOUD via the same header +
    * terminator laws as the full parser — a deleter must never act on
    * a partial picture ([[recoverLog]] is the repair).
    */
  private[sinks] def versionOwnNames(spark: SparkSession, dir: String)(
      f: (Long, Seq[String]) => Unit): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    listVersions(spark, dir).foreach { v =>
      val p = new Path(dir, versionName(v))
      val in = fs.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      def corrupt(why: String): Nothing =
        throw new IllegalStateException(s"corrupt skip manifest $p: $why")
      val lines = text.linesIterator.map(_.trim).filter(_.nonEmpty).toVector
      if (lines.isEmpty) corrupt("empty")
      val headerOk =
        if (text.startsWith("""{"delta":"""))
          DeltaHeaderRe.pattern.matcher(lines.head).matches()
        else ColsRe.pattern.matcher(lines.head).matches()
      if (!headerOk) corrupt(s"bad header '${lines.head}'")
      if (lines.last != "]}") corrupt("missing ']}' terminator (truncated write)")
      val pre = "{\"file\":\""
      f(v, lines.tail.dropRight(1).map { l =>
        if (!l.startsWith(pre)) corrupt(s"bad file line '$l'")
        val e = l.indexOf('"', pre.length)
        if (e < 0) corrupt(s"bad file line '$l'")
        l.substring(pre.length, e)
      })
    }
  }

  /** [[recoverLog]] outcome: `quarantined` version files renamed to
    * `.corrupt` (forensics kept), `head` the log head after recovery,
    * `rolledBackFrom` the pre-recovery head when the live table had to
    * roll back (its commits were unreconstructible), `orphanedFiles`
    * the part files those lost commits left behind — on disk, readable,
    * re-appendable by the operator via [[patchManifest]] (or swept by
    * the next age-gated maintenance pass if abandoned).
    */
  final case class RecoverReport(quarantined: Seq[Long], head: Long,
      rolledBackFrom: Option[Long], orphanedFiles: Seq[String])

  /** RECOVERY for a rotted MID-CHAIN version file — the one corruption
    * class the head-quarantine liveness repair cannot touch: a
    * published CHECKPOINT (or delta) whose bytes rotted after commit
    * leaves every delta downstream of it unreconstructible until the
    * next full checkpoint, so delta-mode reads of those versions fail
    * loudly with no in-engine path forward. (Such a corpse can only be
    * post-publication rot: a file truncated at COMMIT time is never
    * published — the next fenced writer quarantines it at the head.)
    *
    * Two cases:
    *  - the LIVE head still reconstructs (a later checkpoint
    *    re-anchored the chain): the broken zone is history-only.
    *    Quarantine its version files; the live table is untouched,
    *    every still-reconstructible version reads exactly, time travel
    *    to the zone (already broken) now reports the versions as gone.
    *  - the head itself is in the broken zone: the latest commits'
    *    METADATA is unrecoverable (their part files survive on disk).
    *    Refuses by default — rolling back loses those commits — and
    *    with `allowRollback = true` quarantines the zone, re-commits
    *    the last reconstructible manifest as a FULL checkpoint (so the
    *    latest pointer is valid again), and reports the lost commits'
    *    files as `orphanedFiles` for operator re-append.
    *
    * Fenced like any maintenance op: the rollback commit CASes on the
    * post-quarantine head, so a concurrent writer makes it retry.
    * Quarantine renames are atomic; racing repairers are benign (the
    * loser's rename fails on a missing source).
    */
  def recoverLog(spark: SparkSession, dir: String,
      allowRollback: Boolean = false): RecoverReport = {
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val health = logHealth(spark, dir)
    val broken = health.collect { case (v, Left(_)) => v }
    val head = health.lastOption.map(_._1).getOrElse(0L)
    val headGood = broken.isEmpty || health.last._2.isRight
    val good = health.collect { case (v, Right(_)) => v }
    if (!headGood) {
      require(good.nonEmpty,
        s"no reconstructible version remains in $dir — the log is " +
          "beyond in-engine recovery; rebuild the manifest from known-" +
          "good data via writeManifest (tombstones will re-surface)")
      require(allowRollback,
        s"the live head v$head of $dir reconstructs through broken " +
          s"version(s) ${broken.mkString(", ")} — recovery must ROLL " +
          s"BACK to v${good.last}, losing the commits in between " +
          s"(their part files survive as re-appendable orphans). " +
          "Re-run with allowRollback = true to accept that.")
    }
    broken.foreach { v =>
      // Hadoop rename signals refusal by RETURNING FALSE (e.g. the
      // .corrupt destination already exists from a previous repair of
      // a recommitted-then-rotted version number) — fall back to a
      // stamped name so the corpse always leaves the log; a racing
      // repairer's missing-source failure is benign (verified below)
      val src = new Path(dir, versionName(v))
      val moved =
        try fs.rename(src, new Path(dir, versionName(v) + ".corrupt"))
        catch { case _: java.io.IOException => false }
      if (!moved && fs.exists(src)) {
        try fs.rename(src, new Path(dir,
          versionName(v) + s".corrupt.${System.currentTimeMillis()}")): Unit
        catch { case _: java.io.IOException => () }
      }
    }
    // POST-CONDITION, not assumption: a repair that silently left a
    // corpse in the log would claim success while readers keep failing
    // and repeated repairs never converge
    val remaining = listVersions(spark, dir).toSet
    val stuck = broken.filter(remaining.contains)
    require(stuck.isEmpty,
      s"quarantine failed for version(s) ${stuck.mkString(", ")} of $dir — " +
        "the filesystem refused the rename; repair did not complete")
    val report =
      if (headGood) RecoverReport(broken, head, None, Nil)
      else {
        val newBase = good.last
        val m = health.collectFirst { case (`newBase`, Right(mm)) => mm }.get
        // the head's content is lost: re-commit the last reconstructible
        // manifest as a full checkpoint (fenced — quarantine made
        // newBase the current head, and the corpse's renamed version
        // number is free); the commit's own pointer swap revalidates
        // the latest pointer
        writeManifestFile(spark, dir, m, Some(newBase))
        val live = versionReferencedFiles(spark, dir)
        // AGE-GATED like every sweep: a concurrent appender's just-moved
        // pre-commit files are also version-unreferenced, and only age
        // since appearance tells them from the lost commits' files — an
        // ungated report would lure the re-append runbook into
        // double-counting a live writer's batch
        val cutoff = System.currentTimeMillis() - sweepGraceMs
        val orphans = fs.listStatus(new Path(dir)).toIndexedSeq
          .filter { st =>
            val n = st.getPath.getName
            n.startsWith("part-") && !n.endsWith(".crc") &&
              !live.contains(n) && st.getModificationTime < cutoff
          }
          .map(_.getPath.getName).sorted
        RecoverReport(broken, newBase + 1, Some(head), orphans)
      }
    // DEAD-POINTER heal (both paths): the latest pointer may REDIRECT
    // into the zone just quarantined — a commit whose pointer swap ran
    // but whose version file later rotted, or one quarantined by a
    // previous repair. A redirect at a missing version fails EVERY
    // pointer read (readPruned/readManifest) until the next commit
    // swaps it; re-point it at the surviving head with the same atomic
    // write-aside + rename. Racing a concurrent commit's swap leaves
    // at worst a lag-1 pointer — the ordinary crash-window state the
    // next commit heals — BECAUSE each swap writes aside to its own
    // nonce'd tmp (see [[swapPointer]]): the two renames serialize on
    // the destination only, so neither swapper can clobber the
    // other's in-flight tmp and fail a commit that already stood.
    // (A PARSABLE full-bytes pointer is self-contained and never dies
    // this way — it is left untouched; defective bytes of either
    // shape are re-pointed below.)
    val vsAfter = listVersions(spark, dir)
    pointerRedirectTargetE(fs, dir) match {
      case Right(Some(tv)) =>
        if (!vsAfter.contains(tv)) vsAfter.lastOption.foreach { h =>
          swapPointer(fs, spark.sessionState.newHadoopConf(), dir,
            s"""{"redirect":$h}\n""".getBytes("UTF-8"))
        }
      case Right(None) =>
        // no redirect in the head bytes: a legacy full-bytes pointer
        // (self-contained IF it parses) or a missing one — but also
        // the READABLE-BUT-UNPARSABLE shape (torn/truncated
        // out-of-band overwrite), which readManifest degrades to the
        // log head forever and this arm used to leave unhealed. Probe
        // the full bytes; on a parse failure re-point at the
        // surviving head like the unreadable-bytes heal below.
        pointerDefect(fs, dir).foreach { why =>
          log.warn(s"recoverLog: latest pointer of $dir is unparsable " +
            s"($why) — re-pointing at the surviving head")
          vsAfter.lastOption.foreach { h =>
            swapPointer(fs, spark.sessionState.newHadoopConf(), dir,
              s"""{"redirect":$h}\n""".getBytes("UTF-8"))
          }
        }
      case Left(e) =>
        // pointer bytes unreadable (stale .crc after an out-of-band
        // overwrite, or rot): same heal as a dead redirect — re-point
        // at the surviving head with the atomic write-aside swap,
        // which rewrites data AND sidecar consistently
        log.warn(s"recoverLog: latest pointer of $dir is unreadable " +
          s"(${e.getMessage}) — re-pointing at the surviving head")
        vsAfter.lastOption.foreach { h =>
          swapPointer(fs, spark.sessionState.newHadoopConf(), dir,
            s"""{"redirect":$h}\n""".getBytes("UTF-8"))
        }
    }
    report
  }

  // (log truncation lives in Erasure.forgetHistory, anchored on the
  // erasure's own committed version — a newest-anchored truncate here
  // raced concurrent commits)

  /** Change data feed between two committed versions — what an
    * incremental downstream consumer pulls to catch up ("everything
    * that changed since my last sync") without re-reading the table.
    * The diff is computed at FILE granularity from the manifests (a
    * metadata decision), and when every intermediate version file
    * still exists the versions walk PAIRWISE, which makes the feed the
    * TRUE DELTA: each step's freshly-INGESTED files (batch appends,
    * upsert batches — `origin` empty) emit inserts, while
    * rewrite-origin files (staged upsert survivors, compaction folds,
    * recluster output — content the consumer's previous state already
    * holds) are skipped along with the originals they replace. A pure
    * reorganization step (compaction, recluster) therefore contributes
    * NOTHING to the feed, and an upsert contributes exactly its batch
    * — never a re-assertion of a 128 MB file's unchanged survivors
    * because 3 of its rows changed. Inductively the consumer's state
    * after applying step k's feed equals the upstream at version k+1
    * (rewrites preserve content; upserted keys arrive from the batch),
    * so the chained feed is exact.
    *
    * When intermediate versions have been vacuumed the walk falls back
    * to the conservative ENDPOINT diff: files only in `toV` re-emit as
    * inserts (including rewrite-origin content — the consumer applies
    * inserts as idempotent upserts and converges), and same-name
    * entry changes re-emit as upserts. The feed NEVER emits deletes:
    * true row deletion happens only through [[Erasure]], which
    * truncates the version log outright, so no feed window can span a
    * deletion — every file dropped between two surviving versions is a
    * rewrite-shaped reorganization whose content the same commit
    * re-asserted (staged survivors, re-ingested batch keys, compacted
    * folds). Under tombstoned deletes the chain stays readable across
    * upserts/compactions until vacuum expires it, so the true-delta
    * mode is the norm, not the lucky case.
    *
    * Rows in the feed carry `__change` ∈ {insert, upsert} (the delete
    * tag exists in the CDC convention [[graft.operators.CdcApply]]
    * consumes, but this producer can never emit one). Both endpoint
    * versions must still be valid ([[validVersions]]). Existence
    * evidence comes from ONE directory listing, not a per-file
    * RPC per step — O(1) listings per feed call.
    */
  /** One a→b feed diff plan: (inserts, upserts) file-name lists.
    * `trueDelta` = consecutive-version mode (rewrite provenance
    * usable), false = endpoint fallback (conservative re-assert).
    */
  private def feedPlanDelta(a: SkipManifest, b: SkipManifest,
      trueDelta: Boolean): (Seq[String], Seq[String]) = {
    val aByName = a.files.map(f => f.file -> f).toMap
    val bByName = b.files.map(f => f.file -> f).toMap
    val added = b.files.filterNot(f => aByName.contains(f.file))
    val inserts =
      if (trueDelta) added.filterNot(_.isRewrite).map(_.file)
      else added.map(_.file)
    val changed = a.files.filter(f =>
      bByName.get(f.file).exists(_ != f)).map(_.file)
    (inserts, changed)
  }

  /** The feed's chained (true-delta) walk, or `None` when the walk
    * cannot be trusted and [[changesBetween]] must degrade to the
    * conservative endpoint diff. `versionsSnapshot` is the caller's
    * FIRST listing — the fold inside takes its own SECOND one, and a
    * vacuum racing between the two can expire LEADING versions
    * without any parse failure (vacuum retains back to a checkpoint,
    * so the first survivor anchors cleanly): the fold then comes back
    * silently SHORTER, and an unchecked sliding(2) would emit plans
    * for the surviving suffix only, dropping the leading change
    * events. Coverage is therefore VERIFIED, never assumed — the
    * walk's versions must equal `fromV to toV` exactly.
    */
  private[sinks] def chainedFeedPlans(spark: SparkSession, dir: String,
      fromV: Long, toV: Long, onDisk: Set[String],
      versionsSnapshot: Set[Long]): Option[Seq[(Seq[String], Seq[String])]] =
    if (!(fromV to toV).forall(versionsSnapshot.contains)) None
    else try {
      // ONE forward fold over [fromV, toV] (each version file parsed
      // once) instead of two chain-walking readManifestAt per step
      val stepped = foldVersions(spark, dir, fromV, toV)((v, m) => (v, m))
      if (stepped.map(_._1) != (fromV to toV)) None
      else {
        val plans = stepped.map(_._2).sliding(2).collect {
          case Seq(ma, mb) => feedPlanDelta(ma, mb, trueDelta = true)
        }.toIndexedSeq
        val readable = plans.iterator.flatMap(p => p._1 ++ p._2)
          .forall(onDisk.contains)
        if (readable) Some(plans) else None
      }
    } catch {
      // the caller's listing is a snapshot: a concurrent vacuum can
      // expire an INTERMEDIATE version file between it and the fold
      // here, and a writer crashed mid-create can leave a truncated
      // (unparsable) version file in the chain. Both break only the
      // true-delta WALK — the endpoints were already read — so the
      // feed degrades to the conservative endpoint diff instead of
      // failing the job.
      case scala.util.control.NonFatal(_) => None
    }

  def changesBetween(spark: SparkSession, dir: String,
      fromV: Long, toV: Long): DataFrame = {
    require(fromV <= toV, s"fromV=$fromV must be <= toV=$toV")
    val onDisk = listPartFiles(spark, dir).toSet
    def read(files: Seq[String]): Option[DataFrame] =
      if (files.isEmpty) None
      else Some(spark.read.parquet(files.map(f => s"$dir/$f"): _*))
    def tag(df: DataFrame, t: String): DataFrame =
      df.withColumn("__change", lit(t))
    def planDelta(a: SkipManifest, b: SkipManifest, trueDelta: Boolean) =
      feedPlanDelta(a, b, trueDelta)
    def materialize(p: (Seq[String], Seq[String])): Seq[DataFrame] =
      read(p._1).map(tag(_, "insert")).toSeq ++
        read(p._2).map(tag(_, "upsert")).toSeq
    val a = readManifestAt(spark, dir, fromV)
    val b = readManifestAt(spark, dir, toV)
    // the chained (true-delta) walk needs every intermediate version
    // file AND every file a step would read. With tombstoned deletes
    // both survive any upsert/compaction/recluster; only vacuum can
    // break the chain, and then the walk degrades to the conservative
    // endpoint diff, which re-asserts surviving content as idempotent
    // upsert-inserts.
    val chainPlans = chainedFeedPlans(spark, dir, fromV, toV, onDisk,
      listVersions(spark, dir).toSet)
    val parts = chainPlans match {
      case Some(plans) => plans.flatMap(materialize)
      case None =>
        val p = planDelta(a, b, trueDelta = false)
        // defensive: the endpoint diff must also only read bytes that
        // exist (an out-of-band delete or a legacy eager-delete store)
        materialize((p._1.filter(onDisk.contains), p._2.filter(onDisk.contains)))
    }
    parts.reduceOption(_ unionByName _)
      .getOrElse(readPrunedWith(spark, dir, b,
        Seq((b.cols.head, Long.MinValue, Long.MaxValue - 1))).limit(0)
        .withColumn("__change", lit("insert")))
  }

  /** Expire history — THE store's physical deleter (rewrite-shaped
    * maintenance only tombstones; [[Erasure]] is the RTBF exception):
    * keep the newest `retainLast` version files, drop the rest, then
    * delete part files referenced by NO retained version and not in
    * the latest manifest — the Delta/Iceberg VACUUM move. Two classes
    * of doomed file:
    *  - tombstones whose last referencing version was just dropped —
    *    deleted regardless of age (their history is expired; a reader
    *    still pinned to an expired version is outside the retention
    *    contract, exactly Delta's VACUUM-vs-old-reader rule);
    *  - files referenced by NO version at all (crashed-writer debris)
    *    — deleted only past the [[sweepGraceMs]] age gate, because a
    *    LIVE concurrent writer's just-moved pre-commit files are also
    *    version-unreferenced and age (since appearance) is the only
    *    thing that tells them apart.
    * Returns the deleted part files.
    */
  def vacuumVersions(spark: SparkSession, dir: String, retainLast: Int): Seq[String] = {
    require(retainLast >= 1, "retainLast must be >= 1")
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val versions = listVersions(spark, dir)
    var (drop, keep) = versions.splitAt(math.max(0, versions.size - retainLast))
    // the latest POINTER may lag the log head by one crashed commit
    // (version file landed, pointer swap lost — see
    // [[readManifestBase]]): in delta mode it is a redirect whose
    // target reconstructs through version files, so that target (and
    // below, its chain) must stay retained or a vacuum inside the
    // crash window breaks every pointer read until the next commit
    // heals the pointer. Data files were always safe (`referenced`
    // unions the pointer's file set); this keeps the METADATA the
    // pointer needs alive too.
    pointerRedirectTargetE(fs, dir) match {
      case Right(t) => t.foreach { pv =>
        while (drop.nonEmpty && drop.last >= pv) {
          keep = drop.last +: keep
          drop = drop.dropRight(1)
        }
      }
      case Left(e) =>
        // the pointer's target is UNKNOWN — expiring any version could
        // break the next pointer read permanently. Retain the full
        // chain (vacuum still sweeps crash debris below) and say why;
        // recoverLog heals the pointer, after which vacuum reclaims.
        log.warn(s"vacuum: latest pointer of $dir is unreadable " +
          s"(${e.getMessage}) — retaining the full version chain this " +
          "pass; run recoverLog to heal the pointer")
        keep = drop ++ keep
        drop = drop.take(0)
    }
    // delta chains: a kept DELTA version reconstructs through its
    // predecessors — retention extends back to the nearest full
    // checkpoint so no surviving version loses its base (the
    // Delta-log rule: checkpoints bound what VACUUM may expire)
    while (keep.nonEmpty && drop.nonEmpty && isDeltaVersion(fs, dir, keep.head)) {
      keep = drop.last +: keep
      drop = drop.dropRight(1)
    }
    // referenced-name unions in ONE cheap own-names pass (vs a
    // per-version readManifestAt chain re-walk — O(versions ×
    // checkpoint parse) at the 1M-entry scale): `union of cumulative
    // states over a range = cumulative at the range start ∪ own-names
    // of the range's files` (see [[versionOwnNames]]). Two anchored
    // walks (log start for the dropped prefix, first kept version for
    // the suffix), both bounded by checkpointEvery — and all of it
    // runs BEFORE the dropped version files are deleted
    val dropSet = drop.toSet
    var dropReferenced = Set.empty[String]
    var keepReferenced = Set.empty[String]
    versions.headOption.foreach { first =>
      val anchor = readManifestAt(spark, dir, first).files.map(_.file)
      if (dropSet.contains(first)) dropReferenced ++= anchor
      else keepReferenced ++= anchor
    }
    // second anchor only when the kept suffix starts PAST the log start
    // (nothing dropped ⇒ the first walk already anchored it — don't pay
    // a second checkpoint parse, multi-second at the 1M-entry scale)
    keep.headOption.filterNot(versions.headOption.contains).foreach(kh =>
      keepReferenced ++= readManifestAt(spark, dir, kh).files.map(_.file))
    versionOwnNames(spark, dir) { (v, names) =>
      if (dropSet.contains(v)) dropReferenced ++= names
      else keepReferenced ++= names
    }
    drop.foreach(v => fs.delete(new Path(dir, versionName(v)), false): Unit)
    val referenced = keepReferenced ++
      readManifest(spark, dir).files.map(_.file).toSet
    val cutoff = System.currentTimeMillis() - sweepGraceMs
    val doomed = fs.listStatus(p).toIndexedSeq
      .filter { st =>
        val n = st.getPath.getName
        n.startsWith("part-") && !n.endsWith(".crc") && !referenced.contains(n) &&
          (dropReferenced.contains(n) || st.getModificationTime < cutoff)
      }
      .map(_.getPath.getName).sorted
    doomed.foreach(n => fs.delete(new Path(dir, n), false): Unit)
    // stranded pointer write-asides: a crash between swapPointer's
    // nonce'd tmp write and its rename leaves a dot-tmp file no reader
    // ever sees — age-gated sweep (a LIVE swap's tmp is milliseconds
    // old, never past the grace window)
    fs.listStatus(p).toIndexedSeq
      .filter(st => st.getPath.getName.startsWith(s".$ManifestName.tmp") &&
        st.getModificationTime < cutoff)
      .foreach(st => fs.delete(st.getPath, false): Unit)
    doomed
  }

  /** [[fsck]] result: `missingFiles` are manifest-listed but absent on
    * disk (data loss — pruned reads will fail), `orphanFiles` are on
    * disk but referenced by NO version (crash leftovers — invisible to
    * manifest reads, swept by maintenance), `tombstoneFiles` are on
    * disk, absent from the LATEST manifest, but still referenced by an
    * older version manifest — the normal post-upsert/compaction state
    * under deferred deletes, serving time-travel reads until
    * [[vacuumVersions]] reclaims them (NOT a defect: `clean` stays
    * true), `rowMismatches` are (file, manifestRows, actualRows)
    * disagreements (corruption or an out-of-band write),
    * `invalidVersions` are log entries time travel can no longer serve
    * (files removed/rewritten, or the version's own bytes broken —
    * [[recoverLog]] is the repair for the latter).
    *
    * Informational fields (do not flip `clean`):
    * `quarantinedVersions` — `.corrupt` corpses a past repair kept for
    * forensics; `pointerLag` — how many commits the latest pointer
    * trails the log head (1 inside the window of a commit crashed
    * between its version-file CAS and pointer swap: readers serve the
    * previous committed snapshot until the next commit heals it; −1 =
    * undeterminable); `vacuumOverdue` — tombstone bytes exceed live
    * bytes (run [[vacuumVersions]]); `staleIndexes` — persisted IVF-PQ
    * indexes at or directly under the audited directory whose corpus
    * has outgrown their train-time cell anchor
    * ([[graft.llm.Similarity.ivfPqStaleness]] trips at 4× growth):
    * they still serve CORRECTLY, but with a degraded candidate-scan
    * slope (SCALE.md: frozen cells revert the √N serve slope toward
    * 0.5) — run [[graft.llm.Similarity.ivfPqRetrain]]. The index
    * world's `vacuumOverdue`. A model sidecar that EXISTS but cannot
    * be parsed or counted lands in `unreadableFiles` instead — that
    * index cannot serve at all, a genuine defect.
    */
  final case class FsckReport(missingFiles: Seq[String], orphanFiles: Seq[String],
      rowMismatches: Seq[(String, Long, Long)], invalidVersions: Seq[Long],
      unreadableFiles: Seq[String] = Nil, tombstoneFiles: Seq[String] = Nil,
      quarantinedVersions: Seq[Long] = Nil, pointerLag: Int = 0,
      vacuumOverdue: Boolean = false,
      brokenPointer: Option[Long] = None,
      staleIndexes: Seq[String] = Nil) {
    def clean: Boolean =
      missingFiles.isEmpty && orphanFiles.isEmpty &&
        rowMismatches.isEmpty && invalidVersions.isEmpty &&
        unreadableFiles.isEmpty && brokenPointer.isEmpty
  }

  /** Store consistency audit — the operational `fsck` every table
    * format ships: cross-checks the manifest against the directory
    * LISTING (metadata-sized, the default) and optionally against
    * per-file row counts (`checkRows` — one count pass over the listed
    * files, the deep scrub a scheduled integrity job runs). Read-only:
    * reports, never repairs — orphan sweeping and manifest patching
    * stay explicit maintenance decisions.
    *
    * One known benign `rowMismatches` cause: an INTERRUPTED erasure or
    * upsert that rewrote a straddling file in place but crashed before
    * its [[patchManifest]] commit. The file then holds FEWER rows than
    * its manifest entry while the entry's stats stay a superset (pruned
    * reads remain exact); re-running the interrupted operation
    * completes the commit and clears the report. Fewer-rows-than-
    * manifest after a known maintenance crash is therefore a resumable
    * state, not corruption — more-rows or unreadable bytes are the
    * genuinely alarming classes.
    */
  def fsck(spark: SparkSession, dir: String, checkRows: Boolean = false): FsckReport = {
    val p = new Path(dir)
    val hfs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // RESILIENT health walk (never throws on a rotted version file —
    // the audit must report that state, not crash on it): referenced
    // sets come from the reconstructible versions; broken ones land in
    // invalidVersions below
    val health = logHealth(spark, dir)
    // DEAD-POINTER resilience, same rule: the latest pointer can
    // redirect at a rotted/quarantined version (the exact state
    // [[recoverLog]] exists to heal), and readManifest throws there —
    // the audit that operators run to DIAGNOSE that state must report
    // it (brokenPointer = the dead redirect target, pointerLag = -1),
    // not crash on it. The live view falls back to the last
    // reconstructible version so the rest of the report stays useful.
    val mTry = try Right(readManifest(spark, dir))
      catch { case scala.util.control.NonFatal(e) => Left(e) }
    val brokenPtr: Option[Long] =
      if (mTry.isRight) None
      else pointerRedirectTargetE(hfs, dir).toOption.flatten.orElse(Some(-1L))
    // UNSERVABLE-pointer probe (distinct from a dead redirect: here the
    // pointer FILE itself cannot serve a read — its bytes fail
    // verification (stale .crc after an out-of-band overwrite, rot) OR
    // they read fine but parse as neither a redirect nor a full
    // manifest (torn/truncated overwrite). readManifest degrades BOTH
    // shapes to the log head for liveness, so the audit must detect
    // them directly — an unparsable pointer would otherwise audit
    // clean forever while every read warns and re-derives the head. It
    // classifies with the other exists-but-cannot-read defects in
    // unreadableFiles, and recoverLog is the heal.
    val ptrUnreadable: Option[String] =
      pointerDefect(hfs, dir).map(_ => ManifestName)
    val m = mTry.getOrElse(
      health.reverseIterator.collectFirst { case (_, Right(hm)) => hm }
        .getOrElse(SkipManifest(Nil, Nil)))
    val statuses = if (hfs.exists(p)) hfs.listStatus(p).toIndexedSeq else IndexedSeq.empty
    val sizes = statuses.map(s => s.getPath.getName -> s.getLen).toMap
    val onDisk = statuses.map(_.getPath.getName)
      .filter(n => n.startsWith("part-") && !n.endsWith(".crc")).toSet
    val listed = m.files.map(_.file).toSet
    val missing = m.files.map(_.file).filterNot(onDisk)
    val historic = (m.files.map(_.file) ++ health.collect {
      case (_, Right(hm)) => hm.files.map(_.file)
    }.flatten).toSet
    val (tombstones, orphans) =
      onDisk.toSeq.sorted.filterNot(listed).partition(historic.contains)
    val (mismatches, unreadable) =
      if (!checkRows || m.files.isEmpty) (Nil, Nil)
      else {
        val present = m.files.filter(f => onDisk.contains(f.file))
        if (present.isEmpty) (Nil, Nil)
        else {
          // fast path: one pass over every listed file. CORRUPT bytes
          // are exactly what a deep scrub exists to report, so a
          // failure falls back to per-file reads that classify each
          // file instead of crashing the audit.
          def countAll(fs: Seq[FileStats]): Map[String, Long] =
            spark.read.parquet(fs.map(f => s"$dir/${f.file}"): _*)
              .groupBy(input_file_name().as("__file"))
              .agg(count(lit(1)).as("__rows"))
              .collect()
              .map(r => r.getString(0).split('/').last -> r.getAs[Long]("__rows"))
              .toMap
          val (actual, bad) =
            try (countAll(present), List.empty[String])
            catch {
              case scala.util.control.NonFatal(_) =>
                val perFile = present.map { f =>
                  try Right(f.file -> countAll(Seq(f)).getOrElse(f.file, 0L))
                  catch { case scala.util.control.NonFatal(_) => Left(f.file) }
                }
                (perFile.collect { case Right(kv) => kv }.toMap,
                  perFile.collect { case Left(n) => n }.toList)
            }
          val mm = present.filterNot(f => bad.contains(f.file)).flatMap { f =>
            val a = actual.getOrElse(f.file, 0L)
            if (a == f.rows) None else Some((f.file, f.rows, a))
          }
          (mm, bad)
        }
      }
    // time-travel validity, from the (already computed) health walk:
    // same rule as validVersions, plus broken-bytes versions
    val latestByName = m.files.map(f => f.file -> f).toMap
    val invalid = health.collect {
      case (v, Left(_)) => v
      case (v, Right(hm)) if !hm.files.forall(f =>
        onDisk.contains(f.file) && latestByName.get(f.file).forall(_ == f)) => v
    }
    // both corpse spellings count: recoverLog's plain '.corrupt' AND
    // its stamped fallback '.corrupt.<millis>' (used when the plain
    // destination already exists from a previous repair of a
    // recommitted-then-rotted version number) — an audit that only saw
    // the first would report a re-repaired store as quarantine-free
    val quarantined = statuses.map(_.getPath.getName).flatMap { n =>
      val stripped = CorruptSuffixRe.replaceFirstIn(n, "")
      if (stripped == n) None
      else stripped match {
        case VersionRe(v) => Some(v.toLong)
        case _ => None
      }
    }.distinct.sorted
    val head = health.lastOption.map(_._1).getOrElse(0L)
    val lag: Int =
      if (brokenPtr.isDefined) -1
      else if (health.isEmpty) 0
      else if (ptrUnreadable.isDefined) -1 // bytes unverifiable: lag unknowable
      else pointerRedirectTargetE(hfs, dir).toOption.flatten match {
        case Some(t) => (head - t).toInt
        case None =>
          // full-bytes pointer: identify which version's content it
          // holds by structural equality against the walk
          health.reverseIterator.collectFirst {
            case (v, Right(hm)) if hm == m => (head - v).toInt
          }.getOrElse(-1)
      }
    val liveBytes = m.files.iterator.flatMap(f => sizes.get(f.file)).sum
    val tombBytes = tombstones.iterator.flatMap(sizes.get).sum
    // Persisted-index staleness audit (VERDICT r18 item 6): an operator
    // running fsck on a directory holding (or containing) a persisted
    // IVF-PQ index gets the staleness verdict in the SAME report as the
    // store's — previously `ivfPqStaleness` existed but nothing
    // operational surfaced it. Candidates: the audited dir itself and
    // its immediate subdirectories (the layout both gates use — index
    // dirs beside or under the table dir); an index's own `cell=K/`
    // children never carry a sidecar, so they can't double-report.
    val sidecar = graft.llm.Similarity.IvfPqModelFile
    val indexDirs = (IndexedSeq(p) ++
        statuses.filter(_.isDirectory).map(_.getPath))
      .filter { d =>
        try hfs.exists(new Path(d, sidecar))
        catch { case scala.util.control.NonFatal(_) => false }
      }
    val indexAudits = indexDirs.map { d =>
      val rel = if (d == p) "." else d.getName
      try Right(rel -> graft.llm.Similarity.ivfPqStaleness(spark, d.toString))
      catch {
        case scala.util.control.NonFatal(_) => Left(s"$rel/$sidecar")
      }
    }
    val staleIdx = indexAudits.collect { case Right((rel, st)) if st.stale => rel }
    val badSidecars = indexAudits.collect { case Left(f) => f }
    FsckReport(missing, orphans, mismatches, invalid,
      unreadable ++ badSidecars ++ ptrUnreadable, tombstones,
      quarantined, lag, tombBytes > liveBytes && tombBytes > 0L, brokenPtr,
      staleIdx)
  }

  /** COUNT/MIN/MAX answered from the MANIFEST alone — zero data files
    * opened (the Delta/Iceberg "metadata-only query" move: row counts
    * sum from the per-file entries, bounds fold from the per-file
    * min/max, and both already ignore NULLs exactly as SQL MIN/MAX
    * do). At 100 TB the difference is a driver-side fold over a JSON
    * sidecar versus a full-table scan. Returns one row
    * (n_rows, min_k, max_k); bounds are NULL when every value in the
    * column is NULL. All-null files are identified by their recorded
    * null count (`nulls(i) == rows`) when the manifest carries one, so
    * a column whose GENUINE extreme is Long.MaxValue/MinValue (the
    * `coalesce(k, Long.MaxValue)` layout idiom) still reports exact
    * bounds; only legacy (null-count-free) manifests fall back to
    * treating the empty-range sentinels as the all-null marker.
    */
  def metadataSummary(spark: SparkSession, dir: String, keyCol: String): DataFrame = {
    val m = readManifest(spark, dir)
    val i = m.cols.indexOf(keyCol)
    require(i >= 0, s"column '$keyCol' has no stats in $dir/$ManifestName " +
      s"(stats cols: ${m.cols.mkString(", ")})")
    val rows = m.files.map(_.rows).sum
    def hasValue(f: FileStats): Boolean =
      if (f.nulls.nonEmpty) f.nulls(i) < f.rows
      else f.mins(i) != Long.MaxValue || f.maxs(i) != Long.MinValue
    val valued = m.files.filter(hasValue)
    val minK = valued.map(_.mins(i)).minOption.map(java.lang.Long.valueOf).orNull
    val maxK = valued.map(_.maxs(i)).maxOption.map(java.lang.Long.valueOf).orNull
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      Seq(org.apache.spark.sql.Row(rows, minK, maxK)).asJava,
      org.apache.spark.sql.types.StructType.fromDDL(
        "n_rows LONG, min_k LONG, max_k LONG"))
  }

  /** EXPORT an immutable copy of the table AS OF a committed version —
    * the "pin this training run to a snapshot" move (Delta DEEP CLONE
    * at a version): the snapshot's files copy byte-for-byte into
    * `destDir` and its manifest commits there as version 1, so the
    * export is a fully self-contained skipping store that no
    * erasure/compaction/vacuum on the SOURCE can invalidate — the
    * reproducibility guarantee [[readPrunedAt]] alone cannot give
    * (time travel dies when maintenance removes the referenced files,
    * [[validVersions]]). The destination must be a FRESH directory:
    * an existing store there (manifest present) fails loudly, and
    * stray part/version files from a crashed prior export are swept
    * before copying. Cost = the snapshot's bytes (a deep copy is
    * the point; the manifest's relative file names make a zero-copy
    * shallow clone impossible and UNDESIRABLE here — a shallow clone
    * would silently break under source-side erasure).
    */
  def exportSnapshot(spark: SparkSession, dir: String, version: Long,
      destDir: String): SkipManifest = {
    require(validVersions(spark, dir).contains(version),
      s"version $version of $dir is not serveable (vacuumed, erased, " +
        s"or rewritten in place); valid: ${validVersions(spark, dir).mkString(", ")}")
    val m = readManifestAt(spark, dir, version)
    val conf = spark.sessionState.newHadoopConf()
    val src = new Path(dir)
    val dst = new Path(destDir)
    val fs = dst.getFileSystem(conf)
    // the destination must not already be a live store: exporting over
    // one would mix stale part files with the fresh manifest (orphans +
    // a misleading version log). A COMPLETE store always has a manifest
    // (it commits last), so its presence fails loudly. Part/version
    // files WITHOUT a manifest are only sweepable when the in-progress
    // marker proves a prior EXPORT left them: ordinary Spark parquet
    // output also has manifest-free part files, and silently sweeping
    // it would destroy a user's data before any guard could fire — so
    // an unmarked non-empty destination refuses instead.
    require(!fs.exists(new Path(dst, ManifestName)),
      s"destination $destDir already holds a skipping store " +
        s"($ManifestName exists) — export into a fresh directory")
    fs.mkdirs(dst): Unit
    val marker = new Path(dst, ExportMarkerName)
    val leftovers = fs.listStatus(dst).map(_.getPath).filter { p =>
      val n = p.getName
      (n.startsWith("part-") && !n.endsWith(".crc")) ||
        VersionRe.pattern.matcher(n).matches()
    }
    if (leftovers.nonEmpty) {
      require(fs.exists(marker),
        s"destination $destDir holds part/version files but no " +
          s"$ExportMarkerName marker: that is someone's data, not a " +
          "crashed export's leftovers — export into a fresh directory")
      leftovers.foreach(p => fs.delete(p, false): Unit)
    }
    // marker FIRST: it brands everything that lands after it as this
    // export's debris until the manifest commit completes, which is
    // what entitles a retry to sweep
    val mo = fs.create(marker, true); mo.close()
    // per-file copies are independent and the export is DATA-sized —
    // the one store operation whose cost is the table, not the hit
    // list — so they run under a bounded pool instead of one at a
    // time through the driver (guide §2.6; the compactPartitions
    // pattern). Commit protocol unchanged: marker first, every copy
    // lands before the manifest commit, a failure (rethrown after the
    // pool drains) leaves marker-branded debris a retry sweeps.
    if (m.files.nonEmpty) {
      val srcFs = src.getFileSystem(conf)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(16, m.files.size))
      try {
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutorService(pool)
        val tries = scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(m.files.map(f =>
            scala.concurrent.Future(scala.util.Try {
              org.apache.hadoop.fs.FileUtil.copy(
                srcFs, new Path(src, f.file),
                fs, new Path(dst, f.file),
                false, true, conf): Unit
            }))),
          scala.concurrent.duration.Duration(6, "hours"))
        tries.foreach(t => if (t.isFailure) throw t.failed.get)
      } finally pool.shutdown()
    }
    writeManifestFile(spark, destDir, m)
    fs.delete(marker, false): Unit
    m
  }

  /** Crashed-export marker: present at a destination from the moment an
    * export starts until its manifest commits, so a RETRY can prove the
    * part/version files it finds there are its predecessor's debris and
    * not a user's parquet directory.
    */
  val ExportMarkerName = "_export_inprogress"

  /** Parse the manifest back (hand-rolled like the writer — the format
    * is ours, one file object per line between the header/footer lines;
    * v1 manifests without bloom fields parse with empty sidecars).
    */
  def readManifest(spark: SparkSession, dir: String): SkipManifest = {
    val mf = new Path(dir, ManifestName)
    val fs = mf.getFileSystem(spark.sessionState.newHadoopConf())
    // read the POINTER's bytes under a tight catch: unreadable bytes
    // (ChecksumException after an out-of-band overwrite, rot) or an
    // unparsable full-bytes pointer degrade to the log head — the
    // version files are the CAS arbiter and recoverLog's own heal
    // target, so the head IS the committed truth; the pointer is its
    // publication cache. A missing pointer and a readable-but-DEAD
    // redirect keep today's loud behavior (FileNotFound propagates;
    // readManifestAt stays loud for readers — fsck classifies it).
    val textE: Either[Throwable, String] =
      try {
        val in = fs.open(mf)
        try Right(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
        finally in.close()
      } catch {
        case e: java.io.FileNotFoundException => throw e
        case e: java.io.IOException => Left(e)
      }
    def headFallback(cause: Throwable): SkipManifest = {
      val head = currentVersion(spark, dir)
      if (head == 0L) throw cause // nothing to fall back to
      log.warn(s"latest pointer of $dir is unreadable (${cause.getMessage})" +
        s" — serving the log head v$head; run recoverLog to heal the pointer")
      readManifestAt(spark, dir, head)
    }
    textE match {
      case Left(e) => headFallback(e)
      case Right(text) =>
        RedirectRe.findPrefixMatchOf(text) match {
          case Some(mt) => readManifestAt(spark, dir, mt.group(1).toLong)
          case None =>
            try parseManifest(text, mf)
            catch { case e: IllegalStateException => headFallback(e) }
        }
    }
  }

  private val RedirectRe = """\{"redirect":(\d+)\}""".r

  /** Full-verification pointer probe: Some(defect) when the latest
    * pointer EXISTS but cannot serve a read — its bytes fail
    * verification (stale `.crc` after an out-of-band overwrite, rot;
    * the IOException shape) OR they read fine but parse as neither a
    * delta redirect nor a full manifest (a torn/truncated out-of-band
    * overwrite; the IllegalStateException shape). [[readManifest]]
    * degrades both to the log head for liveness, which would hide the
    * defect from every diagnostic if nothing probed the pointer
    * directly: [[fsck]] classifies it (unreadableFiles + pointerLag
    * −1) and [[recoverLog]] heals it by re-pointing at the surviving
    * head. A missing pointer is NOT a defect (loud elsewhere), and a
    * redirect at a quarantined version is the separate dead-redirect
    * diagnosis (brokenPointer).
    */
  private def pointerDefect(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Option[String] = {
    val mfp = new Path(dir, ManifestName)
    try {
      if (!fs.exists(mfp)) None
      else {
        val in = fs.open(mfp)
        val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        if (RedirectRe.findPrefixMatchOf(text).isDefined) None
        else {
          try { parseManifest(text, mfp); None }
          catch { case e: IllegalStateException => Some(e.getMessage) }
        }
      }
    } catch {
      case _: java.io.FileNotFoundException => None // raced delete: missing, not defective
      case e: java.io.IOException => Some(e.getMessage)
    }
  }

  /** The version the latest pointer redirects to, if it is a
    * delta-mode redirect (Right(None) for a legacy full-manifest
    * pointer or a missing one). Reads only the pointer's first bytes.
    *
    * Left(e) = the pointer file EXISTS but its bytes cannot be read —
    * on a checksummed filesystem this is how an out-of-band overwrite
    * surfaces (a raw write updates the data but not the `.crc`
    * sidecar, so the next Hadoop read throws ChecksumException; found
    * live in round 19 when a harness nio-wrote a pointer swapPointer
    * had Hadoop-written). Callers choose the degrade: reads fall back
    * to the log head, vacuum retains conservatively, [[recoverLog]]
    * heals, [[fsck]] classifies — none of them crash.
    */
  private def pointerRedirectTargetE(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Either[java.io.IOException, Option[Long]] = {
    val mf = new Path(dir, ManifestName)
    if (!fs.exists(mf)) return Right(None)
    try {
      val in = fs.open(mf)
      val head = try {
        // a single in.read may legally return SHORT on HCFS streams; a
        // short head would fail the redirect match and silently disarm
        // vacuum's crash-window retention and the quarantine guard —
        // read until 64 bytes or EOF
        val b = new Array[Byte](64)
        var off = 0
        var n = in.read(b, off, b.length - off)
        while (n > 0) {
          off += n
          n = if (off < b.length) in.read(b, off, b.length - off) else -1
        }
        new String(b, 0, off, "UTF-8")
      } finally in.close()
      Right(RedirectRe.findPrefixMatchOf(head).map(_.group(1).toLong))
    } catch {
      case e: java.io.FileNotFoundException => throw e // raced delete: caller's exists() world
      case e: java.io.IOException => Left(e)
    }
  }

  private val ColsRe = ("""\{"cols":\[([^\]]*)\]""" +
    """(?:,"bloomCols":\[([^\]]*)\],"bloomExpected":(\d+),"bloomFpp":([0-9.eE+-]+))?""" +
    ""","files":\[""").r
  private val FileRe = ("""\{"file":"([^"]+)","rows":(\d+),"mins":\[([^\]]*)\],"maxs":\[([^\]]*)\]""" +
    """(?:,"nulls":\[([^\]]*)\])?(?:,"blooms":\[([^\]]*)\])?(?:,"origin":"([^"]*)")?\},?""").r

  private def parseManifest(text: String, p: Path): SkipManifest = {
    def corrupt(why: String): Nothing =
      throw new IllegalStateException(s"corrupt skip manifest $p: $why")
    def names(s: String): Seq[String] =
      if (s == null || s.isEmpty) Nil
      else s.split(',').map(_.stripPrefix("\"").stripSuffix("\"")).toIndexedSeq
    val lines = text.linesIterator.map(_.trim).filter(_.nonEmpty).toVector
    if (lines.isEmpty) corrupt("empty")
    val (cols, bloomCols, bloomExpected, bloomFpp) = lines.head match {
      case ColsRe(cs, bcs, be, bf) =>
        (names(cs), names(bcs),
          if (be == null) DefaultBloomExpected else be.toLong,
          if (bf == null) DefaultBloomFpp else bf.toDouble)
      case _ => corrupt(s"bad header '${lines.head}'")
    }
    // the serialized form always ends with a `]}` line: a write
    // truncated at a LINE boundary would otherwise parse silently
    // minus its tail entries (FileRe tolerates the joining comma) —
    // silent file loss on read. Truncation must be LOUD.
    if (lines.last != "]}") corrupt("missing ']}' terminator (truncated write)")
    val files = parseEntries(lines.tail.dropRight(1),
      cols.length, bloomCols.length, corrupt)
    SkipManifest(cols, files, bloomCols, bloomExpected, bloomFpp)
  }

  /** Parse FileStats lines (shared by full manifests and deltas —
    * deltas validate against the BASE's arities).
    */
  private def parseEntries(lines: Seq[String], nCols: Int, nBloomCols: Int,
      corrupt: String => Nothing): IndexedSeq[FileStats] = {
    def names(s: String): Seq[String] =
      if (s == null || s.isEmpty) Nil
      else s.split(',').map(_.stripPrefix("\"").stripSuffix("\"")).toIndexedSeq
    def longs(s: String): Seq[Long] =
      if (s.isEmpty) Nil
      else s.split(',').map { x =>
        try x.toLong
        catch { case _: NumberFormatException => corrupt(s"non-long '$x'") }
      }.toIndexedSeq
    lines.map {
      case FileRe(f, r, mi, ma, nu, bl, og) =>
        val (mins, maxs) = (longs(mi), longs(ma))
        if (mins.length != nCols || maxs.length != nCols)
          corrupt(s"file '$f' stats arity != $nCols")
        // nulls is optional (legacy manifests): absent ⇒ Nil ⇒ unknown
        val nulls = if (nu == null) Nil else longs(nu)
        if (nulls.nonEmpty && nulls.length != nCols)
          corrupt(s"file '$f' nulls arity ${nulls.length} != $nCols")
        val blooms = names(bl)
        if (blooms.length != nBloomCols)
          corrupt(s"file '$f' bloom arity ${blooms.length} != $nBloomCols")
        FileStats(f, r.toLong, mins, maxs, blooms, nulls,
          if (og == null) "" else og)
      case l => corrupt(s"bad file line '$l'")
    }.toIndexedSeq
  }

  /** Range query with file skipping: keep only the files whose
    * [min, max] intersects EVERY bound, read just those, and apply the
    * residual predicate. `bounds` are inclusive (col, lo, hi) on
    * manifest stats columns. Result == full-scan filter, always; the
    * layout only decides how many files the listing keeps.
    */
  def readPruned(spark: SparkSession, dir: String,
      bounds: Seq[(String, Long, Long)]): DataFrame = {
    warnIfPointerLags(spark, dir)
    readPrunedWith(spark, dir, readManifest(spark, dir), bounds)
  }

  /** Crash-window staleness OBSERVABILITY (the design keeps read-side
    * repair out — it would race the commit path): between a commit's
    * version-file CAS and its pointer swap, readers serve the previous
    * committed snapshot, bounded by commit cadence. Detection is two
    * tiny RPCs (64-byte pointer head + one exists probe), delta-mode
    * pointers only (full-bytes pointers would need a manifest compare —
    * [[fsck]]'s `pointerLag` covers those), and best-effort: never
    * throws, never blocks the read.
    */
  private def warnIfPointerLags(spark: SparkSession, dir: String): Unit =
    try {
      val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
      pointerRedirectTargetE(fs, dir).toOption.flatten.foreach { t =>
        if (fs.exists(new Path(dir, versionName(t + 1))))
          log.warn(s"latest pointer of $dir lags the version log (serves " +
            s"v$t while v${t + 1} is committed — a writer crashed between " +
            "its version-file CAS and pointer swap): reading the previous " +
            "committed snapshot until the next commit heals the pointer")
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def readPrunedWith(spark: SparkSession, dir: String, m: SkipManifest,
      bounds: Seq[(String, Long, Long)]): DataFrame = {
    require(bounds.nonEmpty, "bounds must be non-empty")
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

  /** Point-lookup with file skipping: read only the files that might
    * contain one of `keys` (Long or String), per the Bloom sidecar when
    * `keyCol` has one, intersected with the min/max range when it has
    * long stats. Works on NON-layout keys — exactly where min/max alone
    * degrades to a full scan — and the residual `IN` filter keeps the
    * result identical to the full scan's.
    */
  def readPrunedKeys(spark: SparkSession, dir: String, keyCol: String,
      keys: Seq[Any]): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    val m = readManifest(spark, dir)
    val keep = candidateFiles(m, keyCol, keys, s"$dir/$ManifestName")
    // the residual IN: literals for lookup-sized lists, a broadcast
    // semi-join past Erasure.IsinMaxKeys (a million-literal IN is a
    // million-node expression tree; the join probes a hash set per row)
    def residual(df: DataFrame): DataFrame =
      if (keys.lengthCompare(Erasure.IsinMaxKeys) <= 0)
        df.filter(col(keyCol).isin(keys: _*))
      else
        df.join(broadcast(Erasure.keyListDf(spark, keys, "__wanted")),
          col(keyCol) === col("__wanted"), "left_semi")
    if (keep.isEmpty)
      residual(spark.read.parquet(dir)).limit(0)
    else
      residual(spark.read.parquet(keep.map(f => s"$dir/${f.file}"): _*))
  }

  /** Files that might contain any of `keys` on `keyCol` — the shared
    * candidate set of [[readPrunedKeys]] and [[Erasure]]. Bloom and
    * range evidence intersect when both exist; at least one must.
    * String keys require a Bloom sidecar (range stats are long-only).
    *
    * SUBLINEAR in the key list (erasure lists run to [[Erasure]]'s
    * 1M-key guard against 100k-file manifests — a naive
    * keys-per-file loop is the driver bottleneck there): long keys
    * sort ONCE, each file's range intersection is then a binary search
    * (O(files · log keys)), and the Bloom sidecar — when present — is
    * probed with only the keys INSIDE that file's range (already
    * adjacent in the sorted array), early-exiting on the first hit.
    * Bloom-only (string) keys pre-encode their UTF-8 probe bytes once
    * instead of re-encoding per file.
    */
  private[sinks] def candidateFiles(m: SkipManifest, keyCol: String,
      keys: Seq[Any], where: String): Seq[FileStats] = {
    val si = m.cols.indexOf(keyCol)
    val bi = m.bloomCols.indexOf(keyCol)
    val longKeys = keys.collect { case l: Long => l; case i: Int => i.toLong }
    val rangeUsable = si >= 0 && longKeys.length == keys.length
    require(rangeUsable || bi >= 0,
      s"column '$keyCol' has no usable sidecar for these keys in $where " +
        s"(stats cols: ${m.cols.mkString(", ")}; bloom cols: ${m.bloomCols.mkString(", ")}; " +
        s"string keys need a bloom sidecar)")
    if (rangeUsable) {
      val sorted = longKeys.toArray
      java.util.Arrays.sort(sorted)
      m.files.filter { f =>
        val lo = f.mins(si)
        val hi = f.maxs(si)
        var i = java.util.Arrays.binarySearch(sorted, lo)
        if (i < 0) i = -i - 1 // insertion point: first key >= lo
        i < sorted.length && sorted(i) <= hi && (bi < 0 || {
          val bloom = f.bloom(bi)
          var hit = false
          while (!hit && i < sorted.length && sorted(i) <= hi) {
            hit = bloom.mightContainLong(sorted(i)); i += 1
          }
          hit
        })
      }
    } else {
      // bloom-only: encode each key's probe form ONCE (a string key
      // re-encoded per file dominates the probe itself)
      val probes: Array[Either[Array[Byte], Long]] = keys.iterator.map {
        case s: String => Left(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        case l: Long   => Right(l)
        case i: Int    => Right(i.toLong)
        case other => throw new IllegalArgumentException(
          s"bloom probe supports Long and String keys, got ${other.getClass.getName}")
      }.toArray
      m.files.filter { f =>
        val bloom = f.bloom(bi)
        probes.exists {
          case Left(b)  => bloom.mightContainBinary(b)
          case Right(l) => bloom.mightContainLong(l)
        }
      }
    }
  }
}
