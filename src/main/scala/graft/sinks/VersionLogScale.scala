package graft.sinks

import java.nio.file.{Files, Paths}

import graft.GraftSession

/** Microbench for the store's VERSION-COUNT axis (the entry-count axis
  * is [[ManifestScale]]): a streaming ingest committing every minute
  * between weekly vacuums accrues ~10k KB-sized delta version files,
  * and several operations walk or list the whole log —
  *  - `listVersions` (every fenced op's base capture): ONE directory
  *    listStatus, O(versions) entries in the result, not O(versions)
  *    RPCs;
  *  - a fenced delta COMMIT (the per-trigger ingest cost): listing +
  *    CAS + pointer swap;
  *  - `readManifest` (every reader's pointer read): redirect + a walk
  *    bounded by checkpointEvery, NOT by the version count;
  *  - `versionReferencedFiles` (the orphan sweep inside
  *    compaction/recluster, and fsck): opens EVERY version file — the
  *    genuine O(versions) cost; the names-only fold keeps the
  *    per-version work at O(delta), never O(table);
  *  - the feed walk over a recent window (`foldVersions` bounded to
  *    the window, one parse per window file);
  *  - `vacuumVersions` (the cure: expires the backlog).
  *
  * Synthesizes the log directly in the store's serialized formats —
  * v1 full checkpoint (`baseEntries` files), then alternating deltas
  * (each adds one rolling entry and removes the previous one — the
  * steady-state shape of a compacted streaming store) with a full
  * checkpoint every `checkpointEvery` versions, pointer redirecting to
  * the head. Data files are irrelevant to every measured op except the
  * sweep's LISTING (none exist; the sweep sees zero part files, which
  * isolates the metadata walk — exactly what this bench is for).
  *
  * Usage: `runMain graft.sinks.VersionLogScale [versions] [baseEntries]
  * [checkpointEvery]` (default 10000, 1000, adaptive). The third axis
  * backs the deployment claim that checkpoint cadence is the walk-cost
  * knob at bigger entry counts: the referenced-name walk is checkpoint-
  * listing-bound (V/K full listings of E names), so K=100 should cut
  * it ~10× at the price of ≤K-delta pointer reconstruction. The
  * default `adaptive` exercises the production policy
  * ([[DataSkipping.checkpointCadence]]: K = clamp(E/200, 10, 1000) —
  * E=1k → 10, E=20k → 100); a numeric value pins a static cadence.
  * Prints one JSON line; numbers go in SCALE.md.
  */
object VersionLogScale {
  def main(args: Array[String]): Unit = {
    val versions = args.headOption.map(_.toInt).getOrElse(10000)
    val baseEntries = args.lift(1).map(_.toInt).getOrElse(1000)
    require(versions >= 2)
    val spark = GraftSession.getOrCreate("graft-versionlog-scale")
    sys.props("graft.store.deltaThreshold") = "1"
    val ckptEvery = args.lift(2).filterNot(_ == "adaptive") match {
      case Some(s) =>
        // a pinned static cadence: the commit path must match it
        sys.props("graft.store.checkpointEvery") = s
        s.toInt
      case None =>
        // the production policy: leave the override UNSET so the timed
        // commit below exercises the adaptive path too
        sys.props.remove("graft.store.checkpointEvery"): Unit
        DataSkipping.checkpointCadence(baseEntries + 1).toInt
    }
    val dir = Files.createTempDirectory("graft-versionlog-scale").toString
    // the POINTER must go through the Hadoop fs: the engine's own
    // pointer swaps (patchManifest below) write a `.crc` sidecar on
    // the local ChecksumFileSystem, and a later raw nio overwrite
    // would leave that sidecar stale — the next Hadoop read throws
    // ChecksumException (found live: this harness corrupted its own
    // store in round 19's first campaign run). Synthetic VERSION
    // files stay nio-written — the engine never Hadoop-writes those
    // names here, so no sidecar exists to go stale.
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def writePointer(v: Long): Unit = {
      val out = hfs.create(
        new org.apache.hadoop.fs.Path(dir, DataSkipping.ManifestName), true)
      try out.write(s"""{"redirect":$v}\n""".getBytes("UTF-8")) finally out.close()
    }

    def entry(name: String, lo: Long): String =
      s"""{"file":"$name","rows":100,"mins":[$lo],"maxs":[${lo + 99}],"nulls":[0]}"""
    def baseName(i: Int) = f"part-base-$i%07d.snappy.parquet"
    def rollName(v: Int) = f"part-roll-$v%07d.snappy.parquet"
    def fullManifest(upToV: Int): String = {
      val sb = new StringBuilder
      sb ++= """{"cols":["a"],"files":[""" + "\n"
      var i = 0
      while (i < baseEntries) {
        if (i > 0) sb ++= ",\n"
        sb ++= entry(baseName(i), i.toLong * 100)
        i += 1
      }
      if (upToV >= 2) sb ++= ",\n" + entry(rollName(upToV), upToV.toLong * 100)
      sb ++= "\n]}\n"
      sb.toString
    }
    // v1: full checkpoint of the base table
    Files.write(Paths.get(dir, DataSkipping.versionName(1L)),
      fullManifest(1).getBytes("UTF-8")): Unit
    // v2..versions: rolling one-in-one-out deltas, checkpoint every K-th
    var v = 2
    while (v <= versions) {
      val bytes =
        if (v % ckptEvery == 0) fullManifest(v)
        else {
          val removed = if (v == 2) "" else "\"" + rollName(v - 1) + "\""
          s"""{"delta":true,"removed":[$removed],"files":[""" + "\n" +
            entry(rollName(v), v.toLong * 100) + "\n]}\n"
        }
      Files.write(Paths.get(dir, DataSkipping.versionName(v.toLong)),
        bytes.getBytes("UTF-8")): Unit
      v += 1
    }
    writePointer(versions.toLong)

    def time[A](op: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = op
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def best[A](op: => A): Double = { op; (1 to 3).map(_ => time(op)._2).min }

    val listS = best(DataSkipping.listVersions(spark, dir))
    val readS = best(DataSkipping.readManifest(spark, dir))
    val m = DataSkipping.readManifest(spark, dir)
    require(m.files.size == baseEntries + 1, s"reconstruct mismatch: ${m.files.size}")

    // the per-trigger ingest commit a streaming store pays at this
    // backlog: fence capture (listing) + hit-sized delta + CAS + swap
    val (_, commitS) = time(DataSkipping.patchManifest(spark, dir,
      Seq(rollName(versions)), Nil,
      Some(DataSkipping.currentVersion(spark, dir)), known = Some(m)))

    // maintenance metadata walks at full backlog: the names-only fold
    // (what vacuum/sweep use) vs the full-manifest fold (what they
    // used before — applyDelta's O(table) rebuild per version)
    val refS = best(DataSkipping.versionReferencedFiles(spark, dir))
    val fullFoldS = best(DataSkipping.foldVersions(spark, dir)((_, mm) =>
      mm.files.size))
    val feedWindowS = best(DataSkipping.foldVersions(spark, dir,
      fromV = (versions - 100).toLong, toV = versions.toLong)((_, mm) => mm.files.size))

    // the cure: expire the backlog, then re-measure the sweep's walk
    val (vacuumed, vacS) = time(DataSkipping.vacuumVersions(spark, dir, retainLast = 100))
    val refAfterS = best(DataSkipping.versionReferencedFiles(spark, dir))

    // INCREMENTAL follow-up (VERDICT r17 item 6): accrue a fresh,
    // 10×-smaller backlog and vacuum again — the second vacuum must be
    // NEW-backlog-sized, never history-sized. No persisted anchor is
    // needed for that: the first vacuum DELETED the dropped version
    // files, so the next walk's listVersions sees only survivors —
    // the own-names walk is survivor-bounded by construction.
    val head0 = DataSkipping.currentVersion(spark, dir)
    val post = math.max(versions / 10, 100)
    var pv = head0 + 1
    while (pv <= head0 + post) {
      val bytes =
        if (pv % ckptEvery == 0) fullManifest(pv.toInt)
        else
          s"""{"delta":true,"removed":["${rollName(pv.toInt - 1)}"],"files":[""" +
            "\n" + entry(rollName(pv.toInt), pv * 100) + "\n]}\n"
      Files.write(Paths.get(dir, DataSkipping.versionName(pv)),
        bytes.getBytes("UTF-8")): Unit
      pv += 1
    }
    writePointer(head0 + post)
    val (vac2, vac2S) = time(DataSkipping.vacuumVersions(spark, dir, retainLast = 100))

    println(
      s"""{"versions":$versions,"base_entries":$baseEntries,"checkpoint_every":$ckptEvery,""" +
        s""""cadence_policy":"${if (sys.props.contains("graft.store.checkpointEvery")) "static" else "adaptive"}",""" +
        s""""list_versions_s":${"%.3f".format(listS)},""" +
        s""""pointer_read_s":${"%.3f".format(readS)},""" +
        s""""delta_commit_s":${"%.3f".format(commitS)},""" +
        s""""referenced_walk_s":${"%.3f".format(refS)},""" +
        s""""full_fold_s":${"%.3f".format(fullFoldS)},""" +
        s""""feed_window100_s":${"%.3f".format(feedWindowS)},""" +
        s""""vacuum_s":${"%.3f".format(vacS)},""" +
        s""""vacuumed_files":${vacuumed.size},""" +
        s""""referenced_walk_after_vacuum_s":${"%.3f".format(refAfterS)},""" +
        s""""post_versions":$post,""" +
        s""""second_vacuum_s":${"%.3f".format(vac2S)},""" +
        s""""second_vacuumed_files":${vac2.size}}""")
    spark.stop()
  }
}
