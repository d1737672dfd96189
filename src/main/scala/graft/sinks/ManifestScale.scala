package graft.sinks

import java.nio.file.{Files, Paths}

import graft.GraftSession

/** Microbench for the store's 100×-scale cliff candidate (VERDICT r15
  * item 2): the skip manifest and its version log are single JSON
  * files rewritten whole on every commit. At 1M file entries (a
  * ~100 TB table at 100 MB/file) the per-commit parse + rewrite and
  * the driver heap are the costs to measure — if either is
  * super-linear or takes whole seconds, the log needs checkpointing
  * (the Delta/Iceberg move); if both are bounded, the single-file
  * format survives the scale-up and the numbers go in SCALE.md.
  *
  * Synthesizes a manifest in the store's own serialized format (2
  * stats columns + null counts, range-clustered entries), writes it
  * plus one version file, then times:
  *  - readManifest (full parse);
  *  - patchManifest dropping 5 entries (read + rewrite + version
  *    commit — the metadata cost of EVERY maintenance commit, no data
  *    I/O involved);
  *  - candidateFiles with a 10k-key lookup (the erasure/upsert
  *    planning path);
  *  - resident heap of the parsed manifest.
  *
  * Usage: `runMain graft.sinks.ManifestScale [entries]` (default 1M).
  * Prints one JSON line; numbers land in SCALE.md.
  */
object ManifestScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val spark = GraftSession.getOrCreate("graft-manifest-scale")
    val dir = Files.createTempDirectory("graft-manifest-scale").toString

    // entries in the writer's exact format: file i covers keys
    // [i*1000, i*1000+999] on col a, a second overlapping col b
    val sb = new StringBuilder(n * 96)
    sb ++= """{"cols":["a","b"],"files":[""" + "\n"
    var i = 0
    while (i < n) {
      if (i > 0) sb ++= ",\n"
      val lo = i.toLong * 1000L
      sb ++= f"""{"file":"part-$i%07d.snappy.parquet","rows":100000,"mins":[$lo,0],"maxs":[${lo + 999L},9973],"nulls":[0,0]}"""
      i += 1
    }
    sb ++= "\n]}\n"
    val bytes = sb.toString.getBytes("UTF-8")
    Files.write(Paths.get(dir, DataSkipping.ManifestName), bytes): Unit
    Files.write(Paths.get(dir, DataSkipping.versionName(1L)), bytes): Unit
    val mb = bytes.length / 1e6

    def time[A](op: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = op
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // warm once (JIT, FS cache), then measure min-of-3
    def best[A](op: => A): Double = { op; (1 to 3).map(_ => time(op)._2).min }

    val readS = best(DataSkipping.readManifest(spark, dir))
    val m = DataSkipping.readManifest(spark, dir)
    require(m.files.size == n, s"parse mismatch: ${m.files.size} != $n")

    // FULL-rewrite commit (the legacy path / checkpoint cost): drop 5
    // entries, no rewritten files => zero data I/O; pure metadata
    // (parse + diff + serialize whole + CAS commit)
    val doomed1 = m.files.take(5).map(_.file)
    val (_, patchFullS) = time(
      DataSkipping.patchManifest(spark, dir, doomed1, Nil,
        Some(DataSkipping.currentVersion(spark, dir)), forceCheckpoint = true))

    // DELTA commit (the at-scale path, entries >= deltaThreshold):
    // same hit-sized patch with the manifest already in hand (the
    // shape every maintenance op has) — serialize KB, not the table
    val m2 = DataSkipping.readManifest(spark, dir)
    val doomed2 = m2.files.slice(5, 10).map(_.file)
    val (_, patchDeltaS) = time(
      DataSkipping.patchManifest(spark, dir, doomed2, Nil,
        Some(DataSkipping.currentVersion(spark, dir)), known = Some(m2)))

    // reconstruction read: latest is now a redirect -> checkpoint
    // parse + delta apply (what every reader pays in delta mode)
    val reconS = best(DataSkipping.readManifest(spark, dir))
    require(DataSkipping.readManifest(spark, dir).files.size == n - 10)

    // candidate planning: 10k random keys against the 1M entries
    val rnd = new scala.util.Random(11)
    val keys: Seq[Any] = Seq.fill(10000)(rnd.nextLong(n.toLong * 1000L))
    val candS = best(DataSkipping.candidateFiles(m, "a", keys, dir))

    // resident heap of the parsed manifest (rough: GC then delta is
    // unreliable in-process; report the serialized size + per-entry
    // object estimate instead)
    val perEntryBytes = 2 * 8 * 2 + 2 * 8 + 40 + 64 // mins/maxs/nulls boxes + name + shell
    println(
      s"""{"entries":$n,"manifest_mb":${"%.1f".format(mb)},""" +
        s""""read_s":${"%.3f".format(readS)},""" +
        s""""patch_full_commit_s":${"%.3f".format(patchFullS)},""" +
        s""""patch_delta_commit_s":${"%.3f".format(patchDeltaS)},""" +
        s""""reconstruct_read_s":${"%.3f".format(reconS)},""" +
        s""""candidate_10k_keys_s":${"%.3f".format(candS)},""" +
        s""""est_heap_mb":${"%.0f".format(n.toLong * perEntryBytes / 1e6)}}""")
    spark.stop()
  }
}
