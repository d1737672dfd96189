package graft.sinks

import java.nio.file.{Files, Paths}

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

  test("footer-metadata stats ≡ scan stats: nulls, negatives, int32, all-null files") {
    val dir = tmpDir("graft-skip-footer")
    // int64 with nulls and negatives, plus an int32 column; one file
    // holds only the all-null-`a` rows (payload clustering puts them
    // together) so the (MaxValue, MinValue) sentinel path is exercised
    val df = ((0 until 200).map(i =>
        (if (i < 40) Option.empty[Long] else Some(i.toLong - 100L),
          i - 50, i.toLong)))
      .toDF("a", "i32", "payload")
    DataSkipping.writeWithStats(df, dir, col("payload"),
      numFiles = 5, statsCols = Seq("a", "i32"))
    val viaFooter = DataSkipping.readManifest(spark, dir)
    sys.props("graft.store.footerStats") = "false"
    try {
      val viaScan = DataSkipping.writeManifest(spark, dir, Seq("a", "i32"))
      assert(viaFooter.files === viaScan.files,
        "footer-derived per-file stats must equal the scan's exactly")
    } finally sys.props.remove("graft.store.footerStats")
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

  test("bloom sidecar prunes point lookups on a NON-layout key; result stays exact") {
    val dir = tmpDir("graft-skip-bloom")
    // layout on a; b is a high-cardinality key the layout ignores, so
    // min/max on b overlaps every file and only the bloom can prune
    val df = (0 until 4000).map(i => (i.toLong, (i.toLong * 7919) % 100003, i.toLong))
      .toDF("a", "b", "payload")
    val m = DataSkipping.writeWithStats(df, dir, col("a"), numFiles = 8,
      statsCols = Seq("a"), bloomCols = Seq("b"), bloomExpected = 1000L)
    assert(m.bloomCols === Seq("b"))
    assert(m.files.forall(_.blooms.length === 1))
    // manifest with blooms round-trips exactly (base64 strings compare structurally)
    assert(DataSkipping.readManifest(spark, dir) === m)

    val keys: Seq[Any] = Seq(7919L, 15838L, 55433L) // b-values of rows 1, 2, 7
    val pruned = DataSkipping.readPrunedKeys(spark, dir, "b", keys)
    val total = spark.read.parquet(dir).inputFiles.length
    assert(pruned.inputFiles.length < total,
      s"bloom must prune a point lookup on b: read ${pruned.inputFiles.length} of $total")
    val expected = df.filter(col("b").isin(keys: _*))
    assert(pruned.orderBy("payload").collect() === expected.orderBy("payload").collect())

    // a key nothing contains prunes to the empty (schema-preserving) read
    val none = DataSkipping.readPrunedKeys(spark, dir, "b", Seq(99999999L))
    assert(none.count() === 0L && none.columns.toSeq === Seq("a", "b", "payload"))
  }

  test("string bloom sidecar prunes string-key lookups") {
    val dir = tmpDir("graft-skip-bloom-str")
    val df = (0 until 2000).map(i => (i.toLong, s"user-${i % 500}@mail.example", i.toLong))
      .toDF("a", "email", "payload")
    DataSkipping.writeWithStats(df, dir, col("a"), numFiles = 4,
      statsCols = Seq("a"), bloomCols = Seq("email"), bloomExpected = 600L)
    val hit = DataSkipping.readPrunedKeys(spark, dir, "email",
      Seq("user-3@mail.example"))
    assert(hit.count() === 4L)
    // string keys without a bloom sidecar are rejected with a clear error
    val e = intercept[IllegalArgumentException] {
      DataSkipping.readPrunedKeys(spark, dir, "a", Seq("not-a-long"))
    }
    assert(e.getMessage.contains("bloom"))
  }

  test("patchManifest recomputes only touched entries and keeps the rest verbatim") {
    val dir = tmpDir("graft-skip-patch")
    val df = (0 until 800).map(i => (i.toLong, i.toLong)).toDF("a", "payload")
    val m = DataSkipping.writeWithStats(df, dir, col("a"), numFiles = 4,
      statsCols = Seq("a"), bloomCols = Seq("a"), bloomExpected = 300L)
    val victim = m.files.head.file
    // drop one file on disk, patch it out of the manifest: the other
    // entries (incl. bloom payload) must survive byte-for-byte
    val p = new org.apache.hadoop.fs.Path(dir, victim)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, false)
    val patched = DataSkipping.patchManifest(spark, dir, Seq(victim), Nil)
    assert(patched.files.map(_.file) === m.files.tail.map(_.file))
    assert(patched.files === m.files.tail, "untouched entries must be verbatim")
    assert(DataSkipping.readManifest(spark, dir) === patched)

    // patching EVERYTHING away leaves a valid empty manifest, no rescan
    m.files.tail.foreach { f =>
      val fp = new org.apache.hadoop.fs.Path(dir, f.file)
      fp.getFileSystem(spark.sessionState.newHadoopConf()).delete(fp, false)
    }
    val empty = DataSkipping.patchManifest(spark, dir, m.files.tail.map(_.file), Nil)
    assert(empty.files.isEmpty && empty.cols === Seq("a"))
    assert(DataSkipping.readManifest(spark, dir).files.isEmpty)
  }

  test("appendWithStats patches only the new files; base entries stay verbatim") {
    val dir = tmpDir("graft-skip-append")
    val base = (0 until 400).map(i => (i.toLong, i.toLong)).toDF("a", "payload")
    val m0 = DataSkipping.writeWithStats(base, dir, col("a"), numFiles = 4,
      statsCols = Seq("a"), bloomCols = Seq("a"), bloomExpected = 300L)
    val batch = (400 until 600).map(i => (i.toLong, i.toLong)).toDF("a", "payload")
    val m1 = DataSkipping.appendWithStats(batch, dir, col("a"), numFiles = 2)
    assert(m1.files.size === 6)
    // the 4 base entries are byte-for-byte the originals (incl. blooms)
    assert(m1.files.filter(f => m0.files.exists(_.file == f.file)) === m0.files)
    // pruned reads stay exact across the append boundary
    val out = DataSkipping.readPruned(spark, dir, Seq(("a", 390L, 410L)))
    assert(out.count() === 21L)
    assert(out.inputFiles.length < 6, "append-aware manifest must still prune")
    // bloom sidecar built for the new files too
    val hit = DataSkipping.readPrunedKeys(spark, dir, "a", Seq(599L))
    assert(hit.count() === 1L)
  }

  test("uniform fixed-width placement: content ≡ sampled layout, per-file ranges disjoint within fixed buckets, pruning exact") {
    val dirU = tmpDir("graft-skip-uni")
    val dirR = tmpDir("graft-skip-rng")
    // a 32-bit-hash layout key — uniform over [0, 2³²) by construction
    val df = (0 until 5000).map(i => (i.toLong, s"doc$i")).toDF("payload", "s")
      .withColumn("h", graft.llm.Dedup.hash32(col("s")))
    val n = 8
    val mU = DataSkipping.writeWithStats(df, dirU, col("h"), n, Seq("h"),
      uniform = Some(DataSkipping.Hash32Key))
    val mR = DataSkipping.writeWithStats(df, dirR, col("h"), n, Seq("h"))
    // identical table content either way (placement is layout, not data)
    assert(spark.read.parquet(dirU).orderBy("payload").collect() ===
      spark.read.parquet(dirR).orderBy("payload").collect())
    // every file sits inside ONE fixed-width bucket (the placement did
    // route each bucket to its own partition through Spark's real
    // HashPartitioning — the partitionProxies law, end to end) and the
    // per-file ranges are pairwise disjoint like the sampled layout's
    val width = (DataSkipping.Hash32Key.hi - DataSkipping.Hash32Key.lo) / n + 1
    assert(mU.files.nonEmpty && mU.files.map(_.rows).sum === 5000L)
    mU.files.foreach { f =>
      assert(f.mins.head / width === f.maxs.head / width,
        s"file ${f.file} spans buckets: [${f.mins.head}, ${f.maxs.head}], width=$width")
    }
    val ranges = mU.files.map(f => (f.mins.head, f.maxs.head)).sortBy(_._1)
    ranges.sliding(2).filter(_.size == 2).foreach { w =>
      assert(w(0)._2 < w(1)._1, s"overlapping file ranges: $w")
    }
    // range pruning over the fixed-width layout stays exact
    val pruned = DataSkipping.readPruned(spark, dirU, Seq(("h", 0L, width - 1)))
    assert(pruned.inputFiles.length < mU.files.size,
      "a one-bucket range read must prune the listing")
    assert(pruned.orderBy("payload").collect() ===
      df.filter(col("h") <= width - 1).orderBy("payload").collect())
  }

  test("property: pruned reads and erasure equal their full-scan models across random layouts/bounds/keys") {
    val rnd = new scala.util.Random(13)
    (0 until 4).foreach { trial =>
      val dir = tmpDir(s"graft-skip-prop$trial")
      val n = 500 + rnd.nextInt(1500)
      val keySpan = 50 + rnd.nextInt(500)
      val rows = (0 until n).map { i =>
        (rnd.nextInt(keySpan).toLong, (rnd.nextInt(keySpan) * 7919L) % 9973, i.toLong)
      }
      val df = rows.toDF("a", "b", "payload")
      val numFiles = 2 + rnd.nextInt(7)
      val layoutOnA = rnd.nextBoolean()
      DataSkipping.writeWithStats(df, dir,
        if (layoutOnA) col("a") else col("b"), numFiles,
        statsCols = Seq("a", "b"), bloomCols = Seq("a"),
        bloomExpected = keySpan.toLong * 2)
      val m = DataSkipping.readManifest(spark, dir)
      assert(m.files.map(_.rows).sum === n.toLong, "manifest rows must cover the table")

      // random range bounds on both columns: pruned ≡ full filter
      val (lo, hi) = { val x = rnd.nextInt(keySpan).toLong; (x, x + rnd.nextInt(keySpan).toLong) }
      val (lo2, hi2) = { val x = rnd.nextInt(9973).toLong; (x, x + rnd.nextInt(5000).toLong) }
      val pruned = DataSkipping.readPruned(spark, dir,
        Seq(("a", lo, hi), ("b", lo2, hi2))).orderBy("payload").collect()
      val model = df.filter(col("a").between(lo, hi) && col("b").between(lo2, hi2))
        .orderBy("payload").collect()
      assert(pruned === model, s"trial $trial: range read diverged")

      // random key list: point lookup ≡ isin filter
      val keys: Seq[Any] = Seq.fill(1 + rnd.nextInt(5))(rnd.nextInt(keySpan * 2).toLong).distinct
      val byKey = DataSkipping.readPrunedKeys(spark, dir, "a", keys)
        .orderBy("payload").collect()
      val keyModel = df.filter(col("a").isin(keys: _*)).orderBy("payload").collect()
      assert(byKey === keyModel, s"trial $trial: key lookup diverged")

      // random erasure list: survivors ≡ NOT IN model; manifest still exact
      val doomed = Seq.fill(1 + rnd.nextInt(4))(rnd.nextInt(keySpan).toLong).distinct
      Erasure.delete(spark, dir, "a", doomed): Unit
      val survivors = spark.read.parquet(dir).orderBy("payload").collect()
      val surModel = df.filter(col("a").isNull || !col("a").isin(doomed: _*))
        .orderBy("payload").collect()
      assert(survivors === surModel, s"trial $trial: erasure diverged")
      val m2 = DataSkipping.readManifest(spark, dir)
      assert(m2.files.map(_.rows).sum === surModel.length.toLong,
        s"trial $trial: patched manifest rows must cover the survivors")

      // random retention range ON TOP of the key erasure: survivors ≡
      // the composed NOT-IN + NOT-BETWEEN model, manifest still exact
      val (rlo, rhi) = { val x = rnd.nextInt(keySpan).toLong; (x, x + rnd.nextInt(keySpan).toLong) }
      Erasure.deleteRange(spark, dir, "a", rlo, rhi): Unit
      val after = spark.read.parquet(dir).orderBy("payload").collect()
      val afterModel = df.filter(col("a").isNull ||
          (!col("a").isin(doomed: _*) && !col("a").between(rlo, rhi)))
        .orderBy("payload").collect()
      assert(after === afterModel, s"trial $trial: range delete diverged")
      val m3 = DataSkipping.readManifest(spark, dir)
      assert(m3.files.map(_.rows).sum === afterModel.length.toLong,
        s"trial $trial: range-patched manifest rows must cover the survivors")

      // ---- composed MAINTENANCE chain in random order: upsert,
      // append(+change-feed probe), compact — every op must leave the
      // store ≡ a driver-side model, whatever preceded it
      var state: Vector[(Long, Long, Long)] = after
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toVector
      var nextPayload = 1000000L + trial * 100000L
      (0 until 4).foreach { step =>
        val opName = rnd.nextInt(3) match {
          case 0 => // UPSERT: matched keys replaced, new keys inserted
            val ks = Seq.fill(1 + rnd.nextInt(4))(rnd.nextInt(keySpan * 2).toLong)
              .distinct
            val batch = ks.map { k =>
              nextPayload += 1; (k, rnd.nextInt(9973).toLong, nextPayload)
            }
            DataSkipping.upsertKeys(spark, dir, "a",
              batch.toDF("a", "b", "payload"), col("a"),
              numFiles = 1 + rnd.nextInt(2)): Unit
            state = state.filterNot(r => ks.contains(r._1)) ++ batch
            "upsert"
          case 1 => // APPEND + the change feed must carry exactly the batch
            val vBefore = DataSkipping.currentVersion(spark, dir)
            val batch = (0 until 1 + rnd.nextInt(20)).map { _ =>
              nextPayload += 1
              (rnd.nextInt(keySpan).toLong, rnd.nextInt(9973).toLong, nextPayload)
            }
            DataSkipping.appendWithStats(batch.toDF("a", "b", "payload"),
              dir, col("a"), numFiles = 1): Unit
            val feed = DataSkipping.changesBetween(spark, dir,
              vBefore, DataSkipping.currentVersion(spark, dir))
            assert(feed.filter(col("__change") =!= "insert").count() === 0L,
              s"trial $trial step $step: an append's feed is pure inserts")
            assert(feed.select("a", "b", "payload").orderBy("payload").collect()
              === batch.sortBy(_._3).map(t => org.apache.spark.sql.Row(t._1, t._2, t._3)),
              s"trial $trial step $step: feed must carry exactly the batch")
            state = state ++ batch
            "append"
          case 2 => // COMPACT: pure reorganization, content-invariant
            DataSkipping.compactSmallFiles(spark, dir, col("a"),
              minRows = Long.MaxValue, targetFiles = 1 + rnd.nextInt(3)): Unit
            "compact"
        }
        // manifest-driven read (the store's contract): upsert/compact
        // leave tombstones on disk, so a bare directory read would see
        // both generations — the manifest defines the table
        val got = DataSkipping.readPruned(spark, dir,
            Seq(("a", Long.MinValue, Long.MaxValue - 1)))
          .select("a", "b", "payload").orderBy("payload").collect().toSeq
        val want = state.sortBy(_._3)
          .map(t => org.apache.spark.sql.Row(t._1, t._2, t._3))
        assert(got === want,
          s"trial $trial step $step: store diverged from model after $opName")
        val mm = DataSkipping.readManifest(spark, dir)
        assert(mm.files.map(_.rows).sum === state.size.toLong,
          s"trial $trial step $step: manifest rows must cover the model after $opName")
        val audit = DataSkipping.fsck(spark, dir, checkRows = true)
        assert(audit.missingFiles.isEmpty && audit.orphanFiles.isEmpty &&
          audit.rowMismatches.isEmpty && audit.unreadableFiles.isEmpty,
          s"trial $trial step $step: store inconsistent after $opName: $audit")
      }
    }
  }

  test("recluster swaps the layout key and stats config in one commit; pruning on the NEW key shrinks the listing") {
    val dir = tmpDir("graft-recluster")
    // k2 is k1 bit-reversed-ish: clustering on k1 leaves k2 scattered
    val df = (0 until 4000).map(i => (i.toLong, ((i * 2654435761L) % 4000), i.toLong))
      .toDF("k1", "k2", "payload")
    val m1 = DataSkipping.writeWithStats(df, dir, col("k1"), numFiles = 8,
      statsCols = Seq("k1"))
    val oldFiles = m1.files.map(_.file).toSet

    val m2 = DataSkipping.recluster(spark, dir, col("k2"), numFiles = 8,
      statsCols = Seq("k2"))
    assert(m2.cols === Seq("k2"), "the stats config swaps with the layout")
    assert(m2.files.map(_.rows).sum === 4000L, "every row moves exactly once")
    assert(DataSkipping.readManifest(spark, dir) === m2)
    // the old generation stays as TOMBSTONES (pre-recluster snapshots
    // keep serving) until vacuum expires their history and reclaims it
    def onDisk() = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("part-")).toSet
    assert(oldFiles.subsetOf(onDisk()),
      "pre-recluster files must tombstone, not vanish")
    assert(DataSkipping.readPrunedAt(spark, dir,
      Seq(("k1", 0L, 3999L)), 1L).count() === 4000L,
      "the pre-recluster snapshot must stay serveable until vacuum")
    DataSkipping.vacuumVersions(spark, dir, retainLast = 1): Unit
    assert(onDisk() === m2.files.map(_.file).toSet,
      "vacuum reclaims the old generation exactly")

    // a narrow k2 range now prunes from the listing
    val pruned = DataSkipping.readPruned(spark, dir, Seq(("k2", 0L, 400L)))
    assert(pruned.inputFiles.length < 8,
      s"k2 pruning must skip files after recluster: read ${pruned.inputFiles.length} of 8")
    assert(pruned.orderBy("payload").collect() ===
      df.filter(col("k2").between(0, 400)).orderBy("payload").collect())
  }

  test("manifest null counts: recorded per stats column, legacy manifests parse as unknown and patch verbatim") {
    val dir = tmpDir("graft-nulls")
    val rows = (0 until 90).map(i => (java.lang.Long.valueOf(i.toLong), i.toLong)) ++
      (0 until 10).map(i => (null.asInstanceOf[java.lang.Long], 900L + i))
    val m = DataSkipping.writeWithStats(rows.toDF("k", "payload"), dir,
      coalesce(col("k"), lit(Long.MaxValue)), numFiles = 1, statsCols = Seq("k"))
    assert(m.files.head.nulls === Seq(10L), "null count rides the stats pass")
    assert(DataSkipping.readManifest(spark, dir) === m, "nulls round-trip the serializer")

    // legacy manifest: no nulls field -> parses as unknown (Nil), and a
    // patch keeps the legacy entry byte-identical (no field invented)
    val mf = Paths.get(dir, DataSkipping.ManifestName)
    val legacyText = new String(Files.readAllBytes(mf), "UTF-8")
      .replaceAll(""","nulls":\[[^\]]*\]""", "")
    Files.write(mf, legacyText.getBytes("UTF-8"))
    // drop the checksum sidecar invalidated by the out-of-band edit
    Files.deleteIfExists(Paths.get(dir, s".${DataSkipping.ManifestName}.crc")): Unit
    val legacy = DataSkipping.readManifest(spark, dir)
    assert(legacy.files.head.nulls === Nil)
    DataSkipping.patchManifest(spark, dir, Nil, Nil): Unit
    assert(new String(Files.readAllBytes(mf), "UTF-8") === legacyText,
      "a no-op patch of a legacy manifest must not invent null counts")
  }

  test("fsck: clean store passes; missing, orphan, row-mismatched files and invalidated versions are reported") {
    val dir = tmpDir("graft-fsck")
    val df = (0 until 400).map(i => (i.toLong, i.toLong)).toDF("k", "payload")
    val m = DataSkipping.writeWithStats(df, dir, col("k"), numFiles = 4,
      statsCols = Seq("k"))
    assert(DataSkipping.fsck(spark, dir, checkRows = true).clean)

    // orphan: an unlisted part file appears (crash leftover)
    val orphan = Paths.get(dir, "part-orphan-leftover.parquet")
    Files.copy(Paths.get(dir, m.files.head.file), orphan)
    // missing: a listed file vanishes out-of-band — which also
    // invalidates the version that references it
    val gone = m.files.last.file
    Files.delete(Paths.get(dir, gone))
    val r1 = DataSkipping.fsck(spark, dir)
    assert(r1.missingFiles === Seq(gone))
    assert(r1.orphanFiles === Seq("part-orphan-leftover.parquet"))
    assert(r1.rowMismatches.isEmpty, "listing-only fsck does not read data")
    assert(r1.invalidVersions === DataSkipping.listVersions(spark, dir),
      "a version whose file is gone cannot be served")
    assert(!r1.clean)
    Files.delete(orphan)

    // row mismatch: a listed file's CONTENT is replaced out-of-band
    // (valid parquet, FEWER rows) — only the deep scrub catches it
    val small = tmpDir("graft-fsck-small")
    df.limit(3).coalesce(1).write.mode("overwrite").parquet(small)
    val smallPart = new java.io.File(small).listFiles()
      .map(_.getName).find(f => f.startsWith("part-") && !f.endsWith(".crc")).get
    val victim = m.files.head.file
    Files.copy(Paths.get(small, smallPart), Paths.get(dir, victim),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Files.deleteIfExists(Paths.get(dir, s".$victim.crc")): Unit
    val r2 = DataSkipping.fsck(spark, dir, checkRows = true)
    assert(r2.rowMismatches === Seq((victim, m.files.head.rows, 3L)),
      s"the deep scrub must report (file, manifestRows, actualRows): $r2")

    // corrupt BYTES are the main thing a deep scrub exists to find:
    // the audit must REPORT the unreadable file, not crash on it
    val garbage = m.files(2).file
    Files.write(Paths.get(dir, garbage), "not a parquet file".getBytes("UTF-8"))
    Files.deleteIfExists(Paths.get(dir, s".$garbage.crc")): Unit
    val r3 = DataSkipping.fsck(spark, dir, checkRows = true)
    assert(r3.unreadableFiles === Seq(garbage),
      s"corrupt bytes must be classified, not thrown: $r3")
    assert(r3.rowMismatches === Seq((victim, m.files.head.rows, 3L)),
      "readable files are still scrubbed on the fallback path")
    assert(!r3.clean)
  }

  test("fsck: a 4x-grown persisted index under the store dir flags staleIndexes; retrain clears it; a rotted sidecar is an unreadable file") {
    import graft.llm.Similarity
    val dir = tmpDir("graft-fsck-idx")
    val df = (0 until 100).map(i => (i.toLong, i.toLong)).toDF("k", "payload")
    DataSkipping.writeWithStats(df, dir, col("k"), numFiles = 2,
      statsCols = Seq("k")): Unit
    val emb = (0L until 256L).map(i => (i, Array(
        (i % 4).toFloat, ((i / 4) % 4).toFloat,
        ((i * 3) % 5).toFloat, ((i * 7) % 5).toFloat)))
      .toDF("vec_id", "embedding")
    val idx = s"$dir/ann_index"
    Similarity.ivfPqWriteIndex(emb.filter(col("vec_id") < 64L),
      "vec_id", "embedding", idx, cells = 3, m = 2, k = 3, iters = 2): Unit
    // fresh index: store stays clean, nothing stale, and the index's
    // own cell=K/ tree never pollutes the store's orphan/tombstone walk
    val r0 = DataSkipping.fsck(spark, dir, checkRows = true)
    assert(r0.clean && r0.staleIndexes.isEmpty, s"fresh index: $r0")
    // frozen-model appends grow the corpus to 4x the train anchor —
    // the SAME report an operator already runs now carries the flag
    Similarity.ivfPqAppendIndex(emb.filter(col("vec_id") >= 64L),
      "vec_id", "embedding", idx): Unit
    val r1 = DataSkipping.fsck(spark, dir)
    assert(r1.staleIndexes === Seq("ann_index"), s"grown index: $r1")
    assert(r1.clean, "staleness is advisory (serves correctly, degraded slope)")
    // the maintenance op the flag prescribes clears it
    Similarity.ivfPqRetrain(spark, idx, emb, "vec_id", "embedding",
      m = 2, k = 3, iters = 2): Unit
    val r2 = DataSkipping.fsck(spark, dir)
    assert(r2.clean && r2.staleIndexes.isEmpty, s"after retrain: $r2")
    // a sidecar that exists but cannot be parsed is a DEFECT (the index
    // cannot serve): unreadableFiles, clean = false — never a crash
    Files.write(Paths.get(idx, Similarity.IvfPqModelFile),
      "cells=garbage".getBytes("UTF-8"))
    Files.deleteIfExists(
      Paths.get(idx, "." + Similarity.IvfPqModelFile + ".crc")): Unit
    val r3 = DataSkipping.fsck(spark, dir)
    assert(r3.unreadableFiles === Seq(s"ann_index/${Similarity.IvfPqModelFile}"),
      s"rotted sidecar: $r3")
    assert(!r3.clean && r3.staleIndexes.isEmpty)
  }

  test("metadataSummary: counts and bounds fold from the manifest; all-NULL columns yield NULL bounds") {
    val dir = tmpDir("graft-metacount")
    val rows = (0 until 90).map(i => (java.lang.Long.valueOf(i.toLong), i.toLong)) ++
      (0 until 10).map(i => (null.asInstanceOf[java.lang.Long], 900L + i))
    DataSkipping.writeWithStats(rows.toDF("k", "payload"), dir,
      coalesce(col("k"), lit(Long.MaxValue)), numFiles = 3, statsCols = Seq("k"))
    val r = DataSkipping.metadataSummary(spark, dir, "k").collect().head
    assert(r.getLong(0) === 100L, "NULL-key rows still count")
    assert(r.getLong(1) === 0L && r.getLong(2) === 89L, "bounds ignore NULLs, like SQL MIN/MAX")

    val nullDir = tmpDir("graft-metacount-null")
    val allNull = (0 until 5)
      .map(i => (null.asInstanceOf[java.lang.Long], i.toLong)).toDF("k", "payload")
    DataSkipping.writeWithStats(allNull, nullDir, col("payload"),
      numFiles = 1, statsCols = Seq("k"))
    val rn = DataSkipping.metadataSummary(spark, nullDir, "k").collect().head
    assert(rn.getLong(0) === 5L && rn.isNullAt(1) && rn.isNullAt(2))
    intercept[IllegalArgumentException] {
      DataSkipping.metadataSummary(spark, dir, "payload")
    }: Unit
  }

  test("exportSnapshot: the copy is immutable under source-side erasure; unserveable versions are rejected") {
    val dir = tmpDir("graft-export-src")
    val dest = tmpDir("graft-export-dst") + "/snap"
    val df = (0 until 200).map(i => (i.toLong, i.toLong)).toDF("k", "payload")
    DataSkipping.writeWithStats(df.filter(col("k") < 100), dir, col("k"),
      numFiles = 2, statsCols = Seq("k"))
    DataSkipping.appendWithStats(df.filter(col("k") >= 100), dir, col("k"),
      numFiles = 1): Unit
    DataSkipping.exportSnapshot(spark, dir, 1L, dest): Unit
    // the export is a self-contained store with a FRESH version log
    assert(DataSkipping.listVersions(spark, dest) === Seq(1L))
    // source-side erasure rewrites batch-1 files and truncates the log:
    // source v1 is gone forever...
    Erasure.deleteKeys(spark, dir, "k", Seq(5L, 6L)): Unit
    assert(!DataSkipping.validVersions(spark, dir).contains(1L))
    // ...but the export still serves snapshot v1 exactly
    val got = DataSkipping.readPruned(spark, dest,
      Seq(("k", Long.MinValue, Long.MaxValue - 1)))
    assert(got.count() === 100L)
    assert(got.filter(col("k").isin(5L, 6L)).count() === 2L,
      "the erased keys live on in the pinned snapshot")
    intercept[IllegalArgumentException] {
      DataSkipping.exportSnapshot(spark, dir, 99L, tmpDir("graft-export-bad"))
    }: Unit
  }

  test("compactSmallFiles folds the small-file backlog; big entries verbatim; orphans swept") {
    val dir = tmpDir("graft-skip-compact")
    val base = (0 until 800).map(i => (i.toLong, i.toLong)).toDF("a", "payload")
    val m0 = DataSkipping.writeWithStats(base, dir, col("a"), numFiles = 2,
      statsCols = Seq("a"))
    (0 until 3).foreach { b =>
      val batch = (800 + b * 20 until 820 + b * 20)
        .map(i => (i.toLong, i.toLong)).toDF("a", "payload")
      DataSkipping.appendWithStats(batch, dir, col("a"), numFiles = 1): Unit
    }
    assert(DataSkipping.readManifest(spark, dir).files.size === 5)

    // plant an orphan (a crashed run's moved-but-uncommitted file): it
    // must be swept, not read, not counted. Backdated past the sweep
    // grace window — a YOUNG orphan is indistinguishable from a live
    // concurrent appender's in-flight file and must survive the sweep.
    val anyPart = DataSkipping.readManifest(spark, dir).files.head.file
    val planted = Paths.get(dir, "part-orphan-from-crash.parquet")
    java.nio.file.Files.copy(Paths.get(dir, anyPart), planted)
    Files.setLastModifiedTime(planted, java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - DataSkipping.SweepGraceMs - 60000L)): Unit

    val m1 = DataSkipping.compactSmallFiles(spark, dir, col("a"),
      minRows = 100L, targetFiles = 1)
    assert(m1.files.size === 3, s"2 big + 1 compacted, got ${m1.files.map(_.file)}")
    assert(m1.files.filter(f => m0.files.exists(_.file == f.file)) === m0.files,
      "big files' entries must survive verbatim")
    assert(!Files.exists(Paths.get(dir, "part-orphan-from-crash.parquet")),
      "orphans must be swept before compaction")
    val all = DataSkipping.readPruned(spark, dir, Seq(("a", 0L, 10000L)))
    assert(all.count() === 860L, "no row lost or duplicated across the compaction")
    assert(all.inputFiles.length === 3)
    // idempotence: nothing small remains, second run is a no-op
    val m2 = DataSkipping.compactSmallFiles(spark, dir, col("a"), minRows = 100L)
    assert(m2.files.map(_.file) === m1.files.map(_.file))
  }

  test("upsertKeys: replaced + inserted in ONE commit; non-candidate files byte-identical; ambiguous batches rejected") {
    val dir = tmpDir("graft-upsert")
    // two well-separated key ranges → two files with disjoint bounds
    val base = ((0L until 100L) ++ (1000L until 1100L)).map(i => (i, i * 10)).toDF("k", "v")
    DataSkipping.writeWithStats(base, dir, col("k"), numFiles = 2, statsCols = Seq("k"))
    val untouched = DataSkipping.readManifest(spark, dir).files
      .find(_.mins.head >= 1000L).get
    val bytesBefore = Files.readAllBytes(Paths.get(dir, untouched.file))
    // replace keys 5,7 and insert 50000 — all in the low file's range or new
    val updates = Seq((5L, 999L), (7L, 888L), (50000L, 777L)).toDF("k", "v")
    val m = DataSkipping.upsertKeys(spark, dir, "k", updates, col("k"), numFiles = 1)
    val got = DataSkipping.readPruned(spark, dir, Seq(("k", Long.MinValue, Long.MaxValue - 1)))
      .as[(Long, Long)].collect().toMap
    assert(got.size === 201)
    assert(got(5L) === 999L && got(7L) === 888L && got(50000L) === 777L)
    assert(got(6L) === 60L && got(1050L) === 10500L, "unmatched rows survive")
    // the high-range file was never a candidate: byte-identical on disk
    assert(Files.readAllBytes(Paths.get(dir, untouched.file)).toSeq === bytesBefore.toSeq)
    assert(m.files.exists(_.file == untouched.file))
    // contracts
    intercept[IllegalArgumentException] {
      DataSkipping.upsertKeys(spark, dir, "k",
        Seq((1L, 1L), (1L, 2L)).toDF("k", "v"), col("k")): Unit
    }
    intercept[IllegalArgumentException] {
      DataSkipping.upsertKeys(spark, dir, "k",
        Seq((Option.empty[Long], 1L)).toDF("k", "v"), col("k")): Unit
    }
  }

  test("appendEpoch: a committed epoch's retry is a no-op; a crashed half-landed epoch sweeps and re-runs exactly once") {
    val dir = tmpDir("graft-epoch")
    val b0 = (0L until 100L).map(i => (i, i)).toDF("k", "v")
    DataSkipping.writeWithStats(b0, dir, col("k"), numFiles = 1, statsCols = Seq("k"))
    val b1 = (100L until 150L).map(i => (i, i)).toDF("k", "v")
    DataSkipping.appendEpoch(spark, dir, b1, col("k"), numFiles = 1, epochId = 1L): Unit
    def total() = DataSkipping.readPruned(spark, dir,
      Seq(("k", Long.MinValue, Long.MaxValue - 1))).count()
    assert(total() === 150L)
    // at-least-once retry of a COMMITTED epoch: no duplication
    DataSkipping.appendEpoch(spark, dir, b1, col("k"), numFiles = 1, epochId = 1L): Unit
    assert(total() === 150L)
    // crash simulation: epoch 2's files landed but the commit never ran
    val orphan = Paths.get(dir, "part-e2-halflanded.parquet")
    Files.copy(Paths.get(dir,
      DataSkipping.readManifest(spark, dir).files.head.file), orphan)
    val b2 = (150L until 170L).map(i => (i, i)).toDF("k", "v")
    DataSkipping.appendEpoch(spark, dir, b2, col("k"), numFiles = 1, epochId = 2L): Unit
    assert(!Files.exists(orphan), "the half-landed file must be swept, not committed")
    assert(total() === 170L, "the retried epoch lands exactly once")
  }

  test("version log: every commit appends a version; time-travel reads reproduce each snapshot exactly") {
    val dir = tmpDir("graft-travel")
    val b1 = (0L until 300L).map(i => (i, i * 2)).toDF("a", "p")
    val b2 = (300L until 500L).map(i => (i, i * 2)).toDF("a", "p")
    val b3 = (500L until 550L).map(i => (i, i * 2)).toDF("a", "p")
    DataSkipping.writeWithStats(b1, dir, col("a"), numFiles = 3, statsCols = Seq("a"))
    DataSkipping.appendWithStats(b2, dir, col("a"), numFiles = 2)
    DataSkipping.appendWithStats(b3, dir, col("a"), numFiles = 1)
    assert(DataSkipping.listVersions(spark, dir) === Seq(1L, 2L, 3L))
    // append-only history: every version valid
    assert(DataSkipping.validVersions(spark, dir) === Seq(1L, 2L, 3L))
    val expect = Seq(300L, 500L, 550L)
    (1 to 3).foreach { v =>
      val snap = DataSkipping.readPrunedAt(spark, dir,
        Seq(("a", Long.MinValue, Long.MaxValue - 1)), v.toLong)
      assert(snap.count() === expect(v - 1), s"version $v row count")
      assert(snap.agg(max(col("a"))).head.getLong(0) === expect(v - 1) - 1,
        s"version $v content")
    }
    // pruning works against an OLD snapshot, and the snapshot read
    // never touches files committed later
    val narrow = DataSkipping.readPrunedAt(spark, dir, Seq(("a", 0L, 99L)), 1L)
    assert(narrow.count() === 100L)
    val v1Files = DataSkipping.readManifestAt(spark, dir, 1L).files.map(_.file).toSet
    val touched = narrow.inputFiles.map(_.split('/').last).toSet
    assert(touched.subsetOf(v1Files), s"v1 read touched later files: $touched")
    assert(touched.size < v1Files.size, "the narrow range must also prune within v1")
  }

  test("change feed: append-only diff reads only the new files; a chained upsert feed is exactly the batch (true delta)") {
    val dir = tmpDir("graft-feed")
    val b1 = (0L until 100L).map(i => (i, i)).toDF("k", "v")
    val b2 = (100L until 150L).map(i => (i, i)).toDF("k", "v")
    DataSkipping.writeWithStats(b1, dir, col("k"), numFiles = 2, statsCols = Seq("k"))
    DataSkipping.appendWithStats(b2, dir, col("k"), numFiles = 1)
    val feed = DataSkipping.changesBetween(spark, dir, 1L, 2L)
    assert(feed.filter(col("__change") === "insert").count() === 50L)
    assert(feed.count() === 50L, "append-only feed is inserts only")
    // the feed's scan lists ONLY the appended files
    val v1Files = DataSkipping.readManifestAt(spark, dir, 1L).files.map(_.file).toSet
    assert(feed.inputFiles.forall(f => !v1Files.contains(f.split('/').last)),
      "the append-only feed must not touch base files")
    // same-version feed is empty
    assert(DataSkipping.changesBetween(spark, dir, 2L, 2L).count() === 0L)
    // an upsert REPLACES a hit file under new names (staged rewrite,
    // never in place); the original becomes a TOMBSTONE still
    // referenced by the older version manifests — so pre-upsert
    // snapshots STAY valid (time travel and pinned readers survive)
    // until vacuum expires them
    DataSkipping.upsertKeys(spark, dir, "k",
      Seq((5L, 999L)).toDF("k", "v"), col("k")): Unit
    val valid = DataSkipping.validVersions(spark, dir)
    assert(valid.contains(1L) && valid.contains(2L),
      s"tombstoned deletes must keep pre-upsert snapshots valid, got $valid")
    assert(valid.contains(DataSkipping.listVersions(spark, dir).last))
    // and the pre-upsert snapshot still reads exactly (pinned reader)
    assert(DataSkipping.readPrunedAt(spark, dir,
      Seq(("k", Long.MinValue, Long.MaxValue - 1)), 2L).count() === 150L)
    // TRUE-DELTA feed across the upsert (the version chain is intact,
    // so the walk uses rewrite provenance): the feed is EXACTLY the
    // upsert batch — the staged survivor file (origin=rewrite) and the
    // replaced original are both skipped, because the consumer's v2
    // state already holds that content. A 128 MB file's unchanged
    // survivors never re-emit because 1 of its rows changed.
    val feed2 = DataSkipping.changesBetween(spark, dir, 2L,
      DataSkipping.listVersions(spark, dir).last)
    assert(feed2.select("k", "v", "__change").collect().toSeq ===
      Seq(org.apache.spark.sql.Row(5L, 999L, "insert")),
      "the chained feed across an upsert is exactly the batch")
    // an upsert that EMPTIES a whole hit file leaves NO survivor
    // rewrite (the provenance skip never engages) — the feed stays
    // exactly the batch because a drop inside a surviving version
    // chain is always rewrite-shaped (every emptied row's key was
    // re-ingested by the batch; the tombstoned original is not a
    // deletion)
    val v3 = DataSkipping.listVersions(spark, dir).last
    val small = DataSkipping.readManifest(spark, dir).files.minBy(_.rows)
    val allKeys = spark.read.parquet(s"$dir/${small.file}")
      .select("k").as[Long].collect().toSeq
    val wipe = allKeys.map(k => (k, k + 5000L)).toDF("k", "v")
    DataSkipping.upsertKeys(spark, dir, "k", wipe, col("k")): Unit
    val feed3 = DataSkipping.changesBetween(spark, dir, v3,
      DataSkipping.listVersions(spark, dir).last)
    assert(feed3.filter(col("__change") =!= "insert").count() === 0L)
    assert(feed3.select("k").as[Long].collect().sorted.toSeq === allKeys.sorted,
      "an emptying upsert's feed is exactly its batch — no deletes, no losses")
  }

  test("change feed: an unreadable INTERMEDIATE version degrades the walk to the endpoint diff; an unreadable ENDPOINT fails loudly") {
    // Two ways a chain step's version file can be unreadable at the
    // walk's read even though the pre-walk listing saw it: a vacuum
    // that won the listing-to-read race, and a writer crashed
    // mid-create (truncated bytes). Both must cost only the
    // true-delta property — the feed degrades to the conservative
    // endpoint diff — never the job. An unreadable ENDPOINT is
    // different: the consumer asked for a diff against a state that
    // cannot be reconstructed, and that must stay loud.
    val dir = tmpDir("graft-feed-trunc")
    DataSkipping.writeWithStats((0L until 100L).map(i => (i, i)).toDF("k", "v"),
      dir, col("k"), numFiles = 2, statsCols = Seq("k"))
    DataSkipping.appendWithStats(
      (100L until 150L).map(i => (i, i)).toDF("k", "v"), dir, col("k"), 1): Unit
    DataSkipping.appendWithStats(
      (150L until 180L).map(i => (i, i)).toDF("k", "v"), dir, col("k"), 1): Unit
    // intact chain first: the 1->3 feed is the two appended batches
    assert(DataSkipping.changesBetween(spark, dir, 1L, 3L).count() === 80L)
    // truncate the INTERMEDIATE version file (zero bytes)
    val v2 = Paths.get(dir, DataSkipping.versionName(2L))
    val v2Bytes = Files.readAllBytes(v2)
    Files.write(v2, Array.empty[Byte]): Unit
    val feed = DataSkipping.changesBetween(spark, dir, 1L, 3L)
    assert(feed.count() === 80L,
      "the degraded endpoint diff must still carry the added content")
    assert(feed.filter(col("__change") =!= "insert").count() === 0L)
    // an unreadable ENDPOINT stays loud
    Files.write(v2, v2Bytes): Unit
    Files.write(Paths.get(dir, DataSkipping.versionName(1L)), Array.empty[Byte]): Unit
    intercept[IllegalStateException] {
      DataSkipping.changesBetween(spark, dir, 1L, 3L).count()
    }
  }

  test("change feed provenance: reorganizations are feed-invisible; content ingested then compacted still arrives exactly once") {
    val dir = tmpDir("graft-feed-prov")
    val b1 = (0L until 100L).map(i => (i, i)).toDF("k", "v")
    val b2 = (100L until 160L).map(i => (i, i)).toDF("k", "v")
    DataSkipping.writeWithStats(b1, dir, col("k"), numFiles = 2, statsCols = Seq("k"))
    DataSkipping.appendWithStats(b2, dir, col("k"), numFiles = 1) // v2
    DataSkipping.compactSmallFiles(spark, dir, col("k"),
      minRows = Long.MaxValue, targetFiles = 1): Unit // v3: pure reorg
    // a consumer synced at v2 pulls v2→v3: a compaction moves no
    // content, so the feed is EMPTY — not a 160-row re-assertion
    assert(DataSkipping.changesBetween(spark, dir, 2L, 3L).count() === 0L,
      "a pure reorganization step must be feed-invisible")
    // a consumer synced at v1 pulls v1→v3: batch b2 entered at v2 and
    // the compaction folded its file away from the LATEST manifest —
    // but under tombstoned deletes the folded file still exists and
    // the chain walk stays TRUE-DELTA across the reorganization: the
    // feed is exactly b2, never a 160-row re-assertion (the r15
    // verdict's law: a v1→vN feed stays true-delta across rewrites)
    val feed = DataSkipping.changesBetween(spark, dir, 1L, 3L)
    assert(feed.filter(col("__change") =!= "insert").count() === 0L)
    assert(feed.select("k").as[Long].collect().sorted.toSeq ===
      (100L until 160L).toSeq,
      "the chained feed across a compaction is exactly the ingested batch")
    // vacuum the intermediate versions: expired history's tombstones
    // are reclaimed and the chain is gone — the feed API is then out
    // of range for v1 (documented horizon); the latest read still
    // serves the full content
    DataSkipping.vacuumVersions(spark, dir, retainLast = 1): Unit
    assert(DataSkipping.readPruned(spark, dir,
      Seq(("k", Long.MinValue, Long.MaxValue - 1))).count() === 160L)
  }

  test("vacuum expires history; erasure truncates the version log (RTBF forgets history)") {
    val dir = tmpDir("graft-vacuum")
    val b1 = (0L until 300L).map(i => (i, i * 2)).toDF("a", "p")
    val b2 = (300L until 500L).map(i => (i, i * 2)).toDF("a", "p")
    DataSkipping.writeWithStats(b1, dir, col("a"), numFiles = 3, statsCols = Seq("a"))
    DataSkipping.appendWithStats(b2, dir, col("a"), numFiles = 2)
    // plant an orphan (a crashed writer's leftover). A YOUNG
    // unreferenced file must SURVIVE vacuum (it is indistinguishable
    // from a live concurrent writer's just-moved pre-commit file);
    // backdated past the grace it is provably debris and goes.
    val orphan = Paths.get(dir, "part-orphan-crashed.parquet")
    Files.write(orphan, Array[Byte](1, 2, 3))
    assert(DataSkipping.vacuumVersions(spark, dir, retainLast = 2) === Nil,
      "a young unreferenced file may be a live writer's — vacuum must skip it")
    assert(Files.exists(orphan))
    Files.setLastModifiedTime(orphan, java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - DataSkipping.SweepGraceMs - 60000L)): Unit
    val deleted = DataSkipping.vacuumVersions(spark, dir, retainLast = 1)
    assert(deleted === Seq("part-orphan-crashed.parquet"))
    assert(!Files.exists(orphan))
    assert(DataSkipping.listVersions(spark, dir) === Seq(2L),
      "vacuum keeps only the retained versions")
    // referenced data files all survive (append-only: latest references everything)
    assert(DataSkipping.readPruned(spark, dir,
      Seq(("a", Long.MinValue, Long.MaxValue - 1))).count() === 500L)
    // erasure truncates the log to its own commit
    Erasure.delete(spark, dir, "a", Seq(7L, 450L)): Unit
    assert(DataSkipping.listVersions(spark, dir).size === 1,
      "post-erasure only the erasure commit may remain in the log")
    assert(DataSkipping.readPruned(spark, dir,
      Seq(("a", Long.MinValue, Long.MaxValue - 1))).count() === 498L)
  }

  test("writer fence: a stale writer's commit is rejected; a racing commit loses the version-file CAS") {
    val dir = tmpDir("graft-fence")
    val df = (0 until 100).map(i => (i.toLong, i.toLong)).toDF("k", "payload")
    DataSkipping.writeWithStats(df, dir, col("k"), numFiles = 2,
      statsCols = Seq("k")): Unit
    assert(DataSkipping.currentVersion(spark, dir) === 1L)

    // STALE writer: read at v1, but another maintenance job commits v2
    // in between — the stale commit must be fenced, not interleaved
    val staleBase = DataSkipping.currentVersion(spark, dir)
    DataSkipping.appendWithStats(
      Seq((1000L, 1000L)).toDF("k", "payload"), dir, col("k"), numFiles = 1): Unit
    assert(DataSkipping.currentVersion(spark, dir) === 2L)
    intercept[java.util.ConcurrentModificationException] {
      DataSkipping.patchManifest(spark, dir, Nil, Nil, Some(staleBase))
    }: Unit
    assert(DataSkipping.currentVersion(spark, dir) === 2L,
      "the fenced commit must not advance the log")

    // RACING writer: both read v2; writer A commits v3 out-of-band
    // (simulated by planting its version file); writer B's create of
    // the same version file must lose the CAS even though its base
    // check passed at read time
    val racerBase = DataSkipping.currentVersion(spark, dir)
    Files.copy(Paths.get(dir, DataSkipping.ManifestName),
      Paths.get(dir, f"_skip_manifest.v${racerBase + 1}%05d.json")): Unit
    intercept[java.util.ConcurrentModificationException] {
      DataSkipping.patchManifest(spark, dir, Nil, Nil, Some(racerBase))
    }: Unit

    // the store itself stays intact and serveable after both rejections
    assert(DataSkipping.readPruned(spark, dir,
      Seq(("k", Long.MinValue, Long.MaxValue - 1))).count() === 101L)
    // every maintenance entry point carries the fence: a concurrent
    // commit between an op's read and its commit rejects the op
    Files.copy(Paths.get(dir, DataSkipping.ManifestName),
      Paths.get(dir, f"_skip_manifest.v${racerBase + 2}%05d.json")): Unit
    // (compactSmallFiles captures its base AFTER the plant, so it
    // commits fine — prove an op-level fence with Erasure instead,
    // planting DURING the op is not needed: the stale-base path above
    // already covers the mechanism; here just confirm ops still work)
    Erasure.deleteKeys(spark, dir, "k", Seq(5L)): Unit
    assert(DataSkipping.readPruned(spark, dir,
      Seq(("k", Long.MinValue, Long.MaxValue - 1))).count() === 100L)
  }

  test("optimistic concurrency: racing appenders all commit under withFenceRetry; no batch is lost, torn, or duplicated — both log formats") {
    // Runs once in the legacy single-file log and once in delta mode
    // with a checkpoint boundary landing MID-RACE (checkpointEvery=3:
    // v3 is a full checkpoint among the racers' delta commits), so the
    // CAS, the redirect pointer, and reconstruction are all exercised
    // under genuine contention.
    for ((mode, thresholdProp) <- Seq(("legacy", None), ("delta", Some("1")))) {
      thresholdProp.foreach(v => sys.props("graft.store.deltaThreshold") = v)
      if (thresholdProp.isDefined) sys.props("graft.store.checkpointEvery") = "3"
      try {
        val dir = tmpDir(s"graft-occ-$mode")
        val base = (0 until 100).map(i => (i.toLong, 0L)).toDF("k", "writer")
        DataSkipping.writeWithStats(base, dir, col("k"), numFiles = 2,
          statsCols = Seq("k")): Unit

        // four writers, each appending a distinct batch, all released at
        // once: the fence serializes the commits, withFenceRetry replays
        // the losers, and the self-cleaning loser protocol leaves zero
        // debris. 4 writers × 25 rows, batches disjoint by construction.
        val start = new java.util.concurrent.CountDownLatch(4)
        val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
        val futures = (1 to 4).map { w =>
          pool.submit(new java.util.concurrent.Callable[Long] {
            def call(): Long = {
              val batch = (0 until 25)
                .map(i => (1000L * w + i, w.toLong)).toDF("k", "writer")
              start.countDown(); start.await()
              DataSkipping.withFenceRetry(maxAttempts = 10) {
                DataSkipping.appendWithStats(batch, dir, col("k"), numFiles = 1)
              }
              w.toLong
            }
          })
        }
        try futures.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
        finally pool.shutdownNow()

        // every batch fully present exactly once
        val got = DataSkipping.readPruned(spark, dir,
          Seq(("k", Long.MinValue, Long.MaxValue - 1)))
        assert(got.count() === 200L, s"[$mode]")
        val perWriter = got.groupBy("writer").count()
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(perWriter === Map(0L -> 100L, 1L -> 25L, 2L -> 25L, 3L -> 25L, 4L -> 25L),
          s"[$mode]")
        // the log advanced once per committed append, serialized
        assert(DataSkipping.currentVersion(spark, dir) === 5L, s"[$mode]")
        if (thresholdProp.isDefined) {
          val fs = new org.apache.hadoop.fs.Path(dir)
            .getFileSystem(spark.sessionState.newHadoopConf())
          assert(!DataSkipping.isDeltaVersion(fs, dir, 3L),
            "the mid-race checkpoint boundary must be a full checkpoint")
          assert((2L to 5L).exists(v => v != 3L &&
            DataSkipping.isDeltaVersion(fs, dir, v)),
            "racing commits above the threshold must write deltas")
          // every intermediate version reconstructs exactly
          (1L to 5L).foreach(v => DataSkipping.readManifestAt(spark, dir, v): Unit)
        }
        // zero debris: losers deleted their own moved files; nothing
        // orphaned, nothing missing, counts exact
        val audit = DataSkipping.fsck(spark, dir, checkRows = true)
        assert(audit.missingFiles.isEmpty && audit.orphanFiles.isEmpty &&
          audit.rowMismatches.isEmpty && audit.unreadableFiles.isEmpty,
          s"[$mode] concurrent appends must leave a clean store: $audit")
      } finally {
        sys.props.remove("graft.store.deltaThreshold"): Unit
        sys.props.remove("graft.store.checkpointEvery"): Unit
      }
    }
  }

  test("optimistic concurrency: upsert racing append — CAS serializes, the loser re-runs staged-clean, nothing lost or torn (4 trials)") {
    (1 to 4).foreach { trial =>
      val dir = tmpDir(s"graft-occ-upsert-$trial")
      val base = (0 until 100).map(i => (i.toLong, 0L)).toDF("k", "writer")
      DataSkipping.writeWithStats(base, dir, col("k"), numFiles = 2,
        statsCols = Seq("k")): Unit
      val start = new java.util.concurrent.CountDownLatch(2)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      val up = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          val updates = Seq((10L, 7L), (11L, 7L), (2000L + trial, 7L)).toDF("k", "writer")
          start.countDown(); start.await()
          DataSkipping.withFenceRetry(maxAttempts = 10) {
            DataSkipping.upsertKeys(spark, dir, "k", updates, col("k"), numFiles = 1)
          }: Unit
        }
      })
      val ap = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          val batch = (0 until 25).map(i => (3000L + i, 1L)).toDF("k", "writer")
          start.countDown(); start.await()
          DataSkipping.withFenceRetry(maxAttempts = 10) {
            DataSkipping.appendWithStats(batch, dir, col("k"), numFiles = 1)
          }: Unit
        }
      })
      try { up.get(120, java.util.concurrent.TimeUnit.SECONDS)
        ap.get(120, java.util.concurrent.TimeUnit.SECONDS) }
      finally pool.shutdownNow()

      val got = DataSkipping.readPruned(spark, dir,
        Seq(("k", Long.MinValue, Long.MaxValue - 1)))
        .as[(Long, Long)].collect().toMap
      assert(got.size === 126, s"trial $trial: 100 base + 1 inserted + 25 appended")
      assert(got(10L) === 7L && got(11L) === 7L && got(2000L + trial) === 7L,
        s"trial $trial: the upsert's replacements and insert must all land")
      assert(got(5L) === 0L && (3000L until 3025L).forall(got(_) === 1L),
        s"trial $trial: untouched base rows and the whole appended batch survive")
      // one commit per writer, serialized by the CAS
      assert(DataSkipping.currentVersion(spark, dir) === 3L)
      val audit = DataSkipping.fsck(spark, dir, checkRows = true)
      assert(audit.missingFiles.isEmpty && audit.orphanFiles.isEmpty &&
        audit.rowMismatches.isEmpty && audit.unreadableFiles.isEmpty,
        s"trial $trial: racing upsert+append must leave a clean store: $audit")
    }
  }

  test("maintenance interleaving: erasure racing compaction — the content law holds whichever order commits (4 trials)") {
    // Destructive maintenance ops are documented exclusive-window, but
    // their CAS-loser paths must still compose safely when violated:
    // each op either wins and the other re-runs against the winner's
    // manifest, or fails mid-read (the winner deleted a file under it)
    // and re-runs whole. Either way: doomed keys erased exactly once,
    // compaction content-invariant, store fsck-clean.
    def retryOp[A](maxAttempts: Int)(op: => A): A = {
      var last: Throwable = null
      (1 to maxAttempts).foreach { _ =>
        try return op
        catch { case scala.util.control.NonFatal(e) => last = e }
      }
      throw last
    }
    (1 to 4).foreach { trial =>
      val dir = tmpDir(s"graft-occ-erase-compact-$trial")
      val all = (0 until 400).map(i => (i.toLong, i.toLong)).toDF("k", "payload")
      DataSkipping.writeWithStats(all.filter(col("k") < 100), dir, col("k"),
        numFiles = 1, statsCols = Seq("k")): Unit
      (1 to 3).foreach(r => DataSkipping.appendWithStats(
        all.filter(col("k") >= r * 100 && col("k") < (r + 1) * 100), dir,
        col("k"), numFiles = 1): Unit)
      val doomed = Seq(5L, 17L, 123L, 250L + trial)
      val start = new java.util.concurrent.CountDownLatch(2)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      val er = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          start.countDown(); start.await()
          retryOp(10) { Erasure.delete(spark, dir, "k", doomed) }: Unit
        }
      })
      val co = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          start.countDown(); start.await()
          retryOp(10) { DataSkipping.compactSmallFiles(spark, dir, col("k"),
            minRows = Long.MaxValue, targetFiles = 2) }: Unit
        }
      })
      try { er.get(180, java.util.concurrent.TimeUnit.SECONDS)
        co.get(180, java.util.concurrent.TimeUnit.SECONDS) }
      finally pool.shutdownNow()

      val got = DataSkipping.readPruned(spark, dir,
        Seq(("k", Long.MinValue, Long.MaxValue - 1)))
        .as[(Long, Long)].collect().toMap
      val want = (0 until 400).map(_.toLong).filterNot(doomed.contains)
      assert(got.keySet === want.toSet,
        s"trial $trial: doomed keys erased exactly once, everything else intact")
      assert(want.forall(k => got(k) === k), s"trial $trial: payloads intact")
      val audit = DataSkipping.fsck(spark, dir, checkRows = true)
      assert(audit.missingFiles.isEmpty && audit.orphanFiles.isEmpty &&
        audit.rowMismatches.isEmpty && audit.unreadableFiles.isEmpty,
        s"trial $trial: racing erasure+compaction must leave a clean store: $audit")
    }
  }

  test("metadataSummary: a GENUINE Long.MaxValue extreme is not mistaken for the all-null sentinel") {
    // the coalesce(k, Long.MaxValue) layout idiom puts real MaxValue
    // values in a stats column; with null counts in the manifest the
    // all-null decision is nulls==rows, so the bound stays exact
    val dir = tmpDir("graft-meta-sentinel")
    val rows = (0 until 4).map(_ => (java.lang.Long.valueOf(Long.MaxValue), 1L)) ++
      (0 until 4).map(i => (null.asInstanceOf[java.lang.Long], 10L + i))
    DataSkipping.writeWithStats(rows.toDF("k", "payload"), dir,
      col("payload"), numFiles = 1, statsCols = Seq("k"))
    val r = DataSkipping.metadataSummary(spark, dir, "k").collect().head
    assert(r.getLong(0) === 8L)
    assert(r.getLong(1) === Long.MaxValue && r.getLong(2) === Long.MaxValue,
      s"genuine MaxValue bounds must survive the all-null test: $r")
  }

  test("exportSnapshot: refuses a live store at the destination; sweeps a crashed export's leftovers") {
    val dir = tmpDir("graft-export-guard-src")
    val df = (0 until 100).map(i => (i.toLong, i.toLong)).toDF("k", "payload")
    DataSkipping.writeWithStats(df, dir, col("k"), numFiles = 2,
      statsCols = Seq("k")): Unit

    // a COMPLETE store at the destination (manifest present) fails loudly
    val live = tmpDir("graft-export-guard-live") + "/store"
    DataSkipping.writeWithStats(df.limit(10), live, col("k"), numFiles = 1,
      statsCols = Seq("k")): Unit
    intercept[IllegalArgumentException] {
      DataSkipping.exportSnapshot(spark, dir, 1L, live)
    }: Unit
    assert(DataSkipping.readPruned(spark, live,
      Seq(("k", Long.MinValue, Long.MaxValue - 1))).count() === 10L,
      "the refused export must leave the existing store untouched")

    // ORDINARY parquet output at the destination — part files, no
    // manifest, no in-progress marker — is SOMEONE'S DATA, not export
    // debris: the export must refuse rather than sweep it (a crashed
    // export always leaves the marker, written before any copy)
    val plain = tmpDir("graft-export-guard-plain") + "/theirs"
    Files.createDirectories(Paths.get(plain)): Unit
    val theirs = Paths.get(plain, "part-00000-users-own-output.parquet")
    Files.write(theirs, Array[Byte](7, 7, 7)): Unit
    intercept[IllegalArgumentException] {
      DataSkipping.exportSnapshot(spark, dir, 1L, plain)
    }: Unit
    assert(Files.exists(theirs),
      "a refused export must not touch the user's unmarked part files")

    // a CRASHED prior export left part files AND the in-progress marker
    // (written first, removed only after the manifest commit): the
    // retry proves the debris is its predecessor's, sweeps, lands clean
    val dest = tmpDir("graft-export-guard-dst") + "/snap"
    Files.createDirectories(Paths.get(dest)): Unit
    val stale = Paths.get(dest, "part-stale-from-crashed-export.parquet")
    Files.write(stale, Array[Byte](9, 9, 9)): Unit
    Files.write(Paths.get(dest, DataSkipping.ExportMarkerName), Array[Byte]()): Unit
    val m = DataSkipping.exportSnapshot(spark, dir, 1L, dest)
    assert(!Files.exists(Paths.get(dest, DataSkipping.ExportMarkerName)),
      "a completed export removes its in-progress marker")
    assert(!Files.exists(stale), "crashed-export leftovers must sweep")
    assert(DataSkipping.fsck(spark, dest).clean,
      "the retried export is a clean self-contained store")
    assert(DataSkipping.readPruned(spark, dest,
      Seq(("k", Long.MinValue, Long.MaxValue - 1))).count() === 100L)
    assert(m.files.map(_.file).toSet ===
      DataSkipping.readManifest(spark, dest).files.map(_.file).toSet)
  }

  test("staged drop: pre-commit every committed file is byte-identical and survivors are orphans; delete-last finishes post-commit") {
    // the lost-CAS/crash contract: stageDropRows touches NO committed
    // file — emptied/replaced originals stay intact and manifest-listed
    // until the caller's commit, staged survivors are orphans invisible
    // to manifest-driven reads, so abandoning the operation at any
    // pre-commit point loses nothing
    val dir = tmpDir("graft-delete-last")
    val df = (0 until 100).map(i => (i.toLong, i.toLong)).toDF("k", "payload")
    val m = DataSkipping.writeWithStats(df, dir, col("k"), numFiles = 4,
      statsCols = Seq("k"))
    val bytesBefore = m.files.map(f =>
      f.file -> Files.readAllBytes(Paths.get(dir, f.file)).toSeq).toMap
    // doom every row of one file and HALF of another
    val victim = m.files.head
    val half = m.files(1)
    val victimKeys = spark.read.parquet(s"$dir/${victim.file}")
      .select("k").collect().map(_.getLong(0)).toSeq
    val halfKeys = spark.read.parquet(s"$dir/${half.file}")
      .select("k").collect().map(_.getLong(0)).sorted.take((half.rows / 2).toInt).toSeq
    val keys = victimKeys ++ halfKeys
    val hits = m.files.filter(f => keys.exists(k => k >= f.mins(0) && k <= f.maxs(0)))
    val d = Erasure.stageDropKeyRows(spark, dir, hits, "k", keys)
    assert(d.emptied === List(victim.file) && d.replacedOld === List(half.file) &&
      d.rowsDeleted === victim.rows + halfKeys.size)
    assert(d.replacedNew.nonEmpty, "the half file's survivors must be staged")
    // pre-commit: EVERY committed file is byte-identical on disk
    m.files.foreach { f =>
      assert(Files.readAllBytes(Paths.get(dir, f.file)).toSeq === bytesBefore(f.file),
        s"pre-commit ${f.file} must be untouched: a lost CAS must lose nothing")
    }
    // pre-commit reads (manifest untouched) still serve the old table;
    // the staged survivors are orphans the manifest-driven read ignores
    assert(DataSkipping.readPruned(spark, dir,
      Seq(("k", Long.MinValue, Long.MaxValue - 1))).count() === 100L)
    d.replacedNew.foreach(n => assert(Files.exists(Paths.get(dir, n))))
    // the caller's commit + post-commit delete finish the protocol
    DataSkipping.patchManifest(spark, dir, d.removed, d.replacedNew): Unit
    Erasure.deleteFiles(dir, d.removed, spark.sessionState.newHadoopConf())
    assert(!Files.exists(Paths.get(dir, victim.file)))
    assert(!Files.exists(Paths.get(dir, half.file)))
    val audit = DataSkipping.fsck(spark, dir, checkRows = true)
    assert(audit.missingFiles.isEmpty && audit.orphanFiles.isEmpty &&
      audit.rowMismatches.isEmpty && audit.unreadableFiles.isEmpty,
      s"the completed protocol leaves the store consistent: $audit")
    assert(audit.invalidVersions === Seq(1L),
      "only the pre-delete snapshot (whose files are gone) invalidates")
    assert(DataSkipping.readPruned(spark, dir,
      Seq(("k", Long.MinValue, Long.MaxValue - 1))).count() ===
      100L - victim.rows - halfKeys.size)
  }

  test("tombstoned deletes: vacuum is the only physical deleter; pinned snapshots survive upsert+compaction; fsck counts tombstones") {
    val dir = tmpDir("graft-tombstone")
    val b1 = (0L until 200L).map(i => (i, i)).toDF("k", "v")
    DataSkipping.writeWithStats(b1, dir, col("k"), numFiles = 4, statsCols = Seq("k"))
    val v1Files = DataSkipping.readManifest(spark, dir).files.map(_.file).toSet
    def onDisk() = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("part-")).toSet
    // upsert replaces one file; compaction folds everything
    DataSkipping.upsertKeys(spark, dir, "k",
      Seq((5L, 999L), (5000L, 1L)).toDF("k", "v"), col("k")): Unit
    DataSkipping.compactSmallFiles(spark, dir, col("k"),
      minRows = Long.MaxValue, targetFiles = 1): Unit
    // NOTHING was physically deleted: every v1 file still on disk
    assert(v1Files.subsetOf(onDisk()),
      "rewrite maintenance must tombstone, never delete")
    // every snapshot stays valid and reads exactly
    assert(DataSkipping.validVersions(spark, dir) === Seq(1L, 2L, 3L))
    assert(DataSkipping.readPrunedAt(spark, dir,
      Seq(("k", Long.MinValue, Long.MaxValue - 1)), 1L)
      .as[(Long, Long)].collect().toMap.apply(5L) === 5L,
      "the pre-upsert snapshot must serve the pre-upsert value")
    // fsck: tombstones are classified, NOT orphans, and the store is clean
    val audit = DataSkipping.fsck(spark, dir, checkRows = true)
    assert(audit.clean, s"tombstones must not dirty the store: $audit")
    assert(audit.orphanFiles.isEmpty && audit.tombstoneFiles.nonEmpty,
      s"replaced files must report as tombstones: $audit")
    // a maintenance sweep never collects them either (they are history)
    DataSkipping.sweepOrphans(spark, dir)
    assert(v1Files.subsetOf(onDisk()), "sweepOrphans must spare tombstones")
    // vacuum expires the history and reclaims exactly the tombstones
    val deleted = DataSkipping.vacuumVersions(spark, dir, retainLast = 1).toSet
    assert(deleted === audit.tombstoneFiles.toSet,
      "vacuum reclaims exactly the expired tombstones")
    assert(DataSkipping.fsck(spark, dir, checkRows = true).tombstoneFiles.isEmpty)
    assert(DataSkipping.readPruned(spark, dir,
      Seq(("k", Long.MinValue, Long.MaxValue - 1))).count() === 201L)
  }

  test("reader-vs-maintenance race: a scan pinned to the previous version survives a concurrent upsert commit (4 trials)") {
    // The round-15 verdict's lead item: pre-tombstones, an upsert
    // deleted its replaced originals immediately post-commit, so a
    // long-running read planned from the previous manifest could die
    // mid-scan with FileNotFoundException. Under tombstoned deletes
    // the previous version's files persist until vacuum — the read
    // must return the pinned version's EXACT content, every trial,
    // with the upsert committing concurrently.
    (1 to 4).foreach { trial =>
      val dir = tmpDir(s"graft-race-read-$trial")
      val base = (0L until 400L).map(i => (i, i)).toDF("k", "v")
      DataSkipping.writeWithStats(base, dir, col("k"), numFiles = 8,
        statsCols = Seq("k")): Unit
      val pinned = DataSkipping.currentVersion(spark, dir)
      val start = new java.util.concurrent.CountDownLatch(2)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      val reader = pool.submit(new java.util.concurrent.Callable[Map[Long, Long]] {
        def call(): Map[Long, Long] = {
          // plan BEFORE the barrier (the scan's file list is fixed at
          // the pinned version), execute while the upsert runs
          val df = DataSkipping.readPrunedAt(spark, dir,
            Seq(("k", Long.MinValue, Long.MaxValue - 1)), pinned)
          start.countDown(); start.await()
          df.as[(Long, Long)].collect().toMap
        }
      })
      val writer = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          val updates = (0L until 400L by 7L).map(k => (k, k + 100000L))
            .toDF("k", "v")
          start.countDown(); start.await()
          DataSkipping.withFenceRetry(maxAttempts = 10) {
            DataSkipping.upsertKeys(spark, dir, "k", updates, col("k"),
              numFiles = 2)
          }: Unit
        }
      })
      try {
        val got = reader.get(120, java.util.concurrent.TimeUnit.SECONDS)
        writer.get(120, java.util.concurrent.TimeUnit.SECONDS)
        assert(got === (0L until 400L).map(k => k -> k).toMap,
          s"trial $trial: the pinned read must serve the pinned version exactly")
      } finally pool.shutdownNow(): Unit
      // and the upsert landed
      assert(DataSkipping.readPruned(spark, dir,
        Seq(("k", Long.MinValue, Long.MaxValue - 1)))
        .as[(Long, Long)].collect().toMap.apply(7L) === 100007L)
    }
  }

  test("RTBF: erasure physically clears accumulated tombstones — old row versions of erased keys must not survive on disk") {
    val dir = tmpDir("graft-rtbf-tomb")
    val b1 = (0L until 100L).map(i => (i, i)).toDF("k", "v")
    DataSkipping.writeWithStats(b1, dir, col("k"), numFiles = 2, statsCols = Seq("k"))
    // the upsert tombstones a file that still holds key 5's OLD row
    DataSkipping.upsertKeys(spark, dir, "k",
      Seq((5L, 999L)).toDF("k", "v"), col("k")): Unit
    assert(DataSkipping.fsck(spark, dir).tombstoneFiles.nonEmpty)
    // erase key 5: RTBF must remove the live row AND the tombstoned
    // old version — a bare directory read (manifest or not) finds no
    // trace of the key
    Erasure.deleteKeys(spark, dir, "k", Seq(5L)): Unit
    assert(DataSkipping.fsck(spark, dir).tombstoneFiles.isEmpty,
      "erasure must clear tombstones (they may hold erased row versions)")
    assert(spark.read.parquet(dir).filter(col("k") === 5L).count() === 0L,
      "no on-disk byte may still hold the erased key")
    assert(DataSkipping.listVersions(spark, dir).size === 1,
      "erasure truncates history to its own commit")
    assert(DataSkipping.readPruned(spark, dir,
      Seq(("k", Long.MinValue, Long.MaxValue - 1))).count() === 99L)
  }

  test("sweep age gate anchors on APPEARANCE time: a slow-written file re-stamps at move-in and survives the sweep") {
    // rename preserves mtime, so a writer whose WRITE phase outlived
    // the grace window used to move in files that were instantly
    // sweep-eligible (ADVICE r16 medium). The movers now re-stamp
    // mtime at the rename; this pins both halves of the fix.
    val dir = tmpDir("graft-sweep-anchor")
    val df = (0L until 100L).map(i => (i, i)).toDF("k", "v")
    DataSkipping.writeWithStats(df, dir, col("k"), numFiles = 1, statsCols = Seq("k"))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // simulate the slow writer: a staged file carrying a write-time
    // mtime far past the grace, renamed into the store dir (rename
    // preserves the stale stamp), then re-stamped as the movers do
    val staged = Paths.get(dir, ".append_tmp_slow")
    Files.createDirectory(staged)
    val f = staged.resolve("part-slow-writer.parquet")
    Files.write(f, Array[Byte](1, 2, 3))
    Files.setLastModifiedTime(f, java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - DataSkipping.SweepGraceMs - 120000L)): Unit
    val dst = new org.apache.hadoop.fs.Path(dir, "part-slow-writer.parquet")
    fs.rename(new org.apache.hadoop.fs.Path(f.toString), dst): Unit
    assert(fs.getFileStatus(dst).getModificationTime <
      System.currentTimeMillis() - DataSkipping.SweepGraceMs,
      "fixture: rename must preserve the stale write-time mtime")
    DataSkipping.touchAppeared(fs, dst)
    assert(fs.getFileStatus(dst).getModificationTime >
      System.currentTimeMillis() - 60000L,
      "move-in must re-stamp to appearance time")
    DataSkipping.sweepOrphans(spark, dir)
    assert(Files.exists(Paths.get(dir, "part-slow-writer.parquet")),
      "a just-appeared pre-commit file must survive the sweep")
    // and the real movers apply the stamp: an upsert's staged survivor
    // files land with fresh mtimes
    DataSkipping.upsertKeys(spark, dir, "k",
      Seq((5L, 999L)).toDF("k", "v"), col("k")): Unit
    val cutoff = System.currentTimeMillis() - 60000L
    DataSkipping.readManifest(spark, dir).files.foreach { mf =>
      assert(fs.getFileStatus(new org.apache.hadoop.fs.Path(dir, mf.file))
        .getModificationTime > cutoff,
        s"${mf.file}: moved-in files must carry appearance-time mtimes")
    }
    fs.delete(dst, false): Unit // cleanup the planted file
  }

  test("staged drop preserves the within-file layout order: an upsert survivor file stays sorted on the stats columns") {
    val dir = tmpDir("graft-stage-sort")
    // shuffled input so only the clustered write (and the survivor
    // re-sort) can produce ordered files
    val rnd = new scala.util.Random(5)
    val df = rnd.shuffle((0L until 2000L).toList).map(i => (i, i)).toDF("k", "v")
    DataSkipping.writeWithStats(df, dir, col("k"), numFiles = 2, statsCols = Seq("k"))
    DataSkipping.upsertKeys(spark, dir, "k",
      Seq((5L, 999L), (7L, 888L)).toDF("k", "v"), col("k"), numFiles = 1): Unit
    val m = DataSkipping.readManifest(spark, dir)
    // every manifest file (original, survivor rewrite, or batch) must
    // be internally sorted on the stats column
    m.files.foreach { f =>
      val ks = spark.read.parquet(s"$dir/${f.file}")
        .select("k").as[Long].collect().toSeq
      assert(ks === ks.sorted,
        s"${f.file}: within-file layout order lost (row-group skipping degrades)")
    }
  }

  test("staged drop plan shape: ONE batched Spark job with a hit-sized shuffle — never a per-file job loop") {
    val dir = tmpDir("graft-stage-plan")
    val df = (0L until 4000L).map(i => (i, i)).toDF("k", "v")
    val m = DataSkipping.writeWithStats(df, dir, col("k"), numFiles = 8,
      statsCols = Seq("k"))
    // doom one key in EVERY file: 8 hits
    val doomed = m.files.map(f => f.mins.head)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val shuffleParts = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
      override def onStageSubmitted(
          ss: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        shuffleParts.add(ss.stageInfo.numTasks): Unit
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val d = Erasure.stageDropKeyRows(spark, dir, m.files, "k", doomed, m.cols)
      // listener events are async; give the bus a moment to drain
      val deadline = System.currentTimeMillis() + 5000
      var last = -1
      while (System.currentTimeMillis() < deadline && jobs.get() != last) {
        last = jobs.get(); Thread.sleep(300)
      }
      assert(d.replacedOld.size === 8)
      // ONE batched write for the whole hit list — under AQE the
      // shuffle materializes as its own job and the parquet read adds
      // one more, so "one logical pass" shows as <= 4 scheduler jobs;
      // a per-file loop would schedule >= 8 (one per hit). The footer
      // classification runs zero jobs (driver-side metadata reads).
      assert(jobs.get() <= 4,
        s"staged drop must be one batched pass, saw ${jobs.get()} jobs for 8 hits")
      // the shuffle is sized to the HIT LIST, not the session default
      assert(shuffleParts.toArray(Array.empty[Integer]).exists(_ == 8),
        s"expected a hits-sized (8-task) stage, saw ${shuffleParts.toArray.mkString(",")}")
      // cleanup the staged orphans (nothing was committed here)
      Erasure.deleteFiles(dir, d.replacedNew, spark.sessionState.newHadoopConf())
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("crashed commit (version file landed, pointer swap lost): the next fenced writer adopts it — reads exact, rows never doubled or lost") {
    // The crash window commitVersion documents: the version-file CAS
    // lands, the process dies before the latest-pointer rename. The
    // version file is then the durable arbiter — a later fenced writer
    // MUST build on it (its base is the log head), never on the stale
    // pointer content. Building on the pointer while fencing on the
    // head is the corruption: in delta mode the later commit's delta
    // would reconstruct ON TOP of the crashed version it never saw —
    // a compaction folding the pre-crash file set then DOUBLES every
    // row the crashed upsert's survivors carry. Exercised in both log
    // formats; the pointer itself self-heals at the next commit's swap.
    for ((mode, thresholdProp) <- Seq(("delta", Some("1")), ("legacy", None))) {
      thresholdProp.foreach(v => sys.props("graft.store.deltaThreshold") = v)
      sys.props("graft.store.checkpointEvery") = "100" // keep post-crash commits deltas
      try {
        val dir = tmpDir(s"graft-crashadopt-$mode")
        val mf = Paths.get(dir, DataSkipping.ManifestName)
        def all() = DataSkipping.readPruned(spark, dir,
          Seq(("k", Long.MinValue, Long.MaxValue - 1)))
        // v1: 100 rows in 2 files; v2: +50 rows
        DataSkipping.writeWithStats((0L until 100L).map(i => (i, i)).toDF("k", "v"),
          dir, col("k"), numFiles = 2, statsCols = Seq("k"))
        DataSkipping.appendWithStats(
          (100L until 150L).map(i => (i, i)).toDF("k", "v"),
          dir, col("k"), numFiles = 1): Unit
        // v3 commits, but its pointer swap "crashes": restore the v2
        // pointer bytes after the op (the version file stays — exactly
        // the state a kill between CAS and rename leaves behind)
        val pointerBeforeCrash = Files.readAllBytes(mf)
        DataSkipping.upsertKeys(spark, dir, "k",
          Seq((5L, 999L), (9999L, 1L)).toDF("k", "v"), col("k")): Unit
        Files.write(mf, pointerBeforeCrash): Unit
        Files.deleteIfExists(Paths.get(dir, s".${DataSkipping.ManifestName}.crc")): Unit
        assert(DataSkipping.currentVersion(spark, dir) === 3L)
        // a reader between the crash and the next commit serves the
        // pointer's snapshot — v2, a committed state (files tombstoned,
        // not deleted, so the scan is exact)
        assert(all().count() === 150L, s"[$mode] pre-adoption reader")
        // staleness is OBSERVABLE: fsck surfaces the pointer trailing
        // the log head by exactly the crashed commit (readers never
        // repair it — that would race the commit path)
        assert(DataSkipping.fsck(spark, dir).pointerLag === 1,
          s"[$mode] crash-window pointer lag not reported")
        // a vacuum INSIDE the crash window must not break pointer
        // reads: in delta mode retention extends to the pointer's
        // redirect target (and its chain), in legacy mode the
        // self-contained pointer's data files are `referenced`-spared
        DataSkipping.vacuumVersions(spark, dir, retainLast = 1): Unit
        assert(all().count() === 150L,
          s"[$mode] pointer read broken by a crash-window vacuum")
        // v4: a fenced compaction folding everything it sees. It must
        // see v3 (its fence base), so the upsert survives the fold.
        DataSkipping.compactSmallFiles(spark, dir, col("k"),
          minRows = Long.MaxValue / 2, targetFiles = 1): Unit
        val rows = all().as[(Long, Long)].collect()
        assert(rows.length === 151,
          s"[$mode] expected 151 rows post-adoption, got ${rows.length} — " +
            "the crashed upsert was lost or its survivors double-counted")
        val byKey = rows.groupBy(_._1)
        assert(byKey.forall(_._2.length == 1),
          s"[$mode] duplicated keys: ${byKey.filter(_._2.length > 1).keys.take(5).mkString(",")}")
        assert(byKey(5L).head._2 === 999L, s"[$mode] upsert's update lost")
        assert(byKey.contains(9999L), s"[$mode] upsert's insert lost")
        // the pointer healed at v4's swap: a plain pointer read now
        // serves the adopted lineage, and the reported lag returns to 0
        assert(DataSkipping.readManifest(spark, dir).files.map(_.rows).sum === 151L)
        assert(DataSkipping.fsck(spark, dir).pointerLag === 0,
          s"[$mode] pointer lag must heal at the next commit")
        // any file the vacuum spared ONLY for the stale pointer is,
        // after the heal, version-unreferenced debris — the age-gated
        // sweep collects it on the next maintenance pass (grace forced
        // to 0 to model the age-out); fsck is then clean
        sys.props("graft.store.sweepGraceMs") = "0"
        try DataSkipping.sweepOrphans(spark, dir)
        finally sys.props.remove("graft.store.sweepGraceMs"): Unit
        assert(DataSkipping.fsck(spark, dir, checkRows = true).clean,
          s"[$mode] fsck after adoption")
      } finally {
        sys.props.remove("graft.store.deltaThreshold"): Unit
        sys.props.remove("graft.store.checkpointEvery"): Unit
      }
    }
  }

  test("truncated manifest bytes are LOUD, and an unparsable never-published head quarantines: maintenance stays live") {
    // Half 1 — truncation detection: a write cut at a LINE boundary
    // used to parse silently minus its tail entries (the entry regex
    // tolerates the joining comma and the closing `]}` was dropped
    // unchecked) — silent file loss on every read. A truncated
    // POINTER must never serve a smaller file set: with an intact
    // version log it degrades to the COMPLETE log head (the pointer
    // is a publication cache of the CAS-arbitrated log); with no log
    // to fall back to (legacy manifest-only layout) it throws.
    val dirA = tmpDir("graft-trunc-loud")
    DataSkipping.writeWithStats((0L until 100L).map(i => (i, i)).toDF("k", "v"),
      dirA, col("k"), numFiles = 4, statsCols = Seq("k"))
    val mfA = Paths.get(dirA, DataSkipping.ManifestName)
    val whole = new String(Files.readAllBytes(mfA), "UTF-8")
    val truncated = whole.linesIterator.toVector.dropRight(2).mkString("\n")
    Files.write(mfA, truncated.getBytes("UTF-8")): Unit
    Files.deleteIfExists(Paths.get(dirA, s".${DataSkipping.ManifestName}.crc")): Unit
    assert(DataSkipping.readManifest(spark, dirA).files.size === 4,
      "a truncated pointer over an intact log serves the COMPLETE head" +
        " — never the tail-dropped parse")
    // legacy manifest-only layout (no version log): nothing to fall
    // back to — the truncated parse must throw
    val dirL = tmpDir("graft-trunc-legacy")
    Files.write(Paths.get(dirL, DataSkipping.ManifestName),
      truncated.getBytes("UTF-8")): Unit
    val loud = intercept[IllegalStateException] {
      DataSkipping.readManifest(spark, dirL)
    }
    assert(loud.getMessage.contains("truncated"),
      s"line-boundary truncation must be loud, got: ${loud.getMessage}")

    // Half 2 — liveness: a writer crashed mid-create leaves an
    // unparsable file at the log HEAD; fenced writers read at the head
    // (crash adoption), so without repair every maintenance op is
    // bricked forever. The head is never-published (the pointer swap
    // never ran), so it quarantines (.corrupt, forensics kept) and the
    // op retries clean under the standard fence-retry discipline.
    sys.props("graft.store.deltaThreshold") = "1"
    sys.props("graft.store.checkpointEvery") = "100"
    sys.props("graft.store.sweepGraceMs") = "0" // age-gate: test clock
    try {
      val dirB = tmpDir("graft-trunc-live")
      DataSkipping.writeWithStats((0L until 100L).map(i => (i, i)).toDF("k", "v"),
        dirB, col("k"), numFiles = 2, statsCols = Seq("k"))
      DataSkipping.appendWithStats(
        (100L until 150L).map(i => (i, i)).toDF("k", "v"), dirB, col("k"), 1): Unit
      // the crashed head: v3's bytes cut mid-stream, pointer untouched
      val v2Bytes = Files.readAllBytes(Paths.get(dirB, DataSkipping.versionName(2L)))
      Files.write(Paths.get(dirB, DataSkipping.versionName(3L)),
        v2Bytes.take(v2Bytes.length / 2)): Unit
      assert(DataSkipping.currentVersion(spark, dirB) === 3L)
      // the quarantine path must FENCE (throw CME), never re-anchor:
      // returning the v2 manifest while the caller keeps base=3 would
      // let a concurrent writer's fresh v3 be silently built over by
      // this writer's later CAS (the fence compares version NUMBERS
      // only) — a lost update. The CME hands the retry loop a clean
      // re-read instead.
      intercept[java.util.ConcurrentModificationException] {
        DataSkipping.readManifestBase(spark, dirB, 3L)
      }
      assert(DataSkipping.currentVersion(spark, dirB) === 2L,
        "the corrupt head is quarantined by the fenced read")
      // a fenced append: under the retry discipline the op commits
      // clean against the restored head
      DataSkipping.withFenceRetry(maxAttempts = 5) {
        DataSkipping.appendWithStats(
          (150L until 175L).map(i => (i, i)).toDF("k", "v"), dirB, col("k"), 1)
      }
      assert(DataSkipping.readPruned(spark, dirB,
        Seq(("k", Long.MinValue, Long.MaxValue - 1))).count() === 175L)
      // the quarantined residue is out of the log but kept on disk
      assert(DataSkipping.listVersions(spark, dirB) === Seq(1L, 2L, 3L),
        "the freed head number recommits")
      assert(Files.exists(Paths.get(dirB, DataSkipping.versionName(3L) + ".corrupt")),
        "forensics kept")
      assert(DataSkipping.fsck(spark, dirB, checkRows = true).clean)
      // readers never repair: time travel to a corrupt NON-head (make
      // v2 corrupt out-of-band) stays loud
      Files.write(Paths.get(dirB, DataSkipping.versionName(2L)),
        v2Bytes.take(3)): Unit
      intercept[IllegalStateException] {
        DataSkipping.readManifestAt(spark, dirB, 2L)
      }
    } finally {
      sys.props.remove("graft.store.deltaThreshold"): Unit
      sys.props.remove("graft.store.checkpointEvery"): Unit
      sys.props.remove("graft.store.sweepGraceMs"): Unit
    }
  }

  test("mid-chain rotted checkpoint: fsck reports without crashing, recoverLog quarantines the zone, every still-valid version reads exactly") {
    // Post-publication rot of an INTERMEDIATE version file (a file
    // truncated at commit time is never published — the head
    // quarantine handles that): every delta downstream of the corpse
    // is unreconstructible until the next full checkpoint. The store
    // must (a) audit that state without crashing, (b) repair it via
    // recoverLog when the LIVE head is unaffected, (c) keep every
    // still-reconstructible version value-exact through the repair.
    sys.props("graft.store.deltaThreshold") = "1"
    sys.props("graft.store.checkpointEvery") = "3"
    try {
      val dir = tmpDir("graft-midchain-rot")
      def app(lo: Long, hi: Long) = DataSkipping.appendWithStats(
        (lo until hi).map(i => (i, i)).toDF("k", "v"), dir, col("k"), 1)
      def countAt(v: Long) = DataSkipping.readPrunedAt(spark, dir,
        Seq(("k", Long.MinValue, Long.MaxValue - 1)), v).count()
      // v1 full(init), v2 delta, v3 CHECKPOINT, v4 delta, v5 delta,
      // v6 CHECKPOINT, v7 delta — counts 100/150/175/185/190/195/200
      DataSkipping.writeWithStats((0L until 100L).map(i => (i, i)).toDF("k", "v"),
        dir, col("k"), numFiles = 2, statsCols = Seq("k"))
      app(100, 150); app(150, 175); app(175, 185)
      app(185, 190); app(190, 195); app(195, 200): Unit
      // rot the v3 checkpoint AFTER publication
      val v3p = Paths.get(dir, DataSkipping.versionName(3L))
      val v3Bytes = Files.readAllBytes(v3p)
      Files.write(v3p, v3Bytes.take(v3Bytes.length / 2)): Unit
      // the live head (anchored at the v6 checkpoint) is unaffected
      assert(DataSkipping.readPruned(spark, dir,
        Seq(("k", Long.MinValue, Long.MaxValue - 1))).count() === 200L)
      // the audit reports the whole broken zone [corpse, next ckpt)
      // instead of crashing on the first unparsable version
      val pre = DataSkipping.fsck(spark, dir, checkRows = true)
      assert(pre.invalidVersions === Seq(3L, 4L, 5L), s"got $pre")
      assert(!pre.clean)
      // loud for direct readers, in the whole zone
      intercept[IllegalStateException] { DataSkipping.readManifestAt(spark, dir, 4L) }
      // recovery: live head good -> history-only repair, no rollback
      val rep = DataSkipping.recoverLog(spark, dir)
      assert(rep.quarantined === Seq(3L, 4L, 5L))
      assert(rep.rolledBackFrom.isEmpty && rep.orphanedFiles.isEmpty)
      assert(DataSkipping.listVersions(spark, dir) === Seq(1L, 2L, 6L, 7L))
      assert(Files.exists(Paths.get(dir, DataSkipping.versionName(3L) + ".corrupt")),
        "forensics kept")
      // every surviving version reads value-exact across the gap
      assert(countAt(1L) === 100L); assert(countAt(2L) === 150L)
      assert(countAt(6L) === 195L); assert(countAt(7L) === 200L)
      assert(DataSkipping.validVersions(spark, dir) === Seq(1L, 2L, 6L, 7L))
      // the audit is clean again and classifies the corpses
      val post = DataSkipping.fsck(spark, dir, checkRows = true)
      assert(post.clean, s"got $post")
      assert(post.quarantinedVersions === Seq(3L, 4L, 5L))
      // recoverLog's STAMPED fallback spelling ('.corrupt.<millis>',
      // used when the plain destination already exists) must stay
      // visible to the audit too
      Files.move(Paths.get(dir, DataSkipping.versionName(4L) + ".corrupt"),
        Paths.get(dir, DataSkipping.versionName(4L) + ".corrupt.1755264000000")): Unit
      assert(DataSkipping.fsck(spark, dir).quarantinedVersions === Seq(3L, 4L, 5L),
        "a stamped corpse must not vanish from the quarantine report")
      // DEAD POINTER: a redirect into the quarantined zone (a commit
      // whose pointer swap ran but whose version file later rotted)
      // fails every pointer read; recoverLog re-points it at the
      // surviving head even with nothing left to quarantine
      Files.write(Paths.get(dir, DataSkipping.ManifestName),
        """{"redirect":3}""".getBytes("UTF-8")): Unit
      Files.deleteIfExists(Paths.get(dir, s".${DataSkipping.ManifestName}.crc")): Unit
      intercept[Exception] { DataSkipping.readManifest(spark, dir) }
      // the AUDIT must report the dead-pointer state (it exists to
      // diagnose exactly this before recoverLog), never crash on it
      val deadAudit = DataSkipping.fsck(spark, dir)
      assert(deadAudit.brokenPointer === Some(3L), s"got $deadAudit")
      assert(deadAudit.pointerLag === -1)
      assert(!deadAudit.clean)
      val rep2 = DataSkipping.recoverLog(spark, dir)
      assert(rep2.quarantined.isEmpty && rep2.head === 7L)
      assert(DataSkipping.readManifest(spark, dir).files.map(_.rows).sum === 200L,
        "the healed pointer serves the surviving head")
      // maintenance liveness: the next fenced commit lands normally
      app(200, 205): Unit
      assert(DataSkipping.readPruned(spark, dir,
        Seq(("k", Long.MinValue, Long.MaxValue - 1))).count() === 205L)
    } finally {
      sys.props.remove("graft.store.deltaThreshold"): Unit
      sys.props.remove("graft.store.checkpointEvery"): Unit
    }
  }

  test("rotted checkpoint under the LIVE head: recoverLog refuses silently losing commits, rollback is explicit, orphans re-append") {
    sys.props("graft.store.deltaThreshold") = "1"
    sys.props("graft.store.checkpointEvery") = "3"
    // the orphan report is age-gated like every sweep (a live writer's
    // just-moved files are also unreferenced); test clock = 0
    sys.props("graft.store.sweepGraceMs") = "0"
    try {
      val dir = tmpDir("graft-head-rot")
      def app(lo: Long, hi: Long) = DataSkipping.appendWithStats(
        (lo until hi).map(i => (i, i)).toDF("k", "v"), dir, col("k"), 1)
      def total() = DataSkipping.readPruned(spark, dir,
        Seq(("k", Long.MinValue, Long.MaxValue - 1))).count()
      // v1 full, v2 delta, v3 CHECKPOINT, v4 delta, v5 delta (head) —
      // counts 100/150/175/185/190
      DataSkipping.writeWithStats((0L until 100L).map(i => (i, i)).toDF("k", "v"),
        dir, col("k"), numFiles = 2, statsCols = Seq("k"))
      app(100, 150); app(150, 175); app(175, 185); app(185, 190): Unit
      val v3p = Paths.get(dir, DataSkipping.versionName(3L))
      val v3Bytes = Files.readAllBytes(v3p)
      Files.write(v3p, v3Bytes.take(v3Bytes.length / 2)): Unit
      // the HEAD reconstructs through the corpse: its commits' metadata
      // is genuinely lost. Recovery must not silently discard them.
      intercept[IllegalArgumentException] { DataSkipping.recoverLog(spark, dir) }
      val rep = DataSkipping.recoverLog(spark, dir, allowRollback = true)
      assert(rep.quarantined === Seq(3L, 4L, 5L))
      assert(rep.rolledBackFrom === Some(5L))
      // rolled back to v2's content, re-committed as a full checkpoint
      // (v3 — the corpse's freed number) so the latest pointer is valid
      assert(rep.head === 3L)
      assert(total() === 150L)
      assert(DataSkipping.readManifest(spark, dir).files.map(_.rows).sum === 150L)
      // the lost commits' part files survive as re-appendable orphans
      assert(rep.orphanedFiles.size === 3)
      // ... and the documented runbook works: re-append them hit-sized
      DataSkipping.patchManifest(spark, dir, Nil, rep.orphanedFiles,
        Some(DataSkipping.currentVersion(spark, dir))): Unit
      assert(total() === 190L, "re-appended orphans restore the lost rows")
      val post = DataSkipping.fsck(spark, dir, checkRows = true)
      assert(post.clean, s"got $post")
      assert(post.quarantinedVersions === Seq(3L, 4L, 5L))
    } finally {
      sys.props.remove("graft.store.deltaThreshold"): Unit
      sys.props.remove("graft.store.checkpointEvery"): Unit
      sys.props.remove("graft.store.sweepGraceMs"): Unit
    }
  }

  test("store marker written at init; fsck flags vacuum-overdue when tombstone bytes exceed live bytes") {
    val dir = tmpDir("graft-marker")
    DataSkipping.writeWithStats((0L until 200L).map(i => (i, i)).toDF("k", "v"),
      dir, col("k"), numFiles = 2, statsCols = Seq("k"))
    // the on-disk hint that this directory is manifest-defined (a bare
    // spark.read.parquet(dir) on an upserted store includes tombstones)
    assert(Files.exists(Paths.get(dir, DataSkipping.StoreMarkerName)),
      "init must brand the directory")
    assert(!DataSkipping.fsck(spark, dir).vacuumOverdue)
    // two whole-table rewrites -> two tombstoned generations > live
    DataSkipping.recluster(spark, dir, col("k"), 2, Seq("k")): Unit
    DataSkipping.recluster(spark, dir, col("k"), 2, Seq("k")): Unit
    assert(DataSkipping.fsck(spark, dir).vacuumOverdue,
      "two tombstoned generations must flag vacuum as overdue")
    DataSkipping.vacuumVersions(spark, dir, retainLast = 1): Unit
    assert(!DataSkipping.fsck(spark, dir).vacuumOverdue,
      "vacuum reclaims the tombstones and clears the flag")
  }

  test("checkpointed log: delta commits above the threshold are law-equal — time travel, feeds, vacuum, erasure all exact") {
    // Force delta mode at toy scale: every commit from v2 on writes a
    // KB delta (except each 4th version, a full checkpoint). The laws
    // must be indistinguishable from the legacy full-rewrite log.
    sys.props("graft.store.deltaThreshold") = "1"
    sys.props("graft.store.checkpointEvery") = "4"
    try {
      val dir = tmpDir("graft-deltalog")
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      def all() = DataSkipping.readPruned(spark, dir,
        Seq(("k", Long.MinValue, Long.MaxValue - 1)))
      // v1: initial write (always full — no predecessor)
      DataSkipping.writeWithStats((0L until 100L).map(i => (i, i)).toDF("k", "v"),
        dir, col("k"), numFiles = 2, statsCols = Seq("k"))
      // v2..v3: appends (deltas), v4: append (checkpoint boundary)
      (1 to 3).foreach { b =>
        DataSkipping.appendWithStats(
          (100L * b until 100L * b + 50L).map(i => (i, i)).toDF("k", "v"),
          dir, col("k"), numFiles = 1): Unit
      }
      assert(!DataSkipping.isDeltaVersion(fs, dir, 1L), "v1 must be full")
      assert(DataSkipping.isDeltaVersion(fs, dir, 2L), "v2 must be a delta")
      assert(DataSkipping.isDeltaVersion(fs, dir, 3L), "v3 must be a delta")
      assert(!DataSkipping.isDeltaVersion(fs, dir, 4L),
        "every checkpointEvery-th version must be a full checkpoint")
      assert(all().count() === 250L)
      // v5: an upsert (delta with removed+added) — reconstruction must
      // apply the drop AND the adds
      DataSkipping.upsertKeys(spark, dir, "k",
        Seq((5L, 999L), (9999L, 1L)).toDF("k", "v"), col("k")): Unit
      assert(DataSkipping.isDeltaVersion(fs, dir, 5L))
      assert(all().as[(Long, Long)].collect().toMap.apply(5L) === 999L)
      assert(all().count() === 251L)
      // time travel reconstructs EVERY version exactly
      val expect = Seq(100L, 150L, 200L, 250L, 251L)
      (1 to 5).foreach { v =>
        assert(DataSkipping.readPrunedAt(spark, dir,
          Seq(("k", Long.MinValue, Long.MaxValue - 1)), v.toLong).count()
          === expect(v - 1), s"version $v reconstruction")
      }
      assert(DataSkipping.validVersions(spark, dir) === Seq(1L, 2L, 3L, 4L, 5L))
      // the chained feed across delta versions is still the true delta
      val feed = DataSkipping.changesBetween(spark, dir, 2L, 5L)
      assert(feed.filter(col("__change") =!= "insert").count() === 0L)
      assert(feed.count() === 102L, "two appends (100) + the upsert batch (2)")
      // fsck clean (tombstone from the upsert classified, not orphaned)
      val audit = DataSkipping.fsck(spark, dir, checkRows = true)
      assert(audit.clean && audit.tombstoneFiles.nonEmpty, s"$audit")
      // vacuum with the latest a DELTA: retention must extend back to
      // its checkpoint (v4) so reconstruction survives
      DataSkipping.vacuumVersions(spark, dir, retainLast = 1): Unit
      assert(DataSkipping.listVersions(spark, dir) === Seq(4L, 5L),
        "retention extends to the checkpoint a kept delta chains through")
      assert(all().count() === 251L)
      assert(DataSkipping.readPrunedAt(spark, dir,
        Seq(("k", Long.MinValue, Long.MaxValue - 1)), 5L).count() === 251L)
      // erasure: forced checkpoint + history truncation stand alone
      Erasure.deleteKeys(spark, dir, "k", Seq(7L, 107L)): Unit
      assert(DataSkipping.listVersions(spark, dir) === Seq(6L))
      assert(!DataSkipping.isDeltaVersion(fs, dir, 6L),
        "an erasure commit must be a full checkpoint (its bases are destroyed)")
      assert(all().count() === 249L)
      assert(DataSkipping.fsck(spark, dir, checkRows = true).clean)
    } finally {
      sys.props.remove("graft.store.deltaThreshold"): Unit
      sys.props.remove("graft.store.checkpointEvery"): Unit
    }
  }

  test("candidateFiles: 100k keys x 1k manifest entries is a driver-side blink, no false negatives, range-tight") {
    // the erasure-list shape the verdict flagged: a naive
    // keys-per-file loop is O(files x keys) = 1e8 here; the sorted
    // binary search + range-restricted bloom probes must answer in
    // well under a second wall-driver time
    val span = 100L
    val files = (0 until 1000).map { i =>
      val lo = i * 1000L // file i holds exactly [i*1000, i*1000+99]
      val bloom = org.apache.spark.util.sketch.BloomFilter.create(span, 0.01)
      (lo until lo + span).foreach(bloom.putLong)
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      DataSkipping.FileStats(f"part-$i%05d", span, Seq(lo), Seq(lo + span - 1),
        Seq(java.util.Base64.getEncoder.encodeToString(bos.toByteArray)), Seq(0L))
    }
    val m = DataSkipping.SkipManifest(Seq("k"), files, Seq("k"))
    // keys cover only the FIRST half's ranges: the 500 hit-free files
    // are where a naive loop pays the full 100k probes each
    val rnd = new scala.util.Random(7)
    val keys: Seq[Any] = Seq.fill(100000)(rnd.nextLong(500L * 1000L))
    val t0 = System.nanoTime()
    val fast = DataSkipping.candidateFiles(m, "k", keys, "test").map(_.file).toSet
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 5.0, f"candidateFiles took $secs%.2f s on 100k x 1k — not sublinear")
    // NO FALSE NEGATIVES: every file that truly contains a key is a candidate
    val containing = keys.collect { case k: Long if k % 1000L < span => f"part-${k / 1000L}%05d" }.toSet
    assert(containing.nonEmpty && containing.subsetOf(fast),
      "a file containing a listed key was skipped")
    // RANGE-TIGHT: no candidate outside the keyed half (bloom false
    // positives there are unreachable — their ranges hold no key, and
    // range evidence restricts the probes)
    assert(fast.forall(_.stripPrefix("part-").toInt < 500),
      "a file whose range holds no key must never be a candidate")
  }

  test("feed coverage under a racing vacuum: a silently shorter fold degrades to the endpoint diff, never a suffix-only feed") {
    // The chained walk's fold takes its OWN directory listing — a
    // vacuum racing between changesBetween's first snapshot and that
    // fold expires LEADING versions with no parse failure (vacuum
    // retains back to a checkpoint, so the first survivor anchors
    // cleanly). An unchecked walk would then emit plans for the
    // surviving suffix only and silently DROP the leading change
    // events. The law: a fold that does not cover [fromV, toV]
    // exactly returns None (endpoint fallback), never a partial feed.
    sys.props("graft.store.deltaThreshold") = "1"
    sys.props("graft.store.checkpointEvery") = "3"
    try {
      val dir = tmpDir("graft-feed-coverage")
      DataSkipping.writeWithStats((0L until 50L).map(i => (i, i)).toDF("k", "v"),
        dir, col("k"), numFiles = 1, statsCols = Seq("k"))
      (1 to 6).foreach(b => DataSkipping.appendWithStats(
        (50L * b until 50L * b + 10L).map(i => (i, i)).toDF("k", "v"),
        dir, col("k"), 1): Unit)
      val onDisk = DataSkipping.listPartFiles(spark, dir).toSet
      val full = DataSkipping.chainedFeedPlans(spark, dir, 1L, 7L, onDisk,
        (1L to 7L).toSet)
      assert(full.exists(_.size === 6), "intact log: 6 pairwise plans")
      // vacuum expires the leading versions for real...
      DataSkipping.vacuumVersions(spark, dir, retainLast = 2): Unit
      val survivors = DataSkipping.listVersions(spark, dir)
      assert(survivors.head > 1L && survivors.last === 7L,
        s"precondition: leading versions expired, got $survivors")
      // ...but the caller still holds the STALE pre-vacuum snapshot
      // (the race window): the walk must refuse, not emit a suffix
      assert(DataSkipping.chainedFeedPlans(spark, dir, 1L, 7L, onDisk,
        (1L to 7L).toSet).isEmpty,
        "a fold that lost its leading versions must degrade to the endpoint diff")
    } finally {
      sys.props.remove("graft.store.deltaThreshold"): Unit
      sys.props.remove("graft.store.checkpointEvery"): Unit
    }
  }

  test("pointer swap storm: concurrent swappers (commit vs recoverLog heal) never fail each other's rename; the pointer stays whole") {
    // Regression law for the shared-write-aside race: both the commit
    // path and recoverLog's dead-pointer heal swap the latest pointer;
    // with ONE shared tmp name a racing create(overwrite) deleted the
    // other swapper's tmp between write and rename, so a commit whose
    // version file had already CAS'd durably threw
    // FileNotFoundException. With nonce'd write-asides the storm must
    // complete exception-free and leave a readable pointer.
    val dir = tmpDir("graft-swap-storm")
    DataSkipping.writeWithStats((0L until 10L).map(i => (i, i)).toDF("k", "v"),
      dir, col("k"), numFiles = 1, statsCols = Seq("k"))
    DataSkipping.appendWithStats((10L until 20L).map(i => (i, i)).toDF("k", "v"),
      dir, col("k"), 1): Unit
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = Seq(1L, 2L).map { v =>
      new Thread(() =>
        try (1 to 300).foreach { _ =>
          DataSkipping.swapPointer(fs, conf, dir,
            s"""{"redirect":$v}\n""".getBytes("UTF-8"))
        } catch { case t: Throwable => errs.add(t): Unit })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"swap storm threw: ${Option(errs.peek())}")
    val m = DataSkipping.readManifest(spark, dir)
    assert(m.files.map(_.rows).sum === 10L || m.files.map(_.rows).sum === 20L,
      "the pointer serves one of the two swapped versions, whole")
    // stranded write-asides (a swapper crashed between write and
    // rename) are age-gated debris: vacuum sweeps old ones, spares
    // fresh ones (a live swap's tmp is milliseconds old)
    val stale = Paths.get(dir, s".${DataSkipping.ManifestName}.tmp.stranded")
    Files.write(stale, "{}".getBytes("UTF-8")): Unit
    Files.setLastModifiedTime(stale,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 7 * 24 * 3600 * 1000L)): Unit
    val fresh = Paths.get(dir, s".${DataSkipping.ManifestName}.tmp.fresh")
    Files.write(fresh, "{}".getBytes("UTF-8")): Unit
    DataSkipping.vacuumVersions(spark, dir, retainLast = 10): Unit
    assert(!Files.exists(stale), "aged stranded tmp swept")
    assert(Files.exists(fresh), "fresh (possibly live) tmp spared")
  }

  test("concurrent readers during recoverLog: a pre-zone pin reads exactly throughout; an in-zone pin fails loudly, never partially") {
    // The writer-side quarantine laws are pinned above; this pins the
    // READER side of the same repair, interleaved with it: a time
    // traveler pinned BEFORE the broken zone must read value-exact on
    // every attempt while recoverLog runs (its chain anchors below the
    // corpse — the repair never touches it), and one pinned INSIDE the
    // zone must fail loudly on every attempt — corrupt-parse before
    // the quarantine, version-missing after, NEVER a partial result —
    // because readers reconstruct only through version files and the
    // quarantine's rename is atomic per file.
    sys.props("graft.store.deltaThreshold") = "1"
    sys.props("graft.store.checkpointEvery") = "3"
    try {
      val dir = tmpDir("graft-recover-readers")
      def app(lo: Long, hi: Long) = DataSkipping.appendWithStats(
        (lo until hi).map(i => (i, i)).toDF("k", "v"), dir, col("k"), 1)
      def countAt(v: Long) = DataSkipping.readPrunedAt(spark, dir,
        Seq(("k", Long.MinValue, Long.MaxValue - 1)), v).count()
      // v1 full(100), v2 delta(150), v3 CKPT(175), v4 delta(185),
      // v5 delta(190), v6 CKPT(195), v7 delta(200)
      DataSkipping.writeWithStats((0L until 100L).map(i => (i, i)).toDF("k", "v"),
        dir, col("k"), numFiles = 2, statsCols = Seq("k"))
      app(100, 150); app(150, 175); app(175, 185)
      app(185, 190); app(190, 195); app(195, 200): Unit
      val v3p = Paths.get(dir, DataSkipping.versionName(3L))
      val v3Bytes = Files.readAllBytes(v3p)
      Files.write(v3p, v3Bytes.take(v3Bytes.length / 2)): Unit
      // interleaved harness: both readers hammer their pinned version
      // on their own threads; the repair runs in the middle; each side
      // must observe reads strictly BEFORE and strictly AFTER it
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val pre = new java.util.concurrent.ConcurrentLinkedQueue[scala.util.Try[Long]]
      val zone = new java.util.concurrent.ConcurrentLinkedQueue[scala.util.Try[Long]]
      def reader(q: java.util.concurrent.ConcurrentLinkedQueue[scala.util.Try[Long]],
          v: Long) = new Thread(() =>
        while (!stop.get()) q.add(scala.util.Try(countAt(v))): Unit)
      val threads = Seq(reader(pre, 2L), reader(zone, 4L))
      threads.foreach(_.start())
      def awaitAtLeast(preN: Int, zoneN: Int): Unit = {
        val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
        while ((pre.size < preN || zone.size < zoneN) &&
            System.nanoTime() < deadline)
          Thread.sleep(20)
        assert(pre.size >= preN && zone.size >= zoneN, "reader threads stalled")
      }
      awaitAtLeast(3, 3)
      val rep = DataSkipping.recoverLog(spark, dir)
      assert(rep.quarantined === Seq(3L, 4L, 5L) && rep.head === 7L)
      // each pin observes reads strictly AFTER the repair too (the
      // queues grow at very different rates: failing fast is cheap,
      // a successful pruned read is a Spark job — await independently)
      awaitAtLeast(pre.size + 3, zone.size + 3)
      stop.set(true); threads.foreach(_.join())
      import scala.jdk.CollectionConverters._
      // pre-zone pin: EVERY attempt, before/during/after, is exact
      val preSeq = pre.asScala.toSeq
      assert(preSeq.nonEmpty && preSeq.forall(_ == scala.util.Success(150L)),
        s"pre-zone reader saw ${preSeq.filterNot(_ == scala.util.Success(150L)).take(3)}")
      // in-zone pin: EVERY attempt fails loudly; no partial data ever
      val zoneSeq = zone.asScala.toSeq
      assert(zoneSeq.nonEmpty && zoneSeq.forall(_.isFailure),
        s"in-zone reader got data from a broken version: " +
          s"${zoneSeq.filter(_.isSuccess).take(3)}")
      // post-repair: the surviving log serves exactly
      assert(countAt(2L) === 150L && countAt(6L) === 195L && countAt(7L) === 200L)
    } finally {
      sys.props.remove("graft.store.deltaThreshold"): Unit
      sys.props.remove("graft.store.checkpointEvery"): Unit
    }
  }

  test("adaptive checkpoint cadence: K = clamp(E/200, 10, 1000); a cadence change mid-log leaves every reader exact") {
    // the policy's fixed points (measured anchors: E=1k keeps the
    // legacy floor 10; E=20k gives 100 — the 4.6x walk-cut row in
    // SCALE.md; the ceiling bounds a reader's worst delta chain)
    assert(DataSkipping.checkpointCadence(0) === 10L)
    assert(DataSkipping.checkpointCadence(1000) === 10L)
    assert(DataSkipping.checkpointCadence(20000) === 100L)
    assert(DataSkipping.checkpointCadence(100000) === 500L)
    assert(DataSkipping.checkpointCadence(Int.MaxValue) === 1000L)
    // an explicit override pins a static cadence (what every law that
    // synthesizes checkpoint positions relies on)
    sys.props("graft.store.checkpointEvery") = "7"
    try assert(DataSkipping.checkpointCadence(20000) === 7L)
    finally sys.props.remove("graft.store.checkpointEvery"): Unit
    // MID-LOG cadence change: version files are SELF-DESCRIBING (the
    // '{"delta":' header sniff), so the reconstruction walk needs no
    // knowledge of the cadence that wrote them — a store committed
    // half at K=3 and half at K=5 (a growing table crossing a clamp
    // step, or an operator flipping the override) must reconstruct
    // exactly at every version, feed true-delta across the boundary,
    // and audit clean, with zero read-side coordination.
    sys.props("graft.store.deltaThreshold") = "1"
    sys.props("graft.store.checkpointEvery") = "3"
    try {
      val dir = tmpDir("graft-cadence-change")
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      DataSkipping.writeWithStats((0L until 40L).map(i => (i, i)).toDF("k", "v"),
        dir, col("k"), numFiles = 1, statsCols = Seq("k"))
      (1 to 4).foreach(b => DataSkipping.appendWithStats(
        (40L + 10L * (b - 1) until 40L + 10L * b).map(i => (i, i)).toDF("k", "v"),
        dir, col("k"), numFiles = 1): Unit)
      sys.props("graft.store.checkpointEvery") = "5"
      (5 to 9).foreach(b => DataSkipping.appendWithStats(
        (40L + 10L * (b - 1) until 40L + 10L * b).map(i => (i, i)).toDF("k", "v"),
        dir, col("k"), numFiles = 1): Unit)
      // checkpoints landed under BOTH cadences: v3 (K=3 era), v10
      // (K=5 era); v6 — a would-be checkpoint under the old cadence —
      // is a delta under the new one
      assert(!DataSkipping.isDeltaVersion(fs, dir, 3L))
      assert(DataSkipping.isDeltaVersion(fs, dir, 6L))
      assert(!DataSkipping.isDeltaVersion(fs, dir, 10L))
      (1 to 10).foreach { v =>
        assert(DataSkipping.readPrunedAt(spark, dir,
          Seq(("k", Long.MinValue, Long.MaxValue - 1)), v.toLong).count()
          === 40L + 10L * (v - 1), s"version $v reconstruction")
      }
      val feed = DataSkipping.changesBetween(spark, dir, 1L, 10L)
      assert(feed.filter(col("__change") =!= "insert").count() === 0L)
      assert(feed.count() === 90L, "true delta across the cadence boundary")
      assert(DataSkipping.fsck(spark, dir, checkRows = true).clean)
    } finally {
      sys.props.remove("graft.store.deltaThreshold"): Unit
      sys.props.remove("graft.store.checkpointEvery"): Unit
    }
  }

  test("incremental vacuum: vacuum-commit-vacuum ends exactly where one full-history vacuum ends; the second walk is survivor-bounded") {
    // No persisted anchor is needed for an incremental sweep: vacuum
    // DELETES the version files it drops, so the next vacuum's walk
    // (listVersions + own-names) sees only survivors + new commits —
    // new-backlog-sized by construction. The law: splitting history
    // across two vacuums converges to the same store as one vacuum
    // over the full history — same surviving versions, same content,
    // same time-travel window, both audit-clean.
    sys.props("graft.store.deltaThreshold") = "1"
    sys.props("graft.store.checkpointEvery") = "3"
    try {
      def build(name: String): String = {
        val dir = tmpDir(name)
        DataSkipping.writeWithStats((0L until 20L).map(i => (i, i)).toDF("k", "v"),
          dir, col("k"), numFiles = 1, statsCols = Seq("k"))
        dir
      }
      def appendBatch(dir: String, b: Int): Unit =
        DataSkipping.appendWithStats(
          (20L + 10L * (b - 1) until 20L + 10L * b).map(i => (i, i)).toDF("k", "v"),
          dir, col("k"), numFiles = 1): Unit
      val a = build("graft-vac-incr")
      val b = build("graft-vac-full")
      (1 to 7).foreach(appendBatch(a, _))
      DataSkipping.vacuumVersions(spark, a, retainLast = 2): Unit
      val midVersions = DataSkipping.listVersions(spark, a)
      assert(midVersions.head > 1L, "first vacuum expired the early log")
      (8 to 12).foreach(appendBatch(a, _))
      // the second vacuum's whole walk universe is survivors + the 5
      // new commits — pre-first-vacuum versions are GONE from disk
      assert(DataSkipping.listVersions(spark, a).size ===
        midVersions.size + 5, "second walk is survivor-bounded")
      DataSkipping.vacuumVersions(spark, a, retainLast = 2): Unit
      (1 to 12).foreach(appendBatch(b, _))
      DataSkipping.vacuumVersions(spark, b, retainLast = 2): Unit
      // convergence: same surviving version numbers, same content,
      // same valid time-travel window, both clean
      assert(DataSkipping.listVersions(spark, a) ===
        DataSkipping.listVersions(spark, b))
      def content(dir: String) = DataSkipping.readPruned(spark, dir,
        Seq(("k", Long.MinValue, Long.MaxValue - 1)))
        .as[(Long, Long)].collect().sorted.toSeq
      assert(content(a) === content(b) && content(a).size === 140)
      assert(DataSkipping.validVersions(spark, a) ===
        DataSkipping.validVersions(spark, b))
      assert(DataSkipping.fsck(spark, a, checkRows = true).clean)
      assert(DataSkipping.fsck(spark, b, checkRows = true).clean)
    } finally {
      sys.props.remove("graft.store.deltaThreshold"): Unit
      sys.props.remove("graft.store.checkpointEvery"): Unit
    }
  }

  test("out-of-band pointer overwrite (stale .crc): reads serve the log head, fsck classifies, vacuum retains, recoverLog heals") {
    // The engine Hadoop-writes the latest pointer, so on a checksummed
    // filesystem it carries a `.crc` sidecar. An out-of-band RAW
    // overwrite (nio/shell — found live in round 19: a harness
    // nio-wrote a pointer swapPointer had Hadoop-written) updates the
    // data but not the sidecar, and every later Hadoop read throws
    // ChecksumException. The pointer is a publication CACHE of the
    // CAS-arbitrated version log, so unreadable bytes must degrade,
    // not crash: reads serve the log head, fsck classifies the
    // pointer in unreadableFiles (lag unknowable: -1), vacuum retains
    // the full chain (the pointer's target is unknown — expiring a
    // version could brick pointer reads permanently), and recoverLog
    // re-points at the surviving head with a consistent sidecar.
    sys.props("graft.store.deltaThreshold") = "1"
    sys.props("graft.store.checkpointEvery") = "3"
    try {
      val dir = tmpDir("graft-ptr-stale-crc")
      def app(lo: Long, hi: Long) = DataSkipping.appendWithStats(
        (lo until hi).map(i => (i, i)).toDF("k", "v"), dir, col("k"), 1)
      def liveCount() = DataSkipping.readPruned(spark, dir,
        Seq(("k", Long.MinValue, Long.MaxValue - 1))).count()
      // v1 full(init), v2 delta, v3 CHECKPOINT — head count 175
      DataSkipping.writeWithStats((0L until 100L).map(i => (i, i)).toDF("k", "v"),
        dir, col("k"), numFiles = 2, statsCols = Seq("k"))
      app(100, 150); app(150, 175): Unit
      // precondition: the engine's own pointer swap left a sidecar —
      // without it the corruption shape under test cannot exist
      assert(Files.exists(Paths.get(dir, s".${DataSkipping.ManifestName}.crc")),
        "pointer .crc sidecar expected on the local checksummed fs")
      // out-of-band raw overwrite: VALID redirect bytes to a real
      // version — only the stale sidecar makes them unreadable, so
      // every assertion below isolates the checksum path (a fallback
      // that silently TRUSTED these bytes would serve v2's 150 rows)
      Files.write(Paths.get(dir, DataSkipping.ManifestName),
        """{"redirect":2}""".getBytes("UTF-8")): Unit
      // 1. reads degrade to the log HEAD (the CAS arbiter): 175, not
      //    150 (trusted corrupt bytes) and not a ChecksumException
      assert(liveCount() === 175L)
      // 2. the audit classifies without crashing: the pointer lands
      //    with the exists-but-unreadable defects, lag is unknowable
      val audit = DataSkipping.fsck(spark, dir)
      assert(audit.unreadableFiles.contains(DataSkipping.ManifestName), s"got $audit")
      assert(audit.pointerLag === -1)
      assert(!audit.clean)
      // 3. vacuum survives and retains the FULL chain (normal
      //    retainLast=1 here would expire v1 and v2 — v3 is a
      //    checkpoint, so no delta-chain extension applies)
      DataSkipping.vacuumVersions(spark, dir, retainLast = 1): Unit
      assert(DataSkipping.listVersions(spark, dir) === Seq(1L, 2L, 3L),
        "unreadable pointer must suspend version expiry")
      // 4. recoverLog heals: pointer readable again, serving the head
      val rep = DataSkipping.recoverLog(spark, dir)
      assert(rep.head === 3L)
      assert(DataSkipping.readManifest(spark, dir).files.map(_.rows).sum === 175L)
      assert(DataSkipping.fsck(spark, dir).clean)
      // 5. the healed store resumes normal life: commits land, and
      //    vacuum expiry works again
      app(175, 200): Unit
      assert(liveCount() === 200L)
      DataSkipping.vacuumVersions(spark, dir, retainLast = 1): Unit
      assert(DataSkipping.listVersions(spark, dir).size < 4,
        "vacuum reclaims once the pointer is healed")
    } finally {
      sys.props.remove("graft.store.deltaThreshold"): Unit
      sys.props.remove("graft.store.checkpointEvery"): Unit
    }
  }

  test("torn pointer (readable but unparsable bytes): reads serve the log head, fsck classifies, recoverLog re-points") {
    // The OTHER out-of-band overwrite shape (ADVICE r19): the raw
    // writer also replaced the `.crc` sidecar (or the fs is
    // checksum-free), so the pointer's bytes READ fine but parse as
    // neither a redirect nor a full manifest — a torn/truncated
    // overwrite. readManifest degrades to the log head for liveness
    // (same as the stale-.crc shape), which used to MASK the defect:
    // fsck's manifest read succeeded, its byte probe only caught
    // IOException, lag computed 0 via structural equality with the
    // head — the store audited clean while every read warned and
    // re-derived the head, and recoverLog's full-bytes arm never
    // rewrote the pointer. Now the probe parses the bytes: fsck
    // classifies (unreadableFiles + lag −1, clean=false) and
    // recoverLog re-points at the surviving head.
    sys.props("graft.store.deltaThreshold") = "1"
    sys.props("graft.store.checkpointEvery") = "3"
    try {
      val dir = tmpDir("graft-ptr-torn")
      def app(lo: Long, hi: Long) = DataSkipping.appendWithStats(
        (lo until hi).map(i => (i, i)).toDF("k", "v"), dir, col("k"), 1)
      def liveCount() = DataSkipping.readPruned(spark, dir,
        Seq(("k", Long.MinValue, Long.MaxValue - 1))).count()
      DataSkipping.writeWithStats((0L until 100L).map(i => (i, i)).toDF("k", "v"),
        dir, col("k"), numFiles = 2, statsCols = Seq("k"))
      app(100, 150); app(150, 175): Unit
      // out-of-band TORN overwrite: a prefix of a full manifest —
      // plausible bytes, wrong in exactly the way a truncated write
      // is. Dropping the stale sidecar isolates the PARSE path from
      // the checksum path the sibling law already pins.
      Files.write(Paths.get(dir, DataSkipping.ManifestName),
        """{"cols":["k"],"files":[""".getBytes("UTF-8")): Unit
      Files.deleteIfExists(Paths.get(dir, s".${DataSkipping.ManifestName}.crc")): Unit
      // 1. reads degrade to the log HEAD: 175, not a parse crash
      assert(liveCount() === 175L)
      // 2. the audit detects the masked defect
      val audit = DataSkipping.fsck(spark, dir)
      assert(audit.unreadableFiles.contains(DataSkipping.ManifestName), s"got $audit")
      assert(audit.pointerLag === -1)
      assert(!audit.clean)
      // 3. recoverLog heals the pointer it used to skip (Right(None)
      //    arm): readable, parsable, serving the head
      val rep = DataSkipping.recoverLog(spark, dir)
      assert(rep.head === 3L)
      assert(DataSkipping.readManifest(spark, dir).files.map(_.rows).sum === 175L)
      assert(DataSkipping.fsck(spark, dir).clean)
      // 4. a healthy legacy full-bytes pointer is NOT rewritten by the
      //    probe path: life resumes, commits land
      app(175, 200): Unit
      assert(liveCount() === 200L)
      assert(DataSkipping.fsck(spark, dir).clean)
    } finally {
      sys.props.remove("graft.store.deltaThreshold"): Unit
      sys.props.remove("graft.store.checkpointEvery"): Unit
    }
  }
}
