package graft.functions

import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSuite
import graft.functions.EtlFunctions._

/** Scalacheck-generated property tests: each law samples a batch of cases
  * from a Gen (fixed seed), runs them through the Spark expression in ONE
  * DataFrame pass, and checks the law against an independent JVM-side
  * model implementation.
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private def sample[A](g: Gen[List[A]]): List[A] =
    g.apply(Gen.Parameters.default, Seed(42L)).get

  private val tsGen: Gen[java.sql.Timestamp] = for {
    day <- Gen.choose(0, 700)
    sec <- Gen.choose(0, 86399)
  } yield java.sql.Timestamp.valueOf(
    LocalDateTime.of(2023, 1, 1, 0, 0).plusDays(day).plusSeconds(sec))

  test("property: serviceDate equals the JVM model (cutoff at exactly 05:00:00)") {
    val cases = sample(Gen.listOfN(500, tsGen))
    val got = cases.toDF("t").select(serviceDate(col("t")).cast("string"))
      .as[String].collect()
    cases.zip(got).foreach { case (t, g) =>
      val ldt = t.toLocalDateTime
      val expected =
        if (ldt.toLocalTime.compareTo(java.time.LocalTime.of(5, 0)) <= 0)
          ldt.toLocalDate.minusDays(1)
        else ldt.toLocalDate
      assert(g === expected.toString, s"input $t")
    }
  }

  test("property: midnightRollover keeps scheduled time-of-day and shifts at most one day") {
    val pairGen = for { a <- tsGen; b <- tsGen } yield (a, b)
    val cases = sample(Gen.listOfN(500, pairGen))
    val got = cases.toDF("t", "s")
      .select(midnightRollover(col("t"), col("s")).cast("string"))
      .as[String].collect()
    cases.zip(got).foreach { case ((t, s), g) =>
      val ticket = t.toLocalDateTime
      val sched = s.toLocalDateTime
      val shift = if (sched.toLocalTime.isAfter(ticket.toLocalTime)) 1 else 0
      val expected = LocalDateTime.of(ticket.toLocalDate.minusDays(shift), sched.toLocalTime)
      val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      assert(g === expected.format(fmt), s"inputs $t / $s")
    }
  }

  test("property: cleanPhone output never contains dashes, is <= 14 chars, and drops a matching prefix") {
    val phoneGen = for {
      pre <- Gen.oneOf(Gen.const(null: String), Gen.choose(1, 99).map(n => s"+$n"))
      mid <- Gen.choose(0L, 999999999L)
      dashes <- Gen.choose(0, 3)
      matching <- Gen.oneOf(true, false)
    } yield {
      val body = ("-" * dashes) + mid.toString
      val tel = if (matching && pre != null) pre + body else body
      (pre, tel)
    }
    val cases = sample(Gen.listOfN(500, phoneGen))
    val got = cases.toDF("p", "t").select(cleanPhone(col("p"), col("t"))).as[String].collect()
    cases.zip(got).foreach { case ((pre, tel), g) =>
      assert(!g.contains("-"), s"dash in $g")
      assert(g.length <= 14)
      val afterStrip = if (pre != null && tel.startsWith(pre)) tel.drop(pre.length) else tel
      assert(g === afterStrip.replace("-", "").take(14), s"inputs $pre / $tel")
    }
  }

  test("property: vatGrossUp equals exact rational arithmetic on cents-scale values") {
    val moneyGen = Gen.choose(0L, 10000000L).map(_ / 100.0)
    val cases = sample(Gen.listOfN(300, moneyGen))
    val got = cases.toDF("x").select(vatGrossUp(col("x"))).as[Double].collect()
    cases.zip(got).foreach { case (x, g) =>
      val e4 = math.floor(x * 10000 + 0.5).toLong
      assert(g === e4 * 115 / 1000000.0, s"input $x")
    }
  }

  test("property: Scd2.build tiles each key's timeline — gap-free, overlap-free, one current row") {
    val changeGen = for {
      key <- Gen.choose(0L, 9L)
      ts <- tsGen
      v <- Gen.alphaStr.map(_.take(4))
    } yield (key, ts, v)
    val cases = sample(Gen.listOfN(400, changeGen)).zipWithIndex
      .map { case ((k, t, v), i) => (k, t, v, i.toLong) }
    val rows = graft.operators.Scd2
      .build(cases.toDF("key", "ts", "attr", "seq"), "key", "ts", Seq("attr"), "seq")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getLong(4), r.getBoolean(5)))
    rows.groupBy(_._1).foreach { case (key, krows0) =>
      val krows = krows0.sortBy(_._5)
      // versions are 1..n
      assert(krows.map(_._5).toSeq === (1L to krows.length.toLong), s"key $key")
      // tiling: valid_to(i) == valid_from(i+1); exactly the last is open/current
      krows.init.zip(krows.tail).foreach { case (a, b) =>
        assert(a._4.contains(b._3), s"key $key gap/overlap at version ${a._5}")
        assert(!a._6)
      }
      assert(krows.last._4.isEmpty && krows.last._6, s"key $key current row")
      // last-writer-wins: each surviving row carries the max-seq attr of its (key, ts)
      val model = cases.filter(_._1 == key).groupBy(_._2).map { case (ts, g) =>
        ts -> g.maxBy(_._4)._3
      }
      krows.foreach { r =>
        assert(model(r._3) === r._2, s"key $key ts ${r._3}")
      }
      assert(krows.length === model.size, s"key $key row count")
    }
  }

  test("property: epochUpsample emits exactly quota rows per group with contiguous epochs") {
    val rowGen = for { key <- Gen.oneOf("a", "b", "c"); id <- Gen.choose(0L, 4999L) } yield (key, id)
    val cases = sample(Gen.listOfN(300, rowGen)).distinct
    val quota = 40L
    val out = graft.llm.Sampling
      .epochUpsample(cases.toDF("src", "id"), "id", "src", quota)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    out.groupBy(_._1).foreach { case (src, g) =>
      assert(g.length.toLong === quota, s"group $src must land on the quota")
      g.groupBy(_._2).values.foreach { copies =>
        assert(copies.map(_._4).sorted.toSeq === (0L until copies.length.toLong),
          s"group $src epochs must be contiguous from 0")
        assert(copies.forall(_._3 === copies.length.toLong), "n_copies stamp")
      }
      val n = cases.count(_._1 == src).toLong
      val spread = g.groupBy(_._2).values.map(_.length).toSet
      // copy counts differ by at most one between rows of a group (or the
      // group downsampled and every picked row appears once)
      assert(spread.size <= 2 && (spread.max - spread.min) <= 1, s"group $src spread $spread")
      if (n >= quota) assert(spread === Set(1))
    }
  }

  test("property: BloomAgg never false-negatives and is partitioning-invariant") {
    val keyGen = Gen.listOfN(400, Gen.choose(Long.MinValue, Long.MaxValue))
    val keys = sample(Gen.listOfN(1, keyGen)).head
    // build across many partitions (forces map-side partials + merges)
    def build(parts: Int): org.apache.spark.util.sketch.BloomFilter = {
      val bytes = keys.toDF("k").repartition(parts)
        .agg(BloomAgg(col("k"), 500L, 0.01))
        .head().getAs[Array[Byte]](0)
      org.apache.spark.util.sketch.BloomFilter.readFrom(bytes)
    }
    val b8 = build(8)
    keys.foreach(k => assert(b8.mightContainLong(k), s"false negative on $k"))
    // bit-set OR is order/partitioning-invariant: same bits either way
    val b1 = build(1)
    assert(b1.bitSize() === b8.bitSize())
    keys.foreach(k => assert(b1.mightContainLong(k)))
    // string path: UTF-8 fold must match the driver-side string probe
    val strs = sample(Gen.listOfN(1,
      Gen.listOfN(200, Gen.alphaNumStr.suchThat(_.nonEmpty)))).head
    val sb = strs.toDF("s").repartition(5)
      .agg(BloomAgg(col("s"), 300L, 0.01)).head().getAs[Array[Byte]](0)
    val sBloom = org.apache.spark.util.sketch.BloomFilter.readFrom(sb)
    strs.foreach(s => assert(sBloom.mightContainString(s), s"false negative on '$s'"))
    // NULLs are skipped, not inserted
    val nb = Seq[Option[Long]](Some(1L), None, Some(2L)).toDF("k")
      .agg(BloomAgg(col("k"), 10L, 0.01)).head().getAs[Array[Byte]](0)
    val nBloom = org.apache.spark.util.sketch.BloomFilter.readFrom(nb)
    assert(nBloom.mightContainLong(1L) && nBloom.mightContainLong(2L))
  }

  test("property: TIMESTAMP_NTZ inputs are result-identical to TimestampType across the time operators") {
    // the L96 law on random data: under the pinned UTC session the NTZ
    // cast is value-preserving, so as-of (both physical forms) and the
    // grid interval join must produce byte-identical derived results
    val rowGen = for { key <- Gen.choose(0L, 5L); ts <- tsGen } yield (key, ts)
    val leftRows = sample(Gen.listOfN(300, rowGen)).zipWithIndex
      .map { case ((k, t), i) => (i.toLong, k, t) }
    val rightRows = sample(Gen.listOfN(150, rowGen)).zipWithIndex
      .map { case ((k, t), i) => (1000L + i, k, t) }
      // as-of contract: right unique per (key, ts) — keep max id
      .groupBy(r => (r._2, r._3)).values.map(_.maxBy(_._1)).toSeq
    val left = leftRows.toDF("event_id", "key", "ts")
    val right = rightRows.toDF("val_id", "key", "ts")
      .select(col("key"), col("ts"), col("val_id"))
    def ntz(df: org.apache.spark.sql.DataFrame, cols: String*) =
      cols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast("timestamp_ntz")))

    def asOfKeyed(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame)(
        l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
      f(l, r).select(col("event_id"), col("val_id"))
        .collect().map(x => x.getLong(0) -> Option(x.get(1))).toMap
    val merged = asOfKeyed(graft.operators.AsOfJoin(_, _, "key", "ts", Seq("val_id"))) _
    val bcast = asOfKeyed(graft.operators.AsOfJoin.broadcastAsOf(_, _, "key", "ts", Seq("val_id"))) _
    assert(merged(ntz(left, "ts"), ntz(right, "ts")) === merged(left, right))
    assert(bcast(ntz(left, "ts"), ntz(right, "ts")) === bcast(left, right))

    val ivs = rightRows.map { case (id, k, t) =>
      (id, k, t, java.sql.Timestamp.from(t.toInstant.plusSeconds(7200)))
    }.toDF("interval_id", "key", "start_ts", "end_ts")
    def grid(l: org.apache.spark.sql.DataFrame, iv: org.apache.spark.sql.DataFrame) =
      graft.operators.IntervalJoin.byGrid(l, iv, "key", "ts", "start_ts", "end_ts",
          cellMicros = 1800L * 1000000, rightCols = Seq("interval_id"))
        .select(col("event_id"), col("interval_id"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val gridTs = grid(left, ivs)
    assert(grid(ntz(left, "ts"), ntz(ivs, "start_ts", "end_ts")) === gridTs)
    assert(gridTs.nonEmpty, "fixture must produce interval matches")
  }
}
