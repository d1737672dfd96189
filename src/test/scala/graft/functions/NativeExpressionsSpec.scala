package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSuite

class NativeExpressionsSpec extends SparkSuite {
  import spark.implicits._

  test("native md5_prefix32 equals the portable built-in chain on generated strings") {
    val gen = Gen.listOfN(400, Gen.oneOf(
      Gen.alphaNumStr,
      Gen.asciiPrintableStr,
      Gen.listOfN(8, Gen.oneOf("shingle", "word", "é", "汉", " ", "-")).map(_.mkString)))
    val cases = gen.apply(Gen.Parameters.default, Seed(7L)).get.map(Option(_).getOrElse(""))
    val df = cases.toDF("s")
    val rows = df.select(
      Md5Prefix32(col("s")).as("native"),
      conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long").as("portable"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("all native functions register for SQL via GraftExtensions.install") {
    GraftExtensions.install(spark)
    val got = spark.sql("SELECT md5_prefix32('abc') AS h").as[Long].head()
    val want = spark.sql("SELECT CAST(conv(substring(md5('abc'), 1, 8), 16, 10) AS BIGINT) AS h")
      .as[Long].head()
    assert(got === want)
    assert(spark.sql("SELECT array_dot_product(array(1L, 2L), array(3L, 4L)) AS d")
      .as[Long].head() === 11L)
    assert(spark.sql("SELECT size(minhash_sig(array(5L, 6L), 12)) AS n")
      .as[Int].head() === 12)
    assert(spark.sql(
      "SELECT sorted_count_le(array(1L, 3L, 5L), 4L) AS c").as[Int].head() === 2)
    // bloom_agg is a real SQL aggregate; its output probes via
    // bloom_contains_long with the serialized filter as a binary literal
    val bytes = spark.sql(
      "SELECT bloom_agg(x, 100, 0.01) AS b FROM VALUES (1L), (2L), (3L) AS t(x)")
      .head().getAs[Array[Byte]]("b")
    val bloom = org.apache.spark.util.sketch.BloomFilter.readFrom(bytes)
    assert(bloom.mightContainLong(2L) && !bloom.mightContainLong(999999L))
    val hits = spark.range(5).toDF("id")
      .filter(BloomContainsLong(org.apache.spark.sql.functions.col("id"), bloom))
      .as[Long].collect().toSet
    // no false negatives (1-3 must hit); 0/4 may false-positive by contract
    assert(Set(1L, 2L, 3L).subsetOf(hits))
  }

  test("native ngram_poly_hash_set equals the reference fold on generated ASCII strings") {
    def polyHash(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((a, b) =>
        (a * NgramPolyHashSet.B + (b & 0xff)) % NgramPolyHashSet.P)
    def expected(s: String, n: Int): Seq[Long] =
      if (s.length < n) Seq(polyHash(s))
      else s.sliding(n).map(polyHash).toSeq.distinct
    val gen = Gen.listOfN(300, Gen.oneOf(
      Gen.alphaNumStr, Gen.asciiPrintableStr,
      Gen.const(""), Gen.const("ab"), Gen.const("aaaaaaaaaa")))
    val cases = gen.apply(Gen.Parameters.default, Seed(13L)).get.map(Option(_).getOrElse(""))
    val rows = cases.toDF("s")
      .select(col("s"), NgramPolyHashSet(col("s"), 5).as("native")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) === expected(r.getString(0), 5), s"for '${r.getString(0)}'")
    }
    GraftExtensions.install(spark)
    assert(spark.sql("SELECT size(ngram_poly_hash_set('hello world', 3)) AS n")
      .as[Int].head() === 9) // 9 distinct trigrams of an 11-char string
  }

  test("native minhash_sig equals the composed transform+array_min spec, incl. empty and null elements") {
    import graft.llm.Dedup
    val gen = Gen.listOfN(200, Gen.listOf(Gen.oneOf(
      Gen.choose(0L, 4294967295L).map(Long.box), Gen.const(null: java.lang.Long))))
    val cases = gen.apply(Gen.Parameters.default, Seed(11L)).get
    val df = cases.map(l => Tuple1(l)).toDF("hs")
    val rows = df.select(
      Dedup.minhash(col("hs"), 12).as("native"),
      Dedup.minhashComposed(col("hs"), 12).as("composed")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Any](0) === r.getSeq[Any](1))
    }
  }

  test("native array_dot_product equals the composed zip_with+aggregate spec") {
    import graft.llm.Similarity
    val gen = Gen.listOfN(200, Gen.choose(1, 64).flatMap(n =>
      Gen.zip(Gen.listOfN(n, Gen.choose(-1000L, 1000L)), Gen.listOfN(n, Gen.choose(-1000L, 1000L)))))
    val cases = gen.apply(Gen.Parameters.default, Seed(13L)).get
    val df = cases.toDF("a", "b")
    val rows = df.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotComposed(col("a"), col("b")).as("composed")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("native array_l2_sq equals the composed zip_with+aggregate spec, and raises on length mismatch") {
    import graft.llm.Similarity
    GraftExtensions.install(spark) // self-contained under test filtering
    val gen = Gen.listOfN(200, Gen.choose(1, 64).flatMap(n =>
      Gen.zip(Gen.listOfN(n, Gen.choose(-1000L, 1000L)), Gen.listOfN(n, Gen.choose(-1000L, 1000L)))))
    val cases = gen.apply(Gen.Parameters.default, Seed(29L)).get
    val df = cases.toDF("a", "b")
    val rows = df.select(
      Similarity.l2Sq(col("a"), col("b")).as("native"),
      Similarity.l2SqComposed(col("a"), col("b")).as("composed")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // SQL surface registered alongside the other natives
    assert(spark.sql("SELECT array_l2_sq(array(1L, 2L), array(3L, 5L)) AS d")
      .head().getLong(0) === 13L)
    // zip_with would silently null-pad a length mismatch; the native
    // raises (embeddings of unequal length are a data error)
    val ex = intercept[Exception] {
      Seq((Seq(1L, 2L), Seq(1L))).toDF("a", "b")
        .select(Similarity.l2Sq(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage != null)
    // null ELEMENTS are where the two deliberately diverge (ADVICE
    // r19): the native contributes 0 for a null element, the
    // composed form's SQL arithmetic poisons the sum to null — so the
    // equivalence above is scoped to non-null inputs (the embedding
    // contract) and the divergence itself is the pinned behavior here
    val nullRow = Seq((Seq(Some(1L), None, Some(3L)), Seq(Some(2L), Some(7L), Some(5L))))
      .toDF("a", "b")
      .select(Similarity.l2Sq(col("a"), col("b")).as("native"),
        Similarity.l2SqComposed(col("a"), col("b")).as("composed"))
      .head()
    assert(nullRow.getLong(0) === 5L, "native: null element contributes 0")
    assert(nullRow.isNullAt(1), "composed: null element poisons the sum")
  }

  test("native window_roll_hash equals the per-window refold, incl. short and empty inputs") {
    import WindowRollHash.{B, P}
    def refold(hs: Seq[Long]): Long = hs.foldLeft(0L)((a, h) => (a * B + h) % P)
    def model(hs: Seq[Long], w: Int): Seq[Long] =
      if (hs.length < w) Seq(refold(hs))
      else hs.sliding(w).map(refold).toSeq
    val gen = Gen.listOfN(200, Gen.listOf(Gen.choose(0L, P - 1)))
    val cases = gen.apply(Gen.Parameters.default, Seed(17L)).get ++
      Seq(Nil, Seq(5L), (0L until 7L).toSeq) // empty, single, exactly-w-1 edge
    val rows = cases.map(Tuple1(_)).toDF("hs")
      .select(col("hs"), WindowRollHash(col("hs"), 8).as("native")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) === model(r.getSeq[Long](0), 8),
        s"for ${r.getSeq[Long](0)}")
    }
    GraftExtensions.install(spark)
    assert(spark.sql("SELECT size(window_roll_hash(array(1L, 2L, 3L), 2)) AS n")
      .as[Int].head() === 2)
  }

  test("md5_prefix32 is null-safe and rejects non-string input") {
    val r = Seq[Option[String]](Some("x"), None).toDF("s")
      .select(Md5Prefix32(col("s"))).collect()
    assert(!r(0).isNullAt(0) && r(1).isNullAt(0))
    assertThrows[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("n").select(Md5Prefix32(col("n"))).collect()
    }
  }

  test("zorder64 equals the per-bit reference, masks to 31 bits, and is null-safe") {
    def ref(a: Long, b: Long): Long =
      (0 until 31).foldLeft(0L) { (z, i) =>
        z | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    val gen = Gen.listOfN(300, Gen.zip(Gen.chooseNum(Long.MinValue, Long.MaxValue),
      Gen.chooseNum(Long.MinValue, Long.MaxValue)))
    val cases = gen.apply(Gen.Parameters.default, Seed(21L)).get
    cases.foreach { case (a, b) =>
      assert(ZOrder64.compute(a, b) === ref(a & 0x7fffffffL, b & 0x7fffffffL))
    }
    val rows = Seq((Option(3L), Option(5L)), (None, Option(1L))).toDF("a", "b")
      .select(ZOrder64(col("a"), col("b"))).collect()
    assert(rows(0).getLong(0) === ref(3, 5) && rows(1).isNullAt(0))
    GraftExtensions.install(spark)
    assert(spark.sql("SELECT zorder64(1L, 1L) AS z").as[Long].head() === 3L)
  }

  test("z-order layout bounds BOTH dimensions per chunk where a lexicographic sort bounds one") {
    val pts = for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong)
    val rows = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder64(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // sorted by z, every 256-row chunk is one 16x16 quadrant: both
    // dimensions bounded — this is exactly why per-file min/max stats
    // stay tight on both columns after a z-ordered write
    rows.sortBy(_._3).grouped(256).foreach { chunk =>
      assert(chunk.map(_._1).max - chunk.map(_._1).min <= 15)
      assert(chunk.map(_._2).max - chunk.map(_._2).min <= 15)
    }
    // the lexicographic layout leaves the second dimension unbounded
    val lex = rows.sortBy(t => (t._1, t._2)).take(256)
    assert(lex.map(_._2).max - lex.map(_._2).min === 63)
  }

  test("bloom_contains_long: zero false negatives, bounded false positives, null-safe") {
    import org.apache.spark.util.sketch.BloomFilter
    val bloom = BloomFilter.create(1000, 0.01)
    (0L until 2000L by 2).foreach(bloom.putLong) // the even numbers < 2000
    val got = spark.range(4000)
      .filter(BloomContainsLong(col("id"), bloom))
      .as[Long].collect().toSet
    (0L until 2000L by 2).foreach(v => assert(got(v), s"false negative on $v"))
    val fp = got.count(v => v % 2 != 0 || v >= 2000)
    assert(fp <= 200, s"false-positive count $fp far above the 1% design rate")
    val nulls = Seq[Option[Long]](Some(4L), None).toDF("v")
      .select(BloomContainsLong(col("v"), bloom)).collect()
    assert(nulls(0).getBoolean(0) && nulls(1).isNullAt(0))
    assertThrows[org.apache.spark.sql.AnalysisException] {
      Seq("x").toDF("s").select(BloomContainsLong(col("s"), bloom)).collect()
    }
  }
}
