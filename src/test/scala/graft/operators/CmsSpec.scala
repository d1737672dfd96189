package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Count-min sketch laws: one-sidedness, exactness without collisions,
  * and merge = sketch-of-union (counter-wise).
  */
class CmsSpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private val keys = Seq.fill(3000)(s"k${rnd.nextInt(40)}").toDF("k")

  test("CMS estimates are one-sided: est >= exact for every key") {
    val sk = Sketches.countMin(keys, "k", depth = 4, width = 64)
    val exact = keys.groupBy("k").agg(count(lit(1)).as("exact"))
    val est = Sketches.countMinEstimate(sk, exact.select("k"), "k", 4, 64)
    val joined = exact.join(est, Seq("k")).collect()
    assert(joined.length === 40)
    joined.foreach(r =>
      assert(r.getAs[Long]("cm_est") >= r.getAs[Long]("exact"),
        s"key ${r.getString(0)}: est < exact"))
  }

  test("with width >> keys the estimate is exact (no collisions bite the min)") {
    val sk = Sketches.countMin(keys, "k", depth = 4, width = 65536)
    val exact = keys.groupBy("k").agg(count(lit(1)).as("exact"))
    val est = Sketches.countMinEstimate(sk, exact.select("k"), "k", 4, 65536)
    assert(exact.join(est, Seq("k"))
      .filter(col("cm_est") =!= col("exact")).count() === 0L)
  }

  test("merge of per-half sketches is BIT-EQUAL to the sketch of the union") {
    val withId = keys.withColumn("id", monotonically_increasing_id())
    val halves = Seq(0, 1).map(h =>
      Sketches.countMin(withId.filter(col("id") % 2 === h), "k", 4, 64))
    val merged = Sketches.countMinMerge(halves)
      .orderBy("r", "c").collect()
    val direct = Sketches.countMin(keys, "k", 4, 64)
      .orderBy("r", "c").collect()
    assert(merged === direct)
  }

  test("a key the sketch never saw estimates 0 when its counters are empty") {
    val sparseKeys = Seq("a", "b").toDF("k")
    val sk = Sketches.countMin(sparseKeys, "k", depth = 4, width = 65536)
    val est = Sketches.countMinEstimate(sk, Seq("zzz-absent").toDF("k"),
      "k", 4, 65536)
    assert(est.head().getLong(1) === 0L)
  }

  test("invalid dims raise at composition") {
    intercept[IllegalArgumentException](Sketches.countMin(keys, "k", 0, 8))
    intercept[IllegalArgumentException](Sketches.countMinMerge(Nil))
  }

  test("join-size estimate is one-sided over the true inner product, exact without collisions") {
    val other = Seq.fill(2000)(s"k${rnd.nextInt(60)}").toDF("k")
    def trueJoinSize(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Long =
      a.groupBy("k").agg(count(lit(1)).as("fa"))
        .join(b.groupBy("k").agg(count(lit(1)).as("fb")), Seq("k"))
        .agg(sum(col("fa") * col("fb"))).head().getLong(0)
    val exact = trueJoinSize(keys, other)
    // narrow sketch: collisions add cross terms, never subtract
    val estNarrow = Sketches.countMinJoinSize(
      Sketches.countMin(keys, "k", 4, 32),
      Sketches.countMin(other, "k", 4, 32), depth = 4).head().getLong(0)
    assert(estNarrow >= exact, s"inner product must overestimate: $estNarrow < $exact")
    // wide sketch: no collisions among ~100 keys -> exact
    val estWide = Sketches.countMinJoinSize(
      Sketches.countMin(keys, "k", 4, 65536),
      Sketches.countMin(other, "k", 4, 65536), depth = 4).head().getLong(0)
    assert(estWide === exact)
  }

  test("self-estimate with the SAME sketch instance bounds the F2 self-join size") {
    // the documented skew pre-flight: both arguments are one sketch
    // object — the internal renames must survive Spark's self-join
    // resolution, and the estimate bounds sum(f^2) one-sidedly
    val sk = Sketches.countMin(keys, "k", 4, 65536)
    val est = Sketches.countMinJoinSize(sk, sk, depth = 4).head().getLong(0)
    val f2 = keys.groupBy("k").agg(count(lit(1)).as("f"))
      .agg(sum(col("f") * col("f"))).head().getLong(0)
    assert(est === f2, "wide sketch: the self-estimate is exactly sum(f^2)")
  }

  test("heavy-key bound is one-sided over the true max frequency; salts derive from it") {
    val sk = Sketches.countMin(keys, "k", depth = 4, width = 64)
    val exactMax = keys.groupBy("k").agg(count(lit(1)).as("c"))
      .agg(max(col("c"))).collect()(0).getLong(0)
    val bound = Skew.heavyKeyBound(sk)
    assert(bound >= exactMax, s"bound $bound < true max $exactMax")
    // with width >> keys the bound is EXACT (no collisions bite the min)
    val wide = Sketches.countMin(keys, "k", depth = 4, width = 65536)
    assert(Skew.heavyKeyBound(wide) === exactMax)
    // salt factor: ceil(bound / target), clamped both ways
    assert(Skew.saltsForBound(bound, targetRowsPerReducer = bound) === 1)
    assert(Skew.saltsForBound(bound, targetRowsPerReducer = 10L) ===
      math.min(256L, (bound + 9) / 10).toInt)
    assert(Skew.saltsForBound(1000000L, 10L, maxSalts = 32) === 32)
    assert(Skew.saltsForBound(0L, 10L) === 1)
    // the chosen factor never changes the aggregate (decomposability)
    val salts = Skew.saltsForBound(bound, targetRowsPerReducer = 25L)
    assert(salts > 1)
    val salted = Skew.saltedAggregate(keys, Seq("k"),
        Seq(Skew.SaltedCount("n")), numSalts = salts)
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1)))
    val plain = keys.groupBy("k").agg(count(lit(1)).as("n"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(salted.toSeq === plain.toSeq)
  }

  test("join-size estimate of disjoint relations is 0, not null") {
    val a = Seq("a1", "a2").toDF("k")
    val b = Seq("b1", "b2").toDF("k")
    val est = Sketches.countMinJoinSize(
      Sketches.countMin(a, "k", 4, 65536),
      Sketches.countMin(b, "k", 4, 65536), depth = 4).head()
    assert(!est.isNullAt(0) && est.getLong(0) === 0L)
  }

  test("joinPreflight composes exactly from its parts (VERDICT r19 item 5)") {
    // the one-call report must equal what the separate calls return —
    // same (depth, width) sketches are deterministic (hash-placed, no
    // rand), so every field replays from the parts
    val otherRnd = new scala.util.Random(11)
    val other = Seq.fill(2000)(s"k${otherRnd.nextInt(60)}").toDF("k")
    val (depth, width, target, maxSalts) = (4, 64, 10L, 32)
    val row = Skew.joinPreflight(keys, other, "k", depth, width,
      targetRowsPerReducer = target, maxSalts = maxSalts).head()
    val skL = Sketches.countMin(keys, "k", depth, width)
    val skR = Sketches.countMin(other, "k", depth, width)
    def sz(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame): Long =
      Sketches.countMinJoinSize(a, b, depth).head().getLong(0)
    assert(row.getAs[Long]("join_size_est") === sz(skL, skR))
    assert(row.getAs[Long]("left_f2_est") === sz(skL, skL))
    assert(row.getAs[Long]("right_f2_est") === sz(skR, skR))
    val (bL, bR) = (Skew.heavyKeyBound(skL), Skew.heavyKeyBound(skR))
    assert(row.getAs[Long]("left_heavy_bound") === bL)
    assert(row.getAs[Long]("right_heavy_bound") === bR)
    assert(row.getAs[Int]("salts_left") === Skew.saltsForBound(bL, target, maxSalts))
    assert(row.getAs[Int]("salts_right") === Skew.saltsForBound(bR, target, maxSalts))
    // clamp edge: a tiny target forces maxSalts on both sides
    val clamped = Skew.joinPreflight(keys, other, "k", depth, width,
      targetRowsPerReducer = 1L, maxSalts = 8).head()
    assert(clamped.getAs[Int]("salts_left") === 8)
    assert(clamped.getAs[Int]("salts_right") === 8)
  }

  test("joinPreflight on an empty side degrades to bound 0 / salts 1, never NULL (r20 ADVICE)") {
    val empty = Seq.empty[String].toDF("k")
    val row = Skew.joinPreflight(keys, empty, "k", 4, 64).head()
    assert(row.getAs[Long]("join_size_est") === 0L)
    assert(row.getAs[Long]("right_heavy_bound") === 0L)
    assert(row.getAs[Int]("salts_right") === 1)
    assert(row.getAs[Long]("left_heavy_bound") > 0L)
  }
}
