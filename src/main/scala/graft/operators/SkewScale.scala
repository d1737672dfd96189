package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Microbench for the skew-mitigation loop on a GENUINELY hot-keyed
  * input (VERDICT r17 item 3): the salting laws are pinned on synthetic
  * fixtures and q195 pins correctness at gate scale, but the bench
  * corpus is near-uniform, so "salting helps at skew" had never been
  * MEASURED. GenScale's zipf knob writes the fixture (`skew.parquet`,
  * zipf s=1.2: hottest key ≈ 13% of all rows); this bench A/Bs, on the
  * same data and session:
  *
  *  - plain vs salted GROUP-BY (sum/count/min/max): Spark's hash
  *    aggregate already map-side-combines partials, so per-key merge
  *    state is tiny here — parity is the EXPECTED honest result, and
  *    the measurement documents that the agg-side salt matters only
  *    for large per-key merge state, not decomposable scalars;
  *  - plain vs salted SHUFFLE JOIN (broadcast disabled — the stand-in
  *    for a build side too big to broadcast): every probe row of the
  *    hot key lands on ONE reducer in the plain plan, which is where
  *    salting (and AQE's runtime skew split — left ON, it is the
  *    production default) earns its keep.
  *
  * Results are cross-checked for equality (salt placement cannot change
  * a decomposable aggregate) before any timing is reported.
  *
  * Usage: `runMain graft.operators.SkewScale <sfDir>` where sfDir holds
  * a GenScale-written `skew.parquet`. One JSON line; numbers → SCALE.md.
  */
object SkewScale {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SkewScale <sfDir>")
    val sfDir = args(0)
    val spark = GraftSession.getOrCreate("graft-skew-scale")
    // the measurement targets the NON-broadcast join shape; the build
    // side here is deliberately small (fits memory at any sf) so the
    // A/B isolates the probe-side hot-key funnel
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val skew = spark.read.parquet(s"$sfDir/skew.parquet")
    val n = skew.count()
    val hot = skew.groupBy(col("k")).agg(count(lit(1)).as("c"))
      .agg(max(col("c"))).collect()(0).getLong(0)

    def time(op: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val a = op
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def minOf3(op: => Long): (Long, Double) = {
      val warm = time(op)
      (warm._1, ((1 to 2).map(_ => time(op)._2) :+ warm._2).min)
    }

    // the loop prices the mitigation exactly as q195 does
    val sketch = Sketches.countMin(skew, "k", depth = 4, width = 1024)
    val bound = Skew.heavyKeyBound(sketch)
    val salts = Skew.saltsForBound(bound, targetRowsPerReducer = 100000L)

    // -------- group-by A/B (decomposable aggregates)
    def plainAgg = skew.groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
    def saltedAgg = Skew.saltedAggregate(skew, Seq("k"),
      Seq(Skew.SaltedCount("n_rows"), Skew.SaltedSum("v", "sum_v"),
        Skew.SaltedMin("v", "min_v"), Skew.SaltedMax("v", "max_v")),
      numSalts = salts)
    val aggEqual = plainAgg.except(saltedAgg).isEmpty &&
      plainAgg.count() == saltedAgg.count()
    val (aggGroups, plainAggS) = minOf3(plainAgg.count())
    val (_, saltedAggS) = minOf3(saltedAgg.count())

    // -------- shuffle-join A/B (hot probe key vs one reducer)
    val build = spark.range(1L, 100001L)
      .select(col("id").as("k"), (col("id") % 97L).as("attr"))
    def joined(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(col("v") * col("attr"))).collect()(0).getLong(0)
    def plainJoin = joined(skew.join(build, Seq("k")))
    def saltedJoin = joined(Skew.saltedJoin(skew, build, "k", numSalts = salts))
    val joinEqual = plainJoin == saltedJoin
    val (_, plainJoinS) = minOf3 { plainJoin; 0L }
    val (_, saltedJoinS) = minOf3 { saltedJoin; 0L }

    // counterfactual leg: AQE OFF isolates the static mitigation's raw
    // effect — the regime where no runtime skew split exists (AQE
    // disabled, or a shape its thresholds don't trip). Same data, same
    // session, plans rebuilt per run so the toggle takes effect.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (plainJoinNoAqeS, saltedJoinNoAqeS) =
      try {
        val (_, p) = minOf3 { plainJoin; 0L }
        val (_, s) = minOf3 { saltedJoin; 0L }
        (p, s)
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")

    println(
      s"""{"sf_dir":"$sfDir","n_rows":$n,"hot_key_rows":$hot,""" +
        s""""bound":$bound,"salts":$salts,"groups":$aggGroups,""" +
        s""""agg_equal":$aggEqual,"join_equal":$joinEqual,""" +
        s""""plain_agg_s":${"%.3f".format(plainAggS)},""" +
        s""""salted_agg_s":${"%.3f".format(saltedAggS)},""" +
        s""""plain_join_s":${"%.3f".format(plainJoinS)},""" +
        s""""salted_join_s":${"%.3f".format(saltedJoinS)},""" +
        s""""plain_join_noaqe_s":${"%.3f".format(plainJoinNoAqeS)},""" +
        s""""salted_join_noaqe_s":${"%.3f".format(saltedJoinNoAqeS)}}""")
    spark.stop()
  }
}
