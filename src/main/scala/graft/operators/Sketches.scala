package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate operators for 100 TB-scale profiling, where
  * exact answers would shuffle the world:
  *
  *  - HLL++ distinct counts (`approx_count_distinct`): fixed-size sketch
  *    per group, map-side mergeable — the cardinality profile of a column
  *    costs one scan and a constant-size reduce regardless of input size;
  *  - t-digest-style quantiles (`percentile_approx` / `approx_percentile`):
  *    mergeable quantile sketch with bounded error `1/accuracy`;
  *  - heavy hitters: group-count + rank — exact but pruned early by a
  *    minimum-support threshold so the shuffle carries only candidates.
  *
  * These have no oracle entries (DuckDB's sketch implementations differ,
  * so cross-engine hashes can't match); the suite verifies them against
  * exact answers within the documented error bounds.
  */
object Sketches {

  /** Per-group HLL++ distinct count with relative standard deviation
    * `rsd` (default 5%, sketch ≈ 1.5 KB/group).
    */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as(s"approx_distinct_$valueCol"))

  /** Approximate quantiles with rank error ≤ 1/accuracy. */
  def approxQuantiles(df: DataFrame, valueCol: String, probabilities: Seq[Double],
      accuracy: Int = 10000): Column =
    percentile_approx(col(valueCol),
      array(probabilities.map(lit): _*), lit(accuracy))

  /** Count-min sketch of `keyCol` frequencies as a RELATION of
    * `(r, c, cnt)` counters — `depth` hash rows × `width` columns, so
    * the sketch is `depth·width` rows regardless of input size (the
    * fixed-size summary a 100 TB stream reduces to). Each input row
    * increments one counter per hash row (`xxhash64(key, r) mod width`
    * — seeded per row, so the depth hashes are independent); building
    * the sketch is ONE map-side-combined aggregation whose shuffle
    * carries at most `depth·width` partial counters per map task, never
    * the keys themselves.
    *
    * The relation form is the mergeable/persistable one: sketches of
    * two corpus halves union + re-sum into the sketch of the union
    * ([[countMinMerge]] — counter-wise addition is exactly CM merge),
    * and a parquet round-trip is trivial. Absent counters mean zero
    * (the estimate side coalesces), so the relation stays sparse when
    * `width` far exceeds the live key count.
    *
    * Estimates ([[countMinEstimate]]) are ONE-SIDED: est ≥ true count
    * always (only collisions inflate); `P[est − true > e·N/width] <
    * exp(−depth)` per key — the q91/q106/q110 calibration-gate family
    * measures exactly this (q124).
    */
  def countMin(df: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, "depth and width must be >= 1")
    df.select(explode(array((0 until depth).map(r => struct(
        lit(r).as("r"),
        pmod(xxhash64(col(keyCol), lit(r)), lit(width.toLong)).as("c"))): _*)).as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge count-min sketches of the SAME (depth, width): counter-wise
    * sum. Associative and commutative — per-source sketches roll up in
    * any order (the q116 HLL-merge pattern for frequencies).
    */
  def countMinMerge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "need at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy(col("r"), col("c")).agg(sum(col("cnt")).as("cnt"))
  }

  /** Point-estimate the frequency of every key in `keys` (one column
    * `keyCol`, distinct) against a sketch built with the same
    * (depth, width): min over the depth counters the key hashes to.
    * The sketch side is `depth·width`-bounded — Spark broadcasts it —
    * so the probe is a map-side join however many keys are probed;
    * counters the sketch never materialized coalesce to 0 (a key the
    * sketch never saw estimates 0 unless every probed counter collided).
    */
  def countMinEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, "depth and width must be >= 1")
    keys.select(col(keyCol), explode(array((0 until depth).map(r => struct(
        lit(r).as("r"),
        pmod(xxhash64(col(keyCol), lit(r)), lit(width.toLong)).as("c"))): _*)).as("rc"))
      .join(broadcast(sketch),
        col("rc.r") === sketch("r") && col("rc.c") === sketch("c"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))
  }

  /** Upper-bound estimate of an equi-join's cardinality from the two
    * sides' count-min sketches ALONE (same depth, width): per hash row
    * `r`, `Σ_c cntA(r,c)·cntB(r,c) ≥ Σ_k fA(k)·fB(k)` — the true join
    * size; hash collisions only ADD cross terms — so the min over the
    * depth rows is the tightest of depth one-sided overestimates (the
    * classic CM inner product). `P[est − true > e·|A|·|B|/width] <
    * exp(−depth)`.
    *
    * This is the 100 TB join PRE-FLIGHT (the L6/L24 bucket-cost-profile
    * family): decide whether a join is feasible — or needs salting, a
    * different key, or a semi-join reduction — from two `depth·width`
    * summaries, without touching either table. A self-estimate
    * (both sketches over the same column) bounds `Σ_k f(k)²`, the
    * self-join size / F2 skew measure that predicts the worst shuffle
    * a key can produce. Cost: one (r, c) equi-join of two
    * sketch-sized relations; rows with no surviving counter pairs
    * contribute a zero row so an empty overlap estimates 0, not null.
    */
  def countMinJoinSize(sketchA: DataFrame, sketchB: DataFrame, depth: Int): DataFrame = {
    require(depth >= 1, "depth must be >= 1")
    val a = sketchA.select(col("r"), col("c"), col("cnt").as("__cnt_a"))
    val b = sketchB.select(col("r"), col("c"), col("cnt").as("__cnt_b"))
    val ips = a.join(b, Seq("r", "c"))
      .groupBy(col("r"))
      .agg(sum(col("__cnt_a") * col("__cnt_b")).as("__ip"))
    sketchA.sparkSession.range(depth.toLong)
      .select(col("id").cast("int").as("r"))
      .join(ips, Seq("r"), "left")
      .agg(min(coalesce(col("__ip"), lit(0L))).as("join_size_est"))
  }

  /** Values of `keyCol` appearing in at least `minSupport` fraction of
    * rows, with exact counts. The HAVING prunes before the final
    * ordering, so only candidates survive the aggregation.
    *
    * One scan: the per-key counts aggregate once, and the grand total is
    * a tiny re-aggregation of that output joined back by broadcast. The
    * count output is packed into a single STRUCT column so column
    * pruning cannot specialize the two consumers' plans apart — with
    * identical subtrees, ReuseExchange runs the scan + count shuffle
    * ONCE (plan-asserted in OperatorSpec). Callers that already know
    * the row count (a previous stage's metric, a table statistic) pass
    * `totalHint` and skip the total branch entirely.
    */
  def heavyHitters(df: DataFrame, keyCol: String, minSupport: Double,
      totalHint: Option[Long] = None): DataFrame = {
    require(minSupport > 0 && minSupport <= 1, "minSupport in (0, 1]")
    totalHint match {
      case Some(total) =>
        df.groupBy(col(keyCol))
          .agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") >= lit(math.ceil(total * minSupport).toLong))
          .orderBy(col("cnt").desc, col(keyCol).asc)
      case None =>
        val counts = df.groupBy(col(keyCol))
          .agg(count(lit(1)).as("cnt"))
          .select(struct(col(keyCol).as("k"), col("cnt").as("c")).as("kc"))
        val totalRow = counts.agg(sum(col("kc.c")).as("__total"))
        counts
          .select(col("kc.k").as(keyCol), col("kc.c").as("cnt"))
          .crossJoin(broadcast(totalRow))
          .filter(col("cnt") >= ceil(col("__total") * lit(minSupport)).cast("long"))
          .select(col(keyCol), col("cnt"))
          .orderBy(col("cnt").desc, col(keyCol).asc)
    }
  }
}
