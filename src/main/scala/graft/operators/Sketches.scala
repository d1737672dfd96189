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
