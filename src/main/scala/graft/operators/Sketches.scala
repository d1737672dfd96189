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
    * One scan: the grand total rides the SAME aggregation via
    * `rollup(key)` (the grouping-id=1 row), and Spark's ReuseExchange
    * dedups the shared shuffle between the total branch and the per-key
    * branch — no second pass over the input. Callers that already know
    * the row count (a previous stage's metric, a table statistic) pass
    * `totalHint` and skip the rollup row entirely.
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
        // rollup yields every per-key group (grouping=0) plus one grand-
        // total row (grouping=1); grouping() disambiguates a genuine null
        // key from the total row.
        val agg = df.rollup(col(keyCol))
          .agg(count(lit(1)).as("cnt"), grouping(col(keyCol)).as("__g"))
        val totalRow = agg.filter(col("__g") === 1)
          .select(col("cnt").as("__total"))
        agg.filter(col("__g") === 0)
          .crossJoin(broadcast(totalRow))
          .filter(col("cnt") >= ceil(col("__total") * lit(minSupport)).cast("long"))
          .select(col(keyCol), col("cnt"))
          .orderBy(col("cnt").desc, col(keyCol).asc)
    }
  }
}
