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
    */
  def heavyHitters(df: DataFrame, keyCol: String, minSupport: Double): DataFrame = {
    require(minSupport > 0 && minSupport <= 1, "minSupport in (0, 1]")
    val total = df.count() // one scan; at scale pass a known/estimated total instead
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= lit(math.ceil(total * minSupport).toLong))
      .orderBy(col("cnt").desc, col(keyCol).asc)
  }
}
