package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-validity-interval lookup — the SCD-2 dimension join (match
  * each event to the dimension rows whose `[start, end)` window contains
  * its timestamp; overlapping windows yield multiple matches, gaps yield
  * none — which is exactly where this differs from an as-of join's
  * nearest-≤ semantics).
  *
  * Scale shape: a raw range predicate never hash-partitions — Spark plans
  * it as a per-key nested loop (or BroadcastNestedLoopJoin when keyless),
  * per-key all-pairs at 100 TB. Grid bucketing restores an EQUI-join:
  * each interval explodes onto the ⌈len/cell⌉ time-grid cells it
  * overlaps, each point maps to its single cell, the join key becomes
  * (key, cell), and the exact containment predicate filters the
  * candidates after the hash join. A (point, interval) pair meets in
  * exactly ONE cell — the point's — so replication never duplicates
  * matches. `cellMicros` is the replication/selectivity knob: a cell
  * near the median interval length keeps interval replication ≲ 2× while
  * per-cell candidate lists stay bounded.
  *
  * Epoch arithmetic uses integer `div`, never `/` (micros magnitudes
  * exceed double's 2^53 integer range — same pitfall as the events ns
  * conversion). Empty windows (`end <= start`) can contain no point under
  * half-open semantics and are dropped before exploding.
  */
object IntervalJoin {

  /** @param left   point side: `keyCol`, `tsCol` (+ carried columns)
    * @param right  interval side: `keyCol`, `startCol`, `endCol`, and
    *   `rightCols` to carry into the output (names must not collide with
    *   left's)
    * @return inner join: every left column, then `rightCols`; one row per
    *   (point, containing interval)
    */
  def byGrid(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, startCol: String, endCol: String,
      cellMicros: Long, rightCols: Seq[String]): DataFrame = {
    require(cellMicros > 0, "cellMicros must be positive")
    val pts = left.withColumn("__cell",
      expr(s"unix_micros(`$tsCol`) div $cellMicros"))
    val iv = right
      .filter(col(endCol) > col(startCol))
      .withColumn("__cell", explode(expr(
        s"sequence(unix_micros(`$startCol`) div $cellMicros, " +
          s"(unix_micros(`$endCol`) - 1) div $cellMicros)")))
    pts.as("l").join(iv.as("r"),
        col(s"l.$keyCol") === col(s"r.$keyCol") &&
          col("l.__cell") === col("r.__cell") &&
          col(s"r.$startCol") <= col(s"l.$tsCol") &&
          col(s"l.$tsCol") < col(s"r.$endCol"))
      .select(left.columns.toIndexedSeq.map(c => col(s"l.$c")) ++
        rightCols.map(c => col(s"r.$c")): _*)
  }
}
