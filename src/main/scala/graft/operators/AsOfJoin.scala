package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: each left row matched to the single right row with the
  * greatest timestamp ≤ the left row's, per key — the point-in-time
  * lookup of event analytics (latest signup before a purchase, last
  * config before a reading, prevailing price at order time).
  *
  * Spark-first shape: NOT a range join. `l.ts >= r.ts` as a join
  * condition is a per-key cross product that the planner can only
  * nested-loop (O(n·m) per key, then a max-per-left reduction); the
  * as-of semantics are really a MERGE of the two sorted streams. So:
  * tag each side, union, and carry the last-seen right payload over one
  * (key, time)-sorted running window — ONE shuffle on the key, a linear
  * scan within it, no pair blow-up, and at 100 TB it is the plan you
  * want: sort-merge machinery with both sides' sort reused.
  *
  * Tie semantics (bit-stable by construction):
  *  - a right row AT the left row's timestamp matches (≤, the DuckDB
  *    `ASOF JOIN ... ON l.ts >= r.ts` convention) — right rows sort
  *    before left rows at equal timestamps;
  *  - callers must make the right side unique per (key, ts) first (e.g.
  *    keep the max id — [[graft.operators.KeepLastDedup]] is the
  *    general tool); duplicate right timestamps are ambiguous in ANY
  *    engine's as-of, so the contract is explicit here.
  */
object AsOfJoin {

  /** Left rows enriched with the matched right payload (null when no
    * right row precedes).
    *
    * @param left     frame with `keyCol`, `tsCol`, and any payload
    * @param right    frame with `keyCol`, `tsCol`, and `valueCols`;
    *                 unique per (keyCol, tsCol)
    * @param valueCols right columns to carry onto matches
    * @return left.* + valueCols + `__matched_ts` (the matched right
    *         timestamp, null when unmatched)
    */
  def apply(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toIndexedSeq
    require(!leftCols.contains("__matched_ts"), "left may not contain __matched_ts")
    val payload: Column = struct(
      col(tsCol).as("__matched_ts") +: valueCols.map(col): _*)
    val l = left.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__lrow"),
      lit(null).cast(right.select(payload).schema.head.dataType).as("__rv"))
    val r = right.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(0).as("__side"),
      lit(null).cast(l.schema("__lrow").dataType).as("__lrow"),
      payload.as("__rv"))
    // last-seen right payload over the merged stream; right (side 0)
    // sorts before left (side 1) at equal ts, giving <= match semantics
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    matched.select(
      leftCols.map(c => col("__lrow").getField(c).as(c)) ++
        valueCols.map(c => col("__m").getField(c).as(c)) :+
        col("__m").getField("__matched_ts").as("__matched_ts"): _*)
  }
}
