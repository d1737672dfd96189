package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD-2 (slowly-changing-dimension) history build: turn a change-event
  * stream `(key, ts, attrs...)` into per-key validity intervals
  * `[valid_from, valid_to)` — the producer side of the interval lookup
  * ([[IntervalJoin]] / the q85 consumer): run this over a CDC/change
  * feed, write the result as the dimension, and point-in-time queries
  * become the grid-bucketed equi-join.
  *
  * Semantics:
  *  - one output row per surviving change; `valid_from` = its ts,
  *    `valid_to` = the key's next change ts (half-open, so intervals
  *    tile the key's timeline with no gaps and no overlaps);
  *  - the final row of each key has `valid_to` NULL and
  *    `is_current` true (the open "current" row — downstream interval
  *    joins clamp it, see [[IntervalJoin]]'s sentinel guard);
  *  - `version` numbers a key's rows 1..n in change order;
  *  - simultaneous changes (equal `(key, ts)`) collapse to the one with
  *    the greatest `tieCol` (last-writer-wins; pass the CDC sequence
  *    number / log offset).
  *
  * Scale shape: ONE hash shuffle on the key. Both window passes (the
  * last-writer filter and the interval/version stamp) partition by the
  * same key, so Catalyst reuses a single exchange; everything else is
  * a per-partition sort + per-row projection. No driver state, no
  * global sort, no single-partition funnel.
  */
object Scd2 {

  /** @param changes  change feed; one row per observed state
    * @param keyCol   dimension key
    * @param tsCol    change timestamp (becomes `valid_from`)
    * @param attrCols attribute columns carried into the dimension
    * @param tieCol   total-order tiebreaker within equal `(key, ts)`
    *   (greatest survives)
    * @return `keyCol, attrCols..., valid_from, valid_to, version,
    *   is_current`
    */
  def build(changes: DataFrame, keyCol: String, tsCol: String,
      attrCols: Seq[String], tieCol: String): DataFrame = {
    val key: Column = col(keyCol)
    // Both windows order within the SAME key partitioning; the dedup
    // window resolves equal-ts groups by keeping the max-tie row (its
    // successor in (ts, tie) order has a different ts or doesn't exist).
    val ordered = Window.partitionBy(key)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val nextTs = lead(col(tsCol), 1).over(ordered)
    val dedup = changes
      .withColumn("__last_of_ts", nextTs.isNull || nextTs =!= col(tsCol))
      .filter(col("__last_of_ts"))
    val seq = Window.partitionBy(key).orderBy(col(tsCol).asc)
    dedup
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(seq))
      .withColumn("version", row_number().over(seq).cast("long"))
      .withColumn("is_current", col("valid_to").isNull)
      .select(Seq(key) ++ attrCols.map(col) ++ Seq(col("valid_from"),
        col("valid_to"), col("version"), col("is_current")): _*)
  }
}
