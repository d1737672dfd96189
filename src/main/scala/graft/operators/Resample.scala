package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling with forward fill (gap filling): each key's
  * irregular event stream becomes a REGULAR grid — one row per `step`
  * from the key's first bucket to its last — carrying the latest value
  * at-or-before each grid instant (the metrics/sensor/feature-store
  * "resample + ffill" primitive; the reference's per-day group
  * iteration is the step=1d special case of the same shape).
  *
  * Scale shape: the grid is generated per key with `sequence()` from
  * that key's own [min, max] bucket — an explode, never a cross join
  * against a global calendar — and the fill is one `last(value,
  * ignoreNulls)` running window over the union of events and grid
  * rows, so the whole operator costs ONE exchange on the key (grid
  * generation reuses the per-key agg's partitioning; the window sorts
  * within partitions). State per row is one value — nothing key-global
  * is ever collected.
  *
  * Determinism: within a timestamp tie, events order by `idCol` and
  * grid rows sort AFTER events at the same instant, so a grid bucket
  * at t carries the value of the highest-id event with ts ≤ t —
  * bit-stable across engines (the suite's oracle recomputes it with a
  * correlated top-1). Keys whose first event starts a bucket late
  * simply start their grid there: no key ever reports buckets outside
  * its own observed range, and a bucket before the first event would
  * have no defined fill anyway.
  */
object Resample {

  /** @param df      input with `keyCol`, `tsCol` (timestamp), `idCol`
    *                (tie-break within equal timestamps), `valueCol` (long)
    * @param stepSec grid step in seconds
    * @return (keyCol, bucket_ts timestamp, filled value) — one row per
    *         key × grid instant, value = latest at-or-before the instant
    */
  def forwardFill(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valueCol: String, stepSec: Long): DataFrame = {
    require(stepSec > 0, "stepSec must be positive")
    val us = TimeCols.micros(df.schema(tsCol).dataType, df(tsCol))
    val stepUs = stepSec * 1000000L
    val events = df.select(
      col(keyCol),
      us.as("__us"),
      lit(0).as("__grid"),
      col(idCol).cast("long").as("__id"),
      col(valueCol).cast("long").as("__v"))
    val grid = events
      .groupBy(col(keyCol))
      .agg(
        (min(col("__us")) - pmod(min(col("__us")), lit(stepUs))).as("__lo"),
        (max(col("__us")) - pmod(max(col("__us")), lit(stepUs))).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"), lit(stepUs))).as("__us"),
        lit(1).as("__grid"),
        lit(Long.MaxValue).as("__id"),
        lit(null).cast("long").as("__v"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__us"), col("__grid"), col("__id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.unionByName(grid)
      .withColumn("__fill", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__grid") === 1)
      .select(col(keyCol),
        timestamp_micros(col("__us")).as("bucket_ts"),
        col("__fill").as(valueCol))
  }

  /** Linear-interpolation variant of [[forwardFill]]: each grid value
    * interpolates between the latest event at-or-before the instant
    * (prev — ties by highest id, as in forwardFill) and the EARLIEST
    * event strictly after it (next — the closest following instant,
    * ties by lowest id); with no following event the tail forward-fills,
    * with no preceding event the head is NULL. Same shape/cost as
    * forwardFill plus one reverse-ordered window (still ONE exchange:
    * both windows partition on the key; the second sorts within
    * partitions the other way).
    *
    * Arithmetic is bit-stable across engines: the slope numerator and
    * the gap are exact int64s, the quotient is one binary64 division,
    * and the result takes FLOOR (not truncation — negative slopes
    * round down identically everywhere):
    * `prev + floor((next_v − prev_v)·(t − prev_us) / (next_us − prev_us))`.
    */
  def interpolate(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valueCol: String, stepSec: Long): DataFrame = {
    require(stepSec > 0, "stepSec must be positive")
    val us = TimeCols.micros(df.schema(tsCol).dataType, df(tsCol))
    val stepUs = stepSec * 1000000L
    val events = df.select(
      col(keyCol),
      us.as("__us"),
      lit(0).as("__grid"),
      col(idCol).cast("long").as("__id"),
      col(valueCol).cast("long").as("__v"))
    val grid = events
      .groupBy(col(keyCol))
      .agg(
        (min(col("__us")) - pmod(min(col("__us")), lit(stepUs))).as("__lo"),
        (max(col("__us")) - pmod(max(col("__us")), lit(stepUs))).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"), lit(stepUs))).as("__us"),
        lit(1).as("__grid"),
        lit(Long.MaxValue).as("__id"),
        lit(null).cast("long").as("__v"))
    val point = when(col("__v").isNotNull,
      struct(col("__us").as("us"), col("__v").as("v")))
    val wFwd = Window.partitionBy(col(keyCol))
      .orderBy(col("__us").asc, col("__grid").asc, col("__id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBwd = Window.partitionBy(col(keyCol))
      .orderBy(col("__us").desc, col("__grid").asc, col("__id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.unionByName(grid)
      .withColumn("__prev", last(point, ignoreNulls = true).over(wFwd))
      .withColumn("__next", last(point, ignoreNulls = true).over(wBwd))
      .filter(col("__grid") === 1)
      .select(col(keyCol),
        timestamp_micros(col("__us")).as("bucket_ts"),
        when(col("__prev").isNull, lit(null).cast("long"))
          .when(col("__next").isNull || col("__next.us") <= col("__prev.us"),
            col("__prev.v"))
          .otherwise(col("__prev.v") + floor(
            ((col("__next.v") - col("__prev.v")) * (col("__us") - col("__prev.us")))
              .cast("double") /
              (col("__next.us") - col("__prev.us")).cast("double")).cast("long"))
          .as(valueCol))
  }
}
