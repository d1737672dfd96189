package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental sessionization store — the daily batch form of the
  * sessionize job at corpus scale: instead of re-scanning a year of
  * events to rebuild sessions, each run folds ONE new time-ranged batch
  * into a persisted open-session state. Daily cost = new data + a
  * state-sized merge (state is O(users active near the boundary), the
  * same bound the streaming [[graft.streaming.EventStreams.closedSessions]]
  * carries as watermark state).
  *
  * Mechanics (one user-key shuffle, no joins): each open-state row
  * becomes a pseudo-event at its `last_ms` carrying the session's
  * accumulated (start, count) as a seed payload; seeds sort before real
  * events at the same instant. The standard gaps-and-islands pass over
  * the merged stream then decides — by the ordinary gap rule — whether
  * the batch's first events extend the open session or start fresh.
  * Sessions whose `last + gap ≤ batchEndMs` emit as CLOSED (no later
  * batch can extend them — batches are time-ranged by contract); the
  * rest return as the new open state.
  *
  * Correctness contract (suite + oracle-gated): folding any time-ordered
  * batch split produces exactly the sessions of a direct one-shot
  * sessionize of the union — closed ∪ final-open ≡
  * [[graft.streaming.EventStreams.batchSessions]]. Batches must
  * partition time: every event in batch k precedes every event in
  * batch k+1 (the daily-partition layout); equal-boundary timestamps
  * belong to the later batch.
  */
object IncrementalSessions {

  /** Columns of the open-state frame. */
  val StateCols: Seq[String] = Seq("user_id", "start_ms", "last_ms", "n_events")

  /** An empty open-state frame. */
  def emptyState(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("user_id", LongType), StructField("start_ms", LongType),
        StructField("last_ms", LongType), StructField("n_events", LongType))))
  }

  /** Fold one batch into the store.
    *
    * @param openState  (user_id, start_ms, last_ms, n_events) from the
    *                   previous fold (or [[emptyState]])
    * @param batch      events with `user_id`, `ts`, `event_id`
    * @param gapMs      session gap
    * @param batchEndMs upper bound of the batch's event time (exclusive
    *                   lower bound of the NEXT batch); pass
    *                   `Long.MaxValue` for a final flush that closes
    *                   everything
    * @return (closed sessions: user_id, start_ms, end_ms, n_events;
    *         new open state: [[StateCols]])
    */
  def fold(openState: DataFrame, batch: DataFrame, gapMs: Long,
      batchEndMs: Long): (DataFrame, DataFrame) = {
    val seeds = openState.select(
      col("user_id"), col("last_ms").as("ms"), lit(0).as("side"),
      col("start_ms").as("seed_start"), col("n_events").as("seed_n"),
      lit(Long.MinValue).as("event_id"))
    val evs = batch.select(
      col("user_id"), unix_millis(col("ts")).as("ms"), lit(1).as("side"),
      lit(null).cast("long").as("seed_start"), lit(1L).as("seed_n"),
      col("event_id"))
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ms"), col("side"), col("event_id"))
    val prev = lag(col("ms"), 1).over(byUser)
    val isNew = when(prev.isNull || col("ms") - prev > gapMs, 1L).otherwise(0L)
    val sessions = seeds.unionByName(evs)
      .withColumn("__new", isNew)
      .withColumn("__si", sum(col("__new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("__si"))
      .agg(
        min(coalesce(col("seed_start"), col("ms"))).as("start_ms"),
        max(col("ms")).as("last_ms"),
        sum(col("seed_n")).as("n_events"))
    val closed = sessions
      .filter(col("last_ms") + gapMs <= batchEndMs)
      .select(col("user_id"), col("start_ms"),
        col("last_ms").as("end_ms"), col("n_events"))
    val open = sessions
      .filter(col("last_ms") + gapMs > batchEndMs)
      .select(col("user_id"), col("start_ms"), col("last_ms"), col("n_events"))
    (closed, open)
  }
}
