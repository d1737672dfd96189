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
  *
  * NULL semantics (the DuckDB ASOF convention — NULLs never match):
  * right rows with a null key or null timestamp are dropped before the
  * merge (a null timestamp would sort FIRST in the merged window and
  * spuriously "match" null-ts left rows); left rows always pass through,
  * and a left row with a null timestamp sorts before every surviving
  * right row in its key, so it emerges unmatched (null payload).
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
    require(!valueCols.contains("__matched_ts"),
      "valueCols may not contain __matched_ts (it is the reserved matched-timestamp slot)")
    val payload: Column = struct(
      col(tsCol).as("__matched_ts") +: valueCols.map(col): _*)
    val l = left.select(
      col(keyCol).as("__k"), col(tsCol).as("__ts"), lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__lrow"),
      lit(null).cast(right.select(payload).schema.head.dataType).as("__rv"))
    val r = right
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(
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

  /** Timestamp as an order-preserving long for the binary search: micros
    * for timestamps (lossless — Spark's internal representation, with
    * the NTZ cast handled by [[TimeCols.micros]]: `unix_micros` rejects
    * TIMESTAMP_NTZ outright), plain cast for integral types.
    */
  private def tsAsLong(dt: org.apache.spark.sql.types.DataType, c: Column): Column =
    TimeCols.micros(dt, c)

  /** Nearest-neighbor-in-time join (pandas `merge_asof
    * direction='nearest'`): each left row matches the right row with the
    * MINIMUM absolute timestamp distance within `toleranceMicros`, per
    * key — the sensor-alignment read ("the reading closest to this
    * event, either side, within 30 minutes").
    *
    * Shape: the same merged-stream plan as [[apply]], run in BOTH scan
    * directions over ONE key shuffle — a backward pass (last right
    * at-or-before, ties match at distance 0) and a forward pass (first
    * right strictly-after, realized as a running `last` over the
    * DESCENDING (ts, side) order); both windows share the partition key,
    * so Spark plans one Exchange with two in-partition sorts. The
    * chooser picks the smaller distance, breaking exact-distance ties
    * toward the EARLIER right row (the backward match) — bit-stable by
    * construction. No pair blow-up at any scale: cost is the one
    * shuffle + two linear scans, like [[apply]].
    *
    * Contracts shared with [[apply]]: right unique per (key, ts);
    * null-key/null-ts right rows dropped; null-ts left rows emerge
    * unmatched.
    *
    * @param toleranceMicros max |left.ts - right.ts| for a match
    *                        (Long.MaxValue = unbounded)
    * @return left.* + valueCols + `__matched_ts` + `__dist_us`
    *         (microsecond distance, null when unmatched)
    */
  def nearest(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      valueCols: Seq[String], toleranceMicros: Long = Long.MaxValue): DataFrame = {
    val leftCols = left.columns.toIndexedSeq
    require(!leftCols.contains("__matched_ts") && !leftCols.contains("__dist_us"),
      "left may not contain __matched_ts/__dist_us")
    require(!valueCols.contains("__matched_ts") && !valueCols.contains("__dist_us"),
      "valueCols may not contain the reserved __matched_ts/__dist_us slots")
    val rTs = right.schema(tsCol).dataType
    val payload: Column = struct(
      tsAsLong(rTs, col(tsCol)).as("__t") +:
        col(tsCol).as("__matched_ts") +: valueCols.map(col): _*)
    val l = left.select(
      col(keyCol).as("__k"),
      tsAsLong(left.schema(tsCol).dataType, col(tsCol)).as("__us"),
      lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__lrow"),
      lit(null).cast(right.select(payload).schema.head.dataType).as("__rv"))
    val r = right
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("__k"),
        tsAsLong(rTs, col(tsCol)).as("__us"),
        lit(0).as("__side"),
        lit(null).cast(l.schema("__lrow").dataType).as("__lrow"),
        payload.as("__rv"))
    // backward: right before left at equal ts (<= semantics, distance 0)
    val wb = Window.partitionBy(col("__k"))
      .orderBy(col("__us").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward: descending scan; left (side 1) before right (side 0) at
    // equal ts, so an equal-ts right row belongs to the BACKWARD match
    // only — forward is strictly-after
    val wf = Window.partitionBy(col("__k"))
      .orderBy(col("__us").desc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = last(col("__rv"), ignoreNulls = true).over(wb)
    val next = last(col("__rv"), ignoreNulls = true).over(wf)
    val merged = l.unionByName(r)
      .withColumn("__p", prev)
      .withColumn("__n", next)
      .filter(col("__side") === 1)
    val dp = col("__us") - col("__p").getField("__t")
    val dn = col("__n").getField("__t") - col("__us")
    val pickPrev = col("__p").isNotNull &&
      (col("__n").isNull || dp <= dn) // tie -> earlier (backward) match
    val cand = when(pickPrev, col("__p")).otherwise(col("__n"))
    val dist = when(pickPrev, dp).otherwise(dn)
    val m = when(cand.isNotNull && dist <= toleranceMicros, cand)
    merged.select(
      leftCols.map(c => col("__lrow").getField(c).as(c)) ++
        valueCols.map(c => m.getField(c).as(c)) :+
        m.getField("__matched_ts").as("__matched_ts") :+
        when(m.isNotNull, dist).as("__dist_us"): _*)
  }

  /** Broadcast as-of join — the complement of [[apply]] for a
    * DIMENSION-sized right side (config history, price list, exchange
    * rates): the right side collapses to one row per key holding its
    * full sorted timestamp history as two aligned arrays, broadcasts,
    * and each left row binary-searches its key's timestamp array
    * ([[graft.functions.SortedCountLe]], O(log h) per row). The big left
    * side is NEVER shuffled and never sorted — the merged-stream form
    * ([[apply]]) costs one full left shuffle + in-partition sort, which
    * is the right plan when BOTH sides are large but pure waste when the
    * right side fits in a broadcast. Same ≤-tie contract, same NULL
    * semantics (null-key/ts right rows dropped; null-ts left rows
    * unmatched), same unique-per-(key, ts) right-side contract as
    * [[apply]].
    *
    * Scale shape: the only exchange in the plan is the right side's
    * per-key aggregation (dimension-sized); the left side's scan feeds
    * the broadcast hash join directly. A key's history rides the
    * broadcast as one row, so the broadcast budget is
    * O(keys · avg history · payload width) — the caller's contract that
    * "right is dimension-sized", exactly as with any broadcast dim join.
    *
    * @return left.* + valueCols + `__matched_ts`, as [[apply]]
    */
  def broadcastAsOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      valueCols: Seq[String],
      maxBroadcastRows: Long = IntervalJoin.MaxBroadcastRowsDefault): DataFrame = {
    val leftCols = left.columns.toIndexedSeq
    require(!leftCols.contains("__matched_ts"), "left may not contain __matched_ts")
    require(!valueCols.contains("__matched_ts"),
      "valueCols may not contain __matched_ts (it is the reserved matched-timestamp slot)")
    // Pre-flight guard (the IntervalJoin.broadcastByKey contract, same
    // rationale): "right is dimension-sized" previously failed as an OOM
    // deep in the job; one tiny count job now fails it fast instead.
    val n = right.count()
    require(n <= maxBroadcastRows,
      s"history side has $n rows > maxBroadcastRows=$maxBroadcastRows: " +
        "broadcastAsOf is for DIMENSION-sized histories; use the " +
        "merged-stream AsOfJoin.apply for fact-sized ones, or raise " +
        "maxBroadcastRows if the broadcast budget genuinely allows it")
    val rTs = right.schema(tsCol).dataType
    val payload: Column = struct(
      col(tsCol).as("__matched_ts") +: valueCols.map(col): _*)
    // one row per key: ascending (ts, payload) history split into two
    // aligned arrays (struct sort orders by the leading __t; right rows
    // are unique per (key, ts) by contract, so the order is total)
    val dim = right
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(keyCol).as("__k"))
      .agg(sort_array(collect_list(struct(
        tsAsLong(rTs, col(tsCol)).as("__t"), payload.as("__p")))).as("__h"))
      .select(col("__k"), col("__h.__t").as("__ts_arr"), col("__h.__p").as("__val_arr"))
    val probe = tsAsLong(left.schema(tsCol).dataType, col(tsCol))
    val idx = graft.functions.SortedCountLe(col("__ts_arr"), probe)
    val m = when(col("__i") > 0, element_at(col("__val_arr"), col("__i")))
    left.join(broadcast(dim), col(keyCol) === col("__k"), "left")
      .withColumn("__i", idx)
      .select(
        leftCols.map(col) ++
          valueCols.map(c => m.getField(c).as(c)) :+
          m.getField("__matched_ts").as("__matched_ts"): _*)
  }
}
