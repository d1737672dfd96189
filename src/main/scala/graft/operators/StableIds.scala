package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.llm.Caching

/** Contiguous global row ids (1..N) in key order WITHOUT a global
  * single-partition sort.
  *
  * The naive form — `row_number().over(Window.orderBy(key))` — plans an
  * `Exchange SinglePartition`: the entire dataset funnels through ONE task,
  * which is the canonical 100 TB scale-killer (it is also the first thing
  * the reference-style pandas pipeline gets for free and a distributed
  * engine must re-earn). `monotonically_increasing_id()` alone is no
  * substitute: its ids are non-contiguous (partition id in the high bits)
  * and unordered across partitions.
  *
  * Distributed shape (the classic two-pass offset pattern):
  *   1. range-repartition by the key and sort WITHIN partitions — all
  *      parallel, partition p holds keys strictly below partition p+1;
  *   2. stamp `monotonically_increasing_id()` — partition ordinal in the
  *      high 31 bits, the per-partition row counter in the low 33 — and
  *      PIN the frame so the stamp is frozen across the two consuming jobs;
  *   3. one tiny job counts rows per partition (map-side partial agg →
  *      `numPartitions` rows on the driver — bounded by cluster size,
  *      never by data);
  *   4. the exclusive prefix-sum of those counts becomes a literal
  *      pid→offset map, and `global_id = offset[pid] + local_index + 1`
  *      — pure per-row arithmetic inside whole-stage codegen.
  *
  * Determinism: ids are run-stable iff `keyCols` totally order the rows
  * (e.g. include a unique key). Rows tied on every key column receive
  * arbitrary-but-contiguous ids within the tie group. The range
  * partitioner never splits equal keys across partitions, so ties cannot
  * straddle an offset boundary.
  *
  * Lifecycle: the pinned intermediate (the ranged+stamped frame) must
  * STAY cached until the returned frame is materialized — re-running the
  * range exchange would re-sample boundaries and re-stamp ids, so an
  * early release is a correctness bug, not a cost one. One-shot jobs let
  * app exit reclaim it; long-lived services use [[byKeyReleasable]] and
  * call the handle after materializing.
  */
object StableIds {

  def byKey(df: DataFrame, numPartitions: Int, keyCols: Column*): DataFrame =
    byKeyReleasable(df, numPartitions, keyCols: _*)._1

  /** [[byKey]] plus the cache-release handle for the internal pinned
    * frame (call it only AFTER materializing the result).
    */
  def byKeyReleasable(df: DataFrame, numPartitions: Int,
      keyCols: Column*): (DataFrame, () => Unit) = {
    require(keyCols.nonEmpty, "StableIds.byKey needs at least one key column")
    val ranged = Caching.pin(
      df.repartitionByRange(numPartitions, keyCols: _*)
        .sortWithinPartitions(keyCols: _*)
        .withColumn("__mid", monotonically_increasing_id()))
    val pid = shiftright(col("__mid"), 33).cast("int")
    val localIdx = col("__mid").bitwiseAND(lit((1L << 33) - 1))
    // numPartitions result rows: partial agg collapses each partition to 1
    val counts = ranged.groupBy(pid.as("__pid")).agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    // monotonically_increasing_id's per-partition counter is 33 bits; a
    // range partition beyond 2^33 rows would silently wrap localIdx and
    // corrupt every id after it — fail loudly instead (the fix is more
    // partitions, checked here because the counts are already on the driver)
    counts.find(_._2 >= (1L << 33)).foreach { case (p, n) =>
      throw new IllegalArgumentException(
        s"StableIds: range partition $p holds $n rows (>= 2^33, the id stamp's " +
          s"per-partition capacity) — raise numPartitions above ${numPartitions}")
    }
    var acc = 0L
    val offsets = counts.map { case (p, n) => val o = (p, acc); acc += n; o }
    val offsetOf = element_at(
      map_from_arrays(
        typedLit(offsets.map(_._1).toSeq),
        typedLit(offsets.map(_._2).toSeq)),
      pid)
    val result = ranged.withColumn("global_id", offsetOf + localIdx + lit(1L)).drop("__mid")
    (result, () => Caching.release(ranged))
  }
}
