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
  *
  * Sentinel guard: each interval's exploded cell range is CLAMPED to the
  * point side's observed [min, max] cell — an SCD-2 dimension routinely
  * carries open-ended "current" rows with sentinel end dates
  * (9999-12-31), which at cellMicros=1h would otherwise explode to ~70M
  * cells PER ROW. Clamping is exact: a (point, interval) pair meets only
  * in the point's own cell, which by definition lies inside the observed
  * point range, so cells outside it can never produce a match. The
  * bounds are a 1-row min/max aggregate collected on the driver and
  * folded into the explode as LITERALS (the k-means-centroid pattern:
  * driver state bounded by a constant, never by data) — a broadcast
  * bounds join would survive Catalyst only as a nested loop, which this
  * operator's plan contract forbids. Composition is therefore eager by
  * one tiny job (min/max over the pruned ts column) — unless the caller
  * supplies `boundsHint` (see [[byGrid]]), which keeps the DAG fully
  * lazy.
  */
object IntervalJoin {

  /** Default ceiling for [[broadcastByKey]]'s interval-side pre-flight:
    * 5M interval rows ≈ a few hundred MB broadcast at typical payload
    * widths — comfortably dimension-shaped, far below executor budgets,
    * and far above any real config/price history. Override per call when
    * the deployment's broadcast budget is known.
    */
  val MaxBroadcastRowsDefault: Long = 5000000L

  /** @param left   point side: `keyCol`, `tsCol` (+ carried columns)
    * @param right  interval side: `keyCol`, `startCol`, `endCol`, and
    *   `rightCols` to carry into the output (names must not collide with
    *   left's)
    * @return inner join: every left column, then `rightCols`; one row per
    *   (point, containing interval)
    */
  /** Broadcast variant — the usual SCD-2 case where the interval side is
    * DIMENSION-sized (config history, price lists): per-key interval
    * arrays broadcast to every task and the big point side NEVER
    * shuffles, sorts, or explodes (the complement of [[byGrid]], exactly
    * as the broadcast as-of join complements the merged-stream as-of).
    *
    * Per-row probe cost is O(intervals of that key) via a codegen'd
    * higher-order `filter` over the broadcast array — fine for
    * dimension-shaped history depths (tens to thousands per key); for
    * interval sides at fact scale use [[byGrid]]. Same semantics:
    * half-open `[start, end)`, overlaps multi-match, gaps drop, empty
    * windows never match.
    *
    * Pre-flight guard: "dimension-sized" is a caller contract whose
    * violation previously surfaced as an executor/driver OOM deep in the
    * job — composition now COUNTS the interval side (one tiny job on a
    * dimension; the fail-fast trade, like [[byGrid]]'s bounds job) and
    * rejects anything above `maxBroadcastRows` with a pointer to the
    * shuffle variant. Reserved names: `__s`/`__e` (struct fields) and
    * `__ivs`/`__hit` (intermediates) may appear in neither `rightCols`
    * nor the left frame — previously a `rightCols` entry named `__s`
    * silently resolved to the wrong field.
    */
  def broadcastByKey(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, startCol: String, endCol: String,
      rightCols: Seq[String],
      maxBroadcastRows: Long = MaxBroadcastRowsDefault): DataFrame = {
    val reserved = Set("__s", "__e", "__ivs", "__hit")
    require(!rightCols.exists(reserved.contains),
      s"rightCols may not use the reserved names ${reserved.toSeq.sorted.mkString("/")}")
    require(!left.columns.exists(reserved.contains),
      s"left may not contain the reserved columns ${reserved.toSeq.sorted.mkString("/")}")
    require(!rightCols.exists(left.columns.toSet),
      "rightCols must not collide with left's columns")
    val n = right.count()
    require(n <= maxBroadcastRows,
      s"interval side has $n rows > maxBroadcastRows=$maxBroadcastRows: " +
        "broadcastByKey is for DIMENSION-sized interval sides; use " +
        "IntervalJoin.byGrid for fact-sized ones, or raise maxBroadcastRows " +
        "if the broadcast budget genuinely allows it")
    val dim = right
      .filter(col(endCol) > col(startCol))
      .groupBy(col(keyCol))
      .agg(collect_list(struct(
        Seq(col(startCol).as("__s"), col(endCol).as("__e")) ++
          rightCols.map(col): _*)).as("__ivs"))
    val hits = filter(col("__ivs"),
      s => s.getField("__s") <= col(tsCol) && col(tsCol) < s.getField("__e"))
    left.join(broadcast(dim), Seq(keyCol))
      .withColumn("__hit", explode(hits))
      .select(left.columns.toIndexedSeq.map(col) ++
        rightCols.map(c => col(s"__hit.$c").as(c)): _*)
  }

  /** Grid-bucketed variant for FACT-sized interval sides (see the object
    * scaladoc for the cell mechanics and the sentinel clamp).
    *
    * EAGER unless `boundsHint` is given: composing the join runs one tiny
    * min/max job over the point side's (pruned) timestamp column to
    * clamp sentinel intervals — so an uncached `left` is scanned once at
    * composition and again at execution, composition fails on a
    * streaming left, and the snapshot goes stale if the left frame is
    * non-deterministic between composition and execution (a point
    * arriving OUTSIDE the snapshot range would be silently unmatched).
    * Callers who know their time range pass `boundsHint = Some((loMicros,
    * hiMicros))` — epoch-micros bounds that must COVER every left
    * timestamp — and the whole DAG stays lazy with the hint folded in as
    * the same literals the eager path would have collected.
    */
  def byGrid(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, startCol: String, endCol: String,
      cellMicros: Long, rightCols: Seq[String],
      boundsHint: Option[(Long, Long)] = None): DataFrame = {
    require(cellMicros > 0, "cellMicros must be positive")
    // TimeCols.micros, not bare unix_micros: the point/interval columns
    // are caller-provided and may arrive TIMESTAMP_NTZ (parquet without
    // UTC adjustment), which unix_micros rejects at analysis. The cell
    // index stays SQL `div` (integer, truncating toward zero like Scala
    // Long division) — Column `/` is true division through double and
    // mangles micros magnitudes.
    val pts = left
      .withColumn("__us", TimeCols.micros(left.schema(tsCol).dataType, col(tsCol)))
      .withColumn("__cell", expr(s"__us div $cellMicros"))
      .drop("__us")
    // cell bounds for the sentinel clamp: from the hint (lazy) or the
    // one-row min/max job (eager). Scala Long division truncates toward
    // zero exactly like Spark's `div`, and both are monotone, so a hint
    // covering the timestamps covers the cells.
    val cellBounds: Option[(Long, Long)] = boundsHint match {
      case Some((lo, hi)) =>
        require(lo <= hi, s"boundsHint lo=$lo must be <= hi=$hi")
        Some((lo / cellMicros, hi / cellMicros))
      case None =>
        val r = pts.agg(min(col("__cell")).as("__cmin"),
          max(col("__cell")).as("__cmax")).head()
        if (r.isNullAt(0)) None else Some((r.getLong(0), r.getLong(1)))
    }
    val nonEmpty = right.filter(col(endCol) > col(startCol))
    // empty point side: no cell can match — keep the schema, drop the rows
    val iv = cellBounds match {
      case None =>
        nonEmpty.filter(lit(false)).withColumn("__cell", lit(0L))
      case Some((cmin, cmax)) =>
        nonEmpty
          .withColumn("__sus", TimeCols.micros(right.schema(startCol).dataType, col(startCol)))
          .withColumn("__eus", TimeCols.micros(right.schema(endCol).dataType, col(endCol)))
          .withColumn("__lo", greatest(expr(s"__sus div $cellMicros"), lit(cmin)))
          .withColumn("__hi", least(expr(s"(__eus - 1) div $cellMicros"), lit(cmax)))
          .drop("__sus", "__eus")
          .filter(col("__lo") <= col("__hi"))
          .withColumn("__cell", explode(expr("sequence(__lo, __hi)")))
    }
    pts.as("l").join(iv.as("r"),
        col(s"l.$keyCol") === col(s"r.$keyCol") &&
          col("l.__cell") === col("r.__cell") &&
          col(s"r.$startCol") <= col(s"l.$tsCol") &&
          col(s"l.$tsCol") < col(s"r.$endCol"))
      .select(left.columns.toIndexedSeq.map(c => col(s"l.$c")) ++
        rightCols.map(c => col(s"r.$c")): _*)
  }
}
