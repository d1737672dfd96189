package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators: salting for hot keys.
  *
  * AQE's skew handling (enabled in GraftSession) splits oversized
  * shuffle partitions at runtime; salting is the plan-level complement
  * for *known* hot keys — it bounds the per-task share of a hot key
  * before the shuffle happens, which AQE cannot do for a single giant
  * key group feeding an aggregation.
  */
object Skew {

  sealed trait SaltedAgg { def out: String }
  final case class SaltedSum(col: String, out: String) extends SaltedAgg
  final case class SaltedCount(out: String) extends SaltedAgg
  final case class SaltedMin(col: String, out: String) extends SaltedAgg
  final case class SaltedMax(col: String, out: String) extends SaltedAgg

  /** Deterministic per-row salt:
    * `pmod(xxhash64(seed, spark_partition_id, saltCols...), numSalts)`.
    *
    * Hash-based, not `rand()`: rand's draw depends on the row's ORDER
    * within its partition, which is nondeterministic after shuffle
    * reads — a task retry can re-draw different salts and double-count
    * or drop rows across a retried boundary. The hash depends only on
    * the partition id and row CONTENT, both stable under recomputation
    * of the same plan.
    *
    * The partition id is in the mix so byte-identical rows (the classic
    * hot key in log-like data) still spread across partitions instead of
    * collapsing onto one salt; within one partition identical rows share
    * a salt, where map-side partial aggregation collapses them anyway.
    * `saltCols` empty → hash all columns. Salt choice cannot change any
    * decomposable-aggregate result.
    */
  def saltExpr(df: DataFrame, saltCols: Seq[String], numSalts: Int,
      seed: Long): Column = {
    val cols = (if (saltCols.nonEmpty) saltCols else df.columns.toSeq).map(col)
    pmod(xxhash64(lit(seed) +: spark_partition_id().cast("long") +: cols: _*),
      lit(numSalts.toLong)).cast("int")
  }

  /** Two-phase salted aggregation for decomposable aggregates: phase 1
    * groups by (keys, salt) — a hot key spreads across `numSalts`
    * partial groups — phase 2 merges partials by keys. The salt values
    * do not affect the result (sum of partial sums, min of partial
    * mins, …), so any salt assignment is correct; the deterministic
    * row-hash salt spreads rows uniformly AND reproduces identically
    * under task retry.
    *
    * Note Spark's own hash aggregation already does map-side partial
    * aggregation, which handles most skew; explicit salting matters
    * when the *merge* of one key's partials still overloads a reducer
    * (e.g. huge per-key state) or for sort-based fallbacks.
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], aggs: Seq[SaltedAgg],
      numSalts: Int = 16, seed: Long = 42L, saltCols: Seq[String] = Nil): DataFrame = {
    val salted = df.withColumn("__salt", saltExpr(df, saltCols, numSalts, seed))
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head match {
        case SaltedSum(c, o)  => sum(col(c)).as(o)
        case SaltedCount(o)   => count(lit(1)).as(o)
        case SaltedMin(c, o)  => min(col(c)).as(o)
        case SaltedMax(c, o)  => max(col(c)).as(o)
      }, aggs.tail.map {
        case SaltedSum(c, o)  => sum(col(c)).as(o)
        case SaltedCount(o)   => count(lit(1)).as(o)
        case SaltedMin(c, o)  => min(col(c)).as(o)
        case SaltedMax(c, o)  => max(col(c)).as(o)
      }: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(merge(aggs.head), aggs.tail.map(merge): _*)
  }

  private def merge(a: SaltedAgg): Column = a match {
    case SaltedSum(_, o)  => sum(col(o)).as(o)
    case SaltedCount(o)   => sum(col(o)).as(o)
    case SaltedMin(_, o)  => min(col(o)).as(o)
    case SaltedMax(_, o)  => max(col(o)).as(o)
  }

  /** One-sided upper bound on the heaviest key's frequency, from a
    * count-min sketch relation ([[Sketches.countMin]]) ALONE: per hash
    * row every key's full count lands in one counter, so
    * `max_c cnt(r,c) ≥ max_k f(k)` for every row r, and the min over
    * the depth rows is the tightest of depth one-sided bounds (the
    * q127 inner-product argument applied to the max). Cost: one
    * aggregation of a depth×width relation and a 1-row collect —
    * nothing data-sized is touched, which is the point: the sketch
    * already exists (maintained live by the streaming CMS store).
    */
  def heavyKeyBound(sketch: DataFrame): Long =
    sketch.groupBy(col("r")).agg(max(col("cnt")).as("__m"))
      .agg(min(col("__m")).as("__bound"))
      .collect()(0).getLong(0)

  /** Sketch-driven salt factor: enough salts that the HEAVIEST key's
    * estimated rows spread to ≤ `targetRowsPerReducer` per partial
    * group, clamped to [1, maxSalts]. This closes the pre-flight loop
    * (q127 family): the sketch prices the skew, this prices the
    * mitigation, and because [[heavyKeyBound]] is one-sided the chosen
    * factor can only over-provision — correctness never depends on it
    * (salt choice cannot change a decomposable aggregate's result).
    */
  def saltsForBound(bound: Long, targetRowsPerReducer: Long,
      maxSalts: Int = 256): Int = {
    require(targetRowsPerReducer > 0, "targetRowsPerReducer must be positive")
    math.max(1, math.min(maxSalts.toLong,
      (bound + targetRowsPerReducer - 1) / targetRowsPerReducer).toInt)
  }

  /** ONE-CALL join pre-flight (VERDICT r19 item 5): everything the
    * sketch family can tell you about `left ⋈ right ON key` before
    * shuffling a byte of either table, as a single one-row frame —
    *
    *   - `join_size_est`    upper bound on |left ⋈ right| (CM inner
    *                        product, [[Sketches.countMinJoinSize]])
    *   - `left_f2_est` /    upper bounds on each side's self-join size
    *     `right_f2_est`     Σ_k f(k)² — the F2 skew measure that
    *                        predicts the worst shuffle a key produces
    *   - `left_heavy_bound`/ one-sided bounds on each side's heaviest
    *     `right_heavy_bound` key frequency ([[heavyKeyBound]]'s
    *                        aggregate, computed in-plan)
    *   - `salts_left` /     the [[saltsForBound]] salt factor if that
    *     `salts_right`      side is the salted-join PROBE side, from
    *                        the same integer-ceil formula
    *
    * Cost: one column-pruned scan per side building a depth×width
    * sketch (map-side combined), then sketch-sized joins and one-row
    * broadcast cross-joins — nothing data-sized moves, which is the
    * point of a pre-flight at 100 TB. Every estimate is ONE-SIDED
    * (collisions only add), so acting on it can over-provision but
    * never under-provision; q197 gates the one-sidedness against the
    * exact values and the composition-≡-parts law lives in
    * OperatorSpec.
    */
  def joinPreflight(left: DataFrame, right: DataFrame, key: String,
      depth: Int = 4, width: Int = 2048,
      targetRowsPerReducer: Long = 1000000L, maxSalts: Int = 256): DataFrame = {
    require(targetRowsPerReducer > 0, "targetRowsPerReducer must be positive")
    import graft.operators.Sketches
    // each sketch feeds three consumers (join est, own F2, own heavy
    // bound) — one EAGER localCheckpoint per side runs the side's scan
    // once and stores only the depth×width sketch rows. Checkpoint
    // blocks die with the returned plan, so repeated pre-flights (a
    // bench loop, a long-lived service) accumulate nothing — unlike a
    // Caching.pin, whose CacheManager entry outlived every call with no
    // release handle (r20 ADVICE finding).
    val skL = Sketches.countMin(left.select(col(key)), key, depth, width)
      .localCheckpoint()
    val skR = Sketches.countMin(right.select(col(key)), key, depth, width)
      .localCheckpoint()
    def est(a: DataFrame, b: DataFrame, as: String): DataFrame =
      Sketches.countMinJoinSize(a, b, depth)
        .select(col("join_size_est").as(as))
    // heavyKeyBound's min-of-row-maxes, in-plan (no driver collect —
    // the scalar form stays for callers that want the Long). An EMPTY
    // side has no sketch rows: min-over-zero-rows is NULL, which would
    // poison the salt expression — coalesce to 0 so salts degrade to 1
    // (join_size_est already defends to 0 the same way).
    def heavy(sk: DataFrame, as: String): DataFrame =
      sk.groupBy(col("r")).agg(max(col("cnt")).as("__m"))
        .agg(coalesce(min(col("__m")), lit(0L)).as(as))
    def salts(boundCol: String, as: String): Column =
      // the saltsForBound formula verbatim: ceil(bound/target) by
      // INTEGER `div` (Column `/` is double division and could round a
      // boundary value past the exact clamp), clamped to [1, maxSalts]
      expr(s"CAST(greatest(1L, least(${maxSalts}L, " +
        s"($boundCol + ${targetRowsPerReducer - 1}L) div ${targetRowsPerReducer}L)) AS INT)")
        .as(as)
    est(skL, skR, "join_size_est")
      .crossJoin(broadcast(est(skL, skL, "left_f2_est")))
      .crossJoin(broadcast(est(skR, skR, "right_f2_est")))
      .crossJoin(broadcast(heavy(skL, "left_heavy_bound")))
      .crossJoin(broadcast(heavy(skR, "right_heavy_bound")))
      .select(col("join_size_est"), col("left_f2_est"), col("right_f2_est"),
        col("left_heavy_bound"), col("right_heavy_bound"),
        salts("left_heavy_bound", "salts_left"),
        salts("right_heavy_bound", "salts_right"))
  }

  /** Salted equi-join for a skewed probe side against a modest build
    * side: the build side is replicated `numSalts` times (one copy per
    * salt value), the probe side gets a uniform salt, and the join key
    * becomes (key, salt) — a hot key's rows spread over `numSalts`
    * reducers instead of one. Build-side cost: ×numSalts rows — use
    * only when the build side is small enough to replicate but too big
    * (or too row-multiplying) to broadcast.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      numSalts: Int = 16, joinType: String = "inner", seed: Long = 42L,
      saltCols: Seq[String] = Nil): DataFrame = {
    val saltedProbe = probe.withColumn("__salt",
      saltExpr(probe, saltCols, numSalts, seed))
    val saltedBuild = build.withColumn("__salt",
      explode(array((0 until numSalts).map(lit): _*)))
    saltedProbe.join(saltedBuild, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
