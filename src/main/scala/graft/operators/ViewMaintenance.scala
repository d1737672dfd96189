package graft.operators

import org.apache.spark.sql.DataFrame

/** Incremental maintenance of a JOIN materialized view — the
  * equi-join companion of the aggregate-state rollup (q133): when the
  * base tables grow by insert deltas ΔA and ΔB, the view's delta is
  *
  *   ΔV = ΔA ⋈ (B ∪ ΔB)  ∪  A ⋈ ΔB
  *
  * (the standard derivation: (A∪ΔA)⋈(B∪ΔB) = A⋈B ∪ ΔA⋈B' ∪ A⋈ΔB with
  * B' the new B — each joint pair lands in exactly one term, so the
  * union is disjoint and needs no dedup), and the refreshed view is
  * V ∪ ΔV by plain append.
  *
  * Scale shape: the full A⋈B never recomputes — both delta joins are
  * DELTA-sized on one side, so a daily refresh of a 100 TB view costs
  * the day's data joined against the base (and Spark broadcasts the
  * delta side whenever it fits, turning each term into a map-only
  * probe of the big table). This is the view-refresh half of the
  * lakehouse story: the change feed ([[graft.sinks.DataSkipping.changesBetween]])
  * supplies ΔA/ΔB, this computes what to append downstream.
  *
  * Insert-only deltas by contract (the dominant fact-table case);
  * update/delete streams route through [[CdcApply]] first to produce
  * the net insert image. Non-key column names must be DISJOINT across
  * the two sides (the standard join-view shape) — a shared name would
  * make the joined schema ambiguous.
  */
object ViewMaintenance {

  /** The view delta ΔV for insert deltas against base tables, joined
    * on `keys` (inner equi-join — the materialized-view shape).
    */
  def incrementalJoinDelta(oldA: DataFrame, deltaA: DataFrame,
      oldB: DataFrame, deltaB: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "join keys must be non-empty")
    deltaA.join(oldB.unionByName(deltaB), keys)
      .unionByName(oldA.join(deltaB, keys))
  }
}
