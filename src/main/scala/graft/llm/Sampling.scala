package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic dataset sampling/splitting for training pipelines.
  *
  * Everything is keyed on portable content/id hashes, never `rand()`:
  * the same document lands in the same split on every engine, run,
  * task retry, and backfill — the property that keeps train/val
  * contamination auditable at 100 TB (and these results oracle-gated).
  */
object Sampling {

  /** Stable split assignment: the id's md5-prefix hash mod 100 picks a
    * percent bucket, and cumulative fraction bounds map buckets to split
    * names. `splits` are (name, percent) pairs summing to 100, e.g.
    * `Seq(("train", 98), ("val", 1), ("test", 1))`.
    */
  def splitAssign(id: Column, splits: Seq[(String, Int)]): Column = {
    require(splits.nonEmpty && splits.forall(_._2 > 0) && splits.map(_._2).sum == 100,
      "split percents must be positive and total 100")
    val bucket = Dedup.hash32(id.cast("string")) % 100
    val bounds = splits.scanLeft(0) { case (acc, (_, p)) => acc + p }.tail
    splits.map(_._1).zip(bounds).init.foldRight(lit(splits.last._1): Column) {
      case ((name, ub), els) => when(bucket < ub, lit(name)).otherwise(els)
    }
  }

  /** Deterministic subsample gate: keep ~`percent`% of rows, hash-keyed
    * on the id (stable under retries; composable with [[splitAssign]]).
    */
  def sampleGate(id: Column, percent: Int): Column = {
    require(percent >= 0 && percent <= 100, "percent in [0, 100]")
    Dedup.hash32(id.cast("string")) % 100 < percent
  }
}
