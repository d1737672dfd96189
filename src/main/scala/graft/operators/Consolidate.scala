package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Batch consolidation (reference O1 + O2 + D1).
  *
  * Reference: `reports_exporter_v0.83.py:1732-1787` — concat all (file,
  * sheet) frames of a report type, sort ascending by the report's keys,
  * keep-last dedup with duplicate capture.
  *
  * `unionByName` keeps the plan a single scan-union Catalyst node, so
  * downstream filters/pruning push into every branch. The reference's
  * global sort is NOT reproduced here (see [[KeepLastDedup]] scaladoc) —
  * ordering only feeds the dedup window and the sink.
  */
object Consolidate {

  def union(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "empty batch (reference P3 guard)")
    dfs.reduce(_.unionByName(_))
  }

  /** union → keep-last dedup; returns (kept, dups). `dedupKeys` empty means
    * "no dedup" (the reference's BPD path, `:1767-1768`).
    */
  def apply(dfs: Seq[DataFrame], dedupKeys: Seq[String], ordering: Seq[Column])
      : (DataFrame, DataFrame) = {
    val u = union(dfs)
    if (dedupKeys.isEmpty) (u, u.limit(0))
    else KeepLastDedup(u, dedupKeys, ordering)
  }
}
