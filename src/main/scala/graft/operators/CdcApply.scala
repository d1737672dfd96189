package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC batch apply — roll a keyed snapshot forward by a change batch.
  *
  * The write-side complement of [[graft.llm.Dedup.snapshotDiff]]: where
  * the diff derives (added / removed / changed) from two full snapshots,
  * this applies a batch of keyed operations (`upsert` / `delete`, each
  * with a sequence number) to the CURRENT snapshot and produces the next
  * one — the MERGE INTO shape every incremental corpus maintains instead
  * of rewriting 100 TB per refresh. (The reference refreshes state by
  * delete-day-then-reload, `reports_exporter_v0.83.py:599-603` — the
  * whole-partition special case of this operator.)
  *
  * Semantics:
  *  - multiple ops for one key are collapsed keep-last by `seqCol`
  *    (an upsert after a delete re-creates the row; a delete after
  *    upserts removes it) — the batch is a log, not a set;
  *  - `upsert` inserts or fully replaces the keyed row;
  *  - `delete` removes it (absent keys are a no-op, as in SQL MERGE);
  *  - any other op value fails the job loudly (`raise_error` inside the
  *    scan — a typo'd op must never silently drop a row);
  *  - a NULL key column in `changes` fails the same way: NULL never
  *    matches the anti-join (plain equality, not null-safe), so a
  *    malformed feed would otherwise insert NULL-keyed rows into the
  *    next snapshot instead of failing.
  *
  * Precondition (as [[graft.llm.Sampling.packSequences]] states for ids):
  * (`idCols`, `seqCol`) pairs are unique within the batch — CDC sequence
  * numbers are unique per key by construction in any log-derived feed;
  * ties would make "last" arbitrary. `opCol` is the final tiebreaker so
  * even a violating feed stays deterministic (delete loses to upsert at
  * equal seq).
  *
  * Scale shape: the change batch (CDC batches are minutes of writes —
  * orders of magnitude smaller than the snapshot) pays one batch-sized
  * shuffle for the keep-last window; the snapshot pays ONE left-anti
  * join on the key — broadcast when the batch is small (AQE picks it up
  * at runtime), so in the common case the snapshot NEVER shuffles and
  * the apply is a map-side filter plus a plan-level union. Chained
  * applies (batch after batch) each touch only their own batch plus one
  * snapshot pass — the point of CDC over full-snapshot rewrites.
  */
object CdcApply {

  /** Collapse a change log to its final op per key: keep-last by
    * (`seqCol`, `opCol`) within `idCols`.
    */
  def latestOps(changes: DataFrame, idCols: Seq[String], seqCol: String,
      opCol: String): DataFrame = {
    val w = Window.partitionBy(idCols.map(col).toIndexedSeq: _*)
      .orderBy(col(seqCol).desc, col(opCol).desc)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Apply `changes` to `snapshot` and return the next snapshot (same
    * schema as `snapshot`).
    *
    * @param snapshot current state, one row per key
    * @param changes  op log carrying `opCol` ("upsert" | "delete"),
    *   `seqCol`, and for upserts every `snapshot` column; delete rows may
    *   carry NULL payload columns
    */
  def rollForward(snapshot: DataFrame, changes: DataFrame,
      idCols: Seq[String], seqCol: String = "seq",
      opCol: String = "op"): DataFrame = {
    require(idCols.nonEmpty, "rollForward needs at least one key column")
    val dataCols = snapshot.columns.toSeq
    require(!dataCols.contains(seqCol) && !dataCols.contains(opCol),
      s"snapshot columns may not include '$seqCol'/'$opCol'")
    val anyIdNull = idCols.map(col(_).isNull).reduce(_ || _)
    val checked = changes.withColumn(opCol,
      when(anyIdNull, raise_error(lit(
          s"CdcApply: NULL key column (one of ${idCols.mkString(", ")})")))
        .when(col(opCol).isin("upsert", "delete"), col(opCol))
        .otherwise(raise_error(concat(
          lit("CdcApply: unknown op '"), col(opCol), lit("'")))))
    val last = latestOps(checked, idCols, seqCol, opCol)
    val survivors = snapshot.join(
      last.select(idCols.map(col).toIndexedSeq: _*), idCols, "left_anti")
    val upserts = last.filter(col(opCol) === "upsert")
      .select(dataCols.map(col).toIndexedSeq: _*)
    survivors.unionByName(upserts)
  }
}
