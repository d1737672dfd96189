package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-cleaning operators from the reference's reader stage.
  *
  * Reference: jfitam/train-reports-etl `reports_exporter_v0.83.py`
  *  - empty-string normalization  :997-998 (and the buggy :739-740, :1212-1213
  *    variants — we implement the *intent*: normalize in every reader)
  *  - not-null split with reject capture :593-603, :966-983, :1167-1184
  *
  * All pure Column expressions → whole-stage codegen, filters push down to
  * the scan. The not-null split is the one place the reference reuses a scan
  * for two outputs; at 100 TB the caller should persist the cleaned frame
  * before forking good/rejected, which [[NotNullSplit.apply]] leaves to the
  * caller (persistence policy is a pipeline decision, not an operator one).
  */
object Cleaning {

  /** Column ref that survives names containing dots (Excel-ish headers like
    * "Passengers Inc. Infants"): `col` parses dots as struct access unless
    * backquoted.
    */
  def qcol(name: String): Column =
    col(if (name.contains(".")) s"`$name`" else name)

  /** `""` and `" "` → NULL over the given columns (reference P4).
    * Exact-literal semantics, not a trim: the reference only normalizes
    * these two values (`reports_exporter_v0.83.py:997-998`).
    */
  def emptyToNull(df: DataFrame, cols: Seq[String]): DataFrame = {
    val colSet = cols.toSet
    df.select(df.columns.map { c =>
      if (colSet(c)) {
        val x = qcol(c)
        when(x === "" || x === " ", lit(null)).otherwise(x).as(c)
      } else qcol(c)
    }.toIndexedSeq: _*)
  }

  /** Predicate: every mandatory column non-null. */
  def allNotNull(mandatory: Seq[String]): Column =
    mandatory.map(qcol(_).isNotNull).reduce(_ && _)

  /** Split into (good, rejected) on the mandatory-column predicate
    * (reference P2). Two lazy filters over one parent — cache the parent
    * at the call site when both sides are materialized.
    */
  def notNullSplit(df: DataFrame, mandatory: Seq[String]): (DataFrame, DataFrame) = {
    val pred = allNotNull(mandatory)
    (df.filter(pred), df.filter(!pred))
  }

  /** Bulk positional rename (reference P6, `df.toDF` semantics). */
  def renameAll(df: DataFrame, newNames: Seq[String]): DataFrame = {
    require(newNames.length == df.columns.length,
      s"rename arity mismatch: ${df.columns.length} cols, ${newNames.length} names")
    df.toDF(newNames: _*)
  }
}
