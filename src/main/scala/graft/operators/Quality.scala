package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint report (the expectations/audit
  * pattern: "this load is trusted only if these hold" — the reference
  * enforces its own versions imperatively as the pre-load constraint
  * hooks of `reports_exporter_v0.83.py:1390-1420` and the 400k row
  * threshold; this is that idea as ONE declarative operator whose
  * output is itself a queryable table).
  *
  * Scale shape: every scan-expressible constraint — row count,
  * per-column null counts, exact distinct counts, arbitrary
  * violation predicates — computes in ONE pass over the table (a
  * single aggregate row, melted to the tall (constraint, value)
  * report by a literal-array explode, which never shuffles).
  * Distinct counts ride the same aggregate via Catalyst's Expand
  * rewrite, so adding a uniqueness check never adds a scan. Each
  * foreign-key check is a broadcast LEFT ANTI join probing the
  * dimension's distinct keys — the fact side never shuffles, the
  * dim side is dimension-sized by definition. Total cost at 100 TB:
  * one fact scan + one dim scan per FK, regardless of how many
  * constraints share them.
  */
object Quality {

  /** The tall constraint report: one row per constraint,
    * `(constraint: String, value: Long, pass: Boolean)`.
    *
    * @param notNull    columns whose null count must be 0
    * @param unique     columns whose exact distinct count must equal
    *                   the row count
    * @param violations named predicates marking a VIOLATING row; the
    *                   reported value is the violating-row count,
    *                   pass = (count == 0)
    * @param fks        (leftCol, dim, dimCol): rows whose leftCol has
    *                   no match among dim.dimCol (orphans); NULL left
    *                   keys are not orphans (SQL FK convention)
    */
  def report(df: DataFrame,
      notNull: Seq[String] = Nil,
      unique: Seq[String] = Nil,
      violations: Seq[(String, Column)] = Nil,
      fks: Seq[(String, DataFrame, String)] = Nil): DataFrame = {
    val aggs: Seq[(String, Column, Column => Column)] =
      (("row_count", count(lit(1)), (_: Column) => lit(true))) +:
      (notNull.map(c =>
        (s"null_count:$c", count(when(col(c).isNull, lit(1))),
          (v: Column) => v === 0L)) ++
       unique.map(c =>
        (s"distinct_count:$c", countDistinct(col(c)),
          // uniqueness = distinct == non-null row count is the caller's
          // reading; the report pins distinct == row_count (strict: a
          // unique key must also be total)
          (v: Column) => v === col("__c0"))) ++
       violations.map { case (name, pred) =>
        (s"violations:$name", count(when(pred, lit(1))),
          (v: Column) => v === 0L)
       })
    val row = df.agg(aggs.head._2.as("__c0"),
      aggs.tail.zipWithIndex.map { case ((_, c, _), i) => c.as(s"__c${i + 1}") }: _*)
    val melted = row.select(explode(array(
      aggs.zipWithIndex.map { case ((name, _, passOf), i) =>
        struct(lit(name).as("constraint"),
          col(s"__c$i").cast("long").as("value"),
          passOf(col(s"__c$i")).as("pass"))
      }: _*)).as("r")).select(col("r.*"))
    val fkRows = fks.map { case (leftCol, dim, dimCol) =>
      df.select(col(leftCol))
        .filter(col(leftCol).isNotNull)
        .join(broadcast(dim.select(col(dimCol).as(leftCol)).distinct()),
          Seq(leftCol), "left_anti")
        .agg(count(lit(1)).as("value"))
        .select(lit(s"fk_orphans:$leftCol").as("constraint"),
          col("value").cast("long").as("value"),
          (col("value") === 0L).as("pass"))
    }
    fkRows.foldLeft(melted)(_ unionByName _)
  }
}
