package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-drift ingestion for long-lived corpora.
  *
  * A corpus written over months accretes columns: early shards carry
  * (doc_id, text), later ones add lang, quality, license tags. At 100 TB
  * nobody rewrites the old shards — the reader has to reconcile. Parquet
  * is self-describing per file, so reconciliation is metadata-only:
  * union the footers' schemas, read absent columns as NULL, and never
  * touch row data (reference: the reference engine re-reads whole
  * sheets per layout change, `reports_exporter_v0.83.py:522-528`; the
  * Spark-native form is a footer merge).
  *
  * Two forms, same semantics:
  *  - [[readMerged]]: one scan over a directory tree of drifted shards
  *    (`mergeSchema` — Spark unions footer schemas at planning time;
  *    each file then reads only the columns it has, NULL-filling the
  *    rest per-batch in the vectorized reader).
  *  - [[unionEvolved]]: the already-loaded-frames form (`unionByName`
  *    with `allowMissingColumns`) for batches arriving through
  *    different readers.
  *
  * Scale notes: `mergeSchema` reads EVERY file footer at planning time
  * (a distributed job over footers, not data — but at millions of files
  * still a cost); a production corpus should additionally register the
  * merged schema in a catalog so steady-state reads skip the sweep.
  * Drift is append-only here: a column that changes TYPE across shards
  * fails the footer merge loudly (Parquet refuses int↔string merges) —
  * that is the correct behavior; type migrations are a rewrite, not a
  * read-time patch.
  */
object SchemaDrift {

  /** Read a directory tree of parquet shards whose schemas drifted by
    * column ADDITION, as one frame with the union schema (absent
    * columns NULL).
    */
  def readMerged(spark: SparkSession, root: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(root)

  /** Union already-loaded drifted batches by column NAME (never
    * position), NULL-filling columns a batch lacks. Fails on empty
    * input — there is no sensible schema for a union of nothing.
    */
  def unionEvolved(batches: Seq[DataFrame]): DataFrame = {
    require(batches.nonEmpty, "unionEvolved needs at least one batch")
    batches.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Audit artifact: one row per column name across `old` and `new`
    * schemas with its status — `added`, `removed`, `retyped`, or
    * `unchanged` — the pre-flight a pipeline runs before accepting a
    * new shard generation. Purely driver-side metadata (schemas, never
    * data).
    */
  def schemaDiff(spark: SparkSession, oldDf: DataFrame, newDf: DataFrame): DataFrame = {
    import spark.implicits._
    val o = oldDf.schema.map(f => f.name -> f.dataType.sql).toMap
    val n = newDf.schema.map(f => f.name -> f.dataType.sql).toMap
    (o.keySet ++ n.keySet).toSeq.sorted.map { c =>
      val status = (o.get(c), n.get(c)) match {
        case (None, Some(_))                  => "added"
        case (Some(_), None)                  => "removed"
        case (Some(a), Some(b)) if a != b     => "retyped"
        case _                                => "unchanged"
      }
      (c, o.getOrElse(c, ""), n.getOrElse(c, ""), status)
    }.toDF("column", "old_type", "new_type", "status")
  }
}
