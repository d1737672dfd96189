package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{LlmQueries, ReaderQueries, Relational, StreamingQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] demonstrates one operator from SURVEY.md §2
  * (or a training-data-pipeline extension) over the driver's testdata, and
  * [[oracleSql]] carries the equivalent DuckDB SQL for the correctness gate.
  */
object SparkEntry {

  private val groups: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.queries, Relational.oracles),
      (ReaderQueries.queries, ReaderQueries.oracles),
      (LlmQueries.queries, LlmQueries.oracles),
      (StreamingQueries.queries, StreamingQueries.oracles)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The Train List reader is the engine's richest chain: all-string read →
    * coercion → mandatory split → broadcast dim join → rollover/service
    * derives → min-per-ticket enrichment → rename.
    */
  def entry(spark: SparkSession): DataFrame =
    ReaderQueries.queries("q23_trainlist_reader")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    groups.iterator.map(_._2).reduce(_ ++ _)
}
