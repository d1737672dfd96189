package graft.sources

import java.sql.Connection
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC sources and the partition-overwrite load protocol (SURVEY §2.1
  * S7-S9, §2.2 K4-K7, K10).
  *
  * The container has no database, so nothing here is exercised by the
  * oracle gate; the SQL-building logic is pure and unit-tested, and the
  * protocol sequencing mirrors the reference exactly
  * (`reports_exporter_v0.83.py:1304-1394`). The file-backed equivalent
  * (graft.sinks.PartitionOverwriteSink) carries the tested semantics.
  */
object Jdbc {

  /** S7 — full dimension read. Small dims should be wrapped in
    * `broadcast()` at the join site (J1).
    */
  def dimTable(spark: SparkSession, url: String, table: String,
      props: Properties = new Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** S8 — aggregation pushdown read: ship the aggregating query to the
    * database (the reference's min-per-ticket IN-list). At scale prefer
    * reading the table and aggregating distributed
    * (graft.enrich.Enrichment.firstTimestamp) — the IN-list a driver can
    * build is bounded; a semi-join is not.
    */
  def pushdownQuery(spark: SparkSession, url: String, query: String,
      props: Properties = new Properties): DataFrame =
    spark.read.jdbc(url, s"($query) pushed", props)

  /** S9/K10/C1 — version read + conditional registration, driver-side. */
  def currentVersion(conn: Connection, table: String): Double = {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(s"SELECT MAX(version) FROM $table")
      if (rs.next()) rs.getDouble(1) else 0.0
    } finally st.close()
  }

  /** K4-K7 protocol SQL — pure builders, one string per statement, so the
    * sequencing is testable without a database. Identifiers are expected
    * to come from the schema registry (not user input).
    */
  object Sql {
    /** K5 — ranged partition delete per consecutive-date streak. */
    def deleteRange(table: String, dateCol: String, from: String, to: String): String =
      s"""DELETE FROM $table WHERE "$dateCol" BETWEEN '$from' AND '$to'"""

    /** K5 — single-day delete keyed on a timestamp column's date, in
      * the reference's Postgres dialect (`to_char`,
      * `reports_exporter_v0.83.py:1421-1434`). Untestable without PG;
      * prefer [[deleteDayAnsi]] unless byte-for-byte reference parity
      * of the emitted SQL matters.
      */
    def deleteDay(table: String, tsCol: String, day: String): String =
      s"""DELETE FROM $table WHERE to_char("$tsCol", 'yyyy-mm-dd') = '$day'"""

    /** K5 — the same single-day delete in portable ANSI form (CAST on
      * both sides; Derby rejects the `DATE '...'` literal keyword):
      * semantically identical on Postgres, and executable against
      * embedded Derby — so THIS variant is live-tested (JdbcSpec),
      * unlike the dialect-pinned [[deleteDay]].
      */
    def deleteDayAnsi(table: String, tsCol: String, day: String): String =
      s"""DELETE FROM $table WHERE CAST("$tsCol" AS DATE) = CAST('$day' AS DATE)"""

    /** K5 — snapshot-scoped delete (occupancy: only today's snapshot). */
    def deleteSnapshotRange(table: String, dateCol: String, from: String, to: String,
        snapshotCol: String, snapshotDay: String): String =
      s"""DELETE FROM $table WHERE "$dateCol" BETWEEN '$from' AND '$to'""" +
        s""" AND "$snapshotCol" = '$snapshotDay'"""

    /** K6 — per-day audit row. */
    def auditInsert(auditTable: String, runStamp: String, table: String,
        operation: String, period: String, user: String): String =
      s"""INSERT INTO $auditTable ("timestamp", "table", operation, period, "user")""" +
        s""" VALUES ('$runStamp', '$table', '$operation', '$period', '$user')"""

    /** K7 — constraint drop/recreate hooks around bulk loads above the
      * row threshold (reference 400,000, `:155, :1801-1817`).
      */
    val BulkLoadThreshold = 400000L
    def dropConstraints(fn: String, schema: String, table: String): String =
      s"SELECT $fn('$schema', '$table')"
    def recreateConstraints(fn: String): String = s"SELECT $fn()"
  }

  /** K4-K6 — the delete-then-load protocol against a JDBC sink: per-streak
    * ranged DELETEs, the bulk append, then per-day audit rows — the
    * sequencing of `export_train_list` (`:1304-1394`). The DELETE/audit
    * statements run on the driver connection; only the bulk append is
    * distributed.
    *
    * The append path is selected by `copy`: `Some(api)` streams each
    * partition through `COPY ... FROM STDIN` (the reference's protocol,
    * [[graft.sinks.PgCopy]]); `None` falls back to Spark's batched-INSERT
    * JDBC writer (portable to any JDBC sink).
    */
  def partitionOverwriteLoad(df: DataFrame, url: String, table: String,
      dateCol: String, streaks: Seq[(String, String)], days: Seq[String],
      auditTable: String, runStamp: String, user: String,
      props: Properties, connFactory: () => Connection,
      copy: Option[graft.sinks.PgCopy.CopyApi] = None): Unit = {
    val conn = connFactory()
    try {
      val st = conn.createStatement()
      streaks.foreach { case (a, b) => st.execute(Sql.deleteRange(table, dateCol, a, b)) }
      st.close()
    } finally conn.close()

    copy match {
      case Some(api) => graft.sinks.PgCopy.copyLoad(df, table, connFactory, api)
      case None => df.write.mode(SaveMode.Append).jdbc(url, table, props)
    }

    val conn2 = connFactory()
    try {
      val st = conn2.createStatement()
      days.foreach(d => st.execute(Sql.auditInsert(auditTable, runStamp, table, "overwrite", d, user)))
      st.close()
    } finally conn2.close()
  }
}
