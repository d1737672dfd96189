package graft.sources

import java.sql.Connection
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC sources and the partition-overwrite load protocol (SURVEY §2.1
  * S7-S9, §2.2 K4-K7, K10).
  *
  * The container has no PostgreSQL server, so the COPY byte stream is
  * the one seam a first deploy exercises blind (scripts/pg_smoke.sh);
  * everything else — reads, the full delete→append→audit→constraint
  * protocol — runs END TO END against embedded Derby in JdbcSpec over a
  * real JDBC driver. The SQL builders are additionally pure and
  * string-tested, and the sequencing mirrors the reference exactly
  * (`reports_exporter_v0.83.py:1304-1394, 1801-1817`). The file-backed
  * equivalent (graft.sinks.PartitionOverwriteSink) carries the same
  * semantics for parquet targets.
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

  /** K7 wiring — the constraint drop/recreate hooks around a bulk load.
    * `active` iff the batch STRICTLY exceeds the threshold (reference
    * `:1801`: `df.shape[0] > rows_threshold_constraint_removal`); the
    * caller supplies `rows` (it already knows its batch size — no
    * hidden count job). The two statements are opaque dialect strings:
    * on PostgreSQL render them with [[Sql.dropConstraints]]/
    * [[Sql.recreateConstraints]] (`SELECT fn(...)`); other engines use
    * their own invocation form (e.g. Derby `CALL proc(...)`, which is
    * how JdbcSpec live-executes the protocol end-to-end).
    */
  final case class ConstraintHooks(dropSql: String, recreateSql: String,
      rows: Long, threshold: Long = Sql.BulkLoadThreshold) {
    def active: Boolean = rows > threshold
  }

  private def execStatements(connFactory: () => Connection, sqls: Seq[String]): Unit = {
    val conn = connFactory()
    try {
      val st = conn.createStatement()
      try sqls.foreach(st.execute(_)) finally st.close()
    } finally conn.close()
  }

  /** K4-K7 — the delete-then-load protocol against a JDBC sink: optional
    * constraint DROP (big batches only), per-streak ranged DELETEs, the
    * bulk append, per-day audit rows, then the constraint RECREATE —
    * the sequencing of `export_train_list` under `export_report`
    * (`reports_exporter_v0.83.py:1304-1394, 1801-1817`: the hooks wrap
    * the WHOLE export, deletes included). The DELETE/audit/hook
    * statements run on driver connections; only the bulk append is
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
      copy: Option[graft.sinks.PgCopy.CopyApi] = None,
      hooks: Option[ConstraintHooks] = None): Unit = {
    val armed = hooks.filter(_.active)
    armed.foreach(h => execStatements(connFactory, Seq(h.dropSql)))

    execStatements(connFactory,
      streaks.map { case (a, b) => Sql.deleteRange(table, dateCol, a, b) })

    copy match {
      case Some(api) => graft.sinks.PgCopy.copyLoad(df, table, connFactory, api)
      case None => df.write.mode(SaveMode.Append).jdbc(url, table, props)
    }

    execStatements(connFactory,
      days.map(d => Sql.auditInsert(auditTable, runStamp, table, "overwrite", d, user)))

    armed.foreach(h => execStatements(connFactory, Seq(h.recreateSql)))
  }
}
