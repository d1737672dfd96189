package graft.sinks

import java.io.InputStream
import java.nio.charset.StandardCharsets
import java.sql.Connection

import org.apache.spark.sql.{DataFrame, Row}

/** K4 — PostgreSQL bulk load via `COPY ... FROM STDIN WITH (FORMAT csv)`,
  * the reference's load protocol (`reports_exporter_v0.83.py:1357-1372`,
  * psycopg2 `copy_expert`; chosen over row INSERTs in changelog v0.7,
  * `:68-69`).
  *
  * Spark's JDBC writer issues batched INSERTs; COPY streams raw CSV
  * through a single protocol message per partition — the fastest path
  * into Postgres. The write is distributed: each partition opens its own
  * connection and streams its rows through a constant-memory
  * row→CSV InputStream (no partition-sized buffer).
  *
  * The container has neither a Postgres server nor the pgjdbc driver jar,
  * so the driver adapter ([[PgCopy.PgDriverCopyApi]]) resolves
  * `org.postgresql.copy.CopyManager` reflectively at runtime; everything
  * above that seam — the COPY statement, the CSV framing (quoting, NULL
  * encoding, timestamp text), the streaming, the per-partition protocol —
  * is pure and unit-tested against a fake [[PgCopy.CopyApi]].
  */
object PgCopy {

  /** The seam: how a CSV byte stream reaches the database. Implementations
    * must be serializable — the api object ships to executors.
    */
  trait CopyApi extends Serializable {
    /** Stream `data` through `COPY` on `conn`; returns rows loaded. */
    def copyIn(conn: Connection, sql: String, data: InputStream): Long
  }

  /** Production adapter: pgjdbc's CopyManager, resolved reflectively so
    * this compiles (and the rest of the engine tests) without the driver
    * jar on the classpath. Equivalent to
    * `new CopyManager(conn.unwrap(BaseConnection)).copyIn(sql, data)`.
    */
  object PgDriverCopyApi extends CopyApi {
    def copyIn(conn: Connection, sql: String, data: InputStream): Long = {
      val bc = Class.forName("org.postgresql.core.BaseConnection")
      val cm = Class.forName("org.postgresql.copy.CopyManager")
      val mgr = cm.getConstructor(bc)
        .newInstance(conn.unwrap(bc.asInstanceOf[Class[AnyRef]]))
      cm.getMethod("copyIn", classOf[String], classOf[InputStream])
        .invoke(mgr, sql, data).asInstanceOf[java.lang.Long].longValue()
    }
  }

  /** The COPY statement. CSV format: default delimiter `,`, default quote
    * `"`, unquoted empty field = NULL, quoted `""` = empty string — the
    * exact framing [[encodeField]] emits.
    *
    * Column names are quote-escaped (they come from DataFrame schemas,
    * i.e. data-adjacent); `table` is interpolated verbatim because it is
    * a possibly schema-qualified identifier path (`"AFC".train_list`)
    * from the deployment's schema registry — same contract as
    * [[graft.sources.Jdbc.Sql]]: never pass user input as a table name.
    */
  def copySql(table: String, cols: Seq[String]): String =
    cols.map(c => "\"" + c.replace("\"", "\"\"") + "\"")
      .mkString(s"COPY $table (", ", ", ") FROM STDIN WITH (FORMAT csv)")

  /** One CSV field under COPY's csv rules:
    *  - SQL NULL → unquoted empty field;
    *  - empty string → `""` (quoted, so it stays a string, not NULL);
    *  - delimiter / quote / CR / LF trigger quoting, embedded quotes
    *    double;
    *  - timestamps/dates render as their JDBC text form
    *    (`yyyy-mm-dd hh:mm:ss.f`), which Postgres parses natively;
    *  - binary → Postgres bytea hex input (`\xDEADBEEF`);
    *  - numbers/booleans via toString;
    *  - anything else (array/map/struct cells) REJECTS: a toString
    *    fallthrough would stream `[B@1f2a3b`-style garbage into the
    *    target table — fail on the first row instead (ADVICE r3).
    */
  def encodeField(v: Any): String = v match {
    case null => ""
    case s: String => quote(s)
    case ts: java.sql.Timestamp => ts.toString
    case d: java.sql.Date => d.toString
    case i: java.time.Instant => java.sql.Timestamp.from(i).toString
    case d: java.time.LocalDate => d.toString
    case b: Array[Byte] => b.map(x => f"${x & 0xff}%02x").mkString("\\x", "", "")
    case n: java.lang.Number => n.toString
    case b: java.lang.Boolean => b.toString
    case other => throw new IllegalArgumentException(
      s"PgCopy cannot encode a ${other.getClass.getName} cell — COPY columns " +
        "must be scalar (string/number/boolean/date/timestamp/binary); " +
        "project arrays/maps/structs to scalars before the load")
  }

  private def quote(s: String): String =
    if (s.isEmpty) "\"\""
    else if (s.indexOf(',') < 0 && s.indexOf('"') < 0 &&
             s.indexOf('\n') < 0 && s.indexOf('\r') < 0) s
    else "\"" + s.replace("\"", "\"\"") + "\""

  /** One COPY line (no terminator). */
  def encodeRow(row: Row): String = {
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < row.length) {
      if (i > 0) sb.append(',')
      sb.append(encodeField(if (row.isNullAt(i)) null else row.get(i)))
      i += 1
    }
    sb.toString
  }

  /** Constant-memory adapter from a partition's row iterator to the
    * InputStream CopyManager consumes: one encoded line buffered at a
    * time, pulled on demand — a 10 GB partition streams in O(row) memory.
    */
  final class RowsCsvInputStream(rows: Iterator[Row]) extends InputStream {
    private var buf: Array[Byte] = Array.emptyByteArray
    private var pos = 0

    private def ensure(): Boolean = {
      while (pos >= buf.length) {
        if (!rows.hasNext) return false
        buf = (encodeRow(rows.next()) + "\n").getBytes(StandardCharsets.UTF_8)
        pos = 0
      }
      true
    }

    override def read(): Int =
      if (!ensure()) -1
      else { val b = buf(pos) & 0xff; pos += 1; b }

    override def read(b: Array[Byte], off: Int, len: Int): Int =
      if (len == 0) 0
      else if (!ensure()) -1
      else {
        val n = math.min(len, buf.length - pos)
        System.arraycopy(buf, pos, b, off, n)
        pos += n
        n
      }
  }

  /** Distributed COPY load: one connection + one transactional COPY per
    * non-empty partition, rows streamed. Returns total rows loaded (from
    * the database's own COPY row counts, summed via accumulator).
    *
    * Each partition's COPY runs with autocommit off and commits only
    * after the stream completes, so a task that dies mid-COPY rolls its
    * rows back and the retry starts clean. A task that dies BETWEEN
    * commit and task-success report can still be re-run by Spark and
    * duplicate its partition — exactly-once needs a staging table or a
    * partition-id dedup column on top of this protocol; the enclosing
    * delete-then-load makes whole-RUN retries idempotent either way.
    *
    * `connFactory` and `api` ship to executors; the factory should build
    * the connection from captured config (url/props), not capture one.
    */
  def copyLoad(df: DataFrame, table: String,
      connFactory: () => Connection, api: CopyApi = PgDriverCopyApi): Long = {
    val sql = copySql(table, df.columns.toSeq)
    val acc = df.sparkSession.sparkContext.longAccumulator("pg_copy_rows")
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val conn = connFactory()
        try {
          conn.setAutoCommit(false)
          try {
            val n = api.copyIn(conn, sql, new RowsCsvInputStream(it))
            conn.commit()
            acc.add(n)
          } catch {
            case e: Throwable =>
              try conn.rollback() catch { case _: Exception => () }
              throw e
          }
        } finally if (conn != null) conn.close()
      }
    }
    acc.value
  }
}
