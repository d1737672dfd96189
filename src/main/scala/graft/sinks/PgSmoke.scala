package graft.sinks

import java.io.InputStream
import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.SparkSession

import graft.sources.Jdbc

/** Deploy-day smoke for the PG load path (`scripts/pg_smoke.sh` runs
  * this): the one inch the sandbox cannot test is
  * [[PgCopy.PgDriverCopyApi]]'s reflective call against a REAL pgjdbc
  * `CopyManager` speaking the real wire protocol — everything else
  * (CSV framing, protocol sequencing, per-partition streaming) is
  * unit-tested against fakes (`PgCopySpec`) and live-sequenced on
  * embedded Derby (`JdbcSpec`). Run this once against the deployment's
  * Postgres before first go-live (`reports_exporter_v0.83.py:1304-1394`
  * is the protocol being cleared for production).
  *
  * Two phases, both leaving no state behind (scratch tables created
  * and dropped inside the run):
  *
  *  1. FRAMING — COPY-loads 4 hostile rows (NULL vs empty string,
  *     embedded quotes/commas/newlines, fractional-second timestamp)
  *     from 2 partitions (2 COPY messages, one commit each), reads
  *     them back, asserts every framing case round-tripped.
  *  2. PROTOCOL (K4–K7) — the full delete-then-load sequence via
  *     [[Jdbc.partitionOverwriteLoad]]: constraint DROP (real ALTER
  *     TABLE, armed), per-streak ranged DELETEs, the COPY bulk append,
  *     per-day audit inserts, constraint RECREATE — run TWICE to prove
  *     whole-run idempotence (no duplicate rows, no PK violation on
  *     the reload), then asserts the recreated PK actually enforces
  *     (a duplicate insert must fail).
  *
  * DRY-RUN mode (`--dry-run`, exercised by the test suite and by
  * `scripts/pg_smoke.sh --dry-run`): the identical two phases against
  * in-memory Derby, with [[CsvInsertCopyApi]] — a CopyApi that parses
  * the exact CSV byte stream under COPY's csv rules and applies it as
  * transactional JDBC inserts — standing in for the PG wire. It proves
  * the HARNESS end to end (framing, sequencing, assertions, cleanup),
  * so a deploy-day run only adds the one untested seam: pgjdbc's
  * CopyManager itself.
  */
object PgSmoke {

  /** Signature-exact CopyApi test double for the dry run: parses the
    * COPY statement for table/columns and the stream under COPY csv
    * rules (quotes doubled, unquoted empty = NULL, quoted empty =
    * empty string, newlines legal inside quotes) and applies the rows
    * as JDBC inserts on the SAME connection/transaction the real
    * CopyManager would use — commit/rollback semantics identical.
    */
  object CsvInsertCopyApi extends PgCopy.CopyApi {
    private val CopyRe =
      """COPY (\S+) \(([^)]*)\) FROM STDIN WITH \(FORMAT csv\)""".r
    def copyIn(conn: Connection, sql: String, data: InputStream): Long = {
      val (table, cols) = sql match {
        case CopyRe(t, cs) =>
          (t, cs.split(", ").map(_.stripPrefix("\"").stripSuffix("\"")).toSeq)
        case _ => throw new IllegalArgumentException(s"unparsable COPY sql: $sql")
      }
      val text = scala.io.Source.fromInputStream(data, "UTF-8").mkString
      val rows = parseCsv(text)
      val ps = conn.prepareStatement(
        s"INSERT INTO $table (${cols.map("\"" + _ + "\"").mkString(", ")}) " +
          s"VALUES (${cols.map(_ => "?").mkString(", ")})")
      try rows.foreach { r =>
        require(r.length == cols.length,
          s"row arity ${r.length} != ${cols.length} columns")
        r.zipWithIndex.foreach { case (v, i) =>
          if (v == null) ps.setNull(i + 1, java.sql.Types.VARCHAR)
          else ps.setString(i + 1, v)
        }
        ps.executeUpdate(): Unit
      } finally ps.close()
      rows.length.toLong
    }

    /** COPY csv rules, exactly [[PgCopy.encodeRow]]'s output grammar. */
    private[sinks] def parseCsv(text: String): Vector[Vector[String]] = {
      val rows = Vector.newBuilder[Vector[String]]
      var row = Vector.newBuilder[String]
      val f = new java.lang.StringBuilder
      var quoted = false
      var inQ = false
      def endField(): Unit = {
        row += (if (!quoted && f.length == 0) null else f.toString)
        f.setLength(0); quoted = false
      }
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        if (inQ) {
          if (c == '"') {
            if (i + 1 < text.length && text.charAt(i + 1) == '"') {
              f.append('"'): Unit; i += 1
            } else inQ = false
          } else f.append(c): Unit
        } else c match {
          case '"' if f.length == 0 && !quoted => inQ = true; quoted = true
          case ',' => endField()
          case '\n' => endField(); rows += row.result(); row = Vector.newBuilder
          case other => f.append(other): Unit
        }
        i += 1
      }
      require(!inQ && f.length == 0 && row.result().isEmpty,
        "unterminated CSV row — the encoder terminates every line")
      rows.result()
    }
  }

  /** SQL-type spellings per target engine — the dry run stores
    * everything as VARCHAR (the double parses strings; typing is the
    * server's job on the real wire, which PG's COPY does natively).
    */
  final case class Dialect(idType: String, textType: String, tsType: String,
      tsLit: String => String)
  val PgDialect: Dialect =
    Dialect("BIGINT", "TEXT", "TIMESTAMP", s => s"TIMESTAMP '$s'")
  val DryDialect: Dialect =
    Dialect("VARCHAR(20)", "VARCHAR(200)", "VARCHAR(30)", s => s"'$s'")

  /** Both smoke phases against an arbitrary JDBC target. Returns true
    * iff every assertion held; prints one `phase: detail` line each.
    */
  def run(spark: SparkSession, connFactory: () => Connection,
      api: PgCopy.CopyApi, d: Dialect, table: String): Boolean = {
    require(table.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"table name '$table' must be a plain identifier")
    import spark.implicits._

    def withConn[A](f: Connection => A): A = {
      val c = connFactory(); try f(c) finally c.close()
    }
    def exec(sqls: String*): Unit = withConn { c =>
      val st = c.createStatement()
      try sqls.foreach(st.execute(_): Unit) finally st.close()
    }
    def dropIfExists(t: String): Unit =
      try exec(s"DROP TABLE $t") catch { case _: java.sql.SQLException => () }
    def scalar(sql: String): Long = withConn { c =>
      val rs = c.createStatement().executeQuery(sql)
      rs.next(); rs.getLong(1)
    }

    // ---- phase 1: COPY csv framing round-trip -------------------------
    dropIfExists(table)
    exec(s"""CREATE TABLE $table ("id" ${d.idType}, "payload" ${d.textType}, "ts" ${d.tsType})""")
    val framing = Seq(
      (1L, Option("plain"), Option(java.sql.Timestamp.valueOf("2024-01-02 03:04:05.6"))),
      (2L, Option("comma, \"quote\"\nnewline"), None),
      (3L, Option(""), Option(java.sql.Timestamp.valueOf("2024-06-30 23:59:59"))),
      (4L, Option.empty[String], None))
    val fdf = framing.toDF("id", "payload", "ts").repartition(2)
    val loaded = PgCopy.copyLoad(fdf, table, connFactory, api)
    val framingOk = loaded == 4L &&
      scalar(s"SELECT COUNT(*) FROM $table") == 4L &&
      scalar(s"""SELECT COUNT(*) FROM $table WHERE "payload" IS NULL""") == 1L &&
      scalar(s"""SELECT COUNT(*) FROM $table WHERE "payload" = ''""") == 1L &&
      scalar(s"""SELECT COUNT(*) FROM $table WHERE "payload" LIKE '%"quote"%'""") == 1L &&
      scalar(s"""SELECT COUNT(*) FROM $table WHERE "ts" = """ +
        d.tsLit("2024-01-02 03:04:05.6")) == 1L
    dropIfExists(table)
    println(s"framing: loaded=$loaded ok=$framingOk")

    // ---- phase 2: the full K4-K7 protocol, twice ----------------------
    val tgt = table + "_tgt"
    val audit = table + "_audit"
    dropIfExists(tgt); dropIfExists(audit)
    exec(
      s"""CREATE TABLE $tgt ("id" ${d.idType} NOT NULL, "day" VARCHAR(10),""" +
        s""" "payload" ${d.textType}, CONSTRAINT ${tgt}_pk PRIMARY KEY ("id"))""",
      s"""CREATE TABLE $audit ("timestamp" VARCHAR(30), "table" VARCHAR(60),""" +
        """ operation VARCHAR(20), period VARCHAR(10), "user" VARCHAR(30))""")
    val batch = Seq(
      (1L, "2024-01-01", "a"), (2L, "2024-01-01", "b"),
      (3L, "2024-01-02", "c"), (4L, "2024-01-03", "d"),
      (5L, "2024-01-03", "e"), (6L, "2024-01-05", "gap"))
      .toDF("id", "day", "payload").repartition(2)
    val streaks = Seq(("2024-01-01", "2024-01-03"), ("2024-01-05", "2024-01-05"))
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-05")
    val hooks = Jdbc.ConstraintHooks(
      dropSql = s"ALTER TABLE $tgt DROP CONSTRAINT ${tgt}_pk",
      recreateSql = s"""ALTER TABLE $tgt ADD CONSTRAINT ${tgt}_pk PRIMARY KEY ("id")""",
      rows = Jdbc.Sql.BulkLoadThreshold + 1) // armed: hooks must fire
    def loadOnce(runStamp: String): Unit =
      Jdbc.partitionOverwriteLoad(batch, url = "", table = tgt,
        dateCol = "day", streaks = streaks, days = days,
        auditTable = audit, runStamp = runStamp, user = "graft",
        props = new java.util.Properties, connFactory = connFactory,
        copy = Some(api), hooks = Some(hooks))
    loadOnce("2024-01-06 00:00:00")
    loadOnce("2024-01-06 01:00:00") // the idempotence replay
    val rowsAfter = scalar(s"SELECT COUNT(*) FROM $tgt")
    val auditAfter = scalar(s"SELECT COUNT(*) FROM $audit")
    // the recreated PK must ENFORCE — a duplicate key insert fails
    val pkEnforces =
      try {
        exec(s"""INSERT INTO $tgt ("id", "day", "payload") VALUES ('1', 'x', 'dup')""")
        false
      } catch { case _: java.sql.SQLException => true }
    dropIfExists(tgt); dropIfExists(audit)
    val protocolOk = rowsAfter == 6L && auditAfter == 8L && pkEnforces
    println(s"protocol: rows_after_double_load=$rowsAfter (want 6) " +
      s"audit_rows=$auditAfter (want 8) pk_enforces=$pkEnforces")

    framingOk && protocolOk
  }

  /** The suite-exercised dry run: both phases on in-memory Derby with
    * the CSV-insert double. True iff every assertion held.
    */
  def dryRun(spark: SparkSession,
      db: String = "graft_pgsmoke_dry"): Boolean = {
    System.setProperty("derby.stream.error.file", "/tmp/derby.log"): Unit
    val url = s"jdbc:derby:memory:$db;create=true"
    run(spark, () => DriverManager.getConnection(url),
      CsvInsertCopyApi, DryDialect, "graft_pg_smoke")
  }

  def main(args: Array[String]): Unit = {
    val dry = args.headOption.contains("--dry-run")
    require(dry || args.length >= 3,
      "usage: PgSmoke --dry-run | PgSmoke <jdbc-url> <user> <password> [table]")
    val spark = SparkSession.builder()
      .master("local[2]").appName("graft-pg-smoke")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val ok =
        if (dry) dryRun(spark)
        else {
          val Array(url, user, pass) = args.take(3)
          val table = args.lift(3).getOrElse("graft_pg_smoke")
          run(spark, () => DriverManager.getConnection(url, user, pass),
            PgCopy.PgDriverCopyApi, PgDialect, table)
        }
      val label = if (dry) "PG SMOKE (DRY RUN)" else "PG SMOKE"
      if (!ok) { println(s"$label: FAIL"); sys.exit(1) }
      println(s"$label: OK")
    } finally spark.stop()
  }
}
