package graft.sources

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** S7/S8/S9 + K4-K6 against a REAL JDBC database — Derby embedded
  * in-memory (ships with Spark) — so the read paths (`dimTable`,
  * `pushdownQuery`, `currentVersion`) and the batched-INSERT load
  * protocol are exercised end-to-end over an actual driver, not just as
  * SQL strings. No Postgres in the container; Derby covers the
  * column-name-mapping and dialect-quoting risks a first live deploy
  * would otherwise hit blind.
  *
  * Derby folds unquoted identifiers to UPPER; the engine's builders quote
  * lowercase names, so tables here are created with quoted lowercase
  * columns — the same convention the reference's Postgres DDL uses.
  */
class JdbcSpec extends SparkSuite {
  import spark.implicits._

  System.setProperty("derby.stream.error.file", "/tmp/derby.log")
  private val url = "jdbc:derby:memory:graftdb;create=true"
  private def connect(): Connection = DriverManager.getConnection(url)

  private def exec(sqls: String*): Unit = {
    val c = connect()
    try { val st = c.createStatement(); sqls.foreach(st.execute(_)); st.close() }
    finally c.close()
  }

  test("S7: dimTable reads a live JDBC dimension with correct columns and types") {
    exec("""CREATE TABLE dim_trains ("train_number" VARCHAR(10), "departure_time" VARCHAR(8))""",
      """INSERT INTO dim_trains VALUES ('T1', '08:45:00'), ('T2', '09:45:00')""")
    val df = Jdbc.dimTable(spark, url, "dim_trains")
    assert(df.columns.toSeq === Seq("train_number", "departure_time"))
    assert(df.orderBy("train_number").as[(String, String)].collect().toSeq ===
      Seq(("T1", "08:45:00"), ("T2", "09:45:00")))
  }

  test("S8: pushdownQuery ships the aggregation to the database") {
    exec("""CREATE TABLE ops ("ticket" VARCHAR(10), "op_ts" TIMESTAMP)""",
      """INSERT INTO ops VALUES ('A', '2024-01-02 10:00:00'), ('A', '2024-01-01 09:00:00'), ('B', '2024-01-03 08:00:00')""")
    val df = Jdbc.pushdownQuery(spark, url,
      """SELECT "ticket", MIN("op_ts") AS "first_op" FROM ops GROUP BY "ticket"""")
    val got = df.orderBy("ticket")
      .select(col("ticket"), date_format(col("first_op"), "yyyy-MM-dd HH:mm:ss"))
      .as[(String, String)].collect().toSeq
    assert(got === Seq(("A", "2024-01-01 09:00:00"), ("B", "2024-01-03 08:00:00")))
  }

  test("S9: currentVersion reads MAX(version) over a live connection") {
    exec("""CREATE TABLE versions (version DOUBLE)""",
      """INSERT INTO versions VALUES (0.81), (0.83), (0.82)""")
    val c = connect()
    try assert(Jdbc.currentVersion(c, """versions""") === 0.83)
    finally c.close()
  }

  test("K5: the ANSI single-day delete executes against a live database") {
    exec("""CREATE TABLE tday ("ts" TIMESTAMP, "id" INT)""",
      """INSERT INTO tday VALUES ('2024-01-01 08:00:00', 1), ('2024-01-01 23:59:59', 2), ('2024-01-02 00:00:00', 3)""")
    exec(Jdbc.Sql.deleteDayAnsi("tday", "ts", "2024-01-01"))
    // both rows of the day go, regardless of time-of-day; midnight of
    // the NEXT day survives (the reference's per-day BPD delete contract)
    val rows = Jdbc.dimTable(spark, url, "tday").select("id").as[Int].collect().toSeq
    assert(rows === Seq(3))
  }

  test("K5: PG-dialect deleteDay and ANSI deleteDayAnsi select the same day-set (Spark SQL referee)") {
    import org.apache.spark.sql.functions.{col, expr, to_timestamp}
    // No PG server exists here, so the PG-only `to_char` predicate cannot
    // run live; instead both builders' WHERE clauses are evaluated over
    // ONE timestamp fixture with Spark SQL as the referee (to_char ->
    // date_format, PG 'mm' month code -> Java 'MM'). Divergence between
    // the two predicates on any boundary row fails here — pinning both
    // SQL forms to the same day partition.
    val fixture = Seq(
      (1L, "2024-03-09 23:59:59.999"), // day before, last ms
      (2L, "2024-03-10 00:00:00.0"),   // midnight opens the day
      (3L, "2024-03-10 12:34:56.789"),
      (4L, "2024-03-10 23:59:59.999"), // last ms of the day
      (5L, "2024-03-11 00:00:00.0"),   // next midnight is NOT the day
      (6L, "2024-02-29 10:00:00.0"),   // leap day
      (7L, "2023-12-31 23:59:59.999")  // year boundary
    ).toDF("id", "s").select(col("id"), to_timestamp(col("s")).as("ts"))
    def whereClause(sql: String): String = sql.split(" WHERE ", 2)(1)
    def asSparkPredicate(w: String): String = w
      .replace("to_char(", "date_format(")
      .replace("'yyyy-mm-dd'", "'yyyy-MM-dd'")
      .replace("\"ts\"", "ts")
    def daySet(sqlBuilder: (String, String, String) => String, day: String): Set[Long] =
      fixture.filter(expr(asSparkPredicate(whereClause(sqlBuilder("t", "ts", day)))))
        .select("id").as[Long].collect().toSet
    for (day <- Seq("2024-03-10", "2024-02-29", "2023-12-31", "2024-03-11")) {
      val pg = daySet(Jdbc.Sql.deleteDay, day)
      val ansi = daySet(Jdbc.Sql.deleteDayAnsi, day)
      assert(pg === ansi, s"dialects diverge on $day")
    }
    assert(daySet(Jdbc.Sql.deleteDay, "2024-03-10") === Set(2L, 3L, 4L))
    assert(daySet(Jdbc.Sql.deleteDayAnsi, "2024-03-11") === Set(5L))
  }

  test("K4-K7: the FULL protocol executes live — constraints drop, delete, append, audit, constraints recreate, in order") {
    // real DDL through real hooks: the table carries an actual PRIMARY
    // KEY; the drop/recreate statements are Derby procedures whose
    // bodies ALTER TABLE over a nested connection (the PG deploy's
    // server-side functions, minus the dialect). Each hook records the
    // table's row count at invocation, which pins the SEQUENCING:
    // drop must see the PRE-delete count, recreate the POST-append one.
    exec(
      """CREATE TABLE tgt2 ("day" VARCHAR(10) NOT NULL, "id" INT NOT NULL, CONSTRAINT pk_tgt2 PRIMARY KEY ("day", "id"))""",
      """INSERT INTO tgt2 VALUES ('2024-01-01', 100), ('2024-01-03', 300)""",
      """CREATE TABLE audit2 ("timestamp" VARCHAR(20), "table" VARCHAR(20), OPERATION VARCHAR(20), PERIOD VARCHAR(20), "user" VARCHAR(20))""",
      """CREATE PROCEDURE DROP_TGT2_PK(IN s VARCHAR(64), IN t VARCHAR(64))
        | LANGUAGE JAVA PARAMETER STYLE JAVA MODIFIES SQL DATA
        | EXTERNAL NAME 'graft.sources.JdbcHookFns.dropPk'""".stripMargin,
      """CREATE PROCEDURE ADD_TGT2_PK()
        | LANGUAGE JAVA PARAMETER STYLE JAVA MODIFIES SQL DATA
        | EXTERNAL NAME 'graft.sources.JdbcHookFns.addPk'""".stripMargin)
    JdbcHookFns.calls.clear()

    val df = Seq(("2024-01-01", 1), ("2024-01-01", 2), ("2024-01-02", 3))
      .toDF("day", "id")
    Jdbc.partitionOverwriteLoad(df, url, "tgt2", "day",
      streaks = Seq(("2024-01-01", "2024-01-02")),
      days = Seq("2024-01-01", "2024-01-02"),
      auditTable = "audit2", runStamp = "2024-06-01 12:00", user = "graft",
      props = new Properties, connFactory = () => connect(),
      hooks = Some(Jdbc.ConstraintHooks(
        dropSql = "CALL DROP_TGT2_PK('APP', 'TGT2')",
        recreateSql = "CALL ADD_TGT2_PK()",
        rows = 3L, threshold = 2L)))

    // content: overlapping day replaced, disjoint day kept
    val rows = Jdbc.dimTable(spark, url, "tgt2")
      .orderBy("day", "id").as[(String, Int)].collect().toSeq
    assert(rows === Seq(("2024-01-01", 1), ("2024-01-01", 2),
      ("2024-01-02", 3), ("2024-01-03", 300)))
    // sequencing: drop saw both preexisting rows (it runs BEFORE the
    // deletes — reference wraps the whole export); recreate saw the
    // final 4 (after delete of 1 and append of 3)
    import scala.jdk.CollectionConverters._
    assert(JdbcHookFns.calls.asScala.toList === List(("drop", 2L), ("recreate", 4L)))
    // the constraint is really back: a duplicate key must be rejected
    val dup = intercept[java.sql.SQLException] {
      exec("""INSERT INTO tgt2 VALUES ('2024-01-02', 3)""")
    }
    assert(dup.getSQLState.startsWith("23"), s"expected a PK violation, got ${dup.getSQLState}")

    // below-threshold batches never fire the hooks (strictly-greater,
    // reference :1801)
    JdbcHookFns.calls.clear()
    Jdbc.partitionOverwriteLoad(
      Seq(("2024-01-05", 9)).toDF("day", "id"), url, "tgt2", "day",
      streaks = Seq(("2024-01-05", "2024-01-05")), days = Seq("2024-01-05"),
      auditTable = "audit2", runStamp = "2024-06-01 12:05", user = "graft",
      props = new Properties, connFactory = () => connect(),
      hooks = Some(Jdbc.ConstraintHooks("CALL DROP_TGT2_PK('APP', 'TGT2')",
        "CALL ADD_TGT2_PK()", rows = 1L, threshold = 1L)))
    assert(JdbcHookFns.calls.isEmpty, "rows == threshold must NOT trip the hooks")
  }

  test("K4-K6: partitionOverwriteLoad round-trips delete -> append -> audit on a live database") {
    exec(
      """CREATE TABLE tgt ("day" VARCHAR(10), "id" INT)""",
      """INSERT INTO tgt VALUES ('2024-01-01', 100), ('2024-01-03', 300)""",
      """CREATE TABLE audit_log ("timestamp" VARCHAR(20), "table" VARCHAR(20), OPERATION VARCHAR(20), PERIOD VARCHAR(20), "user" VARCHAR(20))""")
    val df = Seq(("2024-01-01", 1), ("2024-01-02", 2)).toDF("day", "id")
    Jdbc.partitionOverwriteLoad(df, url, "tgt", "day",
      streaks = Seq(("2024-01-01", "2024-01-02")), days = Seq("2024-01-01", "2024-01-02"),
      auditTable = "audit_log", runStamp = "2024-06-01 12:00", user = "graft",
      props = new Properties, connFactory = () => connect())
    // the overlapping day 2024-01-01 was deleted then re-loaded; day 3 kept
    val rows = Jdbc.dimTable(spark, url, "tgt")
      .orderBy("day", "id").as[(String, Int)].collect().toSeq
    assert(rows === Seq(("2024-01-01", 1), ("2024-01-02", 2), ("2024-01-03", 300)))
    val audits = Jdbc.dimTable(spark, url, "audit_log")
      .select("PERIOD").as[String].collect().sorted.toSeq
    assert(audits === Seq("2024-01-01", "2024-01-02"))
  }
}

/** Bodies of the Derby constraint-hook procedures (JdbcSpec "K4-K7").
  * A top-level object so the compiler emits STATIC forwarders — the
  * form Derby's `EXTERNAL NAME` binding requires. Each runs real DDL
  * over the routine's nested connection (`jdbc:default:connection`),
  * the embedded analog of the reference's server-side
  * drop/recreate-constraints functions, and records the target table's
  * row count at invocation so the spec can assert WHEN in the protocol
  * it fired.
  */
object JdbcHookFns {
  val calls = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]

  private def withNested[A](f: Connection => A): A = {
    val c = DriverManager.getConnection("jdbc:default:connection")
    try f(c) finally c.close()
  }

  private def countTgt2(c: Connection): Long = {
    val st = c.createStatement()
    try {
      val rs = st.executeQuery("SELECT COUNT(*) FROM tgt2")
      rs.next(); rs.getLong(1)
    } finally st.close()
  }

  def dropPk(schema: String, table: String): Unit = withNested { c =>
    calls.add(("drop", countTgt2(c))): Unit
    val st = c.createStatement()
    try st.execute("ALTER TABLE tgt2 DROP CONSTRAINT pk_tgt2"): Unit
    finally st.close()
  }

  def addPk(): Unit = withNested { c =>
    calls.add(("recreate", countTgt2(c))): Unit
    val st = c.createStatement()
    try st.execute(
      """ALTER TABLE tgt2 ADD CONSTRAINT pk_tgt2 PRIMARY KEY ("day", "id")"""): Unit
    finally st.close()
  }
}
