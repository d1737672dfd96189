package graft.sinks

import java.sql.DriverManager

import org.apache.spark.sql.SparkSession

/** Deploy-day smoke for the PG COPY path (`scripts/pg_smoke.sh` runs
  * this): the one inch the sandbox cannot test is
  * [[PgCopy.PgDriverCopyApi]]'s reflective call against a REAL pgjdbc
  * `CopyManager` speaking the real wire protocol — everything else
  * (CSV framing, protocol sequencing, per-partition streaming) is
  * unit-tested against fakes (`PgCopySpec`). Run this once against the
  * deployment's Postgres before first go-live.
  *
  * What it proves end to end:
  *  - the reflective CopyManager resolution works on the deployed
  *    pgjdbc version;
  *  - COPY csv framing round-trips the hostile cases: NULL vs empty
  *    string, embedded quotes/commas/newlines, timestamps;
  *  - the distributed per-partition path (2 partitions → 2 COPY
  *    messages) commits exactly once each.
  *
  * Leaves no state behind: the scratch table is created and dropped
  * inside the run.
  */
object PgSmoke {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: PgSmoke <jdbc-url> <user> <password> [table=graft_pg_smoke]")
    val Array(url, user, pass) = args.take(3)
    val table = args.lift(3).getOrElse("graft_pg_smoke")
    require(table.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"table name '$table' must be a plain identifier")
    val spark = SparkSession.builder()
      .master("local[2]").appName("graft-pg-smoke")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val rows = Seq(
      (1L, Option("plain"), Option(java.sql.Timestamp.valueOf("2024-01-02 03:04:05.6"))),
      (2L, Option("comma, \"quote\"\nnewline"), None),
      (3L, Option(""), Option(java.sql.Timestamp.valueOf("2024-06-30 23:59:59"))),
      (4L, None, None))
    val df = rows.toDF("id", "payload", "ts").repartition(2)

    def conn() = DriverManager.getConnection(url, user, pass)
    val setup = conn()
    try {
      val st = setup.createStatement()
      st.execute(s"DROP TABLE IF EXISTS $table")
      st.execute(s"CREATE TABLE $table (id BIGINT, payload TEXT, ts TIMESTAMP)")
    } finally setup.close()

    try {
      val loaded = PgCopy.copyLoad(df, table, () =>
        DriverManager.getConnection(url, user, pass))
      val check = conn()
      try {
        val rs = check.createStatement().executeQuery(
          s"""SELECT count(*),
             |  count(*) FILTER (WHERE payload IS NULL),
             |  count(*) FILTER (WHERE payload = ''),
             |  count(*) FILTER (WHERE payload LIKE '%"quote"%'),
             |  count(*) FILTER (WHERE ts = TIMESTAMP '2024-01-02 03:04:05.6')
             |FROM $table""".stripMargin)
        rs.next()
        val (n, nNull, nEmpty, nQuote, nTs) =
          (rs.getLong(1), rs.getLong(2), rs.getLong(3), rs.getLong(4), rs.getLong(5))
        val ok = loaded == 4L && n == 4L && nNull == 1L && nEmpty == 1L &&
          nQuote == 1L && nTs == 1L
        println(s"loaded=$loaded rows=$n null_payload=$nNull empty_payload=$nEmpty " +
          s"quoted_payload=$nQuote ts_exact=$nTs")
        if (!ok) { println("PG SMOKE: FAIL"); sys.exit(1) }
        println("PG SMOKE: OK")
      } finally {
        try check.createStatement().execute(s"DROP TABLE IF EXISTS $table")
        finally check.close()
      }
    } finally spark.stop()
  }
}
