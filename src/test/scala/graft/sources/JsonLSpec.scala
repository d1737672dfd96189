package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._

import graft.SparkSuite

class JsonLSpec extends SparkSuite {
  import spark.implicits._

  test("jsonl: schema-pinned read with malformed-line reject capture, gzip roundtrip") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    Files.writeString(Paths.get(s"$dir/d.jsonl"),
      """{"doc_id": 1, "text": "hello world"}
        |not json at all
        |{"doc_id": 2, "text": "second doc"}""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val r = JsonL.readWithRejects(spark, s"$dir/d.jsonl", schema)
    try {
      assert(r.good.count() === 2)
      assert(r.good.columns.toSeq === Seq("doc_id", "text"))
      assert(r.rejects.as[String].collect().toSeq === Seq("not json at all"))
      // gzip roundtrip
      JsonL.write(r.good, s"$dir/out")
      val back = JsonL.read(spark, s"$dir/out", schema)
      assert(back.count() === 2)
      assert(new java.io.File(s"$dir/out").listFiles().exists(_.getName.endsWith(".json.gz")))
    } finally r.release()
  }
}
