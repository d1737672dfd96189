package graft.sources

import java.nio.file.Files

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

import graft.SparkSuite

class SchemaDriftSpec extends SparkSuite {
  import spark.implicits._

  private def tmpDir(name: String): String = {
    val p = Files.createTempDirectory(name)
    p.toFile.deleteOnExit()
    p.toString
  }

  private def writeDrifted(dir: String): Unit = {
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir/gen=1")
    Seq((3L, "c", 10L), (4L, "d", 20L)).toDF("id", "v", "extra")
      .write.mode("overwrite").parquet(s"$dir/gen=2")
  }

  test("readMerged: union schema, NULL-filled absent columns, no row loss") {
    val dir = tmpDir("graft-drift")
    writeDrifted(dir)
    val merged = SchemaDrift.readMerged(spark, dir)
    assert(merged.columns.toSet === Set("id", "v", "extra", "gen"))
    val rows = merged.select("id", "extra").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(rows === Map(1L -> None, 2L -> None, 3L -> Some(10L), 4L -> Some(20L)))
  }

  test("unionEvolved agrees with readMerged on the same drifted batches") {
    val dir = tmpDir("graft-drift-u")
    writeDrifted(dir)
    val viaUnion = SchemaDrift.unionEvolved(Seq(
        spark.read.parquet(s"$dir/gen=1"),
        spark.read.parquet(s"$dir/gen=2")))
      .select("id", "v", "extra")
    val viaMerge = SchemaDrift.readMerged(spark, dir).select("id", "v", "extra")
    assert(viaUnion.collect().map(_.toString).sorted.toSeq ===
      viaMerge.collect().map(_.toString).sorted.toSeq)
    val e = intercept[IllegalArgumentException](SchemaDrift.unionEvolved(Nil))
    assert(e.getMessage.contains("at least one batch"))
  }

  test("a TYPE change across shards fails the footer merge loudly — drift is append-only") {
    val dir = tmpDir("graft-drift-t")
    Seq((1L, 5L)).toDF("id", "x").write.mode("overwrite").parquet(s"$dir/gen=1")
    Seq((2L, "five")).toDF("id", "x").write.mode("overwrite").parquet(s"$dir/gen=2")
    val e = intercept[SparkException] {
      SchemaDrift.readMerged(spark, dir).collect()
    }
    assert(e.getMessage.toLowerCase.contains("merge"))
  }

  test("schemaDiff classifies added/removed/retyped/unchanged columns") {
    val oldDf = Seq((1L, "a", 1.0)).toDF("id", "keep", "gone")
    val newDf = Seq((1, "a", true)).toDF("id", "keep", "fresh")
    val got = SchemaDrift.schemaDiff(spark, oldDf, newDf)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(got === Map("id" -> "retyped", "keep" -> "unchanged",
      "gone" -> "removed", "fresh" -> "added"))
  }

  test("dynamic partition pruning: a dim filter prunes fact partitions at runtime") {
    val dir = tmpDir("graft-dpp")
    // fact partitioned by day; dim selects 1 of 30 days — DPP should
    // inject the dim's day set into the fact scan as a runtime filter
    (0 until 3000).map(i => (i.toLong, s"2024-01-${"%02d".format(i % 30 + 1)}"))
      .toDF("k", "day").write.mode("overwrite").partitionBy("day").parquet(s"$dir/fact")
    Seq(("2024-01-07", "pick")).toDF("day", "tag")
      .write.mode("overwrite").parquet(s"$dir/dim")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim").filter(col("tag") === "pick")
    val joined = fact.join(dim, Seq("day"))
    assert(joined.count() === 100L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamic partition pruning subquery on the fact scan:\n$plan")
  }
}
