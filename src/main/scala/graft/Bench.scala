package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-round benchmark: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Methodology (VERDICT r1 item 9, hardened r5):
  *  - a per-query warmup pass immediately before its timed runs, so
  *    JVM/codegen warmup isn't billed to the measurement;
  *  - the timed action is a `noop`-format write, which materializes every
  *    output column (a bare `.count()` lets Catalyst prune all projection
  *    work for scan-shaped queries);
  *  - the reported number is the MEDIAN of three timed passes — a single
  *    pass let one noisy co-tenant forge a 3-14× "regression" (or hide a
  *    real one) in two successive round artifacts (VERDICT r4);
  *  - failures are never swallowed: a throwing query is reported in a
  *    `failures` map, its timing omitted, and the process exits nonzero —
  *    a broken query previously recorded a tiny wall time and read as a
  *    speedup.
  */
object Bench {
  private def run(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

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
    // SPARK_GRAFT_BENCH_RUNS=1 opts into single-pass timing for quick
    // iteration; the round artifact uses the median-of-3 default. Clamped
    // to >= 1 and parsed leniently so a typo'd value can't turn into an
    // empty sample list or kill the run before any query executes.
    val passes = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_RUNS").flatMap(_.trim.toIntOption).getOrElse(3))

    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    names.foreach { name =>
      // Per-query warmup immediately before its timed runs: a single global
      // warmup pass lets the codegen cache evict earlier plans while later
      // ones warm, re-billing Janino compilation (data-size-independent)
      // to the timed pass.
      try {
        run(SparkEntry.queries(name)(spark, sfDir))
        val samples = (1 to passes).map { _ =>
          val t0 = System.nanoTime()
          run(SparkEntry.queries(name)(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        }
        timings(name) = median(samples)
      } catch {
        case e: Throwable =>
          val msg = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}"
          failures(name) = msg
          System.err.println(s"[bench] FAILED $name — $msg")
      }
    }

    def jstr(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val qs = timings.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val fs = failures.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = timings.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$fs,"sf":"$sfDir"}""")
    spark.stop()
    if (failures.nonEmpty) {
      System.err.println(s"[bench] ${failures.size}/${names.size} queries FAILED")
      sys.exit(1)
    }
  }
}
