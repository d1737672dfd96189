package graft

/** Plan-audit tool: print `.explain("formatted")` for the named
  * SparkEntry queries (all of them when none given) against
  * SPARK_GRAFT_SF_DIR. The per-operator audit loop: check shuffles,
  * pushed filters, read schemas, and codegen spans before calling an
  * operator done.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.builder("graft-explain").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
