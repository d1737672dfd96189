package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Microbench for the IVF serve-side CELL-COUNT lever (VERDICT r16
  * item 4): q194 pins the fixed-100-probe serve at slope 0.28 across
  * sf0.1→sf1 — but at the oracle-pinned cells=4, so the measured
  * residual contains N/cells probed-cell growth. The deployment claim
  * is that cell count scales with the corpus (cells ∝ √N classically)
  * keeping per-probe work flat: the ADC-scoring join emits
  * Q × N/cells candidate pairs (each query scores only its own cell's
  * codes), so cells=√N makes the scoring term Q × √N, and cells ∝ N
  * makes it flat outright. This bench MEASURES that instead of arguing
  * it: same corpus, same frozen protocol as q194 (fixed 100 lowest
  * vec_ids, nprobe=1, top-10), one run per requested cell count —
  * build untimed (the lifecycle gates own that clock), serve
  * min-of-3.
  *
  * Usage: `runMain graft.llm.IvfServeScale <sfDir> <cells> [cells…]`
  * e.g. sf0.1 with 4 and sf1 with 4 (the q194 baseline pair), then
  * sf1 with 13 (≈ √10 × 4) and 40 (cells ∝ N). Prints one JSON line
  * per cell count; numbers go in SCALE.md.
  */
object IvfServeScale {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: IvfServeScale <sfDir> <cells> [cells…]")
    val sfDir = args(0)
    val cellsList = args.drop(1).map(_.toInt).toSeq
    val spark = GraftSession.getOrCreate("graft-ivf-serve-scale")
    val emb = graft.Tables.embeddings(spark, sfDir)
    val n = emb.count()
    def time[A](op: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = op
      (a, (System.nanoTime() - t0) / 1e9)
    }
    cellsList.foreach { cells =>
      val tmp = Files.createTempDirectory(s"graft-ivfserve-c$cells").toString
      val (_, buildS) = time(Similarity.ivfPqWriteIndex(
        emb, "vec_id", "embedding", tmp, cells = cells, m = 4, k = 4, iters = 2))
      def serve(): Long = Similarity.ivfPqServeIndex(spark, tmp, emb,
        "vec_id", "embedding", queryPred = col("vec_id") < 100,
        topK = 10, nprobe = 1).count()
      val rows = serve() // warm (JIT, FS cache, codegen)
      val serveS = (1 to 3).map(_ => time(serve())._2).min
      println(
        s"""{"sf_dir":"$sfDir","n_vectors":$n,"cells":$cells,""" +
          s""""build_s":${"%.3f".format(buildS)},""" +
          s""""serve_100probe_s":${"%.3f".format(serveS)},""" +
          s""""result_rows":$rows}""")
    }
    spark.stop()
  }
}
