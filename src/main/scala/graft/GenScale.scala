package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of the driver's test-data star schema — the
  * local stand-in for "run the same gates at 10× the rows" (the r13
  * verdict's scale-anchor ask). Writes a `copies`× version of the
  * sf-directory's FACT tables by unioning key-shifted replicas
  * (replica c shifts each table's primary key by c × span, span =
  * max(key)+1, so replica 0 is the original byte-for-byte row set and
  * keys stay globally unique); DIMENSION tables copy as-is, the way a
  * real corpus grows facts against stable dims.
  *
  * Deliberate properties:
  *  - fully deterministic (no randomness — replicas are exact content
  *    copies under new keys), so two runs produce identical inputs and
  *    slope comparisons are data-noise-free;
  *  - timestamps keep their span (densification: 10× events in the
  *    same window), matching the gates' fixed time predicates;
  *  - verbatim replica TEXT/EMBEDDINGS mean pair-producing dedup/LSH
  *    distributions are NOT faithfully scaled (every doc gains
  *    `copies−1` exact twins) — the scale anchor therefore targets the
  *    store/index LIFECYCLE gates, whose cost is row- and byte-shaped,
  *    not the pair-join gates (SCALE.md records this caveat).
  *
  * Usage: `runMain graft.GenScale <srcSfDir> <dstDir> <copies> [zipfS]`.
  * The optional `zipfS` (> 1, e.g. 1.2) additionally writes a
  * `skew.parquet` table — one row per replicated lineitem row with a
  * zipf(s)-distributed key — the skewed-join/agg fixture the bench
  * corpus otherwise lacks (every base table is near-uniform).
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val Array(src, dst, copiesStr) = args.take(3)
    val copies = copiesStr.toInt
    val zipfS: Option[Double] = args.lift(3).map(_.toDouble)
    require(copies >= 1, "copies must be >= 1")
    zipfS.foreach(z => require(z > 1.0, s"zipfS must be > 1, got $z"))
    val spark = GraftSession.getOrCreate("graft-genscale")

    def table(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String, files: Int): Unit =
      df.repartition(files).write.mode("overwrite").parquet(s"$dst/$name.parquet")

    def span(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).collect().head.getLong(0) + 1L

    /** Union `copies` replicas, shifting every column in `shift` by
      * c × its span (keys referencing another table shift by THAT
      * table's span so FK joins stay consistent within a replica).
      */
    def replicate(df: DataFrame, shift: Seq[(String, Long)]): DataFrame =
      (0 until copies).map { c =>
        shift.foldLeft(df) { case (d, (k, sp)) =>
          d.withColumn(k, col(k) + lit(c * sp))
        }
      }.reduce(_ unionByName _)

    val orderSpan = span(table("orders"), "o_orderkey")
    val custSpan = span(table("customer"), "c_custkey")

    // dims: stable across growth — copy verbatim
    Seq("region", "nation", "part", "supplier").foreach { t =>
      write(table(t), t, 1)
    }
    // customer scales with orders (TPC-H-style), keys shifted in lockstep
    write(replicate(table("customer"), Seq("c_custkey" -> custSpan)),
      "customer", math.max(1, copies / 2))
    write(replicate(table("orders"),
      Seq("o_orderkey" -> orderSpan, "o_custkey" -> custSpan)),
      "orders", copies)
    write(replicate(table("lineitem"), Seq("l_orderkey" -> orderSpan)),
      "lineitem", copies * 2)
    write(replicate(table("events"),
      Seq("event_id" -> span(table("events"), "event_id"))),
      "events", copies)
    write(replicate(table("documents"),
      Seq("doc_id" -> span(table("documents"), "doc_id"))),
      "documents", copies)
    write(replicate(table("embeddings"),
      Seq("vec_id" -> span(table("embeddings"), "vec_id"))),
      "embeddings", copies)
    // zipf(s) skew fixture: rank = floor(U^(-1/(s-1))) is the inverse
    // CDF of the zipf tail (P(rank ≥ r) = r^-(s-1), so P(rank = r) ∝
    // r^-s) — at s = 1.2 the hottest key holds ~13% of all rows, the
    // single-giant-key-group shape the salting operators exist for. U
    // is an xxhash64-derived uniform over the (already key-shifted)
    // replicated rows, so the table is fully deterministic; ranks cap
    // at 10M (the double→long cast must never see the unbounded tail).
    zipfS.foreach { z =>
      val skew = spark.read.parquet(s"$dst/lineitem.parquet")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .withColumn("__u",
          (pmod(xxhash64(col("l_orderkey"), col("l_linenumber")),
            lit(1000000L)).cast("double") + 1.0) / 1000000.0)
        .select(
          least(floor(pow(col("__u"), lit(-1.0 / (z - 1.0)))),
            lit(1.0e7)).cast("long").as("k"),
          floor(col("l_quantity") * 100 + 0.5).cast("long").as("v"))
      write(skew, "skew", copies)
      println(s"[genscale] wrote zipf($z) skew table")
    }
    println(s"[genscale] wrote ${copies}x of $src to $dst")
    spark.stop()
  }
}
