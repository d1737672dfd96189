package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSONL (newline-delimited JSON) source/sink — the interchange format of
  * training-data pipelines. Schema-pinned reads (no inference pass over
  * 100 TB), with the engine's standard reject-capture contract: malformed
  * lines go to a side channel instead of failing the batch (the JSONL
  * analog of the readers' P2 split).
  */
object JsonL {

  val CorruptCol = "_corrupt_record"

  /** Schema-pinned read; malformed lines yield null fields + the raw line
    * in [[CorruptCol]] (PERMISSIVE mode).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(StructType(schema.fields :+ StructField(CorruptCol, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** good rows (without the corrupt column), rejects (the raw malformed
    * lines), and a `release` hook dropping the shared cache — the frame
    * is cached for the two-filter fork (Spark disallows filtering on the
    * corrupt column over a bare scan); the CALLER owns the lifecycle and
    * should release after both sides are consumed.
    */
  final case class JsonLRead(good: DataFrame, rejects: DataFrame, release: () => Unit)

  def readWithRejects(spark: SparkSession, path: String, schema: StructType): JsonLRead = {
    val df = read(spark, path, schema).cache()
    JsonLRead(
      df.filter(col(CorruptCol).isNull).drop(CorruptCol),
      df.filter(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw_line")),
      () => { df.unpersist(); () })
  }

  /** Gzip JSONL write (curated-corpus delivery format). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("compression", "gzip").json(path)
}
