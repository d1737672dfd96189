package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory for the graft engine.
  *
  * Tuned for the container's local[32] / 128 GiB profile but every setting
  * here is the one we'd also want on a 1000-executor cluster:
  *  - AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  *    broadcast-join conversion) — mandatory at 100 TB where static plans
  *    misjudge cardinalities;
  *  - shuffle partitions sized to cores locally; on a real cluster this is
  *    overridden per-deploy and AQE coalesces down;
  *  - UTC session time zone so date/time semantics are deployment-invariant.
  */
object GraftSession {
  def builder(appName: String = "graft", cpus: String = defaultCpus): SparkSession.Builder =
    SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // the testdata's events table carries TIMESTAMP(NANOS) parquet,
      // which Spark 4 rejects by default; read as long + convert in
      // Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Default parallelism: every available core (the container profile is
    * local[32]); override with SPARK_GRAFT_CPUS for constrained runs.
    */
  def defaultCpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
    Runtime.getRuntime.availableProcessors().toString)

  def getOrCreate(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

/** Loaders for the driver-generated parquet tables (TESTDATA.md). */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Normalizing loader for events: `ts` always comes out TimestampType,
    * whatever parquet encoding the generator used. Three encodings have
    * been observed across testdata generations, dispatched on the READ
    * type (never assume the encoding — the generator changes it):
    *  - `LongType`: parquet TIMESTAMP(NANOS) read under the session's
    *    `nanosAsLong=true` → `timestamp_micros(ts div 1000)`. INTEGER
    *    division (`div`): the Column `/` operator is true division
    *    through double, and ns-epoch magnitudes (~1.7e18) exceed
    *    double's 2^53 integer range, silently landing rows 1 µs off.
    *  - `TimestampNTZType`: parquet timestamp[us] with
    *    isAdjustedToUTC=false. Cast to TimestampType — value-preserving
    *    under the pinned UTC session zone, so gate hashes are unchanged,
    *    and `unix_micros` (which rejects NTZ) works downstream.
    *  - `TimestampType`: already instant-semantics micros — as-is.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types._
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"events.ts read as ${other.catalogString}: teach Tables.events this encoding")
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
