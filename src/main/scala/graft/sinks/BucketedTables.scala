package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins (SURVEY "partitioning &
  * shuffle"): writing both sides of a recurring join bucketed (and
  * sorted) on the join key lets Spark plan a sort-merge join with NO
  * exchange on either side — at 100 TB this turns the nightly
  * fact-to-fact join from the dominant shuffle into a local merge.
  *
  * Bucket counts must match across co-joined tables (or divide evenly
  * with `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
  */
object BucketedTables {

  /** Write `df` as a bucketed, sorted external table at `path`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketCol: String, numBuckets: Int, sortCols: Seq[String] = Seq.empty): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).option("path", path)
      .bucketBy(numBuckets, bucketCol)
    val sorted = sortCols match {
      case Seq() => w
      case c +: rest => w.sortBy(c, rest: _*)
    }
    sorted.format("parquet").saveAsTable(table)
  }

  /** Join two co-bucketed tables on their bucket key — shuffle-free when
    * bucket specs line up (verify with `.explain`: no Exchange under the
    * SortMergeJoin).
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
