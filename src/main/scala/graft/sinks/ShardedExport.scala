package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Deterministic training-shard export: the dataset-layout sink of a
  * pretraining pipeline (fixed shard count, stable shard membership,
  * reproducible file contents — what a data loader shuffles over and a
  * backfill must reproduce byte-for-byte).
  *
  * Shard assignment is the PORTABLE id hash mod `numShards`
  * ([[graft.llm.Dedup.hash32]] — md5-prefix, never Spark's partitioner
  * or `rand()`), so a document's shard survives retries, cluster
  * resizes, and engine swaps. The frame repartitions ON the shard
  * column — every shard lands wholly in one task and `partitionBy`
  * writes exactly one file per shard directory (the co-location rule
  * the partitioned load uses; without it each of N tasks would open a
  * file per shard it touches: N·numShards tiny files at cluster
  * parallelism). Rows inside a shard are sorted by id, making file
  * contents deterministic, not just file membership.
  *
  * Size `numShards` so a shard fits an executor's write buffer at the
  * target corpus (shards ≈ corpus_bytes / desired_file_size); a loader
  * wanting more read parallelism than files can over-shard cheaply —
  * the cost is one shuffle either way.
  */
object ShardedExport {

  /** Write `df` under `outDir/shard=K/` (one sorted parquet file per
    * shard), overwriting a previous export — the reproducibility
    * contract is that the same frame and shard count always produce the
    * same layout and bytes.
    */
  def write(df: DataFrame, idCol: String, outDir: String, numShards: Int): Unit = {
    require(numShards >= 1, "numShards must be >= 1")
    df.withColumn("shard",
        graft.llm.Dedup.hash32(col(idCol).cast("string")) % numShards)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(outDir)
  }
}
