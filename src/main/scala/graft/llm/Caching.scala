package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** The single CacheManager-aware persist guard for every operator that
  * caches an intermediate consumed more than once (LSH signature tables,
  * chunk tables, k-means inputs, connected-components loop state).
  *
  * `Dataset.storageLevel` is a CacheManager lookup by canonicalized plan —
  * not a flag on the Dataset instance — so [[pin]] sees caches installed by
  * a warmup pass, an enclosing pipeline, or a prior one-shot invocation of
  * the same operator, and REUSES them instead of issuing a duplicate
  * `persist` (which would not double-cache, only log an "already cached"
  * warning that masks real lifecycle bugs; three near-identical inline
  * guards grew in round 4-5 — this is their one home).
  */
object Caching {
  /** Persist `df` at `level` unless the session's CacheManager already
    * holds an equivalent plan. Returns `df` either way.
    */
  def pin(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    if (df.storageLevel == StorageLevel.NONE) df.persist(level)
    df
  }

  /** Drop `df` from the cache iff it is cached — the release half of the
    * [[pin]] lifecycle for operators that RETURN a pinned frame
    * (one-shot-job semantics): a long-lived service calls this on the
    * result once it has been materialized/consumed. Safe (no-op, no
    * warning) on never-pinned frames.
    */
  def release(df: DataFrame): Unit = {
    if (df.storageLevel != StorageLevel.NONE) df.unpersist()
  }
}
