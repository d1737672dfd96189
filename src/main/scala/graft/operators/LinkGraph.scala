package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.Caching

/** Link-graph centrality — fixed-iteration PageRank in integer ppm.
  *
  * Why here: web-scale curation pipelines weight documents by the
  * centrality of their source pages (the CommonCrawl harmonic/PageRank
  * signal every quality-filter paper feeds its classifier); this is the
  * iterative-propagation operator class the rest of the engine lacks —
  * each round is a keyed join + aggregate, chained a FIXED number of
  * times (the reference engine has no iterative operator at all; its
  * loops are per-sheet, `reports_exporter_v0.83.py:522-528`).
  *
  * Exactness: float PageRank is non-deterministic under distributed
  * reduction (sum order). All arithmetic here is integer ppm — ranks
  * start at 1 000 000; one round is
  *   r'(v) = teleportPpm + (dampingPpm * Σ_{u→v} (r(u) div outdeg(u)))
  *           div 1 000 000
  * with Long sums (associative — any partitioning gives the same bits).
  * Truncation loses < 1 ppm per term, irrelevant for ranking and a
  * price happily paid for engine-exact reproducibility (the same choice
  * as the quantized-cosine operators, `llm/Similarity.scala`).
  *
  * Scale shape: out-degrees are one aggregate; edges join their degree
  * ONCE and the (src, dst, deg) table is pinned — each iteration then
  * pays one join of ranks into the pinned edges (both sides hash on the
  * same key, and at cluster scale the edge table is bucketed by src so
  * the rank shuffle is the only movement) plus one dst-keyed partial
  * aggregate. Rank state is one row per node, re-derived per round —
  * nothing data-sized ever reaches the driver. Lineage would grow
  * linearly in `iters`, so the loop localCheckpoints the rank frame
  * every `checkpointEvery` rounds (default 10): an EAGER materialization
  * barrier, not a recompute, so integer bit-determinism is unaffected —
  * the checkpointed partitions are stored and replayed verbatim. Plan
  * depth is therefore bounded by `checkpointEvery` joins regardless of
  * `iters` (pinned by LinkGraphSpec at iters=50).
  *
  * Dangling nodes (no out-edges) contribute nothing — their mass
  * evaporates, the standard simplification when ranks are used as an
  * ORDERING signal rather than a probability distribution.
  */
object LinkGraph {

  /** @param nodes one row per node: column `id`
    * @param edges  (src, dst), parallel edges count once each
    * @param iters  fixed iteration count (1..50)
    * @param checkpointEvery localCheckpoint the rank frame after every
    *   this-many iterations (1..50, default 10) — caps logical-plan
    *   depth so iters=50 plans as 5 shallow segments instead of one
    *   100-join tower. Each checkpoint runs one eager job over the
    *   one-row-per-node rank frame (cheap relative to the iteration's
    *   own join) and holds bits exactly.
    * @return (id, rank_ppm) — every node present, teleport floor for
    *   nodes with no inbound links. The returned plan references the
    *   PINNED degree-annotated edge table (one-shot-job semantics, as
    *   [[graft.llm.Dedup]]'s nearDupPairs): a long-lived service should
    *   release it via [[graft.llm.Caching.release]] once ranks are
    *   materialized.
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int,
      dampingPpm: Long = 850000L, checkpointEvery: Int = 10): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters=$iters out of range 1..50")
    require(dampingPpm >= 0 && dampingPpm <= 1000000L,
      s"dampingPpm=$dampingPpm out of [0, 1000000]")
    require(checkpointEvery >= 1 && checkpointEvery <= 50,
      s"checkpointEvery=$checkpointEvery out of range 1..50")
    val teleportPpm = 1000000L - dampingPpm
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
    val ed = Caching.pin(edges.join(deg, Seq("src")))
    var ranks = nodes.select(col("id"), lit(1000000L).as("rank_ppm"))
    for (i <- 1 to iters) {
      val contrib = ed
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), expr("rank_ppm div __deg").as("__c"))
        .groupBy(col("id")).agg(sum(col("__c")).as("__s"))
      ranks = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"), expr(
          s"$teleportPpm + ($dampingPpm * coalesce(__s, CAST(0 AS BIGINT))) div 1000000"
        ).as("rank_ppm"))
      // Truncate lineage mid-loop (not after the last round — the caller
      // gets a lazy frame whose depth is already ≤ checkpointEvery joins).
      if (i % checkpointEvery == 0 && i < iters) ranks = ranks.localCheckpoint()
    }
    ranks
  }
}
