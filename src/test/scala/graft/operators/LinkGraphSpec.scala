package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Invariant tests for integer-ppm PageRank: ring fixed point, hub
  * dominance, floor for unlinked nodes, and bit-determinism across
  * partitionings.
  */
class LinkGraphSpec extends SparkSuite {
  import spark.implicits._

  test("PR: a uniform ring is a fixed point at exactly 1,000,000 ppm") {
    // every node has out-degree 1 and in-degree 1: r' = 150000 + 850000·1 = 1e6
    val nodes = (0L until 20L).toDF("id")
    val edges = (0L until 20L).map(i => (i, (i + 1) % 20)).toDF("src", "dst")
    val out = LinkGraph.pageRank(nodes, edges, iters = 5)
    assert(out.filter(col("rank_ppm") =!= 1000000L).count() === 0)
  }

  test("PR: a star hub outranks its leaves; unlinked nodes sit at the teleport floor") {
    val nodes = (0L until 12L).toDF("id")
    // 0..9 all link to hub 10; node 11 participates not at all
    val edges = (0L until 10L).map(i => (i, 10L)).toDF("src", "dst")
    val r = LinkGraph.pageRank(nodes, edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(r(10L) > r(0L))
    assert(r(11L) === 150000L) // teleport floor: no inbound mass
    assert((0L until 10L).map(r).toSet.size === 1) // leaves identical
  }

  test("PR: bit-identical under different input partitionings") {
    val nodes = (0L until 100L).toDF("id")
    val edges = (0L until 100L).flatMap(i =>
      Seq((i, (i * 7 + 1) % 100), (i, (i * 3 + 5) % 100))).toDF("src", "dst")
    val a = LinkGraph.pageRank(nodes.repartition(2), edges.repartition(3), 4)
      .as[(Long, Long)].collect().toMap
    val b = LinkGraph.pageRank(nodes.repartition(17), edges.repartition(31), 4)
      .as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("PR: iters=50 completes with checkpoint-bounded plan depth, bit-equal to uncheckpointed") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val nodes = (0L until 60L).toDF("id")
    val edges = (0L until 60L).flatMap(i =>
      Seq((i, (i * 11 + 2) % 60), (i, (i * 5 + 7) % 60))).toDF("src", "dst")
    val out = LinkGraph.pageRank(nodes, edges, iters = 50) // checkpointEvery=10
    // 50 rounds × 2 joins = 100 joins un-checkpointed; the eager
    // localCheckpoint at rounds 10/20/30/40 leaves only the last
    // segment's joins (≤ 10 rounds × 2) in the returned lazy plan.
    val joins = out.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.length <= 20, s"plan depth not truncated: ${joins.length} joins")
    val a = out.as[(Long, Long)].collect().toMap
    // checkpointEvery=50 ⇒ no checkpoint fires for iters=50 (i < iters
    // guard) — the pure-lineage run must match bit-for-bit.
    val b = LinkGraph.pageRank(nodes, edges, 50, checkpointEvery = 50)
      .as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("PR: iteration bounds are enforced") {
    val nodes = Seq(1L).toDF("id")
    val edges = Seq((1L, 1L)).toDF("src", "dst")
    intercept[IllegalArgumentException] { LinkGraph.pageRank(nodes, edges, 0) }
    intercept[IllegalArgumentException] { LinkGraph.pageRank(nodes, edges, 51) }
    intercept[IllegalArgumentException] {
      LinkGraph.pageRank(nodes, edges, 3, dampingPpm = 1000001L)
    }
    intercept[IllegalArgumentException] {
      LinkGraph.pageRank(nodes, edges, 3, checkpointEvery = 0)
    }
  }
}
