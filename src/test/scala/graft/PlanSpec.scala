package graft

import org.apache.spark.sql.functions._

/** Physical-plan shape assertions for the scale-critical queries: these
  * fail if a future change regresses a broadcast into a shuffle, loses a
  * scan-level pushdown, or lets a join degrade to all-pairs.
  */
class PlanSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q02: filter and projection push into the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: ["), "expected scan-level pushed filters")
    assert(p.contains("IsNotNull(l_shipdate)") || p.contains("GreaterThanOrEqual(l_shipdate"),
      "expected the shipdate predicate at the scan")
    assert(p.contains("ReadSchema") && !p.contains("l_comment"),
      "expected a pruned read schema")
  }

  test("q06: dimension join is broadcast, not shuffled") {
    val p = plan("q06_broadcast_lookup")
    assert(p.contains("BroadcastHashJoin"), "dim join must broadcast")
  }

  test("q07: missing-key probe anti-joins a pre-distinct probe side") {
    val p = plan("q07_missing_keys")
    assert(p.contains("LeftAnti"), "expected an anti-join")
    assert(p.contains("HashAggregate"), "expected distinct before the join")
  }

  test("q08: first-timestamp enrichment uses a semi-join before the aggregation") {
    val p = plan("q08_first_ts_enrich")
    assert(p.contains("LeftSemi"), "history must be restricted by semi-join")
  }

  test("q35/q36: ANN joins broadcast the query side; no nested-loop explosion beyond the intended cross") {
    val p = plan("q36_ann_bucketed")
    assert(p.contains("BroadcastHashJoin"), "bucketed ANN must broadcast queries on the bucket key")
    assert(!p.contains("CartesianProduct"), "bucketed ANN must not be all-pairs")
  }

  test("q11: keep-last dedup is a single partitioned window (no global sort)") {
    val p = plan("q11_keeplast_dedup")
    assert(p.contains("Window"), "expected a window")
    assert(!p.contains("Sort [") || !p.contains("global=true"),
      "dedup must not require a global sort")
  }

  test("q46/q48/q50: per-row profile queries stay shuffle-free scan-projects") {
    Seq("q46_bpe_rolling", "q48_quality_lang_profile", "q50_repetition_stats")
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("Exchange"), s"$q must not shuffle:\n$p")
      }
  }

  test("q47: frame sampling is a shuffle-free explode") {
    val p = plan("q47_frame_samples")
    assert(p.contains("Generate"), "expected the frame explode")
    assert(!p.contains("Exchange"), "frame sampling must not shuffle")
  }

  test("q44: bucket stats aggregate partially before both exchanges") {
    val p = plan("q44_lsh_bucket_stats")
    assert(p.contains("partial_count"), "expected map-side partial aggregation")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q45: char-ngram LSH pairs never degrade to all-pairs") {
    val p = plan("q45_ngram_jaccard")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q55/q57/q60: chunk-match, decontamination and incremental dedup never degrade to all-pairs") {
    Seq("q55_chunk_match_pairs", "q57_decontamination", "q60_incremental_dedup")
      .foreach { q =>
        val p = plan(q)
        assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
          s"$q must join on chunk/band keys, not all-pairs")
      }
  }

  test("q61: tf-idf keeps the corpus total broadcast and the top-k window per-doc") {
    val p = plan("q61_tfidf_terms")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the one-row corpus total must broadcast")
    assert(!p.contains("CartesianProduct"), "no shuffled cross product")
  }

  test("near-dup pre-hash spread is conditional: shuffles a 1-split source, skips a wide one") {
    import spark.implicits._
    val docs = (0L until 60L).map(i => (i, s"alpha beta gamma delta tok$i"))
      .toDF("doc_id", "text")
    // REPARTITION_BY_COL appears in the plan ONLY from the explicit
    // spread repartition — every other exchange in the LSH chain is
    // EnsureRequirements-inserted (ENSURE_REQUIREMENTS).
    val narrow = graft.llm.Dedup.nearDupPairs(docs.coalesce(1), "doc_id", "text",
      persistSignatures = false).queryExecution.executedPlan.toString
    assert(narrow.contains("REPARTITION_BY_COL"),
      "a single-split source must be spread over the cores before hashing")
    val target = spark.sessionState.conf.numShufflePartitions
    val wide = graft.llm.Dedup.nearDupPairs(docs.repartition(target + 2), "doc_id", "text",
      persistSignatures = false).queryExecution.executedPlan.toString
    assert(!wide.contains("REPARTITION_BY_COL"),
      "a source with enough splits must not pay a pre-hash corpus shuffle")
    // regression: aggregation/window shapes get their exchanges from
    // EnsureRequirements during executedPlan preparation — sparkPlan
    // shows none. A guard reading sparkPlan fell through to the
    // AQE-eager .rdd probe AND (post-coalesce) added the repartition.
    val shaped = graft.llm.Dedup.nearDupPairs(
      docs.groupBy(col("doc_id")).agg(first(col("text")).as("text")),
      "doc_id", "text", persistSignatures = false)
      .queryExecution.executedPlan.toString
    assert(!shaped.contains("REPARTITION_BY_COL"),
      "planner-inserted exchanges must satisfy the spread guard")
  }

  test("q70: as-of join is one keyed window, never a range nested-loop") {
    val p = plan("q70_asof_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "as-of must not plan a range join explosion")
    assert(p.contains("Window"), "expected the merged-stream running window")
    // exactly one exchange on the join key (__k); the only other
    // exchange is the right side's (user_id, ts) dedup aggregation
    val keyExchanges = "hashpartitioning\\(__k".r.findAllIn(p).size
    assert(keyExchanges === 1, s"expected one key exchange, saw $keyExchanges:\n$p")
  }

  test("q77: broadcast as-of never shuffles or sorts the left side") {
    val p = plan("q77_asof_broadcast")
    assert(p.contains("BroadcastHashJoin"), "the history dim must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"),
      "broadcast as-of must not fall back to the merged-stream shape")
    // exchange inventory: exactly two hash exchanges, both on the right
    // side — the (user_id, ts) signup dedup and the per-key history
    // aggregation (the __k alias collapses to user_id in the optimized
    // plan). A shuffled left side would add a third. Window/SortMergeJoin
    // absence above excludes the merged-stream fallback shapes.
    val exchanges = "Exchange hashpartitioning\\(".r.findAllIn(p).size
    assert(exchanges == 2,
      s"expected the two right-side exchanges only, saw $exchanges:\n$p")
  }

  test("q69: repeated-line join-back broadcasts the violator set (text shuffles once)") {
    val p = plan("q69_repeated_lines")
    assert(p.contains("BroadcastHashJoin"),
      "the violator set must broadcast onto the lines")
    // corpus text shuffles exactly once: the groupBy(id) reassembly. The
    // frequency chain shuffles only the 8-byte line hash.
    val textShuffles = "Exchange hashpartitioning\\(id#".r.findAllIn(p).size
    assert(textShuffles <= 1,
      s"line text must shuffle at most once (reassembly), saw $textShuffles:\n$p")
  }

  test("q66/q72: semantic dedup and top n-grams never degrade to all-pairs or a global sort-all") {
    val sem = plan("q66_semantic_dedup")
    assert(!sem.contains("CartesianProduct") && !sem.contains("BroadcastNestedLoopJoin"),
      "semantic dedup pairs must stay inside k-means cells")
    val top = plan("q72_top_ngrams")
    assert(top.contains("TakeOrderedAndProject"),
      "global top-k must be TakeOrdered (per-partition heaps), not a full sort")
  }

  test("q73: quality filter is a shuffle-free scan-project") {
    val p = plan("q73_quality_filter")
    assert(!p.contains("Exchange"), "per-row scoring must not shuffle")
  }

  test("q79: the training side is bloom-prefiltered before any join; no all-pairs") {
    val p = plan("q79_bloom_decontamination")
    assert(p.contains("bloom_contains_long"),
      "train chunks must die against the Bloom filter inside the scan stage")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "decontamination must stay an equi-join")
  }

  test("q83: PQ encode plans as a shuffle-free scan-project (codebooks are driver literals)") {
    val p = plan("q83_pq_encode")
    assert(!p.contains("Exchange"),
      "the encode pass must be map-only — at 100 TB it IS the operator:\n" + p)
  }

  test("q84: ADC scoring broadcasts the query side and never shuffles corpus vectors") {
    val p = plan("q84_pq_adc_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the query side must broadcast (the intended scan × tiny-queries cross)")
    assert(!p.contains("CartesianProduct"), "no shuffled all-pairs")
    // the only exchange is the per-query top-k window on (tiny) scored rows
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected only the rank window's exchange, saw $exchanges:\n$p")
  }

  test("q85: interval join is a grid-bucketed equi-join, never a range nested-loop") {
    val p = plan("q85_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the containment predicate must ride an equi-join on (key, cell):\n" + p)
  }

  test("q88: both SCD-2 window passes share one hash exchange on the key") {
    val p = plan("q88_scd2_build")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected the key shuffle to be reused, saw $exchanges:\n$p")
    assert(!p.contains("SinglePartition"), "no global-window funnel")
  }

  test("q90: snapshot diff hashes inside the scan projection — text never shuffles") {
    val p = plan("q90_snapshot_diff")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // the join moves (id, md5) pairs only: no exchange carries the text column
    val shuffleLines = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(shuffleLines.nonEmpty && shuffleLines.forall(!_.contains("text")),
      s"text must be reduced to a hash before any shuffle:\n$p")
  }

  test("q92: the percentile-thresholded keep side is a pure scan filter — no exchange at all") {
    val p = plan("q92_quality_threshold")
    assert(!p.contains("Exchange"),
      "threshold must fold in as a literal; the kept-side plan is scan+filter:\n" + p)
  }

  test("q95: epoch upsampling is one keyed window plus a broadcast quota join") {
    val p = plan("q95_epoch_upsample")
    assert(p.contains("BroadcastHashJoin"), "per-group counts must broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SinglePartition"), "no global window")
  }

  test("q96: broadcast interval join never shuffles the point side") {
    val p = plan("q96_interval_broadcast")
    assert(p.contains("BroadcastHashJoin"), "dimension intervals must broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1,
      s"only the dimension aggregation may shuffle, saw $exchanges:\n$p")
  }

  test("q80: stable ids never funnel through a single partition") {
    val p = plan("q80_stable_ids")
    assert(!p.contains("SinglePartition"),
      "global ids must not plan the naive one-task window:\n" + p)
    assert(p.toLowerCase.contains("rangepartitioning"),
      "expected the range repartition that makes partition order = key order")
  }

  test("q99: composed IVF-PQ is a cell-keyed equi-join — no full-code-table scan per query") {
    val p = plan("q99_ivfpq_topk")
    assert(p.contains("BroadcastHashJoin"),
      "queries must broadcast and meet candidates on the cell key")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "a query must never ADC-score the whole code table (that is q84's baseline):\n" + p)
    // the only exchange is the per-query rank window on (tiny) scored rows
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected only the rank window's exchange, saw $exchanges:\n$p")
  }

  test("q103: residual IVF-PQ keeps the cell-keyed equi-join — residuals are centroid-literal arithmetic, not a lookup join") {
    val p = plan("q103_ivfpq_residual")
    assert(p.contains("BroadcastHashJoin"),
      "residual queries must still broadcast onto the cell key")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "residual subtraction must happen in-projection, never via a centroid join:\n" + p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected only the rank window's exchange, saw $exchanges:\n$p")
  }

  test("q101: multi-probe IVF-PQ stays all-equi-join — the query fan-out precedes the cell join") {
    val p = plan("q101_ivfpq_nprobe2")
    assert(p.contains("BroadcastHashJoin"),
      "exploded query×cell rows must still broadcast onto the cell key")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "nprobe > 1 must widen the candidate set by cell fan-out, never by a scan:\n" + p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected only the rank window's exchange, saw $exchanges:\n$p")
  }

  test("q108: CDC apply anti-joins the snapshot against broadcast batch keys") {
    val p = plan("q108_cdc_apply")
    assert(p.contains("LeftAnti"), "survivors must come from an anti-join")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "a dimension-sized change batch must broadcast, so the snapshot never shuffles:\n" + p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q109: PageRank rounds are keyed equi-joins; nothing funnels to one partition") {
    val p = plan("q109_pagerank")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "rank propagation must join on src, never all-pairs:\n" + p)
    assert(!p.contains("SinglePartition"),
      "no PageRank stage may collapse to one partition:\n" + p)
    assert(p.contains("InMemoryTableScan"),
      "the degree-annotated edge table must be pinned across iterations")
  }

  test("q111: the contamination pair join is chunk-keyed, never all-pairs") {
    val p = plan("q111_contamination_matrix")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "source-pair overlap must come from the chunk equi-join:\n" + p)
  }

  test("q115: the bucketed join shuffles NEITHER side — only the final group-by exchanges") {
    // at toy sizes the dimension side auto-broadcasts (also correct);
    // force the threshold down to pin the AT-SCALE shape, where both
    // sides are too big to broadcast and bucketing must carry the join
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val p = plan("q115_bucketed_join")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "expected a co-located keyed join over the bucketed tables:\n" + p)
      assert("Bucketed: true".r.findAllIn(p).size === 2,
        "both scans must report their bucket layout:\n" + p)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(exchanges <= 1,
        s"bucketed sides must not re-shuffle; expected only the aggregate's exchange, saw $exchanges:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q114: hopping windows are a map-side explode before one aggregate exchange") {
    val p = plan("q114_hopping_window")
    assert(!p.toLowerCase.contains("join"), "window fan-out must be an explode, not a join:\n" + p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected only the (window, type) aggregate exchange, saw $exchanges:\n$p")
  }

  test("q117: the funnel is two aggregates and zero joins — no per-stage cascade") {
    val p = plan("q117_funnel")
    assert(!p.toLowerCase.contains("join"),
      "sequence matching must fold per user, never join per stage:\n" + p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 2,
      s"expected the user group-by and the stage group-by only, saw $exchanges:\n$p")
  }

  test("q110/q113/q118: sketch calibration, priority sample, winsorize keep their small sides broadcast") {
    val p110 = plan("q110_percentile_sketch")
    assert(p110.contains("BroadcastHashJoin"),
      "the per-source sketch values must broadcast back, not shuffle the data:\n" + p110)
    val p113 = plan("q113_priority_sample")
    assert("Exchange hashpartitioning".r.findAllIn(p113).size <= 1,
      "priority sampling is one stratum-keyed window shuffle:\n" + p113)
    assert(!p113.toLowerCase.contains("join"), "no join in the sampler:\n" + p113)
    val p118 = plan("q118_winsorize")
    assert(p118.contains("BroadcastHashJoin"),
      "winsorize bounds are groups-sized and must broadcast:\n" + p118)
    assert(!p118.contains("CartesianProduct") && !p118.contains("BroadcastNestedLoopJoin"))
  }

  test("q126: every sketch build is map-side combined; the compare never touches event-sized frames") {
    val p = plan("q126_cms_merge_shards")
    // 5 builds (4 shards + direct) each aggregate partially before their
    // exchange — the shuffle carries depth·width counters per map task,
    // never keys; partial_count is the map-side combine's signature
    assert(p.contains("partial_count") || p.contains("partial count"),
      "count-min builds must map-side combine:\n" + p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the counter compare is an equi-join on (r, c):\n" + p)
  }

  test("q127: the join-size estimate joins only sketch-sized relations — no event-sized join") {
    val p = plan("q127_join_size_preflight")
    assert(p.contains("partial_count") || p.contains("partial count"),
      "both sketch builds must map-side combine:\n" + p)
    // the only non-equi joins are the broadcast one-row calibration
    // gates (crossJoin of single-row aggregates plans as BNLJ Cross);
    // no unbounded cartesian, and no join keyed on the DATA column —
    // the events table is only ever scanned and aggregated, never
    // joined: that is the whole point of a sketch-side pre-flight
    assert(!p.contains("CartesianProduct"),
      "no unbounded cartesian:\n" + p)
    assert(!"(SortMergeJoin|BroadcastHashJoin) \\[user_id".r.findFirstIn(p).isDefined,
      "no event-keyed join may appear; the pre-flight never joins the data:\n" + p)
  }

  test("q129: the bloom reduction filters the fact scan below the join") {
    val p = plan("q129_bloom_join_reduce")
    assert(p.contains("bloom_contains_long"),
      "the codegen'd bloom predicate must gate the fact side:\n" + p)
    // the predicate must sit on the orders side BEFORE the join operator
    // (scan-adjacent filter), i.e. appear below whichever join runs
    val joinIdx = p.indexOf("Join")
    val bloomIdx = p.indexOf("bloom_contains_long")
    assert(joinIdx >= 0 && bloomIdx > joinIdx,
      "filter must be inside the join's fact-side subtree (printed below it):\n" + p)
  }

  test("q130/q131: path and cohort analytics never join; exchanges are bounded and partial-aggregated") {
    val p130 = plan("q130_session_paths")
    assert(!p130.toLowerCase.contains("join"),
      "paths fold per session then count per path — no join anywhere:\n" + p130)
    assert("Exchange hashpartitioning".r.findAllIn(p130).size <= 3,
      "session window + per-session fold + path count only:\n" + p130)
    assert(p130.contains("TakeOrdered"),
      "only the top-20 paths may leave the executors:\n" + p130)
    val p131 = plan("q131_retention_cohorts")
    assert(!p131.toLowerCase.contains("join"),
      "the cohort triangle needs ZERO joins (per-user state carries first week + week set):\n" + p131)
    assert("Exchange hashpartitioning".r.findAllIn(p131).size <= 2,
      "one user exchange + one cell exchange:\n" + p131)
    val p133 = plan("q133_incremental_rollup")
    assert(!p133.toLowerCase.contains("join"),
      "rollup maintenance is union + re-aggregate, never a join:\n" + p133)
    assert(p133.contains("partial_count") || p133.contains("partial count"),
      "both partials and the merge must map-side combine:\n" + p133)
    val p132 = plan("q132_source_cap")
    assert(!p132.toLowerCase.contains("join"),
      "the cap is windows over one partitioning, no join-back:\n" + p132)
    assert("Exchange hashpartitioning".r.findAllIn(p132).size <= 1,
      "rank and cell-size windows must share the single (source, lang) exchange:\n" + p132)
  }

  test("q112: JSON extraction is a scan-project before one aggregate exchange") {
    val p = plan("q112_json_extract")
    assert(p.contains("from_json"), "expected the explicit-schema JsonToStructs projection")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected only the group-by exchange, saw $exchanges:\n$p")
  }

  test("q121: the persisted-index serve is PARTITION-PRUNED to the probed cells") {
    import graft.llm.Similarity
    val p = plan("q121_ivfpq_persisted")
    assert(p.contains("PartitionFilters: [") && p.contains("cell"),
      "the code-table scan must carry the probed cells as a partition filter:\n" + p)
    // single-query serve: exactly ONE of the cells may be listed/read —
    // the other cells' files are pruned from the file index itself
    val emb = Tables.embeddings(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft-plan-q121").toString
    Similarity.ivfPqWriteIndex(emb, "vec_id", "embedding", tmp,
      cells = 4, m = 4, k = 4, iters = 2)
    // the single-query serve at each probe width may list at most
    // nprobe of the cell partitions — the rest are pruned from the
    // file index itself (deterministic k-means may leave a cell
    // empty on a changed fixture, so the written-partition count is
    // asserted as a lower bound against the read set, not exactly 4)
    def prunedCells(nprobe: Int): (Int, Int) = {
      val served = Similarity.ivfPqServeIndex(spark, tmp, emb, "vec_id",
        "embedding", queryPred = col("vec_id") === 0, topK = 10, nprobe = nprobe)
      // AQE wraps the tree in a leaf AdaptiveSparkPlanExec — descend
      // explicitly or collect sees no scans
      val root = served.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val scans = root.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      val indexScans = scans.filter(
        _.relation.location.rootPaths.exists(_.toString.contains(tmp)))
      assert(indexScans.nonEmpty, "expected a file scan over the persisted index")
      indexScans.map { f =>
        // DPP may add a runtime-subquery filter (unevaluable before
        // execution); the STATIC cell IN (...) literal filter alone
        // must already prune the listing
        val static = f.partitionFilters.filter(_.find(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning])
          .isEmpty)
        assert(static.nonEmpty && static.mkString.contains("cell"),
          s"expected a static cell partition filter, got ${f.partitionFilters}")
        val read = f.relation.location.listFiles(static, f.dataFilters)
        val all = f.relation.location.listFiles(Nil, Nil)
        assert(all.length >= 2 && all.length <= 4,
          s"expected 2..4 written cell partitions, got ${all.length}")
        (read.length, all.length)
      }.head
    }
    val (read1, all1) = prunedCells(1)
    assert(read1 === 1,
      s"one query at nprobe=1 must read ONE of $all1 cell partitions, got $read1")
    val (read2, all2) = prunedCells(2)
    assert(read2 === 2,
      s"one query at nprobe=2 must read TWO of $all2 cell partitions, got $read2")
  }

  test("q125: the skipping read hands the scan ONLY the intersecting files") {
    import graft.sinks.DataSkipping
    // the q125 gate's layout on the real fixture: the pruning decision
    // is DRIVER-SIDE (manifest intersection, like partition pruning),
    // so the pin is on the file set the scan is GIVEN — strictly fewer
    // than the table's files. The rectangle is a corner of this
    // fixture's key space (the gate's own bounds span most of sf0.001's
    // keys — correct there, but nothing to skip)
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-plan-q125").toString
    val m = DataSkipping.writeWithStats(li, tmp,
      graft.functions.ZOrder64(col("l_orderkey"), col("l_partkey")),
      numFiles = 8, statsCols = Seq("l_orderkey", "l_partkey"))
    assert(m.files.length >= 4, s"fixture should spread over files, got ${m.files.length}")
    val bounds = Seq(("l_orderkey", 0L, 150L), ("l_partkey", 0L, 40L))
    val pruned = DataSkipping.readPruned(spark, tmp, bounds)
    assert(pruned.inputFiles.length < m.files.length,
      s"the 2-D corner range must skip files: listed ${pruned.inputFiles.length} of ${m.files.length}")
    // and the answer is still exactly the full scan's filter
    val full = spark.read.parquet(tmp)
      .filter(col("l_orderkey").between(0, 150) && col("l_partkey").between(0, 40))
    assert(pruned.count() === full.count() && full.count() > 0)
  }

  test("q135/q136: grouping lattices are ONE Expand into one aggregation — never a pass per level") {
    Seq("q135_rollup", "q136_grouping_sets").foreach { q =>
      val p = plan(q)
      assert("Expand".r.findAllIn(p).size === 1,
        s"$q must expand grouping sets map-side exactly once:\n$p")
      assert(p.contains("partial_count") || p.contains("partial count"),
        s"$q's lattice aggregation must map-side combine:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q must not cartesian:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"$q's nation dim must broadcast:\n$p")
    }
  }

  test("q139: the attribution join is user-keyed, never a cartesian or per-row range scan") {
    val p = plan("q139_attribution")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the time range must ride the user-key equi-join as a post-condition:\n" + p)
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[user_id".r.findFirstIn(p).isDefined,
      "both streams must hash-exchange on user_id:\n" + p)
  }

  test("q142: every window function rides ONE user_id exchange and sort") {
    val p = plan("q142_window_funcs")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      "lag/lead/row_number/ntile/running-sum must share the single partition ordering:\n" + p)
    assert(!p.toLowerCase.contains("join"), "no join belongs here:\n" + p)
  }

  test("q143: the null-safe join stays a keyed join, never a cartesian") {
    val p = plan("q143_nullsafe_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "null-safe equality must plan as an equi-join:\n" + p)
    assert(p.contains("Join"), "expected a join:\n" + p)
  }

  test("q144: resample+ffill is grid-explode + one fill window — no join, no global calendar") {
    val p = plan("q144_resample_ffill")
    assert(!p.toLowerCase.contains("join"),
      "grid comes from per-key sequence(), never a calendar join:\n" + p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      "per-key bounds agg + fill window only:\n" + p)
    assert(p.contains("Generate"), "expected the sequence() explode:\n" + p)
  }

  test("q150: the star join broadcasts every dimension; nothing degrades to a cartesian") {
    val p = plan("q150_star_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "star dims must ride equi-joins:\n" + p)
    assert(p.contains("BroadcastHashJoin"),
      "the customer→nation→region chain must broadcast:\n" + p)
    // the final aggregation is the plan's only non-broadcast exchange at
    // this scale (AQE turns the fact-fact join into SMJ when orders
    // outgrows the broadcast budget — either is correct; a second hash
    // exchange beyond agg+join is not)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 3,
      "unexpected extra shuffles in the star plan:\n" + p)
  }

  test("q151: the quality report is one fact aggregate + a broadcast anti-join per FK") {
    val p = plan("q151_quality_report")
    assert(p.contains("LeftAnti"), "FK orphans must anti-join:\n" + p)
    assert(!"SortMergeJoin".r.findFirstIn(p).isDefined,
      "the FK probe must broadcast the dim, never shuffle the fact:\n" + p)
    assert(p.contains("Expand"),
      "distinct counts must ride the single-pass aggregate's Expand:\n" + p)
  }

  test("q152: the transition matrix is windows + aggregates — zero joins, ≤3 keyed exchanges") {
    val p = plan("q152_markov_chain")
    assert(!p.toLowerCase.contains("join"), "no join belongs here:\n" + p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 3,
      "lag window + bigram agg + row margin only:\n" + p)
  }

  test("q154: histogram bounds broadcast back over the scan — a one-row nested loop, never a driver collect or fact shuffle") {
    val p = plan("q154_histogram")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the single-row min/max frame must broadcast:\n" + p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      "min/max agg + bucket agg are the only shuffles:\n" + p)
  }

  test("q156: nearest join runs BOTH window directions over ONE key exchange of the merged stream") {
    val p = plan("q156_nearest_join")
    assert(!p.toLowerCase.contains("loopjoin") && !p.contains("CartesianProduct"),
      "nearest must stay a merged-stream scan, never a pair join:\n" + p)
    assert("Window".r.findAllIn(p).size >= 2, "expected the two scan directions:\n" + p)
    // one exchange feeds both directions (they share the partition key);
    // the only other is the snapshot side's dedup aggregate
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      "both window directions must share the merged stream's key exchange:\n" + p)
  }

  test("q157: the correlated subquery is DECORRELATED to one window — no self-join, one part-keyed exchange chain") {
    val p = plan("q157_below_avg")
    assert(!p.toLowerCase.contains("join"),
      "the per-part average must come from a window, not a self-join:\n" + p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      "part window + returnflag agg are the only shuffles:\n" + p)
  }

  test("q158: hopping distinct dedups map-side through the Expand rewrite — the fan-out never reaches one reducer raw") {
    val p = plan("q158_hopping_distinct")
    assert(p.contains("Generate") || p.contains("Expand"),
      "expected the window explode:\n" + p)
    assert(p.contains("partial_count") || p.contains("partial count"),
      "the distinct aggregate must partial-aggregate:\n" + p)
    assert(!p.toLowerCase.contains("join"), "no join belongs here:\n" + p)
  }

  test("q160: top-unshipped exits via TakeOrdered — a k-row driver result, never a global sort") {
    val p = plan("q160_top_unshipped")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must ride TakeOrdered, not Sort+Limit:\n" + p)
    assert(p.contains("BroadcastHashJoin"), "the customer filter must broadcast:\n" + p)
    assert(!p.contains("CartesianProduct"))
  }

  test("q172: collocation top-k exits via TakeOrdered; the only cross is the broadcast one-row totals") {
    val p = plan("q172_collocations")
    assert(p.contains("TakeOrderedAndProject"),
      "the vocabulary must never globally sort:\n" + p)
    assert(!p.contains("CartesianProduct"), "no data-sized cross:\n" + p)
  }

  test("q173: the LM score joins are keyed — no cross anywhere") {
    val p = plan("q173_bigram_lm")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "count joins must stay keyed:\n" + p)
  }

  test("q178: BM25 serve exits via TakeOrdered over the pruned postings") {
    val p = plan("q178_bm25_topk")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must ride TakeOrdered, not Sort+Limit:\n" + p)
    assert(!p.contains("CartesianProduct"))
  }

  test("q188: the one-partition read prunes at the listing via PartitionFilters") {
    val p = plan("q188_hive_partitions")
    assert(p.contains("PartitionFilters") && p.contains("event_type"),
      "the partition predicate must reach partition discovery, not the row filter:\n" + p)
  }

  test("q192: hybrid rerank prunes candidates with a semi-join BEFORE the quantize pass; only the broadcast query crosses") {
    val p = plan("q192_hybrid_search")
    assert(p.contains("LeftSemi"),
      "the candidate semi-join must restrict the corpus before scoring:\n" + p)
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the query side must broadcast:\n" + p)
    assert(!p.contains("CartesianProduct"))
  }

  test("q161: equi-depth boundaries come from the PARALLEL ranking — range partition, no data window through one task") {
    val p = plan("q161_equi_depth")
    assert(p.toLowerCase.contains("rangepartitioning"),
      "quartile ranks must ride the StableIds range partition:\n" + p)
    assert(!p.contains("Window"),
      "no global cumulative window may touch row-sized data:\n" + p)
  }

  test("q162: the incremental session fold is windows + aggregates over the user key — zero joins") {
    val p = plan("q162_incremental_sessions")
    assert(!p.toLowerCase.contains("join"),
      "state folds in as pseudo-events via union, never a join:\n" + p)
    assert(p.contains("Window"), "expected the islands window:\n" + p)
  }

  test("q141: auto-salt aggregates in two phases; events are scanned, never joined") {
    val p = plan("q141_auto_salt")
    assert(!"(SortMergeJoin|ShuffledHashJoin)".r.findFirstIn(p).isDefined,
      "only the broadcast one-row calibration join may appear:\n" + p)
    assert(p.contains("partial_count") || p.contains("partial count"),
      "the salted phase-1 aggregate must map-side combine:\n" + p)
    assert(p.contains("__salt") || p.contains("pmod"),
      "phase 1 must group by (keys, salt):\n" + p)
  }

  test("q197: the composed pre-flight never plans a cartesian or a data-keyed merge join") {
    val p = plan("q197_join_preflight")
    // all cross-joins are broadcast one-row report/calibration shapes;
    // the only key-equi joins allowed are the sketch (r, c) joins and
    // the gate's own exact-check join — never a data-sized cartesian
    assert(!p.contains("CartesianProduct"),
      "no unbounded cartesian:\n" + p)
    assert(p.contains("partial_count") || p.contains("partial count"),
      "the sketch builds must map-side combine:\n" + p)
  }
}
