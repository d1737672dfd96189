package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSuite

class LlmSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
    (3L, "completely different content about spark shuffles and partition pruning for scale"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (5L, "le chat et le chien et la maison de la ville en un jour"))
    .toDF("doc_id", "text")

  test("exact dedup: identical texts share a group with min-id canonical") {
    val byId = Dedup.exactDupGroups(docs, "doc_id", "text")
      .select("doc_id", "group_size", "canonical_id")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(byId(1L) === ((2L, 1L)))
    assert(byId(4L) === ((2L, 1L)))
    assert(byId(3L) === ((1L, 3L)))
  }

  test("minhash: identical docs have identical signatures; signature length = numSig") {
    val sigs = docs.select(col("doc_id"), Dedup.minhash(Dedup.shingleHashSet(col("text")), 12).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L).length === 12)
    assert(sigs(1L) === sigs(4L))
    assert(sigs(1L) !== sigs(3L))
  }

  test("LSH near-dup pairs: exact dup J=1, near-dup found, unrelated absent, no all-pairs plan") {
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text")
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "candidate generation must not be all-pairs")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "candidate generation must not be all-pairs")
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got.contains((1L, 4L)) && got((1L, 4L))._1 === got((1L, 4L))._2) // J = 1
    assert(got.contains((1L, 2L))) // near-dup
    assert(!got.keySet.exists { case (a, b) => a == 3L || b == 3L }) // unrelated
  }

  test("band bucket stats: exact dups share every band's bucket; max_bucket flags them") {
    val stats = Dedup.bandBucketStats(docs, "doc_id", "text")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stats.keySet === (0 until 6).toSet) // numSig=12 / bandRows=2
    // docs 1 and 4 are identical → every band has a bucket of ≥ 2
    assert(stats.values.forall { case (maxB, _) => maxB >= 2L })
    // no bucket can exceed the corpus size
    assert(stats.values.forall { case (maxB, _) => maxB <= 5L })
  }

  test("char-ngram Jaccard pairs: near-dups found, unrelated absent, no all-pairs plan") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text")
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    val keys = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys.contains((1L, 4L))) // exact dup
    assert(keys.contains((1L, 2L))) // one-word edit: char 5-grams overlap heavily
    assert(!keys.exists { case (a, b) => a == 3L || b == 3L }) // unrelated
  }

  test("bpe tokens and rolling hash: counts, order sensitivity, empty-doc zero") {
    val d = Seq(
      (1L, "It's 42 degrees, okay?"),
      (2L, "alpha beta gamma"),
      (3L, "gamma beta alpha"), // permutation: same token SET, different order
      (4L, "")).toDF("doc_id", "text")
    val got = d.select(col("doc_id"),
        TextAnalysis.bpeTokenCount(col("text")).as("n"),
        TextAnalysis.rollingHash(TextAnalysis.tokens(col("text"))).as("rh"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // it|'s| 42| degrees|,| okay|? → 7 pieces
    assert(got(1L)._1 === 7L)
    assert(got(2L)._2 !== got(3L)._2) // order-sensitive
    assert(got(4L) === ((0L, 0L)))
  }

  test("simhash: near-dups are close in hamming distance, unrelated docs far") {
    val sh = docs.select(col("doc_id"), Dedup.simhash16(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(4L)) === 0)
    assert(ham(sh(1L), sh(2L)) < ham(sh(1L), sh(5L)))
  }

  test("text analysis: language ID and quality gate") {
    val toks = TextAnalysis.tokens(col("text"))
    val r = docs.select(col("doc_id"), TextAnalysis.langGuess(toks).as("lang"),
        TextAnalysis.isQuality(TextAnalysis.tokenCount(toks),
          TextAnalysis.stopwordCount(toks, TextAnalysis.EnStop)).as("q"))
      .collect().map(x => x.getLong(0) -> ((x.getString(1), x.getBoolean(2)))).toMap
    assert(r(1L)._1 === "en" && r(1L)._2)
    assert(r(5L)._1 === "fr")
  }

  test("fingerprint: case/punctuation/whitespace-insensitive") {
    val two = Seq((1L, "Hello, World!  Again"), (2L, "hello world again")).toDF("id", "text")
    val fps = two.select(TextAnalysis.fingerprint(TextAnalysis.tokens(col("text"))))
      .as[String].collect()
    assert(fps(0) === fps(1))
  }

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.999f, 0.01f, 0.0f), 0),  // nearest to 0
    (2L, Array(0.7f, 0.7f, 0.0f), 0),
    (3L, Array(-1.0f, 0.0f, 0.0f), 1),
    (4L, Array(0.0f, 1.0f, 0.0f), 1))
    .toDF("vec_id", "embedding", "label")

  test("ANN brute force: self excluded, nearest first, k respected") {
    val r = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", col("vec_id") === 0, 2)
      .orderBy("rank").collect()
    assert(r.length === 2)
    assert(r(0).getLong(1) === 1L) // rank 1 = closest
    assert(r(1).getLong(1) === 2L)
    assert(!r.map(_.getLong(1)).contains(0L))
  }

  test("ANN bucketed: candidates restricted to the query's bucket") {
    val r = Similarity.bucketedTopK(vecs, "vec_id", "embedding", "label", col("vec_id") === 3, 5)
      .collect()
    assert(r.map(_.getLong(1)).toSet === Set(4L)) // only label-1 neighbors
  }

  test("LSH bucket id is deterministic and within range") {
    val b = vecs.select(Similarity.lshBucket(col("embedding")).as("b")).as[Int].collect()
    val b2 = vecs.select(Similarity.lshBucket(col("embedding")).as("b")).as[Int].collect()
    assert(b.toSeq === b2.toSeq)
    assert(b.forall(x => x >= 0 && x < 16))
  }

  test("curation pipeline: exact dup collapses, near-dup higher id drops, non-en and junk filtered") {
    val corpus = docs.unionByName(Seq(
      (6L, "zz qq xx"), // too short + no stopwords → quality-filtered
      (7L, docs.filter(col("doc_id") === 3).select("text").as[String].head())) // exact dup of 3
      .toDF("doc_id", "text"))
    val out = CurationPipeline.curate(corpus, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(out.contains(1L))   // canonical of exact group {1,4}
    assert(!out.contains(4L))  // exact dup of 1
    assert(!out.contains(2L))  // near-dup of 1, higher id
    assert(out.contains(3L))   // unique en doc survives; its dup 7 dropped
    assert(!out.contains(7L))
    assert(!out.contains(5L))  // french → language gate
    assert(!out.contains(6L))  // junk → quality gate
  }

  test("frame samples: stride windows with hashes; short payloads give one truncated frame") {
    val assets = Multimodal.assetsFromText(
      Seq((1L, "x" * 100), (2L, "ab")).toDF("doc_id", "text"), "doc_id", "text")
    val got = Multimodal.frameSamples(assets, frameLen = 64, stride = 48)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    // asset 1: len 100 → last start idx floor((100-64)/48)=0 → frame 0 only
    // asset 2: len 2 < frameLen → single truncated frame 0
    assert(got === Seq((1L, 0L, 1L), (2L, 0L, 1L)))
    val long = Multimodal.frameSamples(
      Multimodal.assetsFromText(Seq((3L, "y" * 200)).toDF("doc_id", "text"), "doc_id", "text"),
      frameLen = 64, stride = 48).collect()
    // len 200 → floor((200-64)/48)=2 → frames 0,1,2 at offsets 1,49,97
    assert(long.map(r => (r.getLong(1), r.getLong(2))).sorted.toSeq ===
      Seq((0L, 1L), (1L, 49L), (2L, 97L)))
  }

  test("sequence packing: exact coverage, budget respected, deterministic") {
    val corpus = (0L until 100L).map(i =>
      (i, ("tok " * (5 + (i % 17)).toInt).trim)).toDF("doc_id", "text")
    def pack() = Sampling.packSequences(corpus, "doc_id", "text",
      tokenBudget = 40, numGroups = 4).collect()
    val seqs = pack()
    // every document appears exactly once across all sequences
    assert(seqs.flatMap(_.doc_ids).sorted.toSeq === (0L until 100L))
    // no multi-doc sequence exceeds the budget
    seqs.filter(_.n_docs > 1).foreach(s =>
      assert(s.total_tokens <= 40, s"${s.seq_id} over budget"))
    // totals are the real token counts
    assert(seqs.map(_.total_tokens).sum === (0L until 100L).map(i => 5 + (i % 17)).sum)
    // deterministic across re-execution
    assert(seqs.map(s => s.seq_id -> s.doc_ids.toSeq).toMap ===
      pack().map(s => s.seq_id -> s.doc_ids.toSeq).toMap)
    // ...and equal to a driver-side replay of the portable-hash greedy
    // (the same fold the DuckDB oracle runs as a recursive CTE): the
    // result depends only on (id, tokens, budget, groups), never on
    // Spark's partitioner.
    def h32(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
    val expected = (0L until 100L).map(i => (i, 5L + i % 17))
      .groupBy { case (id, _) => h32(id.toString) % 4 }.values.flatMap { grp =>
        val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
        var cur = Vector.empty[Long]; var tot = 0L
        grp.sortBy(_._1).foreach { case (id, n) =>
          if (cur.nonEmpty && tot + n > 40) { out += cur; cur = Vector.empty; tot = 0 }
          cur :+= id; tot += n
        }
        if (cur.nonEmpty) out += cur
        out.map(ids => s"s${ids.head}" -> ids)
      }.toMap
    assert(seqs.map(s => s.seq_id -> s.doc_ids.toSeq).toMap === expected)
    // an oversize document gets its own sequence rather than being lost
    val big = Seq((1L, ("w " * 100).trim), (2L, "a b c")).toDF("doc_id", "text")
    val bigSeqs = Sampling.packSequences(big, "doc_id", "text", 10).collect()
    assert(bigSeqs.flatMap(_.doc_ids).sorted.toSeq === Seq(1L, 2L))
    assert(bigSeqs.find(_.doc_ids.contains(1L)).get.n_docs === 1)
  }

  test("redaction: cascade replaces emails, IPs, long digit runs; counts match") {
    val df = Seq(
      (1L, "Mail Bob@Example.COM or call 12345678 from 10.0.0.1 now"),
      (2L, "nothing sensitive here 123456")) // 6 digits: below the 7+ run
      .toDF("doc_id", "text")
    val got = df.select(
      col("doc_id") +: TextAnalysis.redactionCounts(col("text")) :+
        TextAnalysis.redact(col("text")).as("red"): _*)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // case OUTSIDE matches is preserved; the email match itself is
    // case-insensitive (ADVICE r5: redact must not lowercase the stream)
    assert(got(1L) === ((1L, 1L, 1L, "Mail <email> or call <num> from <ip> now")))
    assert(got(2L) === ((0L, 0L, 0L, "nothing sensitive here 123456")))
  }

  test("stratified sample: k per stratum, deterministic, subset-stable") {
    val df = (0L until 200L).map(i => (i, (i % 4).toInt)).toDF("id", "stratum")
    val got = Sampling.stratifiedSample(df, "id", "stratum", 5).collect()
    assert(got.length === 20)
    assert(got.groupBy(_.getInt(1)).forall(_._2.length === 5))
    val again = Sampling.stratifiedSample(df, "id", "stratum", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted
    assert(again.toSeq === got.map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq)
    // rank-k prefix property: the k=3 sample is a prefix of the k=5 one
    val small = Sampling.stratifiedSample(df, "id", "stratum", 3)
      .collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(got.map(_.getLong(0)).toSet))
  }

  test("priority sample: weight bias, equal-weight reduction, loud non-positive weights") {
    val df = (0L until 400L).map(i => (i, (i % 2).toInt,
      if (i % 2 == 0) 100L else 1L)).toDF("id", "stratum", "w")
    // within one stratum all weights are equal → selection must equal
    // the unweighted stratified sample's ids
    val eq = Sampling.prioritySample(df.filter(col("stratum") === 0), "id", "w", "stratum", 7)
      .collect().map(_.getLong(0)).toSet
    val strat = Sampling.stratifiedSample(df.filter(col("stratum") === 0), "id", "stratum", 7)
      .collect().map(_.getLong(0)).toSet
    assert(eq === strat)
    // weight bias: mix both weights in ONE stratum — heavy rows (w=100)
    // must dominate the winners
    val mixed = df.withColumn("stratum", lit(0))
    val winners = Sampling.prioritySample(mixed, "id", "w", "stratum", 40)
      .collect().map(r => r.getLong(2)).toSeq
    assert(winners.count(_ == 100L) > 30,
      s"expected heavy-weight dominance, got ${winners.count(_ == 100L)}/40")
    // deterministic across partitionings
    val a = Sampling.prioritySample(mixed.repartition(2), "id", "w", "stratum", 10)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.prioritySample(mixed.repartition(13), "id", "w", "stratum", 10)
      .collect().map(_.getLong(0)).toSet
    assert(a === b)
    // non-positive weight raises
    val bad = Seq((1L, 0, 0L)).toDF("id", "stratum", "w")
    val e = intercept[Exception] {
      Sampling.prioritySample(bad, "id", "w", "stratum", 1).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("non-positive weight")))
    // a fractional weight in (0, 1) truncates to 0 under the integral
    // cast — it must ALSO raise, not silently win every slot with a
    // NULL priority that sorts first
    val frac = Seq((1L, 0, 0.5), (2L, 0, 2.0)).toDF("id", "stratum", "w")
    val ef = intercept[Exception] {
      Sampling.prioritySample(frac, "id", "w", "stratum", 1).count()
    }
    assert(messages(ef).exists(_.contains("non-positive weight")))
    // fractional weights >= 1 floor and pass
    val ok = Seq((1L, 0, 1.5), (2L, 0, 200.0)).toDF("id", "stratum", "w")
    assert(Sampling.prioritySample(ok, "id", "w", "stratum", 2).count() === 2)
  }

  test("winsorize: clips into the band, preserves rows, survives null values") {
    // 20 rows, v = id*10 except two planted outliers; p10 bound =
    // 2nd-smallest value (ceil(20·10/100)=2 → 20), p90 = 18th (= 180)
    val df = (1L to 20L).map(i =>
      ("a", i, if (i == 1) -1000L else if (i == 20) 99999L else i * 10L))
      .toDF("g", "id", "v")
    val out = TextAnalysis.winsorize(df, "g", "v", 10, 90)
    assert(out.count() === 20) // clip, never drop
    val w = out.select("id", "v_w").as[(Long, Long)].collect().toMap
    assert(w(1L) === 20L)    // low outlier raised to the p10 bound
    assert(w(20L) === 180L)  // high outlier lowered to the p90 bound
    assert(w(19L) === 180L)  // 190 sits above the p90 bound too
    // interior values untouched
    assert((2L to 18L).forall(i => w(i) === i * 10L))
    // a group whose values are ALL NULL: bounds are null too and the
    // NULL guard keeps every output NULL (no poisoning)
    val nulls = Seq(("b", 1L, None: Option[Long]), ("b", 2L, None))
      .toDF("g", "id", "v")
    val outN = TextAnalysis.winsorize(nulls, "g", "v", 5, 95)
    assert(outN.count() === 2)
    assert(outN.filter(col("v_w").isNotNull).count() === 0)
    // MIXED null/non-null group: bounds are non-null (computed from the
    // non-null values), and a NULL value must stay NULL — greatest/least
    // skip NULLs, so the unguarded form would fabricate the LOW bound
    val mixed = (Seq(("c", 0L, None: Option[Long])) ++
      (1L to 20L).map(i => ("c", i, Some(i * 10L)))).toDF("g", "id", "v")
    val outM = TextAnalysis.winsorize(mixed, "g", "v", 10, 90)
    assert(outM.count() === 21)
    val mm = outM.select("id", "v_w").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(mm(0L) === None, "NULL value must stay NULL, not clip to the low bound")
    assert(mm(1L) === Some(20L)) // non-null rows still clip
    intercept[IllegalArgumentException] { TextAnalysis.winsorize(df, "g", "v", 95, 5) }
  }

  test("decontamination: eval fragments match their source docs") {
    val t1 = (1 to 20).map(i => s"tok$i").mkString(" ")
    val train = Seq((1L, t1), (2L, (1 to 20).map(i => s"other$i").mkString(" ")))
      .toDF("doc_id", "text")
    val eval = Seq((100L, (1 to 10).map(i => s"tok$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.crossCorpusChunkMatches(train, eval, "doc_id", "text", w = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // eval doc = first 10 tokens of train doc 1 → windows at starts 1..3
    assert(got === Map((1L, 100L) -> 3L))
  }

  test("chunk match pairs: shared 8-token windows counted once per doc, disjoint docs absent") {
    val shared = (1 to 10).map(i => s"tok$i")
    val docs = Seq(
      (1L, (shared ++ Seq("alpha", "beta")).mkString(" ")),
      (2L, (shared ++ Seq("gamma", "delta")).mkString(" ")),
      (3L, (1 to 12).map(i => s"other$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.chunkMatchPairs(docs, "doc_id", "text", w = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // docs 1 and 2 share windows starting at tokens 1..3 (a window fits
    // inside the 10 common tokens iff start + 7 <= 10) → 3 shared chunks;
    // doc 3 shares nothing
    assert(got === Map((1L, 2L) -> 3L))
  }

  test("cluster canonicalization: chains and stars collapse to the component minimum") {
    // star 1~3, 2~3: pairwise drop-id_b would keep {1, 2}; cluster
    // canonicalization maps all three to component min 1
    val star = Seq((1L, 3L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Dedup.canonicalizeClusters(star).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // a 10-node path converges (pointer jumping: O(log diameter) rounds)
    val chain = (0L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val g2 = Dedup.canonicalizeClusters(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g2 === (0L to 9L).map(_ -> 0L).toMap)
  }

  test("incremental near-dups: batch vs signature store finds near/exact matches only") {
    val store = Dedup.signatureTable(docs, "doc_id", "text")
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact text of 1/4
      (102L, "entirely novel subject matter discussing oceans tides and the moon phases"))
      .toDF("doc_id", "text")
    val res = Dedup.incrementalNearDups(
      Dedup.signatureTable(batch, "doc_id", "text"), store)
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    val got = res.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // identical text → identical signature → all 12 components match
    assert(got((101L, 1L)) === 12L && got((101L, 4L)) === 12L)
    // near-dup of 1 (doc 2) should also collide and agree on >= 6 components
    assert(got.contains((101L, 2L)))
    // the novel doc matches nothing in the store
    assert(!got.keySet.exists(_._1 == 102L))
  }

  test("tf-idf top terms: each doc's unique term outranks the shared filler") {
    val corpus = Seq(
      (1L, "apple apple apple common common filler"),
      (2L, "banana banana common common filler"),
      (3L, "cherry common filler"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.topTermsTfidf(corpus, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(5)) -> (r.getString(1), r.getLong(4))).toMap
    // rank 1 = the doc-unique term: tf * 1e6 * 3 / df with df=1 dominates
    assert(got((1L, 1L))._1 === "apple" && got((1L, 1L))._2 === 9000000L)
    assert(got((2L, 1L))._1 === "banana" && got((2L, 1L))._2 === 6000000L)
    assert(got((3L, 1L))._1 === "cherry" && got((3L, 1L))._2 === 3000000L)
    // rank 2 ties between common/filler resolve on the term string
    assert(got((3L, 2L))._1 === "common")
  }

  test("c4 line cleaning: short, unterminated, and blocklisted lines drop; order kept") {
    val doc = Seq(
      "the first good line stays here.",
      "too short.",                       // < 3 tokens
      "this line has no terminal punctuation",
      "click here javascript required line.", // blocklist
      "another keeper line ends well!",
      "  padded keeper line survives trimming?  ").mkString("\n")
    val got = Seq((1L, doc)).toDF("doc_id", "text")
      .select(TextAnalysis.c4CleanedLines(col("text")).as("kept"))
      .head().getSeq[String](0)
    assert(got === Seq("the first good line stays here.",
      "another keeper line ends well!",
      "  padded keeper line survives trimming?  "))
  }

  test("group percentiles: histogram-exact p50/p90 with ceil rank semantics") {
    val rows = (1L to 10L).map(i => ("a", i)) ++ Seq(("b", 100L), ("b", 200L), ("b", 300L))
    val got = TextAnalysis.groupPercentiles(rows.toDF("grp", "v"), "grp", "v", Seq(50, 90))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // a: n=10 → p50 = 5th smallest = 5, p90 = 9th = 9
    assert(got("a") === ((10L, 1L, 10L, 5L, 9L)))
    // b: n=3 → p50 = ceil(1.5)=2nd = 200, p90 = ceil(2.7)=3rd = 300
    assert(got("b") === ((3L, 100L, 300L, 200L, 300L)))
  }

  test("k-means: obvious clusters separate; assignment deterministic across runs") {
    val vecs = Seq(
      (1L, Array(10.0f, 10.0f)),
      (2L, Array(10.5f, 9.5f)),
      (3L, Array(-10.0f, -10.0f)),
      (4L, Array(-9.5f, -10.5f)),
      (5L, Array(-10.2f, -9.8f)))
      .toDF("vec_id", "embedding")
    def run() = Similarity.kmeansAssign(vecs, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = run()
    assert(a(1L) === a(2L))
    assert(a(3L) === a(4L) && a(4L) === a(5L))
    assert(a(1L) !== a(3L))
    assert(a === run()) // seeds/means are hash-derived, never rand
  }

  test("multi-fit k-means law: shared-pass training ≡ one kmeansFitQuantized per spec, and N = row count") {
    // mixed-sign, asymmetric vectors; dim 6 splits into 3 slices of 2 —
    // plus a whole-vector "coarse" spec with a different k, the exact
    // composition pqTrainWithCoarse batches into shared passes
    val vecs = (1L to 40L).map { i =>
      (i, Array(i.toFloat, -2.0f * i, (i % 7).toFloat - 3.0f,
        (i % 5).toFloat, -(i % 11).toFloat, 0.5f * i))
    }.toDF("vec_id", "embedding")
    val q = graft.llm.Dedup.once(
        vecs.select(col("vec_id").as("id"), col("embedding").as("__v")),
        "qv", Similarity.quantize(col("__v")))
      .select(col("id"), col("qv"))
    val specs = Seq((0, 2, 3), (2, 2, 3), (4, 2, 3), (0, 6, 2))
    val (multi, n) = Similarity.kmeansFitMultiQuantized(q, specs, iters = 3)
    assert(n === 40L)
    specs.zipWithIndex.foreach { case ((off, len, k), j) =>
      val single = Similarity.kmeansFitQuantized(
        q.select(col("id"), slice(col("qv"), off + 1, len).as("qv")),
        k, iters = 3)
      assert(multi(j) === single, s"spec $j (off=$off len=$len k=$k)")
    }
  }

  test("cluster canonicalization: empty pair graph returns empty, non-integral ids fail fast") {
    // zero verified pairs is the ordinary clean-corpus case — must exit
    // at the immediate fixpoint, not NPE on a null label sum
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.canonicalizeClusters(empty).collect().isEmpty)
    // string ids would silently cast to NULL edges; the contract is an
    // analysis-time error telling the caller to map ids first
    val strs = Seq(("doc-1", "doc-2")).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException] {
      Dedup.canonicalizeClusters(strs)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("curation with clusterCanonical: only each near-dup cluster's minimum survives") {
    val base = "the quick brown fox jumps over the lazy dog and then the day is done for all of us here"
    val corpus = Seq(
      (1L, base),
      (2L, base + " tail marker one"),
      (3L, base + " tail marker one extra two"),
      (50L, "a completely different document about trains and the schedules that they keep for the winter"))
      .toDF("doc_id", "text")
    val got = CurationPipeline.curate(corpus, "doc_id", "text",
      CurationPipeline.Config(clusterCanonical = true))
      .collect().map(_.getLong(0)).toSet
    // 1~2~3 form one near-dup cluster → canonical 1 survives; 50 untouched
    assert(got === Set(1L, 50L))
  }

  test("bucket cost profile: exact in-bucket pair counts") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"), (6L, "c"))
      .toDF("id", "bucket")
    val r = Similarity.bucketCostProfile(df, "bucket").collect().head
    // buckets a:3 b:2 c:1 → pairs 3 + 1 + 0 = 4
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) === (3L, 3L, 6L, 4L))
  }

  test("sequence packing: output independent of physical parallelism; default group count fixed") {
    val corpus = (0L until 100L).map(i =>
      (i, ("tok " * (5 + (i % 17)).toInt).trim)).toDF("doc_id", "text")
    def packOn(df: org.apache.spark.sql.DataFrame) =
      Sampling.packSequences(df, "doc_id", "text", tokenBudget = 40)
        .collect().map(s => s.seq_id -> s.doc_ids.toSeq).toMap
    // same packing whether the input arrives as 1 split or 13: the group
    // key is the portable id hash, never the physical partitioning
    assert(packOn(corpus.repartition(1)) === packOn(corpus.repartition(13)))
    // the default group count is a fixed constant, not defaultParallelism
    // — the same job on a different cluster must pack identically
    assert(Sampling.DefaultPackGroups === 256)
  }

  test("curation options: repetition gate drops boilerplate, splits column appended") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and then the day is done for all of us here"),
      (2L, "the spam line is the spam line is the spam line is the spam line is the spam line is the spam line is"))
      .toDF("doc_id", "text")
    val cfg = CurationPipeline.Config(
      maxRepBp = Some(3000), splits = Some(Seq(("train", 50), ("eval", 50))))
    val got = CurationPipeline.curate(corpus, "doc_id", "text", cfg).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L)) // doc 2: rep_bp ~ 7700 → dropped
    assert(got.head.schema.fieldNames.contains("split"))
    assert(Set("train", "eval").contains(got.head.getAs[String]("split")))
    // defaults unchanged: no split column, boilerplate kept
    val plain = CurationPipeline.curate(corpus, "doc_id", "text")
    assert(!plain.columns.contains("split"))
    assert(plain.count() === 2)
  }

  test("hash split: partitions the corpus, stable across recomputation, ~expected sizes") {
    val ids = spark.range(0, 2000).toDF("id")
    val splits = Seq(("train", 90), ("val", 5), ("test", 5))
    def assign() = ids.select(col("id"), Sampling.splitAssign(col("id"), splits).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = assign()
    assert(a === assign()) // deterministic
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts.keySet === Set("train", "val", "test")) // total partition
    assert(counts("train") > 1600 && counts("val") < 200 && counts("test") < 200)
    // sampleGate(p) agrees with bucket arithmetic: gate(100) keeps all, gate(0) none
    assert(ids.filter(Sampling.sampleGate(col("id"), 100)).count() === 2000)
    assert(ids.filter(Sampling.sampleGate(col("id"), 0)).count() === 0)
  }

  test("multimodal downsample: every k-th byte kept, empty and short payloads safe") {
    val assets = Multimodal.assetsFromText(
      Seq((1L, "abcdefghij"), (2L, "x"), (3L, "")).toDF("doc_id", "text"), "doc_id", "text")
    val got = Multimodal.downsample(assets, 3).collect()
      .map(a => a.asset_id -> new String(a.content, "UTF-8")).toMap
    assert(got === Map(1L -> "adgj", 2L -> "x", 3L -> ""))
    // factor 1 is the identity
    val id = Multimodal.downsample(assets, 1).collect()
      .map(a => a.asset_id -> new String(a.content, "UTF-8")).toMap
    assert(id(1L) === "abcdefghij")
  }

  test("multimodal: partition-batched extraction is deterministic with fixed feature shape") {
    val assets = Multimodal.assetsFromText(docs, "doc_id", "text")
    val f = Multimodal.extractFeatures(assets).collect().sortBy(_.asset_id)
    assert(f.length === 5)
    assert(f.forall(_.features.length === Multimodal.FakeDecoder.FeatureDim))
    assert(f(0).n_bytes === docs.orderBy("doc_id").select(length(col("text"))).as[Int].head().toLong)
    // exact dup docs 1 and 4 → identical content hash and features
    assert(f(0).content_hash === f(3).content_hash)
    assert(f(0).features.toSeq === f(3).features.toSeq)
    val head = Multimodal.sampleHead(assets, 4).select("head_hex").as[String].collect()
    assert(head.forall(_.length === 8))
  }

  test("header decode: PNG IHDR and JPEG SOF dimensions parse; malformed bytes degrade safely") {
    import graft.llm.Multimodal.HeaderDecoder.decode
    import graft.queries.LlmQueries.mediaAsset
    // planted fixtures round-trip (multi-byte big-endian dims included)
    assert(decode(mediaAsset(1999 * 3).content) === (("png", Some(1999 * 3 % 2000 + 1), Some(1999 * 3 % 997 + 1))))
    assert(decode(mediaAsset(601).content) === (("jpeg", Some(601 % 500 + 17), Some(601 % 700 + 9))))
    assert(decode(mediaAsset(5).content) === (("unknown", None, None)))
    // truncated PNG (signature only, IHDR outside the bytes)
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    assert(decode(sig) === (("unknown", None, None)))
    // zero-dimension PNG is invalid per spec → png with null dims
    val zero = mediaAsset(0).content.clone()
    java.util.Arrays.fill(zero, 16, 24, 0.toByte)
    assert(decode(zero) === (("png", None, None)))
    // JPEG: SOS before any SOF → no dimensions; corrupt segment length → safe
    val sos = Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x04, 0, 0).map(_.toByte)
    assert(decode(sos) === (("jpeg", None, None)))
    val corrupt = Array(0xff, 0xd8, 0xff, 0xfe, 0x00, 0x01).map(_.toByte)
    assert(decode(corrupt) === (("jpeg", None, None)))
    // fill bytes before the SOF marker are tolerated
    val jp = mediaAsset(601).content
    val filled = jp.take(8) ++ Array(0xff.toByte) ++ jp.drop(8)
    assert(decode(filled) === (("jpeg", Some(601 % 500 + 17), Some(601 % 700 + 9))))
    assert(decode(Array.empty[Byte]) === (("unknown", None, None)))
  }

  test("pin/release lifecycle: repeated pins reuse the cache; release empties it") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val labels = Dedup.canonicalizeClusters(pairs)
    assert(labels.storageLevel !== org.apache.spark.storage.StorageLevel.NONE,
      "the loop-final frame is returned pinned")
    // a second invocation of the SAME graph must reuse the cached rounds
    // (pin guard), not issue duplicate persists — and still be correct
    val again = Dedup.canonicalizeClusters(pairs)
    assert(again.collect().toSet === labels.collect().toSet)
    Caching.release(labels)
    assert(labels.storageLevel === org.apache.spark.storage.StorageLevel.NONE,
      "release must drop the cache entry")
    // release is a safe no-op on a never-pinned frame
    Caching.release(pairs)
    // pin on an already-cached plan does not re-persist (no-throw, same level)
    val p1 = Caching.pin(pairs.select(col("id_a")))
    val lvl = p1.storageLevel
    val p2 = Caching.pin(pairs.select(col("id_a")))
    assert(p2.storageLevel === lvl)
    Caching.release(p1)
    assert(p2.storageLevel === org.apache.spark.storage.StorageLevel.NONE)
  }

  test("semantic dedup: exact copies collapse to min id transitively; distinct vectors survive") {
    // 1 ≈ 2 ≈ 3 (copies: closure must chain them all to 1), 10/11 distinct
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)),
      (3L, Array(1.0f, 0.0f, 0.0f)),
      (10L, Array(0.0f, 1.0f, 0.0f)),
      (11L, Array(0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.semanticDedup(emb, "vec_id", "embedding",
        k = 2, iters = 2, num = 19, den = 20)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) === ((1L, 1L)))
    assert(got(2L) === ((1L, 0L)))
    assert(got(3L) === ((1L, 0L)))
    assert(got(10L)._2 === 1L && got(11L)._2 === 1L)
    assert(got.values.count(_._2 == 1L) === 3)
  }

  test("ivf-pq persisted index: model sidecar round-trips exactly; serve equals in-memory search") {
    val emb = (0L until 64L).map(i => (i, Array(
        (i % 4).toFloat, ((i / 4) % 4).toFloat,
        ((i * 3) % 5).toFloat, ((i * 7) % 5).toFloat)))
      .toDF("vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivfpq-rt").toString
    val model = Similarity.ivfPqWriteIndex(emb, "vec_id", "embedding", tmp,
      cells = 3, m = 2, k = 3, iters = 2)
    // the sidecar is all longs — parse must reproduce the model exactly
    assert(Similarity.readIvfPqModel(spark, tmp) === model)
    // the persisted serve is bit-identical to the in-memory composition
    val pred = col("vec_id") % 16 === 0
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id", "adc_dist", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    val inMem = Similarity.ivfPqTopK(emb, "vec_id", "embedding", pred,
      cells = 3, m = 2, k = 3, iters = 2, topK = 5)
    val served = Similarity.ivfPqServeIndex(spark, tmp, emb, "vec_id",
      "embedding", pred, topK = 5, nprobe = 1)
    assert(rows(served) === rows(inMem))
    // multi-probe serve equals multi-probe in-memory too
    val inMem2 = Similarity.ivfPqTopK(emb, "vec_id", "embedding", pred,
      cells = 3, m = 2, k = 3, iters = 2, topK = 5, nprobe = 2)
    val served2 = Similarity.ivfPqServeIndex(spark, tmp, emb, "vec_id",
      "embedding", pred, topK = 5, nprobe = 2)
    assert(rows(served2) === rows(inMem2))
  }

  test("ivf-pq lifecycle: append with the persisted model + per-cell compaction serves identically to a with-model rebuild over the union") {
    val emb = (0L until 64L).map(i => (i, Array(
        (i % 4).toFloat, ((i / 4) % 4).toFloat,
        ((i * 3) % 5).toFloat, ((i * 7) % 5).toFloat)))
      .toDF("vec_id", "embedding")
    val base = emb.filter(col("vec_id") % 3 =!= 0)
    val extra = emb.filter(col("vec_id") % 3 === 0)
    val live = java.nio.file.Files.createTempDirectory("graft-ivfpq-app").toString
    val rebuilt = java.nio.file.Files.createTempDirectory("graft-ivfpq-reb").toString
    val model = Similarity.ivfPqWriteIndex(base, "vec_id", "embedding", live,
      cells = 3, m = 2, k = 3, iters = 2)
    // append encodes with the SIDECAR model (returned for inspection)
    assert(Similarity.ivfPqAppendIndex(extra, "vec_id", "embedding", live) === model)
    val comp = Similarity.ivfPqCompactIndex(spark, live)
    // cells that received appended files got rewritten to ONE file;
    // none were fragmented beyond 2 (one write + one append)
    assert(comp.nonEmpty && comp.filterNot(_.skipped).nonEmpty)
    comp.filterNot(_.skipped).foreach { p =>
      assert(p.stats.inputFiles === 2L && p.stats.outputFiles === 1L)
    }
    // a second maintenance pass is a pure no-op
    assert(Similarity.ivfPqCompactIndex(spark, live).forall(_.skipped))
    // the union rebuilt under the SAME frozen model is the reference
    Similarity.ivfPqWriteIndexWithModel(emb, "vec_id", "embedding", rebuilt, model)
    val pred = col("vec_id") % 16 === 0
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id", "adc_dist", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    val a = Similarity.ivfPqServeIndex(spark, live, emb, "vec_id",
      "embedding", pred, topK = 5, nprobe = 2)
    val b = Similarity.ivfPqServeIndex(spark, rebuilt, emb, "vec_id",
      "embedding", pred, topK = 5, nprobe = 2)
    assert(rows(a) === rows(b))
    // a dim-mismatched batch is rejected before any file is written
    val bad = Seq((999L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfPqAppendIndex(bad, "vec_id", "embedding", live)
    }
    assert(e.getMessage.contains("dim"))
  }

  test("ivf-pq staleness: the sqrt(N)-cells anchor trips at 4x growth; retrain clears it and serves hash-equal to a fresh build; legacy sidecars never trip") {
    val emb = (0L until 256L).map(i => (i, Array(
        (i % 4).toFloat, ((i / 4) % 4).toFloat,
        ((i * 3) % 5).toFloat, ((i * 7) % 5).toFloat)))
      .toDF("vec_id", "embedding")
    val base = emb.filter(col("vec_id") < 64L)
    val extra = emb.filter(col("vec_id") >= 64L)
    val live = java.nio.file.Files.createTempDirectory("graft-ivfpq-stale").toString
    val model = Similarity.ivfPqWriteIndex(base, "vec_id", "embedding", live,
      cells = 3, m = 2, k = 3, iters = 2)
    // the train-time corpus size persists with the model...
    assert(model.trainedN === 64L)
    // ...and a just-built index is not stale (ideal cells = trained cells)
    assert(Similarity.ivfPqStaleness(spark, live) ===
      Similarity.IvfPqStaleness(3, 64L, 64L, 3, stale = false))
    // frozen-model appends grow the corpus to 4x the anchor: the signal
    // trips exactly at the measured threshold (ideal cells = 2x trained,
    // the point where the serve slope has visibly reverted per SCALE.md)
    Similarity.ivfPqAppendIndex(extra, "vec_id", "embedding", live): Unit
    val st = Similarity.ivfPqStaleness(spark, live)
    assert(st === Similarity.IvfPqStaleness(3, 64L, 256L, 6, stale = true))
    // retrain at the sqrt(N)-ideal count clears the flag and re-anchors
    val re = Similarity.ivfPqRetrain(spark, live, emb, "vec_id", "embedding",
      m = 2, k = 3, iters = 2)
    assert(re.cells === 6 && re.trainedN === 256L)
    assert(Similarity.ivfPqStaleness(spark, live) ===
      Similarity.IvfPqStaleness(6, 256L, 256L, 6, stale = false))
    // the swap left no debris aside the index
    val parent = java.nio.file.Paths.get(live).getParent
    val debris = java.nio.file.Files.list(parent).iterator()
    val liveName = java.nio.file.Paths.get(live).getFileName.toString
    import scala.jdk.CollectionConverters._
    assert(!debris.asScala.exists(p =>
      p.getFileName.toString.startsWith(liveName + ".")), "retrain debris")
    // retrained index serves BIT-IDENTICAL to a fresh build at the same
    // cell count over the same corpus (the trainer is deterministic)
    val freshDir = java.nio.file.Files.createTempDirectory("graft-ivfpq-fresh").toString
    Similarity.ivfPqWriteIndex(emb, "vec_id", "embedding", freshDir,
      cells = 6, m = 2, k = 3, iters = 2): Unit
    val pred = col("vec_id") % 16 === 0
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id", "adc_dist", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    assert(rows(Similarity.ivfPqServeIndex(spark, live, emb, "vec_id",
        "embedding", pred, topK = 5, nprobe = 2)) ===
      rows(Similarity.ivfPqServeIndex(spark, freshDir, emb, "vec_id",
        "embedding", pred, topK = 5, nprobe = 2)))
    // LEGACY sidecar (no trainedN line): unknown anchor, never trips —
    // no false alarms on a healthy pre-anchor index
    val side = java.nio.file.Paths.get(freshDir, Similarity.IvfPqModelFile)
    val legacy = java.nio.file.Files.readString(side).linesIterator
      .filterNot(_.startsWith("trainedN=")).mkString("\n") + "\n"
    java.nio.file.Files.writeString(side, legacy): Unit
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(freshDir, "." + Similarity.IvfPqModelFile + ".crc")): Unit
    val lg = Similarity.ivfPqStaleness(spark, freshDir)
    assert(lg === Similarity.IvfPqStaleness(6, -1L, 256L, 6, stale = false))
  }

  test("readIvfPqModel: corrupt sidecars raise descriptive errors naming the path") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq-bad")
    def write(text: String): Unit =
      java.nio.file.Files.writeString(dir.resolve(Similarity.IvfPqModelFile), text)
    def err(text: String): String = {
      write(text)
      intercept[IllegalStateException] {
        Similarity.readIvfPqModel(spark, dir.toString)
      }.getMessage
    }
    assert(err("") .contains("missing key 'cells'"))
    assert(err("cells=2\nm=1\nsub=2\ncoarse=\nbook0=1,2;3,4")
      .contains("key 'coarse' is empty"))
    assert(err("cells=x\nm=1\nsub=2\ncoarse=1,2;3,4\nbook0=1,2")
      .contains("not an int"))
    assert(err("cells=2\nm=1\nsub=2\ncoarse=1,2\nbook0=1,2;3,4")
      .contains("1 vectors, expected 2"))
    assert(err("cells=2\nm=1\nsub=2\ncoarse=1,2,3;4,5,6\nbook0=1,2;3,4")
      .contains("3-dim vector, expected 2"))
    assert(err("cells=2\nm=1\nsub=2\ncoarse=1,2;3,4\nbook0=1,z")
      .contains("non-long component"))
    // every message names the sidecar so the operator can find the file
    assert(err("garbage").contains(Similarity.IvfPqModelFile))
  }

  test("temperature sample: quota = perSqrt * isqrt(n); sample is the stratified prefix") {
    // group a: 9 rows -> isqrt 3, quota 6; group b: 2 rows -> isqrt 1, quota 2
    val df = ((0L until 9L).map(i => (i, "a")) ++ Seq((100L, "b"), (101L, "b")))
      .toDF("id", "src")
    val got = Sampling.temperatureSample(df, "id", "src", perSqrt = 2)
      .select(col("id"), col("src"), col("n_group"), col("quota"), col("sample_rank"))
      .collect()
    val byGroup = got.groupBy(_.getString(1))
    assert(byGroup("a").length === 6 && byGroup("b").length === 2)
    assert(got.forall(r => r.getLong(4) <= r.getLong(3)))
    // the same group's k-smaller stratified sample is a prefix of the quota fill
    val prefix = Sampling.stratifiedSample(df.filter(col("src") === "a"), "id", "src", 3)
      .select("id").as[Long].collect().toSet
    assert(prefix.subsetOf(byGroup("a").map(_.getLong(0)).toSet))
  }

  test("int8 quantization: truncation toward zero, bounded codes, zero vector safe") {
    val emb = Seq(
      (1L, Array(0.003f, -0.003f, 0.001f)),   // qv = [3, -3, 1], scale 3
      (2L, Array(0.0f, 0.0f, 0.0f)))          // zero vector: scale clamps to 1
      .toDF("vec_id", "embedding")
    val got = Similarity.int8Quantize(emb, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getSeq[Long](3))).toMap
    // (1*127) div 3 = 42 and (-3*127) div 3 = -127: toward-zero like DuckDB //
    assert(got(1L) === ((3L, Seq(127L, -127L, 42L))))
    assert(got(2L) === ((1L, Seq(0L, 0L, 0L))))
  }

  test("repeated line removal: corpus-frequent lines drop everywhere, order preserved") {
    val docs = Seq(
      (1L, "alpha one\ncommon footer\nalpha two"),
      (2L, "beta one\ncommon footer"),
      (3L, "gamma one\ncommon footer\ngamma two"),
      (4L, "delta solo")).toDF("doc_id", "text")
    val got = Dedup.repeatedLineRemoval(docs, "doc_id", "text", maxDocs = 2)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) === ((3L, 1L, "alpha one\nalpha two")))
    assert(got(2L) === ((2L, 1L, "beta one")))
    assert(got(3L) === ((3L, 1L, "gamma one\ngamma two")))
    assert(got(4L) === ((1L, 0L, "delta solo")))
  }

  test("top n-grams: occurrence vs doc counts, total tie order at the k boundary") {
    val corpus = Seq(
      (1L, "alpha beta gamma alpha beta gamma"), // "alpha beta gamma" twice in one doc
      (2L, "alpha beta gamma delta"),
      (3L, "zz yy xx")).toDF("doc_id", "text")
    val got = TextAnalysis.topNgrams(corpus, "doc_id", "text", n = 3, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.head === (("alpha beta gamma", 3L, 2L))) // 3 occurrences, 2 docs
    // ties (all n_total = 1) resolve ascending by gram text
    assert(got.drop(1).map(_._1).toSeq === got.drop(1).map(_._1).sorted.toSeq)
  }

  test("quality score: weight formula matches a hand computation") {
    // "the cat sat" + "!!": toks [the,cat,sat], n_chars 13, n_punct 2,
    // n_alpha 9, stop 1/3 -> 3333bp, alpha 6923bp, punct 1538bp, rep 0
    val df = Seq((1L, "the cat sat!!")).toDF("doc_id", "text")
    val base = Dedup.once(df, "__toks", TextAnalysis.tokens(col("text")))
      .transform(d => Dedup.once(d, "__sh3", Dedup.shingles(col("__toks"), 3)))
    val score = base.select(
      TextAnalysis.qualityScore(col("text"), col("__toks"), col("__sh3")).as("s"))
      .as[Long].head()
    assert(score === 3L * 3333 + 6923 - 2L * 1538 - 0)
  }

  test("bloom decontamination equals the exact-overlap spec at any fpp") {
    val evalSet = Seq(
      (101L, "the quick brown fox jumps over the lazy dog near the river"),
      (102L, "totally disjoint evaluation sentence with its own unique tokens here"))
      .toDF("doc_id", "text")
    val want = Dedup.crossCorpusChunkMatches(docs, evalSet, "doc_id", "text", w = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty, "fixture must produce true overlap")
    // fpp is a cost knob only: a sloppy 50% filter and a tight 1% one
    // must return byte-identical results (no false negatives; positives
    // are re-checked by the confirm join)
    for (fpp <- Seq(0.5, 0.01)) {
      val got = Dedup.bloomDecontaminate(docs, evalSet, "doc_id", "text", w = 8, fpp = fpp)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === want, s"fpp=$fpp")
    }
  }

  test("htmlToText: blocks die wholesale, tags strip any case, entities decode one level, whitespace collapses") {
    val cases = Seq(
      ("<html><body><script>var x = 1 < 2 && 2 > 1;</script><p>Hello   world</p></body></html>",
        "Hello world"),
      ("<STYLE>p { color: red }</STYLE>A<!-- hidden\ncomment -->B", "A B"),
      ("Tom &amp; Jerry &amp;lt;keep &lt;x&gt; &quot;q&quot;&nbsp;&#39;s&#39;",
        "Tom & Jerry &lt;keep <x> \"q\" 's'"),
      ("<ScRiPt a=b>junk <inner> junk</sCrIpT  >tail", "tail"),
      ("  plain\ttext\r\nonly  ", "plain text only"))
    val got = cases.map(_._1).toDF("h")
      .select(TextAnalysis.htmlToText(col("h"))).as[String].collect()
    got.zip(cases.map(_._2)).foreach { case (g, w) => assert(g === w) }
  }

  test("pqEncode: m codes in [0,k), non-negative integer error, identical vectors share codes") {
    val vecs = (0 until 40).map(i =>
      (i.toLong, Array.tabulate(8)(d => ((i % 5) * 10 + d).toFloat)))
    val out = Similarity.pqEncode(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", m = 2, k = 3, iters = 2)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
    assert(out.length === 40)
    out.foreach { case (_, codes, err) =>
      assert(codes.length === 2 && codes.forall(c => c >= 0 && c < 3))
      assert(err >= 0L)
    }
    // vectors are identical mod 5 → identical codes and identical error
    out.groupBy(_._1 % 5).values.foreach { g =>
      assert(g.map(t => (t._2, t._3)).distinct.size === 1)
    }
  }

  test("pqAdcTopK: contiguous ranks, monotone distances, twin ADC equals own recon error") {
    val vecs = (0 until 40).map(i =>
      (i.toLong, Array.tabulate(8)(d => ((i % 5) * 10 + d).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val reconErr = Similarity.pqEncode(df, "vec_id", "embedding", m = 2, k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val top = Similarity.pqAdcTopK(df, "vec_id", "embedding",
        col("vec_id") < 5, m = 2, k = 3, iters = 2, topK = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(top.map(_._1).distinct.sorted.toSeq === (0L until 5L))
    top.groupBy(_._1).foreach { case (q, rows) =>
      val byRank = rows.sortBy(_._4)
      assert(byRank.map(_._4).toSeq === (1L to byRank.length), s"ranks of query $q")
      assert(byRank.map(_._3).toSeq === byRank.map(_._3).sorted.toSeq,
        s"distances of query $q must be non-decreasing in rank")
      // vec q+5 is q's exact twin: same codes, so the asymmetric distance
      // to it is exactly q's own reconstruction error
      assert(rows.find(_._2 === q + 5).map(_._3) === Some(reconErr(q)),
        s"twin ADC distance of query $q")
    }
  }

  test("ivfPqTopK: nprobe=cells equals the full-scan ADC baseline; candidates widen monotonically") {
    val vecs = (0 until 40).map(i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 7 % 13) * 10 + d).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    def topAt(np: Int) = Similarity.ivfPqTopK(df, "vec_id", "embedding",
        col("vec_id") < 5, cells = 3, m = 2, k = 3, iters = 2, topK = 8, nprobe = np)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // probing every cell excludes nothing → identical rows (dists, ranks,
    // tiebreaks) to the honest full-scan baseline
    val full = Similarity.pqAdcTopK(df, "vec_id", "embedding",
        col("vec_id") < 5, m = 2, k = 3, iters = 2, topK = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(topAt(3).toSet === full.toSet)
    // each extra probed cell can only add candidates: per-query result
    // counts are non-decreasing in nprobe (capped by topK)
    def counts(np: Int) = topAt(np).groupBy(_._1).view.mapValues(_.length).toMap
    val (c1, c2) = (counts(1), counts(2))
    c1.foreach { case (q, n) => assert(c2.getOrElse(q, 0) >= n, s"query $q shrank") }
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(df, "vec_id", "embedding", col("vec_id") < 5,
        cells = 3, nprobe = 4)
    }
    assert(e.getMessage.contains("nprobe"))
  }

  test("ivfPqResidualTopK: twin achieves the minimal ADC distance, deterministic, candidates widen with nprobe") {
    // pairs of exact-duplicate vectors: i and i+20 are twins
    val vecs = (0 until 40).map(i =>
      (i.toLong, Array.tabulate(8)(d => ((i % 20) * 9 + d * 3).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    def topAt(np: Int) = Similarity.ivfPqResidualTopK(df, "vec_id", "embedding",
        col("vec_id") < 5, cells = 3, m = 2, k = 3, iters = 2, topK = 8, nprobe = np)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = topAt(1)
    // a twin shares cell and residual exactly → its codes are the argmin
    // for the query's own residual, so its ADC distance (= the query's
    // residual reconstruction error) is the global minimum — no other
    // candidate's chosen sub-centroids can sit closer
    (0L until 5L).foreach { q =>
      val rows = got.filter(_._1 == q)
      val twin = rows.find(_._2 == q + 20)
      assert(twin.nonEmpty, s"query $q: twin ${q + 20} missing from top-k")
      assert(twin.get._3 === rows.map(_._3).min,
        s"query $q: twin must achieve the minimal ADC distance, got $twin of ${rows.toSeq}")
    }
    assert(topAt(1).toSet === got.toSet, "re-running the search must reproduce it")
    val c1 = got.groupBy(_._1).view.mapValues(_.length).toMap
    val c2 = topAt(2).groupBy(_._1).view.mapValues(_.length).toMap
    c1.foreach { case (q, n) => assert(c2.getOrElse(q, 0) >= n, s"query $q shrank") }
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfPqResidualTopK(df, "vec_id", "embedding",
        col("vec_id") < 5, cells = 2, nprobe = 3)
    }
    assert(e.getMessage.contains("nprobe"))
  }

  test("tokenChunks: stride/overlap arithmetic, short docs keep one chunk, empty docs vanish") {
    val fixture = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens, size 8 overlap 3 -> 2 chunks
      (2L, "x y z"),               // shorter than one chunk -> exactly 1
      (3L, " .,!? "))              // tokenless -> no rows
      .toDF("doc_id", "text")
    val rows = TextAnalysis.tokenChunks(fixture, "doc_id", "text", size = 8, overlap = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(!rows.exists(_._1 == 3L))
    assert(rows.filter(_._1 == 1L).sortBy(_._2).map(t => (t._2, t._3, t._4)).toSeq === Seq(
      (0L, 8L, "a b c d e f g h"),
      (1L, 5L, "f g h i j"))) // starts at stride 5: 3-token overlap, short tail
    assert(rows.filter(_._1 == 2L).map(t => (t._2, t._3, t._4)).toSeq ===
      Seq((0L, 3L, "x y z")))
  }

  test("annRecall: hit/miss arithmetic, truth beyond k ignored, integer ppm") {
    val exact = Seq(
      (10L, 1L, 1L), (10L, 2L, 2L), (10L, 3L, 3L), (10L, 4L, 4L), // rank 4 ignored at k=3
      (20L, 5L, 1L), (20L, 6L, 2L)) // short truth list (n_truth = 2)
      .toDF("query_id", "neighbor_id", "rank")
    val approx = Seq(
      (10L, 2L, 1L), (10L, 9L, 2L), (10L, 3L, 3L), // 2 of 3 truth hit
      (20L, 7L, 1L), (20L, 8L, 2L)) // 0 hits
      .toDF("query_id", "neighbor_id", "rank")
    val out = Similarity.annRecall(exact, approx, k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(10L) === ((3L, 2L, 666666L)))
    assert(out(20L) === ((2L, 0L, 0L)))
  }

  test("snapshotDiff: added/removed/changed/unchanged classification by content hash") {
    val oldSnap = Seq((1L, "same"), (2L, "before"), (3L, "gone")).toDF("doc_id", "text")
    val newSnap = Seq((1L, "same"), (2L, "after"), (4L, "fresh")).toDF("doc_id", "text")
    val out = Dedup.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("minhashCalibration: exact dup estimates full agreement and exact J=1; estimate tracks Jaccard") {
    val out = Dedup.minhashCalibration(docs, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // docs 1 and 4 are byte-identical: every signature component agrees,
    // exact Jaccard is exactly 1.0
    val (agree14, _, _, est14, jac14) = out((1L, 4L))
    assert(agree14 === 12L && est14 === 1000000L && jac14 === 1000000L)
    // the near-dup pair surfaces with high (but not necessarily full)
    // agreement and sub-1.0 exact Jaccard
    val (agree12, inter12, uni12, _, jac12) = out((1L, 2L))
    assert(agree12 >= 6L && inter12 < uni12 && jac12 < 1000000L && jac12 > 500000L)
  }

  test("keepAbovePercentile: exact-median threshold, ties kept, empty input stays empty") {
    val scored = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 30L), (5L, 50L))
      .toDF("id", "score")
    // distinct-value histogram: cum(10)=1, cum(20)=2, cum(30)=4, cum(50)=5;
    // p50 needs cum >= 3 -> threshold 30; both ties at 30 survive
    val kept = TextAnalysis.keepAbovePercentile(scored, "score", 50)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(3L, 4L, 5L))
    val none = TextAnalysis.keepAbovePercentile(scored.filter(lit(false)), "score", 50)
    assert(none.count() === 0)
  }

  test("keepAbovePercentile: all-null scores yield empty, not an NPE; null rows never pass") {
    val allNull = Seq(1L, 2L, 3L).toDF("id")
      .withColumn("score", lit(null).cast("long"))
    assert(TextAnalysis.keepAbovePercentile(allNull, "score", 50).count() === 0)
    // a null row alongside real scores is dropped by the gate, never kept
    val mixed = Seq((1L, Some(10L)), (2L, None), (3L, Some(30L)))
      .toDF("id", "score")
    val kept = TextAnalysis.keepAbovePercentile(mixed, "score", 100)
      .collect().map(_.getLong(0)).toSet
    assert(!kept.contains(2L))
  }

  test("sourceDataCard: volumes, language share, dup exposure, percentiles, quality, redaction") {
    val corpus = Seq(
      (1L, "the quick brown fox is on the hill today", "web"),
      (2L, "the quick brown fox is on the hill today", "web"), // exact dup in-source
      (3L, "one two three contact bob@example.com from 10.0.0.1 ref 1234567890", "web"),
      (4L, "le chat et le chien et la maison de la ville", "books"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceDataCard(corpus, "doc_id", "text", "source")
      .collect().map(r => r.getString(0) -> r).toMap
    val web = out("web")
    assert(web.getLong(1) === 3L, "n_docs")
    assert(web.getLong(2) === 9L + 9L + 14L, "n_tokens (email/IP split on punctuation)")
    assert(web.getLong(3) === 3L, "n_en (all-stopword heuristic)")
    assert(web.getLong(4) === 2L, "both copies of the dup count as exposed")
    assert(web.getLong(5) === 9L, "p50 of (9,9,14)")
    assert(web.getLong(7) === 10L, "mean_toks = 32 div 3")
    assert(web.getLong(8) === 666666L, "dup_ppm = 2e6 div 3")
    // quality percentiles: the dup pair shares one score, so web's p50
    // (rank 2 of 3) is always the pair's score and p90 is the max;
    // expected values computed via the scorer itself rather than
    // duplicating the formula
    val scored = Seq(
        (1L, "the quick brown fox is on the hill today"),
        (3L, "one two three contact bob@example.com from 10.0.0.1 ref 1234567890"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.qualityScore(col("text"),
        TextAnalysis.tokens(col("text")),
        Dedup.shingles(TextAnalysis.tokens(col("text")), 3)).as("q"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(web.getLong(9) === scored(1L), "p50_quality = the dup pair's score (rank 2 of 3)")
    assert(web.getLong(10) === math.max(scored(1L), scored(3L)), "p90_quality = max of 3")
    // redaction exposure: one email, one IPv4, one long digit run in web
    assert(web.getLong(11) === 1L && web.getLong(12) === 1L && web.getLong(13) === 1L)
    // winsorized quality percentiles: with 3 rows the 5..95 clip bounds
    // are the min and max (ceil-rank 1 and 3), so clipping is a no-op
    // and the clipped percentiles equal the raw ones
    assert(web.getLong(14) === web.getLong(9), "p50_quality_w")
    assert(web.getLong(15) === web.getLong(10), "p90_quality_w")
    val books = out("books")
    assert(books.getLong(1) === 1L && books.getLong(4) === 0L)
    assert(books.getLong(11) === 0L && books.getLong(12) === 0L && books.getLong(13) === 0L)
  }

  test("epochUpsample: every group lands on the exact quota; oversized groups downsample") {
    val rows = ((1 to 3).map(i => (i.toLong, "small")) ++
      (10 to 21).map(i => (i.toLong, "big"))).toDF("id", "src")
    val out = Sampling.epochUpsample(rows, "id", "src", quota = 8L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    val bySrc = out.groupBy(_._1)
    assert(bySrc("small").length === 8, "3 docs fill an 8-quota via epochs")
    assert(bySrc("big").length === 8, "12 docs downsample to the quota")
    // small: 8 = 3 full copies * 2 epochs + 2 partial; copy counts are 3/3/2
    assert(bySrc("small").groupBy(_._2).values.map(_.length).toSeq.sorted === Seq(2, 3, 3))
    // epochs are contiguous from 0 per row
    bySrc("small").groupBy(_._2).values.foreach { copies =>
      assert(copies.map(_._4).sorted.toSeq === (0L until copies.length.toLong))
    }
    // big: one epoch each, hash-smallest 8 of 12 picked, n_copies stamped 1
    assert(bySrc("big").forall(r => r._3 === 1L && r._4 === 0L))
    assert(bySrc("big").map(_._2).distinct.length === 8)
  }

  test("epochUpsample: hash-cutoff pre-filter bounds the rank window without changing the output") {
    // the naive reference: rank EVERY row of the group (the pre-r9 shape)
    def naive(df: org.apache.spark.sql.DataFrame, quota: Long) = {
      val counts = df.groupBy(col("src")).agg(count(lit(1)).as("n_group"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
        .orderBy(Dedup.hash32(col("id").cast("string")).asc, col("id").asc)
      df.withColumn("fill_rank", row_number().over(w).cast("long"))
        .join(broadcast(counts), Seq("src"))
        .withColumn("n_copies", expr(
          s"($quota div n_group) + IF(fill_rank <= $quota % n_group, 1L, 0L)"))
        .filter(col("n_copies") > 0)
        .withColumn("epoch", explode(expr("sequence(CAST(0 AS BIGINT), n_copies - 1)")))
        .drop("fill_rank")
    }
    val rows = ((1 to 7).map(i => (i.toLong, "a")) ++
      (100 to 160).map(i => (i.toLong, "b")) ++
      (200 to 203).map(i => (i.toLong, "c"))).toDF("id", "src")
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    // quotas hitting all regimes: downsample (b), upsample w/ partial
    // epoch (a: 17 = 2*7+3; c: 17 = 4*4+1), and r=0 exact-division
    for (q <- Seq(17L, 8L, 61L)) {
      val got = Sampling.epochUpsample(rows, "id", "src", q).collect().map(key).toSet
      val want = naive(rows, q).collect().map(key).toSet
      assert(got === want, s"quota=$q must equal the full-rank reference")
    }
    // the rank window must sit above the cutoff pre-filter, not the corpus
    val plan = Sampling.epochUpsample(rows, "id", "src", 17L)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("__thr"), "expected the hash-cutoff pre-filter in the plan")
  }

  test("packedSpans tile each sequence and reconcile with packSequences exactly") {
    val fixture = (1L to 40L).map(i => (i, ("tok " * (i % 13 + 1).toInt).trim)).toDF("doc_id", "text")
    val spans = Sampling.packedSpans(fixture, "doc_id", "text",
        tokenBudget = 20, numGroups = 4)
      .collect().map(s => (s.seq_id, s.doc_id, s.start_tok, s.end_tok))
    val seqs = Sampling.packSequences(fixture, "doc_id", "text",
        tokenBudget = 20, numGroups = 4)
      .collect().map(p => p.seq_id -> p).toMap
    assert(spans.map(_._2).sorted.toSeq === (1L to 40L), "every doc has exactly one span")
    spans.groupBy(_._1).foreach { case (seqId, ss) =>
      val sorted = ss.sortBy(_._3)
      assert(sorted.head._3 === 0L, s"$seqId starts at 0")
      sorted.init.zip(sorted.tail).foreach { case (a, b) =>
        assert(a._4 === b._3, s"$seqId spans must tile without gaps")
      }
      val p = seqs(seqId)
      assert(sorted.last._4 === p.total_tokens, s"$seqId total")
      assert(sorted.map(_._2).toSeq === p.doc_ids.toSeq.sorted, s"$seqId members")
      assert(sorted.forall(s => s._4 - s._3 > 0), "spans are non-empty")
    }
    assert(spans.groupBy(_._1).keySet === seqs.keySet)
  }

  test("hardNegativesTopK: same-label and cross-bucket vectors excluded, negatives ranked by cosine") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), "a", 0L),
      (2L, Array(0.9f, 0.1f), "a", 0L), // same label: excluded however close
      (3L, Array(0.8f, 0.2f), "b", 0L), // nearest different-label
      (4L, Array(0.0f, 1.0f), "b", 0L), // far different-label
      (5L, Array(0.99f, 0.01f), "c", 1L)) // other bucket: invisible
      .toDF("vec_id", "embedding", "label", "bucket")
    val out = Similarity.hardNegativesTopK(emb, "vec_id", "embedding",
        "bucket", "label", col("vec_id") === 1L, k = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.sortBy(_._2).toSeq === Seq((3L, 1L), (4L, 2L)))
  }

  test("inverted index: lookup prunes the listing and returns the exact postings") {
    val dir = java.nio.file.Files.createTempDirectory("graft-invidx")
    dir.toFile.deleteOnExit()
    // 200 docs, each repeating one marker word w<i%40> three times — the
    // postings cluster on term hash, so one term lives in few files
    val corpus = (0 until 200).map(i =>
        (i.toLong, s"w${i % 40} w${i % 40} w${i % 40} shared filler text"))
      .toDF("doc_id", "text")
    TextAnalysis.buildInvertedIndex(corpus, "doc_id", "text",
      dir.toString, numFiles = 8, bloomExpected = 500L): Unit
    val hits = TextAnalysis.lookupTerms(spark, dir.toString, Seq("w7"))
    assert(hits.inputFiles.length < 8,
      s"a single-term lookup must prune the listing: read ${hits.inputFiles.length} of 8")
    val got = hits.collect().map(r => (r.getLong(1), r.getLong(2))).sorted
    val want = (0 until 200).filter(_ % 40 === 7).map(i => (i.toLong, 3L)).sorted
    assert(got.toSeq === want)
    // an absent term returns empty, never a false row
    assert(TextAnalysis.lookupTerms(spark, dir.toString, Seq("nosuchterm")).count() === 0L)
  }

  test("topCollocations: exact integer PMI ranking, min-support floor, hapax pairs excluded") {
    // 6 docs: "a b" is a tight pair (always together), "c d" loose
    // (c and d also appear apart), "e f" appears once (under support)
    val corpus = Seq(
      (1L, "a b c d"), (2L, "a b c x"), (3L, "a b d y"),
      (4L, "a b c d"), (5L, "a b e f"), (6L, "c y d x"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.topCollocations(corpus, "doc_id", "text",
        minCount = 2L, k = 10)
      .withColumn("score_ppm", col("score_ppm").cast("long"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // N = 24 tokens, M = 18 bigrams
    val (n, m) = (24L, 18L)
    assert(out("a b")._1 === 5L)
    assert(out("a b")._4 === 5L * n * n * 1000000L / (m * 5L * 5L),
      "score replays (c_xy·N²·10⁶) div (M·c_x·c_y) exactly")
    assert(out("c d")._4 < out("a b")._4,
      "a pair whose parts roam scores below a tight pair")
    assert(!out.contains("e f"), "hapax pairs fall to the support floor")
  }

  test("lookupAllTerms: AND semantics — only docs containing every query term survive") {
    val dir = java.nio.file.Files.createTempDirectory("graft-andq")
    dir.toFile.deleteOnExit()
    val corpus = Seq((1L, "a b c"), (2L, "a b"), (3L, "a a c"))
      .toDF("doc_id", "text")
    TextAnalysis.buildInvertedIndex(corpus, "doc_id", "text",
      dir.toString, numFiles = 2, bloomExpected = 100L): Unit
    val got = TextAnalysis.lookupAllTerms(spark, dir.toString, Seq("a", "c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 3L -> 3L),
      "doc 2 lacks 'c'; sum_tf counts every query-term occurrence")
  }

  test("phraseQuery: consecutive positions only — reversed order misses, overlapping and repeated words count right") {
    val dir = java.nio.file.Files.createTempDirectory("graft-phrase")
    dir.toFile.deleteOnExit()
    val corpus = Seq(
      (1L, "big hash join wins"),      // one "hash join" at pos 1
      (2L, "join hash big"),           // reversed — no match
      (3L, "hash join hash join"),     // two matches
      (4L, "a a a"))                   // repeated-word phrase test bed
      .toDF("doc_id", "text")
    TextAnalysis.buildInvertedIndex(corpus, "doc_id", "text",
      dir.toString, numFiles = 2, bloomExpected = 100L): Unit
    val hj = TextAnalysis.phraseQuery(spark, dir.toString, Seq("hash", "join"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hj === Map(1L -> 1L, 3L -> 2L), "adjacency only, reversed order excluded")
    val aa = TextAnalysis.phraseQuery(spark, dir.toString, Seq("a", "a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(aa === Map(4L -> 2L), "'a a' starts at positions 0 and 1 of 'a a a'")
    assert(TextAnalysis.phraseQuery(spark, dir.toString, Seq("hash", "hash"))
      .count() === 0L, "no consecutive repeat of 'hash' exists")
    intercept[IllegalArgumentException] {
      TextAnalysis.phraseQuery(spark, dir.toString, Seq("solo"))
    }: Unit
  }

  test("appendToInvertedIndexEpoch: retries are exactly-once, and a crash between the two commits recovers") {
    val dir = java.nio.file.Files.createTempDirectory("graft-idx-epoch")
    dir.toFile.deleteOnExit()
    val corpus = Seq((1L, "x y"), (2L, "x z"), (3L, "y z w"), (4L, "w w"))
      .toDF("doc_id", "text")
    TextAnalysis.buildInvertedIndex(corpus.filter(col("doc_id") <= 2),
      "doc_id", "text", dir.toString, numFiles = 1, bloomExpected = 100L): Unit
    val e1 = corpus.filter(col("doc_id") === 3)
    // the epoch lands once...
    TextAnalysis.appendToInvertedIndexEpoch(e1, "doc_id", "text",
      dir.toString, numFiles = 1, epochId = 1L): Unit
    val after1 = TextAnalysis.readCorpusStats(spark, dir.toString)
    assert(after1 === TextAnalysis.CorpusStats(3L, 7L, 1L))
    // ...a full retry is a double no-op (postings AND stats)...
    TextAnalysis.appendToInvertedIndexEpoch(e1, "doc_id", "text",
      dir.toString, numFiles = 1, epochId = 1L): Unit
    assert(TextAnalysis.readCorpusStats(spark, dir.toString) === after1)
    assert(TextAnalysis.lookupTerms(spark, dir.toString, Seq("y"))
      .count() === 2L, "no duplicated postings on retry")
    // ...and a crash BETWEEN the commits (postings committed, sidecar
    // behind — simulated by rewinding the sidecar) recovers on retry:
    // the append no-ops via the manifest ledger, the stats catch up.
    val e2 = corpus.filter(col("doc_id") === 4)
    TextAnalysis.appendToInvertedIndexEpoch(e2, "doc_id", "text",
      dir.toString, numFiles = 1, epochId = 2L): Unit
    val mf = java.nio.file.Paths.get(dir.toString, "_corpus_stats.json")
    java.nio.file.Files.write(mf,
      """{"nDocs":3,"totalTokens":7,"lastEpoch":1}""".getBytes("UTF-8"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(dir.toString, "._corpus_stats.json.crc")): Unit
    TextAnalysis.appendToInvertedIndexEpoch(e2, "doc_id", "text",
      dir.toString, numFiles = 1, epochId = 2L): Unit
    assert(TextAnalysis.readCorpusStats(spark, dir.toString) ===
      TextAnalysis.CorpusStats(4L, 9L, 2L), "the sidecar catches up exactly once")
    assert(TextAnalysis.lookupTerms(spark, dir.toString, Seq("w"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted.toSeq ===
      Seq((3L, 1L), (4L, 2L)))
  }

  test("appendToInvertedIndex: merged index serves exactly; sidecar stats advance") {
    val dir = java.nio.file.Files.createTempDirectory("graft-idx-append")
    dir.toFile.deleteOnExit()
    val corpus = Seq((1L, "x y"), (2L, "x z"), (3L, "y z w"))
      .toDF("doc_id", "text")
    TextAnalysis.buildInvertedIndex(corpus.filter(col("doc_id") < 3),
      "doc_id", "text", dir.toString, numFiles = 1, bloomExpected = 100L): Unit
    TextAnalysis.appendToInvertedIndex(corpus.filter(col("doc_id") === 3),
      "doc_id", "text", dir.toString, numFiles = 1): Unit
    assert(TextAnalysis.readCorpusStats(spark, dir.toString) ===
      TextAnalysis.CorpusStats(3L, 7L))
    val got = TextAnalysis.lookupTerms(spark, dir.toString, Seq("y"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got === Seq((1L, 1L), (3L, 1L)), "postings span both batches")
  }

  test("the index is a first-class store: small-file compaction folds appended postings and serves identically") {
    val dir = java.nio.file.Files.createTempDirectory("graft-idx-compact")
    dir.toFile.deleteOnExit()
    val corpus = (0 until 90).map(i => (i.toLong, s"w${i % 9} shared tail"))
      .toDF("doc_id", "text")
    TextAnalysis.buildInvertedIndex(corpus.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", dir.toString, numFiles = 2, bloomExpected = 200L): Unit
    (1 to 2).foreach(r => TextAnalysis.appendToInvertedIndex(
      corpus.filter(col("doc_id") % 3 === r), "doc_id", "text",
      dir.toString, numFiles = 2): Unit)
    val before = TextAnalysis.lookupTerms(spark, dir.toString, Seq("w4"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted.toSeq
    val filesBefore = graft.sinks.DataSkipping.readManifest(spark, dir.toString).files.size
    graft.sinks.DataSkipping.compactSmallFiles(spark, dir.toString,
      graft.functions.Md5Prefix32(col("term")), minRows = 1000000L,
      targetFiles = 2): Unit
    val after = TextAnalysis.lookupTerms(spark, dir.toString, Seq("w4"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(after === before, "compaction must not change a posting")
    assert(graft.sinks.DataSkipping.readManifest(spark, dir.toString).files.size
      < filesBefore, "the small-file backlog must fold")
    // Bloom sidecars are rebuilt for the folded files: pruning still works
    assert(TextAnalysis.lookupTerms(spark, dir.toString, Seq("w4"))
      .inputFiles.length <=
      graft.sinks.DataSkipping.readManifest(spark, dir.toString).files.size)
  }

  test("backfill-as-a-stream: the store replays through a rate-limited file stream, completely") {
    val dir = java.nio.file.Files.createTempDirectory("graft-backfill")
    dir.toFile.deleteOnExit()
    val df = (0 until 400).map(i => (i.toLong, i.toLong)).toDF("k", "payload")
    graft.sinks.DataSkipping.writeWithStats(df, dir.toString, col("k"),
      numFiles = 4, statsCols = Seq("k"))
    val batches = scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream
      .schema("k LONG, payload LONG")
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString)
      .writeStream.foreachBatch {
        (b: org.apache.spark.sql.DataFrame, id: Long) =>
          batches.synchronized { batches += b.count(): Unit }
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(batches.sum === 400L, "the backfill replays every row exactly once")
    assert(batches.size >= 4, "maxFilesPerTrigger=1 must paginate the replay")
  }

  test("bm25TopK: exact milli-unit scores — tf saturation and length normalization replay by hand") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25")
    dir.toFile.deleteOnExit()
    val corpus = Seq(
      (1L, "join join join filler filler"), // dl=5, tf=3
      (2L, "join alpha"),                   // dl=2, tf=1
      (3L, "beta gamma delta"))             // no match
      .toDF("doc_id", "text")
    TextAnalysis.buildInvertedIndex(corpus, "doc_id", "text",
      dir.toString, numFiles = 2, bloomExpected = 100L): Unit
    val st = TextAnalysis.readCorpusStats(spark, dir.toString)
    assert(st === TextAnalysis.CorpusStats(3L, 10L), "sidecar records N and token total")
    val got = TextAnalysis.bm25TopK(spark, dir.toString, Seq("join"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // N=3, df=2 -> idf_m=1500; avgdl_m=3333
    // d1: norm=250+3750000 div 3333=1375; denom=3000+1650; s=9900000 div 4650=2129
    // d2: norm=250+1500000 div 3333=700;  denom=1000+840;  s=3300000 div 1840=1793
    assert(got.toSeq === Seq((1L, 2129L), (2L, 1793L)),
      "exact integer replay; 3x the tf buys only ~1.2x the score (saturation)")
    // CORPUS-SCALE idf regression (found live by the sf100 anchor):
    // with nDocs ≥ 2^31/1000 the idf term N·1000 overflowed — the
    // interpolated N parsed as an INT literal. Plant a 100 TB-shaped
    // sidecar (5M docs — exactly the corpus size that crashed) over
    // the same postings via an out-of-band write (dropping the stale
    // .crc the raw write leaves) and replay the score by hand.
    java.nio.file.Files.write(dir.resolve("_corpus_stats.json"),
      """{"nDocs":5000000,"totalTokens":16666665,"lastEpoch":-1}""".getBytes("UTF-8")): Unit
    java.nio.file.Files.deleteIfExists(dir.resolve("._corpus_stats.json.crc")): Unit
    val big = TextAnalysis.bm25TopK(spark, dir.toString, Seq("join"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // N=5e6, df=2 -> idf_m=2.5e9 (needs i64); avgdl_m=3333 (unchanged)
    // d1: denom=4650 (as above); s = 2.5e9*3*2200 div 4650 = 3548387096
    // d2: denom=1840;            s = 2.5e9*1*2200 div 1840 = 2989130434
    assert(big.toSeq === Seq((1L, 3548387096L), (2L, 2989130434L)),
      "idf must compute in i64 once N*1000 crosses 2^31")
  }

  test("bigramLmScore: common transitions score high, rare ones low, short docs score 0") {
    val corpus = Seq(
      (1L, "a b a b"), (2L, "a c"), (3L, "a b"), (4L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // corpus bigrams: d1 ab,ba,ab; d2 ac; d3 ab → c(ab)=3, c(ba)=1,
    // c(ac)=1; heads: c_a=4 (3 ab + 1 ac), c_b=1 (ba)
    // p(ab)=3e6 div 4=750000, p(ba)=1e6 div 1, p(ac)=1e6 div 4=250000
    assert(out(3L) === ((1L, 750000L)))
    assert(out(1L) === ((3L, (750000L * 2 + 1000000L) / 3)))
    assert(out(2L) === ((1L, 250000L)), "the rare a→c transition scores low")
    assert(out(2L)._2 < out(3L)._2)
    assert(out(4L) === ((0L, 0L)), "sub-bigram docs score 0")
  }

  test("bigram restructure law: grouped-multiplicity scoring and count-table-derived totals ≡ the per-instance corpus-pass model") {
    // heavy bigram repetition within and across docs — the case where
    // the (doc, gram, n) grouping and the Σc_xy-derived head counts /
    // totals must reproduce the per-instance model EXACTLY
    val corpus = (0 until 60).map(i => (i.toLong,
      Seq.fill(i % 5 + 1)(s"w${i % 7} w${(i * 3) % 5} w${i % 7}").mkString(" ")))
      .toDF("doc_id", "text")
    val t = Dedup.once(
      corpus.select(col("doc_id").as("id"), col("text").as("__text")),
      "__toks", TextAnalysis.tokens(col("__text")))
    val grams = t.filter(size(col("__toks")) >= 2)
      .select(col("id"), explode(Dedup.shingles(col("__toks"), 2)).as("gram"))
    // per-instance bigram-LM reference (the pre-optimization shape)
    val bc = grams.groupBy(col("gram")).agg(count(lit(1)).as("c_xy"))
    val uc = grams.select(split(col("gram"), " ").getItem(0).as("x"))
      .groupBy(col("x")).agg(count(lit(1)).as("c_x"))
    val ref = grams.join(bc, Seq("gram"))
      .withColumn("x", split(col("gram"), " ").getItem(0))
      .join(uc, Seq("x"))
      .withColumn("p_ppm", expr("c_xy * 1000000 div c_x"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), expr("sum(p_ppm) div count(1)").as("lm_ppm"))
    val lmExpected = t.select(col("id")).join(ref, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_ppm"), lit(0L)).as("lm_ppm"))
      .orderBy("id").collect()
    val lmGot = TextAnalysis.bigramLmScore(corpus, "doc_id", "text")
      .orderBy("id").collect()
    assert(lmGot === lmExpected)
    // per-instance collocation reference with corpus-pass totals
    val totals = t.select(
      sum(size(col("__toks"))).cast("decimal(38,0)").as("n_tok"),
      sum(greatest(size(col("__toks")) - 1, lit(0))).cast("decimal(38,0)").as("m_bi"))
    val bi = grams.groupBy(col("gram")).agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= 2L)
    val colRef = bi.withColumn("x", split(col("gram"), " ").getItem(0))
      .withColumn("y", split(col("gram"), " ").getItem(1))
      .join(t.select(explode(col("__toks")).as("w")).groupBy(col("w"))
        .agg(count(lit(1)).as("c_w"))
        .withColumnRenamed("w", "x").withColumnRenamed("c_w", "c_x"), Seq("x"))
      .join(t.select(explode(col("__toks")).as("w")).groupBy(col("w"))
        .agg(count(lit(1)).as("c_w"))
        .withColumnRenamed("w", "y").withColumnRenamed("c_w", "c_y"), Seq("y"))
      .crossJoin(broadcast(totals))
      .withColumn("score_ppm", expr(
        "CAST(c_xy AS DECIMAL(38,0)) * n_tok * n_tok * 1000000 div (m_bi * c_x * c_y)"))
      .select(col("gram"), col("c_xy"), col("c_x"), col("c_y"), col("score_ppm"))
      .orderBy(col("score_ppm").desc, col("gram").asc).limit(40)
      .collect()
    val colGot = TextAnalysis.topCollocations(corpus, "doc_id", "text",
      minCount = 2L, k = 40).collect()
    assert(colGot === colRef)
  }

  test("hashingTfVectors: bucket assignment is the portable hash mod dim; counts exact") {
    val corpus = Seq((1L, "alpha beta alpha"), (2L, "beta")).toDF("doc_id", "text")
    val out = TextAnalysis.hashingTfVectors(corpus, "doc_id", "text", dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def bucket(t: String): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).take(4)
      val h = md5.foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
      h % 8
    }
    assert(out((1L, bucket("alpha"))) === 2L)
    assert(out((1L, bucket("beta"))) === 1L)
    assert(out((2L, bucket("beta"))) === 1L)
  }

  test("driftAgainstProfile: the profile's own corpus reads 0, disjoint vocabulary reads exactly 1000000") {
    val ref = Seq((1L, "x y z"), (2L, "x y")).toDF("doc_id", "text")
    val profile = Dedup.once(ref.select(col("text").as("__text")),
        "__toks", TextAnalysis.tokens(col("__text")))
      .select(explode(col("__toks")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c_t"))
    def tv(batch: org.apache.spark.sql.DataFrame): Long =
      TextAnalysis.driftAgainstProfile(batch, "text", profile)
        .collect().head.getLong(2)
    assert(tv(ref) === 0L, "a batch that IS the profile distribution has zero drift")
    assert(tv(Seq((9L, "p q r")).toDF("doc_id", "text")) === 1000000L,
      "disjoint vocabulary is total variation 1")
    val mid = tv(Seq((9L, "x y p")).toDF("doc_id", "text"))
    assert(mid > 0L && mid < 1000000L)
    // an empty epoch has no distribution: fully drifted, never a crash
    assert(tv(Seq.empty[(Long, String)].toDF("doc_id", "text")) === 1000000L)
    // an empty/broken PROFILE alarms too — never a silent NULL that
    // would disable a tv_ppm > threshold gate forever
    val emptyProfile = profile.filter(col("c_t") < 0)
    assert(TextAnalysis.driftAgainstProfile(ref, "text", emptyProfile)
      .collect().head.getLong(2) === 1000000L)
  }

  test("sourceDrift: identical distributions read 0 ppm, disjoint vocabularies read 1000000") {
    val corpus = Seq(
      (1L, "s1", "x y z"), (2L, "s2", "x y z"), // two identical sources
      (3L, "s3", "p q r"))                      // disjoint from ⅔ of the corpus
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.sourceDrift(corpus, "source", "text")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // s1 and s2 each deviate from the blended corpus by the same amount
    assert(out("s1") === out("s2"))
    assert(out("s1") > 0L && out("s1") < 1000000L)
    // a fully identical corpus: one source only
    val solo = TextAnalysis.sourceDrift(
        corpus.filter(col("source") === "s1"), "source", "text")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(solo("s1") === 0L, "a source that IS the corpus has zero drift")
    // s3 shares no term with s1/s2: TV = ⅔ of the mass lives elsewhere
    // exact: ½(|1/3·3−0|·2·... ) — pinned numerically instead:
    // obs/n_s = 1/3 per own term vs c_t/N = 1/9 → Σ|…| over 6 foreign
    // terms (1/9 each) + 3 own (1/3−1/9) = 6/9+6/9 → TV = 2/3
    assert(out("s3") === 666666L)
  }

  test("rerankTopK: only candidate ids appear, ranking equals brute force restricted to them") {
    import spark.implicits._
    val emb = (0L until 20L).map(i =>
        (i, Array.tabulate(4)(d => ((i * 7 + d * 3) % 11).toFloat / 11f)))
      .toDF("vec_id", "embedding")
    val cands = Seq(2L, 3L, 5L, 7L, 11L, 13L).toDF("doc_id")
    val got = Similarity.rerankTopK(emb, "vec_id", "embedding",
        cands, col("vec_id") === 0L, k = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got.map(_._1).forall(Set(2L, 3L, 5L, 7L, 11L, 13L)),
      "non-candidates must never surface")
    val brute = Similarity.bruteForceTopK(
        emb.filter(col("vec_id") === 0L || col("vec_id").isin(2L, 3L, 5L, 7L, 11L, 13L)),
        "vec_id", "embedding", col("vec_id") === 0L, 4)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got === brute, "rerank ≡ brute force over the restricted pool")
  }

  test("noveltyProfile: exact dups score 0, a unique doc scores the full million") {
    val out = Dedup.noveltyProfile(docs, "doc_id", "text", w = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // docs 1 and 4 are byte-identical: every window shared
    assert(out(1L)._2 === 0L && out(1L)._3 === 0L)
    assert(out(4L)._2 === 0L && out(4L)._3 === 0L)
    // doc 3 shares no 8-token window with anything
    assert(out(3L)._2 === out(3L)._1 && out(3L)._3 === 1000000L)
    // doc 2 (near-dup of 1) shares its head windows but not its tail
    assert(out(2L)._2 > 0L && out(2L)._2 < out(2L)._1)
  }
}
