package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.llm.{Caching, CurationPipeline, Dedup, Multimodal, Sampling, Similarity, TextAnalysis}

/** Training-data-pipeline queries (dedup / similarity / text analysis /
  * multimodal) over the `documents` and `embeddings` tables, each with a
  * DuckDB oracle computing the identical spec. Signatures, candidates and
  * scores are engine-exact by construction (portable md5-derived hashes,
  * integer LCG permutations, integer-quantized dot products) — see the
  * operator scaladocs in graft.llm.
  */
object LlmQueries {
  type Q = (SparkSession, String) => DataFrame

  // -------------------------------------------------- shared SQL fragments

  private def toksSql(t: String): String =
    s"list_filter(string_split_regex(lower($t), '[^a-z0-9]+'), x -> x <> '')"
  private def h32Sql(s: String): String =
    s"CAST(('0x' || substr(md5($s), 1, 8)) AS BIGINT)"
  /** expects a relation exposing `toks` */
  private val shinglesSql: String =
    """CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
      |     ELSE list_transform(range(0, len(toks) - 2),
      |            i -> array_to_string(list_slice(toks, i + 1, i + 3), ' ')) END""".stripMargin
  private val shSetSql: String =
    s"list_distinct(list_transform($shinglesSql, sg -> ${h32Sql("sg")}))"
  private def mhSql(j: Int): String =
    s"list_min(list_transform(sh, h -> (h * ${Dedup.seedA(j)} + ${Dedup.seedB(j)}) % ${Dedup.P}))"
  private def sqlList(xs: Seq[String]): String = xs.map(x => s"'$x'").mkString("[", ", ", "]")
  private def quantSql(v: String): String =
    s"list_transform($v, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))"
  private def dotSql(a: String, b: String): String =
    s"CAST(list_dot_product(list_transform($a, y -> CAST(y AS DOUBLE)), list_transform($b, y -> CAST(y AS DOUBLE))) AS BIGINT)"

  /** The integer BM25 replay chain (k1_m=1200, b_m=750, reciprocal
    * idf) up to per-(doc, term) scores `s`, over query `terms` (a SQL
    * literal list). Shared by q178/q182/q186 — the floor-division
    * order must match `TextAnalysis.bm25TopK` exactly.
    */
  private def bm25ChainSql(terms: String): String =
    s"""t AS (SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
       |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
       |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    (CAST(SUM(dl) AS BIGINT) * 1000) // COUNT(*) AS avgdl_m FROM dl),
       |p AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, unnest(toks) AS term FROM t)
       |  WHERE term IN ($terms) GROUP BY 1, 2),
       |dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM p GROUP BY 1),
       |s AS (SELECT p.doc_id,
       |    (((st.n_docs * 1000) // dfq.df) * p.tf * (1200 + 1000)) //
       |      (p.tf * 1000 + (1200 * (1000 - 750 + (750 * dl.dl * 1000) // st.avgdl_m)) // 1000)
       |      AS s_m
       |  FROM p JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN st)""".stripMargin

  /** Scratch directory for gates that exercise a write→read-back cycle
    * (q121/q122): keyed by applicationId so concurrent runs never
    * collide, deleted recursively on JVM exit so repeated bench/verify
    * runs don't accumulate index directories under tmpdir.
    */
  private def gateScratchDir(s: SparkSession, name: String): String = {
    val f = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft-$name-gate-${s.sparkContext.applicationId}")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(d: java.io.File): Unit = {
        Option(d.listFiles()).foreach(_.foreach(rm))
        d.delete(): Unit
      }
      rm(f)
    }))
    f.getAbsolutePath
  }

  /** Clear a prior invocation's EXPORT destination. The store guard
    * ([[graft.sinks.DataSkipping.exportSnapshot]] refuses a destination
    * already holding a manifest) exists to catch production mistakes;
    * a gate query re-run in the same JVM (bench passes share one
    * scratch dir per appId) legitimately re-exports over its own
    * previous output, so the caller deletes it first — exactly the
    * explicit decision the guard forces.
    */
  private def freshScratch(path: String): String = {
    def rm(d: java.io.File): Unit = {
      Option(d.listFiles()).foreach(_.foreach(rm))
      d.delete(): Unit
    }
    rm(new java.io.File(path))
    path
  }

  private def docsCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    d.unionByName(d.filter(col("doc_id") % 10 === 0).select(
      (-col("doc_id") * 2 - 1).as("doc_id"),
      concat(col("text"), lit(" extra duplicated tail marker tokens")).as("text")))
  }

  private val corpusSql =
    """SELECT doc_id, text FROM documents
      |UNION ALL
      |SELECT -2 * doc_id - 1, text || ' extra duplicated tail marker tokens'
      |FROM documents WHERE doc_id % 10 = 0""".stripMargin

  /** The t→s→f→sc CTE chain ending at sc = (doc_id, score): the
    * qualityScore mirror (3·stop_bp + alpha_bp − 2·punct_bp − rep_bp)
    * shared by the q73 fixed-threshold gate and the q92 percentile gate.
    */
  /** @param src relation with (doc_id, text) — `documents` for the
    *   q73/q92 gates; q93 feeds its planted-dups corpus CTE
    */
  private def qualityScoreChainSql(src: String = "documents"): String =
    s"""t AS (SELECT doc_id, text, ${toksSql("text")} AS toks FROM $src),
       |s AS (SELECT doc_id, text, toks, $shinglesSql AS sh3 FROM t),
       |f AS (SELECT doc_id,
       |  CAST(length(text) AS BIGINT) AS n_chars,
       |  CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS BIGINT) AS n_punct,
       |  CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha,
       |  CAST(len(toks) AS BIGINT) AS n_toks,
       |  CAST(len(list_intersect(toks, ${sqlList(TextAnalysis.EnStop)})) AS BIGINT) AS n_stop,
       |  CAST(len(sh3) AS BIGINT) AS n_sh,
       |  CAST(len(list_distinct(sh3)) AS BIGINT) AS n_dsh
       |FROM s),
       |sc AS (SELECT doc_id,
       |  3 * (CASE WHEN n_toks = 0 THEN 0 ELSE CAST(FLOOR(n_stop * 10000.0 / n_toks) AS BIGINT) END)
       |  + (CASE WHEN n_chars = 0 THEN 0 ELSE CAST(FLOOR(n_alpha * 10000.0 / n_chars) AS BIGINT) END)
       |  - 2 * (CASE WHEN n_chars = 0 THEN 0 ELSE CAST(FLOOR(n_punct * 10000.0 / n_chars) AS BIGINT) END)
       |  - (CASE WHEN n_sh = 0 THEN 0 ELSE CAST(FLOOR((n_sh - n_dsh) * 10000.0 / n_sh) AS BIGINT) END) AS score
       |FROM f)""".stripMargin

  /** q81's markup fixture, shared verbatim by the Spark concat and the
    * oracle's `||` chain: script content with raw `<`/`>`/`&&` (the
    * block regex must swallow it), a comment, a MIXED-CASE tag, and the
    * six core entities including a double-escape (`&amp;lt;` must decode
    * to `&lt;`, not `<`). No single quotes (SQL literal hygiene).
    */
  private val HtmlFixPre = "<html><head><title>Doc "
  private val HtmlFixMid1 =
    "</title><style type=\"text/css\">p { color: #333; }</style></head><body><!-- nav bar --><h1>"
  private val HtmlFixMid2 =
    "</h1><script type=\"text/javascript\">var t = 1 < 2 && 2 > 1; // <tricky></script><p>"
  private val HtmlFixPost =
    "</p><P CLASS=\"x\">Tom &amp; Jerry &lt;3 &quot;q&quot; &#39;s&#39;&nbsp;end &amp;lt;keep</P></body></html>"

  /** Planted media fixture for the header-decode gate (q78): every third
    * doc a minimal-but-VALID PNG (signature + IHDR), every third a
    * minimal JPEG (SOI, a COM segment the scanner must skip, SOF0, EOI),
    * the rest raw utf-8. Dimensions derive from the id, so the DuckDB
    * oracle recomputes them arithmetically while the Spark side must
    * actually parse the bytes it planted.
    */
  private def u32be(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private[graft] def mediaAsset(id: Long): Multimodal.Asset = (id % 3) match {
    case 0 =>
      val w = id % 2000 + 1
      val h = id % 997 + 1
      val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      val ihdr = Array[Byte](0, 0, 0, 13) ++ "IHDR".getBytes("US-ASCII") ++
        u32be(w) ++ u32be(h) ++
        Array[Byte](8, 6, 0, 0, 0) ++ // bit depth, color type, compression, filter, interlace
        Array[Byte](0, 0, 0, 0)       // CRC slot (not validated by the header parse)
      Multimodal.Asset(id, "image", sig ++ ihdr)
    case 1 =>
      val w = id % 500 + 17
      val h = id % 700 + 9
      val bytes =
        Array(0xff, 0xd8).map(_.toByte) ++                      // SOI
        Array(0xff, 0xfe, 0, 4, 'h', 'i').map(_.toByte) ++      // COM segment (must be skipped)
        Array(0xff, 0xc0, 0, 17, 8).map(_.toByte) ++            // SOF0, len 17, precision 8
        Array(((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
          ((w >> 8) & 0xff).toByte, (w & 0xff).toByte, 3.toByte) ++
        Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1) ++      // 3 component specs
        Array(0xff, 0xd9).map(_.toByte)                         // EOI
      Multimodal.Asset(id, "image", bytes)
    case _ =>
      Multimodal.Asset(id, "text", s"doc $id".getBytes("UTF-8"))
  }

  // ---------------------------------------------------------------- queries

  val queries: Map[String, Q] = Map(
    // Exact dedup: hash group-by with group stats; corpus has injected
    // exact copies (every 7th doc) so groups are non-trivial.
    "q30_exact_dedup" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val corpus = d.unionByName(
        d.filter(col("doc_id") % 7 === 0).select((-col("doc_id") * 2 - 2).as("doc_id"), col("text")))
      Dedup.exactDupGroups(corpus, "doc_id", "text")
        .select(col("doc_id"), col("dup_hash"), col("group_size"), col("canonical_id"))
    }),

    // MinHash signatures (12 permutations over distinct 3-shingle hashes).
    // `once` barriers: sh and sig are each computed one time per row, not
    // once per downstream reference.
    "q31_minhash_signatures" -> ((s, dir) => {
      val base = Dedup.withShingleHashSet(
        Tables.documents(s, dir).select(col("doc_id"), col("text"))
          .repartition(col("doc_id")), "text", "sh")
      val withSig = Dedup.once(base, "sig", Dedup.minhash(col("sh"), 12))
      withSig.select(col("doc_id") +: (0 until 12).map(j => col("sig")(j).as(s"mh_$j")): _*)
    }),

    // Banded LSH candidate generation + exact-Jaccard verify (J >= 1/2)
    // over a corpus with injected near-duplicates. Never all-pairs: the
    // only joins are band-bucket equi-joins and candidate->set lookups.
    "q32_lsh_neardup_pairs" -> ((s, dir) =>
      Dedup.nearDupPairs(docsCorpus(s, dir), "doc_id", "text")),

    // Windowed rolling-hash chunk dedup: cross-doc pairs sharing >= 1
    // distinct 8-token-window fingerprint, with shared-chunk counts —
    // catches boilerplate/quotation overlap between documents that are
    // NOT near-dups overall. Native O(1)-slide window hashes; the only
    // join is the chunk-hash equi-join (never all-pairs).
    "q55_chunk_match_pairs" -> ((s, dir) =>
      Dedup.chunkMatchPairs(docsCorpus(s, dir), "doc_id", "text", w = 8)),

    // The chunk-bucket pre-flight (q44/q52 analog for chunk dedup): the
    // cost profile a large chunk-dedup job reads before the pair join.
    "q56_chunk_bucket_stats" -> ((s, dir) =>
      Similarity.bucketCostProfile(
        Dedup.chunkTable(docsCorpus(s, dir), "doc_id", "text", w = 8), "chunk")),

    // Eval-set decontamination: training docs sharing >= 1 8-token
    // window with an eval document (the C4/GPT-3-style verbatim-overlap
    // rule). The eval set is fragments of every 17th doc, so matches
    // are guaranteed and the gate checks exact pair counts.
    "q57_decontamination" -> ((s, dir) => {
      val train = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val eval = train.filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 50000).as("doc_id"),
          substring(col("text"), 1, 200).as("text"))
      Dedup.crossCorpusChunkMatches(train, eval, "doc_id", "text", w = 8)
    }),

    // Deterministic stratified sampling: the k hash-smallest vectors of
    // every label stratum — engine/run/retry-stable, never rand().
    "q58_stratified_sample" -> ((s, dir) =>
      Sampling.stratifiedSample(
        Tables.embeddings(s, dir).select(col("vec_id"), col("label")),
        "vec_id", "label", k = 7)
        .select(col("vec_id"), col("label"), col("sample_rank"))),

    // PII-style scrubbing: emails / IPv4s / long digit runs replaced by
    // typed tags, with per-doc match counts. Injected PII on every 9th
    // doc so the gate checks non-trivial counts; md5 of the redacted
    // stream anchors the rewrite itself.
    "q59_redaction" -> ((s, dir) => {
      val corpus = Tables.documents(s, dir).select(col("doc_id"),
        when(col("doc_id") % 9 === 0,
          concat(col("text"),
            lit(" contact bob@example.com or ops@graft.io from 10.0.0.1 ref 1234567890")))
          .otherwise(col("text")).as("text"))
      corpus.select(
        col("doc_id") +:
          TextAnalysis.redactionCounts(col("text")) :+
          md5(TextAnalysis.redact(col("text"))).as("redacted_md5"): _*)
    }),

    // Transitive near-dup canonicalization: every doc in the verified
    // pair graph labeled with its cluster's minimum id (min-label
    // propagation + pointer jumping — O(log diameter) equi-join rounds,
    // never all-pairs). The DuckDB oracle replays the closure with a
    // recursive CTE.
    "q53_neardup_clusters" -> ((s, dir) =>
      Dedup.canonicalizeClusters(Dedup.nearDupPairs(docsCorpus(s, dir), "doc_id", "text"))),

    // Incremental ingest dedup: a new batch (tail-modified copies of
    // every 10th doc) checked against the SIGNATURE STORE of the
    // existing corpus — candidates from band collisions, similarity
    // from signature agreement (the store retains 12 longs per doc, not
    // text). The 100 TB shape: the store appends, never rebuilds.
    "q60_incremental_dedup" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val batch = d.filter(col("doc_id") % 10 === 0).select(
        (-col("doc_id") * 2 - 1).as("doc_id"),
        concat(col("text"), lit(" extra duplicated tail marker tokens")).as("text"))
      Dedup.incrementalNearDups(
        Dedup.signatureTable(batch, "doc_id", "text"),
        Dedup.signatureTable(d, "doc_id", "text"))
    }),

    // Characteristic-terms extraction: top-3 terms per doc by integer
    // tf-idf-style score (keyword tagging for corpus curation /
    // search-index sidecars). Vocabulary stays distributed; ranking is
    // total (score desc, term asc).
    "q61_tfidf_terms" -> ((s, dir) =>
      TextAnalysis.topTermsTfidf(
        Tables.documents(s, dir).select(col("doc_id"), col("text")),
        "doc_id", "text", k = 3)
        .withColumnRenamed("id", "doc_id")),

    // Deterministic k-means (2 Lloyd rounds, hash-smallest seeds): the
    // LEARNED bucket builder for IVF search — assignment passes are
    // map-only with centroid literals, recompute is one (cluster, pos)
    // shuffle. Integer-exact end to end; the oracle unrolls both rounds.
    "q62_kmeans_assign" -> ((s, dir) =>
      Similarity.kmeansAssign(Tables.embeddings(s, dir), "vec_id", "embedding",
        k = 4, iters = 2)
        .withColumnRenamed("id", "vec_id")),

    // The learned-IVF ANN loop closed end to end: k-means buckets from
    // q62 become the bucket column of the bucketed top-k search. The
    // slim (id, cluster) assignment joins back to the corpus once — at
    // production scale it would be written as a partition column at
    // ingest, making search map-side only.
    "q63_ann_kmeans_bucketed" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val assign = Similarity.kmeansAssign(emb, "vec_id", "embedding", k = 4, iters = 2)
        .select(col("id").as("vec_id"), col("cluster"))
      Similarity.bucketedTopK(emb.join(assign, Seq("vec_id")),
        "vec_id", "embedding", "cluster", col("vec_id") % 50 === 0 && col("vec_id") < 2000, 3)
    }),

    // Corpus length-distribution profile: exact p50/p90/p99 token
    // counts per train/val/test split at HISTOGRAM cost — the window
    // walks distinct lengths, never corpus rows, so a handful of
    // groups don't become a handful of corpus-holding tasks. Composes
    // the deterministic hash split (q49) with the percentile operator.
    "q64_length_percentiles" -> ((s, dir) => {
      val base = Tables.documents(s, dir).select(
        Sampling.splitAssign(col("doc_id"),
          Seq(("train", 90), ("val", 5), ("test", 5))).as("split"),
        TextAnalysis.tokenCount(TextAnalysis.tokens(col("text"))).as("n_tokens"))
      TextAnalysis.groupPercentiles(base, "split", "n_tokens")
    }),

    // C4-style line cleaning: keep lines with >= 3 tokens ending in
    // terminal punctuation and no blocklist hit; doc survives with
    // >= 3 kept lines. The single-line testdata is line-structured
    // first by a deterministic rewrite both engines replay (" table "
    // starts a new line closing the previous with '.', " query "
    // breaks a line unterminated, " slow " injects a blocklist word).
    "q65_c4_line_clean" -> ((s, dir) => {
      val corpus = Tables.documents(s, dir).select(col("doc_id"),
        regexp_replace(regexp_replace(regexp_replace(col("text"),
          " table ", ".\n"), " query ", "\n"), " slow ", " javascript ").as("text"))
      val base = Dedup.once(corpus, "__kept", TextAnalysis.c4CleanedLines(col("text")))
      base.select(col("doc_id"),
        size(col("__kept")).cast("long").as("n_kept"),
        (size(split(col("text"), "\n")) - size(col("__kept"))).cast("long").as("n_dropped"),
        (size(col("__kept")) >= 3).as("doc_kept"),
        md5(concat_ws("\n", col("__kept"))).as("cleaned_md5"))
    }),

    // SemDeDup: deterministic k-means cells bucket an in-cluster cosine
    // near-dup pair join (never all-pairs), the pair graph closes
    // transitively, and each semantic group keeps its minimum id.
    // Copies of every 25th vector are planted so the keep decision is
    // non-trivial; the oracle replays k-means + pairs + a recursive
    // reachability closure.
    "q66_semantic_dedup" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val src = e.unionByName(e.filter(col("vec_id") % 25 === 0)
        .select((-col("vec_id") * 2 - 2).as("vec_id"), col("embedding")))
      Similarity.semanticDedup(src, "vec_id", "embedding",
        k = 4, iters = 2, num = 19, den = 20)
    }),

    // Temperature mixing: per-source quotas ∝ √n (the α = 1/2 corpus
    // rebalance), filled by each source's hash-smallest documents.
    "q67_source_mixing" -> ((s, dir) =>
      Sampling.temperatureSample(
        Tables.documents(s, dir).select(col("doc_id"), col("source")),
        "doc_id", "source", perSqrt = 2)
        .select(col("doc_id"), col("source"), col("n_group"), col("quota"),
          col("sample_rank"))),

    // int8 vector compression, anchored by integer scalars: sum of
    // codes, max |code| (≤ 127 by construction), and the exact
    // reconstruction error in 1/127-milli-units.
    "q68_int8_quantization" -> ((s, dir) =>
      Similarity.int8Quantize(Tables.embeddings(s, dir), "vec_id", "embedding")
        .select(col("vec_id"), col("scale"),
          aggregate(col("q8"), lit(0L), _ + _).as("sum_q8"),
          array_max(transform(col("q8"), x => abs(x))).as("max_abs_q8"),
          aggregate(zip_with(col("qv"), col("q8"),
            (v, q) => abs(v * 127 - q * col("scale"))), lit(0L), _ + _).as("recon_err"))),

    // Corpus-level repeated-line removal: lines planted as boilerplate
    // on every 3rd/7th doc repeat across documents and are dropped from
    // all of them; organic lines (the " table "-split fragments) stay.
    "q69_repeated_lines" -> ((s, dir) => {
      val corpus = Tables.documents(s, dir).select(col("doc_id"),
        concat(
          regexp_replace(col("text"), " table ", "\n"),
          when(col("doc_id") % 3 === 0,
            lit("\nsubscribe to our newsletter today")).otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            lit("\nall rights reserved")).otherwise(lit(""))).as("text"))
      Dedup.repeatedLineRemoval(corpus, "doc_id", "text", maxDocs = 2)
        .select(col("id").as("doc_id"), col("n_lines"), col("n_removed"),
          md5(col("cleaned")).as("cleaned_md5"))
    }),

    // As-of join: each purchase matched to its user's latest
    // prior-or-equal signup — merged-stream running window, ONE shuffle
    // on user_id, no per-key range explosion. DuckDB replays it with
    // its native ASOF LEFT JOIN.
    "q70_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("signup_id"))
      graft.operators.AsOfJoin(purchases, signups, "user_id", "ts", Seq("signup_id"))
        .select(col("event_id"), col("user_id"), col("signup_id"),
          (unix_micros(col("ts")) - unix_micros(col("__matched_ts"))).as("lag_us"))
    }),

    // Broadcast as-of join: same semantics as q70, but the right side
    // (per-user signup history) collapses to sorted per-key arrays and
    // broadcasts — the big left side is never shuffled or sorted
    // (binary-search probe per purchase). Same DuckDB ASOF spec.
    "q77_asof_broadcast" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("signup_id"))
      graft.operators.AsOfJoin.broadcastAsOf(
          purchases, signups, "user_id", "ts", Seq("signup_id"))
        .select(col("event_id"), col("user_id"), col("signup_id"),
          (unix_micros(col("ts")) - unix_micros(col("__matched_ts"))).as("lag_us"))
    }),

    // q70's as-of semantics driven through a TIMESTAMP_NTZ input end to
    // end (both sides cast before the operator, lag computed via the
    // NTZ-robust TimeCols.micros): the L96 contract — parquet written
    // without UTC adjustment must flow through the public time
    // operators and produce the SAME rows as the instant-typed path —
    // pinned by the driver's oracle, not only the suite. The oracle SQL
    // is q70's verbatim: under the pinned UTC session the NTZ cast is
    // value-preserving, so any drift in the NTZ arm (a double cast, a
    // zone applied twice, a dropped row) hash-mismatches here while
    // q70 stays green.
    "q128_asof_ntz" -> ((s, dir) => {
      val ev = Tables.events(s, dir).withColumn("ts", col("ts").cast("timestamp_ntz"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("signup_id"))
      val ntz = org.apache.spark.sql.types.TimestampNTZType
      graft.operators.AsOfJoin(purchases, signups, "user_id", "ts", Seq("signup_id"))
        .select(col("event_id"), col("user_id"), col("signup_id"),
          (graft.operators.TimeCols.micros(ntz, col("ts")) -
            graft.operators.TimeCols.micros(ntz, col("__matched_ts"))).as("lag_us"))
    }),

    // Corpus-global top-40 3-gram frequency table (the vocabulary /
    // boilerplate inspection artifact): distributed gram counts, then
    // TakeOrdered — only the k winners ever leave the executors.
    "q72_top_ngrams" -> ((s, dir) =>
      TextAnalysis.topNgrams(
        Tables.documents(s, dir).select(col("doc_id"), col("text")),
        "doc_id", "text", n = 3, k = 40)),

    // Linear quality filter: transparent integer-weight scorer over the
    // ratio features (the learned-model slot of a curation pipeline —
    // swap weights, keep the plan), thresholded at 9000 bp.
    "q73_quality_filter" -> ((s, dir) => {
      val base = Dedup.once(
          Tables.documents(s, dir).select(col("doc_id"), col("text")),
          "__toks", TextAnalysis.tokens(col("text")))
        .transform(d => Dedup.once(d, "__sh3", Dedup.shingles(col("__toks"), 3)))
      base.select(col("doc_id"),
          TextAnalysis.qualityScore(col("text"), col("__toks"), col("__sh3")).as("score"))
        .withColumn("kept", when(col("score") >= 9000, 1L).otherwise(0L))
    }),

    // Language ID, quality stats, fingerprint.
    "q33_text_stats" -> ((s, dir) => {
      val toks = TextAnalysis.tokens(col("text"))
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextAnalysis.tokenCount(toks).as("n_tokens"),
        TextAnalysis.distinctTokenCount(toks).as("n_distinct"),
        TextAnalysis.stopwordCount(toks, TextAnalysis.EnStop).as("n_stop"),
        TextAnalysis.langGuess(toks).as("lang_guess"),
        TextAnalysis.fingerprint(toks).as("fingerprint"),
        TextAnalysis.isQuality(TextAnalysis.tokenCount(toks),
          TextAnalysis.stopwordCount(toks, TextAnalysis.EnStop)).as("is_quality"))
    }),

    // 16-bit SimHash (token-hash array materialized once per row).
    "q34_simhash" -> ((s, dir) =>
      Dedup.withSimhash16(Tables.documents(s, dir).select(col("doc_id"), col("text")),
        "text", "simhash").select(col("doc_id"), col("simhash"))),

    // Brute-force cosine top-5 for 10 query vectors (integer-quantized).
    "q35_ann_bruteforce" -> ((s, dir) =>
      Similarity.bruteForceTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        col("vec_id") % 50 === 0 && col("vec_id") < 2000, 5)),

    // IVF-style bucketed top-3: queries only scored inside their bucket.
    "q36_ann_bucketed" -> ((s, dir) =>
      Similarity.bucketedTopK(Tables.embeddings(s, dir), "vec_id", "embedding", "label",
        col("vec_id") % 50 === 0 && col("vec_id") < 2000, 3)),

    // The composed curation pipeline: exact dedup -> LSH near-dup removal
    // -> quality/language gate, over a corpus with BOTH kinds of injected
    // duplicates.
    "q39_curation_pipeline" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val corpus = d
        .unionByName(d.filter(col("doc_id") % 7 === 0)
          .select((-col("doc_id") * 2 - 2).as("doc_id"), col("text")))
        .unionByName(d.filter(col("doc_id") % 10 === 0)
          .select((-col("doc_id") * 2 - 1).as("doc_id"),
            concat(col("text"), lit(" extra duplicated tail marker tokens")).as("text")))
      CurationPipeline.curate(corpus, "doc_id", "text")
    }),

    // Embedding-cosine near-dup: bucketed (by label) pairs at cos >= 19/20,
    // decided by integer cross-multiplication on quantized vectors; corpus
    // has injected exact-copy embeddings (every 25th vector).
    "q38_cosine_neardup" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"), col("label"))
      val copies = e.filter(col("vec_id") % 25 === 0)
        .select((-col("vec_id") * 2 - 2).as("vec_id"), col("embedding"), col("label"))
      Similarity.cosineNearDupPairs(e.unionByName(copies), "vec_id", "embedding", "label", 19, 20)
    }),

    // Generic bucket-size pre-flight (the q44 analog for the embedding
    // side): the one-row cost profile a 100 TB job reads BEFORE
    // committing to the quadratic-per-bucket q38 pair join — same
    // corpus, same bucket column. Column pruning matters: the profile
    // never reads the embedding vectors.
    "q52_bucket_cost_profile" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("label"))
      val copies = e.filter(col("vec_id") % 25 === 0)
        .select((-col("vec_id") * 2 - 2).as("vec_id"), col("label"))
      Similarity.bucketCostProfile(e.unionByName(copies), "label")
    }),

    // LSH-bucketed ANN: data-independent random-hyperplane buckets (no
    // natural clustering needed) restricting the search per query.
    "q42_ann_lsh_bucketed" -> ((s, dir) => {
      val base = Dedup.once(
          Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
          "qv", Similarity.quantize(col("embedding")))
        .withColumn("lsh_bucket", Similarity.lshBucketFromQuantized(col("qv"), 4))
        .select(col("vec_id"), col("embedding"), col("lsh_bucket"))
      Similarity.bucketedTopK(base, "vec_id", "embedding", "lsh_bucket",
        col("vec_id") % 50 === 0 && col("vec_id") < 2000, 3)
    }),

    // LSH band-bucket guard: the per-band bucket-size profile that
    // predicts candidate-join cost (quadratic per bucket) — the check a
    // 100 TB near-dup run fires before committing to the pair join.
    "q44_lsh_bucket_stats" -> ((s, dir) =>
      Dedup.bandBucketStats(docsCorpus(s, dir), "doc_id", "text")),

    // Character-n-gram Jaccard near-dup: the same banded-LSH machinery
    // with char 5-grams of the normalized stream as set elements —
    // catches intra-word edits that word shingling misses.
    "q45_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(docsCorpus(s, dir), "doc_id", "text")),

    // BPE-ish token counting (GPT-2 pre-tokenizer regex) and the
    // order-sensitive Rabin-Karp rolling-hash document fingerprint.
    "q46_bpe_rolling" -> ((s, dir) => {
      val toks = TextAnalysis.tokens(col("text"))
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextAnalysis.bpeTokenCount(col("text")).as("n_bpe"),
        TextAnalysis.rollingHash(toks).as("roll_hash"))
    }),

    // Greedy sequence packing into fixed token budgets (pretraining batch
    // prep). Groups are PORTABLE hash groups (md5-derived), so the greedy
    // run is engine-reproducible: the DuckDB oracle replays it with a
    // recursive CTE — q51 is fully hash-gated, not rows-only. The library
    // API returns doc_ids as array<long>; the gate entry projects it to a
    // comma-joined string because the driver's comparator hashes scalar
    // cells only (ADVICE r3: raw arrays make its pandas sort throw).
    "q51_sequence_packing" -> ((s, dir) =>
      Sampling.packSequences(Tables.documents(s, dir), "doc_id", "text",
        tokenBudget = 512, numGroups = 32).toDF()
        .select(col("seq_id"), concat_ws(",", col("doc_ids")).as("doc_ids_csv"),
          col("n_docs"), col("total_tokens"))),

    // Deterministic hash-keyed train/val/test assignment — never rand():
    // same doc, same split on any engine/run/retry.
    "q49_hash_split" -> ((s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"),
        Sampling.splitAssign(col("doc_id"),
          Seq(("train", 90), ("val", 5), ("test", 5))).as("split"))),

    // Gopher/C4-style repetition profile: repeated-3-gram fraction.
    "q50_repetition_stats" -> ((s, dir) => {
      val base = Dedup.once(
          Tables.documents(s, dir).select(col("doc_id"), col("text")),
          "__toks", TextAnalysis.tokens(col("text")))
        .transform(d => Dedup.once(d, "__sh3", Dedup.shingles(col("__toks"), 3)))
      base.select(col("doc_id") +: TextAnalysis.repetitionStats(col("__sh3")): _*)
    }),

    // Quality-ratio profile (punct/stopword basis points) + n-gram
    // language ID: the ratio features and the char-trigram-profile
    // heuristic, all integer-valued for engine-exact comparison.
    "q48_quality_lang_profile" -> ((s, dir) => {
      val base = Dedup.once(
          Tables.documents(s, dir).select(col("doc_id"), col("text")),
          "__toks", TextAnalysis.tokens(col("text")))
        .transform(d => Dedup.once(d, "__norm", concat_ws(" ", col("__toks"))))
      base.select(
        col("doc_id") +:
          TextAnalysis.qualityProfile(col("text"), col("__toks")) :+
          TextAnalysis.langGuessNgram(col("__norm")).as("lang_ngram"): _*)
    }),

    // Frame sampling over opaque payloads: fixed windows at a byte
    // stride, one row per (asset, frame) — decode-free multimodal
    // slicing, fully codegen'd.
    "q47_frame_samples" -> ((s, dir) => {
      val assets = Multimodal.assetsFromText(Tables.documents(s, dir), "doc_id", "text")
      Multimodal.frameSamples(assets, frameLen = 64, stride = 48)
    }),

    // Multimodal plumbing: opaque binary payloads + metadata + head sample.
    "q37_multimodal_meta" -> ((s, dir) => {
      val assets = Multimodal.assetsFromText(Tables.documents(s, dir), "doc_id", "text")
      Multimodal.sampleHead(assets, 8).select(
        col("asset_id"),
        length(col("content")).cast("long").as("n_bytes"),
        md5(col("content")).as("content_hash"),
        col("head_hex"))
    }),

    // REAL header decode: PNG IHDR / JPEG SOF dimensions parsed from the
    // payload bytes (dependency-free), over planted fixtures whose
    // dimensions the oracle recomputes arithmetically from the id.
    "q78_media_headers" -> ((s, dir) => {
      val ids = Tables.documents(s, dir).select(col("doc_id"))
        .as(org.apache.spark.sql.Encoders.scalaLong)
      val assets = ids.map(mediaAsset(_))(
        org.apache.spark.sql.Encoders.product[Multimodal.Asset]).toDF()
      Multimodal.headerMeta(assets).toDF()
    }),

    // Bloom-prefiltered decontamination: identical SPEC to q57 (the fpp
    // knob only adds confirm-join input, never results — the oracle is
    // the plain exact-overlap SQL), but the training corpus dies against
    // a driver-built Bloom filter inside the scan before anything joins.
    // Distinct eval fixture (every 13th doc's 300-char head) so q57 and
    // q79 gate independently.
    "q79_bloom_decontamination" -> ((s, dir) => {
      val train = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val eval = train.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 90000).as("doc_id"),
          substring(col("text"), 1, 300).as("text"))
      Dedup.bloomDecontaminate(train, eval, "doc_id", "text", w = 8)
    }),

    // WET-style HTML extraction: each doc wrapped in markup with
    // script/style/comment blocks, mixed-case tags and entities; the
    // gate hash-checks the extracted text byte-for-byte (md5 + length
    // + head) against DuckDB running the same engine-neutral patterns.
    "q81_html_extract" -> ((s, dir) => {
      val html = concat(
        lit(HtmlFixPre), col("doc_id").cast("string"), lit(HtmlFixMid1),
        col("source"), lit(HtmlFixMid2), col("text"), lit(HtmlFixPost))
      val t = TextAnalysis.htmlToText(html)
      Tables.documents(s, dir).select(
        col("doc_id"),
        md5(t).as("text_md5"),
        length(t).cast("long").as("n_chars_x"),
        substring(t, 1, 40).as("head"))
    }),

    // Per-doc fingerprint novelty: the memorization/boilerplate lens —
    // share of each doc's 8-token windows appearing nowhere else in the
    // corpus (the planted duplicates make every 10th doc's profile
    // collapse to 0 unique).
    "q82_chunk_novelty" -> ((s, dir) =>
      Dedup.noveltyProfile(docsCorpus(s, dir), "doc_id", "text", w = 8)
        .select(col("id").as("doc_id"), col("n_chunks"),
          col("n_unique_chunks"), col("novelty_ppm"))),

    // Product quantization: 4 per-subspace deterministic codebooks over
    // the 64-dim vectors; codes + exact integer reconstruction error.
    // The oracle unrolls all four 2-round Lloyd chains on the slices.
    // The gate flattens the codes array to one scalar column per
    // subspace: the driver's hash harness sorts result columns in
    // pandas, where list cells are unhashable (r7's q83 err).
    "q83_pq_encode" -> ((s, dir) =>
      Similarity.pqEncode(Tables.embeddings(s, dir), "vec_id", "embedding",
          m = 4, k = 4, iters = 2)
        .select(Seq(col("vec_id")) ++
          (0 until 4).map(j => element_at(col("codes"), j + 1).as(s"code_$j")) ++
          Seq(col("recon_err")): _*)),

    // ADC top-k over the PQ codes (the IVF-PQ query loop): every 50th
    // vector queries the code table; distances are exact integer sums of
    // query-slice-to-centroid distances — raw corpus vectors untouched.
    "q84_pq_adc_topk" -> ((s, dir) =>
      Similarity.pqAdcTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        queryPred = col("vec_id") % 50 === 0 && col("vec_id") < 2000, m = 4, k = 4, iters = 2, topK = 10)),

    // RAG/context-window chunking: 32-token chunks, 8-token overlap over
    // the canonical token stream; gate hashes every chunk's text.
    "q87_token_chunks" -> ((s, dir) =>
      TextAnalysis.tokenChunks(Tables.documents(s, dir), "doc_id", "text",
          size = 32, overlap = 8)
        .select(col("id").as("doc_id"), col("chunk_idx"), col("n_tokens"),
          md5(col("chunk_text")).as("chunk_md5"))),

    // ANN recall@3 of the label-bucketed search (q36's config) against
    // brute-force ground truth (q35's config at the same k) — the
    // measured answer to what bucket-restriction costs in quality.
    "q89_ann_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val pred = col("vec_id") % 50 === 0 && col("vec_id") < 2000
      Similarity.annRecall(
        Similarity.bruteForceTopK(emb, "vec_id", "embedding", pred, 3),
        Similarity.bucketedTopK(emb, "vec_id", "embedding", "label", pred, 3),
        k = 3)
    }),

    // Corpus snapshot CDC diff: two derived snapshots (docs dropped on
    // each side, every 5th doc revised) classified added / removed /
    // changed / unchanged by content hash — text never shuffles.
    "q90_snapshot_diff" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val oldSnap = d.filter(col("doc_id") % 10 =!= 3)
        .select(col("doc_id"), col("text"))
      val newSnap = d.filter(col("doc_id") % 10 =!= 7)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" rev2")))
            .otherwise(col("text")).as("text"))
      Dedup.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
        .select(col("id").as("doc_id"), col("old_hash"), col("new_hash"),
          col("status"))
    }),

    // MinHash estimator calibration on the LSH candidate pairs: the
    // 12-component signature-agreement estimate next to exact Jaccard.
    "q91_minhash_estimate" -> ((s, dir) =>
      Dedup.minhashCalibration(docsCorpus(s, dir), "doc_id", "text")),

    // Corpus-relative quality gate: q73's scorer, but the threshold is
    // the corpus's exact median (retention pinned, not the score scale).
    "q92_quality_threshold" -> ((s, dir) => {
      val base = Dedup.once(
          Tables.documents(s, dir).select(col("doc_id"), col("text")),
          "__toks", TextAnalysis.tokens(col("text")))
        .transform(d => Dedup.once(d, "__sh3", Dedup.shingles(col("__toks"), 3)))
      val scored = base.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text"), col("__toks"), col("__sh3")).as("score"))
      TextAnalysis.keepAbovePercentile(scored, "score", 50)
    }),

    // Per-source data card over a corpus with planted same-source exact
    // dups: volumes, length percentiles, language share, dup exposure.
    // Planted ids offset by MAX(doc_id)+1 (a 1-row broadcast, the
    // k-means-centroid pattern) so they can NEVER collide with real ids
    // at any fixture size — the oracle's doc_id self-join depends on it.
    "q93_source_datacard" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("text"), col("source"))
      val off = d.agg((max(col("doc_id")) + 1L).as("__off"))
      val corpus = d.unionByName(d.filter(col("doc_id") % 10 === 0)
        .crossJoin(broadcast(off))
        .select((col("doc_id") + col("__off")).as("doc_id"), col("text"), col("source")))
      TextAnalysis.sourceDataCard(corpus, "doc_id", "text", "source")
    }),

    // Per-source percent-rank + quartile of token length — the window
    // calibration pair (percent_rank/ntile class) in integer ppm; one
    // shuffle on the source key, never a global window.
    "q94_source_percentrank" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val base = Tables.documents(s, dir).select(col("source"), col("doc_id"),
        TextAnalysis.tokenCount(TextAnalysis.tokens(col("text"))).as("n_toks"))
      val w = Window.partitionBy(col("source")).orderBy(col("n_toks").asc, col("doc_id").asc)
      base
        .withColumn("rnk", row_number().over(w).cast("long"))
        .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("source"))))
        .withColumn("pr_ppm", expr(
          "CASE WHEN __n > 1 THEN ((rnk - 1) * 1000000) div (__n - 1) ELSE 0 END"))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .drop("__n")
    }),

    // Deterministic epoch upsampling to a flat 100-docs-per-source mix:
    // whole epochs + hash-prefix partial epoch, never rand().
    "q95_epoch_upsample" -> ((s, dir) =>
      Sampling.epochUpsample(
        Tables.documents(s, dir).select(col("doc_id"), col("source")),
        "doc_id", "source", quota = 100L)),

    // Per-document token spans inside q51's packed sequences — the
    // attention-mask boundary table (spans tile each sequence).
    "q97_packed_spans" -> ((s, dir) =>
      Sampling.packedSpans(Tables.documents(s, dir), "doc_id", "text",
        tokenBudget = 512, numGroups = 32).toDF()),

    // Hard-negative mining: per query, nearest different-label vectors
    // inside its learned-IVF cell (q63's buckets, a label-mismatch
    // predicate on top) — contrastive-training data prep.
    "q98_hard_negatives" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val assign = Similarity.kmeansAssign(emb, "vec_id", "embedding", k = 4, iters = 2)
        .select(col("id").as("vec_id"), col("cluster"))
      Similarity.hardNegativesTopK(emb.join(assign, Seq("vec_id")),
        "vec_id", "embedding", "cluster", "label", col("vec_id") % 50 === 0 && col("vec_id") < 2000, 3)
    }),

    // Composed IVF-PQ search — q63's learned coarse cells routing q84's
    // ADC loop: per query, integer ADC over ONLY the codes in its own
    // k-means cell (nprobe=1), never the full code table.
    "q99_ivfpq_topk" -> ((s, dir) =>
      Similarity.ivfPqTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        queryPred = col("vec_id") % 50 === 0 && col("vec_id") < 2000, cells = 4, m = 4, k = 4,
        iters = 2, topK = 10)),

    // Measured recall@10 of the composed IVF-PQ search against exact
    // brute-force cosine ground truth — the combined quality cost of
    // cell-pruning + code quantization, the number a deployment tunes
    // nprobe/m against.
    //
    // SCALE-INVARIANT PROBE SET (round 19, the q194 rule extended to
    // the whole ANN family): every probe predicate is
    // `% 50 === 0 && vec_id < 2000` — identical to the old `% 50` at
    // sf0.01/sf0.1 (max vec_id 1999, so every oracle pin is
    // byte-for-byte unchanged), but Q stays 40 at ANY larger scale. The
    // corpus-fraction form made recall MEASUREMENT cost (N/50)·N —
    // quadratic; the first sf10 campaign run spent ~4 h in this family
    // (interpreted ZipWith/ArrayAggregate ground-truth evals) before
    // the bend was diagnosed. A deployment measures recall with a
    // fixed probe sample; its QPS never grows with corpus size.
    "q100_ivfpq_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val pred = col("vec_id") % 50 === 0 && col("vec_id") < 2000
      Similarity.annRecall(
        Similarity.bruteForceTopK(emb, "vec_id", "embedding", pred, 10),
        Similarity.ivfPqTopK(emb, "vec_id", "embedding", pred,
          cells = 4, m = 4, k = 4, iters = 2, topK = 10),
        k = 10)
    }),

    // Multi-probe IVF-PQ: each query fans out over its 2 nearest coarse
    // cells before the same cell-keyed equi-join — the recall/cost knob
    // of a deployed IVF index (q99 is the nprobe=1 point).
    "q101_ivfpq_nprobe2" -> ((s, dir) =>
      Similarity.ivfPqTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        queryPred = col("vec_id") % 50 === 0 && col("vec_id") < 2000, cells = 4, m = 4, k = 4,
        iters = 2, topK = 10, nprobe = 2)),

    // The measured nprobe→recall curve (micro-averaged recall@10 vs
    // brute-force truth at nprobe = 1 and 2) — the artifact a deployment
    // reads to set nprobe: each extra probed cell buys back the
    // neighbors that fell across the cell boundary at ~1/cells of the
    // corpus in added ADC work.
    "q102_ivfpq_recall_curve" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val pred = col("vec_id") % 50 === 0 && col("vec_id") < 2000
      // ONE brute-force ground-truth pass shared by every curve point:
      // persisted so point(2) reuses point(1)'s materialization instead
      // of replaying the full-scan scoring (the suite's most expensive
      // subtree) — |queries|·k rows of cache, hashes unchanged
      val truth = Caching.pin(
        Similarity.bruteForceTopK(emb, "vec_id", "embedding", pred, 10))
      // ONE deterministic training shared by both curve points (the
      // per-point ivfPqTopK calls recomputed the identical model); each
      // point's frame is bit-identical to the single-call form
      val points = Similarity.ivfPqTopKCurve(emb, "vec_id", "embedding",
        pred, cells = 4, m = 4, k = 4, iters = 2, topK = 10,
        nprobes = Seq(1, 2))
      def point(np: Int, ann: DataFrame): DataFrame =
        Similarity.annRecall(truth, ann, k = 10)
          .agg(
            count(lit(1)).as("n_queries"),
            sum(col("n_truth")).as("total_truth"),
            sum(col("n_hits")).as("total_hits"))
          .select(lit(np.toLong).as("nprobe"), col("n_queries"),
            col("total_truth"), col("total_hits"),
            expr("(total_hits * 1000000) div total_truth").as("recall_ppm"))
      points.map { case (np, ann) => point(np, ann) }.reduce(_ unionByName _)
    }),

    // Residual IVF-PQ (the true Jégou form): PQ codebooks train on
    // vector − coarse-centroid residuals, spending the code budget on
    // within-cell detail instead of re-describing cell structure.
    "q103_ivfpq_residual" -> ((s, dir) =>
      Similarity.ivfPqResidualTopK(Tables.embeddings(s, dir), "vec_id",
        "embedding", queryPred = col("vec_id") % 50 === 0 && col("vec_id") < 2000, cells = 4,
        m = 4, k = 4, iters = 2, topK = 10)),

    // The residual analog of q102's curve — same corpus, same params,
    // so q102-vs-q104 is the measured answer to "what does residual
    // encoding buy at each probe width".
    "q104_ivfpq_residual_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val pred = col("vec_id") % 50 === 0 && col("vec_id") < 2000
      // ONE brute-force ground-truth pass shared by every curve point:
      // persisted so point(2) reuses point(1)'s materialization instead
      // of replaying the full-scan scoring (the suite's most expensive
      // subtree) — |queries|·k rows of cache, hashes unchanged
      val truth = Caching.pin(
        Similarity.bruteForceTopK(emb, "vec_id", "embedding", pred, 10))
      // ONE coarse fit + residual training shared by both curve points
      // (the q102 move applied to the residual form)
      val points = Similarity.ivfPqResidualTopKCurve(emb, "vec_id",
        "embedding", pred, cells = 4, m = 4, k = 4, iters = 2, topK = 10,
        nprobes = Seq(1, 2))
      def point(np: Int, ann: DataFrame): DataFrame =
        Similarity.annRecall(truth, ann, k = 10)
          .agg(
            count(lit(1)).as("n_queries"),
            sum(col("n_truth")).as("total_truth"),
            sum(col("n_hits")).as("total_hits"))
          .select(lit(np.toLong).as("nprobe"), col("n_queries"),
            col("total_truth"), col("total_hits"),
            expr("(total_hits * 1000000) div total_truth").as("recall_ppm"))
      points.map { case (np, ann) => point(np, ann) }.reduce(_ unionByName _)
    }),

    // The deployment step of the IVF-PQ stack: write the code table
    // cell-PARTITIONED (+ model sidecar), then answer q99's exact query
    // from the PERSISTED table — the candidate scan is partition-pruned
    // to the probed cells (plan-asserted in PlanSpec). Hash-matching
    // q99's oracle proves the persisted index serves bit-identically to
    // the in-memory composition.
    "q121_ivfpq_persisted" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val tmp = gateScratchDir(s, "q121")
      Similarity.ivfPqWriteIndex(emb, "vec_id", "embedding", tmp,
        cells = 4, m = 4, k = 4, iters = 2)
      Similarity.ivfPqServeIndex(s, tmp, emb, "vec_id", "embedding",
        queryPred = col("vec_id") % 50 === 0 && col("vec_id") < 2000, topK = 10, nprobe = 1)
    }),

    // The SERVE half of q121 on its own clock (VERDICT r15 item 4):
    // q121's 0.58 sf1 slope is the suite's worst only because train +
    // WRITE + serve are timed as one, and the write is inherently
    // data-sized. This gate builds the SAME index once per (session,
    // sfDir) — the model sidecar is the build marker, so bench passes
    // after the first reuse it — and every timed pass measures the
    // partition-pruned serve path alone, against a FIXED-SIZE probe
    // set (the 100 lowest vec_ids — dense from 0 at every sf). A
    // data-proportional probe set (q121's % 50) made the first sf1
    // replay of this gate read superlinear (slope 1.77) purely
    // because queries scaled 10× with the corpus; a serving system's
    // QPS does not grow with corpus size, so the fixed batch is both
    // the honest workload and the number that isolates the serve
    // path's own data-side scaling.
    "q194_ivfpq_serve" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val tmp = gateScratchDir(s, "q194") +
        "/" + dir.replaceAll("[^A-Za-z0-9.]", "_")
      if (!new java.io.File(tmp, Similarity.IvfPqModelFile).exists())
        Similarity.ivfPqWriteIndex(emb, "vec_id", "embedding", tmp,
          cells = 4, m = 4, k = 4, iters = 2)
      Similarity.ivfPqServeIndex(s, tmp, emb, "vec_id", "embedding",
        queryPred = col("vec_id") < 100, topK = 10, nprobe = 1)
    }),

    // The DEPLOYED-configuration serve clock (VERDICT r19 item 3):
    // q194 freezes cells=4 BY DESIGN (it measures the artifact across
    // scales); production deploys √N cells — the lever IvfServeScale
    // measured (serve slope 0.047 at √N vs 0.51 frozen). This gate is
    // the standing bench entry for that deployed shape: index built
    // once per (session, sfDir) at cells = ⌊√N⌋, and every timed pass
    // runs the full serve CYCLE — the staleness audit (the r18
    // trainedN check an operator runs before trusting an index) then
    // the partition-pruned fixed-100-probe serve. A fresh √N index
    // can never read stale (idealCells = cells by construction), so
    // the require is a tripwire, not a tautology: it fails loudly if
    // the memoized index outlives a corpus swap. The oracle replays
    // the SAME chain with cells = FLOOR(SQRT(COUNT(*))) derived from
    // the same corpus count, so the deployed cell count is pinned
    // end-to-end, not hard-coded anywhere.
    "q196_ivfpq_serve_deployed" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val tmp = gateScratchDir(s, "q196") +
        "/" + dir.replaceAll("[^A-Za-z0-9.]", "_")
      if (!new java.io.File(tmp, Similarity.IvfPqModelFile).exists()) {
        val cells = math.max(1, math.sqrt(emb.count().toDouble).toInt)
        Similarity.ivfPqWriteIndex(emb, "vec_id", "embedding", tmp,
          cells = cells, m = 4, k = 4, iters = 2): Unit
      }
      val st = Similarity.ivfPqStaleness(s, tmp)
      require(!st.stale, s"deployed index reads STALE mid-serve: $st")
      Similarity.ivfPqServeIndex(s, tmp, emb, "vec_id", "embedding",
        queryPred = col("vec_id") < 100, topK = 10, nprobe = 1)
    }),

    // The index LIFECYCLE gate: train + write on the BASE corpus only,
    // APPEND a disjoint batch encoded with the persisted model (no
    // retrain — the sidecar round-trip is the model used), run the
    // incremental per-cell compaction (every cell has 2 files after the
    // append, so each is rewritten back to one), then serve. The oracle
    // trains on base and encodes ALL — exactly what append-with-frozen-
    // model must equal, so a retrain, a dropped batch, or a compaction
    // that loses/duplicates rows all hash-mismatch.
    "q122_ivfpq_append" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val base = emb.filter(col("vec_id") % 3 =!= 0)
      val extra = emb.filter(col("vec_id") % 3 === 0)
      val tmp = gateScratchDir(s, "q122")
      Similarity.ivfPqWriteIndex(base, "vec_id", "embedding", tmp,
        cells = 4, m = 4, k = 4, iters = 2)
      Similarity.ivfPqAppendIndex(extra, "vec_id", "embedding", tmp)
      Similarity.ivfPqCompactIndex(s, tmp)
      Similarity.ivfPqServeIndex(s, tmp, emb, "vec_id", "embedding",
        queryPred = col("vec_id") % 50 === 0 && col("vec_id") < 2000, topK = 10, nprobe = 1)
    }),

    // File-level data skipping — the read-path payoff of q86's z-order
    // key: lineitem written CLUSTERED on zorder64(l_orderkey, l_partkey)
    // carries tight per-file min/max on BOTH keys, and the 2-D range
    // query hands the reader only the intersecting files — pruned from
    // the LISTING, before any footer is opened (PlanSpec asserts the
    // scan's inputFiles shrink). The residual filter makes the result
    // the full scan's filter EXACTLY, so the oracle is the plain WHERE
    // on the original table — a skipped file containing a matching row,
    // or a kept file leaking an out-of-range row, both hash-mismatch.
    "q125_skipping_read" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"))
      val tmp = gateScratchDir(s, "q125")
      graft.sinks.DataSkipping.writeWithStats(li, tmp,
        graft.functions.ZOrder64(col("l_orderkey"), col("l_partkey")),
        numFiles = 8, statsCols = Seq("l_orderkey", "l_partkey"))
      graft.sinks.DataSkipping.readPruned(s, tmp,
          Seq(("l_orderkey", 100L, 2000L), ("l_partkey", 0L, 120L)))
        .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"))
    }),

    // Targeted erasure (right-to-be-forgotten): events land key-
    // clustered with a stats manifest, four user ids are erased —
    // rewriting ONLY manifest-hit files — and the surviving table is
    // compared to the oracle's plain NOT IN. n_listed_leaked is
    // computed from the SURVIVORS (must be 0 everywhere): a file the
    // manifest should have rewritten but didn't, or a swap that lost
    // rows, flips the count or the leak column and hash-mismatches.
    "q134_erasure" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"))
      val tmp = gateScratchDir(s, "q134")
      graft.sinks.DataSkipping.writeWithStats(ev, tmp, col("user_id"),
        numFiles = 8, statsCols = Seq("user_id"))
      val doomed = Seq(5L, 17L, 123L, 400L)
      graft.sinks.Erasure.deleteKeys(s, tmp, "user_id", doomed): Unit
      s.read.parquet(tmp)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_remaining"),
          sum(when(col("user_id").isin(doomed: _*), 1L).otherwise(0L))
            .as("n_listed_leaked"))
    }),

    // Bloom-sidecar point lookup on a NON-layout key: events land
    // clustered on user_id (tight user_id ranges, event_id scattered
    // over every file — min/max on it prunes nothing), with a per-file
    // Bloom on event_id in the manifest. The 4-key lookup then reads
    // only might-contain files — pruned from the LISTING, the q125 move
    // generalized to keys the layout ignores (the id-list serve / audit
    // fetch shape). Bloom false negatives are impossible and the
    // residual IN still applies, so the oracle is the plain WHERE on
    // the original table; a skipped file hiding a match hash-mismatches.
    "q137_bloom_skip" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"))
      val tmp = gateScratchDir(s, "q137")
      graft.sinks.DataSkipping.writeWithStats(ev, tmp, col("user_id"),
        numFiles = 8, statsCols = Seq("user_id"), bloomCols = Seq("event_id"),
        bloomExpected = 2000L)
      graft.sinks.DataSkipping.readPrunedKeys(s, tmp, "event_id",
        Seq(10L, 777L, 4242L, 9000L))
    }),

    // Append-then-patch manifest maintenance (the daily-ingest path of
    // the skipping store): a base table lands with stats, a new batch
    // APPENDS — clustered within itself, manifest patched with ONLY the
    // new files' entries (base entries verbatim, suite-pinned) — and a
    // range read spanning the boundary prunes from the refreshed
    // manifest. The oracle is the plain WHERE over the whole table, so
    // a stale manifest (missing the new files) or a broken patch (lost
    // base entries) drops rows and hash-mismatches.
    "q140_skip_append" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"))
      val tmp = gateScratchDir(s, "q140")
      graft.sinks.DataSkipping.writeWithStats(
        li.filter(col("l_orderkey") % 5 =!= 0), tmp, col("l_orderkey"),
        numFiles = 6, statsCols = Seq("l_orderkey"))
      graft.sinks.DataSkipping.appendWithStats(
        li.filter(col("l_orderkey") % 5 === 0), tmp, col("l_orderkey"),
        numFiles = 2): Unit
      graft.sinks.DataSkipping.readPruned(s, tmp, Seq(("l_orderkey", 500L, 1500L)))
    }),

    // Small-file compaction with the MANIFEST as the commit point (the
    // crash-safe maintenance step q140's daily appends eventually
    // need): three tiny appended files fold into one layout-sorted
    // file, big files' bytes AND manifest entries stay verbatim
    // (suite-pinned), and the commit order — news in as orphans →
    // manifest patch → olds deleted last — keeps manifest-driven reads
    // exact through any crash. The oracle is the plain WHERE over
    // everything ever written: a row lost or duplicated across the
    // fold hash-mismatches.
    "q145_compact_small" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"))
      val tmp = gateScratchDir(s, "q145")
      graft.sinks.DataSkipping.writeWithStats(
        li.filter(col("l_orderkey") % 4 === 0), tmp, col("l_orderkey"),
        numFiles = 4, statsCols = Seq("l_orderkey"))
      (1 to 3).foreach(r =>
        graft.sinks.DataSkipping.appendWithStats(
          li.filter(col("l_orderkey") % 4 === r), tmp, col("l_orderkey"),
          numFiles = 1): Unit)
      graft.sinks.DataSkipping.compactSmallFiles(s, tmp, col("l_orderkey"),
        minRows = 1000000L, targetFiles = 2): Unit
      graft.sinks.DataSkipping.readPruned(s, tmp,
        Seq(("l_orderkey", Long.MinValue, Long.MaxValue - 1)))
    }),

    // Deterministic epoch shuffle — the training-order permutation
    // without rand(): position = PARALLEL global rank (StableIds range
    // partition + offset prefix-sum, the q80 plan — no one-task sort)
    // under the (md5("epoch#id"), id) order. Same epoch → same
    // permutation on any cluster/retry; next epoch → a fresh one. The
    // data loader's shuffle, computed once, reproducible forever.
    "q163_epoch_shuffle" -> ((s, dir) => {
      val t = Tables.documents(s, dir).select(col("doc_id"))
        .withColumn("h", Dedup.hash32(
          concat_ws("#", lit("7"), col("doc_id").cast("string"))))
      graft.operators.StableIds.byKey(t, numPartitions = 8,
          col("h"), col("doc_id"))
        .select(col("doc_id"), col("h"), col("global_id").as("pos"))
    }),

    // ORC round-trip — the columnar-format interchange a mixed estate
    // brings (Hive-era ORC next to parquet): write the dimension as
    // ORC, read it back, and hash-match the source projection. Spark's
    // ORC path carries the same pushdown/pruning machinery as parquet;
    // money goes through exact cents as everywhere.
    "q168_orc_roundtrip" -> ((s, dir) => {
      val tmp = gateScratchDir(s, "q168") + "/orc"
      Tables.customer(s, dir).write.mode("overwrite").orc(tmp)
      s.read.orc(tmp).select(col("c_custkey"), col("c_name"),
        col("c_nationkey").cast("long").as("c_nationkey"),
        floor(col("c_acctbal") * 100 + 0.5).cast("long").as("acct_cents"),
        col("c_mktsegment"))
    }),

    // RETENTION / TTL range delete over the time-clustered store: the
    // "drop everything older than the horizon" sweep every log table
    // runs daily. Files wholly inside the doomed range — with a
    // KNOWN-ZERO null count in the manifest (min/max ignore NULLs, so
    // only the recorded null count proves no NULL row hides inside) —
    // delete from the LISTING without being read; the boundary file
    // rewrites survivors; everything newer is never touched. The
    // oracle is the plain keep-predicate over the original table, so a
    // leaked doomed row or a lost survivor hash-mismatches.
    "q169_retention_delete" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
      val tmp = gateScratchDir(s, "q169")
      graft.sinks.DataSkipping.writeWithStats(ev, tmp, col("ts_us"),
        numFiles = 8, statsCols = Seq("ts_us"))
      graft.sinks.Erasure.deleteRange(s, tmp, "ts_us",
        Long.MinValue, 1704844799999999L): Unit
      s.read.parquet(tmp).select(col("event_id"), col("event_type"), col("ts_us"))
    }),

    // LAYOUT EVOLUTION: the store re-clusters on a NEW key when the
    // query pattern changes (Iceberg partition-spec evolution / Delta
    // re-OPTIMIZE) — orderkey-clustered lineitem re-clusters on
    // partkey, ONE manifest write swaps the file set and the stats
    // config (manifest-driven reads exact through any crash, the
    // compaction protocol), and a partkey range then prunes from the
    // listing the way orderkey used to (listing shrink suite-pinned).
    // Oracle = the plain BETWEEN over the table: a row lost or
    // duplicated by the rewrite hash-mismatches.
    "q170_recluster" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"))
      val tmp = gateScratchDir(s, "q170")
      graft.sinks.DataSkipping.writeWithStats(li, tmp, col("l_orderkey"),
        numFiles = 8, statsCols = Seq("l_orderkey"))
      graft.sinks.DataSkipping.recluster(s, tmp, col("l_partkey"),
        numFiles = 8, statsCols = Seq("l_partkey")): Unit
      graft.sinks.DataSkipping.readPruned(s, tmp, Seq(("l_partkey", 0L, 150L)))
    }),

    // INVERTED TERM INDEX — exact retrieval over the corpus ("which
    // docs contain this term", the audit/recall question the ANN index
    // cannot answer): postings (term, doc, tf) land clustered on the
    // term hash with a term Bloom sidecar, and a 3-term lookup reads
    // only might-contain files — postings-sized I/O out of a
    // corpus-sized index (listing shrink suite-pinned). One queried
    // term is absent: Bloom false positives may schedule a file but
    // the residual IN keeps it out of the result, so the oracle is the
    // plain tokenize + WHERE term IN over the corpus.
    "q171_inverted_index" -> ((s, dir) => {
      val tmp = gateScratchDir(s, "q171") + "/idx"
      TextAnalysis.buildInvertedIndex(Tables.documents(s, dir), "doc_id",
        "text", tmp, numFiles = 8, bloomExpected = 20000L): Unit
      TextAnalysis.lookupTerms(s, tmp, Seq("join", "vector", "zzzabsent"))
    }),

    // Top-k collocations by pointwise mutual information — the
    // phrase-miner raw bigram frequency buries under "of the": rank by
    // the exact integer ratio (c_xy·N²·10⁶) div (M·c_x·c_y), log-free
    // (log is monotone), computed in decimal(38,0)/HUGEINT because the
    // int64 product overflows right at corpus scale (the q153 lesson);
    // min-support 5 floors PMI's hapax failure mode; total (score,
    // gram) order makes the top-40 boundary deterministic.
    "q172_collocations" -> ((s, dir) =>
      TextAnalysis.topCollocations(Tables.documents(s, dir), "doc_id", "text",
          minCount = 5L, k = 40)
        .select(col("gram"), col("c_xy"), col("c_x"), col("c_y"),
          col("score_ppm").cast("long").as("score_ppm"))),

    // Conjunctive (AND) retrieval over the inverted index: docs
    // containing ALL three query terms, found by posting-list
    // intersection expressed as one keyed aggregate over the
    // Bloom-pruned postings. Oracle = tokenize + HAVING every term.
    "q177_index_and_query" -> ((s, dir) => {
      val tmp = gateScratchDir(s, "q177") + "/idx"
      TextAnalysis.buildInvertedIndex(Tables.documents(s, dir), "doc_id",
        "text", tmp, numFiles = 8, bloomExpected = 20000L): Unit
      TextAnalysis.lookupAllTerms(s, tmp, Seq("join", "filter", "scan"))
    }),

    // BM25-shaped top-k retrieval over the index — tf saturation +
    // doc-length normalization in exact milli-unit integers (log-free
    // reciprocal idf: both engines' ln may differ in the last ulp, so
    // a log-based floor could flip; the idf variant buys bit-exact
    // replay). Doc lengths ride the postings (the "norms" file),
    // collection stats ride the build-time sidecar; df computes from
    // the pruned postings themselves.
    "q178_bm25_topk" -> ((s, dir) => {
      val tmp = gateScratchDir(s, "q178") + "/idx"
      TextAnalysis.buildInvertedIndex(Tables.documents(s, dir), "doc_id",
        "text", tmp, numFiles = 8, bloomExpected = 20000L): Unit
      TextAnalysis.bm25TopK(s, tmp, Seq("join", "vector", "table"), k = 10)
    }),

    // The full search SERVE loop — retrieve → fetch → snippet: BM25
    // ranks the top 10, the k-row result broadcasts against the corpus
    // to fetch text (map-only probe — the corpus never shuffles for a
    // serve), and the snippet is the 6-token window around the FIRST
    // query-term occurrence, located from the positional postings
    // (no text scan). Oracle replays the chain + a tokenized
    // first-match slice.
    "q186_search_serve" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val tmp = gateScratchDir(s, "q186") + "/idx"
      TextAnalysis.buildInvertedIndex(docs, "doc_id", "text", tmp,
        numFiles = 8, bloomExpected = 20000L): Unit
      TextAnalysis.searchServe(s, tmp, docs, "doc_id", "text",
        Seq("scan", "merge"), k = 10)
    }),

    // Boolean EXCLUSION retrieval ("join -vector"): an anti-join
    // between two Bloom-pruned postings reads — both postings-sized,
    // the corpus untouched. Oracle = tokenize + NOT IN.
    "q187_index_not_query" -> ((s, dir) => {
      val tmp = gateScratchDir(s, "q187") + "/idx"
      TextAnalysis.buildInvertedIndex(Tables.documents(s, dir), "doc_id",
        "text", tmp, numFiles = 8, bloomExpected = 20000L): Unit
      TextAnalysis.lookupTermsExcluding(s, tmp, Seq("join"), Seq("vector"))
    }),

    // Native Hive-style partitioned layout: events land partitionBy
    // event_type and a one-partition read prunes at the LISTING via
    // Catalyst partition discovery (PartitionFilters, PlanSpec-pinned)
    // — the standard Spark idiom next to our manifest-driven store;
    // both answers are exactly the plain WHERE.
    "q188_hive_partitions" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"))
      val tmp = gateScratchDir(s, "q188") + "/part"
      ev.write.mode("overwrite").partitionBy("event_type").parquet(tmp)
      s.read.parquet(tmp).filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("event_type"))
    }),

    // REPLICATION FROM THE CHANGE FEED — the full incremental-consumer
    // loop: a downstream copy pins upstream v1 (snapshot export), the
    // upstream advances by an append AND a staged upsert, and the
    // downstream rolls forward by applying changesBetween(1, 3) as a
    // keyed CDC batch. With the version chain intact the feed is the
    // TRUE DELTA (append batch + upsert batch — rewrite-origin
    // survivor files and their replaced originals are provenance-
    // skipped, never re-asserted). The rolled-forward replica must
    // hash-match the upstream's merged model — the lakehouse sync
    // story end to end, delta-sized, never a re-copy.
    "q189_replicate_feed" -> ((s, dir) => {
      val base = gateScratchDir(s, "q189")
      val (up, down) = (base + "/up", freshScratch(base + "/down"))
      val ord = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
      graft.sinks.DataSkipping.writeWithStats(
        ord.filter(col("o_orderkey") % 3 === 0), up, col("o_orderkey"),
        numFiles = 3, statsCols = Seq("o_orderkey"))
      graft.sinks.DataSkipping.exportSnapshot(s, up, 1L, down): Unit
      graft.sinks.DataSkipping.appendWithStats(
        ord.filter(col("o_orderkey") % 3 === 1), up, col("o_orderkey"),
        numFiles = 2): Unit
      // UPDATE-LIST-SIZED batch at every scale (the q165 rule): % 30
      // alone grows with the corpus (5M keys at sf100 — past upsertKeys'
      // maxKeys guard). A real CDC batch is bounded by the feed, not the
      // table; `< 150000` binds nothing at sf0.01/sf0.1 (dense keys
      // 0..149999), so every oracle pin is byte-identical.
      val updates = ord.filter(col("o_orderkey") % 30 === 0 &&
          col("o_orderkey") < 150000L)
        .select(col("o_orderkey"), (col("o_custkey") + 1000000L).as("o_custkey"))
      graft.sinks.DataSkipping.upsertKeys(s, up, "o_orderkey", updates,
        col("o_orderkey"), numFiles = 1): Unit
      val feed = graft.sinks.DataSkipping.changesBetween(s, up, 1L, 3L)
        .withColumn("op",
          when(col("__change") === "delete", lit("delete")).otherwise(lit("upsert")))
        .withColumn("seq", lit(1L)).drop("__change")
      val snapshot = graft.sinks.DataSkipping.readPruned(s, down,
        Seq(("o_orderkey", Long.MinValue, Long.MaxValue - 1)))
      graft.operators.CdcApply.rollForward(snapshot, feed, Seq("o_orderkey"))
    }),

    // COUNT/MIN/MAX from the manifest alone — zero data files opened
    // (the metadata-only query move); NULL semantics match SQL because
    // the per-file stats already ignore NULLs.
    "q190_metadata_count" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"))
      val tmp = gateScratchDir(s, "q190")
      graft.sinks.DataSkipping.writeWithStats(li, tmp, col("l_orderkey"),
        numFiles = 8, statsCols = Seq("l_orderkey"))
      graft.sinks.DataSkipping.metadataSummary(s, tmp, "l_orderkey")
    }),

    // HYBRID retrieval (the RAG-serving shape): the inverted index
    // produces the lexical candidate set (docs containing either query
    // term — postings-pruned, corpus untouched), and only THOSE
    // vectors rerank by quantized cosine against the broadcast query
    // embedding (vec_id 7). Candidate-sized vector work; the oracle
    // replays the q35 cosine chain restricted to the tokenized
    // candidate set (doc_id ↔ vec_id, the corpus convention).
    "q192_hybrid_search" -> ((s, dir) => {
      val tmp = gateScratchDir(s, "q192") + "/idx"
      TextAnalysis.buildInvertedIndex(Tables.documents(s, dir), "doc_id",
        "text", tmp, numFiles = 8, bloomExpected = 20000L): Unit
      val cands = TextAnalysis.lookupTerms(s, tmp, Seq("join", "vector"))
        .select(col("doc_id"))
      Similarity.rerankTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        cands, col("vec_id") === 7, k = 10)
    }),

    // SNAPSHOT EXPORT — pin a training run to an immutable copy: the
    // store commits three batches, version 2 exports as a
    // self-contained skipping store (files byte-copied, manifest
    // committed fresh at the destination), and the EXPORT must read
    // exactly the first two batches — forever, regardless of what
    // erasure/compaction later does to the source (the reproducibility
    // guarantee time travel alone cannot give).
    "q184_snapshot_export" -> ((s, dir) => {
      val base = gateScratchDir(s, "q184")
      val (store, dest) = (base + "/store", freshScratch(base + "/export"))
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"))
      graft.sinks.DataSkipping.writeWithStats(
        li.filter(col("l_orderkey") % 3 === 0), store, col("l_orderkey"),
        numFiles = 3, statsCols = Seq("l_orderkey"))
      graft.sinks.DataSkipping.appendWithStats(
        li.filter(col("l_orderkey") % 3 === 1), store, col("l_orderkey"),
        numFiles = 2): Unit
      graft.sinks.DataSkipping.appendWithStats(
        li.filter(col("l_orderkey") % 3 === 2), store, col("l_orderkey"),
        numFiles = 2): Unit
      graft.sinks.DataSkipping.exportSnapshot(s, store, 2L, dest): Unit
      graft.sinks.DataSkipping.readPruned(s, dest,
        Seq(("l_orderkey", Long.MinValue, Long.MaxValue - 1)))
    }),

    // Drift ADMISSION — a batch scored against a persisted reference
    // profile (the per-epoch data-contract gate): total-variation ppm
    // between the even-id half-corpus and the whole-corpus term
    // profile, both absent-term tails in closed form, the only join
    // batch-terms-sized. The foreachBatch composition (a planted OOD
    // epoch alarms in exactly its epoch) is suite-gated.
    "q185_drift_admission" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val profile = Dedup.once(docs.select(col("text").as("__text")),
          "__toks", TextAnalysis.tokens(col("__text")))
        .select(explode(col("__toks")).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("c_t"))
      TextAnalysis.driftAgainstProfile(
        docs.filter(col("doc_id") % 2 === 0), "text", profile)
    }),

    // Exact PHRASE query over the positional index: "table hash" as
    // consecutive tokens, answered by position-list intersection
    // (term i's positions shift left by i; a surviving start means the
    // phrase begins there) — the corpus text is never read at serve.
    // Oracle = tokenized adjacency scan over the raw corpus.
    "q181_phrase_query" -> ((s, dir) => {
      val tmp = gateScratchDir(s, "q181") + "/idx"
      TextAnalysis.buildInvertedIndex(Tables.documents(s, dir), "doc_id",
        "text", tmp, numFiles = 8, bloomExpected = 20000L): Unit
      TextAnalysis.phraseQuery(s, tmp, Seq("table", "hash"))
    }),

    // Incremental index ingest: the index builds from HALF the corpus,
    // the other half APPENDS (postings as fresh clustered files,
    // existing manifest entries verbatim, collection-stats sidecar
    // advanced) — and a BM25 serve over the merged index must equal
    // the whole-corpus spec exactly: stale stats, lost postings, or a
    // df split across batches would all shift a score.
    "q182_index_append" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val tmp = gateScratchDir(s, "q182") + "/idx"
      TextAnalysis.buildInvertedIndex(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", tmp, numFiles = 6, bloomExpected = 20000L): Unit
      TextAnalysis.appendToInvertedIndex(docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", tmp, numFiles = 4): Unit
      TextAnalysis.bm25TopK(s, tmp, Seq("merge", "group"), k = 10)
    }),

    // Corpus-bigram LM fluency score — the perplexity-filter shape
    // with exact integer arithmetic (no logs, no doubles): each doc
    // averages its bigrams' corpus conditional probability
    // (c_xy·10⁶ div c_x) in ppm. Repetitive text scores high, OOD text
    // near zero — the LM-filter decision axis, engine-replayable.
    "q173_bigram_lm" -> ((s, dir) =>
      TextAnalysis.bigramLmScore(Tables.documents(s, dir), "doc_id", "text")
        .select(col("id").as("doc_id"), col("n_bigrams"), col("lm_ppm"))),

    // Feature-hashed doc vectors (the hashing trick): terms fold into
    // 64 buckets by portable hash — fixed-width featurization with no
    // vocabulary table, no fit step; long-form (doc, bucket, n) output.
    "q174_hashing_tf" -> ((s, dir) =>
      TextAnalysis.hashingTfVectors(Tables.documents(s, dir), "doc_id",
          "text", dim = 64)
        .select(col("id").as("doc_id"), col("bucket"), col("n"))),

    // Incremental JOIN-view maintenance — the materialized-view refresh
    // (q133's aggregate-rollup companion): base orders⋈customer view
    // plus insert deltas on BOTH sides refreshes as V ∪ ΔV with
    // ΔV = ΔA⋈B' ∪ A⋈ΔB — delta-sized joins, disjoint terms, no dedup,
    // the full join never recomputes. Oracle = the full join over the
    // complete tables: a lost, duplicated, or double-counted pair
    // hash-mismatches.
    "q175_view_maintenance" -> ((s, dir) => {
      val ord = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey").as("custkey"))
      val cust = Tables.customer(s, dir)
        .select(col("c_custkey").as("custkey"), col("c_nationkey"))
      val a0 = ord.filter(col("o_orderkey") % 4 =!= 0)
      val da = ord.filter(col("o_orderkey") % 4 === 0)
      val b0 = cust.filter(col("custkey") % 5 =!= 0)
      val db = cust.filter(col("custkey") % 5 === 0)
      a0.join(b0, Seq("custkey"))
        .unionByName(graft.operators.ViewMaintenance.incrementalJoinDelta(
          a0, da, b0, db, Seq("custkey")))
        .select(col("o_orderkey"), col("custkey"),
          col("c_nationkey").cast("long").as("c_nationkey"))
    }),

    // Per-source token-distribution drift vs the corpus — exact
    // total-variation ppm in decimal(38,0)/HUGEINT (obs·N overflows
    // int64 right at the corpus scale this monitors); the absent-term
    // tail folds in closed form from the totals, so only PRESENT
    // (source, term) pairs ever join — the vocabulary is never gridded
    // against sources.
    "q176_source_drift" -> ((s, dir) =>
      TextAnalysis.sourceDrift(Tables.documents(s, dir), "source", "text")),

    // CHANGE DATA FEED between two committed versions: what an
    // incremental downstream consumer pulls to catch up, computed at
    // FILE granularity from the two manifests — for the dominant
    // append-only history the feed reads exactly the files the later
    // commits added and NOTHING else (a metadata diff + a new-files
    // scan). The gate commits three batches and pulls v1→v3: the feed
    // must be precisely batches 2 and 3 as inserts.
    "q166_change_feed" -> ((s, dir) => {
      val tmp = gateScratchDir(s, "q166") + "/store"
      val ord = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
      graft.sinks.DataSkipping.writeWithStats(
        ord.filter(col("o_orderkey") % 3 === 0), tmp, col("o_orderkey"),
        numFiles = 3, statsCols = Seq("o_orderkey"))
      graft.sinks.DataSkipping.appendWithStats(
        ord.filter(col("o_orderkey") % 3 === 1), tmp, col("o_orderkey"),
        numFiles = 2): Unit
      graft.sinks.DataSkipping.appendWithStats(
        ord.filter(col("o_orderkey") % 3 === 2), tmp, col("o_orderkey"),
        numFiles = 2): Unit
      graft.sinks.DataSkipping.changesBetween(s, tmp, 1L, 3L)
        .select(col("o_orderkey"), col("o_custkey"), col("__change"))
    }),

    // MERGE / upsert into the skipping store in ONE manifest commit:
    // matched keys are replaced (only sidecar-candidate files
    // rewritten), new keys append — the lakehouse MERGE INTO on a
    // plain parquet directory. The gate builds the store without the
    // mod-3 keys, upserts a batch that REPLACES every mod-10 key's
    // payload and INSERTS the mod-30 keys (previously absent), and the
    // full read-back must hash-match the merged model.
    "q165_store_upsert" -> ((s, dir) => {
      val tmp = gateScratchDir(s, "q165") + "/store"
      val ord = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
      graft.sinks.DataSkipping.writeWithStats(
        ord.filter(col("o_orderkey") % 3 =!= 0), tmp, col("o_orderkey"),
        numFiles = 6, statsCols = Seq("o_orderkey"))
      // UPDATE-LIST-SIZED batch at every scale (the q100 probe-set rule
      // applied to CDC fixtures): % 10 alone grew with the corpus and
      // crossed upsertKeys' own maxKeys guard at sf10 — which is the
      // guard doing its job; a real CDC batch is bounded by the feed,
      // not the table. `< 150000` binds nothing at sf0.01/sf0.1 (dense
      // keys 0..149999), so every oracle pin is byte-identical.
      val updates = ord.filter(col("o_orderkey") % 10 === 0 &&
          col("o_orderkey") < 150000L)
        .select(col("o_orderkey"), (col("o_custkey") + 1000000L).as("o_custkey"))
      graft.sinks.DataSkipping.upsertKeys(s, tmp, "o_orderkey", updates,
        col("o_orderkey"), numFiles = 2): Unit
      graft.sinks.DataSkipping.readPruned(s, tmp,
        Seq(("o_orderkey", Long.MinValue, Long.MaxValue - 1)))
    }),

    // TIME TRAVEL over the skipping store's version log: every manifest
    // commit also lands as an append-only _skip_manifest.vNNNNN.json,
    // so "the table as of commit N" is a metadata-sized read decision —
    // the Delta/Iceberg snapshot move on a plain parquet directory.
    // The gate commits three batches (write + two appends), reads the
    // store AS OF each version, and every snapshot must hash-match the
    // batches that existed at that commit; erasure truncates the log
    // (RTBF forgets history too) and vacuum expires it — both
    // suite-pinned.
    "q164_time_travel" -> ((s, dir) => {
      val tmp = gateScratchDir(s, "q164") + "/store"
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"))
      graft.sinks.DataSkipping.writeWithStats(
        li.filter(col("l_orderkey") % 3 === 0), tmp, col("l_orderkey"),
        numFiles = 4, statsCols = Seq("l_orderkey"))
      graft.sinks.DataSkipping.appendWithStats(
        li.filter(col("l_orderkey") % 3 === 1), tmp, col("l_orderkey"),
        numFiles = 2): Unit
      graft.sinks.DataSkipping.appendWithStats(
        li.filter(col("l_orderkey") % 3 === 2), tmp, col("l_orderkey"),
        numFiles = 2): Unit
      graft.sinks.DataSkipping.listVersions(s, tmp).map { v =>
        graft.sinks.DataSkipping.readPrunedAt(s, tmp,
            Seq(("l_orderkey", Long.MinValue, Long.MaxValue - 1)), v)
          .groupBy(lit(v).as("version"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("l_orderkey")).as("sum_key"),
            sum(col("l_partkey")).as("sum_part"))
      }.reduce(_ unionByName _)
    }),

    // JSONL sharded export round-trip — the interchange format the
    // tokenizer/loader fleet consumes: deterministic hash-shard
    // membership, line-sorted shard files, manifest. The gate writes
    // the corpus as JSONL, reads it BACK with an explicit schema
    // (never inference — a full pre-scan at 100 TB), and must
    // hash-match the source table exactly: a row lost, duplicated, or
    // mangled by serialization fails the oracle. Doubles stay out of
    // the export by contract (text md5 carries the payload identity).
    "q159_jsonl_export" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(
        col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text")).as("text_md5"))
      val tmp = gateScratchDir(s, "q159") + "/jsonl"
      graft.sinks.ShardedExport.writeJsonl(docs, "doc_id", tmp, numShards = 8)
      s.read.schema(
          "doc_id LONG, lang STRING, source STRING, n_chars LONG, text_md5 STRING")
        .json(tmp)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          col("text_md5"))
    }),

    // TIME-window skipping — the single most common production skip
    // key: events land clustered on event time (epoch-micros layout
    // key), the manifest carries per-file time ranges, and a 2-day
    // window prunes from the LISTING — the "last day of a year of
    // logs" read that at 100 TB decides whether a task is scheduled at
    // all. Oracle = the plain BETWEEN over everything.
    "q146_skip_time" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("event_type"))
        .withColumn("ts_us", unix_micros(col("ts")))
      val tmp = gateScratchDir(s, "q146")
      graft.sinks.DataSkipping.writeWithStats(ev.drop("ts"), tmp, col("ts_us"),
        numFiles = 8, statsCols = Seq("ts_us"))
      graft.sinks.DataSkipping.readPruned(s, tmp,
        Seq(("ts_us", 1704844800000000L, 1705017599999999L)))
    }),

    // STRING-keyed erasure (the real right-to-be-forgotten shape: the
    // erasure list arrives as urls/emails, not surrogate longs): docs
    // carry a derived doc_url, the store clusters on doc_id with a
    // Bloom sidecar on doc_url, and four urls are erased — hit files
    // found by Bloom probe (long min/max can't serve a string list),
    // rewritten write-aside-then-swap, manifest patched hit-sized. The
    // urls are collected from the four doomed doc_ids (driver-side,
    // 4 rows), so the oracle is the plain NOT IN over doc_id — url ↔
    // doc_id is a bijection — and any missed or leaked row, or a lost
    // survivor, flips a count or the leak column and hash-mismatches.
    "q138_erasure_string" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("n_chars"),
          concat(lit("https://"), col("source"), lit("/doc/"), col("doc_id"))
            .as("doc_url"))
      val tmp = gateScratchDir(s, "q138")
      graft.sinks.DataSkipping.writeWithStats(docs, tmp, col("doc_id"),
        numFiles = 8, statsCols = Seq("doc_id"), bloomCols = Seq("doc_url"),
        bloomExpected = 200L)
      val doomedIds = Seq(3L, 77L, 123L, 250L)
      val doomedUrls: Seq[Any] = docs.filter(col("doc_id").isin(doomedIds: _*))
        .select(col("doc_url")).collect().map(_.getString(0)).toSeq
      graft.sinks.Erasure.delete(s, tmp, "doc_url", doomedUrls): Unit
      s.read.parquet(tmp)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_remaining"),
          sum(when(col("doc_id").isin(doomedIds: _*), 1L).otherwise(0L))
            .as("n_listed_leaked"))
    }),

    // Sketch-based distinct profiling, calibrated: at 100 TB the
    // per-source distinct-document count runs as approx_count_distinct
    // (HLL++ — fixed-size mergeable registers, one map-side pass, no
    // distinct shuffle of the keys themselves), and this gate measures
    // its error against the exact count on the same data (the q91
    // minhash-calibration pattern). HLL is hash-based and register
    // merge is a commutative max, so the estimate is deterministic for
    // a given column regardless of partitioning — the oracle pins the
    // exact side and asserts the 5% bound held.
    "q106_approx_distinct" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy(col("source"))
        .agg(
          countDistinct(col("doc_id")).as("exact_distinct"),
          approx_count_distinct(col("doc_id"), 0.02).as("__approx"))
        .select(col("source"), col("exact_distinct"),
          (abs(col("__approx") - col("exact_distinct")) * 100 <=
            col("exact_distinct") * 5).as("within_5pct"))),

    // CDC batch apply — q90's write-side complement: a change LOG
    // (upserts, deletes, inserts, and per-key op churn where only the
    // highest-seq op may win) rolled into the current snapshot. The
    // oracle recomputes the expected final state from `documents`
    // directly, so the gate proves keep-last collapse, delete
    // semantics, insert-of-absent-key, and payload replacement all at
    // once — any mis-applied op changes a row hash.
    "q108_cdc_apply" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val snap = d.filter(col("doc_id") % 10 =!= 3)
        .select(col("doc_id"), col("text"), col("source"))
      def batch(pred: Column, seq: Long, op: String, text: Column) =
        d.filter(pred).select(col("doc_id"), lit(seq).as("seq"),
          lit(op).as("op"),
          (if (op == "delete") lit(null).cast("string") else text).as("text"),
          (if (op == "delete") lit(null).cast("string") else col("source")).as("source"))
      val changes =
        batch(col("doc_id") % 5 === 0, 1L, "upsert",
            concat(col("text"), lit(" rev2")))                       // revisions
          .unionByName(batch(col("doc_id") % 10 === 3, 1L, "upsert", col("text"))) // inserts
          .unionByName(batch(col("doc_id") % 10 === 7, 1L, "delete", col("text"))) // deletes
          // churn: upsert then delete → net delete
          .unionByName(batch(col("doc_id") % 20 === 1, 1L, "upsert",
            concat(col("text"), lit(" revA"))))
          .unionByName(batch(col("doc_id") % 20 === 1, 2L, "delete", col("text")))
          // churn: delete then upsert → net revised row
          .unionByName(batch(col("doc_id") % 20 === 11, 1L, "delete", col("text")))
          .unionByName(batch(col("doc_id") % 20 === 11, 2L, "upsert",
            concat(col("text"), lit(" rev3"))))
      graft.operators.CdcApply.rollForward(snap, changes, Seq("doc_id"))
        .select(col("doc_id"), md5(col("text")).as("text_hash"), col("source"))
    }),

    // Link-graph centrality: 3 rounds of integer-ppm PageRank over a
    // deterministic synthetic link graph (each doc links to three
    // affine-modular neighbors — doc_ids are contiguous 0..N-1, so
    // every target exists). DuckDB replays the identical unrolled
    // rounds; Long-sum arithmetic makes the ranks bit-equal under any
    // partitioning. The one driver scalar is N (the modulus — also in
    // the oracle's subquery), never data.
    "q109_pagerank" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"))
      val n = d.count()
      def gen(a: Int, b: Int) = d.select(col("doc_id").as("src"),
        ((col("doc_id") * a + b) % n).as("dst"))
      val edges = gen(31, 7).unionByName(gen(17, 3)).unionByName(gen(13, 11))
      graft.operators.LinkGraph.pageRank(
          d.select(col("doc_id").as("id")), edges, iters = 3)
        .select(col("id").as("doc_id"), col("rank_ppm"))
    }),

    // Quantile-sketch calibration (q106's pattern for percentiles): at
    // 100 TB a per-source median runs as percentile_approx (bounded-size
    // mergeable GK summaries — no sort, no full shuffle of values), and
    // this gate measures the sketch against the exact rank it claims:
    // the approx value's rank interval [cnt_lt+1, cnt_le] must sit
    // within ±5% of the true median rank (accuracy=100 guarantees ±1%,
    // so the band is robust, not vacuous). The exact LOWER median — a
    // rank-selected integer, no interpolated doubles — is pinned by the
    // oracle; the sketch's own value never leaves the job.
    "q110_percentile_sketch" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = Tables.documents(s, dir)
        .select(col("source"), col("n_chars"), col("doc_id"))
      val ap = d.groupBy(col("source"))
        .agg(percentile_approx(col("n_chars"), lit(0.5), lit(100)).as("__apx"))
      val stats = d.join(broadcast(ap), Seq("source"))
        .groupBy(col("source")).agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("n_chars") <= col("__apx"), 1L).otherwise(0L)).as("__le"),
          sum(when(col("n_chars") < col("__apx"), 1L).otherwise(0L)).as("__lt"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_chars").asc, col("doc_id").asc)
      val med = d.withColumn("__rn", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("source"))))
        .filter(col("__rn") === expr("(__n + 1) div 2"))
        .select(col("source"), col("n_chars").as("exact_median_lo"))
      med.join(stats, Seq("source"))
        .select(col("source"), col("n_rows"), col("exact_median_lo"),
          (col("__le") * 100 >= col("n_rows") * 45 &&
            col("__lt") * 100 <= col("n_rows") * 55).as("within_rank_bound"))
    }),

    // Cross-source contamination matrix: which SOURCE PAIRS share
    // verbatim 8-token windows, and how much of the smaller side's
    // distinct-chunk vocabulary the overlap covers (containment, ppm).
    // The corpus-level view of q57's doc-level decontamination — the
    // artifact that tells a mixture designer two feeds are secretly the
    // same crawl. Scale shape: per-source DISTINCT (source, chunk)
    // first, so the chunk equi-join's per-key fan-out is capped at
    // #sources (never doc-count); totals are a source-sized broadcast.
    "q111_contamination_matrix" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("source"))
      val sc = Dedup.sourceChunkVocab(d, "doc_id", "text", "source", w = 8)
      val tot = sc.groupBy(col("source")).agg(count(lit(1)).as("t"))
      val pairs = sc.select(col("source").as("src_a"), col("chunk"))
        .join(sc.select(col("source").as("src_b"), col("chunk")), Seq("chunk"))
        .filter(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("shared_chunks"))
      pairs
        .join(broadcast(tot.select(col("source").as("src_a"), col("t").as("__ta"))), Seq("src_a"))
        .join(broadcast(tot.select(col("source").as("src_b"), col("t").as("__tb"))), Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("shared_chunks"),
          expr("(shared_chunks * 1000000) div least(__ta, __tb)").as("containment_ppm"))
    }),

    // Incremental ONE-vs-corpus contamination — the admission check a
    // crawl runs BEFORE joining the mixture: the existing corpus's
    // per-source chunk vocabulary persists once (the L31 store
    // pattern; a warehouse table at scale), then ONLY the new source is
    // tokenized and joined against the store. The oracle recomputes the
    // full q111 matrix from scratch and keeps the new source's rows —
    // proving the incremental path equals the full recompute.
    "q123_contamination_incremental" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), col("source"))
      val newSrc = "src13"
      val storeDir = gateScratchDir(s, "q123")
      Dedup.sourceChunkVocab(d.filter(col("source") =!= newSrc),
          "doc_id", "text", "source", w = 8)
        .write.mode("overwrite").parquet(storeDir)
      Dedup.contaminationVsStore(d.filter(col("source") === newSrc),
        "doc_id", "text", "source", s.read.parquet(storeDir), w = 8)
    }),

    // Deterministic weight-biased draw: per source, the k best rows by
    // hash-over-weight priority (Duffield-Lund-Thorup bottom-k with
    // the uniform replaced by the portable id hash) — here weighted by
    // n_chars, so longer documents win proportionally more slots, with
    // the whole selection engine/run/retry-exact.
    "q113_priority_sample" -> ((s, dir) =>
      Sampling.prioritySample(
          Tables.documents(s, dir).select(col("doc_id"), col("source"), col("n_chars")),
          "doc_id", "n_chars", "source", k = 10)
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("priority"), col("sample_rank"))),

    // Bucketed co-located join: both sides written bucketBy(8) on the
    // join key into the session catalog, then joined WITHOUT either
    // side shuffling (bucket info replaces the exchange; PlanSpec pins
    // ≤1 exchange — the final group-by only). This is the 100 TB join
    // discipline the scale notes keep pointing at: pay the partitioning
    // once at write time, join for free forever after. The gate's
    // write-read-join loop proves the whole catalog round trip, and
    // the oracle recomputes the join from the raw parquet.
    "q115_bucketed_join" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("n_chars"))
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id").as("doc_id"), col("label"))
      // drop table AND stale location: another JVM's run leaves the
      // warehouse directory behind without a metastore entry here
      Seq("graft_q115_docs", "graft_q115_emb").foreach { t =>
        s.sql(s"DROP TABLE IF EXISTS $t")
        val p = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), t)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
      }
      docs.write.format("parquet").bucketBy(8, "doc_id").sortBy("doc_id")
        .mode("overwrite").saveAsTable("graft_q115_docs")
      emb.write.format("parquet").bucketBy(8, "doc_id").sortBy("doc_id")
        .mode("overwrite").saveAsTable("graft_q115_emb")
      s.table("graft_q115_docs").join(s.table("graft_q115_emb"), Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("label")).as("sum_label"),
          sum(col("n_chars")).as("sum_chars"))
    }),

    // HLL sketch MERGEABILITY — the property the 100 TB pattern rests
    // on: per-shard (here per-source) sketches written once, unioned at
    // query time, estimate the same cardinality as a direct
    // whole-corpus sketch within the lgK error bound. NOT bit-equal by
    // design: the union promotes sparse (coupon-exact) sketches to
    // dense HLL mode, so below the promotion threshold the direct
    // sketch is exact while the union carries normal HLL error
    // (measured here: 491 vs 500 at lgK=12) — exactly the trade a
    // shard-level pre-aggregation accepts, and what the gate bounds
    // (both estimates within ±5% of the exact count). The
    // datasketches-backed persistable form of q106's calibration.
    "q116_hll_merge" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("source"), col("doc_id"))
      val per = d.groupBy(col("source"))
        .agg(hll_sketch_agg(col("doc_id")).as("__sk"))
      val merged = per.agg(
        hll_sketch_estimate(hll_union_agg(col("__sk"))).as("__est_merged"))
      val direct = d.agg(
        hll_sketch_estimate(hll_sketch_agg(col("doc_id"))).as("__est_direct"),
        countDistinct(col("doc_id")).as("exact_total"))
      merged.crossJoin(direct).select(
        col("exact_total"),
        (abs(col("__est_merged") - col("exact_total")) * 100 <=
          col("exact_total") * 5).as("merged_within_5pct"),
        (abs(col("__est_direct") - col("exact_total")) * 100 <=
          col("exact_total") * 5).as("direct_within_5pct"))
    }),

    // Best-of-cluster canonical selection: the end-to-end curation
    // choice the dedup chain exists to serve — each near-dup cluster
    // (q53's closure) keeps its HIGHEST-QUALITY member (q73's integer
    // scorer), not an arbitrary min-id. One argmax struct-aggregate on
    // the cluster key after a broadcast-sized join of (id, score) onto
    // the cluster map; ties break to the lower id so selection stays
    // total.
    "q120_cluster_best" -> ((s, dir) => {
      val corpus = docsCorpus(s, dir)
      val clusters = Dedup.canonicalizeClusters(
        Dedup.nearDupPairs(corpus, "doc_id", "text"))
      val base = Dedup.once(corpus.select(col("doc_id"), col("text")),
          "__toks", TextAnalysis.tokens(col("text")))
        .transform(d => Dedup.once(d, "__sh3", Dedup.shingles(col("__toks"), 3)))
      val scored = base.select(col("doc_id").as("id"),
        TextAnalysis.qualityScore(col("text"), col("__toks"), col("__sh3")).as("score"))
      clusters.join(scored, Seq("id"))
        .groupBy(col("canonical_id"))
        .agg(count(lit(1)).as("n_members"),
          max(struct(col("score"), (-col("id")).as("nid"))).as("__m"))
        .select(col("canonical_id"), col("n_members"),
          (-col("__m.nid")).as("best_id"), col("__m.score").as("best_score"))
    }),

    // Per-source winsorization at [p05, p95]: outliers clipped to the
    // exact percentile band before the per-source stats — row counts
    // preserved (clip, not drop). Every row carries its clipped value;
    // the aggregate pins sums/extremes so a mis-clipped row or a
    // drifted bound hash-mismatches.
    "q118_winsorize" -> ((s, dir) =>
      TextAnalysis.winsorize(
          Tables.documents(s, dir).select(col("doc_id"), col("source"), col("n_chars")),
          "source", "n_chars", loPct = 5, hiPct = 95)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("n_chars_w")).as("sum_w"),
          min(col("n_chars_w")).as("min_w"),
          max(col("n_chars_w")).as("max_w")))
  )

  // ---------------------------------------------------------------- oracles

  private def sigSelectN(numSig: Int): String =
    (0 until numSig).map(j => s"${mhSql(j)} AS mh_$j").mkString(",\n  ")
  private val sigSelect = sigSelectN(12)

  private def bandsSqlN(numSig: Int, bandRows: Int): String =
    (0 until numSig / bandRows).map { b =>
      val bv = (0 until bandRows)
        .map(i => s"CAST(mh_${b * bandRows + i} AS VARCHAR)").mkString(" || '_' || ")
      s"SELECT doc_id, $b AS band, $bv AS bv FROM sg"
    }.mkString("\nUNION ALL\n")
  private val bandsSql = bandsSqlN(12, 2)

  /** The t→sg→bands→cand→pairs CTE chain of the LSH near-dup spec, reading
    * doc_id/text from `sourceRel` — shared by q32 and the q39 composite.
    */
  /** The chain up through band rows — shared by the pair join (q32/q39)
    * and the bucket-stats guard (q44).
    */
  /** Word-shingle hash sets (the [[lshBandsSql]] default). */
  private def wordSetsSql(sourceRel: String): String =
    s"""SELECT doc_id, $shSetSql AS sh
       |FROM (SELECT doc_id, ${toksSql("text")} AS toks FROM $sourceRel)""".stripMargin

  /** Character-n-gram hash sets over the canonical token stream (the
    * q45 variant; mirrors Dedup.charNgramHashSetFromNorm / the native
    * NgramPolyHashSet: fold (a*B + byte) % P over each gram's chars —
    * DuckDB's init-less list_reduce matches the init-0 fold because
    * byte codes < P).
    */
  private def polyHashSql(g: String): String =
    s"""CASE WHEN length($g) = 0 THEN 0
       |     ELSE list_reduce(list_transform(range(1, length($g) + 1),
       |            j -> CAST(ascii(substr($g, CAST(j AS INT), 1)) AS BIGINT)),
       |          (a, c) -> (a * ${graft.functions.NgramPolyHashSet.B} + c) % ${graft.functions.NgramPolyHashSet.P}) END""".stripMargin

  private def charNgramSetsSql(sourceRel: String, n: Int): String =
    s"""SELECT doc_id, list_distinct(list_transform(
       |    CASE WHEN length(norm) < $n THEN [norm]
       |         ELSE list_transform(range(0, length(norm) - ${n - 1}),
       |                i -> substr(norm, CAST(i + 1 AS INT), $n)) END,
       |    g -> ${polyHashSql("g")})) AS sh
       |FROM (SELECT doc_id, array_to_string(${toksSql("text")}, ' ') AS norm
       |      FROM $sourceRel)""".stripMargin

  /** The (doc_id, chunk) relation of the windowed rolling-hash dedup:
    * per-doc DISTINCT w-token-window fingerprints (mirrors
    * Dedup.chunkTable / the native WindowRollHash — DuckDB's init-less
    * list_reduce equals the init-0 fold because element hashes are
    * pre-reduced mod P).
    */
  private def chunksSql(sourceRel: String, w: Int, prefix: String = ""): String = {
    val B = graft.functions.WindowRollHash.B
    def fold(listExpr: String): String =
      s"list_reduce($listExpr, (a, h) -> (a * $B + h) % ${Dedup.P})"
    s"""${prefix}hs0 AS (SELECT doc_id,
       |  list_transform(${toksSql("text")}, tk -> ${h32Sql("tk")} % ${Dedup.P}) AS hs
       |FROM $sourceRel),
       |${prefix}wins AS (SELECT doc_id,
       |  CASE WHEN len(hs) < $w THEN [${fold("hs")}]
       |       ELSE list_transform(range(0, len(hs) - ${w - 1}),
       |              i -> ${fold(s"list_slice(hs, i + 1, i + $w)")}) END AS win
       |FROM ${prefix}hs0
       |WHERE len(hs) > 0),
       |${prefix}chunks AS (SELECT doc_id, chunk
       |  FROM ${prefix}wins, UNNEST(list_distinct(win)) AS u(chunk))""".stripMargin
  }

  /** The s0→sg→bands chain from a (doc_id, sh) sets relation. */
  private def lshBandsFromSetsSql(setsSql: String, numSig: Int = 12,
      bandRows: Int = 2): String =
    s"""s0 AS (
       |$setsSql),
       |sg AS (SELECT doc_id, sh,
       |  ${sigSelectN(numSig)}
       |FROM s0),
       |bands AS (
       |${bandsSqlN(numSig, bandRows)})""".stripMargin

  private def lshBandsSql(sourceRel: String): String =
    lshBandsFromSetsSql(wordSetsSql(sourceRel))

  private val candPairsSql: String =
    """cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM bands a JOIN bands b
      |  ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
      |pairs AS (SELECT id_a, id_b,
      |  CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS inter,
      |  CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS uni
      |FROM cand
      |JOIN sg sa ON cand.id_a = sa.doc_id
      |JOIN sg sb ON cand.id_b = sb.doc_id)""".stripMargin

  private def lshChainSql(sourceRel: String): String =
    s"""${lshBandsSql(sourceRel)},
       |$candPairsSql""".stripMargin

  /** The CTE chain of the deterministic 2-round Lloyd spec (k = 4),
    * ending at `a2` = (id, cluster, dist) with `q` = (id, qv) in scope
    * — shared by the q62 gate and the q63 learned-IVF composition.
    */
  /** @param src relation with (vec_id, embedding) — `embeddings` for the
    *   q62/q63 gates; q66 feeds a copies-planted union CTE
    * @param cellsSql SQL scalar for the cell count — "4" for the pinned
    *   small-cells gates; q196 passes the √N subquery so the oracle
    *   derives the DEPLOYED cell count from the same corpus count the
    *   Spark side uses
    */
  private def kmeansChainSql(src: String = "embeddings",
      cellsSql: String = "4"): String = {
    val h = h32Sql("CAST(id AS VARCHAR)")
    def distSql(cvRel: String): String =
      s"""CAST(list_sum(list_transform(range(1, len(q.qv) + 1),
         |      i -> (q.qv[i] - $cvRel.qv[i]) * (q.qv[i] - $cvRel.qv[i]))) AS BIGINT)""".stripMargin
    s"""q AS MATERIALIZED (SELECT vec_id AS id, ${quantSql("embedding")} AS qv FROM $src),
       |seeds AS (SELECT row_number() OVER (ORDER BY $h, id) - 1 AS c, qv FROM q
       |  QUALIFY row_number() OVER (ORDER BY $h, id) <= ($cellsSql)),
       |d1 AS (SELECT q.id, q.qv, s.c, ${distSql("s")} AS dist
       |  FROM q CROSS JOIN seeds s),
       |a1 AS (SELECT id, qv, c AS cluster, dist FROM d1
       |  QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist, c) = 1),
       |sums AS (SELECT cluster, pos, SUM(qv[pos]) AS sv, COUNT(*) AS n
       |  FROM a1, UNNEST(range(1, len(qv) + 1)) AS t(pos)
       |  GROUP BY 1, 2),
       |nc AS (SELECT cluster AS c, list(CAST(sv // n AS BIGINT) ORDER BY pos) AS qv
       |  FROM sums GROUP BY 1),
       |cent AS MATERIALIZED (SELECT seeds.c, COALESCE(nc.qv, seeds.qv) AS qv
       |  FROM seeds LEFT JOIN nc ON seeds.c = nc.c),
       |d2 AS MATERIALIZED (SELECT q.id, s.c, ${distSql("s")} AS dist
       |  FROM q CROSS JOIN cent s),
       |a2 AS MATERIALIZED (SELECT id, c AS cluster, dist FROM d2
       |  QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist, c) = 1)""".stripMargin
  }

  /** One subspace's deterministic 2-round Lloyd chain for the PQ gate
    * (q83): identical shape to [[kmeansChainSql]] but reading the
    * `[j·sub+1, (j+1)·sub]` slice of a shared `srcRel` (id, qv)
    * relation — `q` for raw-vector PQ, `res` for the residual chain —
    * every CTE prefixed `p{j}_`. Seeds are the h32-smallest ids — the
    * SAME ids in every subspace, exactly like the Spark trainer. k = 4.
    */
  private def pqChainSql(j: Int, sub: Int, srcRel: String = "q"): String = {
    val h = h32Sql("CAST(id AS VARCHAR)")
    val p = s"p${j}_"
    def dist(aRel: String, bRel: String): String =
      s"""CAST(list_sum(list_transform(range(1, len($aRel.qv) + 1),
         |      i -> ($aRel.qv[i] - $bRel.qv[i]) * ($aRel.qv[i] - $bRel.qv[i]))) AS BIGINT)""".stripMargin
    s"""${p}q AS MATERIALIZED (SELECT id, list_slice(qv, ${j * sub + 1}, ${(j + 1) * sub}) AS qv FROM $srcRel),
       |${p}seeds AS (SELECT row_number() OVER (ORDER BY $h, id) - 1 AS c, qv FROM ${p}q
       |  QUALIFY row_number() OVER (ORDER BY $h, id) <= 4),
       |${p}d1 AS (SELECT q.id, q.qv, s.c, ${dist("q", "s")} AS dist
       |  FROM ${p}q q CROSS JOIN ${p}seeds s),
       |${p}a1 AS (SELECT id, qv, c AS cluster, dist FROM ${p}d1
       |  QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist, c) = 1),
       |${p}sums AS (SELECT cluster, pos, SUM(qv[pos]) AS sv, COUNT(*) AS n
       |  FROM ${p}a1, UNNEST(range(1, len(qv) + 1)) AS t(pos)
       |  GROUP BY 1, 2),
       |${p}nc AS (SELECT cluster AS c, list(CAST(sv // n AS BIGINT) ORDER BY pos) AS qv
       |  FROM ${p}sums GROUP BY 1),
       |${p}cent AS MATERIALIZED (SELECT s.c, COALESCE(n.qv, s.qv) AS qv
       |  FROM ${p}seeds s LEFT JOIN ${p}nc n ON s.c = n.c),
       |${p}d2 AS (SELECT q.id, s.c, ${dist("q", "s")} AS dist
       |  FROM ${p}q q CROSS JOIN ${p}cent s),
       |${p}a2 AS MATERIALIZED (SELECT id, c AS cluster, dist FROM ${p}d2
       |  QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist, c) = 1)""".stripMargin
  }

  /** The training + candidate CTEs shared by every composed-IVF-PQ gate
    * (q99/q100/q101/q102): the coarse k-means cells ([[kmeansChainSql]]
    * — `a2` is argmin routing, `d2` the full query-to-centroid distance
    * table multi-probe ranks over) plus the 4 PQ codebooks
    * ([[pqChainSql]]) and one candidate row per corpus vector. Ends at
    * `cand` = (neighbor_id, cell, c0..c3) with `q`, `d2`, `p*_cent` in
    * scope.
    */
  private def ivfPqBaseSql: String = ivfPqBaseSqlAt("4")

  /** [[ivfPqBaseSql]] with a parameterized coarse cell count — the PQ
    * codebooks (k = 4, m = 4) and every downstream CTE are
    * cells-agnostic, so only the kmeans seed count changes.
    */
  private def ivfPqBaseSqlAt(cellsSql: String): String =
    s"""${kmeansChainSql(cellsSql = cellsSql)},
       |${(0 until 4).map(j => pqChainSql(j, 16)).mkString(",\n")},
       |cand AS MATERIALIZED (SELECT q.id AS neighbor_id, a2.cluster AS cell,
       |    p0_a2.cluster AS c0, p1_a2.cluster AS c1,
       |    p2_a2.cluster AS c2, p3_a2.cluster AS c3
       |  FROM q
       |  JOIN a2 ON q.id = a2.id
       |  JOIN p0_a2 ON q.id = p0_a2.id
       |  JOIN p1_a2 ON q.id = p1_a2.id
       |  JOIN p2_a2 ON q.id = p2_a2.id
       |  JOIN p3_a2 ON q.id = p3_a2.id)""".stripMargin

  /** `qs$tag`/`scored$tag` CTEs for one probe width: each query routed
    * to its `nprobe` nearest cells (rank over `d2` ordered (dist, c) —
    * exactly the struct-min / array_sort tiebreak of the Scala side),
    * then ADC against only those cells' codes. (query, neighbor) stays
    * unique at any nprobe because a neighbor lives in exactly one cell.
    */
  private def ivfPqScoredSql(nprobe: Int, tag: String = "",
      queryWhere: String = "q.id % 50 = 0 AND q.id < 2000"): String = {
    def adcDist(j: Int): String =
      s"""CAST(list_sum(list_transform(range(1, len(b$j.qv) + 1),
         |      i -> (qs$tag.s$j[i] - b$j.qv[i]) * (qs$tag.s$j[i] - b$j.qv[i]))) AS BIGINT)""".stripMargin
    s"""qs$tag AS (SELECT q.id AS query_id, r.c AS cell,
       |    ${(0 until 4).map(j => s"list_slice(q.qv, ${j * 16 + 1}, ${(j + 1) * 16}) AS s$j").mkString(",\n    ")}
       |  FROM q JOIN (SELECT id, c FROM d2
       |    QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist, c) <= $nprobe) r
       |    ON q.id = r.id
       |  WHERE $queryWhere),
       |scored$tag AS (SELECT qs$tag.query_id, cand.neighbor_id,
       |    ${(0 until 4).map(adcDist).mkString(" +\n    ")} AS adc_dist
       |  FROM cand JOIN qs$tag ON cand.cell = qs$tag.cell
       |  JOIN p0_cent b0 ON b0.c = cand.c0
       |  JOIN p1_cent b1 ON b1.c = cand.c1
       |  JOIN p2_cent b2 ON b2.c = cand.c2
       |  JOIN p3_cent b3 ON b3.c = cand.c3
       |  WHERE cand.neighbor_id <> qs$tag.query_id)""".stripMargin
  }

  /** The nprobe=1 chain of the q99/q100 gates, ending at `scored`. */
  private def ivfPqChainSql: String =
    s"$ivfPqBaseSql,\n${ivfPqScoredSql(1)}"

  /** Train-on-BASE / encode-ALL chain of the q122 append gate: coarse
    * cells and PQ codebooks train over only `base` (vec_id % 3 <> 0 —
    * the corpus the index was initially written from), then EVERY
    * vector of the full table routes and codes against those frozen
    * centroids — the relational spec of "append encodes with the
    * persisted model, no retrain". Ends at `scored` (nprobe = 1).
    */
  private def ivfPqAppendChainSql: String = {
    def distTo(aRel: String, bRel: String): String =
      s"""CAST(list_sum(list_transform(range(1, len($aRel.qv) + 1),
         |      i -> ($aRel.qv[i] - $bRel.qv[i]) * ($aRel.qv[i] - $bRel.qv[i]))) AS BIGINT)""".stripMargin
    // per-subspace code assignment of ALL vectors against the
    // base-trained p{j}_cent codebooks (pqChainSql assigns only base)
    def subAll(j: Int): String =
      s"""p${j}_qall AS (SELECT id, list_slice(qv, ${j * 16 + 1}, ${(j + 1) * 16}) AS qv FROM qall),
         |p${j}_dall AS (SELECT q.id, s.c, ${distTo("q", "s")} AS dist
         |  FROM p${j}_qall q CROSS JOIN p${j}_cent s),
         |p${j}_all AS (SELECT id, c AS cluster FROM p${j}_dall
         |  QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist, c) = 1)""".stripMargin
    def adcDist(j: Int): String =
      s"""CAST(list_sum(list_transform(range(1, len(b$j.qv) + 1),
         |      i -> (qs.s$j[i] - b$j.qv[i]) * (qs.s$j[i] - b$j.qv[i]))) AS BIGINT)""".stripMargin
    s"""base AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 3 <> 0),
       |${kmeansChainSql("base")},
       |${(0 until 4).map(j => pqChainSql(j, 16)).mkString(",\n")},
       |qall AS (SELECT vec_id AS id, ${quantSql("embedding")} AS qv FROM embeddings),
       |dall AS (SELECT q.id, s.c, ${distTo("q", "s")} AS dist
       |  FROM qall q CROSS JOIN cent s),
       |aall AS (SELECT id, c AS cluster FROM dall
       |  QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist, c) = 1),
       |${(0 until 4).map(subAll).mkString(",\n")},
       |cand AS (SELECT qall.id AS neighbor_id, aall.cluster AS cell,
       |    p0_all.cluster AS c0, p1_all.cluster AS c1,
       |    p2_all.cluster AS c2, p3_all.cluster AS c3
       |  FROM qall
       |  JOIN aall ON qall.id = aall.id
       |  JOIN p0_all ON qall.id = p0_all.id
       |  JOIN p1_all ON qall.id = p1_all.id
       |  JOIN p2_all ON qall.id = p2_all.id
       |  JOIN p3_all ON qall.id = p3_all.id),
       |qs AS (SELECT qall.id AS query_id, aall.cluster AS cell,
       |    ${(0 until 4).map(j => s"list_slice(qall.qv, ${j * 16 + 1}, ${(j + 1) * 16}) AS s$j").mkString(",\n    ")}
       |  FROM qall JOIN aall ON qall.id = aall.id
       |  WHERE qall.id % 50 = 0 AND qall.id < 2000),
       |scored AS (SELECT qs.query_id, cand.neighbor_id,
       |    ${(0 until 4).map(adcDist).mkString(" +\n    ")} AS adc_dist
       |  FROM cand JOIN qs ON cand.cell = qs.cell
       |  JOIN p0_cent b0 ON b0.c = cand.c0
       |  JOIN p1_cent b1 ON b1.c = cand.c1
       |  JOIN p2_cent b2 ON b2.c = cand.c2
       |  JOIN p3_cent b3 ON b3.c = cand.c3
       |  WHERE cand.neighbor_id <> qs.query_id)""".stripMargin
  }

  /** RESIDUAL IVF-PQ training + candidates (q103/q104): same coarse
    * cells, but the PQ codebooks train on `res` = (id, cell,
    * qv − centroid[cell]) instead of raw `q` — [[pqChainSql]] re-runs
    * its per-subspace Lloyd over the residual relation unchanged. Ends
    * at `rcand` with `q`, `d2`, `cent`, `p*_cent` in scope.
    */
  private def ivfPqResidualBaseSql: String =
    s"""${kmeansChainSql()},
       |res AS MATERIALIZED (SELECT q.id, a2.cluster AS cell,
       |    list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] - cent.qv[i]) AS qv
       |  FROM q JOIN a2 ON q.id = a2.id JOIN cent ON cent.c = a2.cluster),
       |${(0 until 4).map(j => pqChainSql(j, 16, "res")).mkString(",\n")},
       |rcand AS MATERIALIZED (SELECT res.id AS neighbor_id, res.cell,
       |    p0_a2.cluster AS c0, p1_a2.cluster AS c1,
       |    p2_a2.cluster AS c2, p3_a2.cluster AS c3
       |  FROM res
       |  JOIN p0_a2 ON res.id = p0_a2.id
       |  JOIN p1_a2 ON res.id = p1_a2.id
       |  JOIN p2_a2 ON res.id = p2_a2.id
       |  JOIN p3_a2 ON res.id = p3_a2.id)""".stripMargin

  /** `qs$tag`/`scored$tag` for residual IVF-PQ at one probe width: the
    * query's residual is re-derived against EACH probed cell's centroid
    * (exactly the Scala side's per-(query, cell) projection).
    */
  private def ivfPqResidualScoredSql(nprobe: Int, tag: String = ""): String = {
    def adcDist(j: Int): String =
      s"""CAST(list_sum(list_transform(range(1, len(b$j.qv) + 1),
         |      i -> (qs$tag.s$j[i] - b$j.qv[i]) * (qs$tag.s$j[i] - b$j.qv[i]))) AS BIGINT)""".stripMargin
    s"""qs$tag AS (SELECT query_id, cell,
       |    ${(0 until 4).map(j => s"list_slice(rqv, ${j * 16 + 1}, ${(j + 1) * 16}) AS s$j").mkString(",\n    ")}
       |  FROM (SELECT q.id AS query_id, r.c AS cell,
       |      list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] - cent.qv[i]) AS rqv
       |    FROM q JOIN (SELECT id, c FROM d2
       |      QUALIFY row_number() OVER (PARTITION BY id ORDER BY dist, c) <= $nprobe) r
       |      ON q.id = r.id
       |    JOIN cent ON cent.c = r.c
       |    WHERE q.id % 50 = 0 AND q.id < 2000)),
       |scored$tag AS (SELECT qs$tag.query_id, rcand.neighbor_id,
       |    ${(0 until 4).map(adcDist).mkString(" +\n    ")} AS adc_dist
       |  FROM rcand JOIN qs$tag ON rcand.cell = qs$tag.cell
       |  JOIN p0_cent b0 ON b0.c = rcand.c0
       |  JOIN p1_cent b1 ON b1.c = rcand.c1
       |  JOIN p2_cent b2 ON b2.c = rcand.c2
       |  JOIN p3_cent b3 ON b3.c = rcand.c3
       |  WHERE rcand.neighbor_id <> qs$tag.query_id)""".stripMargin
  }

  private val simhashW =
    (0 until 16).map(b =>
      s"list_sum(list_transform(hs, h -> CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END)) AS w$b")
      .mkString(",\n  ")
  private val simhashCombine =
    (0 until 16).map(b => s"(CASE WHEN w$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")

  val oracles: Map[String, String] = Map(
    // Replays the per-group greedy fold row by row: iteration k of the
    // recursive CTE carries the running total / sequence head into row
    // k+1 of every group simultaneously (recursion depth = max rows per
    // group, ~N/32). Portable because the group key is the md5-derived
    // id hash, not Spark's partitioner.
    "q51_sequence_packing" ->
      s"""WITH RECURSIVE t AS (
         |  SELECT ${h32Sql("CAST(doc_id AS VARCHAR)")} % 32 AS grp, doc_id,
         |    CAST(len(${toksSql("text")}) AS BIGINT) AS n_tokens
         |  FROM documents),
         |r AS (SELECT grp, doc_id, n_tokens,
         |    row_number() OVER (PARTITION BY grp ORDER BY doc_id) AS rn FROM t),
         |acc AS (
         |  SELECT grp, rn, doc_id, n_tokens, n_tokens AS run, doc_id AS seq_start
         |  FROM r WHERE rn = 1
         |  UNION ALL
         |  SELECT r.grp, r.rn, r.doc_id, r.n_tokens,
         |    CASE WHEN acc.run + r.n_tokens > 512 THEN r.n_tokens
         |         ELSE acc.run + r.n_tokens END,
         |    CASE WHEN acc.run + r.n_tokens > 512 THEN r.doc_id
         |         ELSE acc.seq_start END
         |  FROM acc JOIN r ON r.grp = acc.grp AND r.rn = acc.rn + 1)
         |SELECT 's' || CAST(seq_start AS VARCHAR) AS seq_id,
         |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids_csv,
         |  CAST(COUNT(*) AS INTEGER) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
         |FROM acc GROUP BY seq_start""".stripMargin,

    // The oracle pins the exact count and asserts Spark's HLL estimate
    // stayed inside the 5% bound (rsd = 0.02): a drifting sketch
    // hash-mismatches on the boolean.
    "q106_approx_distinct" ->
      """SELECT source,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS exact_distinct,
        |  TRUE AS within_5pct
        |FROM documents GROUP BY 1""".stripMargin,

    // Expected final state, recomputed directly: snapshot was %10<>3;
    // net-deletes are %10=7 and the %20=1 churn keys; %10=3 re-inserted
    // at original text; revisions " rev2" (%5=0) and " rev3" (%20=11).
    "q108_cdc_apply" ->
      """SELECT doc_id,
        |  md5(CASE WHEN doc_id % 5 = 0 THEN text || ' rev2'
        |           WHEN doc_id % 20 = 11 THEN text || ' rev3'
        |           ELSE text END) AS text_hash,
        |  source
        |FROM documents
        |WHERE doc_id % 10 <> 7 AND doc_id % 20 <> 1""".stripMargin,

    // Identical unrolled integer-ppm rounds; // is integer division on
    // BIGINT operands, matching Spark's `div` on positive values.
    "q109_pagerank" -> {
      def round(i: Int): String = {
        val p = s"r${i - 1}"
        s"""c$i AS (SELECT e.dst AS id, SUM($p.r // e.d) AS s
           |  FROM edges e JOIN $p ON e.src = $p.id GROUP BY 1),
           |r$i AS (SELECT nodes.id,
           |    CAST(150000 + (850000 * COALESCE(c$i.s, 0)) // 1000000 AS BIGINT) AS r
           |  FROM nodes LEFT JOIN c$i ON nodes.id = c$i.id)"""
      }
      s"""WITH nodes AS (SELECT doc_id AS id FROM documents),
         |nn AS (SELECT COUNT(*) AS c FROM documents),
         |e0 AS (
         |  SELECT doc_id AS src, (doc_id*31+7) % (SELECT c FROM nn) AS dst FROM documents
         |  UNION ALL SELECT doc_id, (doc_id*17+3) % (SELECT c FROM nn) FROM documents
         |  UNION ALL SELECT doc_id, (doc_id*13+11) % (SELECT c FROM nn) FROM documents),
         |deg AS (SELECT src, COUNT(*) AS d FROM e0 GROUP BY 1),
         |edges AS (SELECT e0.src, e0.dst, deg.d FROM e0 JOIN deg ON e0.src = deg.src),
         |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM nodes),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT id AS doc_id, r AS rank_ppm FROM r3""".stripMargin
    },

    // Exact lower median by rank selection (ties broken by doc_id,
    // mirrored in the Spark window); the sketch bound is pinned TRUE.
    "q110_percentile_sketch" ->
      """WITH ranked AS (
        |  SELECT source, n_chars, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM documents)
        |SELECT source, CAST(n AS BIGINT) AS n_rows,
        |  CAST(n_chars AS BIGINT) AS exact_median_lo,
        |  TRUE AS within_rank_bound
        |FROM ranked WHERE rn = (n + 1) // 2""".stripMargin,

    "q111_contamination_matrix" ->
      s"""WITH
         |${chunksSql("documents", 8)},
         |sc AS (SELECT DISTINCT d.source, c.chunk
         |  FROM chunks c JOIN documents d ON c.doc_id = d.doc_id),
         |tot AS (SELECT source, COUNT(*) AS t FROM sc GROUP BY 1),
         |p AS (SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS shared
         |  FROM sc a JOIN sc b ON a.chunk = b.chunk AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT src_a, src_b, CAST(shared AS BIGINT) AS shared_chunks,
         |  CAST((shared * 1000000) // LEAST(ta.t, tb.t) AS BIGINT) AS containment_ppm
         |FROM p JOIN tot ta ON p.src_a = ta.source
         |       JOIN tot tb ON p.src_b = tb.source""".stripMargin,

    // The full matrix recomputed from scratch, restricted to the new
    // source's rows — the incremental store path must equal it exactly.
    "q123_contamination_incremental" ->
      s"""WITH
         |${chunksSql("documents", 8)},
         |sc AS (SELECT DISTINCT d.source, c.chunk
         |  FROM chunks c JOIN documents d ON c.doc_id = d.doc_id),
         |tot AS (SELECT source, COUNT(*) AS t FROM sc GROUP BY 1),
         |p AS (SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS shared
         |  FROM sc a JOIN sc b ON a.chunk = b.chunk AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT src_a, src_b, CAST(shared AS BIGINT) AS shared_chunks,
         |  CAST((shared * 1000000) // LEAST(ta.t, tb.t) AS BIGINT) AS containment_ppm
         |FROM p JOIN tot ta ON p.src_a = ta.source
         |       JOIN tot tb ON p.src_b = tb.source
         |WHERE src_a = 'src13' OR src_b = 'src13'""".stripMargin,

    "q113_priority_sample" ->
      s"""WITH p AS (SELECT doc_id, source, n_chars,
         |    ${h32Sql("CAST(doc_id AS VARCHAR)")} AS h,
         |    (${h32Sql("CAST(doc_id AS VARCHAR)")} * 1000000) // n_chars AS priority
         |  FROM documents),
         |r AS (SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY source ORDER BY priority, h, doc_id) AS sample_rank
         |  FROM p)
         |SELECT doc_id, source, n_chars, CAST(priority AS BIGINT) AS priority,
         |  CAST(sample_rank AS BIGINT) AS sample_rank
         |FROM r WHERE sample_rank <= 10""".stripMargin,

    // The same join recomputed from the raw parquet: bucketing is a
    // physical layout, so the result must be layout-invariant.
    "q115_bucketed_join" ->
      """SELECT d.source,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(e.label) AS BIGINT) AS sum_label,
        |  CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |GROUP BY 1""".stripMargin,

    // Exact count pinned; both sketch bounds asserted in-row.
    "q116_hll_merge" ->
      """SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS exact_total,
        |  TRUE AS merged_within_5pct,
        |  TRUE AS direct_within_5pct
        |FROM documents""".stripMargin,

    // q53's recursive closure joined to q73's score chain; argmax via
    // the rank window (score DESC, id ASC — the Spark struct-max
    // tiebreak).
    "q120_cluster_best" ->
      s"""WITH RECURSIVE corpus AS ($corpusSql),
         |${lshChainSql("corpus")},
         |verified AS (SELECT id_a, id_b FROM pairs WHERE inter * 2 >= uni),
         |edges AS (SELECT id_a AS a, id_b AS b FROM verified
         |          UNION ALL SELECT id_b, id_a FROM verified),
         |reach AS (
         |  SELECT a AS id, b AS r FROM edges
         |  UNION
         |  SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
         |cl AS (SELECT id, CAST(LEAST(id, MIN(r)) AS BIGINT) AS canonical_id
         |  FROM reach GROUP BY id),
         |${qualityScoreChainSql("corpus")},
         |j AS (SELECT cl.canonical_id, cl.id, sc.score
         |  FROM cl JOIN sc ON cl.id = sc.doc_id),
         |w AS (SELECT canonical_id, id, score,
         |    ROW_NUMBER() OVER (PARTITION BY canonical_id
         |      ORDER BY score DESC, id ASC) AS rn,
         |    COUNT(*) OVER (PARTITION BY canonical_id) AS nm
         |  FROM j)
         |SELECT canonical_id, CAST(nm AS BIGINT) AS n_members,
         |  id AS best_id, CAST(score AS BIGINT) AS best_score
         |FROM w WHERE rn = 1""".stripMargin,

    // q64's exact-percentile formula produces the clip bounds.
    "q118_winsorize" ->
      """WITH hist AS (SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |h AS (SELECT source, v, cnt,
        |    SUM(cnt) OVER (PARTITION BY source ORDER BY v) AS cum,
        |    SUM(cnt) OVER (PARTITION BY source) AS tot
        |  FROM hist),
        |b AS (SELECT source,
        |    MIN(CASE WHEN cum >= (tot * 5 + 99) // 100 THEN v END) AS lo,
        |    MIN(CASE WHEN cum >= (tot * 95 + 99) // 100 THEN v END) AS hi
        |  FROM h GROUP BY 1),
        |w AS (SELECT d.source, LEAST(GREATEST(d.n_chars, b.lo), b.hi) AS vw
        |  FROM documents d JOIN b USING (source))
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(vw) AS BIGINT) AS sum_w,
        |  CAST(MIN(vw) AS BIGINT) AS min_w,
        |  CAST(MAX(vw) AS BIGINT) AS max_w
        |FROM w GROUP BY 1""".stripMargin,

    // q63's learned-IVF chain plus the label-mismatch predicate.
    "q98_hard_negatives" ->
      s"""WITH ${kmeansChainSql()},
         |qq AS (SELECT q.id AS query_id, a2.cluster, e.label AS q_label, q.qv FROM q
         |  JOIN a2 ON q.id = a2.id
         |  JOIN embeddings e ON q.id = e.vec_id
         |  WHERE q.id % 50 = 0 AND q.id < 2000),
         |cc AS (SELECT q.id AS neighbor_id, a2.cluster, e.label AS c_label, q.qv AS cv FROM q
         |  JOIN a2 ON q.id = a2.id
         |  JOIN embeddings e ON q.id = e.vec_id),
         |j AS (SELECT query_id, neighbor_id,
         |    ${dotSql("qq.qv", "cc.cv")} AS dot,
         |    ${dotSql("qq.qv", "qq.qv")} AS na,
         |    ${dotSql("cc.cv", "cc.cv")} AS nb
         |  FROM cc JOIN qq USING (cluster)
         |  WHERE neighbor_id <> query_id AND c_label <> q_label)
         |SELECT query_id, neighbor_id, rank, dot FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) DESC,
         |             neighbor_id ASC) AS rank
         |  FROM j)
         |WHERE rank <= 3""".stripMargin,

    // Same recursive replay as q51; `run` after a doc is its exclusive
    // end offset, so its span is [run - n_tokens, run).
    "q97_packed_spans" ->
      s"""WITH RECURSIVE t AS (
         |  SELECT ${h32Sql("CAST(doc_id AS VARCHAR)")} % 32 AS grp, doc_id,
         |    CAST(len(${toksSql("text")}) AS BIGINT) AS n_tokens
         |  FROM documents),
         |r AS (SELECT grp, doc_id, n_tokens,
         |    row_number() OVER (PARTITION BY grp ORDER BY doc_id) AS rn FROM t),
         |acc AS (
         |  SELECT grp, rn, doc_id, n_tokens, n_tokens AS run, doc_id AS seq_start
         |  FROM r WHERE rn = 1
         |  UNION ALL
         |  SELECT r.grp, r.rn, r.doc_id, r.n_tokens,
         |    CASE WHEN acc.run + r.n_tokens > 512 THEN r.n_tokens
         |         ELSE acc.run + r.n_tokens END,
         |    CASE WHEN acc.run + r.n_tokens > 512 THEN r.doc_id
         |         ELSE acc.seq_start END
         |  FROM acc JOIN r ON r.grp = acc.grp AND r.rn = acc.rn + 1)
         |SELECT 's' || CAST(seq_start AS VARCHAR) AS seq_id, doc_id,
         |  CAST(run - n_tokens AS BIGINT) AS start_tok,
         |  CAST(run AS BIGINT) AS end_tok
         |FROM acc""".stripMargin,

    "q30_exact_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT -2 * doc_id - 2, text FROM documents WHERE doc_id % 7 = 0)
        |SELECT doc_id, md5(text) AS dup_hash,
        |  COUNT(*) OVER (PARTITION BY md5(text)) AS group_size,
        |  MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id
        |FROM corpus""".stripMargin,

    "q31_minhash_signatures" ->
      s"""WITH t AS (SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
         |sg AS (SELECT doc_id, $shSetSql AS sh FROM t)
         |SELECT doc_id,
         |  $sigSelect
         |FROM sg""".stripMargin,

    "q32_lsh_neardup_pairs" ->
      s"""WITH corpus AS ($corpusSql),
         |${lshChainSql("corpus")}
         |SELECT id_a, id_b, inter, uni FROM pairs WHERE inter * 2 >= uni""".stripMargin,

    "q57_decontamination" ->
      s"""WITH train AS (SELECT doc_id, text FROM documents),
         |ev AS (SELECT doc_id + 50000 AS doc_id, substr(text, 1, 200) AS text
         |  FROM documents WHERE doc_id % 17 = 0),
         |${chunksSql("train", 8, "t_")},
         |${chunksSql("ev", 8, "e_")}
         |SELECT a.doc_id AS train_id, b.doc_id AS eval_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_shared_chunks
         |FROM t_chunks a JOIN e_chunks b ON a.chunk = b.chunk
         |GROUP BY 1, 2""".stripMargin,

    "q58_stratified_sample" ->
      s"""SELECT vec_id, label, CAST(rk AS BIGINT) AS sample_rank FROM (
         |  SELECT vec_id, label, row_number() OVER (PARTITION BY label
         |    ORDER BY ${h32Sql("CAST(vec_id AS VARCHAR)")}, vec_id) AS rk
         |  FROM embeddings)
         |WHERE rk <= 7""".stripMargin,

    "q59_redaction" -> {
      import TextAnalysis.{EmailRe, Ipv4Re, LongDigitsRe}
      s"""WITH corpus AS (SELECT doc_id,
         |  CASE WHEN doc_id % 9 = 0
         |       THEN text || ' contact bob@example.com or ops@graft.io from 10.0.0.1 ref 1234567890'
         |       ELSE text END AS text
         |FROM documents),
         |s1 AS (SELECT doc_id, text,
         |  regexp_replace(text, '$EmailRe', '<email>', 'g') AS e FROM corpus),
         |s2 AS (SELECT doc_id, text, e,
         |  regexp_replace(e, '$Ipv4Re', '<ip>', 'g') AS i FROM s1)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(e, '$Ipv4Re')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(i, '$LongDigitsRe')) AS BIGINT) AS n_longnums,
         |  md5(regexp_replace(i, '$LongDigitsRe', '<num>', 'g')) AS redacted_md5
         |FROM s2""".stripMargin
    },

    "q55_chunk_match_pairs" ->
      s"""WITH corpus AS ($corpusSql),
         |${chunksSql("corpus", 8)}
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(COUNT(*) AS BIGINT) AS n_shared_chunks
         |FROM chunks a JOIN chunks b
         |  ON a.chunk = b.chunk AND a.doc_id < b.doc_id
         |GROUP BY 1, 2""".stripMargin,

    "q56_chunk_bucket_stats" ->
      s"""WITH corpus AS ($corpusSql),
         |${chunksSql("corpus", 8)},
         |b AS (SELECT chunk, COUNT(*) AS sz FROM chunks GROUP BY chunk)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
         |  CAST(MAX(sz) AS BIGINT) AS max_bucket,
         |  CAST(SUM(sz) AS BIGINT) AS n_rows,
         |  CAST(SUM(sz * (sz - 1) // 2) AS BIGINT) AS pair_cost
         |FROM b""".stripMargin,

    // Reachability closure over the verified-pair graph: recursive UNION
    // (set semantics) terminates at the closure; canonical = min over
    // self and everything reachable.
    "q53_neardup_clusters" ->
      s"""WITH RECURSIVE corpus AS ($corpusSql),
         |${lshChainSql("corpus")},
         |verified AS (SELECT id_a, id_b FROM pairs WHERE inter * 2 >= uni),
         |edges AS (SELECT id_a AS a, id_b AS b FROM verified
         |          UNION ALL SELECT id_b, id_a FROM verified),
         |reach AS (
         |  SELECT a AS id, b AS r FROM edges
         |  UNION
         |  SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a)
         |SELECT id, CAST(LEAST(id, MIN(r)) AS BIGINT) AS canonical_id
         |FROM reach GROUP BY id""".stripMargin,

    "q45_ngram_jaccard" ->
      s"""WITH corpus AS ($corpusSql),
         |${lshBandsFromSetsSql(charNgramSetsSql("corpus", 5), numSig = 16, bandRows = 4)},
         |$candPairsSql
         |SELECT id_a, id_b, inter, uni FROM pairs WHERE inter * 2 >= uni""".stripMargin,

    // Replays the store check over the union corpus (per-doc signatures
    // are identical whichever relation computes them): new side =
    // negative ids (the clone space), store side = the original documents.
    "q60_incremental_dedup" -> {
      val matchSum = (0 until 12)
        .map(j => s"(CASE WHEN sa.mh_$j = sb.mh_$j THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH corpus AS ($corpusSql),
         |${lshBandsFromSetsSql(wordSetsSql("corpus"))},
         |cand AS (SELECT DISTINCT b.doc_id AS new_id, a.doc_id AS corpus_id
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.bv = b.bv
         |  WHERE a.doc_id >= 0 AND b.doc_id < 0),
         |m AS (SELECT new_id, corpus_id,
         |    CAST($matchSum AS BIGINT) AS n_sig_match
         |  FROM cand
         |  JOIN sg sa ON cand.corpus_id = sa.doc_id
         |  JOIN sg sb ON cand.new_id = sb.doc_id)
         |SELECT new_id, corpus_id, n_sig_match FROM m WHERE n_sig_match >= 6""".stripMargin
    },

    // Unrolls both Lloyd rounds: seeds = 4 hash-smallest ids, round-1
    // argmin (ties on centroid index), truncating-integer-mean
    // recompute (empty clusters keep their centroid), round-2 argmin.
    "q62_kmeans_assign" ->
      s"""WITH ${kmeansChainSql()}
         |SELECT id AS vec_id, CAST(cluster AS BIGINT) AS cluster, dist AS dist_sq
         |FROM a2""".stripMargin,

    // The q62 chain's final assignment becomes the bucket of a
    // q36-style in-bucket top-k.
    "q63_ann_kmeans_bucketed" ->
      s"""WITH ${kmeansChainSql()},
         |qq AS (SELECT q.id AS query_id, a2.cluster, q.qv FROM q
         |  JOIN a2 ON q.id = a2.id WHERE q.id % 50 = 0 AND q.id < 2000),
         |cc AS (SELECT q.id AS neighbor_id, a2.cluster, q.qv AS cv FROM q
         |  JOIN a2 ON q.id = a2.id),
         |j AS (SELECT query_id, neighbor_id,
         |    ${dotSql("qq.qv", "cc.cv")} AS dot,
         |    ${dotSql("qq.qv", "qq.qv")} AS na,
         |    ${dotSql("cc.cv", "cc.cv")} AS nb
         |  FROM cc JOIN qq USING (cluster) WHERE neighbor_id <> query_id)
         |SELECT query_id, neighbor_id, rank, dot FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) DESC,
         |             neighbor_id ASC) AS rank
         |  FROM j)
         |WHERE rank <= 3""".stripMargin,

    "q65_c4_line_clean" -> {
      val lineToks = "list_filter(string_split_regex(lower(trim(ln)), '[^a-z0-9]+'), x -> x <> '')"
      s"""WITH corpus AS (SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |    ' table ', '.' || chr(10), 'g'), ' query ', chr(10), 'g'),
         |    ' slow ', ' javascript ', 'g') AS text
         |FROM documents),
         |l AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM corpus),
         |k AS (SELECT doc_id, lines, list_filter(lines, ln ->
         |    len($lineToks) >= 3
         |    AND right(trim(ln), 1) IN ('.', '!', '?', '"')
         |    AND NOT contains(lower(trim(ln)), 'javascript')
         |    AND NOT contains(lower(trim(ln)), 'lorem ipsum')
         |    AND NOT contains(lower(trim(ln)), '{')) AS kept
         |  FROM l)
         |SELECT doc_id, CAST(len(kept) AS BIGINT) AS n_kept,
         |  CAST(len(lines) - len(kept) AS BIGINT) AS n_dropped,
         |  len(kept) >= 3 AS doc_kept,
         |  -- DuckDB array_to_string(empty, sep) is NULL, Spark concat_ws is ''
         |  md5(COALESCE(array_to_string(kept, chr(10)), '')) AS cleaned_md5
         |FROM k""".stripMargin
    },

    // k-means over the copies-planted union, in-cluster integer-cosine
    // pairs (19/20 threshold: dot²·400 ≥ na·nb·361), then the same
    // recursive reachability closure as q53 for min-id canonicalization.
    "q66_semantic_dedup" ->
      s"""WITH RECURSIVE semsrc AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT -2 * vec_id - 2, embedding FROM embeddings WHERE vec_id % 25 = 0),
         |${kmeansChainSql("semsrc")},
         |v AS (SELECT q.id, q.qv, a2.cluster FROM q JOIN a2 ON q.id = a2.id),
         |pr AS (SELECT a.id AS id_a, b.id AS id_b,
         |    ${dotSql("a.qv", "b.qv")} AS dot,
         |    ${dotSql("a.qv", "a.qv")} AS na,
         |    ${dotSql("b.qv", "b.qv")} AS nb
         |  FROM v a JOIN v b ON a.cluster = b.cluster AND a.id < b.id),
         |verified AS (SELECT id_a, id_b FROM pr
         |  WHERE dot > 0 AND dot * dot * 400 >= na * nb * 361),
         |edges AS (SELECT id_a AS a, id_b AS b FROM verified
         |          UNION ALL SELECT id_b, id_a FROM verified),
         |reach AS (
         |  SELECT a AS id, b AS r FROM edges
         |  UNION
         |  SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
         |canon AS (SELECT id, CAST(LEAST(id, MIN(r)) AS BIGINT) AS canonical_id
         |  FROM reach GROUP BY id)
         |SELECT v.id AS vec_id, CAST(v.cluster AS BIGINT) AS cluster,
         |  COALESCE(canon.canonical_id, v.id) AS canonical_id,
         |  CAST(CASE WHEN COALESCE(canon.canonical_id, v.id) = v.id
         |       THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM v LEFT JOIN canon ON v.id = canon.id""".stripMargin,

    "q67_source_mixing" ->
      s"""WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_group,
         |    CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE))) * 2 AS BIGINT) AS quota
         |  FROM documents GROUP BY 1),
         |r AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source
         |    ORDER BY ${h32Sql("CAST(doc_id AS VARCHAR)")}, doc_id) AS rk
         |  FROM documents)
         |SELECT doc_id, source, n_group, quota, CAST(rk AS BIGINT) AS sample_rank
         |FROM r JOIN c USING (source) WHERE rk <= quota""".stripMargin,

    // Truncating integer division on both sides (DuckDB `//` and Spark
    // `div` both round toward zero), so codes agree bit for bit.
    "q68_int8_quantization" ->
      s"""WITH v AS (SELECT vec_id, ${quantSql("embedding")} AS qv FROM embeddings),
         |sc AS (SELECT vec_id, qv,
         |    GREATEST(list_max(list_transform(qv, x -> abs(x))), 1) AS scale FROM v),
         |t AS (SELECT vec_id, qv, scale,
         |    list_transform(qv, x -> (x * 127) // scale) AS q8 FROM sc)
         |SELECT vec_id, CAST(scale AS BIGINT) AS scale,
         |  CAST(COALESCE(list_sum(q8), 0) AS BIGINT) AS sum_q8,
         |  CAST(list_max(list_transform(q8, x -> abs(x))) AS BIGINT) AS max_abs_q8,
         |  CAST(COALESCE(list_sum(list_transform(range(1, len(qv) + 1),
         |    i -> abs(qv[i] * 127 - q8[i] * scale))), 0) AS BIGINT) AS recon_err
         |FROM t""".stripMargin,

    // Line-frequency table on the 32-bit line hash (the key the Spark
    // plan shuffles), then per-doc reassembly in position order;
    // string_agg skips the removed (NULL-mapped) lines.
    "q69_repeated_lines" ->
      s"""WITH corpus AS (SELECT doc_id,
         |  regexp_replace(text, ' table ', chr(10), 'g')
         |  || CASE WHEN doc_id % 3 = 0
         |       THEN chr(10) || 'subscribe to our newsletter today' ELSE '' END
         |  || CASE WHEN doc_id % 7 = 0
         |       THEN chr(10) || 'all rights reserved' ELSE '' END AS text
         |FROM documents),
         |l AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM corpus),
         |e AS (SELECT doc_id, i AS pos, lines[i] AS ln
         |  FROM l, UNNEST(range(1, len(lines) + 1)) AS t(i)),
         |h AS (SELECT doc_id, pos, ln, ${h32Sql("ln")} AS lh FROM e),
         |c AS (SELECT lh, COUNT(DISTINCT doc_id) AS nd FROM h GROUP BY 1),
         |k AS (SELECT h.doc_id, h.pos, h.ln, c.nd FROM h JOIN c USING (lh))
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
         |  CAST(SUM(CASE WHEN nd > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         |  md5(COALESCE(string_agg(CASE WHEN nd <= 2 THEN ln END, chr(10) ORDER BY pos), ''))
         |    AS cleaned_md5
         |FROM k GROUP BY doc_id""".stripMargin,

    // DuckDB's native ASOF LEFT JOIN is the spec; the Spark plan reaches
    // the same matches with a merged-stream running window. The right
    // side is pre-deduped to one row per (user_id, ts) in both engines.
    "q70_asof_join" ->
      s"""WITH p AS (SELECT event_id, user_id, ts FROM events
         |  WHERE event_type = 'purchase'),
         |s0 AS (SELECT user_id, ts, MAX(event_id) AS signup_id
         |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
         |SELECT p.event_id, p.user_id, s0.signup_id,
         |  epoch_us(p.ts) - epoch_us(s0.ts) AS lag_us
         |FROM p ASOF LEFT JOIN s0
         |  ON p.user_id = s0.user_id AND p.ts >= s0.ts""".stripMargin,

    // q70's spec verbatim: the Spark side feeds TIMESTAMP_NTZ inputs
    // through the same operator, and the NTZ cast is value-preserving
    // under the pinned UTC session — equal hashes IS the L96 claim.
    "q128_asof_ntz" ->
      s"""WITH p AS (SELECT event_id, user_id, ts FROM events
         |  WHERE event_type = 'purchase'),
         |s0 AS (SELECT user_id, ts, MAX(event_id) AS signup_id
         |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
         |SELECT p.event_id, p.user_id, s0.signup_id,
         |  epoch_us(p.ts) - epoch_us(s0.ts) AS lag_us
         |FROM p ASOF LEFT JOIN s0
         |  ON p.user_id = s0.user_id AND p.ts >= s0.ts""".stripMargin,

    // Same ASOF spec as q70 — the Spark side reaches it via the
    // broadcast sorted-array + binary-search plan instead of the
    // merged-stream window, so the two gates pin both physical forms to
    // one semantics.
    "q77_asof_broadcast" ->
      s"""WITH p AS (SELECT event_id, user_id, ts FROM events
         |  WHERE event_type = 'purchase'),
         |s0 AS (SELECT user_id, ts, MAX(event_id) AS signup_id
         |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
         |SELECT p.event_id, p.user_id, s0.signup_id,
         |  epoch_us(p.ts) - epoch_us(s0.ts) AS lag_us
         |FROM p ASOF LEFT JOIN s0
         |  ON p.user_id = s0.user_id AND p.ts >= s0.ts""".stripMargin,

    "q72_top_ngrams" ->
      s"""WITH t AS (SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
         |g AS (SELECT doc_id, unnest($shinglesSql) AS gram FROM t)
         |SELECT gram, CAST(COUNT(*) AS BIGINT) AS n_total,
         |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
         |FROM g GROUP BY 1
         |ORDER BY n_total DESC, gram LIMIT 40""".stripMargin,

    // Mirrors qualityScore's weights: 3·stop_bp + alpha_bp − 2·punct_bp
    // − rep_bp, every feature floor(·10000/den) integer basis points.
    "q73_quality_filter" ->
      s"""WITH ${qualityScoreChainSql()}
         |SELECT doc_id, score,
         |  CAST(CASE WHEN score >= 9000 THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM sc""".stripMargin,

    // Histogram percentiles: cumulative count over DISTINCT lengths per
    // split; p-th = smallest value with cum >= ceil(p*n/100).
    "q64_length_percentiles" -> {
      def kth(p: Int): String = s"MIN(CASE WHEN cum >= (tot * $p + 99) // 100 THEN v END)"
      s"""WITH t AS (SELECT
         |    CASE WHEN h < 90 THEN 'train' WHEN h < 95 THEN 'val' ELSE 'test' END AS split,
         |    CAST(len(${toksSql("text")}) AS BIGINT) AS v
         |  FROM (SELECT text, ${h32Sql("CAST(doc_id AS VARCHAR)")} % 100 AS h FROM documents)),
         |hist AS (SELECT split, v, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY 1, 2),
         |h AS (SELECT split, v, cnt,
         |    SUM(cnt) OVER (PARTITION BY split ORDER BY v) AS cum,
         |    SUM(cnt) OVER (PARTITION BY split) AS tot
         |  FROM hist)
         |SELECT split, CAST(MAX(tot) AS BIGINT) AS n_rows,
         |  MIN(v) AS min_v, MAX(v) AS max_v,
         |  ${kth(50)} AS p50, ${kth(90)} AS p90, ${kth(99)} AS p99
         |FROM h GROUP BY split""".stripMargin
    },

    "q61_tfidf_terms" ->
      s"""WITH toks AS (SELECT doc_id, unnest(${toksSql("text")}) AS term FROM documents),
         |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
         |dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tf),
         |scored AS (SELECT doc_id, tf.term AS term, tf.tf AS tf, dfreq.df AS df,
         |    CAST((tf.tf * 1000000 * n_docs) // dfreq.df AS BIGINT) AS score_ppm
         |  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n)
         |SELECT doc_id, term, tf, df, score_ppm,
         |  CAST(row_number() OVER (PARTITION BY doc_id
         |    ORDER BY score_ppm DESC, term) AS BIGINT) AS term_rank
         |FROM scored
         |QUALIFY term_rank <= 3""".stripMargin,

    "q46_bpe_rolling" ->
      s"""WITH t AS (SELECT doc_id, ${toksSql("text")} AS toks, lower(text) AS lt
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(lt, '${TextAnalysis.BpePattern.replace("'", "''")}')) AS BIGINT) AS n_bpe,
         |  CAST(CASE WHEN len(toks) = 0 THEN 0
         |       ELSE list_reduce(list_transform(toks, tk -> ${h32Sql("tk")} % ${Dedup.P}),
         |              (a, h) -> (a * ${TextAnalysis.RollB} + h) % ${Dedup.P}) END AS BIGINT) AS roll_hash
         |FROM t""".stripMargin,

    "q49_hash_split" ->
      s"""SELECT doc_id,
         |  CASE WHEN h < 90 THEN 'train' WHEN h < 95 THEN 'val' ELSE 'test' END AS split
         |FROM (SELECT doc_id,
         |  ${h32Sql("CAST(doc_id AS VARCHAR)")} % 100 AS h FROM documents)""".stripMargin,

    "q50_repetition_stats" ->
      s"""WITH t AS (SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
         |s AS (SELECT doc_id, $shinglesSql AS sh3 FROM t)
         |SELECT doc_id,
         |  CAST(len(sh3) AS BIGINT) AS n_3grams,
         |  CAST(len(list_distinct(sh3)) AS BIGINT) AS n_distinct_3grams,
         |  CASE WHEN len(sh3) = 0 THEN 0
         |       ELSE CAST(FLOOR((len(sh3) - len(list_distinct(sh3))) * 10000.0 / len(sh3)) AS BIGINT) END AS rep_bp
         |FROM s""".stripMargin,

    "q48_quality_lang_profile" -> {
      def triOverlap(inv: Seq[String]): String =
        inv.map(t => s"(CASE WHEN contains(norm, '$t') THEN 1 ELSE 0 END)").mkString(" + ")
      val en = triOverlap(TextAnalysis.EnTri)
      val fr = triOverlap(TextAnalysis.FrTri)
      val de = triOverlap(TextAnalysis.DeTri)
      s"""WITH t AS (SELECT doc_id, text, ${toksSql("text")} AS toks FROM documents),
         |n AS (SELECT doc_id, text, toks, array_to_string(toks, ' ') AS norm FROM t),
         |g AS (SELECT *,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS BIGINT) AS n_punct,
         |  CAST(len(toks) AS BIGINT) AS n_toks,
         |  CAST(len(list_intersect(toks, ${sqlList(TextAnalysis.EnStop)})) AS BIGINT) AS n_stop
         |FROM n)
         |SELECT doc_id, n_chars, n_punct,
         |  CASE WHEN n_chars = 0 THEN 0
         |       ELSE CAST(FLOOR(n_punct * 10000.0 / n_chars) AS BIGINT) END AS punct_bp,
         |  CASE WHEN n_toks = 0 THEN 0
         |       ELSE CAST(FLOOR(n_stop * 10000.0 / n_toks) AS BIGINT) END AS stop_bp,
         |  (n_toks >= 5 AND n_toks <= 5000 AND n_stop >= 1) AS is_quality,
         |  CASE WHEN ($en) >= ($fr) AND ($en) >= ($de) THEN 'en'
         |       WHEN ($fr) >= ($de) THEN 'fr'
         |       ELSE 'de' END AS lang_ngram
         |FROM g""".stripMargin
    },

    // text is ASCII in the testdata, so VARCHAR windows hash identically
    // to the engine's byte windows (DuckDB 1.0 has no BLOB substring).
    "q47_frame_samples" ->
      """WITH t AS (SELECT doc_id, text,
        |  GREATEST(0, CAST(FLOOR((length(text) - 64) / 48.0) AS BIGINT)) AS last
        |  FROM documents)
        |SELECT doc_id AS asset_id, i AS frame_idx,
        |  i * 48 + 1 AS frame_off,
        |  md5(substring(text, i * 48 + 1, 64)) AS frame_hash
        |FROM t, UNNEST(range(0, last + 1)) AS u(i)""".stripMargin,

    "q44_lsh_bucket_stats" ->
      s"""WITH corpus AS ($corpusSql),
         |${lshBandsSql("corpus")},
         |buckets AS (SELECT band, bv, COUNT(*) AS sz FROM bands GROUP BY band, bv)
         |SELECT band, CAST(MAX(sz) AS BIGINT) AS max_bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n_buckets
         |FROM buckets GROUP BY band""".stripMargin,

    "q33_text_stats" ->
      s"""WITH t AS (SELECT doc_id, ${toksSql("text")} AS toks FROM documents)
         |SELECT doc_id,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
         |  CAST(len(list_intersect(toks, ${sqlList(TextAnalysis.EnStop)})) AS BIGINT) AS n_stop,
         |  CASE WHEN len(list_intersect(toks, ${sqlList(TextAnalysis.EnStop)})) >= len(list_intersect(toks, ${sqlList(TextAnalysis.FrStop)}))
         |        AND len(list_intersect(toks, ${sqlList(TextAnalysis.EnStop)})) >= len(list_intersect(toks, ${sqlList(TextAnalysis.DeStop)})) THEN 'en'
         |       WHEN len(list_intersect(toks, ${sqlList(TextAnalysis.FrStop)})) >= len(list_intersect(toks, ${sqlList(TextAnalysis.DeStop)})) THEN 'fr'
         |       ELSE 'de' END AS lang_guess,
         |  md5(array_to_string(toks, ' ')) AS fingerprint,
         |  (len(toks) >= 5 AND len(toks) <= 5000
         |   AND len(list_intersect(toks, ${sqlList(TextAnalysis.EnStop)})) >= 1) AS is_quality
         |FROM t""".stripMargin,

    "q34_simhash" ->
      s"""WITH t AS (SELECT doc_id, list_transform(${toksSql("text")}, tk -> ${h32Sql("tk")}) AS hs
         |  FROM documents),
         |w AS (SELECT doc_id,
         |  $simhashW
         |FROM t)
         |SELECT doc_id, CAST($simhashCombine AS BIGINT) AS simhash FROM w""".stripMargin,

    "q35_ann_bruteforce" ->
      s"""WITH q AS (SELECT vec_id AS query_id, ${quantSql("embedding")} AS qv
         |  FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 2000),
         |c AS (SELECT vec_id AS neighbor_id, ${quantSql("embedding")} AS cv FROM embeddings),
         |j AS (SELECT query_id, neighbor_id,
         |    ${dotSql("qv", "cv")} AS dot,
         |    ${dotSql("qv", "qv")} AS na,
         |    ${dotSql("cv", "cv")} AS nb
         |  FROM c, q WHERE neighbor_id <> query_id)
         |SELECT query_id, neighbor_id, rank, dot FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) DESC,
         |             neighbor_id ASC) AS rank
         |  FROM j)
         |WHERE rank <= 5""".stripMargin,

    "q36_ann_bucketed" ->
      s"""WITH q AS (SELECT vec_id AS query_id, label, ${quantSql("embedding")} AS qv
         |  FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 2000),
         |c AS (SELECT vec_id AS neighbor_id, label, ${quantSql("embedding")} AS cv FROM embeddings),
         |j AS (SELECT query_id, neighbor_id,
         |    ${dotSql("qv", "cv")} AS dot,
         |    ${dotSql("qv", "qv")} AS na,
         |    ${dotSql("cv", "cv")} AS nb
         |  FROM c JOIN q USING (label) WHERE neighbor_id <> query_id)
         |SELECT query_id, neighbor_id, rank, dot FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) DESC,
         |             neighbor_id ASC) AS rank
         |  FROM j)
         |WHERE rank <= 3""".stripMargin,

    "q39_curation_pipeline" -> {
      val langCase =
        s"""CASE WHEN len(list_intersect(toks, ${sqlList(TextAnalysis.EnStop)})) >= len(list_intersect(toks, ${sqlList(TextAnalysis.FrStop)}))
           |      AND len(list_intersect(toks, ${sqlList(TextAnalysis.EnStop)})) >= len(list_intersect(toks, ${sqlList(TextAnalysis.DeStop)})) THEN 'en'
           |     WHEN len(list_intersect(toks, ${sqlList(TextAnalysis.FrStop)})) >= len(list_intersect(toks, ${sqlList(TextAnalysis.DeStop)})) THEN 'fr'
           |     ELSE 'de' END""".stripMargin
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT -2 * doc_id - 2, text FROM documents WHERE doc_id % 7 = 0
         |  UNION ALL
         |  SELECT -2 * doc_id - 1, text || ' extra duplicated tail marker tokens'
         |  FROM documents WHERE doc_id % 10 = 0),
         |ex AS (SELECT doc_id, text, MIN(doc_id) OVER (PARTITION BY md5(text)) AS canon FROM corpus),
         |kept AS (SELECT doc_id, text FROM ex WHERE doc_id = canon),
         |${lshChainSql("kept")},
         |dropped AS (SELECT DISTINCT id_b FROM pairs WHERE inter * 2 >= uni),
         |surv AS (SELECT k.doc_id, k.text FROM kept k
         |  LEFT JOIN dropped d ON k.doc_id = d.id_b WHERE d.id_b IS NULL),
         |st AS (SELECT doc_id, ${toksSql("text")} AS toks FROM surv)
         |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         |  $langCase AS lang_guess
         |FROM st
         |WHERE len(toks) >= 5 AND len(toks) <= 5000
         |  AND len(list_intersect(toks, ${sqlList(TextAnalysis.EnStop)})) >= 1
         |  AND $langCase = 'en'""".stripMargin
    },

    "q52_bucket_cost_profile" ->
      """WITH corpus AS (
        |  SELECT vec_id, label FROM embeddings
        |  UNION ALL
        |  SELECT -2 * vec_id - 2, label FROM embeddings WHERE vec_id % 25 = 0),
        |b AS (SELECT label, COUNT(*) AS sz FROM corpus GROUP BY label)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
        |  CAST(MAX(sz) AS BIGINT) AS max_bucket,
        |  CAST(SUM(sz) AS BIGINT) AS n_rows,
        |  CAST(SUM(sz * (sz - 1) // 2) AS BIGINT) AS pair_cost
        |FROM b""".stripMargin,

    "q38_cosine_neardup" ->
      s"""WITH corpus AS (
         |  SELECT vec_id, embedding, label FROM embeddings
         |  UNION ALL
         |  SELECT -2 * vec_id - 2, embedding, label FROM embeddings WHERE vec_id % 25 = 0),
         |v AS (SELECT vec_id, label, ${quantSql("embedding")} AS qv FROM corpus),
         |j AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    ${dotSql("a.qv", "b.qv")} AS dot,
         |    ${dotSql("a.qv", "a.qv")} AS na,
         |    ${dotSql("b.qv", "b.qv")} AS nb
         |  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b, dot, na, nb FROM j
         |WHERE dot > 0 AND dot * dot * 400 >= na * nb * 361""".stripMargin,

    "q42_ann_lsh_bucketed" -> {
      def proj(p: Int): String =
        s"CAST(list_sum(list_transform(v, (x, i) -> CASE WHEN ((i - 1) * ${2 * p + 3}) % 7 < 4 THEN x ELSE -x END)) AS BIGINT)"
      val bucket = (0 until 4).map(p => s"(CASE WHEN ${proj(p)} > 0 THEN ${1 << p} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH base AS (SELECT vec_id, ${quantSql("embedding")} AS v FROM embeddings),
         |bk AS (SELECT vec_id, v, $bucket AS bucket FROM base),
         |q AS (SELECT vec_id AS query_id, bucket, v AS qv FROM bk WHERE vec_id % 50 = 0 AND vec_id < 2000),
         |c AS (SELECT vec_id AS neighbor_id, bucket, v AS cv FROM bk),
         |j AS (SELECT query_id, neighbor_id,
         |    ${dotSql("qv", "cv")} AS dot,
         |    ${dotSql("qv", "qv")} AS na,
         |    ${dotSql("cv", "cv")} AS nb
         |  FROM c JOIN q USING (bucket) WHERE neighbor_id <> query_id)
         |SELECT query_id, neighbor_id, rank, dot FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) DESC,
         |             neighbor_id ASC) AS rank
         |  FROM j)
         |WHERE rank <= 3""".stripMargin
    },

    "q37_multimodal_meta" ->
      """SELECT doc_id AS asset_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_hash,
        |  lower(hex(encode(substr(text, 1, 8)))) AS head_hex
        |FROM documents""".stripMargin,

    // The planted sizes: PNG = 8 sig + 25 IHDR chunk = 33 bytes; JPEG =
    // 2 SOI + 6 COM + 19 SOF0 + 2 EOI = 29; text = 'doc ' || id. The
    // dimension formulas mirror mediaAsset's planting exactly — the
    // Spark side must parse them back out of the bytes.
    "q78_media_headers" ->
      """SELECT doc_id AS asset_id,
        |  CASE WHEN doc_id % 3 = 2 THEN 'text' ELSE 'image' END AS kind,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 33 WHEN 1 THEN 29
        |       ELSE 4 + length(CAST(doc_id AS VARCHAR)) END AS BIGINT) AS n_bytes,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |       ELSE 'unknown' END AS format,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN doc_id % 2000 + 1
        |       WHEN 1 THEN doc_id % 500 + 17 END AS INTEGER) AS width,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN doc_id % 997 + 1
        |       WHEN 1 THEN doc_id % 700 + 9 END AS INTEGER) AS height
        |FROM documents""".stripMargin,

    // Same exact-overlap spec as q57 — the Bloom prefilter is invisible
    // to results (no false negatives; positives re-checked by the join).
    "q79_bloom_decontamination" ->
      s"""WITH train AS (SELECT doc_id, text FROM documents),
         |ev AS (SELECT doc_id + 90000 AS doc_id, substr(text, 1, 300) AS text
         |  FROM documents WHERE doc_id % 13 = 0),
         |${chunksSql("train", 8, "t_")},
         |${chunksSql("ev", 8, "e_")}
         |SELECT a.doc_id AS train_id, b.doc_id AS eval_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_shared_chunks
         |FROM t_chunks a JOIN e_chunks b ON a.chunk = b.chunk
         |GROUP BY 1, 2""".stripMargin,

    "q81_html_extract" -> {
      import TextAnalysis.{HtmlCommentRe, ScriptRe, StyleRe, TagRe, WsRunRe}
      val entityChain = TextAnalysis.HtmlEntities.foldLeft("x") {
        case (acc, (ent, ch)) =>
          val chSql = if (ch == "'") "''''" else s"'$ch'"
          s"replace($acc, '$ent', $chSql)"
      }
      s"""WITH fix AS (SELECT doc_id,
         |  '$HtmlFixPre' || CAST(doc_id AS VARCHAR) || '$HtmlFixMid1' || source ||
         |  '$HtmlFixMid2' || text || '$HtmlFixPost' AS html FROM documents),
         |s1 AS (SELECT doc_id, regexp_replace(html, '$ScriptRe', ' ', 'g') AS x FROM fix),
         |s2 AS (SELECT doc_id, regexp_replace(x, '$StyleRe', ' ', 'g') AS x FROM s1),
         |s3 AS (SELECT doc_id, regexp_replace(x, '$HtmlCommentRe', ' ', 'g') AS x FROM s2),
         |s4 AS (SELECT doc_id, regexp_replace(x, '$TagRe', ' ', 'g') AS x FROM s3),
         |s5 AS (SELECT doc_id, $entityChain AS x FROM s4),
         |ex AS (SELECT doc_id, trim(regexp_replace(x, '$WsRunRe', ' ', 'g')) AS t FROM s5)
         |SELECT doc_id, md5(t) AS text_md5, CAST(length(t) AS BIGINT) AS n_chars_x,
         |  substr(t, 1, 40) AS head
         |FROM ex""".stripMargin
    },

    "q82_chunk_novelty" ->
      s"""WITH corpus AS ($corpusSql),
         |${chunksSql("corpus", 8)},
         |freq AS (SELECT chunk, COUNT(*) AS n_docs FROM chunks GROUP BY 1)
         |SELECT c.doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_chunks,
         |  CAST(SUM(CASE WHEN f.n_docs = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique_chunks,
         |  CAST(SUM(CASE WHEN f.n_docs = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |       * 1000000 // COUNT(*) AS novelty_ppm
         |FROM chunks c JOIN freq f ON c.chunk = f.chunk
         |GROUP BY 1""".stripMargin,

    "q83_pq_encode" ->
      s"""WITH q AS (SELECT vec_id AS id, ${quantSql("embedding")} AS qv FROM embeddings),
         |${(0 until 4).map(j => pqChainSql(j, 16)).mkString(",\n")}
         |SELECT q.id AS vec_id,
         |  ${(0 until 4).map(j => s"CAST(p${j}_a2.cluster AS BIGINT) AS code_$j").mkString(",\n         |  ".stripMargin)},
         |  CAST(p0_a2.dist + p1_a2.dist + p2_a2.dist + p3_a2.dist AS BIGINT) AS recon_err
         |FROM q
         |JOIN p0_a2 ON q.id = p0_a2.id
         |JOIN p1_a2 ON q.id = p1_a2.id
         |JOIN p2_a2 ON q.id = p2_a2.id
         |JOIN p3_a2 ON q.id = p3_a2.id""".stripMargin,

    "q84_pq_adc_topk" -> {
      def adcDist(j: Int): String =
        s"""CAST(list_sum(list_transform(range(1, len(b$j.qv) + 1),
           |      i -> (qs.s$j[i] - b$j.qv[i]) * (qs.s$j[i] - b$j.qv[i]))) AS BIGINT)""".stripMargin
      s"""WITH q AS (SELECT vec_id AS id, ${quantSql("embedding")} AS qv FROM embeddings),
         |${(0 until 4).map(j => pqChainSql(j, 16)).mkString(",\n")},
         |cand AS (SELECT q.id AS neighbor_id,
         |    p0_a2.cluster AS c0, p1_a2.cluster AS c1,
         |    p2_a2.cluster AS c2, p3_a2.cluster AS c3
         |  FROM q
         |  JOIN p0_a2 ON q.id = p0_a2.id
         |  JOIN p1_a2 ON q.id = p1_a2.id
         |  JOIN p2_a2 ON q.id = p2_a2.id
         |  JOIN p3_a2 ON q.id = p3_a2.id),
         |qs AS (SELECT id AS query_id,
         |    ${(0 until 4).map(j => s"list_slice(qv, ${j * 16 + 1}, ${(j + 1) * 16}) AS s$j").mkString(",\n    ")}
         |  FROM q WHERE id % 50 = 0 AND id < 2000),
         |scored AS (SELECT qs.query_id, cand.neighbor_id,
         |    ${(0 until 4).map(j => adcDist(j)).mkString(" +\n    ")} AS adc_dist
         |  FROM cand CROSS JOIN qs
         |  JOIN p0_cent b0 ON b0.c = cand.c0
         |  JOIN p1_cent b1 ON b1.c = cand.c1
         |  JOIN p2_cent b2 ON b2.c = cand.c2
         |  JOIN p3_cent b3 ON b3.c = cand.c3
         |  WHERE cand.neighbor_id <> qs.query_id)
         |SELECT query_id, neighbor_id, adc_dist, CAST(rk AS BIGINT) AS rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY adc_dist ASC, neighbor_id ASC) AS rk
         |  FROM scored)
         |WHERE rk <= 10""".stripMargin
    },

    // q63's coarse cells routing q84's ADC loop (shared chain).
    "q99_ivfpq_topk" ->
      s"""WITH $ivfPqChainSql
         |SELECT query_id, neighbor_id, adc_dist, CAST(rk AS BIGINT) AS rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY adc_dist ASC, neighbor_id ASC) AS rk
         |  FROM scored)
         |WHERE rk <= 10""".stripMargin,

    // The persisted-index serve must be bit-identical to the in-memory
    // composition — the oracle IS q99's chain.
    "q121_ivfpq_persisted" ->
      s"""WITH $ivfPqChainSql
         |SELECT query_id, neighbor_id, adc_dist, CAST(rk AS BIGINT) AS rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY adc_dist ASC, neighbor_id ASC) AS rk
         |  FROM scored)
         |WHERE rk <= 10""".stripMargin,

    // q194 serves the same persisted index as q121 (build memoized
    // out of the timed path) against a FIXED 100-probe batch
    // (vec_id < 100) — the serve-slope clock's workload.
    "q194_ivfpq_serve" ->
      s"""WITH $ivfPqBaseSql,
         |${ivfPqScoredSql(1, queryWhere = "q.id < 100")}
         |SELECT query_id, neighbor_id, adc_dist, CAST(rk AS BIGINT) AS rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY adc_dist ASC, neighbor_id ASC) AS rk
         |  FROM scored)
         |WHERE rk <= 10""".stripMargin,

    // The deployed shape: the identical chain at the √N cell count,
    // derived in-SQL from the same corpus count the Spark side uses.
    "q196_ivfpq_serve_deployed" ->
      s"""WITH ${ivfPqBaseSqlAt("SELECT CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) FROM q")},
         |${ivfPqScoredSql(1, queryWhere = "q.id < 100")}
         |SELECT query_id, neighbor_id, adc_dist, CAST(rk AS BIGINT) AS rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY adc_dist ASC, neighbor_id ASC) AS rk
         |  FROM scored)
         |WHERE rk <= 10""".stripMargin,

    // Append-with-frozen-model must equal train-on-base/encode-all —
    // and the compaction in between must move no rows.
    "q122_ivfpq_append" ->
      s"""WITH $ivfPqAppendChainSql
         |SELECT query_id, neighbor_id, adc_dist, CAST(rk AS BIGINT) AS rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY adc_dist ASC, neighbor_id ASC) AS rk
         |  FROM scored)
         |WHERE rk <= 10""".stripMargin,

    // Erasure must equal the plain NOT IN; the leak column is 0 by
    // construction on the oracle side and by measurement on Spark's.
    "q134_erasure" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_remaining,
        |  CAST(0 AS BIGINT) AS n_listed_leaked
        |FROM events
        |WHERE user_id IS NULL OR user_id NOT IN (5, 17, 123, 400)
        |GROUP BY 1""".stripMargin,

    // Bloom skipping never changes the answer — only the file listing.
    "q137_bloom_skip" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE event_id IN (10, 777, 4242, 9000)""".stripMargin,

    // Append + manifest patch never changes the answer either.
    "q140_skip_append" ->
      """SELECT l_orderkey, l_partkey, l_linenumber FROM lineitem
        |WHERE l_orderkey BETWEEN 500 AND 1500""".stripMargin,

    // Compaction moves every row exactly once: the folded store must
    // read back as the union of everything ever written.
    "q145_compact_small" ->
      "SELECT l_orderkey, l_partkey, l_linenumber FROM lineitem",

    "q163_epoch_shuffle" ->
      s"""SELECT doc_id, h,
         |  CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT) AS pos
         |FROM (SELECT doc_id,
         |  ${h32Sql("'7' || '#' || CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents)""".stripMargin,

    "q168_orc_roundtrip" ->
      """SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey,
        |  CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS acct_cents,
        |  c_mktsegment
        |FROM customer""".stripMargin,

    // Retention delete ≡ the plain keep-predicate (NULL keys survive:
    // a NULL satisfies no range predicate).
    "q169_retention_delete" ->
      """SELECT event_id, event_type, epoch_us(ts) AS ts_us FROM events
        |WHERE ts IS NULL OR epoch_us(ts) >= 1704844800000000""".stripMargin,

    // Re-clustering moves every row exactly once; pruning on the new
    // key never changes the answer — only the file listing.
    "q170_recluster" ->
      """SELECT l_orderkey, l_partkey, l_linenumber FROM lineitem
        |WHERE l_partkey BETWEEN 0 AND 150""".stripMargin,

    // The pruned index lookup ≡ tokenize + WHERE term IN over the
    // corpus (the absent term contributes nothing on either side).
    "q171_inverted_index" ->
      s"""WITH toks AS (SELECT doc_id, unnest(${toksSql("text")}) AS term
         |  FROM documents)
         |SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
         |WHERE term IN ('join', 'vector', 'zzzabsent')
         |GROUP BY 1, 2""".stripMargin,

    // PMI ranking replayed exactly: HUGEINT product, floor division.
    "q172_collocations" ->
      s"""WITH t AS (SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
         |u AS (SELECT unnest(toks) AS w FROM t),
         |uc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c_w FROM u GROUP BY 1),
         |tot AS (SELECT CAST(SUM(len(toks)) AS HUGEINT) AS n_tok,
         |    CAST(SUM(GREATEST(len(toks) - 1, 0)) AS HUGEINT) AS m_bi FROM t),
         |b AS (SELECT unnest(list_transform(range(0, len(toks) - 1),
         |    i -> array_to_string(list_slice(toks, i + 1, i + 2), ' '))) AS gram
         |  FROM t WHERE len(toks) >= 2),
         |bc AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS c_xy FROM b GROUP BY 1
         |  HAVING COUNT(*) >= 5),
         |j AS (SELECT gram, c_xy, ux.c_w AS c_x, uy.c_w AS c_y
         |  FROM bc
         |  JOIN uc ux ON string_split(gram, ' ')[1] = ux.w
         |  JOIN uc uy ON string_split(gram, ' ')[2] = uy.w)
         |SELECT gram, c_xy, c_x, c_y,
         |  CAST((CAST(c_xy AS HUGEINT) * n_tok * n_tok * 1000000)
         |    // (m_bi * c_x * c_y) AS BIGINT) AS score_ppm
         |FROM j CROSS JOIN tot
         |ORDER BY score_ppm DESC, gram LIMIT 40""".stripMargin,

    // BM25 chain + tokenized first-match window; list_slice is
    // inclusive-end where Spark slice takes a length, so end = s+5.
    "q186_search_serve" ->
      s"""WITH ${bm25ChainSql("'scan', 'merge'")},
         |top AS (SELECT doc_id, CAST(SUM(s_m) AS BIGINT) AS score_m
         |  FROM s GROUP BY 1 ORDER BY score_m DESC, doc_id LIMIT 10),
         |fp AS (SELECT doc_id,
         |    CAST(list_filter(range(0, len(toks)),
         |      i -> toks[i + 1] IN ('scan', 'merge'))[1] AS BIGINT) AS p0,
         |    toks
         |  FROM t WHERE doc_id IN (SELECT doc_id FROM top))
         |SELECT top.doc_id, top.score_m,
         |  array_to_string(list_slice(fp.toks,
         |    GREATEST(p0 - 2, 0) + 1, GREATEST(p0 - 2, 0) + 6), ' ') AS snippet
         |FROM top JOIN fp USING (doc_id)""".stripMargin,

    // Exclusion ≡ tokenize + NOT IN over the corpus.
    "q187_index_not_query" ->
      s"""WITH tk AS (SELECT doc_id, unnest(${toksSql("text")}) AS term
         |  FROM documents),
         |inc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sum_tf FROM tk
         |  WHERE term IN ('join') GROUP BY 1),
         |exc AS (SELECT DISTINCT doc_id FROM tk WHERE term IN ('vector'))
         |SELECT doc_id, sum_tf FROM inc
         |WHERE doc_id NOT IN (SELECT doc_id FROM exc)""".stripMargin,

    // The q35 cosine chain restricted to the lexical candidate set.
    "q192_hybrid_search" ->
      s"""WITH tk AS (SELECT doc_id, unnest(${toksSql("text")}) AS term
         |  FROM documents),
         |cd AS (SELECT DISTINCT doc_id FROM tk
         |  WHERE term IN ('join', 'vector')),
         |q AS (SELECT vec_id AS query_id, ${quantSql("embedding")} AS qv
         |  FROM embeddings WHERE vec_id = 7),
         |c AS (SELECT vec_id AS neighbor_id, ${quantSql("embedding")} AS cv
         |  FROM embeddings WHERE vec_id IN (SELECT doc_id FROM cd)),
         |j AS (SELECT query_id, neighbor_id,
         |    ${dotSql("qv", "cv")} AS dot,
         |    ${dotSql("qv", "qv")} AS na,
         |    ${dotSql("cv", "cv")} AS nb
         |  FROM c, q WHERE neighbor_id <> query_id)
         |SELECT query_id, neighbor_id, rank, dot FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) DESC,
         |             neighbor_id ASC) AS rank
         |  FROM j)
         |WHERE rank <= 10""".stripMargin,

    // Partition pruning never changes the answer — only the listing.
    "q188_hive_partitions" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE event_type = 'purchase'""".stripMargin,

    // The rolled-forward replica ≡ the upstream merged model.
    "q189_replicate_feed" ->
      """WITH base AS (SELECT o_orderkey, o_custkey FROM orders
        |  WHERE o_orderkey % 3 IN (0, 1)),
        |upd AS (SELECT o_orderkey, o_custkey + 1000000 AS o_custkey
        |  FROM orders WHERE o_orderkey % 30 = 0 AND o_orderkey < 150000)
        |SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS o_custkey FROM base
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |UNION ALL
        |SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS o_custkey FROM upd""".stripMargin,

    // The manifest fold must equal the scan's COUNT/MIN/MAX exactly.
    "q190_metadata_count" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  MIN(l_orderkey) AS min_k, MAX(l_orderkey) AS max_k
        |FROM lineitem""".stripMargin,

    // The export is exactly the first two committed batches.
    "q184_snapshot_export" ->
      """SELECT l_orderkey, l_partkey, l_linenumber FROM lineitem
        |WHERE l_orderkey % 3 <> 2""".stripMargin,

    // TV vs the profile replayed in HUGEINT: batch-present terms via
    // the left join (profile-absent ⇒ c_t 0), profile-only tail in
    // closed form from the totals.
    "q185_drift_admission" ->
      s"""WITH t AS (SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
         |prof AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c_t
         |  FROM (SELECT unnest(toks) AS term FROM t) GROUP BY 1),
         |np AS (SELECT CAST(SUM(c_t) AS HUGEINT) AS np FROM prof),
         |bt AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS obs
         |  FROM (SELECT unnest(toks) AS term FROM t WHERE doc_id % 2 = 0)
         |  GROUP BY 1),
         |nb AS (SELECT CAST(SUM(obs) AS HUGEINT) AS nb FROM bt),
         |j AS (SELECT bt.obs, COALESCE(prof.c_t, 0) AS c_t
         |  FROM bt LEFT JOIN prof USING (term))
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_batch_terms,
         |  CAST(SUM(obs) AS BIGINT) AS n_batch_tokens,
         |  CAST((SUM(abs(CAST(obs AS HUGEINT) * np - CAST(c_t AS HUGEINT) * nb))
         |      + (np - CAST(SUM(c_t) AS HUGEINT)) * nb) * 1000000
         |    // (2 * nb * np) AS BIGINT) AS tv_ppm
         |FROM j CROSS JOIN nb CROSS JOIN np
         |GROUP BY nb, np""".stripMargin,

    // Phrase containment ≡ tokenized adjacency over the raw corpus.
    "q181_phrase_query" ->
      s"""WITH t AS (SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
         |m AS (SELECT doc_id, CAST(len(list_filter(range(0, len(toks) - 1),
         |    i -> toks[i + 1] = 'table' AND toks[i + 2] = 'hash')) AS BIGINT)
         |    AS n_matches
         |  FROM t)
         |SELECT doc_id, n_matches FROM m WHERE n_matches > 0""".stripMargin,

    // The incrementally built index must serve the whole-corpus BM25
    // spec (same replay as q178, different query terms).
    "q182_index_append" ->
      s"""WITH ${bm25ChainSql("'merge', 'group'")}
         |SELECT doc_id, CAST(SUM(s_m) AS BIGINT) AS score_m,
         |  CAST(COUNT(*) AS BIGINT) AS n_terms
         |FROM s GROUP BY 1
         |ORDER BY score_m DESC, doc_id LIMIT 10""".stripMargin,

    // Posting-list intersection ≡ tokenize + HAVING all terms present.
    "q177_index_and_query" ->
      s"""WITH toks AS (SELECT doc_id, unnest(${toksSql("text")}) AS term
         |  FROM documents),
         |q AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
         |  WHERE term IN ('join', 'filter', 'scan') GROUP BY 1, 2)
         |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS sum_tf FROM q
         |GROUP BY 1 HAVING COUNT(DISTINCT term) = 3""".stripMargin,

    // The BM25-shaped score replayed with identical floor divisions in
    // identical order (k1_m=1200, b_m=750, reciprocal idf).
    "q178_bm25_topk" ->
      s"""WITH ${bm25ChainSql("'join', 'vector', 'table'")}
         |SELECT doc_id, CAST(SUM(s_m) AS BIGINT) AS score_m,
         |  CAST(COUNT(*) AS BIGINT) AS n_terms
         |FROM s GROUP BY 1
         |ORDER BY score_m DESC, doc_id LIMIT 10""".stripMargin,

    // Bigram conditional probabilities replayed with identical floor
    // division; head-word counts are bigram occurrences, so they match
    // the Spark side exactly; <2-token docs score 0 via the left join.
    "q173_bigram_lm" ->
      s"""WITH t AS (SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
         |g AS (SELECT doc_id, unnest(list_transform(range(0, len(toks) - 1),
         |    i -> array_to_string(list_slice(toks, i + 1, i + 2), ' '))) AS gram
         |  FROM t WHERE len(toks) >= 2),
         |bc AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS c_xy FROM g GROUP BY 1),
         |uc AS (SELECT string_split(gram, ' ')[1] AS x,
         |    CAST(COUNT(*) AS BIGINT) AS c_x FROM g GROUP BY 1),
         |sc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |    CAST(SUM((bc.c_xy * 1000000) // uc.c_x) // COUNT(*) AS BIGINT) AS lm_ppm
         |  FROM g JOIN bc USING (gram)
         |  JOIN uc ON string_split(g.gram, ' ')[1] = uc.x
         |  GROUP BY doc_id)
         |SELECT t.doc_id, COALESCE(sc.n_bigrams, CAST(0 AS BIGINT)) AS n_bigrams,
         |  COALESCE(sc.lm_ppm, CAST(0 AS BIGINT)) AS lm_ppm
         |FROM t LEFT JOIN sc ON t.doc_id = sc.doc_id""".stripMargin,

    // The hashing trick: h32(term) is non-negative, so % and pmod agree.
    "q174_hashing_tf" ->
      s"""WITH toks AS (SELECT doc_id, unnest(${toksSql("text")}) AS term
         |  FROM documents)
         |SELECT doc_id, ${h32Sql("term")} % 64 AS bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n
         |FROM toks GROUP BY 1, 2""".stripMargin,

    // The incrementally maintained view must equal the full join.
    "q175_view_maintenance" ->
      """SELECT o_orderkey, o_custkey AS custkey,
        |  CAST(c_nationkey AS BIGINT) AS c_nationkey
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin,

    // Total variation replayed in HUGEINT with the closed-form
    // absent-term tail; floor division matches decimal div.
    "q176_source_drift" ->
      s"""WITH t AS (SELECT source, ${toksSql("text")} AS toks FROM documents),
         |terms AS (SELECT source, unnest(toks) AS term FROM t),
         |st AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS obs
         |  FROM terms GROUP BY 1, 2),
         |ct AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c_t FROM terms GROUP BY 1),
         |tot AS (SELECT CAST(SUM(c_t) AS HUGEINT) AS n_total FROM ct),
         |ps AS (SELECT source, CAST(SUM(obs) AS BIGINT) AS n_s FROM st GROUP BY 1)
         |SELECT st.source, CAST(COUNT(*) AS BIGINT) AS n_terms,
         |  MAX(ps.n_s) AS n_s,
         |  CAST((SUM(abs(CAST(obs AS HUGEINT) * n_total - CAST(c_t AS HUGEINT) * ps.n_s))
         |      + (n_total - CAST(SUM(c_t) AS HUGEINT)) * CAST(MAX(ps.n_s) AS HUGEINT))
         |      * 1000000
         |    // (2 * CAST(MAX(ps.n_s) AS HUGEINT) * n_total) AS BIGINT) AS tv_ppm
         |FROM st JOIN ct USING (term) JOIN ps USING (source) CROSS JOIN tot
         |GROUP BY st.source, n_total""".stripMargin,

    // The v1→v3 feed is exactly the later batches (mod 1 and 2).
    "q166_change_feed" ->
      """SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS o_custkey,
        |  'insert' AS __change
        |FROM orders WHERE o_orderkey % 3 <> 0""".stripMargin,

    // Merged model: base (no mod-3 keys) minus updated keys, plus the
    // whole update batch (replacements + the newly inserted mod-30s).
    "q165_store_upsert" ->
      """WITH base AS (SELECT o_orderkey, o_custkey FROM orders
        |  WHERE o_orderkey % 3 <> 0),
        |upd AS (SELECT o_orderkey, o_custkey + 1000000 AS o_custkey
        |  FROM orders WHERE o_orderkey % 10 = 0 AND o_orderkey < 150000)
        |SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS o_custkey FROM base
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |UNION ALL
        |SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS o_custkey FROM upd""".stripMargin,

    // Snapshot v contains the batches committed up to v:
    // v1 = mod 0, v2 = mod 0∪1, v3 = everything.
    "q164_time_travel" ->
      """WITH t AS (SELECT l_orderkey, l_partkey, l_orderkey % 3 AS m
        |  FROM lineitem)
        |SELECT CAST(v AS BIGINT) AS version,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_key,
        |  CAST(SUM(l_partkey) AS BIGINT) AS sum_part
        |FROM t, UNNEST([1, 2, 3]) AS u(v)
        |WHERE m < v GROUP BY 1""".stripMargin,

    // The JSONL round-trip is lossless: read-back ≡ source projection.
    "q159_jsonl_export" ->
      """SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |FROM documents""".stripMargin,

    // Time skipping never changes the answer — only the file listing.
    "q146_skip_time" ->
      """SELECT event_id, event_type, epoch_us(ts) AS ts_us FROM events
        |WHERE epoch_us(ts) BETWEEN 1704844800000000 AND 1705017599999999""".stripMargin,

    // url ↔ doc_id is a bijection, so url-list erasure ≡ id NOT IN.
    "q138_erasure_string" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_remaining,
        |  CAST(0 AS BIGINT) AS n_listed_leaked
        |FROM documents
        |WHERE doc_id IS NULL OR doc_id NOT IN (3, 77, 123, 250)
        |GROUP BY 1""".stripMargin,

    // Skipping never changes the answer — only the file listing. The
    // oracle is the plain range predicate on the original table.
    "q125_skipping_read" ->
      """SELECT l_orderkey, l_partkey, l_linenumber FROM lineitem
        |WHERE l_orderkey BETWEEN 100 AND 2000
        |  AND l_partkey BETWEEN 0 AND 120""".stripMargin,

    // The q99 chain as the approx side of the q89-shaped recall compare:
    // exact cosine top-10 ground truth LEFT JOIN the IVF-PQ top-10.
    "q100_ivfpq_recall" ->
      s"""WITH $ivfPqChainSql,
         |ap AS (SELECT query_id, neighbor_id, 1 AS hit FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY adc_dist ASC, neighbor_id ASC) AS rk
         |  FROM scored) WHERE rk <= 10),
         |cq AS (SELECT id AS query_id, qv FROM q WHERE id % 50 = 0 AND id < 2000),
         |exj AS (SELECT cq.query_id, c.id AS neighbor_id,
         |    ${dotSql("cq.qv", "c.qv")} AS dot,
         |    ${dotSql("cq.qv", "cq.qv")} AS na,
         |    ${dotSql("c.qv", "c.qv")} AS nb
         |  FROM q c, cq WHERE c.id <> cq.query_id),
         |ex AS (SELECT query_id, neighbor_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) DESC,
         |             neighbor_id ASC) AS rank
         |  FROM exj) WHERE rank <= 10)
         |SELECT ex.query_id, CAST(COUNT(*) AS BIGINT) AS n_truth,
         |  CAST(SUM(COALESCE(ap.hit, 0)) AS BIGINT) AS n_hits,
         |  CAST(SUM(COALESCE(ap.hit, 0)) AS BIGINT) * 1000000
         |    // CAST(COUNT(*) AS BIGINT) AS recall_ppm
         |FROM ex LEFT JOIN ap USING (query_id, neighbor_id)
         |GROUP BY 1""".stripMargin,

    // The shared IVF-PQ chain with rank-over-d2 routing widened to the
    // query's 2 nearest cells.
    "q101_ivfpq_nprobe2" ->
      s"""WITH $ivfPqBaseSql,
         |${ivfPqScoredSql(2, "2")}
         |SELECT query_id, neighbor_id, adc_dist, CAST(rk AS BIGINT) AS rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY adc_dist ASC, neighbor_id ASC) AS rk
         |  FROM scored2)
         |WHERE rk <= 10""".stripMargin,

    // Both probe widths against the q100-shaped brute-force truth,
    // micro-averaged per width.
    "q102_ivfpq_recall_curve" -> {
      def point(np: Int): String =
        s"""SELECT CAST($np AS BIGINT) AS nprobe,
           |  CAST(COUNT(DISTINCT ex.query_id) AS BIGINT) AS n_queries,
           |  CAST(COUNT(*) AS BIGINT) AS total_truth,
           |  CAST(SUM(COALESCE(ap$np.hit, 0)) AS BIGINT) AS total_hits,
           |  CAST(SUM(COALESCE(ap$np.hit, 0)) AS BIGINT) * 1000000
           |    // CAST(COUNT(*) AS BIGINT) AS recall_ppm
           |FROM ex LEFT JOIN ap$np USING (query_id, neighbor_id)""".stripMargin
      def ap(np: Int): String =
        s"""ap$np AS (SELECT query_id, neighbor_id, 1 AS hit FROM (
           |  SELECT *, row_number() OVER (PARTITION BY query_id
           |    ORDER BY adc_dist ASC, neighbor_id ASC) AS rk
           |  FROM scored$np) WHERE rk <= 10)""".stripMargin
      s"""WITH $ivfPqBaseSql,
         |${ivfPqScoredSql(1, "1")},
         |${ivfPqScoredSql(2, "2")},
         |cq AS (SELECT id AS query_id, qv FROM q WHERE id % 50 = 0 AND id < 2000),
         |exj AS (SELECT cq.query_id, c.id AS neighbor_id,
         |    ${dotSql("cq.qv", "c.qv")} AS dot,
         |    ${dotSql("cq.qv", "cq.qv")} AS na,
         |    ${dotSql("c.qv", "c.qv")} AS nb
         |  FROM q c, cq WHERE c.id <> cq.query_id),
         |ex AS (SELECT query_id, neighbor_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) DESC,
         |             neighbor_id ASC) AS rank
         |  FROM exj) WHERE rank <= 10),
         |${ap(1)},
         |${ap(2)}
         |${point(1)}
         |UNION ALL
         |${point(2)}""".stripMargin
    },

    // The residual chain with argmin (nprobe=1) routing.
    "q103_ivfpq_residual" ->
      s"""WITH $ivfPqResidualBaseSql,
         |${ivfPqResidualScoredSql(1)}
         |SELECT query_id, neighbor_id, adc_dist, CAST(rk AS BIGINT) AS rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY adc_dist ASC, neighbor_id ASC) AS rk
         |  FROM scored)
         |WHERE rk <= 10""".stripMargin,

    // q102's curve with the residual scored CTEs swapped in.
    "q104_ivfpq_residual_recall" -> {
      def point(np: Int): String =
        s"""SELECT CAST($np AS BIGINT) AS nprobe,
           |  CAST(COUNT(DISTINCT ex.query_id) AS BIGINT) AS n_queries,
           |  CAST(COUNT(*) AS BIGINT) AS total_truth,
           |  CAST(SUM(COALESCE(ap$np.hit, 0)) AS BIGINT) AS total_hits,
           |  CAST(SUM(COALESCE(ap$np.hit, 0)) AS BIGINT) * 1000000
           |    // CAST(COUNT(*) AS BIGINT) AS recall_ppm
           |FROM ex LEFT JOIN ap$np USING (query_id, neighbor_id)""".stripMargin
      def ap(np: Int): String =
        s"""ap$np AS (SELECT query_id, neighbor_id, 1 AS hit FROM (
           |  SELECT *, row_number() OVER (PARTITION BY query_id
           |    ORDER BY adc_dist ASC, neighbor_id ASC) AS rk
           |  FROM scored$np) WHERE rk <= 10)""".stripMargin
      s"""WITH $ivfPqResidualBaseSql,
         |${ivfPqResidualScoredSql(1, "1")},
         |${ivfPqResidualScoredSql(2, "2")},
         |cq AS (SELECT id AS query_id, qv FROM q WHERE id % 50 = 0 AND id < 2000),
         |exj AS (SELECT cq.query_id, c.id AS neighbor_id,
         |    ${dotSql("cq.qv", "c.qv")} AS dot,
         |    ${dotSql("cq.qv", "cq.qv")} AS na,
         |    ${dotSql("c.qv", "c.qv")} AS nb
         |  FROM q c, cq WHERE c.id <> cq.query_id),
         |ex AS (SELECT query_id, neighbor_id FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) DESC,
         |             neighbor_id ASC) AS rank
         |  FROM exj) WHERE rank <= 10),
         |${ap(1)},
         |${ap(2)}
         |${point(1)}
         |UNION ALL
         |${point(2)}""".stripMargin
    },

    // size 32, overlap 8 -> stride 24; DuckDB list_slice clamps
    // out-of-range bounds exactly like Spark's slice(length) cap, and
    // `//` floor-division equals truncation on these positive counts.
    "q87_token_chunks" ->
      s"""WITH t AS (SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
         |nz AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
         |ch AS (SELECT doc_id, i AS chunk_idx,
         |    list_slice(toks, i * 24 + 1, i * 24 + 32) AS sl
         |  FROM nz, UNNEST(range(0, GREATEST((n - 8 + 23) // 24, 1))) AS u(i))
         |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         |  CAST(len(sl) AS BIGINT) AS n_tokens,
         |  md5(array_to_string(sl, ' ')) AS chunk_md5
         |FROM ch""".stripMargin,

    "q89_ann_recall" -> {
      val cosRank =
        """row_number() OVER (PARTITION BY query_id
          |    ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) DESC,
          |             neighbor_id ASC) AS rank""".stripMargin
      s"""WITH q AS (SELECT vec_id AS query_id, label, ${quantSql("embedding")} AS qv
         |  FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 2000),
         |c AS (SELECT vec_id AS neighbor_id, label, ${quantSql("embedding")} AS cv FROM embeddings),
         |exj AS (SELECT query_id, neighbor_id,
         |    ${dotSql("qv", "cv")} AS dot,
         |    ${dotSql("qv", "qv")} AS na,
         |    ${dotSql("cv", "cv")} AS nb
         |  FROM c, q WHERE neighbor_id <> query_id),
         |ex AS (SELECT query_id, neighbor_id FROM (
         |  SELECT *, $cosRank FROM exj) WHERE rank <= 3),
         |apj AS (SELECT query_id, neighbor_id,
         |    ${dotSql("qv", "cv")} AS dot,
         |    ${dotSql("qv", "qv")} AS na,
         |    ${dotSql("cv", "cv")} AS nb
         |  FROM c JOIN q USING (label) WHERE neighbor_id <> query_id),
         |ap AS (SELECT query_id, neighbor_id, 1 AS hit FROM (
         |  SELECT *, $cosRank FROM apj) WHERE rank <= 3)
         |SELECT ex.query_id, CAST(COUNT(*) AS BIGINT) AS n_truth,
         |  CAST(SUM(COALESCE(ap.hit, 0)) AS BIGINT) AS n_hits,
         |  CAST(SUM(COALESCE(ap.hit, 0)) AS BIGINT) * 1000000
         |    // CAST(COUNT(*) AS BIGINT) AS recall_ppm
         |FROM ex LEFT JOIN ap USING (query_id, neighbor_id)
         |GROUP BY 1""".stripMargin
    },

    "q90_snapshot_diff" ->
      """WITH o AS (SELECT doc_id AS id, md5(text) AS old_hash
        |  FROM documents WHERE doc_id % 10 <> 3),
        |n AS (SELECT doc_id AS id,
        |    md5(CASE WHEN doc_id % 5 = 0 THEN text || ' rev2' ELSE text END) AS new_hash
        |  FROM documents WHERE doc_id % 10 <> 7)
        |SELECT COALESCE(o.id, n.id) AS doc_id, old_hash, new_hash,
        |  CASE WHEN old_hash IS NULL THEN 'added'
        |       WHEN new_hash IS NULL THEN 'removed'
        |       WHEN old_hash = new_hash THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM o FULL JOIN n ON o.id = n.id""".stripMargin,

    "q91_minhash_estimate" -> {
      val agree = (0 until 12)
        .map(j => s"CASE WHEN sa.mh_$j = sb.mh_$j THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH corpus AS ($corpusSql),
         |${lshBandsSql("corpus")},
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
         |j AS (SELECT id_a, id_b,
         |    CAST($agree AS BIGINT) AS sig_agree,
         |    CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS inter,
         |    CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS uni
         |  FROM cand JOIN sg sa ON cand.id_a = sa.doc_id
         |  JOIN sg sb ON cand.id_b = sb.doc_id)
         |SELECT id_a, id_b, sig_agree, inter, uni,
         |  sig_agree * 1000000 // 12 AS est_ppm,
         |  CASE WHEN uni > 0 THEN inter * 1000000 // uni END AS jac_ppm
         |FROM j""".stripMargin
    },

    // Threshold = exact median of the score distribution (histogram
    // walk, same integer formula as q64); ties at the threshold kept.
    "q92_quality_threshold" ->
      s"""WITH ${qualityScoreChainSql()},
         |hist AS (SELECT score AS v, CAST(COUNT(*) AS BIGINT) AS cnt FROM sc GROUP BY 1),
         |h AS (SELECT v, cnt, SUM(cnt) OVER (ORDER BY v) AS cum,
         |    SUM(cnt) OVER () AS tot FROM hist),
         |thr AS (SELECT MIN(CASE WHEN cum >= (tot * 50 + 99) // 100 THEN v END) AS t FROM h)
         |SELECT doc_id, score FROM sc, thr WHERE score >= thr.t""".stripMargin,

    "q93_source_datacard" -> {
      import TextAnalysis.{EmailRe, Ipv4Re, LongDigitsRe}
      val en = s"len(list_intersect(toks, ${sqlList(TextAnalysis.EnStop)}))"
      val fr = s"len(list_intersect(toks, ${sqlList(TextAnalysis.FrStop)}))"
      val de = s"len(list_intersect(toks, ${sqlList(TextAnalysis.DeStop)}))"
      // the quality chain (t/s/f/sc -> (doc_id, score)) reads the planted
      // corpus; its `t` doubles as the shared tokenized relation
      s"""WITH c AS (SELECT doc_id, text, source FROM documents
         |  UNION ALL
         |  SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents), text, source
         |  FROM documents WHERE doc_id % 10 = 0),
         |${qualityScoreChainSql("c")},
         |b AS (SELECT c.source, t.doc_id, md5(t.text) AS h,
         |    CAST(len(toks) AS BIGINT) AS n_toks,
         |    CASE WHEN $en >= $fr AND $en >= $de THEN 'en'
         |         WHEN $fr >= $de THEN 'fr' ELSE 'de' END AS lang
         |  FROM t JOIN c ON t.doc_id = c.doc_id),
         |rd1 AS (SELECT doc_id, text,
         |    regexp_replace(text, '$EmailRe', '<email>', 'g') AS e FROM c),
         |rd AS (SELECT doc_id,
         |    CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_emails,
         |    CAST(len(regexp_extract_all(e, '$Ipv4Re')) AS BIGINT) AS n_ips,
         |    CAST(len(regexp_extract_all(
         |      regexp_replace(e, '$Ipv4Re', '<ip>', 'g'), '$LongDigitsRe')) AS BIGINT) AS n_longnums
         |  FROM rd1),
         |fq AS (SELECT h, COUNT(*) AS n_copies FROM b GROUP BY 1),
         |ag AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
         |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
         |    CAST(SUM(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs
         |  FROM b JOIN fq USING (h) GROUP BY 1),
         |rda AS (SELECT b.source,
         |    CAST(SUM(rd.n_emails) AS BIGINT) AS n_email_matches,
         |    CAST(SUM(rd.n_ips) AS BIGINT) AS n_ip_matches,
         |    CAST(SUM(rd.n_longnums) AS BIGINT) AS n_num_matches
         |  FROM rd JOIN b USING (doc_id) GROUP BY 1),
         |hist AS (SELECT source, n_toks AS v, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM b GROUP BY 1, 2),
         |h AS (SELECT source, v, cnt,
         |    SUM(cnt) OVER (PARTITION BY source ORDER BY v) AS cum,
         |    SUM(cnt) OVER (PARTITION BY source) AS tot FROM hist),
         |pc AS (SELECT source,
         |    MIN(CASE WHEN cum >= (tot * 50 + 99) // 100 THEN v END) AS p50_toks,
         |    MIN(CASE WHEN cum >= (tot * 90 + 99) // 100 THEN v END) AS p90_toks
         |  FROM h GROUP BY 1),
         |qhist AS (SELECT b.source, sc.score AS v, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM sc JOIN b USING (doc_id) GROUP BY 1, 2),
         |qh AS (SELECT source, v, cnt,
         |    SUM(cnt) OVER (PARTITION BY source ORDER BY v) AS cum,
         |    SUM(cnt) OVER (PARTITION BY source) AS tot FROM qhist),
         |qpc AS (SELECT source,
         |    MIN(CASE WHEN cum >= (tot * 50 + 99) // 100 THEN v END) AS p50_quality,
         |    MIN(CASE WHEN cum >= (tot * 90 + 99) // 100 THEN v END) AS p90_quality
         |  FROM qh GROUP BY 1),
         |wb AS (SELECT source,
         |    MIN(CASE WHEN cum >= (tot * 5 + 99) // 100 THEN v END) AS wlo,
         |    MIN(CASE WHEN cum >= (tot * 95 + 99) // 100 THEN v END) AS whi
         |  FROM qh GROUP BY 1),
         |qwhist AS (SELECT q.source, LEAST(GREATEST(q.v, wb.wlo), wb.whi) AS v,
         |    SUM(cnt) AS cnt
         |  FROM qhist q JOIN wb USING (source) GROUP BY 1, 2),
         |qwh AS (SELECT source, v, cnt,
         |    SUM(cnt) OVER (PARTITION BY source ORDER BY v) AS cum,
         |    SUM(cnt) OVER (PARTITION BY source) AS tot FROM qwhist),
         |qpcw AS (SELECT source,
         |    MIN(CASE WHEN cum >= (tot * 50 + 99) // 100 THEN v END) AS p50_quality_w,
         |    MIN(CASE WHEN cum >= (tot * 90 + 99) // 100 THEN v END) AS p90_quality_w
         |  FROM qwh GROUP BY 1)
         |SELECT ag.source, n_docs, n_tokens, n_en, n_dup_docs, p50_toks, p90_toks,
         |  n_tokens // n_docs AS mean_toks,
         |  n_dup_docs * 1000000 // n_docs AS dup_ppm,
         |  p50_quality, p90_quality,
         |  n_email_matches, n_ip_matches, n_num_matches,
         |  p50_quality_w, p90_quality_w
         |FROM ag JOIN pc USING (source) JOIN qpc USING (source)
         |     JOIN qpcw USING (source) JOIN rda USING (source)""".stripMargin
    },

    "q94_source_percentrank" ->
      s"""WITH t AS (SELECT source, doc_id,
         |    CAST(len(${toksSql("text")}) AS BIGINT) AS n_toks FROM documents),
         |r AS (SELECT source, doc_id, n_toks,
         |    CAST(row_number() OVER w AS BIGINT) AS rnk,
         |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_src,
         |    CAST(ntile(4) OVER w AS BIGINT) AS quartile
         |  FROM t WINDOW w AS (PARTITION BY source ORDER BY n_toks ASC, doc_id ASC))
         |SELECT source, doc_id, n_toks, rnk,
         |  CASE WHEN n_src > 1 THEN ((rnk - 1) * 1000000) // (n_src - 1) ELSE 0 END AS pr_ppm,
         |  quartile
         |FROM r""".stripMargin,

    "q95_epoch_upsample" ->
      s"""WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_group
         |  FROM documents GROUP BY 1),
         |r AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source
         |    ORDER BY ${h32Sql("CAST(doc_id AS VARCHAR)")}, doc_id) AS rk
         |  FROM documents),
         |n AS (SELECT r.doc_id, r.source, c.n_group,
         |    (100 // c.n_group) + CASE WHEN r.rk <= 100 % c.n_group THEN 1 ELSE 0 END AS n_copies
         |  FROM r JOIN c USING (source))
         |SELECT doc_id, source, n_group, CAST(n_copies AS BIGINT) AS n_copies,
         |  CAST(epoch AS BIGINT) AS epoch
         |FROM n, UNNEST(range(0, n_copies)) AS u(epoch)
         |WHERE n_copies > 0""".stripMargin
  )
}
