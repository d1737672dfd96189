package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]] — the correctness baseline: candidates ×
  *    broadcast(queries). Linear in |corpus|·|queries|; right when the
  *    query set is small (it is broadcast, never shuffled).
  *  - [[bucketedTopK]] — the scale path: an IVF-style bucket column
  *    (cluster/partition assignment) restricts each query to its bucket,
  *    so the join shuffles on the bucket key and never goes all-pairs.
  *
  * Determinism: vectors are quantized to integer milli-units first, so
  * dot products are exact integers in any engine; the cosine used for
  * ranking is a single identical chain of IEEE ops (double divide +
  * sqrt), bit-equal across engines. Ties break on neighbor id.
  */
object Similarity {

  /** float vector → integer milli-unit vector (round-half-up). The
    * float→double cast is exact, so quantization is engine-independent.
    */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * 1000 + 0.5).cast("long"))

  /** Exact integer dot product of two equal-length long vectors (native
    * one-pass expression; see [[graft.functions.ArrayDotProduct]]).
    */
  def dot(a: Column, b: Column): Column = graft.functions.ArrayDotProduct(a, b)

  /** Built-in-composed dot product (the spec [[dot]] must equal; kept for
    * the equivalence property test).
    */
  def dotComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Native squared-L2 distance (codegen one-pass; see
    * [[graft.functions.ArrayL2Sq]]) — the per-centroid assignment and
    * ADC-scoring inner loop.
    */
  def l2Sq(a: Column, b: Column): Column = graft.functions.ArrayL2Sq(a, b)

  /** Built-in-composed squared L2 (the spec [[l2Sq]] must equal on
    * NON-NULL equal-length inputs — the embedding contract, and all
    * ArrayL2Sq's own scaladoc promises; kept for the equivalence
    * property test). The two intentionally diverge on null ELEMENTS:
    * the native contributes 0 for a null element, this composition
    * poisons the whole sum to null (SQL arithmetic) — the divergence
    * is itself law-pinned in NativeExpressionsSpec.
    */
  def l2SqComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), _ + _)

  /** Norms are computed per VECTOR before the join (the join output only
    * evaluates the cross dot product per pair) — at n candidates × m
    * queries this is n+m norm computations instead of n·m.
    */
  private def ranked(joined: DataFrame, k: Int): DataFrame = {
    val scored = joined.select(col("query_id"), col("neighbor_id"),
      dot(col("qv"), col("cv")).as("dot"), col("na"), col("nb"))
    val cos = col("dot").cast("double") /
      (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")))
    val w = Window.partitionBy(col("query_id")).orderBy(cos.desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("dot"))
  }

  private def querySide(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, extra: Seq[(String, String)] = Seq.empty): DataFrame = {
    val base = Dedup.once(emb.filter(queryPred), "qv", quantize(col(vecCol)))
    base.select(Seq(col(idCol).as("query_id"), col("qv"), dot(col("qv"), col("qv")).as("na")) ++
      extra.map { case (c, a) => col(c).as(a) }: _*)
  }

  private def candSide(emb: DataFrame, idCol: String, vecCol: String,
      extra: Seq[(String, String)] = Seq.empty): DataFrame = {
    val base = Dedup.once(emb, "cv", quantize(col(vecCol)))
    base.select(Seq(col(idCol).as("neighbor_id"), col("cv"), dot(col("cv"), col("cv")).as("nb")) ++
      extra.map { case (c, a) => col(c).as(a) }: _*)
  }

  /** Cosine RERANK of a pre-filtered candidate id set — the second
    * stage of hybrid (lexical → semantic) retrieval: an inverted-index
    * term lookup (or any other cheap filter) produces `candidateIds`
    * (a one-column `doc_id` frame), and only THOSE vectors score
    * against the broadcast queries. The vector work is candidate-sized,
    * never corpus-sized — the whole point of the hybrid shape: the
    * index prunes, the embedding ranks. Semantics are exactly
    * [[bruteForceTopK]] restricted to the candidates (self-matches
    * excluded, same quantized-cosine total order).
    */
  def rerankTopK(emb: DataFrame, idCol: String, vecCol: String,
      candidateIds: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val q = querySide(emb, idCol, vecCol, queryPred)
    // prune BEFORE the quantize/norm projection: the semi-join cannot
    // push below candSide's Generate barrier on its own, and quantizing
    // a 100M-vector corpus to keep 1k candidates would defeat the shape
    val pruned = emb.join(
      candidateIds.toDF("__cand_id").distinct(),
      col(idCol) === col("__cand_id"), "left_semi")
    val c = candSide(pruned, idCol, vecCol)
    ranked(c.crossJoin(broadcast(q)).filter(col("neighbor_id") =!= col("query_id")), k)
  }

  /** Brute-force cosine top-k: every candidate scored against every
    * (broadcast) query. Self-matches excluded.
    */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int): DataFrame = {
    val q = querySide(emb, idCol, vecCol, queryPred)
    val c = candSide(emb, idCol, vecCol)
    ranked(c.crossJoin(broadcast(q)).filter(col("neighbor_id") =!= col("query_id")), k)
  }

  /** Bucketed (IVF-style) top-k: candidates meet queries only inside
    * their bucket — the join key is the bucket column, so the shuffle is
    * by bucket and the per-query work is the bucket size, not the corpus.
    * Pre-flight [[bucketCostProfile]] to size that per-query work before
    * a large run.
    */
  def bucketedTopK(emb: DataFrame, idCol: String, vecCol: String, bucketCol: String,
      queryPred: Column, k: Int): DataFrame = {
    val q = querySide(emb, idCol, vecCol, queryPred, Seq(bucketCol -> "bucket"))
    val c = candSide(emb, idCol, vecCol, Seq(bucketCol -> "bucket"))
    ranked(c.join(broadcast(q), Seq("bucket")).filter(col("neighbor_id") =!= col("query_id")), k)
  }

  /** Hard-negative mining — per query, the top-k most similar vectors
    * with a DIFFERENT label (contrastive/embedding-training data prep:
    * the negatives that actually move the loss are the near-miss ones).
    * Bucket-restricted exactly like [[bucketedTopK]]: pass a geometric
    * bucket (k-means cell / LSH plane), and cross-label near neighbors
    * are found because cells come from geometry, not labels — the same
    * IVF machinery answers both the recall query and the mining query.
    *
    * Scale shape: identical to [[bucketedTopK]] (broadcast query side,
    * bucket-keyed join, per-query top-k window); the label filter is a
    * per-pair codegen predicate on broadcast-carried columns, adding
    * zero shuffle.
    */
  def hardNegativesTopK(emb: DataFrame, idCol: String, vecCol: String,
      bucketCol: String, labelCol: String, queryPred: Column, k: Int): DataFrame = {
    val q = querySide(emb, idCol, vecCol, queryPred,
      Seq(bucketCol -> "bucket", labelCol -> "__ql"))
    val c = candSide(emb, idCol, vecCol,
      Seq(bucketCol -> "bucket", labelCol -> "__cl"))
    ranked(c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id") && col("__cl") =!= col("__ql")), k)
  }

  /** Generic bucket-size pre-flight for ANY bucket-restricted pair/probe
    * join ([[cosineNearDupPairs]], [[bucketedTopK]]): per-bucket row
    * counts, cheap (one partial-aggregated shuffle on the bucket key —
    * the same key the guarded join would shuffle on). The embedding
    * analog of [[Dedup.bandBucketStats]] (q44): in-bucket pair work is
    * quadratic, so the max bucket — not the corpus size — predicts cost.
    */
  def bucketStats(df: DataFrame, bucketCol: String): DataFrame =
    df.groupBy(col(bucketCol).as("bucket"))
      .agg(count(lit(1)).as("bucket_size"))

  /** One-row cost profile over [[bucketStats]]: bucket count, max bucket,
    * total rows, and the exact in-bucket pair count `Σ sz·(sz−1)/2` — the
    * number a 100 TB job compares against its budget BEFORE committing to
    * [[cosineNearDupPairs]] (a max_bucket in the millions means the
    * bucketing column is too coarse: re-bucket, e.g. finer IVF cells or
    * more LSH planes, or exact-dedup first). Integer `div` keeps the
    * count exact past 2^53 in any engine.
    */
  def bucketCostProfile(df: DataFrame, bucketCol: String): DataFrame =
    bucketStats(df, bucketCol).agg(
      count(lit(1)).as("n_buckets"),
      max(col("bucket_size")).as("max_bucket"),
      sum(col("bucket_size")).as("n_rows"),
      sum(expr("bucket_size * (bucket_size - 1) div 2")).as("pair_cost"))

  /** Recall@k of an approximate ANN result against exact ground truth —
    * the "measure, don't guess" gate for every bucketed/IVF/LSH search:
    * bucketing buys its speed by skipping candidates, and this is the
    * number that says what that skipping cost. Run it on a sampled query
    * set (ground truth is brute-force, so the sample — not the corpus —
    * bounds its cost) before trusting a bucketing scheme at scale.
    *
    * Both inputs are `(query_id, neighbor_id, rank, ...)` frames (the
    * [[bruteForceTopK]] / [[bucketedTopK]] shape). Truth rows beyond
    * rank k are ignored, so callers can reuse a deeper ground-truth run.
    *
    * Scale shape: inputs are |queries|·k rows — the join and the
    * per-query aggregate shuffle on query_id and never touch corpus
    * vectors. recall_ppm is integer-exact (million-scaled floor div).
    *
    * @return (query_id, n_truth, n_hits, recall_ppm); n_truth can be
    *   < k when the corpus has fewer than k valid neighbors
    */
  def annRecall(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val truth = exact.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
    val got = approx.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("__hit"))
    truth.join(got, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(
        count(lit(1)).as("n_truth"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
      .withColumn("recall_ppm", expr("(n_hits * 1000000) div n_truth"))
  }

  /** Embedding-cosine near-duplicate pairs inside buckets: pairs (a < b)
    * sharing a bucket whose cosine ≥ num/den, decided by INTEGER
    * cross-multiplication on the quantized vectors — no float compare:
    * cos ≥ t  ⇔  dot > 0  ∧  dot²·den² ≥ na·nb·num².
    *
    * Pre-flight [[bucketCostProfile]] on the same (df, bucketCol) before
    * a large run: the pair join is quadratic PER BUCKET and a single
    * skewed bucket dominates the job (q52 is the gated profile).
    */
  def cosineNearDupPairs(emb: DataFrame, idCol: String, vecCol: String, bucketCol: String,
      num: Int, den: Int): DataFrame = {
    val a = Dedup.once(emb, "v", quantize(col(vecCol)))
      .select(col(idCol).as("id_a"), col(bucketCol).as("bucket"),
        col("v").as("va"), dot(col("v"), col("v")).as("na"))
    val b = Dedup.once(emb, "v", quantize(col(vecCol)))
      .select(col(idCol).as("id_b"), col(bucketCol).as("bucket"),
        col("v").as("vb"), dot(col("v"), col("v")).as("nb"))
    val joined = a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
    val d = dot(col("va"), col("vb"))
    joined.select(col("id_a"), col("id_b"), d.as("dot"), col("na"), col("nb"))
      .filter(col("dot") > 0 &&
        col("dot") * col("dot") * (den.toLong * den) >= col("na") * col("nb") * (num.toLong * num))
      .select(col("id_a"), col("id_b"), col("dot"), col("na"), col("nb"))
  }

  /** Random-hyperplane LSH bucket id from a (pre-quantized, ideally
    * materialized) vector: `numPlanes` sign bits of projections onto
    * fixed deterministic ±1 hyperplanes — plane p keeps component i when
    * `(i·(2p+3)) mod 7 < 4`. No RNG state, engine-portable.
    */
  def lshBucketFromQuantized(qv: Column, numPlanes: Int = 4): Column = {
    val bits = (0 until numPlanes).map { p =>
      val proj = aggregate(
        transform(qv, (x, i) => when((i * (2 * p + 3)) % 7 < 4, x).otherwise(-x)),
        lit(0L), (acc, x) => acc + x)
      when(proj > 0, lit(1 << p)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** Convenience over a raw float vector; used as the `bucketCol` for
    * [[bucketedTopK]] when no natural clustering exists.
    */
  def lshBucket(vec: Column, numPlanes: Int = 4): Column =
    lshBucketFromQuantized(quantize(vec), numPlanes)

  /** Deterministic Lloyd k-means assignment over quantized embeddings —
    * the LEARNED bucket builder for [[bucketedTopK]] (IVF training):
    * label buckets (q36) need labels and LSH buckets (q42) are
    * data-independent; k-means cells adapt to the corpus.
    *
    * Engine-exact by construction: vectors quantize to integer
    * milli-units; seeds are the `k` hash-smallest ids (never rand);
    * distances are integer squared-L2; argmin ties break on centroid
    * index; and recomputed centroid components are floor-divided
    * integer means (order-free sums, so identical in any engine).
    *
    * Distributed shape — the MLlib pattern: each assignment pass is
    * MAP-ONLY (centroids ride into codegen as k·dim literal constants;
    * nothing joins), and each recompute is ONE shuffle keyed
    * (cluster, pos) followed by a k·dim-row collect to rebuild the
    * literals — the broadcast-centroid pattern, tiny and independent of
    * corpus size. A cluster that loses all members keeps its previous
    * centroid. `iters` is FIXED (no convergence probe) so cost is
    * predictable and the oracle can unroll it.
    *
    * @return (id, cluster, dist_sq): final-round assignment and its
    *   integer squared distance
    */
  def kmeansAssign(emb: DataFrame, idCol: String, vecCol: String,
      k: Int = 4, iters: Int = 2): DataFrame = {
    require(k > 0 && iters > 0, "k and iters must be positive")
    val q0 = Dedup.once(emb.select(col(idCol).as("id"), col(vecCol).as("__v")),
        "qv", quantize(col("__v")))
      .select(col("id"), col("qv"))
    // consumed by the seed scan + every assignment/recompute pass —
    // the signature-table trade. Pinned, not raw-persisted: the bench's
    // warmup/timed passes and q66's reuse of the q62 chain re-invoke this
    // exact plan, and the pin guard reuses the existing cache instead of
    // logging a duplicate-persist warning. The returned frame's plan reads
    // q, so the cache outlives the call (one-shot semantics; a long-lived
    // service releases it via Caching.release on the same projection).
    val q = Caching.pin(q0)
    val centroids = kmeansFitQuantized(q, k, iters)
    assignQuantized(q, centroids).select(col("id"), col("cluster"), col("dist_sq"))
  }

  /** argmin of `vec` (array<long>) over centroid literals as a struct
    * array-min: struct ordering is lexicographic (dist, index), so ties
    * pick the lowest index. Map-only — the assignment side of k-means,
    * PQ encode, and IVF routing all reduce to this one shape.
    */
  private def assignStructArray(vec: Column, centroids: IndexedSeq[Seq[Long]]): Column =
    array(centroids.zipWithIndex.map { case (c, i) =>
      struct(
        l2Sq(vec, array(c.map(lit): _*)).as("d"),
        lit(i.toLong).as("c"))
    }: _*)

  private def assignStruct(vec: Column, centroids: IndexedSeq[Seq[Long]]): Column =
    array_min(assignStructArray(vec, centroids))

  private def assignQuantized(q: DataFrame,
      centroids: IndexedSeq[Seq[Long]]): DataFrame =
    Dedup.once(q, "__a", assignStruct(col("qv"), centroids))
      .select(col("id"), col("qv"),
        col("__a.c").as("cluster"), col("__a.d").as("dist_sq"))

  /** Deterministic Lloyd training over a quantized (id, qv) frame:
    * h32-smallest seeds, `iters − 1` (assign → integer-mean recompute)
    * rounds. Returns the FINAL centroids — assignment against them is a
    * separate map-only projection, so a caller training m codebooks (PQ)
    * pays one scan per round per codebook but encodes everything in a
    * single final pass. Driver state is k·dim longs per collect — bounded
    * by the codebook, never by data.
    */
  private[llm] def kmeansFitQuantized(q: DataFrame, k: Int,
      iters: Int): IndexedSeq[Seq[Long]] = {
    var centroids: IndexedSeq[Seq[Long]] = q
      .withColumn("__h", Dedup.hash32(col("id").cast("string")))
      .orderBy(col("__h"), col("id")).limit(k)
      .collect().map(_.getSeq[Long](1).toIndexedSeq).toIndexedSeq
    for (_ <- 2 to iters) {
      val sums = assignQuantized(q, centroids)
        .select(col("cluster"), posexplode(col("qv")).as(Seq("pos", "v")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect()
      val byCluster = sums.groupBy(_.getLong(0))
      centroids = centroids.zipWithIndex.map { case (prev, ci) =>
        byCluster.get(ci.toLong) match {
          case Some(rows) =>
            // truncating division (Scala Long `/`), matching SQL integer
            // division semantics on negative sums (DuckDB -7 // 2 = -3)
            rows.sortBy(_.getInt(1)).map(r => r.getLong(2) / r.getLong(3)).toIndexedSeq
          case None => prev
        }
      }
    }
    centroids
  }

  /** Train SEVERAL deterministic Lloyd fits over ONE (id, qv) frame in
    * SHARED passes — the multi-codebook trainer behind PQ and IVF-PQ.
    * Each spec `(off, len, k)` trains a k-means over the slice
    * `[off, off+len)` of `qv` (0-based offset); `(0, dim, k)` trains on
    * the whole vector (the coarse quantizer).
    *
    * Bit-identical to running [[kmeansFitQuantized]] once per spec
    * (law-pinned in LlmSpec), because every per-spec computation is the
    * same integer arithmetic, only batched:
    *  - the h32-smallest seed rule depends ONLY on `id`, so every spec
    *    seeds from the SAME rows — one driver collect of those rows
    *    seeds all specs (slices taken driver-side);
    *  - each (assign → integer-mean recompute) round computes every
    *    spec's argmin assignment and per-(spec, cluster, pos) sum/count
    *    in ONE aggregation job over the shared frame instead of one job
    *    (and one full scan of the frame) per spec.
    *
    * Scale shape: the m+1 sequential training scans per Lloyd round
    * collapse to one scan per round (the pass-count win of guide-style
    * "do fewer passes"); driver state stays Σ k_j · len_j longs.
    *
    * @return (per-spec final centroids, N) where N is the frame's row
    *   count observed by the LAST recompute round (pos-0 cluster counts
    *   summed — free, no extra pass), or −1 when `iters == 1` (no
    *   recompute round ran)
    */
  private[llm] def kmeansFitMultiQuantized(q: DataFrame,
      specs: Seq[(Int, Int, Int)], iters: Int)
      : (IndexedSeq[IndexedSeq[Seq[Long]]], Long) = {
    require(specs.nonEmpty, "at least one spec")
    require(iters > 0, "iters must be positive")
    val base = q.select(col("id"), col("qv"))
    val maxK = specs.map(_._3).max
    // one seed collect for every spec: ordering is (h32(id), id) — the
    // per-spec limit(k) is a prefix of this shared limit(maxK)
    val seedRows = base
      .withColumn("__h", Dedup.hash32(col("id").cast("string")))
      .orderBy(col("__h"), col("id")).limit(maxK)
      .collect().map(_.getSeq[Long](1).toIndexedSeq).toIndexedSeq
    var cents: IndexedSeq[IndexedSeq[Seq[Long]]] =
      specs.toIndexedSeq.map { case (off, len, k) =>
        seedRows.take(k).map(v => v.slice(off, off + len): Seq[Long])
      }
    var n = -1L
    for (_ <- 2 to iters) {
      val branches = array(specs.toIndexedSeq.zipWithIndex.map {
        case ((off, len, _), j) =>
          val sl = slice(col("qv"), off + 1, len)
          struct(lit(j).as("b"),
            assignStruct(sl, cents(j)).getField("c").as("cl"),
            sl.as("sv"))
      }: _*)
      val sums = base.select(explode(branches).as("s"))
        .select(col("s.b").as("b"), col("s.cl").as("cl"),
          posexplode(col("s.sv")).as(Seq("pos", "v")))
        .groupBy(col("b"), col("cl"), col("pos"))
        .agg(sum(col("v")).as("sm"), count(lit(1)).as("n"))
        .collect()
      // every row lands in exactly one cluster of spec 0, so its pos-0
      // counts sum to the frame's row count — trainedN without a pass
      n = sums.iterator
        .filter(r => r.getInt(0) == 0 && r.getInt(2) == 0)
        .map(_.getLong(4)).sum
      val bySpec = sums.groupBy(_.getInt(0))
      cents = cents.zipWithIndex.map { case (prev, j) =>
        bySpec.get(j) match {
          case Some(rows) =>
            val byCluster = rows.groupBy(_.getLong(1))
            prev.zipWithIndex.map { case (pc, ci) =>
              byCluster.get(ci.toLong) match {
                // truncating division (Scala Long `/`), matching SQL
                // integer division on negative sums (DuckDB -7 // 2 = -3)
                case Some(rs) => rs.sortBy(_.getInt(2))
                  .map(r => r.getLong(3) / r.getLong(4)).toIndexedSeq
                case None => pc
              }
            }
          case None => prev // empty frame: seeds stand, N stays 0
        }
      }
    }
    (cents, n)
  }

  /** SemDeDup-style semantic deduplication (the embedding analog of the
    * MinHash near-dup pipeline): deterministic k-means cells become the
    * buckets of an in-cluster cosine near-dup pair join, the pair graph
    * closes transitively ([[Dedup.canonicalizeClusters]] — min-label
    * propagation, direction-independent), and each semantic group keeps
    * exactly one representative, its minimum id.
    *
    * Scale contract: never all-pairs — candidate pairs exist only inside
    * a k-means cell, so pre-flight [[bucketCostProfile]] on the
    * assignment before a large run exactly as q52 gates q38 (an
    * over-coarse k makes a cell quadratic-dominant; raise k). Every
    * stage is integer-exact (quantized vectors, integer cross-multiplied
    * cosine test, integer centroid means), so the keep set is bit-stable
    * across engines, runs, and retries.
    *
    * @return one row per input vector: (idCol, cluster, canonical_id,
    *   kept) — kept = 1 iff this id is its group's representative
    */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
      k: Int = 4, iters: Int = 2, num: Int = 19, den: Int = 20): DataFrame = {
    val assign = kmeansAssign(emb, idCol, vecCol, k, iters)
      .select(col("id").as(idCol), col("cluster"))
    val bucketed = emb.select(col(idCol), col(vecCol)).join(assign, Seq(idCol))
    val pairs = cosineNearDupPairs(bucketed, idCol, vecCol, "cluster", num, den)
      .select(col("id_a"), col("id_b"))
    val canon = Dedup.canonicalizeClusters(pairs)
      .withColumnRenamed("id", idCol)
    assign.join(canon, Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        coalesce(col("canonical_id"), col(idCol)).as("canonical_id"))
      .withColumn("kept",
        when(col("canonical_id") === col(idCol), 1L).otherwise(0L))
  }

  /** Symmetric int8 quantization of an embedding column — the vector-
    * compression step of a memory-bound ANN index (4 bytes/dim float →
    * 1 byte/dim + one scale): per-vector scale = max |component| of the
    * milli-unit integer vector, q8_i = (v_i · 127) div scale. Both
    * engines' integral division truncates toward zero (Spark `div`,
    * DuckDB `//`: −7/2 = −3), so codes are bit-stable cross-engine; a
    * zero vector takes scale 1 (all-zero codes) rather than divide by
    * zero. Pure per-row projection: codegen'd, shuffle-free, linear.
    *
    * @return (idCol, qv, scale, q8): the milli-unit vector, its scale,
    *   and q8 an array<long> of codes in [−127, 127]; reconstruction is
    *   q8_i · scale / 127 milli-units (so |qv_i·127 − q8_i·scale| is the
    *   exact integer error in 1/127-milli-units)
    */
  def int8Quantize(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val base = Dedup.once(emb.select(col(idCol), col(vecCol)), "__qv",
      quantize(col(vecCol)))
    // the scale feeds every lane's division — materialize it once
    // (same CollapseProject barrier as the signature pipelines)
    Dedup.once(base, "__sc",
        greatest(array_max(transform(col("__qv"), x => abs(x))), lit(1L)))
      .select(col(idCol), col("__qv").as("qv"), col("__sc").as("scale"),
        expr("transform(__qv, x -> (x * 127L) div __sc)").as("q8"))
  }

  /** Product quantization encode — the codebook compression behind
    * IVF-PQ indexes (Jégou et al. 2011's PQ step): the D-dim vector
    * splits into `m` contiguous subspaces of D/m dims, each subspace
    * gets its own deterministic k-means codebook
    * ([[kmeansFitQuantized]] on the sliced vectors — same seeds-by-h32,
    * same integer means), and a vector's code is the m-tuple of its
    * nearest sub-centroids. Storage per vector drops from D·8 B to
    * m·⌈log2 k⌉ bits + shared codebooks (m·k·(D/m) longs — driver/
    * broadcast-sized, never data-sized).
    *
    * Scale shape: training costs (iters−1) scans per codebook over the
    * PINNED quantized frame (slices recompute from cache); ENCODING is
    * one map-only projection computing all m argmins per row — at 100 TB
    * the encode pass is the whole cost and it is a pure scan-project.
    * Everything is integer-exact (quantized milli-units, integer
    * squared distances, integer centroid means), so codes and the
    * reconstruction error are bit-stable across engines.
    *
    * @return (idCol, codes array<long> of length m, recon_err — the sum
    *   over subspaces of the integer squared distance to the chosen
    *   sub-centroid, i.e. the exact PQ reconstruction error of the
    *   quantized vector)
    */
  def pqEncode(emb: DataFrame, idCol: String, vecCol: String,
      m: Int = 4, k: Int = 4, iters: Int = 2): DataFrame = {
    val (q, sub, books) = pqTrain(emb, idCol, vecCol, m, k, iters)
    // one barrier materializes all m (dist, code) argmin structs, then
    // codes/err project from it without re-evaluating the k·m distances
    val pq = array(books.indices.map { j =>
      assignStruct(slice(col("qv"), j * sub + 1, sub), books(j))
    }: _*)
    Dedup.once(q, "__pq", pq)
      .select(col("id").as(idCol),
        transform(col("__pq"), s => s.getField("c")).as("codes"),
        aggregate(transform(col("__pq"), s => s.getField("d")),
          lit(0L), _ + _).as("recon_err"))
  }

  /** Shared PQ setup: the pinned quantized frame, subspace width, and
    * the m trained codebooks.
    */
  private def pqTrain(emb: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int): (DataFrame, Int, IndexedSeq[IndexedSeq[Seq[Long]]]) = {
    require(m > 0 && k > 0 && iters > 0, "m, k and iters must be positive")
    val q0 = Dedup.once(emb.select(col(idCol).as("id"), col(vecCol).as("__v")),
        "qv", quantize(col("__v")))
      .select(col("id"), col("qv"))
    val q = Caching.pin(q0)
    val dim = q.select(size(col("qv"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim must be divisible by m=$m")
    val sub = dim / m
    // all m codebooks in shared passes: one seed collect + one
    // aggregation per Lloyd round instead of m of each (bit-identical —
    // [[kmeansFitMultiQuantized]])
    val (books, _) = kmeansFitMultiQuantized(q,
      (0 until m).map(j => (j * sub, sub, k)), iters)
    (q, sub, books)
  }

  /** [[pqTrain]] plus the coarse quantizer in the SAME shared passes —
    * the m codebooks and the `cells`-means coarse fit all train from one
    * seed collect and one aggregation per round ([[kmeansFitMultiQuantized]]
    * — bit-identical to the sequential fits). Also returns the frame's
    * row count N observed by the last round (−1 when iters == 1), which
    * [[ivfPqWriteIndex]] persists as the staleness anchor without an
    * extra counting pass.
    */
  private def pqTrainWithCoarse(emb: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int, cells: Int)
      : (DataFrame, Int, IndexedSeq[IndexedSeq[Seq[Long]]], IndexedSeq[Seq[Long]], Long) = {
    require(m > 0 && k > 0 && iters > 0, "m, k and iters must be positive")
    require(cells > 0, "cells must be positive")
    val q0 = Dedup.once(emb.select(col(idCol).as("id"), col(vecCol).as("__v")),
        "qv", quantize(col("__v")))
      .select(col("id"), col("qv"))
    val q = Caching.pin(q0)
    val dim = q.select(size(col("qv"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim must be divisible by m=$m")
    val sub = dim / m
    val specs = (0 until m).map(j => (j * sub, sub, k)) :+ ((0, dim, cells))
    val (fits, n) = kmeansFitMultiQuantized(q, specs, iters)
    (q, sub, fits.take(m), fits(m), n)
  }

  /** ADC (asymmetric distance computation) top-k over PQ codes — the
    * query loop of an IVF-PQ index (Jégou et al. 2011): candidates carry
    * only their m-byte codes; a query's distance to a candidate is the
    * sum over subspaces of the EXACT distance from the query's slice to
    * the candidate's chosen sub-centroid. The corpus's raw vectors are
    * never touched at query time — this is why PQ indexes fit in memory
    * at corpus sizes where float vectors cannot.
    *
    * Scale shape: codes are one map-only projection over the corpus
    * (like [[pqEncode]]); the query side broadcasts (queries and
    * codebooks are both tiny); scoring is per-(candidate, query) integer
    * arithmetic against codebook LITERALS inside codegen — no lookup
    * join, no shuffle of corpus vectors. This is the brute-force-scan
    * baseline of PQ search (the honest q35 analog); compose with k-means
    * cell routing (q63's shape) for the IVF-restricted variant.
    *
    * @return (query_id, neighbor_id, adc_dist, rank) — rank by ascending
    *   integer ADC distance, ties to the smaller neighbor id
    */
  def pqAdcTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, m: Int = 4, k: Int = 4, iters: Int = 2,
      topK: Int = 10): DataFrame = {
    val (q, sub, books) = pqTrain(emb, idCol, vecCol, m, k, iters)
    val cand = Dedup.once(q, "__pq", pqCodesStructs(books, sub))
      .select(col("id").as("neighbor_id"),
        transform(col("__pq"), s => s.getField("c")).as("codes"))
    val queries = Dedup.once(
        emb.filter(queryPred).select(col(idCol).as("query_id"), col(vecCol).as("__v")),
        "qqv", quantize(col("__v")))
      .select(col("query_id"), col("qqv"))
    val scored = cand.crossJoin(broadcast(queries))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), adcDist(books, sub).as("adc_dist"))
    adcRanked(scored, topK)
  }

  /** The m per-subspace (dist, code) argmin structs of a row's `qv` —
    * the encode projection shared by [[pqAdcTopK]] and [[ivfPqTopK]].
    */
  private def pqCodesStructs(books: IndexedSeq[IndexedSeq[Seq[Long]]],
      sub: Int): Column =
    array(books.indices.map { j =>
      assignStruct(slice(col("qv"), j * sub + 1, sub), books(j))
    }: _*)

  /** Integer ADC distance of a query's `qqv` slices to a candidate's
    * `codes` against codebook LITERALS — pure codegen arithmetic, no
    * lookup join.
    */
  private def adcDist(books: IndexedSeq[IndexedSeq[Seq[Long]]], sub: Int): Column =
    books.indices.map { j =>
      val bookLit = array(books(j).map(c => array(c.map(lit): _*)): _*)
      l2Sq(
        slice(col("qqv"), j * sub + 1, sub),
        element_at(bookLit, element_at(col("codes"), j + 1).cast("int") + 1))
    }.reduce(_ + _)

  private def adcRanked(scored: DataFrame, topK: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }

  /** Composed IVF-PQ search — the flagship ANN shape at 100 TB (Jégou
    * et al. 2011 assembled end to end): a COARSE deterministic k-means
    * quantizer ([[kmeansFitQuantized]] on the full vectors, q62's
    * trainer) routes every vector to a cell, PQ codebooks compress the
    * residual-free vectors to m codes ([[pqEncode]]'s projection), and
    * a query ADC-scores ONLY the codes inside its `nprobe` nearest
    * cells — never the whole code table. `nprobe` is THE recall/cost
    * knob of a deployed IVF index: each extra probed cell adds ~1/cells
    * of the corpus to the query's candidate set and recovers neighbors
    * that fell across the cell boundary ([[annRecall]] over nprobe=1 vs
    * 2 is the gated curve, q102). nprobe = 1 routes by plain argmin;
    * nprobe > 1 sorts the (dist, cell) structs and explodes the first n
    * — the query row fans out over its cells BEFORE the same cell-keyed
    * equi-join, so the plan stays all-equi-join at any nprobe.
    *
    * Scale shape: both trainings are constant-bounded driver state
    * (cells·D + m·k·D/m centroid longs); the corpus pays one map-only
    * encode projection (cell + codes in a single pass over the pinned
    * quantized frame); the query side broadcasts; the candidate join is
    * a cell-keyed EQUI-join (plan-asserted — never all-pairs), so
    * per-query work is its cell's population, not the corpus. At 100 TB
    * the code table would persist as a cell-partitioned layout, making
    * the search a partition-pruned scan; [[pqAdcTopK]] remains the
    * honest full-scan baseline and [[annRecall]] (q100) measures what
    * cell-pruning + quantization together cost in quality.
    *
    * @return (query_id, neighbor_id, adc_dist, rank) — rank by ascending
    *   integer ADC distance within the query's cell, ties to the smaller
    *   neighbor id
    */
  def ivfPqTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, cells: Int = 4, m: Int = 4, k: Int = 4,
      iters: Int = 2, topK: Int = 10, nprobe: Int = 1): DataFrame =
    ivfPqTopKCurve(emb, idCol, vecCol, queryPred, cells, m, k, iters,
      topK, Seq(nprobe)).head._2

  /** [[ivfPqTopK]] at SEVERAL nprobe settings from ONE trained model
    * and one shared candidate encode — the recall-curve shape: the
    * trainer is deterministic, so per-point retraining (q102's old
    * form) recomputed the identical model once per point. Each
    * returned frame is bit-identical to `ivfPqTopK(..., nprobe = np)`
    * (same training, literally the same construction).
    */
  def ivfPqTopKCurve(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, cells: Int = 4, m: Int = 4, k: Int = 4,
      iters: Int = 2, topK: Int = 10,
      nprobes: Seq[Int] = Seq(1)): Seq[(Int, DataFrame)] = {
    require(cells > 0, "cells must be positive")
    require(nprobes.nonEmpty, "at least one nprobe point")
    nprobes.foreach(np => require(np >= 1 && np <= cells,
      s"nprobe must be in [1, cells=$cells], got $np"))
    val (q, sub, books, coarse, _) =
      pqTrainWithCoarse(emb, idCol, vecCol, m, k, iters, cells)
    // one pass over the pinned quantized frame computes the coarse cell
    // AND all m sub-codes (the barrier materializes the argmin structs)
    val cand = Dedup.once(q, "__pq", pqCodesStructs(books, sub))
      .select(col("id").as("neighbor_id"),
        assignStruct(col("qv"), coarse).getField("c").as("cell"),
        transform(col("__pq"), s => s.getField("c")).as("codes"))
    val qBase = Dedup.once(
      emb.filter(queryPred).select(col(idCol).as("query_id"), col(vecCol).as("__v")),
      "qqv", quantize(col("__v")))
    nprobes.map { nprobe =>
      // (query, neighbor) stays unique at nprobe > 1: each neighbor
      // lives in exactly one cell and the exploded query rows are
      // distinct cells
      val queries =
        if (nprobe == 1)
          qBase.select(col("query_id"), col("qqv"),
            assignStruct(col("qqv"), coarse).getField("c").as("cell"))
        else
          qBase.select(col("query_id"), col("qqv"),
            explode(transform(
              slice(array_sort(assignStructArray(col("qqv"), coarse)), 1, nprobe),
              s => s.getField("c"))).as("cell"))
      val scored = cand.join(broadcast(queries), Seq("cell"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"), adcDist(books, sub).as("adc_dist"))
      nprobe -> adcRanked(scored, topK)
    }
  }

  /** Residual IVF-PQ — the form Jégou et al. 2011 §III actually deploy:
    * PQ codebooks train on CELL RESIDUALS (vector − its coarse
    * centroid), not raw vectors. Raw-vector PQ ([[ivfPqTopK]]) wastes
    * its tiny code budget re-describing the coarse structure the cell
    * id already encodes; subtracting the centroid first recenters every
    * cell's population on the origin, so all m·k sub-centroids spend
    * their resolution on the WITHIN-cell detail that actually ranks
    * neighbors. The q104 curve measures the recall this buys on the
    * same corpus/params as q102's raw curve.
    *
    * The query side mirrors it: a query routed to a cell is compared as
    * (query − that cell's centroid), so the residual is re-derived PER
    * PROBED CELL at nprobe > 1 — centroid literals in codegen, no
    * lookup join. Same scale shape as [[ivfPqTopK]]: constant-bounded
    * driver state (cells·D + m·k·D/m longs), one extra map-only
    * projection (the residual), broadcast queries, cell-keyed equi-join
    * only.
    *
    * Translation by a PER-CELL constant leaves within-cell k-means and
    * ADC arithmetic exact (differences of longs), so determinism and
    * the oracle replay hold bit-for-bit.
    *
    * @return (query_id, neighbor_id, adc_dist, rank) — rank by ascending
    *   integer residual-ADC distance, ties to the smaller neighbor id
    */
  def ivfPqResidualTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, cells: Int = 4, m: Int = 4, k: Int = 4,
      iters: Int = 2, topK: Int = 10, nprobe: Int = 1): DataFrame =
    ivfPqResidualTopKCurve(emb, idCol, vecCol, queryPred, cells, m, k,
      iters, topK, Seq(nprobe)).head._2

  /** [[ivfPqResidualTopK]] at SEVERAL nprobe settings from ONE coarse
    * fit, one pinned residual frame, and one residual-codebook training
    * — the q104 curve shape (each point otherwise retrains the whole
    * identical model). Per point bit-identical to the single-call form.
    */
  def ivfPqResidualTopKCurve(emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, cells: Int = 4, m: Int = 4, k: Int = 4,
      iters: Int = 2, topK: Int = 10,
      nprobes: Seq[Int] = Seq(1)): Seq[(Int, DataFrame)] = {
    require(cells > 0, "cells must be positive")
    require(nprobes.nonEmpty, "at least one nprobe point")
    nprobes.foreach(np => require(np >= 1 && np <= cells,
      s"nprobe must be in [1, cells=$cells], got $np"))
    require(m > 0 && k > 0 && iters > 0, "m, k and iters must be positive")
    val q0 = Dedup.once(emb.select(col(idCol).as("id"), col(vecCol).as("__v")),
        "qv", quantize(col("__v")))
      .select(col("id"), col("qv"))
    val q = Caching.pin(q0)
    val dim = q.select(size(col("qv"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim must be divisible by m=$m")
    val sub = dim / m
    val coarse = kmeansFitQuantized(q, cells, iters)
    val centLit = array(coarse.map(c => array(c.map(lit): _*)): _*)
    def residual(vec: Column, cell: Column): Column =
      zip_with(vec, element_at(centLit, cell.cast("int") + 1), _ - _)
    // pinned residual frame: the codebooks train over it m times and the
    // encode projects from it once (same lifecycle note as pqTrain)
    val res = Caching.pin(
      Dedup.once(q, "__cell", assignStruct(col("qv"), coarse).getField("c"))
        .select(col("id"), col("__cell").as("cell"),
          residual(col("qv"), col("__cell")).as("qv")))
    // all m residual codebooks in shared passes over the pinned residual
    // frame (one seed collect + one aggregation per round, bit-identical
    // to the sequential fits — [[kmeansFitMultiQuantized]])
    val (books, _) = kmeansFitMultiQuantized(res,
      (0 until m).map(j => (j * sub, sub, k)), iters)
    val cand = Dedup.once(res, "__pq", pqCodesStructs(books, sub))
      .select(col("id").as("neighbor_id"), col("cell"),
        transform(col("__pq"), s => s.getField("c")).as("codes"))
    val qBase = Dedup.once(
      emb.filter(queryPred).select(col(idCol).as("query_id"), col(vecCol).as("__v")),
      "qqv", quantize(col("__v")))
    nprobes.map { nprobe =>
      val routed =
        if (nprobe == 1)
          qBase.select(col("query_id"), col("qqv"),
            assignStruct(col("qqv"), coarse).getField("c").as("cell"))
        else
          qBase.select(col("query_id"), col("qqv"),
            explode(transform(
              slice(array_sort(assignStructArray(col("qqv"), coarse)), 1, nprobe),
              s => s.getField("c"))).as("cell"))
      val queries = routed.select(col("query_id"), col("cell"),
        residual(col("qqv"), col("cell")).as("qqv"))
      val scored = cand.join(broadcast(queries), Seq("cell"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"), adcDist(books, sub).as("adc_dist"))
      nprobe -> adcRanked(scored, topK)
    }
  }

  // ------------------------------------------------------- persisted index

  /** The driver-sized state of a trained IVF-PQ index: the coarse
    * quantizer (cells·dim longs) and the m PQ codebooks (m·k·sub longs).
    * Everything a query needs besides the persisted code table — small
    * enough to live in a text sidecar and broadcast as codegen literals.
    */
  final case class IvfPqModel(cells: Int, m: Int, sub: Int,
      coarse: IndexedSeq[Seq[Long]],
      books: IndexedSeq[IndexedSeq[Seq[Long]]],
      trainedN: Long = -1L)

  val IvfPqModelFile = "_ivfpq_model.txt"

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Train an IVF-PQ index ([[ivfPqTopK]]'s exact trainer — same seed
    * rule, same integer means, so the persisted index answers queries
    * bit-identically to the in-memory composition) and PERSIST it:
    * the code table `(id, codes)` lands under `outDir/cell=K/` —
    * parquet partitioned by coarse cell — and the model (coarse
    * centroids + codebooks) in a `_ivfpq_model.txt` sidecar. This is
    * the deployment step the 100 TB story needs: once the table is
    * cell-partitioned, a query's candidate scan is PARTITION-PRUNED to
    * its nprobe probed cells — the engine never lists, opens, or reads
    * the other cells' files ([[ivfPqServeIndex]], plan-asserted in
    * PlanSpec).
    *
    * Layout rules (the [[graft.sinks.ShardedExport]] discipline):
    * rows repartition ON the cell key with the partition count aligned
    * to the cell count, so `partitionBy` writes one file per cell
    * directory instead of tasks×cells fragments; rows sort by id
    * within each cell, so file CONTENTS are deterministic too. At
    * 100 TB raise the repartition count to a multiple of `cells`
    * (several files per cell) and compact per-cell with
    * [[graft.sinks.Compaction]] as the corpus grows.
    *
    * @return the trained model (also persisted to the sidecar)
    */
  def ivfPqWriteIndex(emb: DataFrame, idCol: String, vecCol: String,
      outDir: String, cells: Int = 4, m: Int = 4, k: Int = 4,
      iters: Int = 2): IvfPqModel = {
    require(cells > 0, "cells must be positive")
    val (q, sub, books, coarse, n) =
      pqTrainWithCoarse(emb, idCol, vecCol, m, k, iters, cells)
    // corpus size AT TRAIN TIME, persisted with the model: the √N-cells
    // serve rule (SCALE.md round-17 table: slope 0.51 frozen-cells vs
    // 0.047 at √N cells) only holds while the corpus stays near its
    // train-time size — [[ivfPqStaleness]] compares against this anchor.
    // N falls out of the last training round's cluster counts; only an
    // iters=1 train (no recompute round) pays a counting pass for it.
    val model = IvfPqModel(cells, m, sub, coarse, books,
      trainedN = if (n >= 0) n else q.count())
    writeCodeTable(ivfPqEncodeQuantized(q, model), model, outDir, "overwrite")
    writeIvfPqModel(emb.sparkSession, outDir, model)
    model
  }

  /** The map-only encode projection of a FROZEN model over a quantized
    * (id, qv) frame: one pass computes the coarse cell and all m
    * sub-codes from centroid literals in codegen — shared by the
    * initial write, [[ivfPqWriteIndexWithModel]], and the append path.
    */
  private def ivfPqEncodeQuantized(q: DataFrame, model: IvfPqModel): DataFrame =
    Dedup.once(q, "__pq", pqCodesStructs(model.books, model.sub))
      .select(col("id"),
        transform(col("__pq"), s => s.getField("c")).as("codes"),
        assignStruct(col("qv"), model.coarse).getField("c").as("cell"))

  /** Encode `emb` with an already-trained model (NO retrain): quantize,
    * route to the model's coarse cells, code against the model's
    * codebooks. Raises if the batch's vector dim disagrees with the
    * model — the one mistake an append caller can make silently.
    *
    * @return (id, codes array<long> of length m, cell)
    */
  def ivfPqEncode(emb: DataFrame, idCol: String, vecCol: String,
      model: IvfPqModel): DataFrame = {
    val q = Dedup.once(emb.select(col(idCol).as("id"), col(vecCol).as("__v")),
        "qv", quantize(col("__v")))
      .select(col("id"), col("qv"))
    q.select(size(col("qv"))).head(1).foreach { r =>
      require(r.getInt(0) == model.m * model.sub,
        s"batch dim ${r.getInt(0)} != model dim ${model.m * model.sub}")
    }
    ivfPqEncodeQuantized(q, model)
  }

  /** The shared cell-partitioned layout writer: repartition ON the cell
    * key aligned to the cell count (one file per cell per write — no
    * tasks×cells fragments), rows sorted by id within each cell so file
    * CONTENTS are deterministic. `append` lands additional files inside
    * the existing `cell=K/` directories.
    */
  private def writeCodeTable(encoded: DataFrame, model: IvfPqModel,
      outDir: String, mode: String): Unit =
    encoded.repartition(model.cells, col("cell"))
      .sortWithinPartitions(col("cell"), col("id"))
      .write.mode(mode).partitionBy("cell").parquet(outDir)

  /** Write a persisted index from `emb` ENCODED WITH `model` — no
    * training. This is the rebuild half of the index lifecycle (and the
    * reference point the append gate hash-compares against: base-write
    * + append must serve identically to a with-model rebuild over the
    * union, because both encode every vector with the same frozen
    * model).
    */
  def ivfPqWriteIndexWithModel(emb: DataFrame, idCol: String, vecCol: String,
      outDir: String, model: IvfPqModel): Unit = {
    writeCodeTable(ivfPqEncode(emb, idCol, vecCol, model), model, outDir, "overwrite")
    writeIvfPqModel(emb.sparkSession, outDir, model)
  }

  /** Append a new corpus batch to a persisted index — the ingest step
    * of a LIVE index: the batch is encoded with the index's PERSISTED
    * model (read from the sidecar; never retrained, so every vector
    * ever written remains comparable under one quantizer) and its
    * files land inside the existing `cell=K/` directories. Repeated
    * appends fragment each cell by one file per batch; run
    * [[ivfPqCompactIndex]] on a maintenance cadence to restore the
    * one-file-per-cell layout — untouched cells are skipped, so the
    * maintenance cost tracks the append rate, not the corpus size.
    *
    * Caller contract (same as the reference's single-writer load
    * protocol): batch ids are disjoint from the index's — this is an
    * append, not an upsert ([[graft.operators.CdcApply]] is the upsert
    * operator; compose it upstream if the feed has revisions).
    *
    * @return the persisted model the batch was encoded with
    */
  def ivfPqAppendIndex(batch: DataFrame, idCol: String, vecCol: String,
      indexDir: String): IvfPqModel = {
    val model = readIvfPqModel(batch.sparkSession, indexDir)
    writeCodeTable(ivfPqEncode(batch, idCol, vecCol, model), model, indexDir, "append")
    model
  }

  /** Incremental per-cell compaction of a persisted index: each
    * `cell=K/` directory whose file count exceeds its byte-ideal target
    * is rewritten (sorted by id — restoring the deterministic layout
    * [[writeCodeTable]] produces); cells already at their target are
    * NOT rewritten or even read. Delegates to
    * [[graft.sinks.Compaction.compactPartitions]].
    */
  def ivfPqCompactIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, targetBytes: Long = 128L << 20)
      : Seq[graft.sinks.Compaction.PartitionCompaction] =
    graft.sinks.Compaction.compactPartitions(spark, indexDir,
      targetBytes = targetBytes, sortCols = Seq("id"))

  /** Staleness audit of a persisted index. `currentN` counts the code
    * table (parquet METADATA count — footer row counts, no data read);
    * `idealCells` re-applies the measured √N-cells rule (SCALE.md:
    * serve cost is Q·N/cells ADC candidates, so cells must grow like
    * √N to keep the serve slope near-flat — frozen cells revert it
    * toward 0.5) from the train-time anchor; `stale` trips when the
    * corpus has outgrown the trained cell count by `staleFactor`
    * (default 4 = the ideal cell count is ≥ 2× the trained one).
    * Legacy sidecars without a trainedN anchor report -1 / never trip.
    */
  final case class IvfPqStaleness(cells: Int, trainedN: Long,
      currentN: Long, idealCells: Int, stale: Boolean)

  /** Growth factor at which [[ivfPqStaleness]] flags an index: 4×
    * train-time N puts the √N-ideal cell count at 2× the trained one.
    */
  val IvfPqStaleFactor = 4.0

  def ivfPqStaleness(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, staleFactor: Double = IvfPqStaleFactor)
      : IvfPqStaleness = {
    val model = readIvfPqModel(spark, indexDir)
    val currentN = spark.read.parquet(indexDir).count()
    val idealCells =
      if (model.trainedN <= 0L) model.cells
      else math.max(model.cells, math.ceil(
        model.cells * math.sqrt(currentN.toDouble / model.trainedN)).toInt)
    val stale = model.trainedN > 0L &&
      currentN.toDouble / model.trainedN >= staleFactor
    IvfPqStaleness(model.cells, model.trainedN, currentN, idealCells, stale)
  }

  /** Retrain a stale persisted index — the maintenance op that closes
    * the staleness loop: re-trains from the CURRENT corpus (`emb` is
    * the source of truth; the code table holds codes, not vectors) at
    * the √N-ideal cell count, builds the fresh index ASIDE, then swaps
    * it in with post-condition-verified renames (Hadoop signals refusal
    * by returning false). Determinism: the trainer is seed-free and
    * integer-exact, so a retrain serves bit-identically to a fresh
    * [[ivfPqWriteIndex]] at the same cell count over the same corpus
    * (law-pinned in LlmSpec).
    *
    * Single-maintainer contract (same as [[ivfPqCompactIndex]]): don't
    * run concurrently with appends or serves on the same index. Crash
    * windows are recoverable by hand: before the first rename nothing
    * changed (a `.retrain.*` orphan to delete); between the renames the
    * index name is briefly absent while both `.old.*` (complete old)
    * and `.retrain.*` (complete new) exist.
    */
  def ivfPqRetrain(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, emb: DataFrame, idCol: String, vecCol: String,
      m: Int = 4, k: Int = 4, iters: Int = 2,
      cellsOverride: Option[Int] = None): IvfPqModel = {
    val st = ivfPqStaleness(spark, indexDir)
    val newCells = cellsOverride.getOrElse(st.idealCells)
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val tmp = s"$indexDir.retrain.$nonce"
    val model = ivfPqWriteIndex(emb, idCol, vecCol, tmp, newCells, m, k, iters)
    import org.apache.hadoop.fs.Path
    val fs = new Path(indexDir).getFileSystem(spark.sessionState.newHadoopConf())
    def mv(a: String, b: String): Unit =
      require(fs.rename(new Path(a), new Path(b)), s"rename refused: $a -> $b")
    val old = s"$indexDir.old.$nonce"
    mv(indexDir, old)
    mv(tmp, indexDir)
    fs.delete(new Path(old), true): Unit
    log.info(s"retrained IVF-PQ index $indexDir: cells ${st.cells} -> " +
      s"$newCells (N ${st.trainedN} -> ${st.currentN})")
    model
  }

  /** Serialize the model sidecar: one `key=value` line per field, vector
    * entries `;`-separated, components `,`-separated — all longs, so the
    * round-trip is exact (no float formatting).
    */
  private def writeIvfPqModel(spark: org.apache.spark.sql.SparkSession,
      dir: String, model: IvfPqModel): Unit = {
    import org.apache.hadoop.fs.Path
    def vecs(vs: Seq[Seq[Long]]): String =
      vs.map(_.mkString(",")).mkString(";")
    val text = new StringBuilder
    text ++= s"cells=${model.cells}\nm=${model.m}\nsub=${model.sub}\n"
    if (model.trainedN >= 0) text ++= s"trainedN=${model.trainedN}\n"
    text ++= s"coarse=${vecs(model.coarse)}\n"
    model.books.zipWithIndex.foreach { case (b, j) =>
      text ++= s"book$j=${vecs(b)}\n"
    }
    val p = new Path(dir, IvfPqModelFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(text.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Parse a persisted index's model sidecar back. Validates structure
    * as it parses — a truncated/corrupt sidecar raises a descriptive
    * error naming the path, never an opaque MatchError/NumberFormat
    * deep in a query plan.
    */
  def readIvfPqModel(spark: org.apache.spark.sql.SparkSession,
      dir: String): IvfPqModel = {
    import org.apache.hadoop.fs.Path
    val p = new Path(dir, IvfPqModelFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    def corrupt(why: String): Nothing =
      throw new IllegalStateException(s"corrupt IVF-PQ model sidecar $p: $why")
    val kv = text.linesIterator.filter(_.nonEmpty).map { l =>
      l.split("=", 2) match {
        case Array(key, v) => key -> v
        case _ => corrupt(s"malformed line '$l'")
      }
    }.toMap
    def int(key: String): Int = {
      val v = kv.getOrElse(key, corrupt(s"missing key '$key'"))
      try v.toInt catch { case _: NumberFormatException =>
        corrupt(s"key '$key' is not an int: '$v'") }
    }
    def vecs(key: String, expectLen: Int, expectDim: Int): IndexedSeq[Seq[Long]] = {
      val s = kv.getOrElse(key, corrupt(s"missing key '$key'"))
      if (s.isEmpty) corrupt(s"key '$key' is empty")
      val out = s.split(";").iterator.map { v =>
        v.split(",").iterator.map { c =>
          try c.toLong catch { case _: NumberFormatException =>
            corrupt(s"key '$key' has non-long component '$c'") }
        }.toSeq
      }.toIndexedSeq
      if (expectLen > 0 && out.length != expectLen)
        corrupt(s"key '$key' has ${out.length} vectors, expected $expectLen")
      out.find(_.length != expectDim).foreach(v =>
        corrupt(s"key '$key' has a ${v.length}-dim vector, expected $expectDim"))
      out
    }
    val cells = int("cells"); val m = int("m"); val sub = int("sub")
    if (cells <= 0 || m <= 0 || sub <= 0)
      corrupt(s"non-positive dims cells=$cells m=$m sub=$sub")
    val books = (0 until m).map(j => vecs(s"book$j", -1, sub))
    if (books.map(_.length).distinct.length > 1)
      corrupt(s"codebooks have differing sizes ${books.map(_.length)}")
    // LENIENT: sidecars written before the staleness anchor existed
    // have no trainedN line — those indexes report unknown (-1) and
    // the staleness signal never trips on them (no false alarms on a
    // healthy legacy index; rewrite or retrain to gain the anchor)
    val trainedN = kv.get("trainedN").map { v =>
      try v.toLong catch { case _: NumberFormatException =>
        corrupt(s"key 'trainedN' is not a long: '$v'") }
    }.getOrElse(-1L)
    IvfPqModel(cells, m, sub, vecs("coarse", cells, m * sub), books, trainedN)
  }

  /** Answer an ANN query FROM the persisted index — the serving path of
    * a deployed IVF-PQ deployment, and the payoff of the cell layout:
    * the probed cells are collected driver-side (≤ cells values — the
    * query set routes through the model's centroid literals, so this is
    * constant-bounded, never data-sized) and folded into the scan as a
    * PARTITION filter (`cell IN (...)`) — the code-table scan reads only
    * `|probed| / cells` of the table's files; the rest are pruned from
    * the file listing itself. After the pruned scan the plan is exactly
    * [[ivfPqTopK]]'s tail: broadcast queries, cell-keyed equi-join,
    * codebook-literal ADC in codegen, per-query top-k window.
    *
    * Bit-determinism contract: an index written by [[ivfPqWriteIndex]]
    * from `emb` serves any query predicate with results identical to
    * running [[ivfPqTopK]] on `emb` directly (the q121 gate replays
    * q99's oracle against the persisted form).
    */
  def ivfPqServeIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, emb: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, topK: Int = 10, nprobe: Int = 1): DataFrame = {
    val model = readIvfPqModel(spark, indexDir)
    require(nprobe >= 1 && nprobe <= model.cells,
      s"nprobe must be in [1, cells=${model.cells}], got $nprobe")
    // staleness tripwire (best-effort, metadata-count only, opt-out via
    // -Dgraft.ivfpq.staleCheck=false): a frozen-cells index silently
    // reverts toward the 0.5 serve slope as the corpus outgrows it —
    // the serving path is where that degradation is FELT, so it is
    // where the signal fires. Results stay correct either way.
    if (sys.props.getOrElse("graft.ivfpq.staleCheck", "true").toBoolean &&
        model.trainedN > 0L)
      try {
        val st = ivfPqStaleness(spark, indexDir)
        if (st.stale)
          log.warn(s"IVF-PQ index $indexDir is STALE: corpus " +
            s"${st.currentN} vs trainedN ${st.trainedN} at cells=${st.cells} " +
            s"(ideal ≈ ${st.idealCells}); serve cost grows ∝ N/cells — run " +
            s"ivfPqRetrain on a maintenance cadence")
      } catch { case scala.util.control.NonFatal(_) => () }
    val qBase = Dedup.once(
      emb.filter(queryPred).select(col(idCol).as("query_id"), col(vecCol).as("__v")),
      "qqv", quantize(col("__v")))
    val routed =
      if (nprobe == 1)
        qBase.select(col("query_id"), col("qqv"),
          assignStruct(col("qqv"), model.coarse).getField("c").as("cell"))
      else
        qBase.select(col("query_id"), col("qqv"),
          explode(transform(
            slice(array_sort(assignStructArray(col("qqv"), model.coarse)), 1, nprobe),
            s => s.getField("c"))).as("cell"))
    // one EAGER evaluation of the (broadcast-sized) query frame: the
    // driver collect of probed cells and the join side below both read
    // the checkpointed blocks, so a non-deterministic emb source can
    // never route join-side queries to cells absent from the partition
    // filter
    val queries = routed.localCheckpoint()
    // ≤ model.cells longs — the constant-bounded driver collect that
    // buys partition pruning (the k-means-centroid pattern)
    val probed = queries.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).sorted.toIndexedSeq
    // explicit schema pins the partition column to LONG (dirname
    // inference would read `cell=3` as int, putting a cast between the
    // filter and the partition pruner)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("codes",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.types.StructField("cell",
        org.apache.spark.sql.types.LongType)))
    val cand = spark.read.schema(schema).parquet(indexDir)
      .filter(col("cell").isin(probed: _*))
      .select(col("id").as("neighbor_id"), col("cell"), col("codes"))
    val scored = cand.join(broadcast(queries), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        adcDist(model.books, model.sub).as("adc_dist"))
    adcRanked(scored, topK)
  }
}
