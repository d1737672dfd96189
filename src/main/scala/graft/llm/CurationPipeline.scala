package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The composed training-data curation pipeline: exact dedup → near-dup
  * removal → quality/language gate. This is the shape a 100 TB curation
  * job runs; each stage is the already-verified operator, chained:
  *
  *  1. exact dedup FIRST — identical documents collapse to the minimum-id
  *     canonical before LSH, which also removes the pathological
  *     identical-doc buckets from the band join (SCALE.md);
  *  2. MinHash-LSH near-dup pairs over the canonicals; of each verified
  *     pair the higher id drops (transitively: any doc that is the
  *     higher side of ANY pair drops);
  *  3. per-document quality gate (token count + stopword evidence) and
  *     language filter.
  */
object CurationPipeline {

  /** @param maxRepBp when set, drop documents whose repeated-3-gram
    *   fraction exceeds this many basis points (boilerplate gate)
    * @param splits when set, append a deterministic hash-keyed `split`
    *   column (train/val/test) to the output
    * @param clusterCanonical near-dup removal keeps exactly the MINIMUM
    *   id of each transitive near-dup cluster
    *   ([[Dedup.canonicalizeClusters]]) instead of dropping the higher
    *   id of every verified pair — for a star 1~3, 2~3 the pairwise rule
    *   keeps {1, 2} (direction-dependent) while the cluster rule keeps
    *   {1} (canonical per component)
    */
  final case class Config(
      shingleK: Int = 3,
      numSig: Int = 12,
      bandRows: Int = 2,
      minJacNum: Int = 1,
      minJacDen: Int = 2,
      keepLang: String = "en",
      persistSignatures: Boolean = true,
      maxRepBp: Option[Int] = None,
      splits: Option[Seq[(String, Int)]] = None,
      clusterCanonical: Boolean = false)

  def curate(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame = {
    // 1. exact dedup: keep the canonical (min id) of each content group.
    val canon = Dedup.exactDupGroups(docs, idCol, textCol)
      .filter(col(idCol) === col("canonical_id"))
      .select(col(idCol), col(textCol))

    // 2. near-dup removal: by default drop the higher id of every
    // verified pair (reference-faithful); with clusterCanonical, keep
    // only each transitive cluster's minimum id.
    val pairs = Dedup.nearDupPairs(canon, idCol, textCol,
      cfg.shingleK, cfg.numSig, cfg.bandRows, cfg.minJacNum, cfg.minJacDen,
      cfg.persistSignatures)
    val dropIds =
      if (cfg.clusterCanonical)
        Dedup.canonicalizeClusters(pairs)
          .filter(col("id") =!= col("canonical_id"))
          .select(col("id").as(idCol)).distinct()
      else pairs.select(col("id_b").as(idCol)).distinct()
    val kept = canon.join(dropIds, Seq(idCol), "left_anti")

    // 3. quality + language gate over materialized tokens, with the
    // optional repetition (boilerplate) gate in the same pass.
    val withToks = Dedup.once(kept, "__toks", TextAnalysis.tokens(col(textCol)))
    val base = cfg.maxRepBp match {
      case Some(bp) =>
        Dedup.once(withToks, "__sh3", Dedup.shingles(col("__toks"), 3))
          .filter(TextAnalysis.repBp(col("__sh3")) <= bp)
      case None => withToks
    }
    val nToks: Column = TextAnalysis.tokenCount(col("__toks"))
    val nStop: Column = TextAnalysis.stopwordCount(col("__toks"), TextAnalysis.EnStop)
    val out = base
      .filter(TextAnalysis.isQuality(nToks, nStop) &&
        TextAnalysis.langGuess(col("__toks")) === cfg.keepLang)
      .select(col(idCol), nToks.as("n_tokens"),
        TextAnalysis.langGuess(col("__toks")).as("lang_guess"))
    // 4. optional deterministic split assignment for downstream training.
    cfg.splits.fold(out)(sp =>
      out.withColumn("split", Sampling.splitAssign(col(idCol), sp)))
  }
}
